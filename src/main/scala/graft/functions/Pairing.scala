package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared intra-bucket pair expansion for the LSH-family operators: given
  * a bucket's `collect_list`'d array, produce every unordered element
  * pair as `struct(x, y)` (x the earlier array slot, y the later). Used
  * by MinHash near-dup pairing, Jaccard candidate generation, and
  * embedding ANN pairs — one definition so the (easy-to-fumble) nested
  * sequence bounds exist exactly once.
  */
object Pairing {
  def intraBucketPairs(ds: Column): Column =
    flatten(transform(
      sequence(lit(1), size(ds) - 1),
      i => transform(
        sequence(i + 1, size(ds)),
        j => struct(element_at(ds, i).as("x"), element_at(ds, j).as("y")))))
}

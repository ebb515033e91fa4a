package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering this engine's native Catalyst
  * expressions — the public mechanism for shipping custom codegen
  * functions (vs. reaching into `private[sql]` internals). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` on the
  * session builder (Verify, Bench, and the test session all do); the
  * operators then reach the expression through
  * `functions.call_function("simhash_of_hashes", ...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.SimhashOfHashes].getName,
        "simhash_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"simhash_of_hashes takes exactly 1 argument, got ${children.size}")
        graft.functions.SimhashOfHashes(children.head, graft.text.Dedup.simPerms)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.MinhashOfHashes].getName,
        "minhash_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"minhash_of_hashes takes exactly 1 argument, got ${children.size}")
        graft.functions.MinhashOfHashes(children.head, graft.text.Dedup.perms)
      }))
    ext.injectFunction((
      FunctionIdentifier("sign_buckets_of_quantized"),
      new ExpressionInfo(classOf[graft.functions.SignBucketsOfQuantized].getName,
        "sign_buckets_of_quantized"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"sign_buckets_of_quantized takes exactly 1 argument, got ${children.size}")
        graft.functions.SignBucketsOfQuantized(children.head,
          graft.ml.Similarity.planeParams,
          graft.ml.Similarity.NumTables, graft.ml.Similarity.PlanesPerTable)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_of_quantized"),
      new ExpressionInfo(classOf[graft.functions.DotOfQuantized].getName,
        "dot_of_quantized"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"dot_of_quantized takes exactly 2 arguments, got ${children.size}")
        graft.functions.DotOfQuantized(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("agree_count_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.AgreeCountOfHashes].getName,
        "agree_count_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"agree_count_of_hashes takes exactly 2 arguments, got ${children.size}")
        graft.functions.AgreeCountOfHashes(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("byte_stats_of_binary"),
      new ExpressionInfo(classOf[graft.functions.ByteStatsOfBinary].getName,
        "byte_stats_of_binary"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"byte_stats_of_binary takes exactly 1 argument, got ${children.size}")
        graft.functions.ByteStatsOfBinary(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("tok_hashes_of_text"),
      new ExpressionInfo(classOf[graft.functions.TokHashesOfText].getName,
        "tok_hashes_of_text"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"tok_hashes_of_text takes exactly 1 argument, got ${children.size}")
        graft.functions.TokHashesOfText(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("tok_hashes_of_tokens"),
      new ExpressionInfo(classOf[graft.functions.TokHashesOfTokens].getName,
        "tok_hashes_of_tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"tok_hashes_of_tokens takes exactly 1 argument, got ${children.size}")
        graft.functions.TokHashesOfTokens(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingles_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.ShinglesOfHashes].getName,
        "shingles_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          s"shingles_of_hashes takes 1 or 2 arguments, got ${children.size}")
        // optional 2nd arg: the shingle window width, a literal int
        // (codegen unrolls per-window constants, so it cannot be a
        // runtime column) — default 3, the dedup family's width
        val window = if (children.size == 2) children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
              org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"shingles_of_hashes window must be an integer literal, got $other")
        } else 3
        graft.functions.ShinglesOfHashes(children.head, window)
      }))
    ext.injectFunction((
      FunctionIdentifier("win_shingles_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.WinShinglesOfHashes].getName,
        "win_shingles_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          s"win_shingles_of_hashes takes 1 or 2 arguments, got ${children.size}")
        // optional 2nd arg: the window width, a literal int (same
        // contract as shingles_of_hashes) — default 8, the
        // exact-substring span family's width
        val window = if (children.size == 2) children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
              org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"win_shingles_of_hashes window must be an integer literal, got $other")
        } else 8
        graft.functions.WinShinglesOfHashes(children.head, window)
      }))
    ext.injectFunction((
      FunctionIdentifier("blocks_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.BlocksOfHashes].getName,
        "blocks_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          s"blocks_of_hashes takes 1 or 2 arguments, got ${children.size}")
        // optional 2nd arg: the tile width, a literal int (same contract
        // as shingles_of_hashes) — default 8, the boilerplate width
        val window = if (children.size == 2) children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
              org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"blocks_of_hashes window must be an integer literal, got $other")
        } else 8
        graft.functions.BlocksOfHashes(children.head, window)
      }))
    ext.injectFunction((
      FunctionIdentifier("luhn_valid"),
      new ExpressionInfo(classOf[graft.functions.LuhnValidOfText].getName,
        "luhn_valid"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"luhn_valid takes exactly 1 argument, got ${children.size}")
        graft.functions.LuhnValidOfText(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("fold_marks"),
      new ExpressionInfo(classOf[graft.functions.FoldMarks].getName,
        "fold_marks"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"fold_marks takes exactly 1 argument, got ${children.size}")
        graft.functions.FoldMarks(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dim_shares_of_hashes"),
      new ExpressionInfo(classOf[graft.functions.DimSharesOfHashes].getName,
        "dim_shares_of_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"dim_shares_of_hashes takes exactly 1 argument, got ${children.size}")
        graft.functions.DimSharesOfHashes(children.head, graft.ml.DocVectors.Dim)
      }))
  }
}

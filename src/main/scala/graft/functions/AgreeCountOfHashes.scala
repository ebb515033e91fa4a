package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression counting the slot-wise agreements of two
  * hash signatures (`array<long>`): |{i : a[i] = b[i]}| — the MinHash
  * `n_match` statistic scored on every LSH candidate pair.
  *
  * Same rationale as [[DotOfQuantized]]: the declarative formulation
  * `aggregate(zip_with(a, b, when(x = y, 1).otherwise(0)), 0, _+_)` is
  * two chained interpreted HOFs allocating an intermediate array per
  * candidate row, in the verification hot path of `near_dup_pairs` and
  * the incremental ingest pairing. This is one codegen'd walk.
  *
  * Null/ragged parity with the declarative twin (pinned in DedupSpec) —
  * NOTE it differs from [[DotOfQuantized]]'s: either array NULL ⇒ NULL,
  * but a NULL ELEMENT contributes 0 (the `when` falls through to
  * `otherwise(0)` on a null comparison) and ragged lengths count only
  * the overlapping slots (zip_with's null padding also falls through to
  * 0) — no null poisoning, because the fold elements are never null.
  */
case class AgreeCountOfHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "agree_count_of_hashes"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) acc += 1L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($xa.numElements(), $ya.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if (!$xa.isNullAt($i) && !$ya.isNullAt($i) &&
              $xa.getLong($i) == $ya.getLong($i)) $acc++;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgreeCountOfHashes =
    copy(left = newLeft, right = newRight)
}

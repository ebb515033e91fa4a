package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Native Catalyst expression computing the per-payload byte statistics
  * [[graft.multimodal.Media.mediaFeatures]] reports — one codegen'd
  * walk over the RAW BINARY returning
  * `struct(byte_sum: bigint, n_hi_bytes: bigint)`:
  *
  *  - `byte_sum` — Σ of unsigned byte values (the fake "decode" stat
  *    standing in for a codec, per the multimodal brief);
  *  - `n_hi_bytes` — |{i : b(i) ≥ 0x80}| (the high-bit census the
  *    declarative twin reads off the hex string's first nibble:
  *    hex digit ∈ 89ABCDEF ⟺ byte ≥ 0x80).
  *
  * Same rationale as [[AgreeCountOfHashes]]: the declarative
  * formulation hex-encodes the payload (2× blowup), splits it into a
  * per-byte ARRAY OF STRINGS via `regexp_extract_all(h, "..")`, then
  * runs two interpreted HOFs over it (an `aggregate` fold with
  * per-element string→int arithmetic and a `filter`+`instr` scan) —
  * three payload-sized allocations per row on the media scan's hot
  * path. This is one branch-free loop over the bytes that were already
  * in memory. NULL payload ⇒ NULL (matching the twin's explicit NULL
  * CASE); empty payload ⇒ (0, 0) (the twin's coalesce-to-0).
  */
case class ByteStatsOfBinary(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("byte_sum", LongType, nullable = false),
    StructField("n_hi_bytes", LongType, nullable = false)))

  override def prettyName: String = "byte_stats_of_binary"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var sum = 0L
    var hi = 0L
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      if (v >= 0x80) hi += 1L
      i += 1
    }
    InternalRow(sum, hi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val sum = ctx.freshName("sum")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
        long $sum = 0L;
        long $hi = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          int $v = $bytes[$i] & 0xff;
          $sum += $v;
          if ($v >= 0x80) $hi++;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] { $sum, $hi });
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): ByteStatsOfBinary = copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a banded SimHash from an
  * `array<long>` of token hashes: for each of the `perms.size` bands,
  * permute every hash with `(a·(h mod P) + b) mod P` and majority-vote
  * its low 16 bits (bit 16p+j set iff more than half the tokens have bit
  * j of permutation p set; strict, so ties and the empty array give 0).
  *
  * Exists for performance, not semantics: the declarative formulation
  * (4 × `transform` + 64 × `size(filter(...))`) is correct but every one
  * of those 68 higher-order passes evaluates interpreted — array HOFs are
  * `CodegenFallback` — and re-walks the array. This expression is the
  * same arithmetic in ONE pass per row inside whole-stage codegen
  * ([[graft.text.Dedup.docSimhash]] keeps the per-token `tokHash` as the
  * single shared declarative pass feeding it; `SimhashSpec` pins
  * bit-equality against the declarative formulation). Preference order
  * per the build brief: built-ins where they express it well, a native
  * `Expression` with `doGenCode` where they don't — this is the latter.
  *
  * Null handling: a null ELEMENT counts toward n (matching `size`) but
  * votes for no bits (matching `filter`'s null-drops); a null ARRAY
  * yields null (the operator never feeds one — `tokens()` of a non-null
  * text is non-null).
  */
case class SimhashOfHashes(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression {

  private val P: Long = PortableHash.P
  private val bandBits = 16
  private def nBits: Int = perms.size * bandBits

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_of_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](nBits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hp = arr.getLong(i) % P
        var p = 0
        while (p < perms.size) {
          val (a, b) = perms(p)
          val ph = (hp * a + b) % P
          var j = 0
          while (j < bandBits) {
            counts(p * bandBits + j) += ((ph >>> j) & 1L).toInt
            j += 1
          }
          p += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < nBits) {
      if (2L * counts(b) > n.toLong) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hp = ctx.freshName("hp")
      val sim = ctx.freshName("sim")
      val bb = ctx.freshName("bb")
      val phs = perms.indices.map(p => ctx.freshName(s"ph$p"))
      val permDecls = perms.zipWithIndex.map { case ((a, b), p) =>
        s"long ${phs(p)} = ($hp * ${a}L + ${b}L) % ${P}L;"
      }.mkString("\n          ")
      val votes = perms.indices.map { p =>
        s"$counts[${p * bandBits} + $j] += (int) ((${phs(p)} >>> $j) & 1L);"
      }.mkString("\n            ")
      s"""
        int $n = $c.numElements();
        int[] $counts = new int[$nBits];
        for (int $i = 0; $i < $n; $i++) {
          if (!$c.isNullAt($i)) {
            long $hp = $c.getLong($i) % ${P}L;
            $permDecls
            for (int $j = 0; $j < $bandBits; $j++) {
              $votes
            }
          }
        }
        long $sim = 0L;
        for (int $bb = 0; $bb < $nBits; $bb++) {
          if (2L * $counts[$bb] > (long) $n) $sim |= (1L << $bb);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashOfHashes =
    copy(child = newChild)
}

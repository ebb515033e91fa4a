package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing [[PortableHash.tokHash]] for every
  * element of an `array<string>` token column: element i of the output is
  * `least(numChars, 1e6)·31^8 + Σ_{j=1..8} cp_j·31^(j-1)` where cp_j is
  * the code point of the j-th character of the token right-padded to 8
  * with `'.'` (46) — bit-identical to the declarative spelling
  * `transform(toks, t => tokHash(t))`.
  *
  * This is the hottest scalar in the engine: EVERY text operator's hash
  * chain (minhash signatures, simhash votes, shingle sets at any window,
  * rolling fingerprints) starts by token-hashing the whole corpus, and
  * the declarative spelling runs it under `transform` — an interpreted
  * HOF (array HOFs are CodegenFallback) whose lambda re-evaluates
  * `rpad` + `substring` + `ascii` once per polynomial term: ~24
  * `UTF8String` allocations PER TOKEN. This expression is one
  * allocation-free byte-walk per token (UTF-8 decoded in place, never
  * materializing the padded string), inside whole-stage codegen.
  *
  * Semantics pinned by probe + property tests (HashExprProps vs an
  * independent code-point model; job-level parity vs the declarative
  * twin incl. non-ASCII): Spark's `ascii` returns the full Unicode code
  * point of the first character (supplementary planes included — a
  * 4-byte emoji is ONE character to both `length` and `rpad`), so the
  * walk decodes code points, not bytes. Overflow stays in-bound even at
  * the supplementary maximum: 1e6·31^8 + 0x10FFFF·Σ31^j ≈ 8.9e17 « 2^62.
  * NULL array ⇒ NULL; NULL element ⇒ NULL element. Contract: valid
  * UTF-8 input (what parquet/UTF8String already guarantee); malformed
  * bytes are the one place the twins may diverge (the declarative chain
  * round-trips through JVM strings and would substitute U+FFFD).
  */
case class TokHashesOfTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "tok_hashes_of_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = Long.box(TokHashesOfTokens.hashToken(arr.getUTF8String(i)))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val cls = TokHashesOfTokens.getClass.getName.stripSuffix("$")
      s"""
        int $n = $c.numElements();
        Object[] $out = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if (!$c.isNullAt($i)) {
            $out[$i] = java.lang.Long.valueOf(
              $cls.hashToken($c.getUTF8String($i)));
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): TokHashesOfTokens =
    copy(child = newChild)
}

object TokHashesOfTokens {
  private val Pow8: Long = {
    var p = 1L; (0 until 8).foreach(_ => p *= 31L); p
  }

  /** One token's hash — shared verbatim by the interpreted eval and the
    * generated code (called through the static forwarder), so the two
    * paths cannot drift. Walks the UTF-8 bytes once, decoding the first
    * 8 code points in place; positions past the end contribute '.' (46),
    * exactly like the declarative `rpad(c, 8, ".")`. */
  def hashToken(s: UTF8String): Long = {
    val nBytes = s.numBytes()
    var h = math.min(s.numChars().toLong, PortableHash.MaxLenTerm) * Pow8
    var off = 0
    var pw = 1L
    var j = 0
    while (j < 8) {
      var cp = 46 // '.'
      if (off < nBytes) {
        val b0 = s.getByte(off)
        val w = UTF8String.numBytesForFirstByte(b0)
        cp =
          if (w == 1) b0 & 0xFF
          else if (w == 2) ((b0 & 0x1F) << 6) | (s.getByte(off + 1) & 0x3F)
          else if (w == 3) ((b0 & 0x0F) << 12) | ((s.getByte(off + 1) & 0x3F) << 6) |
            (s.getByte(off + 2) & 0x3F)
          else ((b0 & 0x07) << 18) | ((s.getByte(off + 1) & 0x3F) << 12) |
            ((s.getByte(off + 2) & 0x3F) << 6) | (s.getByte(off + 3) & 0x3F)
        off += w
      }
      h += cp.toLong * pw
      pw *= 31L
      j += 1
    }
    h
  }
}

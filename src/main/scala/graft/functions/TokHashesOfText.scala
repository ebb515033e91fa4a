package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize-and-hash fused into one native expression:
  * `tok_hashes_of_text(text)` ≡
  * `transform(regexp_extract_all(lower(text), '[^ \t\n\r\f\x0B]+'), tokHash)`
  * — the full text → token-hash chain of every sketch operator, with
  * ZERO intermediate materialization: no token string array, no
  * per-token `UTF8String` substring copies, no regex engine. One
  * byte-walk over the lowercased text emits the hash of each maximal
  * non-whitespace run directly into a primitive long array
  * (`UnsafeArrayData.fromPrimitiveArray`).
  *
  * Used by the paths that never need the token STRINGS — minhash/
  * shingle signatures, simhash votes, rolling fingerprints. Paths that
  * do need them (quality stats, the shared curation base's `toks`)
  * keep the regexp spelling, and hash the shared array through
  * [[TokHashesOfTokens]].
  *
  * Parity notes (pinned by HashExprProps vs an independent split+hash
  * model, and job-level vs the declarative twin incl. uppercase
  * unicode): lowercasing calls `UTF8String.toLowerCase` — the SAME
  * method Spark's `lower()` calls, so case mappings (including
  * length-changing ones like U+0130) cannot diverge; the token
  * separators are exactly the regex's six ASCII whitespace bytes,
  * which never appear inside a multi-byte UTF-8 sequence, so the byte
  * scan is code-point safe; per-run hashing shares
  * [[TokHashesOfTokens]]'s code-point arithmetic. NULL text ⇒ NULL;
  * all-whitespace or empty text ⇒ empty array (like
  * `regexp_extract_all`).
  */
case class TokHashesOfText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "tok_hashes_of_text"

  override protected def nullSafeEval(input: Any): Any =
    TokHashesOfText.hashText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = TokHashesOfText.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.hashText($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokHashesOfText =
    copy(child = newChild)
}

object TokHashesOfText {
  private val Pow8: Long = {
    var p = 1L; (0 until 8).foreach(_ => p *= 31L); p
  }

  private def isSep(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0D || b == 0x0C || b == 0x0B

  /** Shared verbatim by eval and codegen (static forwarder). */
  def hashText(raw: UTF8String): ArrayData = {
    val s = raw.toLowerCase // the exact method lower() uses
    val nBytes = s.numBytes()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var off = 0
    while (off < nBytes) {
      if (isSep(s.getByte(off))) {
        off += 1
      } else {
        // maximal non-whitespace run: stream the first 8 code points
        // into the polynomial, count all of them for the length term
        var nch = 0L
        var poly = 0L
        var pw = 1L
        var terms = 0
        while (off < nBytes && !isSep(s.getByte(off))) {
          val b0 = s.getByte(off)
          val w = UTF8String.numBytesForFirstByte(b0)
          if (terms < 8) {
            val cp =
              if (w == 1) b0 & 0xFF
              else if (w == 2) ((b0 & 0x1F) << 6) | (s.getByte(off + 1) & 0x3F)
              else if (w == 3) ((b0 & 0x0F) << 12) | ((s.getByte(off + 1) & 0x3F) << 6) |
                (s.getByte(off + 2) & 0x3F)
              else ((b0 & 0x07) << 18) | ((s.getByte(off + 1) & 0x3F) << 12) |
                ((s.getByte(off + 2) & 0x3F) << 6) | (s.getByte(off + 3) & 0x3F)
            poly += cp.toLong * pw
            pw *= 31L
            terms += 1
          }
          nch += 1
          off += w
        }
        while (terms < 8) { // pad positions past the end with '.' (46)
          poly += 46L * pw
          pw *= 31L
          terms += 1
        }
        out += math.min(nch, PortableHash.MaxLenTerm) * Pow8 + poly
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }
}

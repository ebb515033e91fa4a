package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression producing the DISTINCT 3-shingle hashes of
  * an `array<long>` of token hashes: element i of the output set is
  * [[PortableHash.shingle3]] over (th(i), th(i+1), th(i+2)), first
  * occurrence order, exactly what
  * `array_distinct(transform(sequence(...), shingle3(element_at...)))`
  * computes — minus that formulation's interpreted per-element
  * `element_at` walk (3 probes per shingle, all CodegenFallback; measured
  * ~half the minhash signature pipeline's cost at sf0.1).
  *
  * Differences from the declarative chain, both outside the operators'
  * domain (they filter to ≥3 tokens first): inputs shorter than 3 yield
  * an EMPTY array here (the declarative `sequence(1, n-2)` would count
  * DOWN for n=2 and crash in `element_at(th, 0)`); a null element makes
  * its up-to-three shingles null, deduplicated to one null like
  * array_distinct.
  */
case class ShinglesOfHashes(child: Expression) extends UnaryExpression {

  private val P: Long = PortableHash.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "shingles_of_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i + 2 < n) {
      if (arr.isNullAt(i) || arr.isNullAt(i + 1) || arr.isNullAt(i + 2)) {
        seen.add(null)
      } else {
        val h1 = arr.getLong(i)
        val h2 = arr.getLong(i + 1)
        val h3 = arr.getLong(i + 2)
        seen.add(Long.box((((h1 % P) * 131L + h2) % P * 131L + h3) % P))
      }
      i += 1
    }
    new GenericArrayData(seen.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val sh = ctx.freshName("sh")
      s"""
        int $n = $c.numElements();
        java.util.LinkedHashSet<Object> $seen = new java.util.LinkedHashSet<Object>();
        for (int $i = 0; $i + 2 < $n; $i++) {
          if ($c.isNullAt($i) || $c.isNullAt($i + 1) || $c.isNullAt($i + 2)) {
            $seen.add(null);
          } else {
            long $sh = ((($c.getLong($i) % ${P}L) * 131L + $c.getLong($i + 1)) % ${P}L
              * 131L + $c.getLong($i + 2)) % ${P}L;
            $seen.add(java.lang.Long.valueOf($sh));
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($seen.toArray());
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesOfHashes =
    copy(child = newChild)
}

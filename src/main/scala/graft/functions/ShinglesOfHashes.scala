package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression producing the DISTINCT `window`-shingle
  * hashes of an `array<long>` of token hashes: element i of the output
  * set is [[PortableHash.shingleK]] over (th(i), …, th(i+window-1)),
  * first occurrence order, exactly what
  * `array_distinct(transform(sequence(...), shingleK(element_at...)))`
  * computes — minus that formulation's interpreted per-element
  * `element_at` walk (`window` probes per shingle, all CodegenFallback;
  * measured ~half the minhash signature pipeline's cost at sf0.1 for
  * the k=3 case). At the default window=3 this is bit-identical to the
  * original 3-shingle expression ([[PortableHash.shingle3]] IS the k=3
  * fold); decontamination calls it at window 8..13.
  *
  * Differences from the declarative chain, both outside the operators'
  * domain (they filter to ≥window tokens first): inputs shorter than
  * window yield an EMPTY array here (the declarative
  * `sequence(1, n-window+1)` would count DOWN for n < window and crash
  * in `element_at(th, 0)`); a null element makes its up-to-`window`
  * shingles null, deduplicated to one null like array_distinct.
  */
case class ShinglesOfHashes(child: Expression, window: Int = 3)
    extends UnaryExpression {
  require(window >= 1, s"shingles_of_hashes window must be >= 1, got $window")

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
    while (i + window - 1 < n) {
      var hasNull = false
      var j = 0
      while (j < window && !hasNull) {
        if (arr.isNullAt(i + j)) hasNull = true
        j += 1
      }
      if (hasNull) {
        seen.add(null)
      } else {
        var acc = arr.getLong(i) % P
        var k = 1
        while (k < window) {
          acc = (acc * 131L + arr.getLong(i + k)) % P
          k += 1
        }
        seen.add(Long.box(acc))
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
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val hasNull = ctx.freshName("hasNull")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $c.numElements();
        java.util.LinkedHashSet<Object> $seen = new java.util.LinkedHashSet<Object>();
        for (int $i = 0; $i + ${window - 1} < $n; $i++) {
          boolean $hasNull = false;
          for (int $j = 0; $j < $window && !$hasNull; $j++) {
            if ($c.isNullAt($i + $j)) $hasNull = true;
          }
          if ($hasNull) {
            $seen.add(null);
          } else {
            long $acc = $c.getLong($i) % ${P}L;
            for (int $k = 1; $k < $window; $k++) {
              $acc = ($acc * 131L + $c.getLong($i + $k)) % ${P}L;
            }
            $seen.add(java.lang.Long.valueOf($acc));
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($seen.toArray());
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesOfHashes =
    copy(child = newChild)
}

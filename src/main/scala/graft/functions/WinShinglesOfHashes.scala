package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression producing ALL `window`-shingle hashes of
  * an `array<long>` of token hashes IN START ORDER — the positional
  * sibling of [[ShinglesOfHashes]] (which dedups): element i (0-based)
  * of the output is [[PortableHash.shingleK]] over
  * (th(i), …, th(i+window-1)), so `posexplode` of the result yields
  * (start offset, window hash) pairs directly. This is what the
  * exact-substring span family ([[graft.text.Dedup]] `dupSpans` et al.)
  * and [[graft.text.TextAnalysis.docRepetition]]'s multiset walk need —
  * their declarative spelling (`transform(sequence(1, n-w+1),
  * i -> shingleK(element_at(th, i+j)…))`) pays `window` interpreted
  * `element_at` probes (bounds + null branch each) per shingle, all
  * CodegenFallback; this is one codegen'd array walk with the same
  * rolling fold.
  *
  * Contract differences from the declarative chain, matching
  * [[ShinglesOfHashes]]: inputs shorter than `window` yield an EMPTY
  * array (the declarative `sequence` would count down and crash);
  * a window touching a null element yields a null at that position
  * (`element_at` null-propagation does the same).
  */
case class WinShinglesOfHashes(child: Expression, window: Int = 8)
    extends UnaryExpression {
  require(window >= 1, s"win_shingles_of_hashes window must be >= 1, got $window")

  private val P: Long = PortableHash.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "win_shingles_of_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.max(0, n - window + 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      var hasNull = false
      var j = 0
      while (j < window && !hasNull) {
        if (arr.isNullAt(i + j)) hasNull = true
        j += 1
      }
      if (!hasNull) {
        var acc = arr.getLong(i) % P
        var k = 1
        while (k < window) {
          acc = (acc * 131L + arr.getLong(i + k)) % P
          k += 1
        }
        out(i) = Long.box(acc)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val hasNull = ctx.freshName("hasNull")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $c.numElements();
        int $m = java.lang.Math.max(0, $n - ${window - 1});
        Object[] $out = new Object[$m];
        for (int $i = 0; $i < $m; $i++) {
          boolean $hasNull = false;
          for (int $j = 0; $j < $window && !$hasNull; $j++) {
            if ($c.isNullAt($i + $j)) $hasNull = true;
          }
          if (!$hasNull) {
            long $acc = $c.getLong($i) % ${P}L;
            for (int $k = 1; $k < $window; $k++) {
              $acc = ($acc * 131L + $c.getLong($i + $k)) % ${P}L;
            }
            $out[$i] = java.lang.Long.valueOf($acc);
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinShinglesOfHashes =
    copy(child = newChild)
}

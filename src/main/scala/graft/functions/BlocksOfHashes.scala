package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression producing the NON-OVERLAPPING
  * `window`-block hashes of an `array<long>` of token hashes: element b
  * (0-based) of the output is [[PortableHash.shingleK]] over
  * (th(b·window), …, th(b·window+window−1)) — the fixed tiling the
  * boilerplate operators ([[graft.text.TextAnalysis.boilerplateBlocks]]/
  * `boilerplateScrub`) cut documents into. Exactly what
  * `transform(sequence(1, n/window), b -> shingleK(element_at…))`
  * computes — minus that formulation's interpreted per-element
  * `element_at` walk (`window` probes per block, all CodegenFallback;
  * at the boilerplate default window=8 that is 8 interpreted probes per
  * tile). Unlike [[ShinglesOfHashes]] the output is a MULTISET in tile
  * order (tile index = array position + 1 — the scrub path needs the
  * position to cut the right tokens), so no dedup is applied.
  *
  * Edges, matching the declarative chain's guarded form: inputs shorter
  * than one window (or with a trailing partial window) contribute no
  * block for the remainder — n/window full tiles exactly; a null
  * element makes ITS tile's hash null (one output slot, never dropped —
  * positions downstream must stay aligned).
  */
case class BlocksOfHashes(child: Expression, window: Int = 8)
    extends UnaryExpression {
  require(window >= 1, s"blocks_of_hashes window must be >= 1, got $window")

  private val P: Long = PortableHash.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "blocks_of_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() / window
    val out = new Array[Any](m)
    var b = 0
    while (b < m) {
      val base = b * window
      var hasNull = false
      var j = 0
      while (j < window && !hasNull) {
        if (arr.isNullAt(base + j)) hasNull = true
        j += 1
      }
      if (!hasNull) {
        var acc = arr.getLong(base) % P
        var k = 1
        while (k < window) {
          acc = (acc * 131L + arr.getLong(base + k)) % P
          k += 1
        }
        out(b) = Long.box(acc)
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val hasNull = ctx.freshName("hasNull")
      val acc = ctx.freshName("acc")
      s"""
        int $m = $c.numElements() / $window;
        Object[] $out = new Object[$m];
        for (int $b = 0; $b < $m; $b++) {
          int $base = $b * $window;
          boolean $hasNull = false;
          for (int $j = 0; $j < $window && !$hasNull; $j++) {
            if ($c.isNullAt($base + $j)) $hasNull = true;
          }
          if (!$hasNull) {
            long $acc = $c.getLong($base) % ${P}L;
            for (int $k = 1; $k < $window; $k++) {
              $acc = ($acc * 131L + $c.getLong($base + $k)) % ${P}L;
            }
            $out[$b] = java.lang.Long.valueOf($acc);
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): BlocksOfHashes =
    copy(child = newChild)
}

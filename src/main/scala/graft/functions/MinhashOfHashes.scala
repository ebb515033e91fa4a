package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing the k-permutation MinHash
  * signature of an `array<long>` of shingle hashes: slot i =
  * min over the array of `(a_i·(s mod P) + b_i) mod P`.
  *
  * Same rationale as [[SimhashOfHashes]]: the declarative formulation
  * (k × `array_min(transform(...))`) re-walks the shingle array k times,
  * each pass an interpreted HOF; this is one codegen'd walk updating all
  * k minima. Semantics match `array_min` exactly: null elements are
  * skipped, and an empty (or all-null) input yields a signature of k
  * nulls — `MinhashSpec` pins bit-equality against the declarative
  * formulation.
  */
case class MinhashOfHashes(child: Expression, perms: Seq[(Long, Long)])
    extends UnaryExpression {

  private val P: Long = PortableHash.P
  private def k: Int = perms.size

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_of_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val sp = arr.getLong(i) % P
        var p = 0
        while (p < k) {
          val (a, b) = perms(p)
          val ph = (sp * a + b) % P
          if (ph < mins(p)) mins(p) = ph
          p += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins.map(Long.box))
    else new GenericArrayData(new Array[Any](k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val sp = ctx.freshName("sp")
      val ph = ctx.freshName("ph")
      val as = ctx.freshName("pa")
      val bs = ctx.freshName("pb")
      val aInit = ctx.addReferenceObj("permA", perms.map(_._1).toArray, "long[]")
      val bInit = ctx.addReferenceObj("permB", perms.map(_._2).toArray, "long[]")
      s"""
        int $n = $c.numElements();
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $any = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!$c.isNullAt($i)) {
            $any = true;
            long $sp = $c.getLong($i) % ${P}L;
            for (int $p = 0; $p < $k; $p++) {
              long $ph = ($sp * $aInit[$p] + $bInit[$p]) % ${P}L;
              if ($ph < $mins[$p]) $mins[$p] = $ph;
            }
          }
        }
        if ($any) {
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
        } else {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashOfHashes =
    copy(child = newChild)
}

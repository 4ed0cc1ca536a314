package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `outer_product_flat(q)`: the flattened self outer product of an
  * ARRAY<BIGINT> — element `j*n + k` is `q[j] * q[k]` (row-major).
  *
  * Why custom (the DotProduct rationale, squared): q158's Gram build needs
  * every per-row index-pair product, and the higher-order-function
  * formulation — nested `transform`s building n² structs, then `flatten` —
  * runs through interpreted lambda machinery allocating an object per pair;
  * at n = 64 that is 4096 interpreted closure dispatches and struct
  * allocations PER ROW, and it dominated the whole bench suite (27 s at
  * sf0.1). This expression compiles to two tight Java loops writing one
  * primitive long[] inside whole-stage codegen; consumers derive (j, k)
  * from the position of a single posexplode.
  *
  * Exactness: plain 64-bit multiplication, identical to the HOF form and to
  * the oracle's `q[j.idx] * q[k.idx]`. Overflow contract is the caller's
  * (q158 quantizes to |q| ≤ 2^20, so products stay ≤ 2^40).
  *
  * Null contract: NULL for a NULL array; array elements must be non-null
  * (quantized vectors — enforced upstream by construction).
  */
case class OuterProductFlat(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"outer_product_flat requires an ARRAY<BIGINT> argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "outer_product_flat"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n * n)
    var p = 0
    var j = 0
    while (j < n) {
      val xj = x.getLong(j)
      var k = 0
      while (k < n) { out(p) = xj * x.getLong(k); p += 1; k += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xj = ctx.freshName("xj")
      val unsafeArrCls = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n * $n];
         |int $p = 0;
         |for (int $j = 0; $j < $n; $j++) {
         |  long $xj = $a.getLong($j);
         |  for (int $k = 0; $k < $n; $k++) {
         |    $out[$p++] = $xj * $a.getLong($k);
         |  }
         |}
         |${ev.value} = $unsafeArrCls.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

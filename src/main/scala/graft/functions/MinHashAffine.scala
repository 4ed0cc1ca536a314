package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_affine(hashes, numPerm)`: MinHash signature from base hashes —
  * for each permutation sd in [0, numPerm), the minimum over the input of
  * the affine rehash `(h·(2sd+1) + 981·sd) mod 2^56` (the same family
  * graft.ops.NearDup uses, and the same formula its DuckDB oracles
  * evaluate; minima are order-independent so results match exactly).
  *
  * Native codegen: one tight O(numPerm·n) loop instead of numPerm
  * interpreted `array_min(transform(...))` passes. NULL for NULL or empty
  * input (mirrors array_min's empty semantics at the signature level).
  */
case class MinHashAffine(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Mod56 = 1L << 56

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right) match {
      case (ArrayType(LongType, _), Literal(n: Int, IntegerType)) if n > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_affine requires (ARRAY<BIGINT>, positive INT literal), got ($l, $r)")
    }

  private def numPerm: Int = right.asInstanceOf[Literal].value.asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_affine"

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val hs = left.eval(input)
    if (hs == null) return null
    val arr = hs.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numPerm)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var sd = 0
      while (sd < numPerm) {
        val v = (h * (2 * sd + 1) + 981L * sd) % Mod56
        if (v < mins(sd)) mins(sd) = v
        sd += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val sd = ctx.freshName("sd")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    val np = numPerm.toString
    val modLit = s"${Mod56}L"
    val arrayDataCls = "org.apache.spark.sql.catalyst.util.ArrayData"
    val genArrayCls = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    ev.copy(code =
      code"""
            |${leftGen.code}
            |boolean ${ev.isNull} = true;
            |$arrayDataCls ${ev.value} = null;
            |if (!${leftGen.isNull} && ${leftGen.value}.numElements() > 0) {
            |  long[] $mins = new long[$np];
            |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
            |  for (int $i = 0; $i < ${leftGen.value}.numElements(); $i++) {
            |    long $h = ${leftGen.value}.getLong($i);
            |    for (int $sd = 0; $sd < $np; $sd++) {
            |      long $v = ($h * (2L * $sd + 1L) + 981L * $sd) % $modLit;
            |      if ($v < $mins[$sd]) $mins[$sd] = $v;
            |    }
            |  }
            |  ${ev.isNull} = false;
            |  ${ev.value} = new $genArrayCls($mins);
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

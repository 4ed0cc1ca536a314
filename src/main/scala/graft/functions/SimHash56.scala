package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash56(hashes)`: 56-bit SimHash bit-vote fingerprint of an
  * ARRAY<BIGINT> of token hashes — for each bit j, set it when the count of
  * hashes with bit j set is ≥ half (votes Σ±1 ≥ 0).
  *
  * Native codegen replaces the O(56·n) interpreted nested
  * `aggregate(sequence(...), aggregate(th, ...))` fold; the result is
  * identical (integer votes are order-independent), so the DuckDB oracle's
  * list_reduce formulation still matches exactly.
  */
case class SimHash56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash56 requires ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash56"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](56)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 56) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 56) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[56];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 56; $j++) {
         |    $votes[$j] += (((($h >>> $j) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 56; $j++) {
         |  if ($votes[$j] >= 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

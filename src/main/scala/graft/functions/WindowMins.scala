package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `window_mins(hashes, w)`: the minimum of every length-`w` sliding window
  * over a BIGINT array — the winnowing kernel (Schleimer et al.; the same
  * semantics graft.ops.TextOps.q67's DuckDB oracle evaluates with
  * `list_min(list_slice(h, i+1, i+w))`). Output index i holds
  * `min(h[i .. min(i+w, n)-1])`; there are `max(n-w, 0) + 1` windows, so an
  * input shorter than one window degenerates to a single whole-array min —
  * the standard winnowing edge.
  *
  * Native codegen: one O(n·w) pass over primitive longs with no per-window
  * array allocation — the interpreted
  * `transform(sequence(...), i -> array_min(slice(...)))` chain this
  * replaces copies a w-element array per window and walks expression trees
  * per element. (w is small — a deque-based O(n) variant buys nothing at
  * w ≤ 8 and costs allocation.) NULL for NULL or empty input; a null
  * ELEMENT throws — the declared output is containsNull=false, and reading
  * a null slot as a long would silently emit a wrong minimum.
  */
case class WindowMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right) match {
      case (ArrayType(LongType, _), Literal(w: Int, IntegerType)) if w > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"window_mins requires (ARRAY<BIGINT>, positive INT literal), got ($l, $r)")
    }

  private def w: Int = right.asInstanceOf[Literal].value.asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "window_mins"

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val hs = left.eval(input)
    if (hs == null) return null
    val arr = hs.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val win = w
    val nOut = math.max(n - win, 0) + 1
    val out = new Array[Long](nOut)
    // null elements would read as garbage via getLong — fail loudly rather
    // than emit a wrong minimum (the declared output is containsNull=false)
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k))
        throw new IllegalArgumentException(
          s"window_mins: null element at index $k — input hashes must be non-null")
      k += 1
    }
    var i = 0
    while (i < nOut) {
      var m = Long.MaxValue
      var j = i
      val lim = math.min(i + win, n)
      while (j < lim) {
        val v = arr.getLong(j)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val n = ctx.freshName("n")
    val nOut = ctx.freshName("nOut")
    val out = ctx.freshName("out")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val lim = ctx.freshName("lim")
    val m = ctx.freshName("m")
    val v = ctx.freshName("v")
    val winLit = w.toString
    val arrayDataCls = "org.apache.spark.sql.catalyst.util.ArrayData"
    val genArrayCls = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    ev.copy(code =
      code"""
            |${leftGen.code}
            |boolean ${ev.isNull} = true;
            |$arrayDataCls ${ev.value} = null;
            |if (!${leftGen.isNull} && ${leftGen.value}.numElements() > 0) {
            |  int $n = ${leftGen.value}.numElements();
            |  for (int $j = 0; $j < $n; $j++) {
            |    if (${leftGen.value}.isNullAt($j)) {
            |      throw new IllegalArgumentException(
            |        "window_mins: null element at index " + $j +
            |        " - input hashes must be non-null");
            |    }
            |  }
            |  int $nOut = java.lang.Math.max($n - $winLit, 0) + 1;
            |  long[] $out = new long[$nOut];
            |  for (int $i = 0; $i < $nOut; $i++) {
            |    long $m = Long.MAX_VALUE;
            |    int $lim = java.lang.Math.min($i + $winLit, $n);
            |    for (int $j = $i; $j < $lim; $j++) {
            |      long $v = ${leftGen.value}.getLong($j);
            |      if ($v < $m) $m = $v;
            |    }
            |    $out[$i] = $m;
            |  }
            |  ${ev.isNull} = false;
            |  ${ev.value} = new $genArrayCls($out);
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

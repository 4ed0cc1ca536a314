package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(a, b)`: inner product of two ARRAY<DOUBLE> columns as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Why custom (SURVEY.md §4.3 "optional headroom"): the equivalent
  * higher-order-function formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` is
  * evaluated through interpreted lambda machinery — per-element closure
  * dispatch dominates the brute-force KNN join. This expression compiles to
  * a tight Java loop inside the generated code. The summation is the same
  * ascending-index left fold, so results are bitwise identical to the HOF
  * form (and to the DuckDB `list_reduce` oracles).
  *
  * Null contract: NULL if either array is NULL, and NULL if the arrays have
  * DIFFERENT lengths (silently truncating to the shorter side would return a
  * plausible-looking but wrong inner product on malformed vector data); array
  * ELEMENTS must be non-null (standard numeric-vector columns).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two ARRAY<DOUBLE> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration: either `GraftFunctions.register(spark)` on an existing
  * session, or `spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftFunctions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"dot_product takes 2 arguments, got ${exprs.length}")
          DotProduct(exprs(0), exprs(1))
        }),
      (FunctionIdentifier("simhash56"),
        new ExpressionInfo(classOf[SimHash56].getName, "simhash56"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, s"simhash56 takes 1 argument, got ${exprs.length}")
          SimHash56(exprs(0))
        }),
      (FunctionIdentifier("minhash_affine"),
        new ExpressionInfo(classOf[MinHashAffine].getName, "minhash_affine"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"minhash_affine takes 2 arguments, got ${exprs.length}")
          MinHashAffine(exprs(0), exprs(1))
        }),
      (FunctionIdentifier("outer_product_flat"),
        new ExpressionInfo(classOf[OuterProductFlat].getName, "outer_product_flat"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, s"outer_product_flat takes 1 argument, got ${exprs.length}")
          OuterProductFlat(exprs(0))
        }),
      (FunctionIdentifier("window_mins"),
        new ExpressionInfo(classOf[WindowMins].getName, "window_mins"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"window_mins takes 2 arguments, got ${exprs.length}")
          WindowMins(exprs(0), exprs(1))
        }),
      (FunctionIdentifier("md5_prefix56"),
        new ExpressionInfo(classOf[Md5Prefix56].getName, "md5_prefix56"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, s"md5_prefix56 takes 1 argument, got ${exprs.length}")
          Md5Prefix56(exprs(0))
        }))

  // weakly referenced so a stopped session (and its sessionState) can be
  // garbage-collected in a long-lived driver that churns through sessions
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotent, race-free in-place registration on a live session (query
    * builders may run from multiple driver threads — see graft.Verify).
    * The whole check-then-register runs under one lock: marking membership
    * BEFORE registering would let a concurrent caller proceed and resolve
    * `minhash_affine`/`dot_product` mid-registration. */
  def register(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.contains(spark)) {
      functions.foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
      registered.add(spark)
    }
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}

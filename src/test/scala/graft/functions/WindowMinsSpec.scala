package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowMinsSpec extends AnyFunSuite with SparkSpec {

  private def withFns[T](f: => T): T = { GraftFunctions.register(spark); f }

  test("matches the interpreted transform/slice/array_min chain exactly") { withFns {
    import spark.implicits._
    val rnd = new scala.util.Random(647)
    val rows = Seq.fill(300)(Array.fill(rnd.nextInt(40) + 1)(rnd.nextLong() & ((1L << 56) - 1)))
    val df = rows.toDF("h")
      .withColumn("native", call_function("window_mins", col("h"), lit(4)))
      .withColumn("hof", expr(
        """transform(sequence(0, greatest(size(h) - 4, 0)),
          |  i -> array_min(slice(h, i + 1, 4)))""".stripMargin))
    assert(df.filter(not(col("native") <=> col("hof"))).count() === 0L)
  }}

  test("window semantics: count, values, and the short-input edge") { withFns {
    val r = spark.sql(
      """SELECT window_mins(array(5L, 3L, 9L, 1L, 7L, 8L), 4) AS full,
        |       window_mins(array(5L, 3L), 4) AS short,
        |       window_mins(CAST(NULL AS ARRAY<BIGINT>), 4) AS n""".stripMargin).head()
    // n=6, w=4 -> 3 windows: min(5,3,9,1)=1, min(3,9,1,7)=1, min(9,1,7,8)=1
    assert(r.getSeq[Long](0) === Seq(1L, 1L, 1L))
    // shorter than one window: single whole-array min (the winnowing edge)
    assert(r.getSeq[Long](1) === Seq(3L))
    assert(r.isNullAt(2))
  }}

  test("null ELEMENT fails loudly instead of emitting a wrong minimum") { withFns {
    val e = intercept[Exception] {
      spark.sql("SELECT window_mins(array(5L, CAST(NULL AS BIGINT)), 2) AS m").head()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: rootMessages(x.getCause))
    assert(rootMessages(e).exists(m => m != null && m.contains("window_mins: null element")), e)
  }}

  test("codegen and interpreted paths agree") { withFns {
    import spark.implicits._
    // force the interpreted path by evaluating the expression directly
    val e = WindowMins(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(5L, 3L, 9L, 1L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaCodegen = Seq(Tuple1(Array(5L, 3L, 9L, 1L))).toDF("h")
      .selectExpr("window_mins(h, 2) AS m").head().getSeq[Long](0)
    assert(interpreted === Seq(3L, 3L, 1L))
    assert(viaCodegen === interpreted)
  }}
}

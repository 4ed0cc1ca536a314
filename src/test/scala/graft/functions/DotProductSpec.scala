package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DotProductSpec extends AnyFunSuite with SparkSpec {

  private def withDot[T](f: => T): T = { GraftFunctions.register(spark); f }

  test("matches the higher-order-function fold bitwise") { withDot {
    import spark.implicits._
    val rnd = new scala.util.Random(647)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
      .withColumn("native", call_function("dot_product", col("a"), col("b")))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
    val bad = df.filter(col("native") =!= col("hof")).count()
    assert(bad === 0L)
    // sanity: a nonzero dot product exists
    assert(df.agg(max(abs(col("native")))).head().getDouble(0) > 0.0)
  }}

  test("null arrays yield null; SQL name resolves via registry") { withDot {
    val r = spark.sql(
      """SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS v""".stripMargin)
      .head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 11.0)
  }}

  test("mismatched array lengths yield null, not a truncated product") { withDot {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D)) AS m,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok""".stripMargin)
      .head()
    assert(r.isNullAt(0), "length mismatch must not silently truncate")
    assert(r.getDouble(1) === 11.0)
    // same contract under forced codegen
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val c = spark.sql(
        "SELECT dot_product(array(1.0D), array(1.0D, 2.0D)) AS m").head()
      assert(c.isNullAt(0))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }}

  test("whole-stage codegen path evaluates correctly (no interpreted fallback)") {
    withDot {
      import spark.implicits._
      // CODEGEN_ONLY forces doGenCode; an exception here means codegen broke
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      try {
        val out = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
          .select(call_function("dot_product", col("a"), col("b")))
          .head().getDouble(0)
        assert(out === 32.0)
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("simhash56 matches the interpreted fold formulation") { withDot {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)(Array.fill(rnd.nextInt(30) + 1)(
      rnd.nextLong().abs % (1L << 56)))
    val df = rows.toDF("th")
      .withColumn("native", call_function("simhash56", col("th")))
      .withColumn("hof", expr(
        """aggregate(sequence(0, 55), CAST(0 AS BIGINT), (acc, j) -> acc +
          |  IF(aggregate(th, CAST(0 AS BIGINT),
          |       (a, h) -> a + IF((shiftright(h, j) & 1) = 1,
          |                        CAST(1 AS BIGINT), CAST(-1 AS BIGINT))) >= 0,
          |     shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin))
    assert(df.filter(col("native") =!= col("hof")).count() === 0L)
  }}

  test("minhash_affine matches the per-permutation array_min formulation") { withDot {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Array.fill(rnd.nextInt(40) + 1)(
      rnd.nextLong().abs % (1L << 56)))
    val df = rows.toDF("hs")
      .withColumn("native", expr("minhash_affine(hs, 16)"))
      .withColumn("hof", expr(
        """transform(sequence(0, 15),
          |  sd -> array_min(transform(hs, h -> (h * (2*sd + 1) + 981 * sd) % 72057594037927936)))""".stripMargin))
    assert(df.filter(expr("native != hof")).count() === 0L)
    // null/empty input contract
    val edge = spark.sql(
      """SELECT minhash_affine(CAST(NULL AS ARRAY<BIGINT>), 4) AS a,
        |       minhash_affine(CAST(array() AS ARRAY<BIGINT>), 4) AS b""".stripMargin).head()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }}

  test("extensions class injects the function into a fresh session") {
    val s2 = spark.newSession()
    // simulate spark.sql.extensions wiring on an existing builder-less session
    new GraftExtensions() // class loads
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT dot_product(array(2.0D), array(8.0D))").head().getDouble(0) === 16.0)
  }
}

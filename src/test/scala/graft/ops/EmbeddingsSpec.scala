package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingsSpec extends AnyFunSuite with SparkSpec {

  test("fixed-point centroid aggregation tracks the exact sum within quantization error") {
    import spark.implicits._
    // the q31 aggregation: sum(CAST(floor(x*1e12) AS DECIMAL(38,0))) / 1e12.
    // Each element contributes < 1e-12 of floor error, so the distance to
    // the EXACT (arbitrary-precision) sum is bounded by n/1e12 — the bound
    // that justifies replacing the per-group collect_list with a
    // constant-memory decimal accumulator.
    val rnd = new scala.util.Random(647)
    val xs = Seq.fill(10000)(rnd.nextDouble() * 2.0 - 1.0)
    val fixed = xs.toDF("x")
      .agg(sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .head().getDecimal(0).doubleValue() / 1e12
    val exact = xs.map(BigDecimal.exact).sum.toDouble
    assert(math.abs(fixed - exact) <= xs.length / 1e12,
      s"fixed=$fixed exact=$exact")
    // and the aggregation is shuffle-order-insensitive: same result after a
    // repartition that scrambles partition layout
    val scrambled = xs.toDF("x").repartition(13)
      .agg(sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .head().getDecimal(0).doubleValue() / 1e12
    assert(scrambled === fixed)
  }
}

package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the incremental-components law on random graphs:
  * `incrementalComponents(connectedComponents(base), delta)` must equal
  * `connectedComponents(base ∪ delta)` as an (id → component) map, for
  * random base/delta edge sets over a small vertex space — dense enough
  * that the shapes crafted fixtures miss occur constantly: one delta
  * edge merging MANY standing components transitively, delta-only
  * chains threading through standing vertices, multiple disjoint merge
  * groups in one delta, and deltas that touch nothing. */
class ClusteringPropertySpec extends AnyFunSuite with SparkSpec {

  // 14 vertices → random 0-12-edge sets fragment into several small
  // components, so merges across standing components are the common case
  private val edgeGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 12)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 13L)
      b <- Gen.choose(0L, 13L) if b != a
    } yield (a, b))
  } yield es

  private def pairsDf(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id1", "id2")
  }

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental law: for random base and delta edge sets, " +
    "incrementalComponents(cc(base), delta) equals cc(base ∪ delta)") {
    val prop = Prop.forAll(edgeGen, edgeGen) { (base, delta) =>
      (base.nonEmpty || delta.nonEmpty) ==> {
        val standing = Clustering.connectedComponents(pairsDf(base))
        val got = asMap(
          Clustering.incrementalComponents(standing, pairsDf(delta)))
        val scratch = asMap(
          Clustering.connectedComponents(pairsDf(base ++ delta)))
        got == scratch
      }
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}

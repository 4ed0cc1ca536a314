package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for BOTH edge-patch directions on random corpora: the
  * incremental patch applied to the standing edge list must equal the
  * from-scratch refresh — `graphRetireOnAdmit` for admissions (support can
  * only shrink base-side) and `graphForgetEdgePatch` for deletions
  * (support can only grow, edges can be created). Random small-vocabulary
  * texts drive heavy fingerprint sharing, so tight caps (1–3) constantly
  * cross in both directions — including the shapes fixtures miss: a doc
  * losing its WHOLE kept set, both-endpoints-affected pairs, pairs whose
  * shared set changes while support stays above the threshold, survivors
  * absent from the sizes table gaining kept fps through un-drops. */
class GraphPatchPropertySpec extends AnyFunSuite with SparkSpec {

  // 6 drawable tokens → trigram space of ~216, so a dozen 3-10-token docs
  // collide constantly and document frequencies pile onto tiny caps
  private val pool = Vector("a", "b", "c", "d", "e", "f")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(3, 14)
    texts <- Gen.listOfN(n, Gen.choose(3, 10).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(pool)).map(_.mkString(" "))))
    mask <- Gen.listOfN(n, Gen.oneOf(true, false, false))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .zip(mask).map { case ((id, t), m) => (id, t, m) }
    .map { case (id, t, m) => (if (m) id + 1000L else id, t) }
  // ids ≥ 1000 are the "marked" subset (batch / deletion set)

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def edges(df: DataFrame): Set[Seq[Any]] =
    df.select(col("id1"), col("id2"), col("n_shared"), col("contain1"),
      col("contain2")).collect().map(_.toSeq).toSet

  test("ADMIT patch law: for random corpora, caps 1-3, and minShared 1-2, " +
    "applyGraphEdgePatch(standing, retireOnAdmit) equals the grown " +
    "corpus's base-only refresh") {
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 3), Gen.choose(1, 2)) {
      (rows, cap, ms) =>
        val base = rows.filter(_._1 < 1000L)
        val batch = rows.filter(_._1 >= 1000L)
        (base.nonEmpty && batch.nonEmpty) ==> {
          val b = docsDf(base)
          val fps = graft.CachedFrames.track(TextOps.graphIndexFps(b))
          val df = graft.CachedFrames.track(TextOps.graphIndexDfOf(fps))
          val sizes = TextOps.graphIndexSizesOf(fps, dfCap = cap)
          try {
            val standing = graft.CachedFrames.track(
              TextOps.containmentFromPostings(fps, cap, ms))
            val patch = TextOps.graphRetireOnAdmit(docsDf(batch), fps, df,
              sizes, cap, ms)
            val patched = edges(TextOps.applyGraphEdgePatch(standing, patch))
            val refresh = edges(TextOps.containmentFromPostings(
              TextOps.graphIndexFps(docsDf(base ++ batch)), cap, ms)
              .filter(col("id1") < 1000L && col("id2") < 1000L))
            patched == refresh
          } finally graft.CachedFrames.drain()
        }
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("FORGET patch law: for random corpora, caps 1-3, and minShared 1-2, " +
    "applyGraphForgetPatch(standing, ids, forgetEdgePatch) equals the " +
    "survivor refresh") {
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 3), Gen.choose(1, 2)) {
      (rows, cap, ms) =>
        val survivors = rows.filter(_._1 < 1000L)
        val deleted = rows.filter(_._1 >= 1000L)
        (survivors.nonEmpty && deleted.nonEmpty) ==> {
          val all = docsDf(rows)
          val ids = docsDf(deleted).select(col("doc_id"))
          val fps = graft.CachedFrames.track(TextOps.graphIndexFps(all))
          val df = graft.CachedFrames.track(TextOps.graphIndexDfOf(fps))
          val sizes = TextOps.graphIndexSizesOf(fps, dfCap = cap)
          try {
            val standing = graft.CachedFrames.track(
              TextOps.containmentFromPostings(fps, cap, ms))
            val patch = TextOps.graphForgetEdgePatch(ids, fps, df, sizes,
              cap, ms)
            val patched = edges(TextOps.applyGraphForgetPatch(standing, ids,
              patch))
            val refresh = edges(TextOps.containmentFromPostings(
              TextOps.graphIndexFps(docsDf(survivors)), cap, ms))
            patched == refresh
          } finally graft.CachedFrames.drain()
        }
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Laws of the containment-graph incremental face (BuildGraphIndex /
  * AdmitDocs / ExtendGraphIndex): admission against a persisted index
  * equals the from-scratch grown-corpus edges restricted to batch-incident
  * pairs, and extension equals the from-scratch rebuild table-for-table —
  * including the df-cap CROSSING bookkeeping (a fingerprint the batch
  * pushes over [[TextOps.ContainDfCap]] must drop from every doc's kept
  * set and every denominator). The q238 gate pins the admit law against
  * DuckDB at the production cap; this spec narrows the cap to 2 so a
  * hand-sized fixture exercises the crossing paths the gate corpus may
  * not reach. */
class GraphIndexSpec extends AnyFunSuite with SparkSpec {

  /** The engines' portable 56-bit md5 prefix (md5_prefix56 /
    * `('0x' || substr(md5(g),1,14))::BIGINT`) — recomputed here so the
    * fixture can CHOOSE token runs with known winnowing minima. */
  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16)
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def edgeSet(df: DataFrame): Set[(Long, Long, Long, Double, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).toSet

  /** A 7-token run whose two winnowing windows (w=4 over 5 trigrams) have
    * DISTINCT minima, with the minimum of window 1 at gram index 0 and of
    * window 2 at gram index 4 — so the doc's fingerprint set is exactly
    * {h(g0), h(g4)} and each fingerprint is reachable as the SOLE gram of
    * a 3-token doc. Deterministic search over a fixed token pool. */
  private lazy val sevenTok: (Seq[String], String, String) = {
    val pool = (0 until 40).map(i => s"t$i")
    val found = pool.combinations(7).flatMap(_.permutations).map { toks =>
      val grams = (0 to 4).map(i => toks.slice(i, i + 3).mkString(" "))
      val hs = grams.map(h56)
      if (hs.slice(0, 4).min == hs(0) && hs.slice(1, 5).min == hs(4) &&
          hs(0) != hs(4))
        Some((toks, grams(0), grams(4)))
      else None
    }.collectFirst { case Some(v) => v }
    found.getOrElse(fail("no 7-token fixture run found in the pool"))
  }

  test("fixture (cap = 2): admission drops a cap-crossing fingerprint " +
    "everywhere, keeps surviving batch-base and batch-batch edges, and " +
    "adjusts an incident base doc's denominator for its crossing") {
    val (toks, gA, gB) = sevenTok
    // base: D(1) carries fps {A, B}; D2(2) = gA alone shares A with D.
    // batch: D3(10) = gA pushes df(A) to 3 > 2 (A drops EVERYWHERE);
    //        D4(11) = gB shares B with D (df(B) = 2, kept);
    //        D5(12)/D6(13) = a fresh shared trigram (batch-batch edge).
    val base = docsDf(Seq(1L -> toks.mkString(" "), 2L -> gA))
    val batch = docsDf(Seq(10L -> gA, 11L -> gB,
      12L -> "u1 u2 u3", 13L -> "u1 u2 u3"))
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(base))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps, dfCap = 2)
    val admitted = try edgeSet(TextOps.graphAdmitAgainstIndex(
        batch, fps, df, sizes, dfCap = 2, minShared = 1))
      finally graft.CachedFrames.drain()
    // from-scratch truth on the grown corpus, restricted to incident pairs
    val grown = base.union(batch)
    val truth = try edgeSet(TextOps.containmentFromPostings(
        TextOps.graphIndexFps(grown), dfCap = 2, minShared = 1)
        .filter(col("id1") >= 10 || col("id2") >= 10))
      finally graft.CachedFrames.drain()
    assert(admitted === truth)
    // the shape itself: A crossed (no 1-2-incident edges survive via A,
    // and no edge touches D2 or D3 at all); D-D4 survives on B with D's
    // denominator ADJUSTED to 1 (2 stored fps minus 1 crossing) → 1.0;
    // the batch-batch pair is exact
    assert(admitted === Set(
      (1L, 11L, 1L, 1.0, 1.0),
      (12L, 13L, 1L, 1.0, 1.0)))
  }

  test("fixture (cap = 2): extend(build(base), batch) equals " +
    "build(base ∪ batch) table-for-table, dropping a base doc whose " +
    "whole fingerprint set crossed") {
    val (toks, gA, gB) = sevenTok
    val base = docsDf(Seq(1L -> toks.mkString(" "), 2L -> gA))
    val batch = docsDf(Seq(10L -> gA, 11L -> gB))
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(base))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps, dfCap = 2)
    val (fps2, df2, sizes2) =
      TextOps.graphIndexExtend(fps, df, sizes, batch, dfCap = 2)
    val grown = base.union(batch)
    def pairs(d: DataFrame) = d.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet
    try {
      assert(pairs(fps2) === pairs(TextOps.graphIndexFps(grown)))
      assert(pairs(df2) === pairs(TextOps.graphIndexDfOf(grown.transform(
        TextOps.graphIndexFps))))
      val s2 = pairs(sizes2)
      assert(s2 === pairs(TextOps.graphIndexSizesOf(
        TextOps.graphIndexFps(grown), dfCap = 2)))
      // D2's only fingerprint (A) crossed → it must VANISH from sizes
      assert(!s2.exists(_._1 == 2L))
      // D keeps exactly one fingerprint (B)
      assert(s2.contains((1L, 1L)))
    } finally graft.CachedFrames.drain()
  }

  test("sf0.001 law: extending the q238 base split with its batch equals " +
    "the from-scratch index of the full corpus, at the production cap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(base))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps)
    val (fps2, df2, sizes2) = TextOps.graphIndexExtend(fps, df, sizes, batch)
    val full = graft.CachedFrames.track(TextOps.graphIndexFps(docs))
    def pairs(d: DataFrame) = d.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet
    try {
      assert(pairs(fps2) === pairs(full))
      assert(pairs(df2) === pairs(TextOps.graphIndexDfOf(full)))
      assert(pairs(sizes2) === pairs(TextOps.graphIndexSizesOf(full)))
    } finally graft.CachedFrames.drain()
  }
  test("fixture (cap = 2): graphRetireOnAdmit emits exactly the implied " +
    "base-edge patch — one retirement (edge lost its only shared fp) and " +
    "one denominator update — and applying it reproduces the full refresh") {
    val (toks, gA, gB) = sevenTok
    // base: D(1) = {A, B}; D2(2) = gA shares A with D; D3(3) = gB shares
    // B with D. Standing base edges (minShared = 1): (1,2) on A, (1,3) on
    // B. batch: D10(10) = gA pushes df(A) to 3 > 2 — A drops everywhere,
    // so (1,2) RETIRES (no shared fps left) and (1,3) keeps n_shared = 1
    // but D's denominator shrinks 2 → 1 (contain1 0.5 → 1.0).
    val base = docsDf(Seq(1L -> toks.mkString(" "), 2L -> gA, 3L -> gB))
    val batch = docsDf(Seq(10L -> gA))
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(base))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps, dfCap = 2)
    val standing = graft.CachedFrames.track(TextOps.containmentFromPostings(
      fps, dfCap = 2, minShared = 1))
    val patch = graft.CachedFrames.track(TextOps.graphRetireOnAdmit(
      batch, fps, df, sizes, dfCap = 2, minShared = 1))
    try {
      val got = patch.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), Option(r.get(3)), Option(r.get(4)),
        r.getString(5))).toSet
      assert(got === Set(
        (1L, 2L, 0L, None, None, "retire"),
        (1L, 3L, 1L, Some(1.0), Some(1.0), "update")))
      val patched = edgeSet(TextOps.applyGraphEdgePatch(standing, patch))
      val refresh = edgeSet(TextOps.containmentFromPostings(
        TextOps.graphIndexFps(base.union(batch)), dfCap = 2, minShared = 1)
        .filter(col("id1") < 10 && col("id2") < 10))
      assert(patched === refresh)
    } finally graft.CachedFrames.drain()
  }

  test("sf0.001 law: patching the standing base edges with " +
    "graphRetireOnAdmit equals the full-refresh base\u2194base edges of the " +
    "grown corpus, at a cap the split actually crosses") {
    // cap 3 is BINDING for this split (86 base-kept fps cross when the
    // batch lands), so the law runs the retirement branches on organic
    // data, not just the hand fixture
    val cap = 3
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(base))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps, dfCap = cap)
    val standing = graft.CachedFrames.track(TextOps.containmentFromPostings(
      fps, dfCap = cap))
    val patch = graft.CachedFrames.track(TextOps.graphRetireOnAdmit(
      batch, fps, df, sizes, dfCap = cap))
    try {
      // the cap must actually bind, or this law tests nothing
      assert(patch.count() > 0)
      assert(patch.filter(col("op") === "retire").count() > 0)
      val patched = edgeSet(TextOps.applyGraphEdgePatch(standing, patch))
      val refresh = edgeSet(TextOps.containmentFromPostings(
        TextOps.graphIndexFps(docs), dfCap = cap)
        .filter(col("id1") % 5 =!= 0 && col("id2") % 5 =!= 0))
      assert(patched === refresh)
    } finally graft.CachedFrames.drain()
  }
  test("fixture (cap = 2): graphForgetEdgePatch CREATES the edge a deleted " +
    "doc's cap-crossing had suppressed, re-prices the affected survivor's " +
    "other edge, and applying it reproduces the survivor full refresh") {
    val (toks, gA, gB) = sevenTok
    // full corpus: D(1) = {A, B}, D2(2) = gA, D3(3) = gB, D10(10) = gA.
    // df(A) = 3 > 2 so A is DROPPED in the standing index; the only edge
    // is (1,3) via B with D's denominator 1. Forgetting D10 pulls A back
    // under the cap: edge (1,2) is CREATED (op add) and (1,3) re-prices
    // (D's denominator grows 1 → 2).
    val all = docsDf(Seq(1L -> toks.mkString(" "), 2L -> gA, 3L -> gB,
      10L -> gA))
    val ids = docsDf(Seq(10L -> "ignored")).select(col("doc_id"))
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(all))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps, dfCap = 2)
    val standing = graft.CachedFrames.track(TextOps.containmentFromPostings(
      fps, dfCap = 2, minShared = 1))
    val patch = graft.CachedFrames.track(TextOps.graphForgetEdgePatch(
      ids, fps, df, sizes, dfCap = 2, minShared = 1))
    try {
      val got = patch.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5))).toSet
      assert(got === Set(
        (1L, 2L, 1L, 0.5, 1.0, "add"),
        (1L, 3L, 1L, 0.5, 1.0, "update")))
      val patched = edgeSet(TextOps.applyGraphForgetPatch(standing, ids,
        patch))
      val refresh = edgeSet(TextOps.containmentFromPostings(
        TextOps.graphIndexFps(docsDf(Seq(1L -> toks.mkString(" "),
          2L -> gA, 3L -> gB))), dfCap = 2, minShared = 1))
      assert(patched === refresh)
    } finally graft.CachedFrames.drain()
  }

  test("sf0.001 law: patching the standing edges with graphForgetEdgePatch " +
    "after forgetting the even half equals the survivor full refresh, at " +
    "a cap the deletion actually un-drops") {
    val cap = 3
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ids = docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"))
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(docs))
    val df = TextOps.graphIndexDfOf(fps)
    val sizes = TextOps.graphIndexSizesOf(fps, dfCap = cap)
    val standing = graft.CachedFrames.track(TextOps.containmentFromPostings(
      fps, dfCap = cap))
    val patch = graft.CachedFrames.track(TextOps.graphForgetEdgePatch(
      ids, fps, df, sizes, dfCap = cap))
    try {
      assert(patch.count() > 0, "the cap must actually un-drop here")
      val patched = edgeSet(TextOps.applyGraphForgetPatch(standing, ids,
        patch))
      val refresh = edgeSet(TextOps.containmentFromPostings(
        TextOps.graphIndexFps(docs.filter(col("doc_id") % 2 =!= 0)),
        dfCap = cap))
      assert(patched === refresh)
    } finally graft.CachedFrames.drain()
  }
}

package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Span-level dedup semantics on a hand-built corpus where the expected
  * removals are knowable by eye (q53's oracle checks the full pipeline on
  * real data; this pins the unit behavior + edge cases). */
class SpanDedupSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.functions._

  // 8-token spans (DefaultSpanDedup.width = 8). doc 0 is the "earliest"
  // copy everywhere, so it must always survive intact.
  private val boiler = "one two three four five six seven eight"   // span A
  private val body0  = "alpha beta gamma delta epsilon zeta eta theta" // span B
  private val body1  = "iota kappa lambda mu nu xi omicron pi"     // span C
  private val nearB  = "alpha beta gamma delta epsilon zeta eta CHANGED"

  private def run(docs: Seq[(Long, String)]) = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    NearDup.spanDedupOn(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("exact cross-document span removal keeps the corpus-first copy") {
    val out = run(Seq(
      0L -> s"$boiler $body0",    // spans: A, B
      1L -> s"$boiler $body1"))   // spans: A (dup of doc 0's), C
    assert(out(0L) == ((2L, 2L, s"$boiler $body0")))
    val (n1, k1, t1) = out(1L)
    assert(n1 == 2L && k1 == 1L && t1 == body1) // boilerplate stripped
  }

  test("near-duplicate span (1 token of 8 changed) is removed from the later doc") {
    val out = run(Seq(
      0L -> s"$body0 $body1",
      1L -> s"$nearB $body1"))    // nearB ~ body0 (Jaccard of 3-gram shingles high)
    assert(out(0L)._2 == 2L)
    val (n1, k1, t1) = out(1L)
    // body1 span is an exact dup (removed); nearB is a near dup of body0
    assert(n1 == 2L && k1 <= 1L)
    if (k1 == 0L) assert(t1 == "")
  }

  test("identical spans inside ONE document dedup to the first occurrence") {
    val out = run(Seq(0L -> s"$boiler $boiler"))
    assert(out(0L) == ((2L, 1L, boiler)))
  }

  test("empty document: the scan-side n_spans formula agrees with the explode") {
    // n_spans is computed as ceil(|tokens| / width) straight off the scan
    // (no second explode); an empty text still yields one empty span, so
    // the two formulas must both say 1 — a divergence would break the
    // n_kept <= n_spans invariant
    val out = run(Seq(0L -> "", 1L -> body0))
    assert(out(0L) == ((1L, 1L, "")))
    assert(out(1L) == ((1L, 1L, body0)))
  }

  test("short tail span (< width tokens) round-trips and unique docs survive whole") {
    val tail = "tail tok"
    val out = run(Seq(
      0L -> s"$body0 $tail",      // spans: B, "tail tok" (2 tokens, no shingles)
      1L -> body1))
    assert(out(0L) == ((2L, 2L, s"$body0 $tail")))
    assert(out(1L) == ((1L, 1L, body1)))
  }

  test("q191 waterfall: each stage removes exactly its own duplication " +
    "kind — a whole-doc copy at stage 1, a span-aligned repeat at stage " +
    "2, a mid-offset substring repeat only stage 3 can see, and a fuzzy " +
    "near-dup pair NO exact stage catches at stage 4") {
    import spark.implicits._
    def toks(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i")
    val block = toks("p", 1, 8).mkString(" ")           // one exact span
    val d1 = s"$block ${toks("x", 1, 8).mkString(" ")}" // canonical, 16 tok
    val d3 = s"$block ${toks("y", 1, 8).mkString(" ")}" // span 1 = d1's
    // q1..q8 repeats across d4/d5 at offset 5 — NOT span-aligned, so span
    // dedup misses it (span texts differ) and substring dedup catches it
    val q8 = toks("q", 1, 8).mkString(" ")
    val d4 = s"${toks("w", 1, 4).mkString(" ")} $q8 ${toks("w", 5, 8).mkString(" ")}"
    val d5 = s"${toks("v", 1, 4).mkString(" ")} $q8 ${toks("v", 5, 8).mkString(" ")}"
    // d6/d7: the FUZZY pair — d7 is d6's 6-token prefix. Both are shorter
    // than SubstrW (no grams → stage 3 blind), not span-aligned copies
    // (different span text → stage 2's exact pass blind), and their
    // minhash-ESTIMATED Jaccard is 11/16 = 0.6875 < 0.75 (stage 2's LSH
    // gate blind) while the TRUE 3-shingle Jaccard is exactly 4/5 ≥ τ =
    // 0.8 and the signatures share one LSH band — only the consolidation
    // stage's candidate→exact-verify→keep-best path removes d7 (d6 wins
    // on quality: −28/34·4 > −24/29·4). Values verified by hand against
    // the md5/minhash formulas (deterministic — no seed, no flake).
    val d6 = (1 to 7).map(i => s"n1_$i").mkString(" ")
    val d7 = (1 to 6).map(i => s"n1_$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d1), (3L, d3), (4L, d4), (5L, d5),
      (6L, d6), (7L, d7)).toDF("doc_id", "text")
    val got = NearDup.dedupWaterfallOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      "raw" -> ((0, 7L, 93L, 0L, 1.0)),
      "exact_doc" -> ((1, 6L, 77L, 16L, 77.0 / 93.0)), // doc 2 = doc 1
      "span" -> ((2, 6L, 69L, 8L, 69.0 / 93.0)),   // doc 3 loses its block
      "substr" -> ((3, 6L, 61L, 8L, 61.0 / 93.0)), // doc 5 loses q1..q8
      "neardup" -> ((4, 5L, 55L, 6L, 55.0 / 93.0)))) // doc 7 consolidated
  }
}

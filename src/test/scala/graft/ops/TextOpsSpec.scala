package graft.ops

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with SparkSpec {

  test("q65 chunks reproduce an independent sliding-window reference exactly") {
    val sf = "/root/testdata/sf0.001"
    val got = TextOps.q65ChunkOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val (w, s) = (TextOps.ChunkWidth, TextOps.ChunkStride)
    var checked = 0
    docs.foreach { r =>
      val toks = r.getString(1).trim.split("\\s+")
      val nChunks = 1 + math.ceil(math.max(toks.length - w, 0) / s.toDouble).toInt
      (0 until nChunks).foreach { i =>
        val expect = toks.slice(i * s, i * s + w)
        val (n, text) = got((r.getLong(0), i))
        assert(n === expect.length, s"doc ${r.getLong(0)} chunk $i")
        assert(text === expect.mkString(" "), s"doc ${r.getLong(0)} chunk $i")
        checked += 1
      }
    }
    assert(checked > 100)
    assert(got.size === checked) // and not one chunk more
  }

  test("source drift L1 hits its boundary cases exactly") {
    import spark.implicits._
    // a/b: identical token distributions -> drift 0 from each other; c is
    // vocabulary-disjoint from both -> its distance to the rest is 2 only
    // when the rest is ALSO disjoint from it, so with a+b as the rest, c's
    // l1 must be exactly 2; a's rest (b+c) half-matches -> strictly between
    val docs = Seq(
      ("a", "x y z x y z"),
      ("b", "x y z x y z"),
      ("c", "p q r p q r")).toDF("source", "text")
    val got = TextOps.sourceDriftOn(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    graft.CachedFrames.drain()
    // fixed-point floor truncates each 1/3 term by < 1e-15 — exact up to
    // the declared quantization, not beyond it
    assert(math.abs(got("c") - 2.0) < 1e-12, got("c"))
    assert(got("a") === got("b"))
    assert(got("a") > 0.0 && got("a") < 2.0)
  }

  test("temperature mixing flattens toward uniform: small sources upsample, large downsample") {
    import spark.implicits._
    val uniform = Seq(("a", "w x y z"), ("b", "p q r s")).toDF("source", "text")
    val u = TextOps.temperatureMixOn(uniform).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    // equal shares: temperature is a no-op, upsample exactly 1 (both
    // sides of the quantized normalization see identical terms)
    assert(math.abs(u("a") - 1.0) < 1e-12 && math.abs(u("b") - 1.0) < 1e-12, u)
    val skewed = Seq(("big", Seq.fill(90)("w").mkString(" ")),
                     ("small", Seq.fill(10)("p").mkString(" "))).toDF("source", "text")
    val s = TextOps.temperatureMixOn(skewed).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain() // temperatureMixOn tracks its per-source agg
    assert(s("small")._2 > 1.0 && s("big")._2 < 1.0, s)
    // α=0.5 exactly: temp shares ∝ sqrt(0.9), sqrt(0.1)
    val expSmall = math.sqrt(0.1) / (math.sqrt(0.1) + math.sqrt(0.9))
    assert(math.abs(s("small")._1 - expSmall) < 1e-12, s)
  }

  test("winnowing guarantee: a shared w+k-1 token run yields a shared fingerprint") {
    import spark.implicits._
    // k=3, w=4: any shared run of 6 tokens must produce >= 1 shared
    // fingerprint — the property that makes winnowing a RELIABLE local
    // fingerprint, unlike sampling. Docs otherwise token-disjoint.
    val shared = "lorem ipsum dolor sit amet consectetur"
    val docs = Seq(
      (1L, s"aa bb cc dd $shared ee ff gg"),
      (2L, s"pp qq rr $shared ss tt uu vv ww"),
      (3L, "xx yy zz x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val fps = TextOps.winnowingOn(docs).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "shared run produced no shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "token-disjoint docs share a fingerprint")
    assert((fps(2L) & fps(3L)).isEmpty)
    // fingerprints are far fewer than grams (the point of winnowing): doc 1
    // has 10 tokens -> 8 grams but at most 5 window minima
    assert(fps(1L).size <= 5)
  }
}

package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class NearDupSpec extends AnyFunSuite with SparkSpec {

  test("q107 scoreboard: truth counts match a plain-Scala all-pairs Jaccard oracle, hits stay within truth") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = NearDup.q107LshScoreboard(spark, sf).collect()
        .map(r => r.getDouble(0) -> r).toMap
      assert(rows.keySet === Set(0.2, 0.5, 0.8))

      // independent truth: ALL-pairs exact Jaccard over the sample window,
      // computed from raw text with scala.collection Sets — no posting-list
      // join, no shared formula with the operator under test
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
        .filter(_._2.length >= 3)
        .map { case (id, t) => id -> t.sliding(3).map(_.mkString(" ")).toSet }
      val sample = docs.filter(_._1 < 100)
      val expTrue = scala.collection.mutable.Map(0.2 -> 0L, 0.5 -> 0L, 0.8 -> 0L)
      for ((a, sa) <- sample; (b, sb) <- docs if a < b) {
        val inter = (sa & sb).size
        if (inter > 0) {
          val j = inter.toDouble / (sa.size + sb.size - inter)
          expTrue.keys.foreach(t => if (j >= t) expTrue(t) += 1)
        }
      }
      expTrue.foreach { case (tau, n) =>
        assert(rows(tau).getLong(1) === n, s"n_true at $tau")
      }

      rows.values.foreach { r =>
        val (nTrue, nCand, nHit) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(nHit <= nTrue && nHit <= nCand, r.toString)
        assert(r.getDouble(4) === (if (nTrue > 0) nHit.toDouble / nTrue else 0.0))
        assert(r.getDouble(5) === (if (nCand > 0) nHit.toDouble / nCand else 0.0))
      }
      // truth can only shrink as the threshold rises
      assert(rows(0.2).getLong(1) >= rows(0.5).getLong(1))
      assert(rows(0.5).getLong(1) >= rows(0.8).getLong(1))
      // the planted near-dups exist and banding finds them all at this SF
      assert(rows(0.8).getLong(1) > 0L)
      assert(rows(0.8).getDouble(4) === 1.0)
    } finally graft.CachedFrames.drain()
  }

  test("q131 consolidation core: chains merge into one cluster, the best-quality doc keeps, singletons keep themselves") {
    import spark.implicits._
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9),  // chain 1-2-3: 2 and 3 tie on quality
      (4L, 0.1), (5L, 0.7),             // pair 4-5
      (6L, 0.0)                         // singleton
    ).toDF("doc_id", "quality_score")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val got = try NearDup.consolidateOn(scored, edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
      finally graft.CachedFrames.drain()
    // component = min member id; keeper = max quality, ties by lowest id
    assert(got(1L) === ((1L, 3L, 2L, false)))
    assert(got(2L) === ((1L, 3L, 2L, true)))   // 0.9 tie -> doc 2 beats doc 3
    assert(got(3L) === ((1L, 3L, 2L, false)))
    assert(got(4L) === ((4L, 2L, 5L, false)))
    assert(got(5L) === ((4L, 2L, 5L, true)))
    assert(got(6L) === ((6L, 1L, 6L, true)))   // singleton keeps itself
  }

  test("q131 end to end: exactly one keeper per cluster, keepers maximize quality, verdicts cover every document") {
    val sf = "/root/testdata/sf0.001"
    val rows = try NearDup.q131NeardupConsolidate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
      finally graft.CachedFrames.drain()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong === nDocs) // a verdict for every document
    rows.groupBy(_._2).foreach { case (comp, rs) =>
      assert(rs.count(_._6) === 1, s"cluster $comp")
      assert(rs.forall(_._4 === rs.length.toLong), s"cluster $comp size")
      val keeper = rs.find(_._6).get
      // keeper maximizes (quality, then lowest id) over the cluster
      assert(rs.forall(r => r._3 < keeper._3 ||
        (r._3 == keeper._3 && r._1 >= keeper._1)), s"cluster $comp keeper")
      assert(rs.forall(_._5 === keeper._1), s"cluster $comp keeper id")
      assert(comp === rs.map(_._1).min, s"cluster $comp is min member id")
    }
    // the planted near-dups produce at least one multi-doc cluster
    assert(rows.exists(_._4 > 1L))
  }

  test("q221 blocking quality: hand fixture pins all three scheme keys, " +
    "the exact candidate-pair arithmetic, and the coverage verdicts") {
    import spark.implicits._
    // doc 0 "aa bb cc" (8 ch), doc 1 "aa xx" (5 ch), doc 2 "zz yy" (100 ch
    // claimed) — len_bucket keys 0/0/1, first_token aa/aa/zz, prefix_8
    // distinct for all three. Truth pairs: (0,1) near-dup, (0,2) not.
    val docs = Seq((0L, "aa bb cc", 8L), (1L, "aa xx", 5L),
      (2L, "zz yy", 100L)).toDF("doc_id", "text", "n_chars")
    val truth = Seq((0L, 1L), (0L, 2L)).toDF("id1", "id2")
    val got = try NearDup.blockingQualityOn(docs, truth).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))).toMap
      finally graft.CachedFrames.drain()
    // len_bucket and first_token: blocks {2,1} → 1 candidate pair, rr =
    // 1 − 1/3; (0,1) co-blocked → pc 1/2, pq 1/1
    val coarse = ((2L, 1L, 1.0 - 1.0 / 3.0, 2L, 1L, Some(0.5), Some(1.0)))
    assert(got("len_bucket") === coarse)
    assert(got("first_token") === coarse)
    // prefix_8: all keys distinct → 0 candidates, rr exactly 1, pq NULL
    assert(got("prefix_8") === ((3L, 0L, 1.0, 2L, 0L, Some(0.0), None)))
  }

  test("q221 blocking quality: an empty truth set reports 0/0 coverage " +
    "with NULL completeness, never a division error") {
    import spark.implicits._
    val docs = Seq((0L, "aa", 2L), (1L, "aa", 2L))
      .toDF("doc_id", "text", "n_chars")
    val truth = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val got = try NearDup.blockingQualityOn(docs, truth).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5),
        r.isNullAt(6), if (r.isNullAt(7)) None else Some(r.getDouble(7)))))
      .toMap
      finally graft.CachedFrames.drain()
    assert(got("first_token") === ((0L, 0L, true, Some(0.0))))
    assert(got("prefix_8") === ((0L, 0L, true, Some(0.0))))
  }
}

package graft.ops

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q76 split is total, stable, and near the 80/10/10 design rates") {
    val rows = Curation.q76HashSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // total: every document gets exactly one verdict from the slot rule
    rows.foreach { case (id, h, split) =>
      assert(h >= 0 && h < 100, s"doc $id slot $h")
      val expected = if (h < 80) "train" else if (h < 90) "valid" else "test"
      assert(split === expected, s"doc $id")
    }
    // md5-uniform slots: rates near design (small-sample tolerance)
    val n = rows.length.toDouble
    val trainFrac = rows.count(_._3 == "train") / n
    assert(trainFrac > 0.65 && trainFrac < 0.95, s"train fraction $trainFrac")
    assert(rows.map(_._3).toSet === Set("train", "valid", "test"))
    // stability: re-running yields the identical assignment (no rand())
    assert(Curation.q76HashSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet ===
      rows.map(r => (r._1, r._3)).toSet)
  }

  test("q77 repeat counts bracket the mixture weight and average toward it") {
    val w = TextOps.q73TemperatureMix(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    graft.CachedFrames.drain()
    val rows = Curation.q77ApplyMixture(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    graft.CachedFrames.drain()
    assert(rows.nonEmpty)
    // each count is floor(w) or ceil(w); per-source mean sits between them
    rows.foreach { case (id, src, nRep) =>
      val wv = w(src)
      assert(nRep == math.floor(wv).toLong || nRep == math.ceil(wv).toLong,
        s"doc $id source $src: $nRep not in {floor,ceil}($wv)")
    }
    val bySource = rows.groupBy(_._2)
    bySource.foreach { case (src, docs) =>
      val mean = docs.map(_._3).sum.toDouble / docs.size
      assert(mean >= math.floor(w(src)) && mean <= math.ceil(w(src)), s"$src mean $mean")
    }
  }

  test("q70 shard positions are a dense 1..n_shard enumeration of the corpus") {
    val rows = Curation.q70ShuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === nDocs) // every doc assigned exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
    // (shard, pos) is a key, and positions are dense from 1 per shard
    assert(rows.map(r => (r._2, r._3)).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val pos = rs.map(_._3).sorted
      assert(pos === (1L to rs.length.toLong).toArray, s"shard $shard not dense")
    }
    // md5 keys spread the corpus: no empty shard at 500 docs / 8 shards,
    // and no shard hoards more than a third of the corpus
    val sizes = rows.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size === Curation.ShuffleShards)
    assert(sizes.values.max < rows.length / 3)
  }

  test("q101 corpus diff: added/removed/modified/unchanged verdicts cover " +
      "both snapshots exactly once") {
    import spark.implicits._
    val old = Seq(
      (1L, "same text"), (2L, "old version"), (3L, "gone soon")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same text"), (2L, "new version"), (4L, "brand new")).toDF("doc_id", "text")
    val got = Curation.corpusDiffOn(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "modified", 3L -> "removed", 4L -> "added"))
  }

  test("q71 incremental dedup: exact, near, and new verdicts; exact beats near") {
    import spark.implicits._
    // simhash hashes DISTINCT tokens, so a reordering/repetition of the
    // same token set fingerprints identically (hamming 0) while the md5
    // digest differs -> a guaranteed dup_near without banding luck
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven"),
      (12L, "unrelated corpus text about nothing else")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "  Alpha beta GAMMA delta epsilon zeta "), // equals 10 after lower+trim -> exact
      (2L, "two one three four five six seven six"),  // same token set as 11 -> near
      (3L, "totally disjoint vocabulary words here"), // new
      (4L, "one two three four five six seven")       // identical to 11: exact AND near -> exact wins
    ).toDF("doc_id", "text")
    val got = Curation.incrementalDedupOn(batch, corpus).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    graft.CachedFrames.drain()
    // doc 1: md5 uses lower(trim(text)) -> equals corpus 10 lowered? corpus
    // text is already lowercase, so lower-trim of batch 1 == corpus 10 text
    assert(got(1L) === (("dup_exact", 10L)))
    assert(got(2L) === (("dup_near", 11L)))
    assert(got(3L) === (("new", -1L)))
    assert(got(4L) === (("dup_exact", 11L)))
  }

  test("epoch plan: schedules exactly n_repeats occurrences per doc, packs " +
    "offsets densely per source, and is reproducible") {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = graft.Tables.parallelized(
      spark.read.parquet(s"$sf/documents.parquet"))
    val plan = Curation.epochPlanOn(docs, nShards = 4).cache()
    val rows = plan.collect()
    assert(rows.nonEmpty)
    // occurrence conservation: per (doc), plan rows == that doc's n_repeats
    val repeats = Curation.applyMixtureOn(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val occ = rows.groupBy(_.getLong(1)).map { case (d, rs) => d -> rs.length.toLong }
    occ.foreach { case (d, n) => assert(n === repeats(d), s"doc $d") }
    repeats.filter(_._2 > 0).keys.foreach(d => assert(occ.contains(d)))
    // the packing invariant: within a source, consecutive occurrences'
    // (seq_id, offset) positions are the running token sum — no gaps, no
    // overlaps (same check as q59, over the repeat-expanded stream)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r.getLong(1), r.getInt(2)))
      var running = 0L
      ordered.foreach { r =>
        val tokens = r.getLong(3)
        assert(r.getLong(4) === running / graft.ops.TextOps.PackSeqTokens)
        assert(r.getLong(5) === running % graft.ops.TextOps.PackSeqTokens)
        running += tokens
      }
    }
    // shard range + determinism under a second evaluation
    assert(rows.forall(r => r.getInt(6) >= 0 && r.getInt(6) < 4))
    val again = Curation.epochPlanOn(docs, nShards = 4).collect()
    assert(again.map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
    plan.unpersist()
    graft.CachedFrames.drain()
  }

  test("anonymize (q81): no digits survive masking, pseudo ids stay unique, " +
    "bands are 1000-unit multiples") {
    val rows = Curation.q81Anonymize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getString(1).exists(_.isDigit), s"unmasked digit in ${r.getString(1)}")
      assert(r.getInt(3) % 1000 === 0)
    }
    // pseudonymization, not suppression: the salted hash keeps rows joinable
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
  }

  test("k-anonymity audit (q82): class sizes sum to the table, meets_k = n >= k") {
    val rows = Curation.q82KAnonymity(spark, sf).collect()
    val total = graft.Tables(spark, sf, "customer").count()
    assert(rows.map(_.getLong(3)).sum === total)
    rows.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(3) >= Curation.KAnonK))
    }
  }

  test("q91 keeps the highest-quality member, not the min id, and ties break by doc_id") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val twin = "zulu yankee xray whiskey victor uniform sierra quebec papa oscar"
    val docs = Seq(
      (1L, base),           // near-dup of 2, quality 0 (no stopwords)
      (2L, base + " the the"), // higher quality (stopword ratio > 0)
      (3L, "lone wolf document with entirely distinct shingle content here"),
      (4L, twin),           // exact copy of 5 — identical quality, tie
      (5L, twin)
    ).toDF("doc_id", "text")
    val out = Curation.keepBestOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    graft.CachedFrames.drain()
    // two clusters; the singleton (3) never appears — it has no pair
    assert(out.map(_._1).toSeq === Seq(1L, 4L))
    val Array(c1, c4) = out
    // cluster {1,2}: 2 wins on quality even though 1 is the min id (q51's
    // policy would keep 1)
    assert(c1._2 === 2L && c1._3 === 2L && c1._4 > 0.0, c1) // stop bonus, no punct
    // cluster {4,5}: identical text => identical score; doc_id asc breaks it
    assert(c4._2 === 4L && c4._3 === 2L, c4)
  }

  test("q90 caps every source at DomainCap with dense ranks in quality order") {
    val rows = TextOps.q90DomainCap(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length <= TextOps.DomainCap, s"$src over cap")
      val ordered = rs.sortBy(_._4)
      // ranks are dense from 1 and follow (quality DESC, doc_id ASC)
      assert(ordered.map(_._4).toSeq === (1 to rs.length).toSeq, src)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"$src: $a !>= $b")
        case _ =>
      }
    }
  }

  test("q94 source quota admits exactly the k smallest doc_ids per source") {
    val rows = Curation.q94SourceQuota(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val admitted = rs.filter(_._3).map(_._2).sorted.toSeq
      val expected = rs.map(_._2).sorted.take(Curation.SourceQuotaK).toSeq
      assert(admitted === expected, s"$src admits the k smallest ids")
    }
  }

  test("q70 assignment is reproducible run to run") {
    // the window's order key (skey, doc_id) is total, so the assignment is
    // independent of input layout/parallelism — unlike rand() or
    // repartition-based shuffling, a retry cannot move a document
    val a = Curation.q70ShuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Curation.q70ShuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("q117 dedup savings: min-id keeper pins every copy on the later crawl") {
    val rows = Curation.q117DedupSavings(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val recrawl = rows(Curation.RecrawlSource)
    // every recrawl doc is a copy of an original with a lower id
    assert(recrawl.getAs[Long]("n_dup_docs") === recrawl.getAs[Long]("n_docs"))
    assert(recrawl.getAs[Double]("dup_token_frac") === 1.0)
    // the driver corpus itself is duplicate-free, so no original pays
    (rows - Curation.RecrawlSource).values.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") === 0L, s"source ${r.getString(0)}")
    }
  }

  test("q137 l-diversity recomputes from raw customers and flags the homogeneous classes q82 can pass") {
    val got = Curation.q137LDiversity(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getInt(0),
        math.floor(r.getDouble(1) / 1000.0).toInt * 1000, r.getString(2)))
    val expected = cust.groupBy(c => (c._1, c._2)).map { case (k, rs) =>
      val nd = rs.map(_._3).distinct.length.toLong
      k -> ((rs.length.toLong, nd, nd >= Curation.LDivL))
    }
    assert(got === expected.toMap)
    assert(got.nonEmpty)
    // the homogeneity attack is real on this fixture: at least one class
    // passes q82's size bar yet fails diversity (or is too small for both)
    got.values.foreach { case (n, nd, _) => assert(nd >= 1L && nd <= n) }
  }

  test("q144 t-closeness: hand-computed TVD on a crafted release (skewed " +
    "classes fail, a globally-proportional class passes, zero counts " +
    "contribute)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // global: A x9, B x3 over N=12; classes (1,0)/(2,0) diverge, (3,0)
    // matches the global mix exactly. (2,0) has NO B rows at all -- the
    // missing-segment grid cell must still contribute |0*N - C*n|.
    val rel = (Seq.fill(2)((1, 0, "A")) ++ Seq.fill(2)((1, 0, "B")) ++
      Seq.fill(4)((2, 0, "A")) ++
      Seq.fill(3)((3, 0, "A")) ++ Seq.fill(1)((3, 0, "B")))
      .toDF("c_nationkey", "acctbal_band", "c_mktsegment").repartition(3)
    val got = Curation.tClosenessOn(rel).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got === Map(
      (1, 0) -> ((4L, 0.25, false)),
      (2, 0) -> ((4L, 0.25, false)),
      (3, 0) -> ((4L, 0.0, true))))
  }

  test("q150 pps sample: hand-computed boundary crossings — light docs " +
    "skipped, a doc heavier than the step keeps multiplicity > 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // weights 10,30,10,50 in doc_id order, k=4 -> total=100, step=25;
    // running 10,40,50,100 -> crossings 0,1,1,2
    val docs = Seq((1L, "w", 10L), (2L, "w", 30L), (3L, "b", 10L),
      (4L, "b", 50L)).toDF("doc_id", "source", "n_chars").repartition(3)
    val got = Curation.ppsSampleOn(docs, 4L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      2L -> (("w", 30L, 40L, 1L)),
      3L -> (("b", 10L, 50L, 1L)),
      4L -> (("b", 50L, 100L, 2L))))
    // multiplicities sum to k when total divides evenly
    assert(got.values.map(_._4).sum === 4L)
  }

  test("q165 cluster-fair sample: a 2-doc duplicate cluster gets the same " +
    "total representation as each singleton (hand-exact multiplicities)") {
    import spark.implicits._
    // TA duplicated (docs 1,2) -> 360360 each; TB, TC singletons -> 720720
    val docs = Seq((1L, "w", "TA"), (2L, "w", "TA"), (3L, "b", "TB"),
      (4L, "b", "TC")).toDF("doc_id", "source", "text").repartition(3)
    val got = Curation.clusterFairSampleOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    // total 2162160, step 21621: cumulative cuts 16 | 33 | 66 | 100
    assert(got === Map(
      1L -> ((360360L, 16L)), 2L -> ((360360L, 17L)),
      3L -> ((720720L, 33L)), 4L -> ((720720L, 34L))))
    // the fairness claim: cluster totals within one boundary of each other
    val ta = got(1L)._2 + got(2L)._2
    assert(math.abs(ta - got(3L)._2) <= 1L &&
      math.abs(ta - got(4L)._2) <= 1L)
  }

  test("q180 Neyman: allocations sum EXACTLY to the budget and match the " +
    "plain-Scala BigInt largest-remainder apportionment; a zero-variance " +
    "stratum gets nothing") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x y z"), ("a", "x"),                 // nts 3,1 → s² = 2
      ("b", "p q r s t"), ("b", "p q r s t"),     // nts 5,5 → s² = 0
      ("c", "m n"), ("c", "m n o p q r"))         // nts 2,6 → s² = 8
      .toDF("source", "text")
    val rows = graft.ops.Curation.neymanOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    val budget = 1000L
    assert(rows.values.map(_._3).sum === budget)
    assert(rows("b")._3 === 0L) // zero variance → zero weight → zero seats
    // plain-Scala oracle: BigInt floor quotas + largest remainders
    val wfx = rows.view.mapValues(_._2).toMap
    val tot = BigInt(wfx.values.sum)
    val floorQ = wfx.view.mapValues(w => BigInt(budget) * w / tot).toMap
    val rem = wfx.view.mapValues(w => (BigInt(budget) * w) % tot).toMap
    val extra = budget - floorQ.values.map(_.toLong).sum
    val seats = rem.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(extra.toInt).map(_._1).toSet
    rows.foreach { case (s, (_, _, alloc)) =>
      val expected = floorQ(s).toLong + (if (seats(s)) 1L else 0L)
      assert(alloc === expected, s)
    }
  }

  test("q194 source HHI: hand corpus gives the exact integer-ratio HHI " +
    "and effective count; a single source scores exactly 1/1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // tokens: a=6, b=3, c=1 → T=10, Σc²=46 → hhi=0.46, eff=100/46
    val docs = Seq(
      ("a", "t1 t2 t3"), ("a", "t4 t5 t6"),
      ("b", "u1 u2 u3"), ("c", "v1")).toDF("source", "text")
    val r = Curation.sourceHhiOn(docs).collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 10L)
    assert(r.getDouble(2) === 46.0 / 100.0)
    assert(r.getDouble(3) === 100.0 / 46.0)
    val one = Curation.sourceHhiOn(
      Seq(("x", "w1 w2 w3")).toDF("source", "text")).collect()(0)
    assert(one.getDouble(2) === 1.0 && one.getDouble(3) === 1.0)
  }

  test("q197 contingency grid: full lang×source cross including the EMPTY " +
    "cell, expected and Pearson residuals bitwise equal to the plain-" +
    "Scala BigInt formula; an independent 2×2 grid has residual 0 " +
    "everywhere") {
    import spark.implicits._
    // de×books is the empty cell: n_obs 0, negative residual
    val counts = Map(("en", "web") -> 5, ("en", "books") -> 3,
      ("fr", "web") -> 2, ("fr", "books") -> 4, ("de", "web") -> 6)
    val docs = counts.toSeq.flatMap { case ((l, s), n) =>
      Seq.fill(n)((l, s))
    }.toDF("lang", "source")
    val langs = counts.keys.map(_._1).toSet
    val sources = counts.keys.map(_._2).toSet
    val n = counts.values.sum
    val got = Curation.contingencyGridOn(docs, "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    graft.CachedFrames.drain()
    assert(got.keySet === (for (l <- langs; s <- sources) yield (l, s)))
    got.foreach { case ((l, s), (o, e, res, lift)) =>
      val oExp = counts.getOrElse((l, s), 0)
      val rl = BigInt(counts.collect { case ((`l`, _), c) => c }.sum)
      val cs = BigInt(counts.collect { case ((_, `s`), c) => c }.sum)
      assert(o === oExp.toLong, s"($l,$s)")
      assert(e === (rl * cs).toDouble / n.toDouble, s"expected ($l,$s)")
      assert(res === (BigInt(oExp) * n - rl * cs).toDouble /
        math.sqrt((BigInt(n) * rl * cs).toDouble), s"residual ($l,$s)")
      assert(lift === (BigInt(oExp) * n).toDouble / (rl * cs).toDouble,
        s"lift ($l,$s)")
    }
    assert(got(("de", "books"))._1 === 0L)
    assert(got(("de", "books"))._3 < 0.0)
    assert(got(("de", "books"))._4 === 0.0)
    // perfectly independent 2×2 (o = r·c/N exactly) → residual 0, lift 1
    val ind = Seq.fill(4)(("en", "web")) ++ Seq.fill(2)(("en", "books")) ++
      Seq.fill(2)(("fr", "web")) ++ Seq.fill(1)(("fr", "books"))
    val g2 = Curation.contingencyGridOn(ind.toDF("lang", "source"),
      "lang", "source").collect().map(r => (r.getDouble(4), r.getDouble(5)))
    graft.CachedFrames.drain()
    assert(g2.forall { case (res, lift) => res === 0.0 && lift === 1.0 })
  }

  test("q202 dup FoF: cluster sizes count under q25 normalization, the " +
    "Good-Turing ladder reads the k+1 row (0 at the top), shares sum " +
    "to 1") {
    import spark.implicits._
    // clusters: {a,A-padded,a} k=3; {b,b} k=2; {c,c} k=2; d,e,f singletons
    val texts = Seq("a", " A ", "a", "b", "b", "c", "c", "d", "e", "f")
    val got = Curation.dupFofOn(texts.toDF("text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    graft.CachedFrames.drain()
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((3L, 3L, 3.0 / 10.0, 2.0 * 2.0 / 10.0)))
    assert(got(2L) === ((2L, 4L, 4.0 / 10.0, 3.0 * 1.0 / 10.0)))
    assert(got(3L) === ((1L, 3L, 3.0 / 10.0, 0.0)))
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-15)
  }
}

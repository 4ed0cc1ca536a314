package graft.ops

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with SparkSpec {

  test("distributedRunningSum equals the single per-source window on a " +
    "skewed single-source fixture, and actually range-buckets it") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one dominant source (the 100 TB failure mode: web crawl ≫ rest),
    // non-contiguous doc_ids, plus a tiny second source for the join path
    val rows = (0 until 500).map(i => ("crawl", i * 7L + 3, (i % 13 + 1).toLong)) ++
      (0 until 5).map(i => ("books", i * 11L, (i % 3 + 1).toLong))
    val df = spark.createDataset(rows).toDF("source", "doc_id", "n_tokens")
      .repartition(8)
    val got = TextOps.distributedRunningSum(df, "n_tokens", Seq("doc_id"), df)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("running", sum(col("n_tokens")).over(w))
    assert(got.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
    // the running-sum stage must shuffle on (source, _bkt) — B-way parallel
    // within the dominant source, not one task for all 500 crawl rows
    val p = got.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(source#\\d+, _bkt".r.findFirstIn(p).isDefined, p)
    // and the bucketing must really split the big source: crawl doc_ids span
    // [3, 3496] with width ((3493 DIV 32)+1) = 110 → 32 occupied buckets
    val crawlBuckets = got.filter(col("source") === "crawl")
      .select((col("doc_id") - 3).divide(110).cast("long")).distinct().count()
    assert(crawlBuckets === TextOps.PrefixSumBuckets.toLong)
  }

  test("distributedRunningSum keeps NULL-source rows as their own partition " +
    "(null-safe joins), matching the window's PARTITION BY semantics") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rows: Seq[(Option[String], Long, Long)] =
      (0 until 40).map(i => (None: Option[String], i * 3L, (i % 5 + 1).toLong)) ++
      (0 until 10).map(i => (Some("books"), i * 2L, (i % 3 + 1).toLong))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.map {
        case (s, d, n) => org.apache.spark.sql.Row(s.orNull, d, n)
      }), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .repartition(4)
    val got = TextOps.distributedRunningSum(df, "n_tokens", Seq("doc_id"), df)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("running", sum(col("n_tokens")).over(w))
    assert(got.count() === 50) // every NULL-source row survives
    assert(got.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
  }

  test("q92 LM bits reproduce an independent bigram-LM reference exactly") {
    import spark.implicits._
    // doc 0 and 10 form the reference slice (doc_id % 10 = 0); 1 and 7 are
    // scored against it, incl. OOV tokens and an unseen bigram of seen words
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (10L, "the dog sat on the log"),
      (1L, "the cat sat on the log"),  // seen words, one novel bigram path
      (7L, "purple zebra the cat")     // OOV head + seen tail
    ).toDF("doc_id", "text")
    val got = TextOps.lmBitsOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    graft.CachedFrames.drain()
    // independent reference: plain Scala maps over the same formulas
    val refToks = Seq("the cat sat on the mat", "the dog sat on the log")
      .map(_.split("\\s+").toSeq)
    val uni = refToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = refToks.flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = refToks.map(_.size).sum.toDouble
    // the 7-token reference vocab is under the V=16 cut, so no token maps
    // to <oov> — but the reserved <oov> row still counts in V (c_oov = 0),
    // exactly as a tokenizer reserves its <unk> slot
    val v = uni.size.toDouble + 1.0
    def bits(inv: Long): Long = java.lang.Long.toBinaryString(inv).length.toLong
    def cost(toks: Seq[String]): (Long, Long) = {
      val costs = toks.zipWithIndex.map { case (w, i) =>
        val inv =
          if (i == 0) math.floor((n + v + 1.0) / (uni.getOrElse(w, 0L) + 1.0)).toLong
          else math.floor((uni.getOrElse(toks(i - 1), 0L) + v + 1.0) /
            (big.getOrElse((toks(i - 1), w), 0L) + 1.0)).toLong
        bits(inv)
      }
      (toks.size.toLong, costs.sum)
    }
    for ((id, text) <- Seq(0L -> "the cat sat on the mat",
        10L -> "the dog sat on the log", 1L -> "the cat sat on the log",
        7L -> "purple zebra the cat")) {
      val (nt, sb) = cost(text.split("\\s+").toSeq)
      val row = got.find(_._1 == id).get
      assert(row._2 === nt, s"doc $id n_tokens")
      assert(row._3 === sb, s"doc $id sum_bits")
      assert(row._4 === sb.toDouble / nt.toDouble, s"doc $id avg_bits")
    }
    // in-reference docs compress better than the OOV-heavy outsider
    assert(got.find(_._1 == 0L).get._4 < got.find(_._1 == 7L).get._4)
  }

  test("q92 vocab cut engages past V ref tokens: bounded tables, <oov> residual") {
    import spark.implicits._
    // 20 distinct reference tokens (> V=16), token i appearing 21-i times:
    // the top-16 is t00..t15 (all counts distinct, no tie-break needed);
    // t16..t19 (counts 5,4,3,2) collapse into <oov>
    val refText = (0 until 20).flatMap(i => Seq.fill(21 - i)(f"t$i%02d")).mkString(" ")
    val docs = Seq((0L, refText), (1L, "t00 t19 t17")).toDF("doc_id", "text")
    try {
      val (uni, big, nv) = TextOps.lmTables(docs)
      val uniRows = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(uniRows.size === TextOps.LmVocabV + 1) // bounded by construction
      assert(uniRows(TextOps.LmOov) === 5L + 4L + 3L + 2L) // residual mass
      assert(uniRows.contains("t15") && !uniRows.contains("t16"))
      assert(big.count() <= (TextOps.LmVocabV + 1L) * (TextOps.LmVocabV + 1L))
      val nvRow = nv.collect().head
      assert(nvRow.getDouble(0) === 230.0) // lm_n: total mass is preserved
      assert(nvRow.getDouble(1) === 17.0)  // lm_v counts mapped symbols
      assert(nvRow.getDouble(2) === 14.0)  // c_oov
      // hand-derived scoring of the OOV-heavy doc 1 "t00 t19 t17":
      //   t00           floor((230+17+1)/(21+1)) = 11      -> 4 bits
      //   t19 | t00     cb(t00,<oov>) = 0 -> floor(39/1)   -> 6 bits
      //   t17 | t19     c_prev = c_oov = 14, cb(<oov>,<oov>) = 13
      //                 -> floor(32/14) = 2                -> 2 bits
      val r1 = TextOps.lmBitsOn(docs).collect().find(_.getLong(0) == 1L).get
      assert(r1.getLong(1) === 3L)
      assert(r1.getLong(2) === 12L)
    } finally graft.CachedFrames.drain()
  }

  test("q93 DSIR weights reproduce an independent reference; en-like docs up-weight") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // two clearly-en docs (stopword-heavy), two es docs, one 1-token doc
    val texts = Seq(
      (1L, "the cat and the dog of the house went to the garden"),
      (2L, "the sun and the moon of the sky belong to the night"),
      (3L, "el perro y el gato de la casa que corre la calle"),
      (4L, "la luna y el sol de la noche que brilla el cielo"),
      (5L, "solitary"))
    val docs = texts.toDF("doc_id", "text")
    val got = TextOps.dsirOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    graft.CachedFrames.drain()
    // independent reference in plain Scala
    val stopEn = Set("the", "a", "of", "and", "to")
    val stopEs = Set("el", "la", "de", "y", "que")
    val stopDe = Set("der", "die", "und", "das", "ist")
    def lang(toks: Seq[String]): String = {
      val (e, s, d) = (toks.count(stopEn), toks.count(stopEs), toks.count(stopDe))
      if (e >= s && e >= d) "en" else if (s >= d) "es" else "de"
    }
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("dsir:" + g).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16) % TextOps.DsirBuckets
    }
    val grams = texts.flatMap { case (id, t) =>
      val toks = t.split("\\s+").toSeq
      if (toks.size < 2) Seq.empty
      else toks.sliding(2).map(p => (id, lang(toks), bucket(p.mkString(" ")))).toSeq
    }
    val nRaw = grams.size.toDouble
    val nTgt = grams.count(_._2 == "en").toDouble
    val cRaw = grams.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cTgt = grams.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    def delta(b: Long): Long =
      bits(math.floor((nRaw + TextOps.DsirBuckets) / (cRaw.getOrElse(b, 0L) + 1.0)).toLong) -
        bits(math.floor((nTgt + TextOps.DsirBuckets) / (cTgt.getOrElse(b, 0L) + 1.0)).toLong)
    for ((id, t) <- texts) {
      val toks = t.split("\\s+").toSeq
      val ds = if (toks.size < 2) Seq.empty
        else toks.sliding(2).map(p => delta(bucket(p.mkString(" ")))).toSeq
      val row = got.find(_._1 == id).get
      assert(row._2 === ds.size.toLong, s"doc $id n_grams")
      assert(row._3 === ds.sum, s"doc $id w_bits")
      assert(row._4 === (ds.sum > 0), s"doc $id selected")
    }
    // the gram-less doc surfaces with zeros, unselected
    assert(got.find(_._1 == 5L).get === ((5L, 0L, 0L, false)))
    // direction: target-like (en) docs weigh at least as much as es docs
    val wOf = got.map(r => r._1 -> r._3).toMap
    assert(Seq(1L, 2L).map(wOf).min >= Seq(3L, 4L).map(wOf).max)
  }

  test("q95 CMS heavy hitters reproduce an independent sketch; never undercount") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // skewed token frequencies + enough distinct tokens that buckets matter
    val docs = (1L to 30L).map { i =>
      val hot = Seq.fill(10)("alpha") ++ Seq.fill(5)("beta")
      val cold = (0 until 8).map(j => s"tok${(i * 13 + j) % 97}")
      (i, (hot ++ cold).mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextOps.heavyHittersOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.CachedFrames.drain()
    // independent reference: plain-Scala CMS with the same salted hashes
    def bucket(r: Int, tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cms$r:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16) % TextOps.CmsWidth
    }
    val allToks = (1L to 30L).flatMap { i =>
      val hot = Seq.fill(10)("alpha") ++ Seq.fill(5)("beta")
      val cold = (0 until 8).map(j => s"tok${(i * 13 + j) % 97}")
      hot ++ cold
    }
    val sketch = Array.fill(TextOps.CmsDepth, TextOps.CmsWidth)(0L)
    allToks.foreach(t =>
      (0 until TextOps.CmsDepth).foreach(r => sketch(r)(bucket(r, t).toInt) += 1))
    val exact = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val topK = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(TextOps.CmsTopK)
    assert(got.map(_._1).toSet === topK.map(_._1).toSet)
    for ((tok, ex, est, over) <- got) {
      val refEst = (0 until TextOps.CmsDepth).map(r => sketch(r)(bucket(r, tok).toInt)).min
      assert(ex === exact(tok), s"$tok exact")
      assert(est === refEst, s"$tok estimate")
      assert(est >= ex, s"$tok CMS must never undercount")
      assert(over === est - ex, s"$tok overcount")
    }
    // the two hot tokens dominate the top-k
    assert(got.find(_._1 == "alpha").get._2 === 300L)
    assert(got.find(_._1 == "beta").get._2 === 150L)
  }

  test("q96 PII scan counts and masks each rule; clean text passes untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@mail-host.co.uk or bob@ex.io thanks"),
      (2L, "ssn 123-45-6789 phone 415-555-0199 also 415.555.0100 ok"),
      (3L, "id 123456789 and longer 98765432109876 but not 12345678"),
      (4L, "a perfectly clean document with no identifiers at all"),
      (5L, "mixed bob@ex.io then 987-65-4321 then 212 555 0123 then 555666777")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScanOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).sortBy(_._1)
    val expected = Seq(
      (1L, 2L, 0L, 0L, 0L,
        "contact me at <email> or <email> thanks"),
      (2L, 0L, 1L, 2L, 0L,
        "ssn <ssn> phone <phone> also <phone> ok"),
      (3L, 0L, 0L, 0L, 2L,
        "id <id> and longer <id> but not 12345678"),
      (4L, 0L, 0L, 0L, 0L,
        "a perfectly clean document with no identifiers at all"),
      (5L, 1L, 1L, 1L, 1L,
        "mixed <email> then <ssn> then <phone> then <id>"))
    assert(got.toSeq === expected)
  }

  test("q97 BPE merges reproduce the classic low/lower/lowest table by hand") {
    import spark.implicits._
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainOn(docs, 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    graft.CachedFrames.drain()
    // ties at n=5 ('l o' vs 'o w') break pair-ascending; each later round
    // counts over the RESPELLED vocabulary
    assert(got === Seq(
      (1, "l o", 5L), (2, "lo w", 5L), (3, "low e", 2L),
      (4, "lowe r", 1L), (5, "lowe s", 1L)))
  }

  test("q97 respell converges on repeated-symbol runs and stops when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainOn(docs, 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    graft.CachedFrames.drain()
    // 'a a a a' → greedy non-overlapping passes give 'aa aa' (3 adjacent
    // pairs counted, two merge applications), then 'aaaa'; round 3 finds
    // no pairs and training stops early with 2 rows, matching the oracle's
    // empty-best rounds
    assert(got === Seq((1, "a a", 3L), (2, "aa aa", 1L)))
  }

  test("q98 BPE encode applies the trained merges token-faithfully (hand-computed)") {
    import spark.implicits._
    // merges trained on this corpus: l o → lo w → low e → lowe r → lowe s
    // (the q97 golden table; doc 2's xyz only thickens 'l o' / 'o w').
    // Encoding: low → [low] (1), lower → [lower] (1), lowest → [lowes, t]
    // (2: 'lowe s' fires but nothing merges the trailing t), xyz →
    // [x, y, z] (3: no trained merge touches it)
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "low xyz")).toDF("doc_id", "text")
    val got = TextOps.bpeEncodeOn(docs, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      1L -> ((5L, 20L, 6L)),   // 3×low + lower + lowes,t
      2L -> ((2L, 6L, 4L))))   // low + x,y,z
  }

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

  test("q112 Gopher rules attribute each failure to the right rule") {
    import spark.implicits._
    val good = "the cat and the dog sat of a mat to watch the other animals play"
    val docs = Seq(
      (1L, good),                                     // passes everything
      (2L, "too short"),                              // r_word_count
      (3L, ("12345 " * 12).trim),                     // digit ratio + stopwords + mean len (5.0 ok) — digits fail
      (4L, good + " " + "x" * 40),                    // r_max_word_len
      (5L, "a a a a a a a a a a the")                 // mean word len 1.09 < 2.0
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRulesOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("admit"))
    assert(got(1L).getAs[Int]("n_failed") === 0)
    assert(!got(2L).getAs[Boolean]("r_word_count"))
    assert(!got(3L).getAs[Boolean]("r_digit_ratio"))
    assert(!got(3L).getAs[Boolean]("r_stopwords"))
    assert(!got(4L).getAs[Boolean]("r_max_word_len"))
    assert(got(4L).getAs[Int]("n_failed") === 1)
    assert(!got(5L).getAs[Boolean]("r_mean_word_len"))
    assert(!got(2L).getAs[Boolean]("admit") && !got(3L).getAs[Boolean]("admit"))
  }

  test("q116 curriculum stages anneal: wider stages strictly contain earlier ones") {
    val rows = TextOps.q116Curriculum(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // stage is monotone non-increasing in band: a better band never enters later
    rows.foreach { r =>
      val (band, stage) = (r.getInt(2), r.getInt(3))
      assert(stage >= 1 && stage <= 3)
      if (band >= TextOps.CurriculumStage1Band) assert(stage === 1)
      else if (band >= TextOps.CurriculumStage2Band) assert(stage === 2)
      else assert(stage === 3)
    }
    // the anneal is real on this corpus: at least two stages are populated
    assert(rows.map(_.getInt(3)).distinct.length >= 2)
  }

  test("q121 label propagation: majority vote, ascending-label ties, labeled docs never vote on themselves") {
    import spark.implicits._
    // doc ids: % 5 == 0 are the unlabeled dsts (0, 5, 10); others labeled
    val labels = Seq(
      (0L, "zz"), (5L, "zz"), (10L, "zz"), // true labels of the unlabeled slice
      (1L, "en"), (2L, "en"), (3L, "de"),
      (6L, "de"), (7L, "en"),
      (11L, "es")
    ).toDF("doc_id", "lang")
    val edges = Seq(
      (0L, 1L), (0L, 2L), (3L, 0L),  // 0: en x2, de x1 -> en (majority)
      (5L, 6L), (7L, 5L),            // 5: de x1, en x1 -> de (tie, 'de' < 'en')
      (10L, 11L),                    // 10: es x1 -> es
      (10L, 5L),                     // unlabeled src never votes
      (1L, 2L)                       // labeled dst never appears in output
    ).toDF("id1", "id2")
    val got = TextOps.labelPropagationOn(edges, labels).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got === Map(
      0L -> (("en", 2L, false)),
      5L -> (("de", 1L, false)),
      10L -> (("es", 1L, false))))
  }

  test("q114 Bloom filter is bounded, has no false negatives, flags real overlap") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    // the bitmap is ≤ BloomBuckets rows BY CONSTRUCTION (pos DIV 32 groups)
    graft.functions.GraftFunctions.register(spark)
    val bits = TextOps.bloomBitsOf(TextOps.decontamBenchGrams(docs))
    assert(bits.count() <= TextOps.BloomBuckets.toLong)
    val rows = TextOps.q114BloomDecontam(spark, dir).collect()
    graft.CachedFrames.drain()
    assert(rows.nonEmpty)
    // a Bloom filter can only over-approximate the exact membership test
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_exact_hits"),
        s"false negative at doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Boolean]("bloom_flag") ||
        !r.getAs[Boolean]("exact_flag"))
    }
  }

  test("q127 PageRank replays a plain-Scala integer oracle on a crafted graph; the hub outranks its leaves") {
    import spark.implicits._
    // star: hub 1 touches 2,3,4,5; a detached pair 6-7
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
      .toDF("id1", "id2")
    val got = try TextOps.pagerankOn(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      finally graft.CachedFrames.drain()
    // independent reference: same fixed-point floor arithmetic, plain Scala
    val s = TextOps.PageRankScale
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val nn = deg.size.toLong
    var r = deg.keys.map(n => n -> s / nn).toMap
    for (_ <- 1 to TextOps.PageRankRounds) {
      val contrib = r.map { case (n, v) => n -> v / deg(n) }
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => contrib(e._1)).sum }
      r = in.map { case (n, c) => n -> ((15L * s) / (100L * nn) + (85L * c) / 100L) }
    }
    assert(got.view.mapValues(_._1).toMap === r)
    got.foreach { case (n, (ri, rd)) => assert(rd === ri.toDouble / 1e12, s"node $n") }
    // the hub holds the component's mass; its leaves tie below it
    assert(Seq(2L, 3L, 4L, 5L).forall(l => got(1L)._1 > got(l)._1))
    assert(got(2L)._1 === got(3L)._1 && got(6L)._1 === got(7L)._1)
  }

  test("q129 quantile normalization: per-source ranks are a bijection and qnorm is the exact percentile") {
    val rows = try TextOps.q129QuantileNormalize(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3),
        r.getLong(4), r.getDouble(5)))
      finally graft.CachedFrames.drain()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (source, rs) =>
      // n_source is the group size everywhere; ranks are exactly 1..n in
      // (quality, doc_id) order; qnorm is (rank-1)/(n-1) and spans [0, 1]
      assert(rs.forall(_._5 === rs.length.toLong), source)
      val sorted = rs.sortBy(r => (r._3, r._1))
      assert(sorted.map(_._4).toSeq === (1 to rs.length), source)
      sorted.foreach { r =>
        val expected = if (rs.length == 1) 0.5
          else (r._4 - 1).toDouble / (rs.length - 1).toDouble
        assert(r._6 === expected, s"$source doc ${r._1}")
      }
      assert(sorted.head._6 === 0.0 || rs.length == 1)
      assert(sorted.last._6 === 1.0 || rs.length == 1)
    }
  }

  test("q133 PMI pairs reproduce a plain-Scala recomputation of counts and lift on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = try TextOps.q133PmiPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      finally graft.CachedFrames.drain()
    // independent oracle: whitespace tokens, adjacent bigrams, the same
    // left-associated lift arithmetic
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val docToks = texts.map(t => t.trim.split("\\s+").toSeq)
    val uni = docToks.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val bigs = docToks.flatMap(ts => ts.zip(ts.drop(1)))
    val big = bigs.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val nTok = docToks.map(_.length.toLong).sum
    val nBig = bigs.length.toLong
    val expected = big.toSeq
      .filter(_._2 >= TextOps.PmiMinSupport)
      .map { case ((w1, w2), nxy) =>
        val lift = nxy.toDouble * nTok.toDouble * nTok.toDouble /
          (nBig.toDouble * uni(w1).toDouble * uni(w2).toDouble)
        (w1, w2, nxy, uni(w1), uni(w2), lift)
      }
      .sortBy(r => (-r._6, r._1, r._2))
      .take(TextOps.PmiTopK)
    assert(got.toSeq === expected)
    assert(got.nonEmpty)
    // a collocation lifts above independence by construction of the cut
    assert(got.forall(_._6 > 0.0))
  }

  test("q139 lexical health reproduces plain-Scala per-source token/type/hapax counts on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = TextOps.q139HapaxTtr(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val counts = rs.flatMap(_._2.trim.split("\\s+")).groupBy(identity)
        .map { case (_, xs) => xs.length.toLong }
      val (toks, types) = (counts.sum, counts.size.toLong)
      val hapax = counts.count(_ == 1L).toLong
      src -> ((toks, types, hapax,
        types.toDouble / toks.toDouble, hapax.toDouble / types.toDouble))
    }
    assert(got === expected.toMap)
    assert(got.nonEmpty)
    // structural sanity: hapax <= types <= tokens, ratios in (0, 1]
    got.values.foreach { case (tk, ty, hx, ttr, hf) =>
      assert(hx <= ty && ty <= tk)
      assert(ttr > 0.0 && ttr <= 1.0 && hf >= 0.0 && hf <= 1.0)
    }
  }

  test("q140 length percentiles: hand-checked rank-exact p50/p90/p99 on " +
    "crafted sources (ties, a 1-doc source, non-divisible sizes)") {
    import spark.implicits._
    // source a: lengths 1..10; b: one doc; c: 7 docs with heavy ties
    val rows = (1 to 10).map(i => (i.toLong, "a", i.toLong)) ++
      Seq((100L, "b", 42L)) ++
      Seq(3L, 3L, 3L, 7L, 7L, 9L, 9L).zipWithIndex
        .map { case (n, i) => (200L + i, "c", n) }
    val t = rows.toDF("doc_id", "source", "n_tokens").repartition(4)
    val got = TextOps.lengthPercentilesOn(t).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // rank targets: ceil(q*n) of the sorted lengths
    assert(got === Map(
      "a" -> ((10L, 5L, 9L, 10L)),  // ranks 5 / 9 / 10
      "b" -> ((1L, 42L, 42L, 42L)), // every rank is the one doc
      "c" -> ((7L, 7L, 9L, 9L))))   // ranks 4 / 7 / 7
  }

  test("q142 token gini: hand-computed Simpson/gini/head-share, and the " +
    "decimal sum of squares is exact") {
    import spark.implicits._
    val docs = Seq(("x", "a a a b"), ("y", "p q r s")).toDF("source", "text")
    val got = TextOps.tokenGiniOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // x: c={a:3,b:1}, N=4: simpson=10/16, head=3/4; y: uniform: 4/16, 1/4
    assert(got("x") === ((4L, 2L, 3L, 0.625, 0.375, 0.75)))
    assert(got("y") === ((4L, 4L, 1L, 0.25, 0.75, 0.25)))
  }

  test("q145 triangle count: hand-checked triangles, degrees and lcc on a " +
    "triangle-plus-chain fixture (the chain hub scores low)") {
    import spark.implicits._
    // 1-2-3 is a triangle; 3-4 dangles; 4-5-6 is a pure chain (no closure)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("id1", "id2").repartition(3)
    val got = TextOps.triangleCountOn(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, Some(1.0))),
      2L -> ((2L, 1L, Some(1.0))),
      3L -> ((3L, 1L, Some(1.0 / 3.0))),
      4L -> ((2L, 0L, Some(0.0))),
      5L -> ((2L, 0L, Some(0.0))),
      6L -> ((1L, 0L, None))))
  }

  test("q146 textrank: integer rounds replayed by a plain-Scala oracle on a " +
    "line graph; below-support edges and repeated-token self-pairs dropped") {
    import spark.implicits._
    val docs = Seq("a b a b a b a b", "b c b c b c", "a c", "d d d d")
      .toDF("text")
    // surviving graph: a-b w=7, b-c w=5 ((a,c) w=1 is below support, d-d
    // is a self-pair); replay the exact damped integer rounds
    val w = Map(("a", "b") -> 7L, ("b", "c") -> 5L)
    val adj = Map("a" -> Seq("b"), "b" -> Seq("a", "c"), "c" -> Seq("b"))
    val wdeg = adj.map { case (u, vs) =>
      u -> vs.map(v => w.getOrElse((u, v), w((v, u)))).sum }
    val s = 1000000000000L
    var r = adj.keys.map(_ -> s / 3).toMap
    for (_ <- 1 to 3) {
      val in = adj.keys.map { v =>
        v -> adj(v).map { u =>
          r(u) * w.getOrElse((u, v), w((v, u))) / wdeg(u) }.sum }.toMap
      r = in.map { case (v, c) => v -> ((15L * s) / 300L + 85L * c / 100L) }
    }
    val got = TextOps.textrankOn(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(got.keySet === Set("a", "b", "c"))
    assert(got.map { case (k, v) => k -> v._1 } === r)
    got.foreach { case (_, (ri, rd)) => assert(rd === ri.toDouble / 1e12) }
  }

  test("q147 phrase search: index-join hits equal the scan counts, top " +
    "phrases tie-break lexicographically, overlapping occurrences counted") {
    import spark.implicits._
    val docs = Seq((1L, "p q r p q r p q r"), (2L, "p q r s"))
      .toDF("doc_id", "text")
    // trigram totals: "p q r" 4, "q r p" 2, "r p q" 2, "q r s" 1 ->
    // top-3 keeps the tie pair in lexicographic order
    val got = TextOps.phraseSearchOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.toSeq.sortBy(_._1) === Seq(
      "p q r" -> ((4L, 4L, 2L)),
      "q r p" -> ((2L, 2L, 1L)),
      "r p q" -> ((2L, 2L, 1L))))
    got.foreach { case (_, (nCorpus, nHits, _)) => assert(nCorpus === nHits) }
  }

  test("q149 hits: hand-computed two-round path counts on a directed " +
    "fixture; ties carry no direction, isolated docs drop out") {
    import spark.implicits._
    // 1->2, 3->2, 2->4 (excerpt -> original); (5,6) tied -> no edge
    val pairs = Seq(
      (1L, 2L, 0.9, 0.1), (3L, 2L, 0.8, 0.2), (2L, 4L, 0.7, 0.3),
      (5L, 6L, 0.5, 0.5)).toDF("id1", "id2", "contain1", "contain2")
    val got = TextOps.hitsOn(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // a1: 2->2, 4->1; h1: 1->2, 3->2, 2->1; a2: 2->4, 4->1
    assert(got === Map(
      1L -> ((2L, 0L, 0.4, 0.0)),
      2L -> ((1L, 4L, 0.2, 0.8)),
      3L -> ((2L, 0L, 0.4, 0.0)),
      4L -> ((0L, 1L, 0.0, 0.2))))
  }

  test("q153 assortativity: a star is exactly -1; a single edge has no " +
    "degree variance and reports NULL") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val s = TextOps.assortativityOn(star).collect()
    assert(s.length === 1)
    assert((s(0).getLong(0), s(0).getLong(1)) === ((4L, 6L)))
    assert(s(0).getDouble(2) === -1.0)
    val lone = Seq((1L, 2L)).toDF("id1", "id2")
    val l = TextOps.assortativityOn(lone).collect()
    assert(l(0).isNullAt(2))
  }

  test("q154 bigram novelty: first-occurrence attribution by min doc_id, " +
    "within-doc duplicates collapse before counting") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramNoveltyOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // doc3's bigrams {a b, b a}: "a b" first in doc1, "b a" novel
    assert(got === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 1L, 0.5))))
  }

  test("q163 negative table: hand-exact 3/4-power weights (16^0.75 = 8 " +
    "exactly), systematic multiplicities sum to K") {
    import spark.implicits._
    // counts: a=16 -> w=8000, b=1 -> w=1000; layout (c asc): b then a;
    // total 9000, step = 9000 DIV 64 = 140 -> b crosses 7, a crosses 57
    val docs = Seq((Seq.fill(16)("a") ++ Seq("b")).mkString(" "))
      .toDF("text")
    val got = TextOps.negativeTableOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "b" -> ((1L, 1000L, 1000L, 7L)),
      "a" -> ((16L, 8000L, 9000L, 57L))))
    assert(got.values.map(_._4).sum === 64L)
  }

  test("q163 periodic-refresh law: merging per-wave unigram counts and " +
    "rebuilding equals the full rebuild over the union — exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum => fsum}
    // two waves of a streaming corpus (q101 diff shape): overlapping
    // vocabulary, skewed counts, a token only in the delta
    val base = Seq("a a b c", "b b a", "d a").toDF("text")
    val delta = Seq("c c c a", "e b", "a a a a").toDF("text")
    val union = base.unionByName(delta)
    val merged = TextOps.unigramCounts(base)
      .unionByName(TextOps.unigramCounts(delta))
      .groupBy(col("w")).agg(fsum(col("c")).as("c"))
    val incremental = TextOps.negativeTableOfCounts(merged).collect()
      .map(_.toSeq).toSet
    val full = TextOps.negativeTableOn(union).collect().map(_.toSeq).toSet
    // deterministic table (systematic draw, no RNG) → EXACT equality,
    // multiplicities included — the refresh never degrades the table
    assert(incremental === full)
    assert(incremental.nonEmpty)
  }

  test("q163 weight survives a token count past the BIGINT-cube cliff " +
    "(c > 2^21): DECIMAL cube equals the plain-Scala BigInt oracle") {
    import org.apache.spark.sql.functions.lit
    // c = 3,000,000 > 2,097,151: the old CAST(c*c*c AS DOUBLE) wrapped the
    // 64-bit cube (2.7e19 > 2^63) and emitted a garbage weight here; the
    // DECIMAL(38,0) ladder must match the exact BigInt computation
    val c = 3000000L
    val docs = spark.range(30).select(
      lit(Seq.fill(100000)("x").mkString(" ")).as("text"))
    val got = TextOps.negativeTableOn(docs)
      .select("token", "c", "wgt").collect()
    val expectedW = math.floor(1000.0 *
      math.sqrt(math.sqrt(BigInt(c).pow(3).toDouble))).toLong
    assert(got.length === 1)
    assert(got(0).getString(0) === "x")
    assert(got(0).getLong(1) === c)
    assert(got(0).getLong(2) === expectedW)
    // and the cliff is real: the wrapped BIGINT cube disagrees
    val wrapped = c * c * c
    val wrappedW = math.floor(1000.0 *
      math.sqrt(math.sqrt(wrapped.toDouble))).toLong
    assert(wrapped < 0L || wrappedW != expectedW)
  }

  test("q167 AUC engine: matches the brute pair count including half " +
    "credit for ties, perfect and inverted separations hit 1 and 0, " +
    "single-class input reports NULL") {
    import spark.implicits._
    // per-score counts with a tie block: scores 1,2,3 with mixed classes
    val perScore = Seq((1.0, 1L, 4L), (2.0, 2L, 2L), (3.0, 3L, 1L))
      .toDF("q", "pos", "neg")
    // brute force: expand to labelled points, count pairs
    val pts = Seq.fill(1)((1.0, true)) ++ Seq.fill(4)((1.0, false)) ++
      Seq.fill(2)((2.0, true)) ++ Seq.fill(2)((2.0, false)) ++
      Seq.fill(3)((3.0, true)) ++ Seq.fill(1)((3.0, false))
    val posS = pts.filter(_._2).map(_._1); val negS = pts.filterNot(_._2).map(_._1)
    val expected = (for (p <- posS; n <- negS) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (posS.size * negS.size)
    val got = TextOps.aucOfCounts(perScore).collect()
    assert(got(0).getLong(0) === 6L && got(0).getLong(1) === 7L)
    assert(got(0).getDouble(2) === expected)
    // degenerate orderings
    val perfect = Seq((1.0, 0L, 5L), (2.0, 4L, 0L)).toDF("q", "pos", "neg")
    assert(TextOps.aucOfCounts(perfect).collect()(0).getDouble(2) === 1.0)
    val inverted = Seq((1.0, 4L, 0L), (2.0, 0L, 5L)).toDF("q", "pos", "neg")
    assert(TextOps.aucOfCounts(inverted).collect()(0).getDouble(2) === 0.0)
    val oneClass = Seq((1.0, 3L, 0L), (2.0, 2L, 0L)).toDF("q", "pos", "neg")
    assert(TextOps.aucOfCounts(oneClass).collect()(0).isNullAt(2))
  }

  test("q185 AP engine: bitwise equal to the plain-Scala BigInt fixed-point " +
    "fold on a tie-heavy fixture; perfect ranking hits 1.0; one-class " +
    "corpus reports NULL; prevalence is the random-detector baseline") {
    import spark.implicits._
    // tie-heavy: big pos AND neg blocks at the same scores, positives
    // concentrated low (the low-quality-first detector direction)
    val blocks = Seq( // (q, pos, neg)
      (0.1, 7L, 2L), (0.2, 5L, 5L), (0.3, 0L, 9L), (0.4, 3L, 1L),
      (0.5, 0L, 11L), (0.6, 1L, 13L))
    val perScore = blocks.toDF("q", "pos", "neg")
    // plain-Scala oracle: exact BigInt fixed-point terms, one division
    val fp = BigInt(TextOps.ApFixedPoint)
    var cumtp = BigInt(0); var k = BigInt(0); var apFp = BigInt(0)
    blocks.sortBy(_._1).foreach { case (_, p, n) =>
      cumtp += p; k += p + n
      apFp += BigInt(p) * cumtp * fp / k
    }
    val np = blocks.map(_._2).sum
    val nn = blocks.map(_._3).sum
    val expected = apFp.toDouble / (BigInt(np) * fp).toDouble
    val got = TextOps.apOfCounts(perScore).collect()
    graft.CachedFrames.drain()
    assert(got(0).getLong(0) === np && got(0).getLong(1) === nn)
    assert(got(0).getDouble(2) === np.toDouble / (np + nn).toDouble)
    assert(got(0).getDouble(3) === expected) // bitwise
    // perfect ranking: all positives strictly below all negatives → AP 1.0
    val perfect = Seq((1.0, 4L, 0L), (2.0, 0L, 5L)).toDF("q", "pos", "neg")
    assert(TextOps.apOfCounts(perfect).collect()(0).getDouble(3) === 1.0)
    graft.CachedFrames.drain()
    // no positives → NULL AP (matches the oracle's CASE)
    val oneClass = Seq((1.0, 0L, 3L), (2.0, 0L, 2L)).toDF("q", "pos", "neg")
    assert(TextOps.apOfCounts(oneClass).collect()(0).isNullAt(3))
    graft.CachedFrames.drain()
  }

  test("q187 vocabulary richness: exact Chao1 on a crafted count profile, " +
    "the bias-corrected branch when doubletons vanish, Good-Turing mass") {
    import spark.implicits._
    // counts: a×3, b×2, c×1, d×1 → N=7, V=4, f1=2, f2=1 → chao1 = 4 + 4/2
    val got = TextOps.vocabRichnessOn(
      Seq("a a a b", "b c d").toDF("text")).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((7L, 4L, 2L, 1L)))
    assert(got.getDouble(4) === 6.0)
    assert(got.getDouble(5) === 2.0 / 7.0)
    // no doubletons: a×3, b×1, c×1 → chao1 = 3 + f1(f1−1)/2 = 3 + 1
    val noF2 = TextOps.vocabRichnessOn(
      Seq("a a a", "b c").toDF("text")).collect()(0)
    assert(noF2.getLong(3) === 0L)
    assert(noF2.getDouble(4) === 4.0)
  }

  test("q188 KS engine: bitwise equal to the plain-Scala brute sup over " +
    "all thresholds on a tie-heavy two-sample fixture; witness threshold " +
    "is the smallest attaining score; one-sided sample reports NULL") {
    import spark.implicits._
    val sample: Seq[(Double, Boolean)] = Seq(
      (0.1, true), (0.1, true), (0.1, false), (0.2, false), (0.2, false),
      (0.3, true), (0.3, false), (0.5, true), (0.5, true), (0.5, false),
      (0.7, false), (0.9, true), (0.9, false), (0.9, false))
    val nEn = sample.count(_._2); val nRest = sample.size - nEn
    // brute sup: at each distinct score x, |cumEn·nRest − cumRest·nEn|
    val qs = sample.map(_._1).distinct.sorted
    val cands = qs.map { x =>
      val cumEn = sample.count(s => s._2 && s._1 <= x)
      val cumRest = sample.count(s => !s._2 && s._1 <= x)
      (BigInt(cumEn) * nRest - BigInt(cumRest) * nEn).abs -> x
    }
    val ksNum = cands.map(_._1).max
    val ksAt = cands.filter(_._1 == ksNum).map(_._2).min
    val got = TextOps.ksOfFlags(sample.toDF("q", "en")).collect()(0)
    graft.CachedFrames.drain()
    assert(got.getLong(0) === nEn.toLong && got.getLong(1) === nRest.toLong)
    assert(got.getLong(2) === ksNum.toLong)
    assert(got.getDouble(3) === ksAt)
    assert(got.getDouble(4) ===
      ksNum.toDouble / (BigInt(nEn) * BigInt(nRest)).toDouble)
    // every row in one cohort → the distance is undefined, not 0
    val oneSided = TextOps.ksOfFlags(
      Seq((0.1, true), (0.2, true)).toDF("q", "en")).collect()(0)
    graft.CachedFrames.drain()
    assert(oneSided.isNullAt(4))
  }

  test("q189 doc-size Gini: bitwise equal to the plain-Scala BigInt " +
    "rank-weighted formula on a tie-heavy fixture; uniform sizes score " +
    "exactly 0; top-share picks max(1, n DIV 100) docs") {
    import spark.implicits._
    // sizes: 1,1,2,3,3,3,10 (ties exercise the order-invariance argument)
    val texts = Seq("a", "b", "a b", "a b c", "d e f", "g h i",
      (1 to 10).map(i => s"t$i").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sizes = texts.map(_.split("\\s+").length.toLong).sorted
    val n = sizes.size
    val s = sizes.sum
    val w = sizes.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(2) * w - BigInt(n + 1) * s).toDouble /
      (BigInt(n) * s).toDouble
    val got = TextOps.docGiniOn(docs).collect()(0)
    graft.CachedFrames.drain()
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === s)
    assert(got.getLong(2) === 1L) // n < 100 → top-1 doc
    assert(got.getDouble(3) === gini)
    assert(got.getDouble(4) === 10.0 / s.toDouble)
    // perfectly even corpus → Gini exactly 0
    val even = TextOps.docGiniOn(
      Seq((1L, "x y"), (2L, "p q"), (3L, "u v")).toDF("doc_id", "text"))
      .collect()(0)
    graft.CachedFrames.drain()
    assert(even.getDouble(3) === 0.0)
  }

  test("q170 link prediction: the one non-adjacent pair with two shared " +
    "neighbours surfaces with exact Jaccard; adjacent pairs and single-" +
    "witness pairs stay out") {
    import spark.implicits._
    // square 1-2-4-3-1 plus diagonal 2-3: (1,4) is the only non-edge with
    // cn >= 2 (via 2 and 3); deg(1) = deg(4) = 2 → jaccard = 2/(2+2-2) = 1
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id1", "id2")
    val got = TextOps.linkPredictOn(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    graft.CachedFrames.drain()
    assert(got.toSeq === Seq((1L, 4L, 2L, 2L, 2L, 1.0)))
  }

  test("q186 modularity: bitwise equal to the plain-Scala BigInt formula " +
    "on a two-cluster graph whose unlabeled nodes join their cluster by " +
    "propagation; a label-blind single community scores ~0") {
    import spark.implicits._
    // two triangles, each with a pendant UNLABELED node (id % 5 == 0) that
    // q121 votes into the cluster's label, plus one cross-cluster edge
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 10L), (2L, 10L),
      (6L, 7L), (6L, 8L), (7L, 8L), (6L, 15L), (7L, 15L), (3L, 8L))
    val langs = Map(1L -> "en", 2L -> "en", 3L -> "en", 10L -> "xx",
      6L -> "fr", 7L -> "fr", 8L -> "fr", 15L -> "yy")
    val comm = langs ++ Map(10L -> "en", 15L -> "fr") // propagation outcome
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val m = edges.size
    val eIn = edges.count { case (a, b) => comm(a) == comm(b) }
    val d2 = comm.keys.map(comm).toSeq.distinct.map { c =>
      val dc = BigInt(deg.collect { case (v, d) if comm(v) == c => d }.sum)
      dc * dc
    }.sum
    val expected = (BigInt(4) * m * eIn - d2).toDouble /
      (BigInt(4) * m * m).toDouble
    val got = TextOps.modularityOn(edges.toDF("id1", "id2"),
      langs.toSeq.toDF("doc_id", "lang")).collect()
    graft.CachedFrames.drain()
    assert(got(0).getLong(0) === m.toLong)      // m_edges
    assert(got(0).getLong(1) === 2L)            // n_communities
    assert(got(0).getLong(2) === eIn.toLong)    // e_in = 10 (one cross edge)
    assert(got(0).getDouble(3) === expected)    // bitwise
    assert(expected > 0.3, s"two clusters should be clearly modular: $expected")
    // one community (all seeds share a label, no unlabeled nodes):
    // Q = (4m·m − (2m)²)/(4m²) = 0 exactly
    val one = TextOps.modularityOn(
      Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"),
      Seq((1L, "en"), (2L, "en"), (3L, "en")).toDF("doc_id", "lang"))
      .collect()
    graft.CachedFrames.drain()
    assert(one(0).getDouble(3) === 0.0)
  }

  test("q176 calibration: deciles partition the corpus front-loaded (the " +
    "ntile law) and score ranges are non-overlapping ascending") {
    val got = TextOps.q176ScoreCalibration(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    graft.CachedFrames.drain()
    val n = got.map(_._2).sum
    assert(got.map(_._1).toSeq === (1 to 10))
    // ANSI ntile sizing: first n%10 deciles take ⌈n/10⌉, the rest ⌊n/10⌋
    got.foreach { case (d, nd, dups, _, _) =>
      val expectedSize = if (d <= n % 10) n / 10 + 1 else n / 10
      assert(nd === expectedSize, s"decile $d")
      assert(dups >= 0 && dups <= nd)
    }
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= a._5 && a._5 <= b._4, s"${a._1} vs ${b._1}")
    }
  }

  test("q167 periodic-refresh law: merging per-wave DIGEST counts and " +
    "rebuilding equals the full AUC — including a label flip the delta " +
    "causes (per-score counts would NOT merge)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min => fmin, sum => fsum}
    // 'dup dup' is unique in base; the delta adds a copy → the whole
    // digest group flips to positive in the union
    val base = Seq("the a of and to", "dup dup", "solo text here")
      .toDF("text")
    val delta = Seq("dup dup", "the the the", "fresh words").toDF("text")
    val union = base.unionByName(delta)
    val merged = TextOps.digestCounts(base)
      .unionByName(TextOps.digestCounts(delta))
      .groupBy(col("dg"))
      .agg(fsum(col("cnt")).as("cnt"), fmin(col("q")).as("q"))
    val incremental = TextOps.aucOfDigestCounts(merged).collect()
      .map(_.toSeq).toSet
    graft.CachedFrames.drain()
    val fullRows = TextOps.aucOfDigestCounts(TextOps.digestCounts(union))
      .collect().map(_.toSeq).toSet
    graft.CachedFrames.drain()
    assert(incremental === fullRows)
    // and the flip really happened: the union has positives
    assert(fullRows.head(0).asInstanceOf[Long] >= 2L)
  }

  test("q182 Fleiss: equals the plain-Scala textbook computation bitwise " +
    "(P-bar and chance agreement from the vote sums)") {
    val sf = "/root/testdata/sf0.001"
    val r = TextOps.q182FleissKappa(spark, sf).collect()(0)
    graft.CachedFrames.drain()
    val (n, pAdmit) = (r.getLong(0), r.getDouble(1))
    // recompute the vote sums independently from the two gate queries
    import org.apache.spark.sql.functions.col
    val ga = TextOps.q112GopherRules(spark, sf)
      .select(col("doc_id"), col("admit")).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    val qs = TextOps.q22QualityScore(spark, sf)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1) >= 1.0)).toMap
    val lc = TextOps.q23LangId(spark, sf)
      .select(col("doc_id"), col("pred_lang")).collect()
      .map(x => x.getLong(0) -> (x.getString(1) == "en")).toMap
    graft.CachedFrames.drain()
    val ny = ga.keys.toSeq.map(id =>
      Seq(ga(id), qs(id), lc(id)).count(identity).toLong)
    val s1 = BigInt(ny.sum); val nn = BigInt(ny.size)
    val s2 = BigInt(ny.map(y => y * (y - 1) + (3 - y) * (2 - y)).sum)
    val rn = nn * 3
    val pe2 = s1 * s1 + (rn - s1) * (rn - s1)
    val num = s2 * rn * rn - 2 * rn * pe2
    val den = 2 * rn * rn * rn - 2 * rn * pe2
    assert(n === nn.toLong)
    assert(pAdmit === s1.toDouble / (nn * 3).toDouble)
    if (den == 0) assert(r.isNullAt(2))
    else assert(r.getDouble(2) === num.toDouble / den.toDouble)
    assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
  }

  test("q172 kappa: cells partition the corpus and the statistic equals " +
    "the plain-Scala BigInt chance-correction formula bitwise") {
    val r = TextOps.q172GateKappa(spark, "/root/testdata/sf0.001").collect()(0)
    graft.CachedFrames.drain()
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n === n11 + n10 + n01 + n00)
    assert(r.getDouble(5) === (n11 + n00).toDouble / n.toDouble)
    val pe = BigInt(n11 + n10) * BigInt(n11 + n01) +
      BigInt(n01 + n00) * BigInt(n10 + n00)
    val den = BigInt(n) * BigInt(n) - pe
    if (den == 0) assert(r.isNullAt(6))
    else assert(r.getDouble(6) ===
      (BigInt(n) * BigInt(n11 + n00) - pe).toDouble / den.toDouble)
  }

  test("q173 Spearman: equals the plain-Scala rank computation bitwise " +
    "(total order (value, doc_id), exact BigInt sum of squared diffs)") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val r = TextOps.q173SpearmanQualityLength(spark, sf).collect()(0)
    graft.CachedFrames.drain()
    val scored = TextOps.q22QualityScore(spark, sf)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) nt")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val ids = scored.keys.toSeq
    def ranksBy[T](key: Long => T)(implicit o: Ordering[T]): Map[Long, Long] =
      ids.sortBy(id => (key(id), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
    val rq = ranksBy(scored); val rl = ranksBy(lens)
    val sd2 = ids.map(id => BigInt(rq(id) - rl(id)).pow(2)).sum
    val n = BigInt(ids.size)
    val expected = 1.0 - (BigInt(6) * sd2).toDouble / (n * (n * n - 1)).toDouble
    assert(r.getLong(0) === ids.size.toLong)
    assert(r.getDouble(1) === sd2.toDouble)
    assert(r.getDouble(2) === expected)
  }

  test("q166 substring dedup: a cross-doc passage is removed end-to-end " +
    "from the later doc only, within-doc repeats dedup too, overlapping " +
    "anchors merge into one span") {
    import spark.implicits._
    val passage = (1 to 9).map(i => s"a$i").mkString(" ") // 9 tokens, W=8
    val block = (1 to 8).map(i => s"p$i").mkString(" ")   // exactly W tokens
    val docs = Seq(
      (1L, passage),                  // canonical copy (first site) — kept
      (2L, s"x $passage y"),          // later copy — 9 tokens removed
      (3L, s"$block z $block"))       // within-doc repeat — 2nd copy removed
      .toDF("doc_id", "text")
    val got = TextOps.substrDedupOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got === Map(
      1L -> ((9L, 0L, 0L, 1.0)),
      // two overlapping redundant anchors (pos 2, 3) chain: 8 + 1 covered,
      // ONE merged span — the whole shared passage leaves doc 2
      2L -> ((11L, 9L, 1L, 2.0 / 11.0)),
      3L -> ((17L, 8L, 1L, 9.0 / 17.0))))
  }

  test("q184 substring-dedup apply: rebuilds exactly the tokens the q166 " +
    "plan keeps — later copy stripped, within-doc repeat stripped, " +
    "full-duplicate doc emptied, untouched docs byte-identical") {
    import spark.implicits._
    val passage = (1 to 9).map(i => s"a$i").mkString(" ") // 9 tokens, W=8
    val block = (1 to 8).map(i => s"p$i").mkString(" ")   // exactly W tokens
    val docs = Seq(
      (1L, passage),                  // canonical copy — kept intact
      (2L, s"x $passage y"),          // later copy — the 9 tokens leave
      (3L, s"$block z $block"),       // within-doc repeat — 2nd copy leaves
      (4L, passage))                  // full duplicate — everything leaves
      .toDF("doc_id", "text")
    val got = TextOps.substrApplyOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      1L -> ((9L, 0L, 0L, 9L, passage)),
      2L -> ((11L, 9L, 1L, 2L, "x y")),
      3L -> ((17L, 8L, 1L, 9L, s"$block z")),
      4L -> ((9L, 9L, 1L, 0L, ""))))
  }

  test("q184 ≡ q166 law: on the sf0.001 corpus the rewrite's accounting " +
    "matches the plan's doc by doc, and the rebuilt length is exactly " +
    "n_tokens − n_removed") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    try {
      val plan = TextOps.q166SubstrDedup(spark, sf)
        .select(col("doc_id"), col("n_tokens").as("pt"),
          col("n_removed").as("pr"), col("n_spans").as("ps"))
      val apply = TextOps.q184SubstrApply(spark, sf)
      val joined = apply.join(plan, "doc_id")
      assert(joined.count() === apply.count()) // bijective on doc_id
      val bad = joined.filter(col("n_tokens") =!= col("pt") ||
        col("n_removed") =!= col("pr") || col("n_spans") =!= col("ps") ||
        col("n_kept") =!= col("n_tokens") - col("n_removed") ||
        // the STRING is consistent too: its token count is n_kept (empty
        // string ↔ zero tokens kept)
        when(col("cleaned_text") === "", lit(0L))
          .otherwise(size(split(col("cleaned_text"), " ")).cast("bigint"))
          =!= col("n_kept")).count()
      assert(bad === 0L)
    } finally graft.CachedFrames.drain()
  }

  test("hashed-gram shuffle payload ≡ raw grams on the gate corpus and " +
    "on the crafted fixture (the 100 TB width variant changes bytes " +
    "moved, never the plan)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    try {
      val docs = Tables(spark, sf, "documents")
      val raw = TextOps.substrDedupOn(docs).collect().map(_.toSeq).toSet
      val hashed = TextOps.substrDedupOn(docs, hashedGrams = true)
        .collect().map(_.toSeq).toSet
      assert(hashed === raw)
    } finally graft.CachedFrames.drain()
    val passage = (1 to 9).map(i => s"a$i").mkString(" ")
    val fx = Seq((1L, passage), (2L, s"x $passage y")).toDF("doc_id", "text")
    try assert(
      TextOps.substrDedupOn(fx, hashedGrams = true).collect().map(_.toSeq).toSet
        === TextOps.substrDedupOn(fx).collect().map(_.toSeq).toSet)
    finally graft.CachedFrames.drain()
  }

  test("substring admission law (fixture): admit(index(base), delta) ≡ " +
    "the batch plan on base ∪ delta restricted to delta docs, under the " +
    "immutable-base id-ordering contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val passage = (1 to 9).map(i => s"b$i").mkString(" ")  // lives in base
    val block = (1 to 8).map(i => s"d$i").mkString(" ")    // delta-only
    val fresh = (1 to 10).map(i => s"f$i").mkString(" ")
    val base = Seq((1L, passage), (2L, s"u1 u2 u3 u4 u5 u6 u7 u8 u9"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, s"x $passage y"),        // dup vs base → all 9 tokens leave
      (11L, s"$block z $block"),     // within-delta repeat → 2nd copy leaves
      (12L, block),                  // 3rd copy — doc 11 pos 1 is canonical,
                                     //   so doc 12's whole text leaves
      (13L, fresh))                  // untouched
      .toDF("doc_id", "text")
    val admitted = TextOps.substrAdmitAgainstIndex(delta,
      TextOps.substrIndexFrame(base)).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    graft.CachedFrames.drain()
    val unionPlan = TextOps.substrDedupOn(base.union(delta))
      .filter(col("doc_id") >= 10L).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    graft.CachedFrames.drain()
    assert(admitted === unionPlan)
    // and the semantics are the intended ones, not just self-consistent
    assert(admitted(10L).take(3) === Seq(11L, 9L, 1L))
    assert(admitted(13L).take(3) === Seq(10L, 0L, 0L))
  }

  test("substring admission law (sf0.001): splitting the corpus at the " +
    "median id, admission of the upper half against the lower half's " +
    "index equals the full batch plan restricted to the upper half") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    try {
      val docs = Tables(spark, sf, "documents")
      val base = docs.filter(col("doc_id") < 250)
      val delta = docs.filter(col("doc_id") >= 250)
      val admitted = TextOps.substrAdmitAgainstIndex(delta,
        TextOps.substrIndexFrame(base))
      val unionPlan = TextOps.substrDedupOn(docs)
        .filter(col("doc_id") >= 250)
      assert(admitted.collect().map(_.toSeq).toSet ===
        unionPlan.collect().map(_.toSeq).toSet)
      // the split must actually exercise the cross-half path: at least one
      // upper-half doc loses tokens to a lower-half canonical
      assert(admitted.filter(col("n_removed") > 0).count() > 0)
    } finally graft.CachedFrames.drain()
  }

  test("q145 degree-first orientation: a lowest-id hub star counts its " +
    "one triangle correctly (the id-ordering worst case)") {
    import spark.implicits._
    // hub 1 has the LOWEST id — under a<b<c orientation all its edges
    // point out and the hub pays deg² wedges; degree-first points them in
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
      .toDF("id1", "id2")
    val got = TextOps.triangleCountOn(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(1L -> ((4L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 1L)),
      4L -> ((1L, 0L)), 5L -> ((1L, 0L))))
  }

  test("q156 k-core: a triangle survives 2-core peeling, chains and " +
    "pendants peel away (including cascades)") {
    import spark.implicits._
    // triangle 1-2-3; pendant 3-7; chain 4-5, 5-6 (5 has deg 2 in round 1
    // but cascades out once its ends drop)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 7L), (4L, 5L),
      (5L, 6L)).toDF("id1", "id2").repartition(3)
    val got = TextOps.kCoreOn(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("q201 rank copula: the grid is the full 10×10 cross, margins obey " +
    "the ntile front-loading law on both axes, and cells sum to the " +
    "corpus size") {
    val got = TextOps.q201RankCopula(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    graft.CachedFrames.drain()
    assert(got.keySet ===
      (for (i <- 1 to 10; j <- 1 to 10) yield (i, j)).toSet)
    val n = got.values.sum
    // ANSI ntile sizing: first n%10 deciles take ⌈n/10⌉, the rest ⌊n/10⌋
    def expectedSize(d: Int): Long = if (d <= n % 10) n / 10 + 1 else n / 10
    (1 to 10).foreach { d =>
      assert(got.collect { case ((`d`, _), o) => o }.sum ===
        expectedSize(d), s"q margin $d")
      assert(got.collect { case ((_, `d`), o) => o }.sum ===
        expectedSize(d), s"len margin $d")
    }
  }

  test("q196 split leakage: bitwise equal to the plain-Scala BigInt " +
    "formula on a crafted roster/edge set; pair classes are unordered " +
    "and shares sum to 1") {
    import spark.implicits._
    // plain-Scala twin of the md5_prefix56('sp:' || id) % 10 split tag
    def splitOf(id: Long): String = {
      val h = graft.functions.Md5Prefix56.hash56(
        s"sp:$id".getBytes(java.nio.charset.StandardCharsets.UTF_8)) % 10
      if (h < 8) "train" else if (h == 8) "val" else "test"
    }
    // roster wide enough that all three splits are populated (80/10/10
    // expected); edges picked blind to the hash — the test recomputes
    // every class count from the same deterministic tag
    val docs = (1L to 60L).toDF("doc_id")
    val edges = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L),
      (11L, 12L), (13L, 14L), (15L, 16L), (17L, 18L), (19L, 20L),
      (21L, 40L), (22L, 41L), (23L, 42L), (24L, 55L), (25L, 60L))
    val sizes = (1L to 60L).groupBy(splitOf).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set("train", "val", "test"),
      s"fixture must populate all three splits: $sizes")
    val classes = edges
      .map { case (a, b) =>
        val (sa, sb) = (splitOf(a), splitOf(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    val total = edges.size
    val n = 60L
    val got = TextOps.splitLeakageOn(edges.toDF("id1", "id2"), docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    graft.CachedFrames.drain()
    assert(got.keySet === classes.keySet)
    classes.foreach { case (k @ (sa, sb), cnt) =>
      val (nEdges, share, expShare, lift) = got(k)
      val kf = if (sa == sb) 1L else 2L
      val (ca, cb) = (BigInt(sizes(sa)), BigInt(sizes(sb)))
      assert(nEdges === cnt.toLong, s"class $k")
      assert(share === cnt.toDouble / total.toDouble, s"share $k")
      assert(expShare ===
        (BigInt(kf) * ca * cb).toDouble / (BigInt(n) * n).toDouble,
        s"expected_share $k")
      assert(lift ===
        (BigInt(cnt) * n * n).toDouble /
          (BigInt(total) * kf * ca * cb).toDouble, s"lift $k")
    }
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("q204 Q-Q table: every decile boundary is the plain-Scala sorted " +
    "pick at rank ceil(d*n/10) per slice, on uneven tie-heavy slices") {
    import spark.implicits._
    // en: 23 values with ties; rest: 7 values — n not divisible by 10 on
    // either side, so every ceil-rank boundary is exercised
    val en = Seq.tabulate(23)(i => (i.toLong, (i % 5).toDouble, "en"))
    val rest = Seq.tabulate(7)(i => (100L + i, (i % 3).toDouble * 2, "rest"))
    val got = TextOps.qualityQqOn((en ++ rest).toDF("doc_id", "q", "slice"))
      .collect()
      .map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    graft.CachedFrames.drain()
    def pick(vals: Seq[(Long, Double)], d: Int): Double = {
      val sorted = vals.sortBy { case (id, q) => (q, id) }.map(_._2)
      sorted((d * vals.size + 9) / 10 - 1)
    }
    assert(got.keySet === (1 to 9).toSet)
    (1 to 9).foreach { d =>
      val (qe, qr, gap) = got(d)
      assert(qe === pick(en.map(t => (t._1, t._2)), d), s"en d$d")
      assert(qr === pick(rest.map(t => (t._1, t._2)), d), s"rest d$d")
      assert(gap === qe - qr)
    }
  }

  test("q213 coverage curve: prefix-sum picks at each cut match the " +
    "plain-Scala sorted fold, a cut past the vocabulary clamps to V " +
    "with share exactly 1") {
    import spark.implicits._
    // counts: a=5, b=3, c=3, d..m = 1 each (10 hapaxes) → V=13, T=21
    val words = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      ('d' to 'm').map(_.toString)
    val docs = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val got = TextOps.gramCoverageOn(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    val sorted = words.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (w, c) => (-c, w) }.map(_._2)
    def cov(k: Int): Long = sorted.take(k).sum
    assert(got(10L) === ((13L, 21L, cov(10), cov(10).toDouble / 21.0)))
    assert(got(100L) === ((13L, 21L, 21L, 1.0))) // clamps to V = 13
    assert(got(1000L) === ((13L, 21L, 21L, 1.0)))
  }

  test("q207 lang confusion: the grid is the full tagged×predicted cross, " +
    "cells sum to the corpus, and each predicted margin matches q23's " +
    "own prediction counts") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val got = TextOps.q207LangConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    graft.CachedFrames.drain()
    val preds = TextOps.q23LangId(spark, sf)
      .groupBy(col("pred_lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.CachedFrames.drain()
    val langs = got.keySet.map(_._1); val pl = got.keySet.map(_._2)
    assert(got.keySet === (for (l <- langs; p <- pl) yield (l, p)))
    assert(got.values.sum === preds.values.sum) // both count the corpus
    pl.foreach { p =>
      assert(got.collect { case ((_, `p`), o) => o }.sum ===
        preds.getOrElse(p, 0L), s"margin $p")
    }
    // the degeneracy readout is in-row data (round-15): the gate corpus
    // collapses q23's margin to one class, and the row SAYS so
    val deg = TextOps.q207LangConfusion(spark, sf)
      .select(col("n_pred_classes"), col("pred_top_share"))
      .distinct().collect()
    graft.CachedFrames.drain()
    assert(deg.length === 1) // constant per grid
    assert(deg(0).getLong(0) === preds.keySet.size.toLong)
    val topShare = preds.values.max.toDouble / preds.values.sum.toDouble
    assert(deg(0).getDouble(1) === topShare)
  }

  test("q239 Brier calibration: the full output — bins, Murphy terms, " +
    "folds — matches a plain-Scala mirror BITWISE on a tie-heavy mixed " +
    "fixture, and the bin table is the rank-exact decile layout") {
    import spark.implicits._
    val S = TextOps.BrierScale
    // 37 rows (uneven deciles), clustered q values (rank ties broken by
    // doc_id, as the engine), outcomes mixed per cluster
    val rows: Seq[(Long, Double, Long)] = (1L to 37L).map { i =>
      val q = ((i % 7).toDouble - 3.0) * 0.75 + (i % 3).toDouble * 0.01
      val o = if ((i % 5) < 2) 1L else 0L
      (i, q, o)
    }
    val got = TextOps.brierCalibrationOn(rows.toDF("doc_id", "q", "o"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))).toMap
    graft.CachedFrames.drain()
    // plain-Scala mirror with the engines' exact op order
    def pf(q: Double): Long =
      math.floor((0.5 + 0.5 * (q / (1.0 + math.abs(q)))) * S.toDouble).toLong
    val sorted = rows.sortBy(t => (t._2, t._1))
    val n = sorted.size
    val buckets = 10
    def ntileOf(rank: Int): Int = {
      val big = (n % buckets) * ((n / buckets) + 1)
      if (rank <= big) (rank - 1) / ((n / buckets) + 1) + 1
      else (n % buckets) + (rank - big - 1) / (n / buckets) + 1
    }
    val binned = sorted.zipWithIndex.groupBy { case (_, i) => ntileOf(i + 1) }
    val bins = binned.toSeq.sortBy(_._1).map { case (k, g) =>
      val nk = g.size.toLong
      val a = g.map { case ((_, q, _), _) => pf(q) }.sum
      val dd = g.map(_._1._3).sum
      val sq = g.map { case ((_, q, o), _) =>
        val t = pf(q) - o * S; BigInt(t) * BigInt(t) }.sum
      (k, nk, a, dd, sq)
    }
    val nn = bins.map(_._2).sum; val oo = bins.map(_._4).sum
    val sqs = bins.map(_._5).sum
    val rels = bins.foldLeft(0.0) { case (acc, (_, nk, a, dd, _)) =>
      acc + (BigInt(a - dd * S) * BigInt(a - dd * S)).toDouble / nk.toDouble }
    val ress = bins.foldLeft(0.0) { case (acc, (_, nk, _, dd, _)) =>
      val t = BigInt(dd) * BigInt(nn) - BigInt(oo) * BigInt(nk)
      acc + (t * t).toDouble / nk.toDouble }
    val ns2 = (BigInt(nn) * BigInt(S) * BigInt(S)).toDouble
    val brier = sqs.toDouble / ns2
    val rel = rels / ns2
    val res = ress / (BigInt(nn) * BigInt(nn) * BigInt(nn)).toDouble
    val unc = (BigInt(oo) * BigInt(nn - oo)).toDouble /
      (BigInt(nn) * BigInt(nn)).toDouble
    assert(got.keySet === bins.map(_._1).toSet)
    bins.foreach { case (k, nk, a, dd, _) =>
      val mf = a.toDouble / (nk * S).toDouble
      val or = dd.toDouble / nk.toDouble
      assert(got(k) === ((nk, mf, or, mf - or, brier, rel, res, unc)), s"bin $k")
    }
    // sanity on the decomposition: brier − (rel − res + unc) is the
    // nonnegative within-bin forecast variance (up to lattice truncation)
    assert(brier - (rel - res + unc) >= -1e-12)
  }

  test("q241 Cochran-Armitage trend: a monotone dup gradient matches the " +
    "plain-Scala textbook statistic bitwise; a flat gradient scores ~0; " +
    "degenerate corpora report NULL") {
    import spark.implicits._
    def run(rows: Seq[(Long, Double, Long)]) = {
      val r = TextOps.caTrendOn(rows.toDF("doc_id", "q", "o")).collect()(0)
      graft.CachedFrames.drain()
      r
    }
    // 40 docs, 10 deciles of 4: dup count rises with the decile (0 or 1
    // per 4 docs in low deciles, up to 4 in the top) — q strictly ordered
    // by doc_id so decile i = docs 4(i−1)+1..4i
    val dupOfDecile = Seq(0, 0, 1, 1, 2, 2, 3, 3, 4, 4)
    val rows = (1L to 40L).map { i =>
      val dec = ((i - 1) / 4).toInt
      val within = ((i - 1) % 4).toInt
      (i, i.toDouble, if (within < dupOfDecile(dec)) 1L else 0L)
    }
    val got = run(rows)
    // plain-Scala mirror with the same exact-integer chain
    val n = 40L; val o = dupOfDecile.sum.toLong
    val s1 = (1 to 10).map(i => i.toLong * 4).sum
    val s2 = (1 to 10).map(i => i.toLong * i * 4).sum
    val t = dupOfDecile.zipWithIndex.map { case (d, i) => (i + 1).toLong * d }.sum
    val num = BigInt(n) * BigInt(t) - BigInt(o) * BigInt(s1)
    val den = BigInt(o) * BigInt(n - o) *
      (BigInt(n) * BigInt(s2) - BigInt(s1) * BigInt(s1))
    val z2 = (BigInt(n) * num * num).toDouble / den.toDouble
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) === ((n, o, s1, s2, t)))
    assert(got.getDouble(5) === num.toDouble)
    assert(got.getDouble(6) === z2)
    assert(z2 > 10.0) // the gradient is strongly significant
    // flat rate: 2 dups in every decile → T = O·S1/N exactly → Z² = 0
    val flat = (1L to 40L).map { i =>
      (i, i.toDouble, if ((i - 1) % 4 < 2) 1L else 0L) }
    val gf = run(flat)
    assert(gf.getDouble(5) === 0.0)
    assert(gf.getDouble(6) === 0.0)
    // degenerate: no dups → NULL (and the no-dup gate corpus does this)
    val none = (1L to 40L).map(i => (i, i.toDouble, 0L))
    assert(run(none).isNullAt(6))
    // degenerate: ALL dups → NULL
    val alld = (1L to 40L).map(i => (i, i.toDouble, 1L))
    assert(run(alld).isNullAt(6))
  }

  test("q242 term burstiness: a uniform term scores VMR exactly 0, a " +
    "clumped term super-Poisson, both matching the exact integer " +
    "formula bitwise (zero-count docs in the population)") {
    import spark.implicits._
    // 10 docs: 'u' once in EVERY doc (uniform — zero variance); 'b' 5
    // times in one doc only (bursty); filler tokens unique per doc
    val docs = (1L to 10L).map { i =>
      val b = if (i == 1L) " b b b b b" else ""
      (i, s"u$b fill${i}_a fill${i}_b")
    }.toDF("doc_id", "text")
    val got = TextOps.termBurstinessOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    // 'u': df 10, 10 occurrences, one per doc → mean 1, VMR exactly 0
    assert(got("u") === ((10L, 10L, 1.0, 0.0)))
    // 'b': df 1, 5 occurrences in one doc of 10 → exact integer mirror
    // VMR = (D·Σc² − n²)/(D·n) = (10·25 − 25)/(10·5) = 4.5
    assert(got("b") === ((1L, 5L, 0.5, 4.5)))
    // top-K selection kept every term here (22 terms < ... no: K = 20 of
    // 22 — the two SMALLEST-df fillers fall off, 'u' and 'b' both stay)
    assert(got.size === TextOps.TopBurstTerms)
    assert(got.keySet.contains("u") && got.keySet.contains("b"))
  }

  test("q245 packing audit: straddling documents, sequence counts and " +
    "tail waste match the exact hand arithmetic on a crafted source " +
    "(the gate corpus has no straddles — this pins the path)") {
    import spark.implicits._
    // source A: three 1500-token docs → running ends 1500/3000/4500;
    // offsets 0, 1500, 952 → docs 2 and 3 straddle (offset+1500 > 2048);
    // n_seqs = ceil(4500/2048) = 3, tail waste = 3·2048 − 4500 = 1644.
    // source B: one 10-token doc → 1 seq, waste 2038, no straddle.
    def txt(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      ("A", 1L, txt(1500)), ("A", 2L, txt(1500)), ("A", 3L, txt(1500)),
      ("B", 10L, txt(10)))
      .toDF("source", "doc_id", "text")
    val got = TextOps.packingAuditOn(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      "A" -> ((3L, 4500L, 3L, 1644L, 2L, 2.0 / 3.0)),
      "B" -> ((1L, 10L, 1L, 2038L, 0L, 0.0))))
  }

  test("q249 df-cap tradeoff: a hot fingerprint's postings and avoided " +
    "pairs price exactly per cap (12 copies: cap 10 drops it — 12 " +
    "postings, 66 pairs; cap 25 keeps it)") {
    import spark.implicits._
    // 12 identical 3-token docs → ONE fingerprint at fdf 12; 2 singleton
    // docs → two fdf-1 fingerprints. n_fps = 3, postings = 14.
    val docs = ((1L to 12L).map(i => (i, "a b c")) ++
      Seq((20L, "p q r"), (21L, "x y z"))).toDF("doc_id", "text")
    val got = TextOps.dfCapTradeoffOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    graft.CachedFrames.drain()
    assert(got(10L) === ((3L, 1L, 12L, 12.0 / 14.0, 66.0))) // 12·11/2
    assert(got(25L) === ((3L, 0L, 0L, 0.0, 0.0)))
    assert(got(50L) === ((3L, 0L, 0L, 0.0, 0.0)))
    assert(got(100L) === ((3L, 0L, 0L, 0.0, 0.0)))
  }

  test("q196 refresh law: under an immutable doc roster, the per-class " +
    "edge counts are the mergeable digest — base + delta counts, stats " +
    "recomputed, equals the audit over the union bitwise") {
    import spark.implicits._
    def splitOf(id: Long): String = {
      val h = graft.functions.Md5Prefix56.hash56(
        s"sp:$id".getBytes(java.nio.charset.StandardCharsets.UTF_8)) % 10
      if (h < 8) "train" else if (h == 8) "val" else "test"
    }
    val docs = (1L to 60L).toDF("doc_id")
    val base = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L),
      (21L, 40L), (22L, 41L))
    val delta = Seq((11L, 12L), (13L, 14L), (23L, 42L), (24L, 55L),
      (25L, 60L))
    def classCounts(edges: Seq[(Long, Long)]): Map[(String, String), Long] =
      TextOps.splitLeakageOn(edges.toDF("id1", "id2"), docs).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cb = classCounts(base)
    graft.CachedFrames.drain()
    val cd = classCounts(delta)
    graft.CachedFrames.drain()
    // merge the digests (counts add; shares/lifts are recomputed from the
    // merged counts + the UNCHANGED roster sizes — the immutable-base
    // contract: a changed roster invalidates every class's denominator)
    val merged = (cb.keySet ++ cd.keySet).map(k =>
      k -> (cb.getOrElse(k, 0L) + cd.getOrElse(k, 0L))).toMap
    val sizes = (1L to 60L).groupBy(splitOf).view.mapValues(_.size).toMap
    val total = merged.values.sum
    val full = TextOps.splitLeakageOn((base ++ delta).toDF("id1", "id2"),
      docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    graft.CachedFrames.drain()
    assert(full.keySet === merged.keySet)
    merged.foreach { case (k @ (sa, sb), cnt) =>
      val kf = if (sa == sb) 1L else 2L
      val (ca, cb2) = (BigInt(sizes(sa)), BigInt(sizes(sb)))
      val n = BigInt(60)
      assert(full(k)._1 === cnt)
      assert(full(k)._2 === cnt.toDouble / total.toDouble)
      assert(full(k)._3 === (BigInt(kf) * ca * cb2).toDouble / (n * n).toDouble)
      assert(full(k)._4 === (BigInt(cnt) * n * n).toDouble /
        (BigInt(total) * kf * ca * cb2).toDouble)
    }
  }

  test("q232 vocab growth: exact prefix distinct-counts on a hand corpus " +
    "with an uneven decile split, the monotone-cover laws, and " +
    "all-deciles-present") {
    import spark.implicits._
    // 3 docs in doc_id order: d1 {a b}, d2 {b c}, d3 {a d e}. D = 3 →
    // cuts ceil(3k/10) = [1,1,1,2,2,2,3,3,3,3]; first ranks: a→1, b→1,
    // c→2, d→3, e→3 → deciles: r1 → (10·1−9+2)//3 = 1; r2 → (20−9+2)//3
    // = 4; r3 → (30−9+2)//3 = 7
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a d e"))
      .toDF("doc_id", "text")
    val got = try TextOps.vocabGrowthOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
      finally graft.CachedFrames.drain()
    assert(got.keySet === (1L to 10L).toSet)
    assert(got(1L) === ((1L, 2L, 2L)))   // after d1: {a, b}
    assert(got(4L) === ((2L, 3L, 1L)))   // after d2: + {c}
    assert(got(7L) === ((3L, 5L, 2L)))   // after d3: + {d, e}
    assert(got(10L) === ((3L, 5L, 0L)))  // tail deciles carry, add nothing
    // laws: vocab is non-decreasing and ends at the full distinct count
    val ordered = (1L to 10L).map(got(_)._2)
    assert(ordered === ordered.sorted)
    assert(ordered.last === 5L)
  }
}

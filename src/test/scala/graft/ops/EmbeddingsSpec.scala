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

  test("multi-probe (q60) candidate pool dominates single-probe (q46) recall") {
    val sf = "/root/testdata/sf0.001"
    try {
      // q60 probes each query's 2 nearest cells; its candidate pool is a
      // strict superset of q46's home-cell pool, so at every (qid, rk) the
      // multi-probe cosine must be >= the single-probe one — and queries
      // whose true neighbours sit across the cell boundary get MORE rows
      val single = Embeddings.q46IvfAnn(spark, sf)
        .select(col("qid"), col("rk"), col("cos").as("cos1")).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val multi = Embeddings.q60IvfMultiprobe(spark, sf)
        .select(col("qid"), col("rk"), col("cos").as("cos2")).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(multi.nonEmpty)
      // every single-probe hit is matched-or-beaten at the same rank
      single.foreach { case (key, c1) =>
        val c2 = multi.getOrElse(key, fail(s"q60 lost $key entirely"))
        assert(c2 >= c1, s"$key: multi-probe cos $c2 < single-probe $c1")
      }
      assert(multi.size >= single.size)
    } finally graft.CachedFrames.drain()
  }

  test("IVF recall@3 (q63) is real, and multi-probe recovers boundary queries") {
    val sf = "/root/testdata/sf0.001"
    try {
      val single = Embeddings.q63AnnRecall(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(single.size === 500) // every query scored, including 0-hit ones
      val singleHits = single.values.sum
      assert(singleHits > 0L)
      // recompute multi-probe hits against the same ground truth: probing 2
      // cells can only add candidates, so total hits must not decrease
      val truth = Embeddings.q29KnnBrute(spark, sf).filter(col("rk") <= 3)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val multi = Embeddings.q60IvfMultiprobe(spark, sf)
        .select(col("qid"), col("cand_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val multiHits = truth.count(multi.contains).toLong
      assert(multiHits >= singleHits,
        s"multi-probe hits $multiHits < single-probe $singleHits")
    } finally graft.CachedFrames.drain()
  }

  test("hash-seeded codebook (q74) decouples k from labels: more cells than labels in use") {
    val sf = "/root/testdata/sf0.001"
    try {
      val cells = Embeddings.q74HashIvf(spark, sf)
        .select("cell").distinct().collect().map(_.getInt(0)).toSet
      val nLabels = graft.Tables(spark, sf, "embeddings")
        .select("label").distinct().count()
      // the label codebook caps k at #labels; the hash seeding must not
      assert(cells.size > nLabels,
        s"only ${cells.size} hash cells in use vs $nLabels labels")
      assert(cells.forall(c => c >= 0 && c < Embeddings.HashCodebookK))
    } finally graft.CachedFrames.drain()
  }

  test("k-means training (q89): per-round distortion never increases and " +
    "trained recall beats the hash seed") {
    val sf = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), lit(0).as("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(dot_product(v, v))"))
    try {
      val ds = (1 to 3).map { r =>
        val d = Embeddings.distortionOf(e,
          Embeddings.trainedCentroids(e, Embeddings.HashCodebookK, r))
          .head().getDouble(0)
        info(f"round $r distortion: $d%.4f")
        d
      }
      // Lloyd's monotone non-increase; fixed-point means perturb each
      // coordinate by < 1e-12, hence the epsilon
      assert(ds(1) <= ds(0) + 1e-6 && ds(2) <= ds(1) + 1e-6, ds.toString)
      assert(ds(2) < ds(0), "training never moved the codebook")
      val rec = Embeddings.q89TrainedRecall(spark, sf).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      info(s"recall@3: $rec")
      assert(rec("trained") >= rec("hash"), rec.toString)
      assert(rec("trained") > 0.0)
    } finally graft.CachedFrames.drain()
  }

  test("PQ sub-codebook training: per-round sub-distortion never increases " +
    "and trained recall_pq >= hash-seeded recall_pq") {
    val sf = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    try {
      val e = graft.CachedFrames.track(Embeddings.vecs(spark, sf))
      // Lloyd monotonicity per subspace, summed: total reconstruction
      // distortion (q79's gate column) never increases with rounds
      val ds = (1 to Embeddings.PqTrainedRounds).map { r =>
        val d = Embeddings.pqCodesWide(e, Embeddings.pqTrainedCodebooks(e, r))
          .select((0 until Embeddings.PqM).map(m => col(s"d2_$m")).reduce(_ + _)
            .as("d"))
          .agg(sum(col("d"))).head().getDouble(0)
        info(f"PQ rounds $r total distortion: $d%.4f")
        d
      }
      ds.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a + 1e-6, ds.toString)
      }
      assert(ds.last < ds.head, "PQ training never moved the sub-codebooks")
      // measured recall on the identical ADC search path, books swapped
      val truth = graft.CachedFrames.track(
        Embeddings.q29KnnBrute(spark, sf).filter(col("rk") <= 3)
          .select(col("id1").as("qid"), col("id2").as("cand_id")))
      val nTruth = truth.count().toDouble
      def recallOf(books: org.apache.spark.sql.DataFrame): Double =
        truth.join(Embeddings.adcRankedWith(e, books, 3)
          .select(col("qid"), col("cand_id")), Seq("qid", "cand_id"))
          .count().toDouble / nTruth
      val hash = recallOf(Embeddings.pqCodebooks(e))
      val trained = recallOf(
        Embeddings.pqTrainedCodebooks(e, Embeddings.PqTrainedRounds))
      info(f"recall_pq hash=$hash%.4f trained=$trained%.4f")
      assert(trained >= hash, s"trained $trained < hash $hash")
      assert(trained > 0.0)
    } finally graft.CachedFrames.drain()
  }

  test("recall scoreboard (q75): multi-probe dominates single-probe per query, " +
    "recalls are valid fractions") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = Embeddings.q75RecallCompare(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (s, m, h, pq, rr) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(m >= s, s"qid ${r.getLong(0)}: recall_multi $m < recall_single $s")
        // the compressed-path dominance chain: the ADC top-3 (pq) is a
        // subset of the exact re-rank of the ADC top-10 (rerank — truth
        // inside the pool survives exact re-scoring), which can never beat
        // ranking the WHOLE cell by exact cosine (hash) — any true top-3
        // neighbour inside the cell is within the cell's exact top-3
        assert(pq <= rr, s"qid ${r.getLong(0)}: recall_pq $pq > recall_rerank $rr")
        assert(rr <= h, s"qid ${r.getLong(0)}: recall_rerank $rr > recall_hash $h")
        Seq(s, m, h, pq, rr).foreach(x => assert(x >= 0.0 && x <= 1.0))
      }
      // the comparison is only meaningful if some probe strategy finds hits
      assert(rows.map(_.getDouble(2)).sum > 0.0)
      // and the compressed path must retain most of the uncompressed recall
      assert(rows.map(_.getDouble(4)).sum > 0.0)
    } finally graft.CachedFrames.drain()
  }

  test("the argmin aggregation min(struct(d2, cell)) equals the window argmin " +
    "on random fan-outs, under any partitioning") {
    // q79/q80's core trick: collapsing the Ks-way candidate fan-out with a
    // map-side min(struct) partial instead of ranking after a shuffle.
    // Struct ordering must agree with the oracle's (d2 ASC, cell ASC)
    // row_number tie-break — including ties and scrambled layouts.
    import spark.implicits._
    val rnd = new scala.util.Random(647)
    val rows = (0 until 400).map { i =>
      // coarse-grained d2 values force frequent exact ties
      (i / 8L, rnd.nextInt(10), math.floor(rnd.nextDouble() * 4) / 4.0)
    }
    val df = rows.toDF("vec_id", "cell", "d2").repartition(13)
    val viaAgg = df.groupBy($"vec_id")
      .agg(min(struct($"d2", $"cell")).as("best"))
      .select($"vec_id", $"best.cell".as("cell"), $"best.d2".as("d2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"d2".asc, $"cell".asc)
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).select($"vec_id", $"cell", $"d2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("PQ encode (q79): one row per vector, codes address real sub-codebook " +
    "entries, distortion nonnegative") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = Embeddings.q79PqEncode(spark, sf).collect()
      val n = graft.Tables(spark, sf, "embeddings").count()
      assert(rows.length.toLong === n)
      rows.foreach { r =>
        val codes = r.getString(1).split('_').map(_.toInt)
        assert(codes.length === Embeddings.PqM)
        codes.foreach(c => assert(c >= 0 && c < Embeddings.PqKs))
        assert(r.getDouble(2) >= 0.0)
      }
      // the codebooks must actually discriminate: more than one distinct
      // code word in use overall
      assert(rows.map(_.getString(1)).distinct.length > 1)
    } finally graft.CachedFrames.drain()
  }

  test("IVF-PQ ADC search (q80): top-3 per query, ADC nondecreasing in rank") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = Embeddings.q80PqAdc(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
        val byRk = rs.sortBy(_.getInt(2))
        assert(byRk.length <= 3)
        assert(byRk.map(_.getInt(2)).toSeq === (1 to byRk.length))
        val adcs = byRk.map(_.getDouble(3))
        adcs.zip(adcs.tail).foreach { case (a, b) =>
          assert(a <= b, s"qid $qid: adc out of order")
        }
        adcs.foreach(a => assert(a >= 0.0))
      }
    } finally graft.CachedFrames.drain()
  }

  test("embedding admission (q78): every batch vector gets one verdict; " +
    "dup matches really clear the cosine bar") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = Embeddings.q78EmbeddingAdmission(spark, sf).collect()
      assert(rows.nonEmpty)
      val nBatch = graft.Tables(spark, sf, "embeddings")
        .filter(org.apache.spark.sql.functions.col("vec_id") < 100).count()
      assert(rows.length.toLong === nBatch) // exactly-once per batch vector
      rows.foreach { r =>
        val verdict = r.getString(1)
        if (verdict == "dup_semantic") {
          assert(!r.isNullAt(2) && r.getLong(2) >= 100) // matches are corpus ids
          assert(r.getDouble(3) >= 0.3)
        } else {
          assert(verdict === "new" && r.isNullAt(2))
          if (!r.isNullAt(3)) assert(r.getDouble(3) < 0.3)
        }
      }
      assert(rows.exists(_.getString(1) == "dup_semantic"),
        "threshold should admit some semantic dups on this embedding space")
    } finally graft.CachedFrames.drain()
  }

  test("int8 quantization (q62) reconstruction error is bounded by half a step") {
    val sf = "/root/testdata/sf0.001"
    // symmetric quantization with floor(x + 0.5) rounding: the dequantized
    // value is within half a quantization step (scale/127/2) of the input —
    // the bound re-ranking callers rely on. Also: q values stay in the int8
    // range and the max-|x| component is always exactly representable
    val rows = Embeddings.q62QuantizeInt8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      // q ships as the '_'-joined gate serialization (q26 convention)
      val q = r.getString(2).split('_').map(_.toInt).toSeq
      val err = r.getDouble(3)
      assert(q.forall(v => v >= -127 && v <= 127), s"vec ${r.getLong(0)}: $q")
      assert(scale >= 0.0)
      if (scale > 0.0) {
        assert(err <= scale / 254.0 * (1 + 1e-12), s"vec ${r.getLong(0)}: err=$err scale=$scale")
        assert(q.exists(v => math.abs(v) == 127), s"vec ${r.getLong(0)}: max component must hit ±127")
      } else assert(err === 0.0)
    }
  }

  /** Independent plain-Scala oracle for the semantic keep-set verdicts:
    * coverage, keep/evict consistency, and the exact evicted_by neighbor,
    * re-derived from raw vectors. The CELL PARTITION is taken from the
    * operator's own output (the codebooks differ across callers); the
    * pairwise decision is recomputed from scratch. */
  private def checkSemanticVerdicts(rows: Array[org.apache.spark.sql.Row],
      sf: String): Unit = {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    // exactly one verdict per vector, both verdicts present at this tau
    assert(rows.length.toLong === n)
    assert(rows.map(_.getLong(0)).distinct.length.toLong === n)
    val (evicted, kept) = rows.partition(_.getString(2) == "evict")
    assert(evicted.nonEmpty && kept.nonEmpty)
    // every evicted row names a strictly lower-id neighbor; keepers none
    evicted.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) < r.getLong(0), r.toString)
    }
    kept.foreach(r => assert(r.isNullAt(3), r.toString))

    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.keys.map { id =>
      // same left-fold order as the Spark/DuckDB dot, so the >= 0.35
      // comparison is bitwise-consistent, no epsilon needed (the synthetic
      // data has no cosine within 1e-9 of the threshold)
      val lower = vecs.keys.filter(o => o < id && cellOf(o) == cellOf(id) &&
        cos(vecs(id), vecs(o)) >= 0.35)
      id -> (if (lower.isEmpty) None else Some(lower.min))
    }.toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got === expected(id), s"vec $id")
    }
  }

  test("q106 semantic keep-set: verdicts cover the corpus and honor the cell-bounded cosine contract") {
    val sf = "/root/testdata/sf0.001"
    try checkSemanticVerdicts(Embeddings.q106SemanticKeep(spark, sf).collect(), sf)
    finally graft.CachedFrames.drain()
  }

  test("semantic keep-set over the TRAINED codebook: same verdict contract, different partition") {
    val sf = "/root/testdata/sf0.001"
    try {
      val e = graft.CachedFrames.track(Embeddings.vecs(spark, sf))
      val trained = Embeddings.semanticKeepOn(
        e, Embeddings.trainedCentroids(e, Embeddings.HashCodebookK, rounds = 3))
        .collect()
      checkSemanticVerdicts(trained, sf)
      // and it IS a different partition than the hash seed (training moved
      // at least one vector's cell), so this is not a vacuous re-run
      val hash = Embeddings.q106SemanticKeep(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(trained.exists(r => hash(r.getLong(0)) != r.getInt(1)))
    } finally graft.CachedFrames.drain()
  }

  test("q115 hard negatives: cross-label, rank-ordered, margin vs the best in-cell positive") {
    val sf = "/root/testdata/sf0.001"
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = try Embeddings.q115HardNegatives(spark, sf).collect()
      finally graft.CachedFrames.drain()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, negId) = (r.getLong(0), r.getLong(1))
      assert(qid !== negId)
      assert(labels(qid) !== labels(negId), s"negative $negId shares $qid's label")
      // a hard negative is never closer than the best positive is... false in
      // general — but margin must equal cos_pos - cos_neg when present
      if (!r.isNullAt(4))
        assert(r.getDouble(5) === r.getDouble(4) - r.getDouble(3))
    }
    // per query: ranks are 1..k and cosine is non-increasing in rank
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val byRk = rs.sortBy(_.getInt(2))
      assert(byRk.map(_.getInt(2)).toSeq === (1 to byRk.length))
      val cs = byRk.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"query $qid")
    }
  }

  test("q119 RRF fusion: score is the rank formula, dual-list hits outrank equal singles") {
    val rows = try Embeddings.q119RrfFusion(spark, "/root/testdata/sf0.001").collect()
      finally graft.CachedFrames.drain()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val vec = if (r.isNullAt(5)) None else Some(r.getInt(5))
      assert(lex.isDefined || vec.isDefined)
      val expected = lex.map(k => 1.0 / (Embeddings.RrfK + k)).getOrElse(0.0) +
        vec.map(k => 1.0 / (Embeddings.RrfK + k)).getOrElse(0.0)
      assert(r.getDouble(3) === expected, s"row $r")
    }
    // fused score from both lists strictly exceeds the best single-list score
    val bestSingle = 1.0 / (Embeddings.RrfK + 1)
    rows.filter(r => !r.isNullAt(4) && !r.isNullAt(5))
      .foreach(r => assert(r.getDouble(3) > 1.0 / (Embeddings.RrfK + r.getInt(4))
        && r.getDouble(3) > 1.0 / (Embeddings.RrfK + r.getInt(5))))
    assert(bestSingle > 0) // keep the constant referenced even if no dual hit at this SF
  }

  /** The library's fold order, in plain JVM form — the independent
    * reference the q128/q130 exactness specs score against. */
  private def dotFold(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))

  private def collectVecs(sf: String): Map[Long, IndexedSeq[Double]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toIndexedSeq)
      .toMap

  test("q125 kNN classification reproduces an independent majority vote over the brute neighbor lists") {
    val sf = "/root/testdata/sf0.001"
    val (nb, labels, got) = try {
      val nb = Embeddings.q29KnnBrute(spark, sf)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val labels = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Embeddings.q125KnnClassify(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getBoolean(4))).toSet
      (nb, labels, got)
    } finally graft.CachedFrames.drain()
    val expected = nb.groupBy(_._1).map { case (qid, rs) =>
      val votes = rs.map(p => labels(p._2)).groupBy(identity)
        .map { case (l, xs) => (l, xs.length.toLong) }
      // majority, ties by label ascending — the declared total order
      val (pred, n) = votes.toSeq.sortBy { case (l, v) => (-v, l) }.head
      (qid, labels(qid), pred, n, pred == labels(qid))
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // every vote count is within [1, topK]
    got.foreach { case (_, _, _, n, _) =>
      assert(n >= 1 && n <= Embeddings.DefaultAnn.topK) }
  }

  test("q128 k-center picks replay a plain-Scala greedy oracle bitwise; covering radius never increases") {
    val sf = "/root/testdata/sf0.001"
    val got = try Embeddings.q128KcenterCoreset(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
      finally graft.CachedFrames.drain()
    val vs = collectVecs(sf)
    val nrm = vs.map { case (id, v) => id -> math.sqrt(dotFold(v, v)) }
    // independent greedy: incremental min-dist with the same fold and the
    // same least() association order as the Spark column chain
    var chosen = List(vs.keys.min)
    var md = (vs.keys.toSeq.filter(_ != chosen.head)).map { id =>
      id -> (1.0 - dotFold(vs(id), vs(chosen.head)) / (nrm(id) * nrm(chosen.head)))
    }.toMap
    var expected = List((0, chosen.head, None: Option[Double]))
    for (r <- 1 to Embeddings.CoresetRounds) {
      val (pick, pmd) = md.toSeq.sortBy { case (id, d) => (-d, id) }.head
      expected ::= ((r, pick, Some(pmd)))
      chosen ::= pick
      md = (md - pick).map { case (id, d) =>
        id -> math.min(d, 1.0 - dotFold(vs(id), vs(pick)) / (nrm(id) * nrm(pick)))
      }
    }
    assert(got.toList === expected.reverse)
    // greedy farthest-point: the selection distances are non-increasing
    val ds = got.flatMap(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.mkString(","))
    assert(got.map(_._2).distinct.length === got.length)
  }

  test("q128 per-cell traversal is cell-independent: a crafted 2-cell split " +
    "selects exactly what one cell does, with winners crossing cells") {
    import spark.implicits._
    // 2D points on distinct rays so cosine distances are well-separated;
    // the cell split is ADVERSARIAL (alternating), so consecutive global
    // winners come from different cells and the max-of-maxes merge is
    // actually exercised
    val pts = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.5, 0.5)), (4L, Seq(-1.0, 0.2)), (5L, Seq(-0.3, -0.9)),
      (6L, Seq(0.2, -1.0)), (7L, Seq(-0.8, -0.6)), (8L, Seq(0.95, 0.05)),
      (9L, Seq(-0.1, 0.99)))
    def frame(cellOf: Long => Int) = pts.map { case (id, v) =>
      (id, v, math.sqrt(v.map(x => x * x).sum), cellOf(id))
    }.toDF("vec_id", "v", "nrm", "cell").repartition(4)
    val (two, one) = try {
      val two = Embeddings.kcenterOn(
        graft.CachedFrames.track(frame(id => (id % 2).toInt)))
        .collect().map(_.toSeq).toList
      val one = Embeddings.kcenterOn(
        graft.CachedFrames.track(frame(_ => 0)))
        .collect().map(_.toSeq).toList
      (two, one)
    } finally graft.CachedFrames.drain()
    assert(two === one)
    // the adversarial split really made consecutive picks cross cells
    val cells = two.map(r => (r(1).asInstanceOf[Long] % 2).toInt)
    assert(cells.distinct.size === 2, cells.mkString(","))
  }

  test("q130 per-dimension stats reproduce an exact plain-Scala recomputation") {
    val sf = "/root/testdata/sf0.001"
    val got = try Embeddings.q130DimStats(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
      finally graft.CachedFrames.drain()
    val vs = collectVecs(sf)
    val dims = vs.values.head.indices
    assert(got.keySet === dims.toSet)
    dims.foreach { d =>
      val ss = vs.values.map(v => math.floor(v(d) * 1e5).toLong)
      val (n, s1, s2) = (ss.size.toLong, ss.sum, ss.map(s => s * s).sum)
      val mean = s1.toDouble / (1e5 * n.toDouble)
      val varx = s2.toDouble / (1e5 * 1e5 * n.toDouble) - mean * mean
      assert(got(d) === ((n, s1, s2, mean, varx)), s"dim $d")
      // quantization bound: fixed-point mean is within 1e-5 of the float mean
      val exactMean = vs.values.map(v => v(d)).sum / n
      assert(math.abs(mean - exactMean) <= 1e-5, s"dim $d drifted")
    }
  }

  test("q135 bitext margin replays a plain-Scala ratio-margin oracle bitwise; admitted = margin >= tau") {
    val sf = "/root/testdata/sf0.001"
    val got = try Embeddings.q135BitextMargin(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
      finally graft.CachedFrames.drain()
    val vs = collectVecs(sf)
    val nrm = vs.map { case (id, v) => id -> math.sqrt(dotFold(v, v)) }
    val srcs = vs.keys.filter(id => id % 2 == 0 &&
      id < 2L * Embeddings.DefaultAnn.knnQueryIds).toSeq.sorted
    val tgts = vs.keys.filter(_ % 2 == 1).toSeq
    val expected = srcs.map { s =>
      val top = tgts
        .map(t => t -> dotFold(vs(s), vs(t)) / (nrm(s) * nrm(t)))
        .sortBy { case (t, c) => (-c, t) }.take(Embeddings.MarginK)
      // the same rank-ordered left fold the Spark aggregate() runs
      val mean = top.foldLeft(0.0)((a, p) => a + p._2) / top.length.toDouble
      val margin = top.head._2 / mean
      s -> ((top.head._1, top.head._2, mean, margin,
        margin >= Embeddings.MarginTau))
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
    // the top-1 can never sit below the mean of a list it leads
    got.values.foreach { case (_, _, _, m, _) => assert(m >= 1.0) }
  }

  test("q136 matryoshka recall replays a plain-Scala prefix-truncation oracle; recall grows with kept dims") {
    val sf = "/root/testdata/sf0.001"
    val got = try Embeddings.q136MatryoshkaRecall(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
      finally graft.CachedFrames.drain()
    val vs = collectVecs(sf)
    val qs = vs.keys.filter(_ < Embeddings.DefaultAnn.knnQueryIds).toSeq
    def topAt(d: Int): Set[(Long, Long)] = qs.flatMap { q =>
      val pv = vs(q).take(d)
      val pn = math.sqrt(dotFold(pv, pv))
      vs.keys.filter(_ != q).toSeq
        .map { o =>
          val ov = vs(o).take(d)
          o -> dotFold(pv, ov) / (pn * math.sqrt(dotFold(ov, ov)))
        }
        .sortBy { case (o, c) => (-c, o) }.take(Embeddings.MatryoshkaK)
        .map(p => (q, p._1))
    }.toSet
    val truth = topAt(64)
    val expected = Embeddings.MatryoshkaDims.map { d =>
      val hits = (topAt(d) & truth).size.toLong
      d -> ((hits, truth.size.toLong, hits.toDouble / truth.size.toDouble))
    }.toMap
    assert(got === expected)
    assert(got.keySet === Embeddings.MatryoshkaDims.toSet)
    // more kept dimensions never hurt on these fixtures — the curve a
    // serving team reads off this table to pick its truncation point
    val ordered = Embeddings.MatryoshkaDims.sorted.map(got(_)._3)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
      ordered.mkString(","))
  }

  test("q143 MMR picks replay a plain-Scala greedy oracle bitwise; picks " +
    "are unique per query and include non-top-rel diversity picks") {
    val sf = "/root/testdata/sf0.001"
    val got = try Embeddings.q143MmrSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
      finally graft.CachedFrames.drain()
    val vs = collectVecs(sf)
    val nrm = vs.map { case (id, v) => id -> math.sqrt(dotFold(v, v)) }
    def cos(a: Long, b: Long) = dotFold(vs(a), vs(b)) / (nrm(a) * nrm(b))
    val expected = (0L until Embeddings.MmrQueryIds).flatMap { qid =>
      val pool = vs.keys.filter(_ >= Embeddings.MmrQueryIds).toSeq
        .map(c => (c, cos(qid, c)))
        .sortBy { case (c, rel) => (-rel, c) }
        .take(Embeddings.MmrPoolK)
      var ms = pool.map { case (c, _) => c -> 0.0 }.toMap
      var picks = List.empty[(Long, Int, Long, Double, Double)]
      for (r <- 1 to Embeddings.MmrSelectK) {
        val rels = pool.toMap
        val (pc, sc) = ms.toSeq
          .map { case (c, m) =>
            (c, Embeddings.MmrLambda * rels(c) - Embeddings.MmrLambdaC * m) }
          .sortBy { case (c, s) => (-s, c) }.head
        picks ::= ((qid, r, pc, rels(pc), sc))
        ms = (ms - pc).map { case (c, m) => c -> math.max(m, cos(c, pc)) }
      }
      picks.reverse
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected)
    // structure: SelectK unique picks per query
    got.groupBy(_._1).foreach { case (_, ps) =>
      assert(ps.length === Embeddings.MmrSelectK)
      assert(ps.map(_._3).distinct.length === ps.length)
    }
    // diversity is real somewhere in the batch: at least one query's pick
    // set differs from its pure top-relevance set
    val topRel = (0L until Embeddings.MmrQueryIds).map { qid =>
      qid -> vs.keys.filter(_ >= Embeddings.MmrQueryIds).toSeq
        .map(c => (c, cos(qid, c))).sortBy { case (c, rel) => (-rel, c) }
        .take(Embeddings.MmrSelectK).map(_._1).toSet
    }.toMap
    assert((0L until Embeddings.MmrQueryIds).exists(q =>
      got.filter(_._1 == q).map(_._3).toSet != topRel(q)))
  }

  test("q158 gram power: plain-Scala integer replay on an axis-dominant " +
    "fixture; the dominant component emerges, negatives sign-split safely") {
    import spark.implicits._
    // axis 0 carries 4x the energy of axis 1; a negative coordinate
    // exercises the sign-split division path
    val rows = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(-1.0, 0.0),
      Seq(0.0, 0.5)).toDF("v")
    val got = Embeddings.gramPowerOn(rows).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // exact replay of the documented integer algorithm
    val s = 1L << 20
    val q = Seq(Seq(s, 0L), Seq(s, 0L), Seq(-s, 0L), Seq(0L, s / 2))
    def signDiv(x: Long, d: Long) = if (x < 0) -((-x) / d) else x / d
    val mRaw = (for (j <- 0 to 1; k <- 0 to 1)
      yield (j, k) -> q.map(r => r(j) * r(k)).sum).toMap
    val cap = math.max(1L, mRaw.values.map(math.abs).max / (1L << 31) + 1L)
    val m = mRaw.map { case (jk, x) => jk -> signDiv(x, cap) }
    var v = Map(0 -> s, 1 -> s)
    for (_ <- 1 to Embeddings.GramRounds) {
      val u = (0 to 1).map(j => j -> (0 to 1).map(k => m((j, k)) * v(k)).sum).toMap
      val d = math.max(1L, u.values.map(math.abs).max / s)
      v = u.map { case (j, x) => j -> signDiv(x, d) }
    }
    val nv = math.sqrt(v.values.map(x => (x * x).toDouble).sum)
    assert(got.keySet === Set(0, 1))
    assert(got(0)._1 === v(0) && got(1)._1 === v(1))
    assert(got(0)._2 === v(0).toDouble / nv)
    assert(got(1)._2 === v(1).toDouble / nv)
    // the dominant axis dominates the unit vector
    assert(math.abs(got(0)._2) > 0.99 && math.abs(got(1)._2) < 0.12)
  }

  test("q159 mutual nn: reciprocity keeps true pairs and kills the " +
    "hub-attracted one-way match") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, sqrt}
    // even = src side, odd = tgt side; src 4's best is tgt 1, but tgt 1
    // reciprocates src 0 -> (4,1) must NOT survive
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (2L, Seq(0.8, 0.6)), (4L, Seq(0.995, 0.1)),
      (1L, Seq(1.0, 0.0)), (3L, Seq(0.6, 0.8))).toDF("vec_id", "v0")
    graft.functions.GraftFunctions.register(spark)
    val e = rows.select(col("vec_id"),
        expr("transform(v0, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(
        org.apache.spark.sql.functions.call_function(
          "dot_product", col("v"), col("v"))))
    val got = Embeddings.mutualNnOn(e, AnnConfig()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (2L, 3L)))
  }

  test("q164 cell balance: shares sum to one, counts sum to the corpus, " +
    "the hot flag is exactly the cross-multiplied 2x-fair-share test") {
    val got = Embeddings.q164CellBalance(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    graft.CachedFrames.drain()
    val total = got.map(_._1).sum
    val nCells = got.head._2
    assert(got.length.toLong === nCells)
    assert(total === spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count())
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-9)
    got.foreach { case (n, c, _, hot) =>
      assert(hot === (n * c > 2L * total))
    }
  }

  test("q169 binary codes: hand-signed vectors pack to the exact words, " +
    "Hamming ranks by disagreement count, zero counts as positive sign") {
    import spark.implicits._
    val plus = Seq.fill(64)(1.0)
    val minus = Seq.fill(64)(-1.0)
    // first 32 dims >= 0 (dim 1 EXACTLY 0.0 — the sign convention pin),
    // last 32 negative → lo = 2^32 - 1, hi = 0
    val half = 0.0 +: (Seq.fill(31)(2.5) ++ Seq.fill(32)(-0.5))
    val e = Seq((0L, plus), (1L, minus), (2L, half)).toDF("vec_id", "v")
    val got = Embeddings.binaryAnnOn(e, queryBound = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    graft.CachedFrames.drain()
    // query 0 (all-plus): half disagrees on 32 bits, minus on all 64
    assert(got.toSeq === Seq((0L, 2L, 1, 32), (0L, 1L, 2, 64)))
  }

  test("q192 centroid coherence: bitwise equal to the plain-Scala BigInt " +
    "quantized-centroid cosine on axis-aligned fixtures; an aligned label " +
    "scores higher than an orthogonal one; quantization is exact for " +
    "float components") {
    import spark.implicits._
    val vecs: Seq[(Int, Seq[Float])] = Seq(
      (1, Seq(1.0f, 0.0f, 0.0f)), (1, Seq(0.5f, 0.5f, 0.0f)),
      (1, Seq(0.75f, 0.25f, 0.0f)),
      (2, Seq(0.0f, 0.0f, 1.0f)),
      (2, Seq(0.0f, 0.25f, 0.75f)))
    val emb = vecs.toDF("label", "embedding")
    // plain-Scala oracle over the same ⌊x·2²⁴⌋ lattice
    val scale = Embeddings.CentroidQuantScale
    def quant(v: Seq[Float]): Seq[BigInt] =
      v.map(x => BigInt(math.floor(x.toDouble * scale).toLong))
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(t => quant(t._2))
      .transpose.map(_.sum)).toMap
    val global = byLabel.values.toSeq.transpose.map(_.sum)
    def cos(a: Seq[BigInt], b: Seq[BigInt]): Double = {
      val sg = a.zip(b).map { case (x, y) => x * y }.sum
      val ss = a.map(x => x * x).sum; val gg = b.map(x => x * x).sum
      sg.toDouble / (math.sqrt(ss.toDouble) * math.sqrt(gg.toDouble))
    }
    val got = Embeddings.centroidCoherenceOn(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    graft.CachedFrames.drain()
    assert(got(1)._1 === 3L && got(2)._1 === 2L)
    assert(got(1)._2 === cos(byLabel(1), global)) // bitwise
    assert(got(2)._2 === cos(byLabel(2), global))
    // the x-heavy label dominates the corpus sum → it coheres more
    assert(got(1)._2 > got(2)._2)
    assert(got.values.forall(v => v._2 > 0.0 && v._2 <= 1.0))
  }

  test("q203 separation: orthogonal label centroids score EXACTLY 0, " +
    "same-direction centroids EXACTLY 1, a mixed pair matches the " +
    "plain-Scala BigInt cosine bitwise; pairs are unordered a < b") {
    import spark.implicits._
    val vecs: Seq[(Int, Seq[Float])] = Seq(
      (1, Seq(1.0f, 0.0f, 0.0f)), (1, Seq(0.5f, 0.0f, 0.0f)), // +x only
      (2, Seq(0.0f, 1.0f, 0.0f)),                             // +y only
      (3, Seq(0.25f, 0.0f, 0.0f)),                            // +x again
      (4, Seq(0.5f, 0.5f, 0.0f)), (4, Seq(0.25f, -0.25f, 0.5f)))
    val emb = vecs.toDF("label", "embedding")
    val scale = Embeddings.CentroidQuantScale
    def quant(v: Seq[Float]): Seq[BigInt] =
      v.map(x => BigInt(math.floor(x.toDouble * scale).toLong))
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(t => quant(t._2))
      .transpose.map(_.sum)).toMap
    def cos(a: Seq[BigInt], b: Seq[BigInt]): Double = {
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      val sa = a.map(x => x * x).sum; val sb = b.map(x => x * x).sum
      sab.toDouble / (math.sqrt(sa.toDouble) * math.sqrt(sb.toDouble))
    }
    val got = Embeddings.centroidSeparationOn(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    graft.CachedFrames.drain()
    assert(got.keySet ===
      (for (a <- 1 to 4; b <- a + 1 to 4) yield (a, b)).toSet)
    assert(got((1, 2)) === 0.0) // +x vs +y: orthogonal exactly
    assert(got((2, 3)) === 0.0)
    assert(got((1, 3)) === 1.0) // same direction, different magnitude
    got.foreach { case ((a, b), c) =>
      assert(c === cos(byLabel(a), byLabel(b)), s"($a,$b)") // bitwise
    }
  }

  test("q193 dispersion: n copies of one vector score EXACTLY 1, mutually " +
    "orthogonal members score exactly 1/n, a mixed label matches the " +
    "plain-Scala BigInt formula bitwise") {
    import spark.implicits._
    val vecs: Seq[(Int, Seq[Float])] = Seq(
      (1, Seq(0.3f, -0.7f, 0.2f)), (1, Seq(0.3f, -0.7f, 0.2f)),
      (1, Seq(0.3f, -0.7f, 0.2f)),                       // 3 copies → R² = 1
      (2, Seq(1.0f, 0.0f, 0.0f)), (2, Seq(0.0f, 1.0f, 0.0f)),
      (2, Seq(0.0f, 0.0f, 1.0f)),                        // orthogonal → 1/3
      (3, Seq(0.5f, 0.5f, 0.0f)), (3, Seq(0.25f, -0.5f, 0.75f)))
    val got = Embeddings.labelDispersionOn(vecs.toDF("label", "embedding"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    graft.CachedFrames.drain()
    assert(got(1) === ((3L, 1.0)))       // exact, not approximate
    assert(got(2) === ((3L, 1.0 / 3.0)))
    val scale = Embeddings.CentroidQuantScale
    def quant(v: Seq[Float]): Seq[BigInt] =
      v.map(x => BigInt(math.floor(x.toDouble * scale).toLong))
    val l3 = vecs.filter(_._1 == 3).map(t => quant(t._2))
    val s = l3.transpose.map(_.sum)
    val ss = s.map(x => x * x).sum
    val svv = l3.flatten.map(x => x * x).sum
    assert(got(3)._2 === ss.toDouble / (BigInt(l3.size) * svv).toDouble)
    assert(got(3)._2 > 1.0 / 2.0 - 0.4 && got(3)._2 < 1.0)
  }

  test("q175 JL distortion: percentiles are ordered real pair ratios " +
    "(fixed point exact), pair count matches the bounded batch") {
    val sf = "/root/testdata/sf0.001"
    val r = Embeddings.q175JlDistortion(spark, sf).collect()(0)
    graft.CachedFrames.drain()
    val (np, p01, p50, p99) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val qn = math.min(Embeddings.DefaultAnn.knnQueryIds, total)
    // qid < cand_id over (queries × corpus): Σ_{q<Q} (total − q − 1)
    val expectedPairs = (0L until qn).map(q => total - q - 1).sum
    assert(np === expectedPairs)
    assert(p01 <= p50 && p50 <= p99)
    // Cauchy-Schwarz: (s_j·x)² ≤ 64‖x‖² per plane → ratio² ≤ d = 64
    assert(p01 > 0.0 && p99 <= 64.0)
    // every reported value is a real pair's fixed-point ratio: ·1e12 integral
    Seq(p01, p50, p99).foreach { p =>
      val s = p * 1e12
      assert(math.abs(s - math.round(s)) < 1e-3, s.toString)
    }
  }

  test("q168 MRR: the fixed point is exact (mrr * 2520 * n_queries is an " +
    "integer) and sits inside the hit-rate envelope") {
    val r = Embeddings.q168Mrr(spark, "/root/testdata/sf0.001").collect()(0)
    graft.CachedFrames.drain()
    val (nq, nh, mrr) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nq > 0 && nh <= nq)
    // every hit contributes between 2520/10 and 2520/1 scaled units
    val scaled = mrr * 2520.0 * nq.toDouble
    assert(math.abs(scaled - math.round(scaled)) < 1e-6)
    assert(mrr <= nh.toDouble / nq.toDouble + 1e-12)
    assert(mrr >= nh.toDouble / (10.0 * nq.toDouble) - 1e-12)
  }

  test("q231 nDCG: the discount/IDCG literals satisfy the defining " +
    "identities, and the sf0.001 score is a proper [0, 1] mean over the " +
    "full query batch") {
    // independent recomputation of the literals (guards a silent edit)
    val disc = (1 to 10).map(i => math.log(2.0) / math.log(i + 1.0))
    Embeddings.NdcgDisc.zip(disc).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-15) }
    assert(Embeddings.NdcgDisc.head === 1.0) // rank 1 undiscounted
    val idcg = (1 to 10).map(i => (11 - i) * disc(i - 1)).sum
    assert(math.abs(Embeddings.NdcgIdcg - idcg) < 1e-12)
    val r = try Embeddings.q231Ndcg(spark, "/root/testdata/sf0.001")
      .collect()(0) finally graft.CachedFrames.drain()
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("q234 RBO core: identical rankings score exactly 1, disjoint " +
    "score 0, a reversed ranking matches the plain-Scala mirror fold") {
    import spark.implicits._
    def frame(pairs: Seq[(Long, Long, Int)], rc: String) =
      pairs.toDF("qid", "cand_id", rc)
    val ident = (1 to 10).map(d => (1L, 100L + d, d))
    def run(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)]) = {
      val r = Embeddings.rboOn(frame(a, "ra"), frame(b, "rb")).collect()(0)
      graft.CachedFrames.drain()
      (r.getLong(0), r.getDouble(1))
    }
    assert(run(ident, ident) === ((1L, 1.0))) // EXACT: same fold as norm
    val disjoint = (1 to 10).map(d => (1L, 900L + d, d))
    assert(run(ident, disjoint) === ((1L, 0.0)))
    // reversed: item at truth rank d sits at binary rank 11−d
    val rev = (1 to 10).map(d => (1L, 100L + d, 11 - d))
    // plain-Scala mirror: fold W_max(ra, rb) ordered by (m, cand_id)
    val exp = {
      val items = (1 to 10).map(d => (math.max(d, 11 - d), 100L + d))
        .sortBy(identity)
      var s = 0.0
      items.foreach { case (m, _) => s += Embeddings.RboW(m - 1) }
      s / Embeddings.RboNorm
    }
    assert(run(ident, rev) === ((1L, exp)))
    // two queries, one perfect one absent: mean = (1 + 0) / 2
    val two = ident ++ (1 to 10).map(d => (2L, 200L + d, d))
    assert(run(two, ident) === ((2L, 0.5)))
  }

  test("q234 RBO property: random overlapping rankings across several " +
    "queries match the plain-Scala mirror fold bitwise (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(647)
    (1 to 4).foreach { _ =>
      val nq = 1 + rnd.nextInt(3)
      def ranking(qid: Long): Seq[(Long, Long, Int)] = {
        val pool = rnd.shuffle((1L to 15L).toList).take(10)
        pool.zipWithIndex.map { case (c, i) => (qid, c, i + 1) }
      }
      val a = (1L to nq).flatMap(ranking)
      val b = (1L to nq).flatMap(ranking)
      // mirror: per qid, fold W_max(ra,rb) over (m, cand) asc, / norm;
      // mean folds qid-ascending over queries present in a
      val bm = b.map(t => (t._1, t._2) -> t._3).toMap
      var s = 0.0
      (1L to nq).foreach { q =>
        val items = a.filter(_._1 == q)
          .flatMap(t => bm.get((q, t._2)).map(rb =>
            (math.max(t._3, rb), t._2)))
          .sortBy(identity)
        var pq = 0.0
        items.foreach { case (m, _) => pq += Embeddings.RboW(m - 1) }
        s += pq / Embeddings.RboNorm
      }
      val exp = s / nq.toDouble
      val r = Embeddings.rboOn(a.toDF("qid", "cand_id", "ra"),
        b.toDF("qid", "cand_id", "rb")).collect()(0)
      graft.CachedFrames.drain()
      assert((r.getLong(0), r.getDouble(1)) === ((nq.toLong, exp)))
    }
  }

  test("q231/q234 truth wiring: the shipped truth side carries exactly " +
    "depth rows per query, and the shipped truth self-agrees under the " +
    "RBO core at exactly 1 (round-14 advisory depth regression)") {
    // Under the pre-r15 wiring (truth sourced from the 5-deep scoreboard
    // default) every assertion below fails: per-query truth depth reads
    // 5, and the self-RBO caps at sum(RboW(0..4))/RboNorm ≈ 0.797.
    val sf = "/root/testdata/sf0.001"
    val truth = try {
      Embeddings.q29KnnBrute(spark, sf,
          Embeddings.DefaultAnn.copy(topK = Embeddings.RboDepth))
        .groupBy(col("id1"))
        .agg(count(lit(1)).as("n"), max(col("rk")).as("maxrk"))
        .collect()
    } finally graft.CachedFrames.drain()
    assert(truth.nonEmpty)
    truth.foreach { r =>
      assert(r.getLong(1) === Embeddings.RboDepth.toLong)
      assert(r.getInt(2) === Embeddings.RboDepth)
    }
    assert(Embeddings.RboDepth === Embeddings.NdcgDepth) // one check covers both
    val t = try {
      Embeddings.q29KnnBrute(spark, sf,
          Embeddings.DefaultAnn.copy(topK = Embeddings.RboDepth))
        .select(col("id1").as("qid"), col("id2").as("cand_id"),
          col("rk").cast("int").as("ra"))
    } finally {}
    val self = try Embeddings.rboOn(t,
        t.withColumnRenamed("ra", "rb")).collect()(0)
      finally graft.CachedFrames.drain()
    assert(self.getLong(0) === truth.length.toLong)
    assert(self.getDouble(1) === 1.0) // EXACT: numerator fold IS the normalizer
  }

  test("q230 embedding health: exact norm picks on the lattice, n copies " +
    "of one vector cohere at exactly 1, an orthogonal basis at exactly " +
    "1/n") {
    import spark.implicits._
    def run(vecs: Seq[(Long, Seq[Float])]) = {
      val df = vecs.toDF("vec_id", "embedding")
      val r = Embeddings.embeddingHealthOn(df).collect()(0)
      graft.CachedFrames.drain()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))
    }
    val u = 16777216L * 16777216L // one unit component squared
    // 4 copies of e1: norms all u; resultant (4·2²⁴)² = 16u →
    // R² = 16u / (4·4u) = 1 exactly
    val c = run((1L to 4L).map(i => (i, Seq(1.0f, 0f, 0f))))
    assert(c === ((4L, u, u, u, u.toDouble, 1.0)))
    // orthogonal basis e1, e2, e3: R² = 3u/(3·3u) = 1/3 exactly; norms u
    val o = run(Seq((1L, Seq(1.0f, 0f, 0f)), (2L, Seq(0f, 1.0f, 0f)),
      (3L, Seq(0f, 0f, 1.0f))))
    assert(o === ((3L, u, u, u, u.toDouble, 1.0 / 3.0)))
    // mixed norms: [e1, 2·e1, 3·e1] → norm2 [u, 4u, 9u]; p50 rank 2 →
    // 4u, p90/p99 rank 3 → 9u; resultant (1+2+3)² = 36u → R² =
    // 36u/(3·14u) = 6/7
    val m = run(Seq((1L, Seq(1.0f, 0f)), (2L, Seq(2.0f, 0f)),
      (3L, Seq(3.0f, 0f))))
    assert(m === ((3L, 4L * u, 9L * u, 9L * u, 14.0 * u / 3.0, 36.0 / 42.0)))
  }
}

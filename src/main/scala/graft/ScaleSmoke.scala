package graft

import graft.dedup.DedupPipeline
import graft.ml.Febrl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: run the full blocking + exactly-once pair generation on the
  * reference's 20k-record train fixture (~50M candidate pairs — the
  * workload the reference reports at ~6 min on an 8-node cluster) and print
  * pair/duplicate counts with wall time. Usage:
  *   sbt "runMain graft.ScaleSmoke [inputCsv] [--features|--train]"
  * `--features` also evaluates the 14-comparator projection (the full job,
  * not just candidate generation); `--triangle` uses the skew-managed
  * physical strategy (k = cpus) instead of the declarative self-join;
  * `--train` reproduces the reference's headline result end-to-end — pair
  * generation PLUS the GBT duplicate classifier on the 50.6M-pair frame —
  * and asserts the quality band against the published train confusion
  * matrix (TN 15,180,436 / FN 152 / FP 1 / TP 6,324 ⇒ recall ≈ 0.977,
  * precision ≈ 0.9998; `/root/reference/README.md:234-236`).
  * `--curate [sfDir]` instead smokes the training-data surface: the full
  * curation pipeline (q51) + shard assignment + sorted-shard write on the
  * sfDir documents table, printing survivor/shard counts and wall time.
  * `--epoch [sfDir]` smokes the epoch planner: builds the full
  * mixture-weighted packing plan and re-verifies the dense-packing
  * invariant (per source in (doc_id, rep) order, every (seq_id, offset)
  * equals the running token sum — the property the two-phase distributed
  * prefix sum must preserve) over EVERY plan row at the smoke SF.
  * `--ingest [sfDir]` smokes the cron-driven ingestion loop
  * (`cli.IngestBatches`) at the smoke SF: seed index from 1/5 of the
  * documents, stage two waves of batches (the second containing exact
  * copies of first-wave admitted docs), run the job once per wave over
  * the same checkpoint, and verify every verdict lands exactly once with
  * all cross-invocation copies caught as dup_exact.
  * `--ingestvec [sfDir]` smokes the vector-family ingestion loop through
  * the generic IngestIndex job at the smoke SF: wave 1 bootstraps the
  * frozen codebook, wave 2 carries exact copies of wave-1 vectors that
  * only the grown cells can catch, and the wave-2 verdicts must equal
  * the batch admission law under the persisted codebook (distributed
  * compare).
  * `--tokenizer [sfDir]` smokes TrainTokenizer → EncodeCorpus: train the
  * merge artifact on the full documents table, encode the corpus from
  * the saved artifact, and verify the corpus-wide count invariants
  * (1 ≤ n_bpe ≤ chars per doc, merges strictly compress in total).
  * `--decontam [sfDir]` smokes the persisted Bloom artifact flow
  * (BuildBloomFilter → ProbeBloom) at the smoke SF and verifies zero
  * false negatives against the exact-join truth plus the constructed
  * bitmap bound.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val input = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/reference/data/train.csv")
    val withFeatures = args.contains("--features")
    val triangle = args.contains("--triangle")
    val trainMode = args.contains("--train")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--curate")) {
      val sfDir = args.dropWhile(_ != "--curate").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      val out = java.nio.file.Files.createTempDirectory("graft-curate-smoke").toString
      val t0 = System.nanoTime()
      val survivors = graft.ops.Curation.curateToShards(
        Tables.parallelized(Tables(spark, sfDir, "documents")), cpus.toInt, out)
      val back = spark.read.parquet(out)
      val secs = (System.nanoTime() - t0) / 1e9
      // layout contract, verified on the actual files: every shard=K dir
      // holds exactly ONE parquet file whose rows read back in training
      // order (pos = 1..n contiguous) — the property a shard reader
      // streams without sorting
      val shardDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      val layoutOk = shardDirs.nonEmpty && shardDirs.forall { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        files.length == 1 && {
          val pos = spark.read.parquet(files.head.getPath)
            .select("pos").collect().map(_.getLong(0))
          pos.sameElements(1L to pos.length.toLong)
        }
      }
      println(f"survivors=${back.count()} (expected $survivors) " +
        f"shards=${back.select("shard").distinct().count()} " +
        f"layout_sorted=$layoutOk mode=curate wall=$secs%.1f s")
      require(layoutOk, "shard layout violated: expected one pos-ordered file per shard")
      CachedFrames.drain()
      // the smoke output can be a full curated corpus copy — don't leak it
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(out))
      spark.stop()
      return
    }
    if (args.contains("--ingest")) {
      val sfDir = args.dropWhile(_ != "--ingest").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      val root = java.nio.file.Files.createTempDirectory("graft-ingest-smoke").toString
      val (inDir, idx, ver, ckpt) =
        (s"$root/in", s"$root/idx", s"$root/verdicts", s"$root/ckpt")
      val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val corpus = docs.filter(col("doc_id") % 5 === 0)
      val (d0, b0) = graft.ops.Curation.corpusIndexFrames(corpus)
      d0.write.parquet(s"$idx/digests")
      b0.write.parquet(s"$idx/bands")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
      // wave 1: two slices of fresh documents
      docs.filter(col("doc_id") % 5 === 1).coalesce(1)
        .write.mode("append").parquet(inDir)
      graft.cli.IngestBatches.main(Array("--input", inDir, "--index", idx,
        "--verdicts", ver, "--checkpoint", ckpt))
      // wave 2: fresh docs PLUS exact copies (shifted ids) of wave-1 docs
      val idShift = 100000000L
      docs.filter(col("doc_id") % 5 === 2).coalesce(1)
        .write.mode("append").parquet(inDir)
      docs.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + idShift).as("doc_id"), col("text"))
        .coalesce(1).write.mode("append").parquet(inDir)
      graft.cli.IngestBatches.main(Array("--input", inDir, "--index", idx,
        "--verdicts", ver, "--checkpoint", ckpt))
      val secs = (System.nanoTime() - t0) / 1e9
      val verdicts = spark.read.parquet(ver)
      val n = verdicts.count()
      val nUnique = verdicts.select("doc_id").distinct().count()
      val staged = spark.read.parquet(inDir).count()
      // no cross-invocation copy may slip through as `new`: a copy whose
      // wave-1 original was ADMITTED hits that original's appended digest
      // (dup_exact); a copy whose original was itself a dup hits whatever
      // the original hit (dup_exact via the corpus digest, or dup_near via
      // the same bands). Every match id must be pre-shift.
      val copies = verdicts.filter(col("doc_id") >= idShift)
      val nCopies = copies.count()
      val copyNew = copies.filter(col("verdict") === "new").count()
      val copyExact = copies.filter(col("verdict") === "dup_exact").count()
      val badMatch = copies.filter(col("match_id") >= idShift).count()
      println(f"staged=$staged verdicts=$n unique=$nUnique copies=$nCopies " +
        f"copy_exact=$copyExact copy_new=$copyNew mode=ingest wall=$secs%.1f s")
      require(n == staged && nUnique == n,
        s"each staged doc must verdict exactly once: staged=$staged n=$n unique=$nUnique")
      require(nCopies > 0 && copyNew == 0 && copyExact > 0 && badMatch == 0,
        s"cross-invocation copies must never admit as new and must match " +
          s"pre-shift docs: new=$copyNew exact=$copyExact bad_match=$badMatch")
      spark.stop()
      return
    }
    if (args.contains("--ingestvec")) {
      // the vector-family twin of --ingest: two cron waves through the
      // generic IngestIndex job (family=vector) at the smoke SF — wave 1
      // bootstraps the frozen codebook, wave 2 carries exact copies
      // (shifted ids) of wave-1 vectors that only the GROWN cells can
      // catch, plus the wave-2 law check against the batch admission
      // under the persisted codebook, compared distributed
      val sfDir = args.dropWhile(_ != "--ingestvec").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      val root = java.nio.file.Files.createTempDirectory("graft-ingestvec-smoke").toString
      val (inDir, idx, ver, ckpt) =
        (s"$root/in", s"$root/vx", s"$root/verdicts", s"$root/ckpt")
      val vecs = Tables.parallelized(Tables(spark, sfDir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      val t0 = System.nanoTime()
      val wave1 = vecs.filter(col("vec_id") % 5 === 1)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
      wave1.coalesce(1).write.mode("append").parquet(inDir)
      graft.cli.IngestIndex.main(Array("--family", "vector",
        "--input", inDir, "--index", idx, "--output", ver,
        "--checkpoint", ckpt))
      val idShift = 100000000L
      val wave2 = vecs.filter(col("vec_id") % 5 === 2).unionByName(
        wave1.select((col("vec_id") + idShift).as("vec_id"), col("embedding")))
      wave2.coalesce(1).write.mode("append").parquet(inDir)
      graft.cli.IngestIndex.main(Array("--family", "vector",
        "--input", inDir, "--index", idx, "--output", ver,
        "--checkpoint", ckpt))
      val secs = (System.nanoTime() - t0) / 1e9
      val verdicts = spark.read.parquet(ver)
      val n = verdicts.count()
      val nUnique = verdicts.select("vec_id").distinct().count()
      val staged = spark.read.parquet(inDir).count()
      // every exact copy must hit the grown cells at cosine 1 and match a
      // pre-shift id (min-id tie-break may pick another >=tau original)
      val copies = verdicts.filter(col("vec_id") >= idShift)
      val nCopies = copies.count()
      val copyNew = copies.filter(col("verdict") === "new").count()
      val badMatch = copies.filter(col("match_id") >= idShift).count()
      // wave-2 law, distributed: verdicts(batch=1) ≡ the batch admission
      // against the persisted codebook + wave-1's cells
      val cb = spark.read.parquet(s"$idx/codebook")
      val got = spark.read.parquet(s"$ver/batch=1")
        .select(col("vec_id"), col("verdict"), col("match_id"), col("best_cos"))
      val law = graft.ops.Embeddings.admitVectorsAgainstIndex(wave2, cb,
          graft.ops.Embeddings.cellsUnderCodebook(wave1, cb))
        .select(col("vec_id"), col("verdict"), col("match_id"), col("best_cos"))
      val (gn, ln) = (got.count(), law.count())
      val lawDiff = got.exceptAll(law).limit(3).collect()
      println(f"staged=$staged verdicts=$n unique=$nUnique copies=$nCopies " +
        f"copy_new=$copyNew bad_match=$badMatch law_rows=$gn/$ln " +
        f"mode=ingestvec wall=$secs%.1f s")
      require(n == staged && nUnique == n,
        s"each staged vector must verdict exactly once: staged=$staged n=$n unique=$nUnique")
      require(nCopies > 0 && copyNew == 0 && badMatch == 0,
        s"cross-wave copies must never admit as new: new=$copyNew bad_match=$badMatch")
      require(gn == ln && lawDiff.isEmpty,
        s"wave-2 law violated: $gn vs $ln rows, diff sample ${lawDiff.mkString("; ")}")
      CachedFrames.drain()
      spark.stop()
      return
    }
    if (args.contains("--tokenizer")) {
      val sfDir = args.dropWhile(_ != "--tokenizer").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      val root = java.nio.file.Files.createTempDirectory("graft-tok-smoke").toString
      val t0 = System.nanoTime()
      graft.cli.TrainTokenizer.main(Array(
        "--input", s"$sfDir/documents.parquet", "--output", s"$root/merges"))
      graft.cli.EncodeCorpus.main(Array(
        "--input", s"$sfDir/documents.parquet", "--merges", s"$root/merges",
        "--output", s"$root/encoded"))
      val secs = (System.nanoTime() - t0) / 1e9
      val enc = spark.read.parquet(s"$root/encoded")
        .withColumn("n_tok", expr("""size(filter(split(trim(text), '\\s+'), t -> length(t) >= 1))"""))
        .withColumn("n_chr", expr(
          "aggregate(transform(filter(split(trim(text), '\\\\s+'), t0 -> length(t0) >= 1), t -> length(t)), 0, (a, x) -> a + x)"))
      val bad = enc.filter(col("n_bpe") < col("n_tok") || col("n_bpe") > col("n_chr")).count()
      val agg = enc.agg(count(lit(1)), sum(col("n_bpe")), sum(col("n_chr"))).head()
      val (nDocs, totBpe, totChr) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      val nMerges = spark.read.parquet(s"$root/merges").count()
      println(f"docs=$nDocs merges=$nMerges total_bpe=$totBpe total_chars=$totChr " +
        f"compression=${totChr.toDouble / totBpe}%.3f mode=tokenizer wall=$secs%.1f s")
      require(bad == 0, s"per-doc bound violated on $bad docs (need n_tok <= n_bpe <= n_chars)")
      require(totBpe < totChr, "trained merges must strictly compress the corpus")
      spark.stop()
      return
    }
    if (args.contains("--decontam")) {
      val sfDir = args.dropWhile(_ != "--decontam").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      val root = java.nio.file.Files.createTempDirectory("graft-bloom-smoke").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 100 === 0)
        .write.mode("overwrite").parquet(s"$root/bench")
      docs.filter(col("doc_id") % 100 =!= 0)
        .write.mode("overwrite").parquet(s"$root/corpus")
      val t0 = System.nanoTime()
      graft.cli.BuildBloomFilter.main(Array(
        "--input", s"$root/bench", "--output", s"$root/bloom"))
      graft.cli.ProbeBloom.main(Array(
        "--input", s"$root/corpus", "--bloom", s"$root/bloom",
        "--output", s"$root/verdicts"))
      val secs = (System.nanoTime() - t0) / 1e9
      val nBits = spark.read.parquet(s"$root/bloom").count()
      // exact overlap truth from the gate query to count Bloom false
      // positives at this scale — and prove there is never a false negative
      val verd = spark.read.parquet(s"$root/verdicts")
      val exact = graft.ops.TextOps.q114BloomDecontam(spark, sfDir)
        .select(col("doc_id"), col("n_exact_hits"))
      val joined = verd.join(exact, Seq("doc_id"), "left")
        .withColumn("n_exact_hits", coalesce(col("n_exact_hits"), lit(0L)))
      // one action: counts AND the false-negative check in the same pass
      val agg2 = joined.agg(count(lit(1)),
        sum(expr("CASE WHEN bloom_flag THEN 1 ELSE 0 END")),
        sum(expr("CASE WHEN n_exact_hits > 0 THEN 1 ELSE 0 END")),
        sum(expr("CASE WHEN n_bloom_hits < n_exact_hits THEN 1 ELSE 0 END"))).head()
      val fn = agg2.getLong(3)
      graft.CachedFrames.drain()
      println(f"docs=${agg2.getLong(0)} bloom_flagged=${agg2.getLong(1)} " +
        f"exact_flagged=${agg2.getLong(2)} bitmap_rows=$nBits " +
        f"mode=decontam wall=$secs%.1f s")
      require(fn == 0, s"$fn Bloom false negatives — impossible by construction")
      require(nBits <= graft.ops.TextOps.BloomBuckets.toLong,
        "bitmap exceeded its constructed bound")
      spark.stop()
      return
    }
    if (args.contains("--graphindex")) {
      // the containment-graph incremental face at bench SF: build the
      // base-split index, admit the batch, extend — and check the grown ≡
      // from-scratch law on REAL data sizes (the GraphIndexSpec law at
      // fixture scale, re-proved where the df distribution is organic)
      val sfDir = args.dropWhile(_ != "--graphindex").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      import org.apache.spark.sql.functions.col
      val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
        .select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val t0 = System.nanoTime()
      val fps = CachedFrames.track(graft.ops.TextOps.graphIndexFps(base))
      val df0 = CachedFrames.track(graft.ops.TextOps.graphIndexDfOf(fps))
      val sizes = graft.ops.TextOps.graphIndexSizesOf(fps)
      val nEdges = graft.ops.TextOps.graphAdmitAgainstIndex(
        batch, fps, df0, sizes).count()
      val tAdmit = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val (fps2, df2, sizes2) = graft.ops.TextOps.graphIndexExtend(
        fps, df0, sizes, batch)
      val full = CachedFrames.track(graft.ops.TextOps.graphIndexFps(docs))
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq).toSet
      require(rows(fps2) == rows(full), "fps law violated")
      require(rows(df2) == rows(graft.ops.TextOps.graphIndexDfOf(full)),
        "df law violated")
      require(rows(sizes2) == rows(graft.ops.TextOps.graphIndexSizesOf(full)),
        "sizes law violated")
      val tLaw = (System.nanoTime() - t1) / 1e9
      println(f"incident_edges=$nEdges admit_wall=$tAdmit%.1f s " +
        f"law_check_wall=$tLaw%.1f s mode=graphindex")
      CachedFrames.drain()
      spark.stop()
      return
    }
    if (args.contains("--familylaw")) {
      // the IndexFamilySpec grown-index law at bench SF for EVERY family
      // in the registry — organic data sizes, the generic-contract twin
      // of --graphindex (which keeps its deeper per-table checks)
      val rest = args.dropWhile(_ != "--familylaw").drop(1)
        .filterNot(_.startsWith("--"))
      val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
      import org.apache.spark.sql.functions.col
      val docs = Tables.parallelized(Tables(spark, sfDir, "documents"))
        .select(col("doc_id"), col("text"))
      val vecs = Tables.parallelized(Tables(spark, sfDir, "embeddings"))
        .select(col("vec_id"), col("embedding"))
      graft.ops.IndexFamily.all.foreach { f =>
        val (base, batch) =
          if (f.idColumn == "vec_id")
            (vecs.filter(col("vec_id") % 5 =!= 0),
              vecs.filter(col("vec_id") % 5 === 0))
          else
            (docs.filter(col("doc_id") % 5 =!= 0),
              docs.filter(col("doc_id") % 5 === 0))
        val t0 = System.nanoTime()
        val grown = f.extend(f.build(base), batch)
        val ref = f.grownReference(base, batch)
        f.tableNames.foreach { t =>
          // compare DISTRIBUTED (equal counts + empty multiset difference
          // ⟹ multiset equality), collecting only mismatch SAMPLES for
          // the error message — collect().toSet at bench SF would pull
          // the graph fps postings / lshband shingle arrays whole into
          // the driver, a memory blowup that grows with SF
          def canon(d: org.apache.spark.sql.DataFrame) = {
            val c = f.canonical(t, d)
            c.select(c.columns.sorted.map(col).toIndexedSeq: _*)
          }
          val (g, r) = (canon(grown(t)), canon(ref(t)))
          val (gn, rn) = (g.count(), r.count())
          require(gn == rn,
            s"${f.name}/$t law violated: $gn grown rows vs $rn reference")
          val sample = g.exceptAll(r).limit(3).collect()
          require(sample.isEmpty, s"${f.name}/$t law violated: grown-only " +
            s"row sample: ${sample.mkString("; ")}")
          require(gn > 0, s"${f.name}/$t law table empty")
        }
        println(f"family=${f.name} tables=${f.tableNames.size} " +
          f"law_wall=${(System.nanoTime() - t0) / 1e9}%.1f s ok")
        CachedFrames.drain()
        // the FORGET law at SF too (all five families forget since the
        // substr artifact went writer-attributed): forget(build(corpus),
        // %7 ids) ≡ the family's surviving-corpus reference — the same
        // distributed compare as the grown law above
        val corpus = if (f.idColumn == "vec_id") vecs else docs
        val ids = corpus.select(col(f.idColumn))
          .filter(col(f.idColumn) % 7 === 0)
        val t1 = System.nanoTime()
        val forgotten = f.forget(f.build(corpus), ids).getOrElse(
          throw new IllegalStateException(s"${f.name} must forget"))
        val fref = f.forgetReference(corpus, ids)
        f.tableNames.foreach { t =>
          def canon(d: org.apache.spark.sql.DataFrame) = {
            val c = f.canonical(t, d)
            c.select(c.columns.sorted.map(col).toIndexedSeq: _*)
          }
          val (g, r) = (canon(forgotten(t)), canon(fref(t)))
          val (gn, rn) = (g.count(), r.count())
          require(gn == rn,
            s"${f.name}/$t forget law violated: $gn vs $rn rows")
          val sample = g.exceptAll(r).limit(3).collect()
          require(sample.isEmpty, s"${f.name}/$t forget law violated: " +
            s"forgotten-only row sample: ${sample.mkString("; ")}")
          require(gn > 0, s"${f.name}/$t forget law table empty")
        }
        println(f"family=${f.name} forget_law_wall=" +
          f"${(System.nanoTime() - t1) / 1e9}%.1f s ok")
        CachedFrames.drain()
      }
      println("mode=familylaw all families ok (grown + forget)")
      spark.stop()
      return
    }
    if (args.contains("--epoch")) {
      val sfDir = args.dropWhile(_ != "--epoch").drop(1).headOption
        .filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
      val t0 = System.nanoTime()
      val rows = graft.ops.Curation.epochPlanOn(
        Tables.parallelized(Tables(spark, sfDir, "documents")), cpus.toInt)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      // the dense-packing invariant over EVERY row: within each source in
      // (doc_id, rep) order, (seq_id, offset) is exactly the running token
      // sum — byte-equivalence of the two-phase prefix sum with the
      // sequential definition, at this SF
      var checked = 0L
      rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
        val ordered = rs.sortBy(r => (r.getLong(1), r.getInt(2)))
        var running = 0L
        ordered.foreach { r =>
          require(r.getLong(4) == running / graft.ops.TextOps.PackSeqTokens &&
            r.getLong(5) == running % graft.ops.TextOps.PackSeqTokens,
            s"packing invariant violated at source=$src doc=${r.getLong(1)}")
          running += r.getLong(3); checked += 1
        }
      }
      val seqs = rows.map(r => (r.getString(0), r.getLong(4))).distinct.length
      println(f"plan_rows=${rows.length} checked=$checked " +
        f"sources=${rows.map(_.getString(0)).distinct.length} seqs=$seqs " +
        f"mode=epoch wall=$secs%.1f s")
      CachedFrames.drain()
      spark.stop()
      return
    }
    val df = Febrl.read(spark, input).cache()
    println(s"records: ${df.count()}")
    val t0 = System.nanoTime()
    if (trainMode) {
      // MEMORY_AND_DISK: 50.6M rows × (id, label, 14-dim vector) — spill
      // rather than fail when the heap is tight (GBT re-reads every iteration)
      val ml = graft.ml.DedupMl
        .toMlFrame(DedupPipeline.pairFeatures(df, Febrl.config), Febrl.featureCols)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"ml rows: ${ml.count()}")
      val (model, testDf) = graft.ml.DedupMl.train(ml)
      val m = graft.ml.DedupMl.evaluate(model, testDf)
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"confusion matrix [tn fn; fp tp]: ${m.tn} ${m.fn} ; ${m.fp} ${m.tp}")
      println(f"accuracy=${m.accuracy}%.6f precision=${m.precision}%.6f " +
        f"recall=${m.recall}%.6f f1=${m.f1}%.6f mode=train wall=$secs%.1f s")
      require(m.recall >= 0.95 && m.precision >= 0.95,
        f"quality band vs reference train matrix violated: " +
          f"recall=${m.recall}%.4f precision=${m.precision}%.4f (need >= 0.95)")
      spark.stop()
      return
    }
    val result =
      if (triangle) {
        val pf = graft.dedup.TrianglePipeline
          .pairFeatures(df, Febrl.config, k = cpus.toInt)
        pf.agg(count(lit(1)).as("pairs"),
          sum((col("label") === 1.0).cast("long")).as("dups")).head()
      } else if (withFeatures) {
        val pf = DedupPipeline.pairFeatures(df, Febrl.config)
        pf.agg(count(lit(1)).as("pairs"),
          sum((col("label") === 1.0).cast("long")).as("dups")).head()
      } else {
        DedupPipeline.candidatePairs(df, Febrl.config)
          .agg(count(lit(1)).as("pairs"), lit(-1L).as("dups")).head()
      }
    val secs = (System.nanoTime() - t0) / 1e9
    val mode = if (triangle) "triangle-full" else if (withFeatures) "full" else "candidates"
    println(f"pairs=${result.getLong(0)} dups=${result.getLong(1)} mode=$mode wall=$secs%.1f s")
    spark.stop()
  }
}

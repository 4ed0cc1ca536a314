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

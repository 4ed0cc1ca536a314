package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer
import scala.util.hashing.MurmurHash3

/** The reference's skew-managed physical strategy for the block self-join
  * (D1–D6 of SURVEY.md §2.5), Spark-native:
  *
  *   1. block stats via a pruned-scan hash aggregate (only the blocking-key
  *      columns are read — Catalyst pushes the projection to parquet);
  *   2. [[DisDedupPlanner]] on the driver over ONLY the heavy (w > τ) blocks
  *      — bounded driver memory at any scale; tiny blocks are hash-routed
  *      executor-side without ever being collected;
  *   3. triangle replication of each tuple to ≤ l_i of its block's k_i
  *      reducers via a typed `flatMap` (the reference mapper,
  *      `DisDedupMapper.scala:12-52`) — replication factor √(2k_i), the
  *      paper's communication-optimal bound;
  *   4. per-(reducer, block) pair generation in `groupByKeyflatMapGroups`
  *      (the reference reducer, `DisDedupReducer.scala:12-68`): L×R bipartite
  *      or S upper-triangle nested loop, each pair guarded so it is emitted
  *      only in its lowest-ordinal shared block (exactly-once across
  *      overlapping blocking functions, `Compare.scala:94,106`);
  *   5. feature projection stays in Catalyst `Column` expressions over the
  *      carried tuple structs — no join back to the source, no second scan.
  *
  * Determinism: the reference draws the triangle anchor from a shared
  * `Random` whose draw order depends on partition iteration; we derive it
  * from a Murmur3 hash of (tuple id, block) instead (SURVEY.md §4.1) so
  * results are stable under re-planning. The emitted pair SET is identical.
  *
  * Output is pair-set-equal to [[DedupPipeline.pairFeatures]] — the same
  * DuckDB oracle SQL validates both (the declarative plan for the common
  * case, this pipeline when one block dominates the key distribution).
  */
object TrianglePipeline {

  private val sideL = "L"
  private val sideS = "S"
  private val sideR = "R"

  private def bkvArray(cfg: DedupConfig): Column =
    array(cfg.blockingKeys.zipWithIndex.map { case (c, i) =>
      struct(lit(i + 1).as("k"), coalesce(trim(c.cast("string")), lit("")).as("v"))
    }: _*)

  private val bkvStructType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("v", StringType, nullable = true)))

  /** Full pipeline returning unoriented pair rows (p1, p2) as tuple structs. */
  def pairs(df: DataFrame, cfg: DedupConfig, k: Int, seed: Long = 647L): DataFrame = {
    val spark = df.sparkSession
    val seedInt = seed.toInt

    // ---- D1: stats + plan (driver holds only heavy blocks) ----------------
    val counts = df
      .select(explode(bkvArray(cfg)).as("bkv"))
      .groupBy(col("bkv.k").as("k"), col("bkv.v").as("v"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", expr("n * (n - 1) DIV 2"))
      .cache()
    val totalWork = counts.agg(coalesce(sum(col("w")), lit(0L))).head().getLong(0)
    val tau = if (k == 1) Double.PositiveInfinity
              else totalWork / (3.0 * k * math.log(k))
    val heavy = counts
      .filter(col("w") > tau)
      .select("k", "v", "n")
      .collect()
      .map(r => (BKV(r.getInt(0), r.getString(1)), r.getLong(2)))
      .toSeq
    counts.unpersist()
    val plan = DisDedupPlanner
      .assign(heavy, k, seed, totalWork = Some(totalWork))
      .map { case (b, rids) => ((b.k, b.v), rids.toArray) }
    val bplan = spark.sparkContext.broadcast(plan)

    // ---- D2+D3: triangle replication (typed flatMap) ----------------------
    val tupSchema = df.schema
    val routedSchema = StructType(Seq(
      StructField("rid", IntegerType, nullable = false),
      StructField("bk", IntegerType, nullable = false),
      StructField("bv", StringType, nullable = true),
      StructField("side", StringType, nullable = false),
      StructField("tup", tupSchema, nullable = false),
      StructField("bkvs", ArrayType(bkvStructType, containsNull = false), nullable = false)))
    val idIdx = df.columns.indexOf(cfg.idColumn)
    require(idIdx >= 0, s"id column ${cfg.idColumn} not in ${df.columns.mkString(",")}")
    val kVal = k

    val src = df.select(struct(df.columns.map(col): _*).as("tup"), bkvArray(cfg).as("bkvs"))
    val routed = src.flatMap { row =>
      val tup = row.getStruct(0)
      val bkvs = row.getSeq[Row](1)
      val idStr = String.valueOf(tup.get(idIdx))
      bkvs.iterator.flatMap { bkv =>
        val bk = bkv.getInt(0)
        val bv = bkv.getString(1)
        bplan.value.get((bk, bv)) match {
          case None =>
            // tiny block (w ≤ τ, never collected): stable-hash single reducer
            val rid = Math.floorMod(MurmurHash3.stringHash(s"$bk|$bv", seedInt), kVal) + 1
            Iterator.single(Row(rid, bk, bv, sideS, tup, bkvs))
          case Some(rids) if rids.length == 1 =>
            Iterator.single(Row(rids(0), bk, bv, sideS, tup, bkvs))
          case Some(rids) =>
            // multi-reducer block: anchor a ∈ [1, l], then one S (diagonal),
            // L to column cells above, R to row cells right of the diagonal
            val l = DisDedupPlanner.getL(rids.length)
            val a = Math.floorMod(MurmurHash3.stringHash(s"$idStr|$bk|$bv", seedInt), l) + 1
            val out = new ArrayBuffer[Row](l)
            var p = 1
            while (p < a) {
              out += Row(rids(DisDedupPlanner.cellIndex(l, p, a)), bk, bv, sideL, tup, bkvs)
              p += 1
            }
            out += Row(rids(DisDedupPlanner.cellIndex(l, a, a)), bk, bv, sideS, tup, bkvs)
            var q = a + 1
            while (q <= l) {
              out += Row(rids(DisDedupPlanner.cellIndex(l, a, q)), bk, bv, sideR, tup, bkvs)
              q += 1
            }
            out.iterator
        }
      }
    }(Encoders.row(routedSchema))

    // ---- D4-D6: group per (reducer, block), nested-loop pair generation ---
    val pairSchema = StructType(Seq(
      StructField("p1", tupSchema, nullable = false),
      StructField("p2", tupSchema, nullable = false)))
    routed
      .groupByKey(r => (r.getInt(0), r.getInt(1), r.getString(2)))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt, Encoders.STRING))
      .flatMapGroups { (key, it) =>
        val bk = key._2
        val left = new ArrayBuffer[(Row, Seq[Row])]()
        val self = new ArrayBuffer[(Row, Seq[Row])]()
        val right = new ArrayBuffer[(Row, Seq[Row])]()
        it.foreach { r =>
          val entry = (r.getStruct(4), r.getSeq[Row](5))
          r.getString(3) match {
            case `sideL` => left += entry
            case `sideR` => right += entry
            case _       => self += entry
          }
        }
        // lowest blocking ordinal the two tuples share (Util.scala:70-83)
        def lcb(b1: Seq[Row], b2: Seq[Row]): Int = {
          var lowest = Int.MaxValue
          for (x <- b1; y <- b2)
            if (x.getInt(0) < lowest && x.getInt(0) == y.getInt(0) &&
                x.getString(1) == y.getString(1))
              lowest = x.getInt(0)
          lowest
        }
        val out = new ArrayBuffer[Row]()
        if (left.nonEmpty && right.nonEmpty) {
          for ((t1, b1) <- left; (t2, b2) <- right)
            if (bk <= lcb(b1, b2)) out += Row(t1, t2)
        } else {
          var i = 0
          while (i < self.length) {
            var j = i + 1
            while (j < self.length) {
              if (bk <= lcb(self(i)._2, self(j)._2)) out += Row(self(i)._1, self(j)._1)
              j += 1
            }
            i += 1
          }
        }
        out.iterator
      }(Encoders.row(pairSchema))
  }

  /** Orient pairs by id and project features — pure `Column` expressions over
    * the carried structs (back inside whole-stage codegen). */
  def orientedFeatures(pairRows: DataFrame, cfg: DedupConfig): DataFrame = {
    val id1 = col("p1").getField(cfg.idColumn)
    val id2 = col("p2").getField(cfg.idColumn)
    val t1 = when(id1 <= id2, col("p1")).otherwise(col("p2"))
    val t2 = when(id1 <= id2, col("p2")).otherwise(col("p1"))
    val labelCols = cfg.label.toSeq.map { fn =>
      fn(t1.getField(cfg.idColumn), t2.getField(cfg.idColumn)).as("label")
    }
    val featCols = cfg.features.map { f =>
      f.cmp(t1.getField(f.column), t2.getField(f.column)).as(f.name)
    }
    pairRows.select(
      (Seq(t1.getField(cfg.idColumn).as("id1"), t2.getField(cfg.idColumn).as("id2")) ++
        labelCols ++ featCols): _*)
  }

  /** End-to-end: equivalent to [[DedupPipeline.pairFeatures]], different
    * physical strategy. */
  def pairFeatures(df: DataFrame, cfg: DedupConfig, k: Int, seed: Long = 647L): DataFrame =
    orientedFeatures(pairs(df, cfg, k, seed), cfg)
}

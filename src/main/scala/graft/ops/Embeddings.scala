package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim FLOAT[] vectors):
  * brute-force cosine top-k as the exactness baseline, random-hyperplane LSH
  * bucketing as the scale path, and element-wise vector aggregation
  * (per-label centroids + gram/cosine matrix).
  *
  * Float parity policy: components are cast FLOAT→DOUBLE once, and every dot
  * product / norm is a LEFT FOLD in index order (`aggregate` in Spark,
  * `list_reduce` in DuckDB) so both engines produce bitwise-identical IEEE
  * results. Unbounded cross-row sums (centroids) use fixed-point DECIMAL
  * aggregation — order-insensitive AND constant-memory (see q31Centroids);
  * the gram matrix's per-(l1,l2) sums fold a SORTED list, which is fine
  * there because group size is bounded by the vector dimension (64), not
  * the corpus.
  *
  * Scale shape (100 TB): brute-force is a cross join — quadratic, the
  * baseline only; the LSH variant replaces it with an equi-join on bucket
  * (uniform 8-bit keys here; more planes at scale), which is the standard
  * sub-quadratic ANN candidate join. Norms are precomputed per row BEFORE
  * the join so the O(n²) stage does one fold, not three.
  */
/** ANN tuning: hyperplane count, neighbour count, query-batch bound.
  * numPlanes is the demo-scale default — at corpus scale more planes (finer
  * buckets) keep the candidate join sub-quadratic, since bucket size ~
  * corpus / 2^numPlanes. knnQueryIds bounds the brute-force baseline's query
  * batch (queries × corpus, not corpus²). */
final case class AnnConfig(numPlanes: Int = 8, topK: Int = 5, knnQueryIds: Int = 500,
    nprobe: Int = 2)

object Embeddings {

  /** Demo-scale defaults; the driver-contract queries use exactly these so
    * the embedded oracle SQL (built from the same values) stays in sync. */
  val DefaultAnn: AnnConfig = AnnConfig()

  private val Dim = 64

  /** Codegen'd native expression (graft.functions.DotProduct) — same
    * ascending-index fold as the HOF form, so DuckDB parity is unchanged. */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("dot_product", a, b)

  private[ops] def vecs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.parallelized(Tables(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }


  /** Brute-force cosine top-k neighbours for the query set. The OUTPUT is
    * tracked: this is the ann family's ground-truth artifact — six recall
    * scoreboards (q63/q75/q89/…) filter the same plan for their truth
    * side, so the queries×corpus crossJoin materializes once per bench
    * rep / Verify window instead of once per consumer. */
  def q29KnnBrute(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame = {
    // every default-shaped truth request — q29 itself (topK), the deep
    // graded metrics (nDCG@10, RBO@10) — is the rk ≤ topK slice of ONE
    // tracked depth-[[truthDepth]] pass: row_number under the same
    // (cos DESC, id2 ASC) total order makes the slice identical to a
    // private shallower pass, and the queries×corpus crossJoin (the cost)
    // is depth-independent. Non-default cfgs keep a private pass.
    val deep = cfg.copy(topK = truthDepth)
    if (deep == DefaultAnn.copy(topK = truthDepth) && cfg.topK <= truthDepth)
      graft.CachedFrames.track(knnBruteUntracked(spark, sfDir, deep))
        .filter(col("rk") <= cfg.topK)
    else graft.CachedFrames.track(knnBruteUntracked(spark, sfDir, cfg))
  }

  /** Deepest truth ranking any gate metric reads (a def, not a val —
    * NdcgDepth/RboDepth are declared later in this object and a strict
    * val here would read their uninitialized 0). */
  private def truthDepth: Int =
    math.max(DefaultAnn.topK, math.max(NdcgDepth, RboDepth))

  private def knnBruteUntracked(spark: SparkSession, sfDir: String,
      cfg: AnnConfig): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val a = e.filter(col("vec_id") < cfg.knnQueryIds)
      .select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    val w = Window.partitionBy(col("id1")).orderBy(col("cos").desc, col("id2").asc)
    a.crossJoin(b)
      .filter(col("id1") =!= col("id2"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cfg.topK)
      .select(col("id1"), col("id2"), col("rk"), col("cos"))
  }

  /** The brute-truth oracle CTE at an EXPLICIT depth — metrics whose
    * definition needs a truth ranking deeper than [[DefaultAnn.topK]]
    * (nDCG@10, RBO@10) interpolate this at their own depth so the truth
    * side actually carries `depth` graded rows per query (sourcing them
    * from the fixed 5-deep default silently capped perfect retrieval
    * below 1 — the round-14 advisory finding). */
  def q29KnnBruteSqlAt(depth: Int): String = s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    p AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (a.nrm * b.nrm) AS cos
      FROM n a, n b WHERE a.vec_id <> b.vec_id AND a.vec_id < ${DefaultAnn.knnQueryIds}),
    r AS (
      SELECT id1, id2, cos,
        row_number() OVER (PARTITION BY id1 ORDER BY cos DESC, id2 ASC) AS rk
      FROM p)
    SELECT id1, id2, CAST(rk AS INTEGER) AS rk, cos FROM r WHERE rk <= $depth
  """

  val q29KnnBruteSql: String = q29KnnBruteSqlAt(DefaultAnn.topK)

  /** Hyperplane ±1 sign matrix, precomputed ONCE on the driver (the signs
    * are data-independent — deriving them per row, as the first version did,
    * re-ran 512 md5 calls per vector). Same md5-bit formula the DuckDB
    * oracle evaluates inline, so bucket values agree exactly. */
  private def planeSigns(numPlanes: Int): IndexedSeq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until Dim).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$p:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 14), 16)
        if ((h & 1L) == 1L) 1.0 else -1.0
      }
    }

  /** Bucket id: sign bit of v·plane_p per plane, via the codegen'd
    * dot_product against the literal sign vectors (multiplying by ±1.0 is
    * IEEE-exact negation, so this matches the oracle's IF(bit, v, -v) fold). */
  private def bucketCol(numPlanes: Int): org.apache.spark.sql.Column = {
    val signs = planeSigns(numPlanes)
    (0 until numPlanes).map { p =>
      when(dot(col("v"), typedLit(signs(p))) >= 0.0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN: same-bucket candidate pairs with exact cosine —
    * the sub-quadratic similarity join. */
  def q30AnnLsh(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame = {
    // persist: both join sides read the bucketed vectors
    val e = graft.CachedFrames.track(
      vecs(spark, sfDir).withColumn("bucket", bucketCol(cfg.numPlanes)))
    val a = e.select(col("vec_id").as("id1"), col("v").as("v1"),
      col("nrm").as("n1"), col("bucket"))
    val b = e.select(col("vec_id").as("id2"), col("v").as("v2"),
      col("nrm").as("n2"), col("bucket").as("bucket2"))
    a.join(b, col("bucket") === col("bucket2") && col("id1") < col("id2"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .select(col("id1"), col("id2"), col("bucket"), col("cos"))
  }

  val q30AnnLshSql: String = s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm,
        list_reduce(list_prepend(0::BIGINT, range(${DefaultAnn.numPlanes})), (acc, p) -> acc +
          CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range($Dim), i ->
                   CASE WHEN (('0x' || substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 14))::BIGINT & 1) = 1
                        THEN v[i + 1] ELSE -v[i + 1] END)), (a2, t) -> a2 + t) >= 0
               THEN (1::BIGINT << p) ELSE 0 END) AS bucket
      FROM e)
    SELECT a.vec_id AS id1, b.vec_id AS id2, CAST(a.bucket AS INTEGER) AS bucket,
      list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
        / (a.nrm * b.nrm) AS cos
    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  """

  /** Embedding-cosine near-duplicate pairs: the LSH candidate join filtered
    * to high-similarity pairs — the vector-space analog of the MinHash text
    * dedup (candidates from buckets, verification by exact cosine). */
  def q48EmbeddingNeardup(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame =
    q30AnnLsh(spark, sfDir, cfg).filter(col("cos") >= 0.3)

  val q48EmbeddingNeardupSql: String =
    s"SELECT * FROM (${q30AnnLshSql}) WHERE cos >= 0.3"

  /** Element-wise per-label centroids: posexplode → (label, idx) sums —
    * the distributed vector-aggregation shape (no collect, no UDAF).
    *
    * Cross-row double sums are made order-deterministic by FIXED-POINT
    * aggregation: each component is floored to an integer at scale 1e12
    * (floor of an IEEE double is bit-identical in Spark and DuckDB), summed
    * exactly as DECIMAL(38,0) — a constant-size per-group accumulator with
    * map-side partial aggregation, unlike a per-group collect_list which
    * buffers every member value — and divided back at the end. The operator
    * DEFINES sum_x/mean_x as this formula, so the oracle matches bitwise
    * while the aggregation stays bounded-memory at any corpus size. */
  def q31Centroids(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir)
      .select(col("label"), posexplode(col("v")).as(Seq("idx", "x")))
      .groupBy(col("label"), col("idx"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .withColumn("sum_x", col("fx").cast("double") / lit(1e12))
      .withColumn("mean_x", col("sum_x") / col("n").cast("double"))
      .drop("fx")
      .select(col("label"), col("idx"), col("n"), col("sum_x"), col("mean_x"))

  val q31CentroidsSql: String = """
    WITH x AS (
      SELECT label, i.idx - 1 AS idx, v[i.idx] AS x
      FROM (SELECT label, list_transform(embedding, e -> e::DOUBLE) AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS idx) i),
    g AS (
      SELECT label, idx, count(*) AS n,
        sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS fx
      FROM x GROUP BY label, idx)
    SELECT label, CAST(idx AS INTEGER) AS idx, n,
      CAST(fx AS DOUBLE) / 1e12 AS sum_x,
      CAST(fx AS DOUBLE) / 1e12 / CAST(n AS DOUBLE) AS mean_x
    FROM g
  """

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest centroid cell, and queries probe ONLY their own cell
    * (nprobe=1) — the standard two-level index that keeps the candidate
    * join linear in cell size instead of corpus size. Centroids here are
    * the deterministic per-label means (a k-means iteration would slot in
    * identically); distance math is squared-L2 via three dot products so
    * both engines compute the same IEEE values. */
  /** The IVF assignment stage, generalized to multi-probe — shared by the
    * cell-probe ANN (q46, nprobe=1), the Lloyd refinement (q55) and the
    * multi-probe gate (q60): each vector's `nprobe` nearest initial
    * centroids (per-label fixed-point means) by squared L2, ties broken by
    * cell ascending, with `probe_rk` 1..nprobe (1 = the home cell). The
    * centroid set is tiny (≤ #labels) so the assignment join is a
    * broadcast, never a shuffle of the corpus; multi-probe multiplies only
    * the QUERY side of the downstream candidate join by nprobe, not the
    * index. */
  private def probedCells(spark: SparkSession, sfDir: String, nprobe: Int): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    // centroid arrays from the long-format means, ordered by index
    val cents = q31Centroids(spark, sfDir)
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("idx"), col("mean_x")))).as("im"))
      .select(col("label").as("cell"),
        expr("transform(im, x -> x.mean_x)").as("c"))
      .withColumn("cnorm2", dot(col("c"), col("c")))
    probeAssign(e, cents, nprobe)
  }

  /** The assignment join shared by every codebook (label means and
    * hash-seeded): rank cells by squared L2 = |v|^2 - 2 v.c + |c|^2.
    * Top-nprobe is taken by a map-side collect+sort+slice AGGREGATION, not
    * a window: the crossJoin emits |cells| rows per vector and the partial
    * aggregate collapses them to one row per vector BEFORE the exchange —
    * |cells|× less shuffle volume than ranking after the shuffle, and no
    * sort pass. (array_sort on struct(d2, cell) orders by d2 then cell —
    * the same tie-break the oracle's row_number() uses.) `cents` must be
    * (cell, c, cnorm2) and small enough to broadcast — the codebook, by
    * definition. */
  private def probeAssign(e: DataFrame, cents: DataFrame, nprobe: Int): DataFrame =
    graft.CachedFrames.track(e.crossJoin(broadcast(cents))
      .withColumn("d2",
        col("nrm") * col("nrm") - lit(2.0) * dot(col("v"), col("c")) + col("cnorm2"))
      .groupBy(col("vec_id"))
      .agg(first(col("label")).as("label"), first(col("v")).as("v"),
        first(col("nrm")).as("nrm"),
        slice(array_sort(collect_list(struct(col("d2"), col("cell")))),
          1, nprobe).as("best"))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"),
        posexplode(col("best")).as(Seq("pidx", "bc")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"),
        col("bc.cell").as("cell"), (col("pidx") + 1).cast("int").as("probe_rk")))

  /** Home-cell assignment: (vec_id, label, v, nrm, cell) — the
    * probe_rk = 1 slice of the ONE tracked nprobe=[[DefaultAnn.nprobe]]
    * assignment pass (identical rows to a private nprobe=1 pass: the home
    * cell is the same first element of the same (d2, cell)-sorted slice —
    * the identity q75's single-vs-multi composition has always relied
    * on), so q46/q55/q60/q75 all share one canonical assignment plan. */
  private def assignedCells(spark: SparkSession, sfDir: String): DataFrame =
    probedCells(spark, sfDir, nprobe = DefaultAnn.nprobe)
      .filter(col("probe_rk") === 1).drop("probe_rk")

  /** q55: one deterministic Lloyd (k-means) refinement of the IVF coarse
    * quantizer — reassign every vector to its nearest current centroid
    * ([[assignedCells]]), then recompute each cell's centroid as the
    * fixed-point DECIMAL mean of its members (same order-insensitive,
    * constant-memory aggregation as q31, so the oracle follows mechanically).
    * Emits the refined codebook in long format: (cell, idx, n, sum_x,
    * mean_x). Iterating this assignment+update pair is exactly Lloyd's
    * algorithm; one step is enough to pin the semantics in the gate. */
  def q55KmeansRefine(spark: SparkSession, sfDir: String): DataFrame =
    assignedCells(spark, sfDir)
      .select(col("cell"), posexplode(col("v")).as(Seq("idx", "x")))
      .groupBy(col("cell"), col("idx"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .select(col("cell"), col("idx"), col("n"),
        (col("fx").cast("double") / lit(1e12)).as("sum_x"),
        (col("fx").cast("double") / lit(1e12) / col("n").cast("double")).as("mean_x"))

  /** Tracked output (the r17 ann-group contract, see [[q29KnnBrute]]):
    * q63's recall join consumes this exact plan. */
  def q46IvfAnn(spark: SparkSession, sfDir: String): DataFrame =
    graft.CachedFrames.track(ivfAnnUntracked(spark, sfDir))

  private def ivfAnnUntracked(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = assignedCells(spark, sfDir)
    // probe: queries search only their own cell
    val q = assigned.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand_id").asc)
    q.join(assigned.select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell").as("ccell")),
        col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cand_id"), col("cell"), col("rk"), col("cos"))
  }

  /** q60: IVF multi-probe ANN — queries visit their `cfg.nprobe` nearest
    * cells instead of only the home cell, recovering true neighbours that
    * sit just across a cell boundary (THE recall weakness of nprobe=1 at
    * corpus scale, where cells are much bigger than top-k). Candidates stay
    * indexed under their single home cell, so the probe join's work is
    * nprobe × |cell| per query — still linear in cell size, never in the
    * corpus. Because q60's candidate pool is a superset of q46's, its k-th
    * best cosine dominates q46's per query (pinned in EmbeddingsSpec). */
  def q60IvfMultiprobe(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame = {
    // ONE cached assignment pass serves both sides: probes are its rank
    // <= nprobe rows, candidates its rank-1 (home cell) slice — computing
    // assignedCells separately would run the centroid window twice
    val probed = probedCells(spark, sfDir, cfg.nprobe)
    val probes = probed
      .filter(col("vec_id") < cfg.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("cell"))
    val cands = probed.filter(col("probe_rk") === 1)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell").as("ccell"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand_id").asc)
    // a candidate lives in exactly one home cell, so probing 2 cells can
    // never produce duplicate (qid, cand_id) rows — no dedup stage needed
    probes.join(cands,
        col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cand_id"), col("rk"), col("cos"))
  }

  /** DuckDB CTE chain for the IVF assignment stage (shared by the q46, q55
    * and q60 oracles, mirroring [[probedCells]]): defines `da` (every
    * vector × cell with squared distance) and `assigned`
    * (vec_id, v, nrm, cell — the home cell). */
  private val ivfAssignedSqlCtes: String = s"""e AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, label, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    x AS (
      SELECT label, i.idx - 1 AS idx, v[i.idx] AS x
      FROM (SELECT label, list_transform(embedding, e2 -> e2::DOUBLE) AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS idx) i),
    cmeans AS (
      SELECT label, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM x GROUP BY label, idx),
    cents AS (
      SELECT label AS cell, list(mean_x ORDER BY idx) AS c FROM cmeans GROUP BY label),
    cn AS (
      SELECT cell, c,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(c, x -> x * x)), (acc, x) -> acc + x) AS cnorm2
      FROM cents),
    da AS (
      SELECT n.vec_id, n.v, n.nrm, cn.cell,
        n.nrm * n.nrm
          - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(list_zip(n.v, cn.c), z -> z[1] * z[2])), (acc, x) -> acc + x)
          + cn.cnorm2 AS d2
      FROM n CROSS JOIN cn),
    assigned AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT vec_id, v, nrm, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM da) WHERE rk = 1)"""

  val q46IvfAnnSql: String = s"""
    WITH $ivfAssignedSqlCtes,
    probe AS (
      SELECT q.vec_id AS qid, c.vec_id AS cand_id, q.cell,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(q.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (q.nrm * c.nrm) AS cos
      FROM assigned q JOIN assigned c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id AND q.vec_id < ${DefaultAnn.knnQueryIds})
    SELECT qid, cand_id, cell, CAST(rk AS INTEGER) AS rk, cos FROM (
      SELECT qid, cand_id, cell, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS rk
      FROM probe) WHERE rk <= 3
  """

  val q55KmeansRefineSql: String = s"""
    WITH $ivfAssignedSqlCtes,
    ax AS (
      SELECT cell, i.idx - 1 AS idx, v[i.idx] AS x
      FROM assigned, LATERAL (SELECT unnest(generate_series(1, len(v))) AS idx) i)
    SELECT cell, CAST(idx AS INTEGER) AS idx, count(*) AS n,
      CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12 AS sum_x,
      CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
        / CAST(count(*) AS DOUBLE) AS mean_x
    FROM ax GROUP BY cell, idx
  """

  val q60IvfMultiprobeSql: String = s"""
    WITH $ivfAssignedSqlCtes,
    probes AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT vec_id, v, nrm, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS prk
        FROM da) WHERE prk <= ${DefaultAnn.nprobe} AND vec_id < ${DefaultAnn.knnQueryIds}),
    probe AS (
      SELECT p.vec_id AS qid, c.vec_id AS cand_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(p.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (p.nrm * c.nrm) AS cos
      FROM probes p JOIN assigned c
        ON p.cell = c.cell AND p.vec_id <> c.vec_id)
    SELECT qid, cand_id, CAST(rk AS INTEGER) AS rk, cos FROM (
      SELECT qid, cand_id, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS rk
      FROM probe) WHERE rk <= 3
  """

  /** q168 tuning: candidate depth and the reciprocal-rank fixed point —
    * lcm(1..10) = 2520, so every 1/r at depth ≤ 10 is EXACTLY 2520/r in
    * integers; MRR becomes one final division of exact BIGINTs. */
  val MrrDepth = 10
  val MrrScale = 2520L

  /** q168: MEAN RECIPROCAL RANK of the IVF home-cell index against the
    * brute-force truth — the position-sensitive retrieval metric next to
    * q75's recall scoreboard: recall@k says WHETHER the true nearest
    * neighbour surfaced, MRR says WHERE (a hit at rank 8 and a hit at
    * rank 1 are very different retrieval qualities for a RAG pipeline
    * that feeds top-ranked context first). Relevant item = the brute top-1
    * neighbour (q29, rk = 1); candidate list = the q46 home-cell ranking
    * extended to [[MrrDepth]]; a miss contributes 0 (standard MRR).
    *
    * Exactness: each hit contributes [[MrrScale]] DIV rk — exact, since
    * 2520 is divisible by every rank ≤ 10 — summed as BIGINT; the ONLY
    * float op is the final division by 2520·|queries| (overflow at
    * 3.6e15 queries; query batches are bounded by design). Bitwise in
    * both engines.
    *
    * Scale shape: the truth is the query-batch-bounded declared baseline
    * (the q29/q75 contract); the candidate join is the q46 cell-probe
    * shape (work = |cell| per query, never corpus²); the hit join keys on
    * (qid, id); two 1-row aggregates close it. */
  def q168Mrr(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = q29KnnBrute(spark, sfDir).filter(col("rk") === 1)
      .select(col("id1").as("tqid"), col("id2").as("true_id"))
    val assigned = assignedCells(spark, sfDir)
    val q = assigned.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    val cands = q.join(assigned.select(col("vec_id").as("cand_id"),
        col("v").as("cv"), col("nrm").as("cn"), col("cell").as("ccell")),
        col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= MrrDepth)
      .select(col("qid"), col("cand_id"), col("rk"))
    val hits = cands.join(truth,
        col("qid") === col("tqid") && col("cand_id") === col("true_id"))
      .agg(coalesce(sum(expr(s"$MrrScale DIV rk")), lit(0L)).as("ssum"),
        count(lit(1)).as("n_hits"))
    truth.agg(count(lit(1)).as("n_queries")).crossJoin(hits)
      .select(col("n_queries"), col("n_hits"),
        (col("ssum").cast("double")
          / (col("n_queries") * MrrScale).cast("double")).as("mrr"))
  }

  val q168MrrSql: String = s"""
    WITH $ivfAssignedSqlCtes,
    probe AS (
      SELECT q.vec_id AS qid, c.vec_id AS cand_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(q.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (q.nrm * c.nrm) AS cos
      FROM assigned q JOIN assigned c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
          AND q.vec_id < ${DefaultAnn.knnQueryIds}),
    cand AS (
      SELECT qid, cand_id, rk FROM (
        SELECT qid, cand_id,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC)
            AS rk
        FROM probe) WHERE rk <= $MrrDepth),
    truth AS (
      SELECT id1 AS qid, id2 AS true_id FROM ($q29KnnBruteSql) WHERE rk = 1),
    h AS (
      SELECT CAST(coalesce(sum($MrrScale // c.rk), 0) AS BIGINT) AS ssum, -- guard:ok internal exact fixed-point; output below is CAST
        CAST(count(*) AS BIGINT) AS n_hits
      FROM cand c JOIN truth t ON c.qid = t.qid AND c.cand_id = t.true_id),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM truth)
    SELECT t.n_queries, h.n_hits,
      CAST(h.ssum AS DOUBLE) / CAST(t.n_queries * $MrrScale AS DOUBLE) AS mrr
    FROM t, h
  """

  /** q231 depth, graded-relevance ladder and discount literals. The
    * discounts 1/log₂(i+1) are computed ONCE here and interpolated as
    * identical literals into both engines (the [[graft.ops.Events.BenfordP]]
    * discipline — the engines never run their own log); IDCG at full
    * depth is likewise ONE precomputed literal — legitimate because the
    * truth side is EXPLICITLY built at this depth (q29's core with
    * topK = [[NdcgDepth]], not the 5-deep scoreboard default: sourcing
    * truth at the default depth silently capped perfect retrieval at
    * ~0.83, the round-14 advisory finding), so every query really has
    * depth graded rows and the ideal ranking is always complete. */
  private[ops] val NdcgDepth = 10
  private[ops] val NdcgDisc: Seq[Double] =
    (1 to NdcgDepth).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
  private[ops] val NdcgIdcg: Double =
    (1 to NdcgDepth).map(i => (NdcgDepth + 1 - i) * NdcgDisc(i - 1)).sum

  /** q231: nDCG@10 of the IVF cell-probe retrieval — the rank-position-
    * weighted quality metric completing the scoreboard: recall (q63/q178)
    * counts hits anywhere, MRR (q168) grades only the FIRST hit, AP
    * (q185) weights by precision at hits; nDCG grades the WHOLE ranked
    * page with graded relevance — the metric RAG context selection is
    * actually tuned on, where slot 2 vs slot 9 changes what fits in the
    * prompt. Relevance is the declared exact-truth grade (q29's rank t →
    * gain 11−t, the standard protocol when the exact neighbor order IS
    * the label); a query whose page contains no true neighbor scores 0
    * and stays in the mean's denominator.
    *
    * Exactness: gains are exact integers; discounts and IDCG are shared
    * literals (see [[NdcgDisc]]); each query's DCG folds its ≤10 hit
    * terms in RANK order and the cross-query mean folds in QID order
    * (the q219 ordered-fold idiom, applied twice) — the only non-portable
    * step, re-ordered double accumulation, is pinned away in both engines.
    *
    * Scale shape: truth is the query-batch-bounded declared baseline
    * (the q29/q75 contract); candidates ride the q46 cell-probe shape
    * (work = |cell| per query, never corpus²); the hit join keys on
    * (qid, id); the folds run over ≤|queries| rows. */
  def q231Ndcg(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = q29KnnBrute(spark, sfDir, DefaultAnn.copy(topK = NdcgDepth))
      .select(col("id1").as("tqid"), col("id2").as("true_id"),
        (lit(NdcgDepth + 1) - col("rk")).cast("long").as("rel"))
    val assigned = assignedCells(spark, sfDir)
    val q = assigned.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    val discCase = NdcgDisc.zipWithIndex
      .map { case (d, i) => s"WHEN ${i + 1} THEN ${d}D" }
      .mkString("CASE rk ", " ", " END")
    val cands = q.join(assigned.select(col("vec_id").as("cand_id"),
        col("v").as("cv"), col("nrm").as("cn"), col("cell").as("ccell")),
        col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= NdcgDepth)
      .select(col("qid"), col("cand_id"), col("rk"))
    val perQuery = cands.join(broadcast(truth),
        col("qid") === col("tqid") && col("cand_id") === col("true_id"))
      .select(col("qid"), col("rk"),
        (col("rel").cast("double") * expr(discCase)).as("term"))
      .groupBy(col("qid"))
      .agg((expr(
        """aggregate(transform(sort_array(collect_list(struct(rk, term))),
          |  x -> x.term), 0.0D, (a, x) -> a + x)""".stripMargin)
        / lit(NdcgIdcg)).as("ndcg"))
    val folded = perQuery.agg(expr(
      """aggregate(transform(sort_array(collect_list(struct(qid, ndcg))),
        |  x -> x.ndcg), 0.0D, (a, x) -> a + x)""".stripMargin).as("s"))
    truth.select(col("tqid")).distinct()
      .agg(count(lit(1)).as("n_queries"))
      .crossJoin(broadcast(folded))
      .select(col("n_queries"),
        (col("s") / col("n_queries").cast("double")).as("ndcg_at_10"))
  }

  val q231NdcgSql: String = {
    val discCase = NdcgDisc.zipWithIndex
      .map { case (d, i) => s"WHEN ${i + 1} THEN ${d}e0" }
      .mkString("CASE c.rk ", " ", " END")
    s"""
    WITH $ivfAssignedSqlCtes,
    probe AS (
      SELECT q.vec_id AS qid, c.vec_id AS cand_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(q.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (q.nrm * c.nrm) AS cos
      FROM assigned q JOIN assigned c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
          AND q.vec_id < ${DefaultAnn.knnQueryIds}),
    cand AS (
      SELECT qid, cand_id, rk FROM (
        SELECT qid, cand_id,
          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC)
            AS rk
        FROM probe) WHERE rk <= $NdcgDepth),
    truth AS (
      SELECT id1 AS qid, id2 AS true_id,
        CAST($NdcgDepth + 1 - rk AS BIGINT) AS rel
      FROM (${q29KnnBruteSqlAt(NdcgDepth)})),
    pq AS (
      SELECT c.qid,
        list_reduce(list_prepend(0e0,
          list(CAST(t.rel AS DOUBLE) * ($discCase) ORDER BY c.rk)),
          (a, x) -> a + x) / ${NdcgIdcg}e0 AS ndcg
      FROM cand c JOIN truth t ON c.qid = t.qid AND c.cand_id = t.true_id
      GROUP BY 1),
    f AS (
      SELECT coalesce(list_reduce(list_prepend(0e0,
          list(ndcg ORDER BY qid)), (a, x) -> a + x), 0e0) AS s
      FROM pq),
    nq AS (SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_queries
           FROM truth)
    SELECT nq.n_queries, f.s / CAST(nq.n_queries AS DOUBLE) AS ndcg_at_10
    FROM nq, f
  """
  }

  /** q169 tuning: candidates kept per query in the Hamming ranking. */
  val BinaryAnnK = 3

  /** q169: BINARY (sign-bit) QUANTIZED ANN — 1 bit per dimension, the
    * 64× compression tier BELOW int8 (q62, 8×) and PQ (q80, 64× with
    * codebooks): code = the sign bits of the raw vector packed into two
    * BIGINT words, distance = Hamming via xor + popcount. For normalized
    * embeddings, Hamming(sign(u), sign(v)) estimates the angle (each
    * agreeing bit is a hyperplane both sides agree on — the SimHash
    * argument, q28, applied to the embedding itself with the NATURAL
    * coordinate hyperplanes), so nearest-by-Hamming approximates
    * nearest-by-cosine with zero codebook training and a 2-instruction
    * distance. The ranking (hamming ASC, cand_id ASC) is a total order
    * over exact integers — bitwise identical in both engines, no floats
    * anywhere past the sign test.
    *
    * Scale shape: codes are ONE map-side projection (array HOF fold, no
    * shuffle); the scan pass is the query-batch-bounded baseline shape
    * (the q29 contract) but moves 16 BYTES per candidate instead of 512
    * and does 2 xor+popcounts instead of 64 multiply-adds — this is the
    * tier that makes brute-force rerank-everything viable at 100 TB. The
    * rank filter pushes into WindowGroupLimit. Sub-linear variant when
    * even that is too much: multi-index hashing on the two 32-bit words
    * (pigeonhole: any pair at Hamming ≤ r agrees exactly on one half for
    * r ≤ 1 per half) — the q46 cell shape with lo/hi as the cells. */
  /** Tracked output (the r17 ann-group contract, see [[q29KnnBrute]]):
    * q178's recall join consumes this exact plan. */
  def q169BinaryAnn(spark: SparkSession, sfDir: String): DataFrame =
    graft.CachedFrames.track(
      binaryAnnOn(graft.CachedFrames.track(vecs(spark, sfDir)),
        DefaultAnn.knnQueryIds))

  /** The code+rank core over ANY (vec_id, v) frame — fixture-testable.
    * `depth` widens the kept ranking (q169 keeps [[BinaryAnnK]]; q234's
    * rank-agreement audit reads the top [[RboDepth]]). */
  private[graft] def binaryAnnOn(e: DataFrame, queryBound: Long,
      depth: Int = BinaryAnnK): DataFrame = {
    def packed(offset: Int) = expr(
      s"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      s"IF(element_at(v, i + $offset) >= 0.0D, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))")
    val codes = graft.CachedFrames.track(
      e.select(col("vec_id"), packed(1).as("lo"), packed(33).as("hi")))
    val q = codes.filter(col("vec_id") < queryBound)
      .select(col("vec_id").as("qid"), col("lo").as("qlo"), col("hi").as("qhi"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("hamming").asc, col("cand_id").asc)
    q.crossJoin(codes.select(col("vec_id").as("cand_id"), col("lo"), col("hi")))
      .filter(col("qid") =!= col("cand_id"))
      .withColumn("hamming",
        expr("bit_count(qlo ^ lo) + bit_count(qhi ^ hi)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= depth)
      .select(col("qid"), col("cand_id"), col("rk").cast("int").as("rk"),
        col("hamming").cast("int").as("hamming"))
  }

  /** The sign-bit code + Hamming ranking CTE chain (e, c, p, brank) —
    * the SINGLE source of the code formula for the q169 and q234
    * oracles. `brank(qid, cand_id, hamming, rk)` is unfiltered; callers
    * cut at their own depth. */
  private[ops] val binaryRankSqlCtes: String = s"""
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    c AS (
      SELECT vec_id,
        list_reduce(list_prepend(0::BIGINT, list_transform(range(32),
          i -> CASE WHEN v[i + 1] >= 0.0 THEN (1::BIGINT << i)
               ELSE 0::BIGINT END)), (acc, x) -> acc + x) AS lo,
        list_reduce(list_prepend(0::BIGINT, list_transform(range(32),
          i -> CASE WHEN v[i + 33] >= 0.0 THEN (1::BIGINT << i)
               ELSE 0::BIGINT END)), (acc, x) -> acc + x) AS hi
      FROM e),
    p AS (
      SELECT q.vec_id AS qid, c2.vec_id AS cand_id,
        bit_count(xor(q.lo, c2.lo)) + bit_count(xor(q.hi, c2.hi)) AS hamming
      FROM c q JOIN c c2 ON q.vec_id <> c2.vec_id
      WHERE q.vec_id < ${DefaultAnn.knnQueryIds}),
    brank AS (
      SELECT qid, cand_id, hamming,
        row_number() OVER (PARTITION BY qid ORDER BY hamming ASC, cand_id ASC)
          AS rk
      FROM p)"""

  val q169BinaryAnnSql: String = s"""
    WITH $binaryRankSqlCtes
    SELECT qid, cand_id, CAST(rk AS INTEGER) AS rk,
      CAST(hamming AS INTEGER) AS hamming
    FROM brank WHERE rk <= $BinaryAnnK
  """

  /** q234 tuning: ranking depth, persistence p, the per-anchor weight
    * ladder W_m = Σ_{d=m..k} (1−p)·p^{d−1}/d, and the truncation
    * normalizer Σ_m W_m — ALL precomputed here and interpolated as
    * identical literals into both engines (the [[NdcgDisc]] discipline).
    * An intersection item whose two ranks max at m contributes W_m, so a
    * query's truncated RBO is ONE ordered sum of ladder literals; the
    * normalizer makes identical top-k rankings score exactly 1 (the
    * numerator's fold then IS the denominator's defining sum, m-ascending
    * in both). */
  private[ops] val RboDepth = 10
  private[ops] val RboP = 0.9
  private[ops] val RboW: Seq[Double] = {
    val w = (1 to RboDepth)
      .map(d => (1.0 - RboP) * math.pow(RboP, d - 1) / d)
    (1 to RboDepth).map(m => (m to RboDepth).map(d => w(d - 1)).sum)
  }
  private[ops] val RboNorm: Double = {
    var s = 0.0
    (1 to RboDepth).foreach(m => s += RboW(m - 1)) // m-ascending, as folded
    s
  }

  /** q234: RANK-AGREEMENT (truncated RBO@10) of the sign-bit tier vs
    * EXACT truth — does the 64×-compressed ranking agree with the
    * full-precision order, not merely hit it somewhere (q178's recall
    * counts membership; RBO weights WHERE — slot 2 vs slot 9 changes
    * what a rerank budget must repair). Rank-biased overlap (Webber et
    * al. 2010) truncated at depth 10 and normalized so identical
    * rankings score exactly 1: per query, each item in BOTH top-10 lists
    * contributes the precomputed ladder weight of max(rank_truth,
    * rank_binary); a query with disjoint lists scores 0 and stays in the
    * mean's denominator.
    *
    * Exactness: ranks are exact integers under total orders (truth by
    * exact cosine, candidates by exact Hamming); all weights, the ladder
    * and the normalizer are shared literals; the per-query sum folds
    * (m, cand_id)-ascending and the cross-query mean qid-ascending (the
    * ordered-fold idiom twice, as q231).
    *
    * Scale shape: truth is the query-batch-bounded declared baseline
    * built EXPLICITLY at depth [[RboDepth]] (q29's core with topK = 10 —
    * sourcing it from the 5-deep scoreboard default left the numerator
    * structurally short of the 10-deep normalizer and capped the score
    * at ~0.8, the round-14 advisory finding);
    * the Hamming ranking is q169's declared bounded-batch scan at 16
    * bytes/candidate; the agreement join keys on (qid, id); folds run
    * over ≤|queries| rows. */
  def q234RankAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = q29KnnBrute(spark, sfDir, DefaultAnn.copy(topK = RboDepth))
      .select(col("id1").as("qid"), col("id2").as("cand_id"),
        col("rk").cast("int").as("ra"))
    val bin = binaryAnnOn(graft.CachedFrames.track(vecs(spark, sfDir)),
      DefaultAnn.knnQueryIds, RboDepth)
      .select(col("qid"), col("cand_id"), col("rk").as("rb"))
    rboOn(truth, bin)
  }

  /** The RBO core over ANY two (qid, cand_id, rank ≤ [[RboDepth]])
    * frames (rank columns `ra` / `rb`) — fixture-testable. The query
    * roster (the mean's denominator) is the distinct qid set of the
    * FIRST frame (the truth side defines which queries exist). */
  private[graft] def rboOn(a: DataFrame, b: DataFrame): DataFrame = {
    val wCase = RboW.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}D" }
      .mkString("CASE m ", " ", " END")
    val perQuery = a.join(b, Seq("qid", "cand_id"))
      .select(col("qid"), col("cand_id"),
        greatest(col("ra"), col("rb")).cast("int").as("m"))
      .select(col("qid"), col("cand_id"), col("m"), expr(wCase).as("term"))
      .groupBy(col("qid"))
      .agg((expr(
        """aggregate(transform(
          |  sort_array(collect_list(struct(m, cand_id, term))),
          |  x -> x.term), 0.0D, (acc, x) -> acc + x)""".stripMargin)
        / lit(RboNorm)).as("rbo"))
    val folded = perQuery.agg(expr(
      """aggregate(transform(sort_array(collect_list(struct(qid, rbo))),
        |  x -> x.rbo), 0.0D, (acc, x) -> acc + x)""".stripMargin).as("s"))
    a.select(col("qid")).distinct().agg(count(lit(1)).as("n_queries"))
      .crossJoin(broadcast(folded))
      .select(col("n_queries"),
        (col("s") / col("n_queries").cast("double")).as("rbo_at_10"))
  }

  val q234RankAgreementSql: String = {
    val wCase = RboW.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}e0" }
      .mkString("CASE m ", " ", " END")
    s"""
    WITH $binaryRankSqlCtes,
    truth AS (
      SELECT id1 AS qid, id2 AS cand_id, CAST(rk AS INTEGER) AS ra
      FROM (${q29KnnBruteSqlAt(RboDepth)})),
    bin AS (
      SELECT qid, cand_id, CAST(rk AS INTEGER) AS rb
      FROM brank WHERE rk <= $RboDepth),
    items AS (
      SELECT t.qid, t.cand_id,
        CAST(greatest(t.ra, b.rb) AS INTEGER) AS m
      FROM truth t JOIN bin b ON t.qid = b.qid AND t.cand_id = b.cand_id),
    pq AS (
      SELECT qid,
        list_reduce(list_prepend(0e0,
          list(($wCase) ORDER BY m, cand_id)), (a, x) -> a + x)
          / ${RboNorm}e0 AS rbo
      FROM items GROUP BY 1),
    f AS (
      SELECT coalesce(list_reduce(list_prepend(0e0,
          list(rbo ORDER BY qid)), (a, x) -> a + x), 0e0) AS s
      FROM pq),
    nq AS (SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_queries
           FROM truth)
    SELECT nq.n_queries, f.s / CAST(nq.n_queries AS DOUBLE) AS rbo_at_10
    FROM nq, f
  """
  }

  /** q175 tuning: projected dimension, rank-key fixed point, reported
    * rank-exact percentile levels (the q140/q155 convention). */
  val JlDim = 16
  val JlPercentiles: Seq[(String, Long, Long)] =
    Seq(("p01", 1L, 100L), ("p50", 1L, 2L), ("p99", 99L, 100L))

  /** q175: JOHNSON-LINDENSTRAUSS projection DISTORTION AUDIT — project
    * every vector from [[Dim]] to [[JlDim]] with the deterministic ±1
    * sign matrix (Achlioptas' database-friendly JL construction, seeded
    * by the same md5 formula as the LSH planes so both engines build the
    * identical matrix), then measure, over the bounded query-batch pair
    * set, the squared-distance ratio ‖S(u−v)‖²/(k·‖u−v‖²) — the quantity
    * the JL lemma promises concentrates near 1. The audit a pipeline runs
    * BEFORE swapping the 4× cheaper projected vectors into ANN candidate
    * generation: p01/p50/p99 of the ratio tell you exactly how much
    * neighbour ordering can distort. Percentiles are rank-exact over the
    * fixed-point key ⌊ratio·10¹²⌋ (ties broken by pair id — every
    * reported value is a real pair's ratio), so both engines agree
    * bitwise; the ratio itself is a fixed-order double chain.
    *
    * Scale shape: projections and squared norms are ONE map-side cached
    * pass (16 codegen dot products per vector — no shuffle); the pair
    * pass is the declared query-batch-bounded baseline (q29 contract)
    * with per-pair work two dot products (64-dim + 16-dim); the
    * percentile layout is the ungrouped [[DistRank]] — B-way parallel,
    * 1-row conditional-max picks. */
  def q175JlDistortion(spark: SparkSession, sfDir: String): DataFrame = {
    val signs = planeSigns(JlDim)
    // track the SHARED bare-vecs plan too: other queries cache the same
    // canonicalized plan, and Spark's CacheManager substitutes their cached
    // relation into this query's plan — without our own reference, a
    // concurrent thread draining last unpersists it MID-SCAN and AQE reads
    // the relation as empty (the q80 race; this query shipped 0 rows in a
    // full concurrent Verify before this line)
    val base = graft.CachedFrames.track(vecs(spark, sfDir))
    val e = graft.CachedFrames.track(base
      .withColumn("p",
        array((0 until JlDim).map(j => dot(col("v"), typedLit(signs(j)))): _*))
      .withColumn("nn2", dot(col("v"), col("v")))
      .withColumn("pn2", dot(col("p"), col("p")))
      .select(col("vec_id"), col("v"), col("p"), col("nn2"), col("pn2")))
    val q = e.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("p").as("qp"),
        col("nn2").as("qnn2"), col("pn2").as("qpn2"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("p").as("cp"), col("nn2").as("cnn2"), col("pn2").as("cpn2"))
    val pairs = graft.CachedFrames.track(q.crossJoin(c)
      .filter(col("qid") < col("cand_id"))
      .withColumn("d2", col("qnn2") + col("cnn2")
        - lit(2.0) * dot(col("qv"), col("cv")))
      .withColumn("pd2", col("qpn2") + col("cpn2")
        - lit(2.0) * dot(col("qp"), col("cp")))
      .filter(col("d2") > 0.0)
      .select(col("qid"), col("cand_id"), expr(
        s"CAST(floor(pd2 / ($JlDim.0D * d2) * 1000000000000.0D) AS BIGINT)")
        .as("fx")))
    val n = pairs.agg(count(lit(1)).as("n_pairs"))
    val aggs = JlPercentiles.map { case (name, a, b) =>
      (max(when(col("_r") === expr(s"($a * n_pairs + ${b - 1}) DIV $b"),
        col("fx"))).cast("double") / lit(1e12)).as(name)
    }
    DistRank.withBucketedRank(pairs, Seq(), "fx", Seq("qid", "cand_id"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_pairs"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val q175JlDistortionSql: String = {
    val signFold = (j: String) =>
      s"""list_reduce(list_prepend(0.0::DOUBLE, list_transform(range($Dim),
         |  i -> CASE WHEN (('0x' || substr(md5($j::VARCHAR || ':' || i::VARCHAR), 1, 14))::BIGINT & 1) = 1
         |       THEN v[i + 1] ELSE -v[i + 1] END)), (a2, t) -> a2 + t)""".stripMargin
    val picks = JlPercentiles.map { case (name, a, b) =>
      s"CAST(max(CASE WHEN rnk = ($a * n + ${b - 1}) // $b THEN fx END) AS DOUBLE) / 1e12 AS $name"
    }.mkString(",\n      ")
    s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    pr AS (
      SELECT vec_id, v,
        list_transform(range($JlDim), j -> ${signFold("j")}) AS p,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS nn2
      FROM e),
    pp AS (
      SELECT vec_id, v, p, nn2,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(p, x -> x * x)), (acc, x) -> acc + x) AS pn2
      FROM pr),
    pairs AS (
      SELECT a.vec_id AS qid, b.vec_id AS cand_id,
        a.nn2 + b.nn2 - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])),
          (acc, x) -> acc + x) AS d2,
        a.pn2 + b.pn2 - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.p, b.p), z -> z[1] * z[2])),
          (acc, x) -> acc + x) AS pd2
      FROM pp a JOIN pp b
        ON a.vec_id < b.vec_id AND a.vec_id < ${DefaultAnn.knnQueryIds}),
    fxs AS (
      SELECT qid, cand_id,
        CAST(floor(pd2 / ($JlDim.0 * d2) * 1000000000000.0) AS BIGINT) AS fx
      FROM pairs WHERE d2 > 0.0),
    r AS (
      SELECT fx, row_number() OVER (ORDER BY fx, qid, cand_id) AS rnk,
        count(*) OVER () AS n
      FROM fxs)
    SELECT CAST(max(n) AS BIGINT) AS n_pairs,
      $picks
    FROM r GROUP BY n
  """
  }

  /** q178: recall@3 of the BINARY sign-quantized index (q169) against the
    * brute-force cosine truth — the missing number on the compression
    * scoreboard: q75 prices the label/hash/PQ tiers, this prices the 64×
    * 1-bit tier, answering "what does dropping to sign bits cost in
    * neighbour recall" next to what it saves in bytes. Same declared
    * baseline and join shape as q63 (truth is the bounded query batch;
    * everything downstream is ≤ 3 rows per query). */
  def q178BinaryRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = graft.CachedFrames.track(
      q29KnnBrute(spark, sfDir).filter(col("rk") <= 3)
        .select(col("id1").as("qid"), col("id2").as("cand_id")))
    val bin = q169BinaryAnn(spark, sfDir).select(col("qid"), col("cand_id"))
    val hits = truth.join(bin, Seq("qid", "cand_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    truth.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_at_3", col("n_hits").cast("double") / lit(3.0))
  }

  val q178BinaryRecallSql: String = s"""
    WITH truth AS (
      SELECT id1 AS qid, id2 AS cand_id FROM ($q29KnnBruteSql) WHERE rk <= 3),
    bin AS (SELECT qid, cand_id FROM ($q169BinaryAnnSql)),
    hits AS (
      SELECT t.qid, count(*) AS n_hits
      FROM truth t JOIN bin USING (qid, cand_id)
      GROUP BY 1),
    qs AS (SELECT DISTINCT qid FROM truth)
    SELECT qs.qid,
      CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 3.0 AS recall_at_3
    FROM qs LEFT JOIN hits h ON qs.qid = h.qid
  """

  /** q115 tuning: hard negatives kept per query. */
  val HardNegK = 3

  /** q115: contrastive HARD-NEGATIVE mining — for each query vector, the
    * [[HardNegK]] highest-cosine DIFFERENT-label vectors in its IVF home
    * cell (the "hard" negatives a contrastive/embedding trainer wants:
    * close in the space but semantically wrong), next to the best
    * same-label cosine and the pos-neg margin. Rows with a NULL margin
    * (no in-cell positive) are themselves a data-quality signal: the
    * query's class has no nearby anchor.
    *
    * Scale shape: mining rides the PRODUCTION ANN path — the broadcast
    * codebook assigns cells ([[probeAssign]]), candidates are compared
    * only within a cell (the q106 SemDeDup contract: k grows with the
    * corpus so cell populations stay bounded, and the self-join is a
    * cell-keyed shuffle join, never corpus-quadratic). The positive max
    * and the negative top-k both fold per query inside the same cached
    * candidate frame — one candidate pass feeds both. The query-side
    * `< knnQueryIds` bound is the gate's oracle-cost cap (q29's
    * contract); production mines all vectors by the identical plan. */
  def q115HardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val assigned = assignedCells(spark, sfDir)
    val q = assigned.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val c = assigned.select(col("vec_id").as("cand_id"), col("label").as("clabel"),
      col("v").as("cv"), col("nrm").as("cn"), col("cell").as("ccell"))
    // persist: the in-cell candidate frame feeds BOTH the positive max and
    // the negative ranking — one candidate pass, two query-sized folds
    val probe = graft.CachedFrames.track(
      q.join(c, col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
        .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .select(col("qid"), col("qlabel"), col("cand_id"), col("clabel"), col("cos")))
    val pos = probe.filter(col("qlabel") === col("clabel"))
      .groupBy(col("qid")).agg(max(col("cos")).as("cos_pos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand_id").asc)
    probe.filter(col("qlabel") =!= col("clabel"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= HardNegK)
      .select(col("qid"), col("cand_id").as("neg_id"), col("rk"),
        col("cos").as("cos_neg"))
      .join(pos, Seq("qid"), "left")
      .withColumn("margin", col("cos_pos") - col("cos_neg"))
      .select(col("qid"), col("neg_id"), col("rk"), col("cos_neg"),
        col("cos_pos"), col("margin"))
  }

  val q115HardNegativesSql: String = s"""
    WITH $ivfAssignedSqlCtes,
    al AS (
      SELECT a.vec_id, a.v, a.nrm, a.cell, emb.label
      FROM assigned a JOIN embeddings emb ON a.vec_id = emb.vec_id),
    probe AS (
      SELECT q.vec_id AS qid, q.label AS qlabel,
        c.vec_id AS cand_id, c.label AS clabel,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(q.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (q.nrm * c.nrm) AS cos
      FROM al q JOIN al c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
          AND q.vec_id < ${DefaultAnn.knnQueryIds}),
    pos AS (
      SELECT qid, max(cos) AS cos_pos FROM probe WHERE qlabel = clabel GROUP BY 1),
    neg AS (
      SELECT qid, cand_id AS neg_id, cos AS cos_neg,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS rk
      FROM probe WHERE qlabel <> clabel)
    SELECT n.qid, n.neg_id, CAST(n.rk AS INTEGER) AS rk, n.cos_neg, p.cos_pos,
      p.cos_pos - n.cos_neg AS margin
    FROM neg n LEFT JOIN pos p ON n.qid = p.qid
    WHERE n.rk <= $HardNegK
  """

  /** q119 tuning — the RRF damping constant (60 is the canonical value from
    * Cormack et al. 2009, used as-is by Elasticsearch/Vespa/OpenSearch) and
    * the fused list depth. */
  val RrfK = 60.0
  val RrfTopK = 3

  /** q119: RECIPROCAL RANK FUSION of lexical and dense retrieval — the
    * standard hybrid-search merge: for every (query, candidate) seen by
    * EITHER the TF-IDF ranker (q61) or the embedding KNN (q29, via the
    * q104 doc_id ↔ vec_id convention), score 1/(k+rank) per list it
    * appears in, sum, and keep the fused top-[[RrfTopK]]. RRF needs no
    * score calibration between the two systems — only ranks — which is
    * exactly why production hybrid search uses it.
    *
    * Scale shape: both inputs are the PRODUCTION rankers unchanged; the
    * fusion itself touches only their outputs — |queries| × top-k rows —
    * so the merge join, the window, everything downstream is
    * query-batch-bounded (the q29/q107 measurement contract; a serving
    * deployment fuses per query over k-row lists). The RRF scores are
    * sums of two single IEEE divisions in fixed order, so the oracle
    * matches bitwise. */
  def q119RrfFusion(spark: SparkSession, sfDir: String): DataFrame = {
    val lex = TextOps.q61TfidfCosine(spark, sfDir)
      .select(col("qid"), col("did"), col("rk").as("rk_lex"))
    val vec = q29KnnBrute(spark, sfDir)
      .select(col("id1").as("qid"), col("id2").as("did"), col("rk").as("rk_vec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_score").desc, col("did").asc)
    lex.join(vec, Seq("qid", "did"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfK) + col("rk_lex").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rk_vec").cast("double")), lit(0.0)))
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= RrfTopK)
      .select(col("qid"), col("did"), col("fused_rank"), col("rrf_score"),
        col("rk_lex"), col("rk_vec"))
  }

  val q119RrfFusionSql: String = s"""
    WITH lex AS (
      SELECT qid, did, rk AS rk_lex FROM (${TextOps.q61TfidfCosineSql})),
    vec AS (
      SELECT id1 AS qid, id2 AS did, rk AS rk_vec FROM ($q29KnnBruteSql)),
    fused AS (
      SELECT coalesce(lex.qid, vec.qid) AS qid,
        coalesce(lex.did, vec.did) AS did,
        lex.rk_lex, vec.rk_vec,
        coalesce(1.0 / ($RrfK + CAST(lex.rk_lex AS DOUBLE)), 0.0)
          + coalesce(1.0 / ($RrfK + CAST(vec.rk_vec AS DOUBLE)), 0.0) AS rrf_score
      FROM lex FULL OUTER JOIN vec ON lex.qid = vec.qid AND lex.did = vec.did),
    r AS (
      SELECT qid, did, rrf_score, rk_lex, rk_vec,
        row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, did ASC)
          AS fused_rank
      FROM fused)
    SELECT qid, did, CAST(fused_rank AS INTEGER) AS fused_rank, rrf_score,
      rk_lex, rk_vec
    FROM r WHERE fused_rank <= $RrfTopK
  """

  /** q74 tuning: hash-seeded codebook size. Decoupled from label
    * cardinality (10 here) — a real 100 TB IVF wants k ≈ √n regardless of
    * any label column; 16 > 10 pins the decoupling in the gate while
    * keeping the oracle's cross join tiny. The salt versions the seeding. */
  private[ops] val HashCodebookK = 16
  private val HashCellSalt = "ivf:"

  /** Codebook from cell-assigned vectors — (cell, v) rows to (cell, c,
    * cnorm2) — as fixed-point DECIMAL means per dimension (the q31
    * mechanics: order-insensitive, map-side partial, oracle-exact). The
    * Lloyd "update" step, shared by the hash seed and every training
    * round. */
  private def meansOf(cells: DataFrame): DataFrame =
    cells.select(col("cell"), posexplode(col("v")).as(Seq("idx", "x")))
      .groupBy(col("cell"), col("idx"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .select(col("cell"), col("idx"),
        (col("fx").cast("double") / lit(1e12) / col("n").cast("double")).as("mean_x"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("idx"), col("mean_x")))).as("im"))
      .select(col("cell"), expr("transform(im, x -> x.mean_x)").as("c"))
      .withColumn("cnorm2", dot(col("c"), col("c")))

  /** Hash-seeded codebook: initial cells from a seeded content hash
    * (`md5_prefix56('ivf:' || vec_id) % k` — deterministic, uniform,
    * label-free), centroids as the cells' fixed-point DECIMAL means. One
    * subsequent nearest-centroid assignment (= the q55 Lloyd step) happens
    * in [[probeAssign]]; [[trainedCentroids]] iterates that pair. */
  private def hashCentroids(e: DataFrame, k: Int): DataFrame =
    meansOf(e.withColumn("cell", expr(
      s"CAST(md5_prefix56(concat('$HashCellSalt', CAST(vec_id AS STRING))) % $k AS INT)")))

  /** Multi-iteration k-means: `rounds − 1` full Lloyd iterations
    * (reassign to nearest centroid, recompute fixed-point means) on top of
    * the hash-seeded codebook — rounds = 1 IS the hash-seed codebook q74
    * searches, so the q89 comparison isolates exactly what training buys.
    * Deterministic end to end: the seed is a content hash, assignment
    * ties break (d2 ASC, cell ASC), and the means are order-insensitive
    * fixed-point sums, so any retry or re-plan yields the same codebook.
    *
    * Scale shape per round: ONE broadcast of the k·Dim codebook, the
    * map-side top-1 assignment collapse of [[probeAssign]], and the
    * map-side-combinable means aggregation — no shuffle grows with
    * rounds. Empty cells (every vector reassigned away) simply drop out,
    * the standard Lloyd degeneracy. */
  private[ops] def trainedCentroids(e: DataFrame, k: Int, rounds: Int): DataFrame =
    (2 to rounds).foldLeft(hashCentroids(e, k)) { (cents, _) =>
      meansOf(probeAssign(e, cents, nprobe = 1).select(col("cell"), col("v")))
    }

  /** Total distortion Σ_v min_cell ‖v − c‖² of a codebook over the corpus —
    * the number a k-means training loop watches for its plateau. One
    * broadcast crossJoin + min/sum aggregation; EmbeddingsSpec logs it per
    * round and pins Lloyd's monotone non-increase across [[trainedCentroids]]
    * rounds. */
  private[ops] def distortionOf(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2",
        col("nrm") * col("nrm") - lit(2.0) * dot(col("v"), col("c")) + col("cnorm2"))
      .groupBy(col("vec_id")).agg(min(col("d2")).as("d2"))
      .agg(sum(col("d2")).as("distortion"))

  /** q74: IVF ANN over the hash-seeded codebook — same cell-probe search
    * as q46, but the codebook size k = [[HashCodebookK]] is a free
    * parameter instead of the label cardinality (the r5 verdict's residual:
    * label-derived centroids tie the index to a column a 100 TB corpus may
    * not have, and cap k at #labels when a real index wants k ≈ √n).
    * Everything downstream of the seeding is shared code: the assignment
    * join ([[probeAssign]]), the fixed-point centroid math, the top-3
    * ranking. q75 reports its measured recall next to the label codebook's.
    *
    * Scale shape: identical to q46 — broadcast codebook, map-side
    * top-nprobe collapse, candidate join linear in cell size. */
  /** Tracked output (the r17 ann-group contract, see [[q29KnnBrute]]):
    * q75's hash branch and q89's hash variant consume this exact plan, so
    * the hash-IVF candidate set materializes once per rep. */
  def q74HashIvf(spark: SparkSession, sfDir: String): DataFrame =
    graft.CachedFrames.track(hashIvfUntracked(spark, sfDir))

  private def hashIvfUntracked(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val assigned = probeAssign(e, hashCentroids(e, HashCodebookK), nprobe = 1)
      .drop("probe_rk")
    val q = assigned.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand_id").asc)
    q.join(assigned.select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell").as("ccell")),
        col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cand_id"), col("cell"), col("rk"), col("cos"))
  }

  /** DuckDB chain mirroring the hash-seeded assignment ([[hashCentroids]] +
    * [[probeAssign]] at nprobe=1): `hassigned` is (vec_id, v, nrm, cell). */
  private val hashAssignedSqlCtes: String = s"""e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    h AS (
      SELECT vec_id,
        CAST(('0x' || substr(md5('$HashCellSalt' || vec_id::VARCHAR), 1, 14))::BIGINT
          % $HashCodebookK AS INTEGER) AS cell0
      FROM e),
    hx AS (
      SELECT h.cell0 AS cell, i.idx - 1 AS idx, e.v[i.idx] AS x
      FROM e JOIN h USING (vec_id),
           LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS idx) i),
    hmeans AS (
      SELECT cell, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM hx GROUP BY cell, idx),
    hcents AS (
      SELECT cell, list(mean_x ORDER BY idx) AS c FROM hmeans GROUP BY cell),
    hcn AS (
      SELECT cell, c,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(c, x -> x * x)), (acc, x) -> acc + x) AS cnorm2
      FROM hcents),
    hda AS (
      SELECT n.vec_id, n.v, n.nrm, hcn.cell,
        n.nrm * n.nrm
          - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(list_zip(n.v, hcn.c), z -> z[1] * z[2])), (acc, x) -> acc + x)
          + hcn.cnorm2 AS d2
      FROM n CROSS JOIN hcn),
    hassigned AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT vec_id, v, nrm, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM hda) WHERE rk = 1)"""

  val q74HashIvfSql: String = s"""
    WITH $hashAssignedSqlCtes,
    probe AS (
      SELECT q.vec_id AS qid, c.vec_id AS cand_id, q.cell,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(q.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (q.nrm * c.nrm) AS cos
      FROM hassigned q JOIN hassigned c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id AND q.vec_id < ${DefaultAnn.knnQueryIds})
    SELECT qid, cand_id, cell, CAST(rk AS INTEGER) AS rk, cos FROM (
      SELECT qid, cand_id, cell, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS rk
      FROM probe) WHERE rk <= 3
  """

  /** Cosine threshold for q106's semantic-duplicate verdicts. The synthetic
    * embeddings' within-cell cosines top out near 0.46 (labels are soft
    * clusters, not copies), so 0.35 plays the role SemDeDup's ~0.95 plays
    * on a real corpus: selective (41 of 500 vectors evicted at sf0.01, 10
    * at 0.40) while still exercising the verdict machinery at every SF. */
  private val SemDedupTau = 0.35

  /** q106: SemDeDup-style semantic dedup keep-set (Abbas et al. 2023,
    * "SemDeDup", arXiv:2303.09540): bucket the corpus by the hash-seeded
    * IVF coarse quantizer (the q74 codebook), compare pairs ONLY within a
    * cell, and evict any vector that has a lower-id in-cell neighbor with
    * cosine ≥ τ — the lowest id in each semantic group survives, so the
    * keep-set is deterministic with no RNG and no arrival-order dependence.
    * One verdict row per vector: (vec_id, cell, verdict, evicted_by) with
    * evicted_by = the smallest qualifying neighbor, NULL for keepers.
    *
    * This is the corpus-product face of embedding near-dup: q48 emits
    * candidate PAIRS (LSH-bucketed); q106 emits the per-document keep/evict
    * decision a curation DAG consumes — the embedding analog of q51's
    * step-4 representative selection, and the batch analog of the q78
    * admission probe (q78 gates a delta against an index; q106 prunes a
    * whole corpus against itself).
    *
    * Scale shape (100 TB): the quadratic blow-up is bounded per cell — the
    * SemDeDup contract is that k grows with the corpus (k ≈ n / target
    * cell size) so cell populations stay bounded and the within-cell
    * self-join is a cell-keyed shuffle join, never all-pairs. The verdict
    * join-back aggregates to ≤1 row per evicted vector before a vec_id
    * equi-join. Codebook build is the shared broadcast + fixed-point-means
    * pass of [[hashCentroids]]; nothing here collects to the driver. */
  def q106SemanticKeep(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    semanticKeepOn(e, hashCentroids(e, HashCodebookK))
  }

  /** q106's core against ANY codebook — the q89 trained centroids slot in
    * unchanged (same (cell, c, cnorm2) shape), which is how a production
    * run would pair training with semantic dedup: tighter cells put true
    * neighbors together, so the same τ evicts more of the real duplicates
    * (EmbeddingsSpec pins validity of the trained-codebook verdicts with
    * the same pairwise oracle as the hash-seeded gate query). */
  private[ops] def semanticKeepOn(e: DataFrame, cents: DataFrame): DataFrame = {
    val assigned = probeAssign(e, cents, nprobe = 1)
      .drop("probe_rk", "label")
    val evicted = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id") &&
          dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
            >= lit(SemDedupTau))
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("b.vec_id")).as("evicted_by"))
    assigned.select(col("vec_id"), col("cell"))
      .join(evicted, Seq("vec_id"), "left")
      .withColumn("verdict",
        when(col("evicted_by").isNotNull, lit("evict")).otherwise(lit("keep")))
      .select(col("vec_id"), col("cell"), col("verdict"), col("evicted_by"))
  }

  val q106SemanticKeepSql: String = s"""
    WITH $hashAssignedSqlCtes,
    hits AS (
      SELECT a.vec_id AS vec_id, min(b.vec_id) AS evicted_by
      FROM hassigned a JOIN hassigned b
        ON a.cell = b.cell AND a.vec_id > b.vec_id
        AND list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (a.nrm * b.nrm) >= $SemDedupTau
      GROUP BY 1)
    SELECT s.vec_id, s.cell,
      CASE WHEN h.evicted_by IS NOT NULL THEN 'evict' ELSE 'keep' END AS verdict,
      h.evicted_by
    FROM hassigned s LEFT JOIN hits h ON s.vec_id = h.vec_id
  """

  /** Lloyd rounds for the q89 trained codebook (seed means = round 1, so
    * this is two full reassign+update iterations beyond the hash seed). */
  private[ops] val TrainedRounds = 3

  /** One Lloyd round in DuckDB: fixed-point means over `src`'s (cell, v)
    * assignment, then reassignment of every vector to the new centroids —
    * the verbatim mirror of [[meansOf]] + [[probeAssign]], emitted as
    * `${p}assigned`. `n` (vec_id, v, nrm) comes from the shared chain. */
  private def lloydRoundSqlCtes(src: String, p: String): String = s"""${p}x AS (
      SELECT s.cell, i.idx - 1 AS idx, s.v[i.idx] AS x
      FROM $src s, LATERAL (SELECT unnest(generate_series(1, len(s.v))) AS idx) i),
    ${p}means AS (
      SELECT cell, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM ${p}x GROUP BY cell, idx),
    ${p}cents AS (
      SELECT cell, list(mean_x ORDER BY idx) AS c FROM ${p}means GROUP BY cell),
    ${p}cn AS (
      SELECT cell, c,
        list_reduce(list_prepend(0.0::DOUBLE, list_transform(c, x -> x * x)),
          (acc, x) -> acc + x) AS cnorm2
      FROM ${p}cents),
    ${p}da AS (
      SELECT n.vec_id, n.v, n.nrm, k.cell,
        n.nrm * n.nrm
          - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(list_zip(n.v, k.c), z -> z[1] * z[2])), (acc, x) -> acc + x)
          + k.cnorm2 AS d2
      FROM n CROSS JOIN ${p}cn k),
    ${p}assigned AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT vec_id, v, nrm, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM ${p}da) WHERE rk = 1)"""

  /** The trained-codebook cell-probe search (q74's search over
    * [[trainedCentroids]] at [[TrainedRounds]]): hassigned is the round-2
    * assignment, each [[lloydRoundSqlCtes]] appends one more
    * means+reassign round, and the probe runs on the final assignment. */
  private val trainedSearchSql: String = s"""
    WITH $hashAssignedSqlCtes,
    ${lloydRoundSqlCtes("hassigned", "t2")},
    ${lloydRoundSqlCtes("t2assigned", "t3")},
    tprobe AS (
      SELECT q.vec_id AS qid, c.vec_id AS cand_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(q.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (q.nrm * c.nrm) AS cos
      FROM t3assigned q JOIN t3assigned c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id AND q.vec_id < ${DefaultAnn.knnQueryIds})
    SELECT qid, cand_id FROM (
      SELECT qid, cand_id,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS rk
      FROM tprobe) WHERE rk <= 3
  """

  /** q89: what k-means TRAINING buys the IVF index, as a gate number —
    * recall@3 vs the brute-force truth for the hash-seeded codebook (q74's
    * search, rounds = 1) next to the [[TrainedRounds]]-round Lloyd-trained
    * codebook over the SAME k and seed, so the only difference is the
    * training. EmbeddingsSpec pins recall(trained) ≥ recall(hash) and logs
    * the per-round distortion plateau ([[distortionOf]]).
    *
    * Scale shape: training adds [[TrainedRounds]]−1 broadcast-assign +
    * map-side-means passes over the corpus (each one scan, no growing
    * shuffle); the recall arithmetic is query-batch-bounded like q75. */
  def q89TrainedRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val truth = graft.CachedFrames.track(
      q29KnnBrute(spark, sfDir).filter(col("rk") <= 3)
        .select(col("id1").as("qid"), col("id2").as("cand_id")))
    def searchOver(cents: DataFrame): DataFrame = {
      val assigned = probeAssign(e, cents, nprobe = 1).drop("probe_rk")
      val q = assigned.filter(col("vec_id") < DefaultAnn.knnQueryIds)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          col("cell"))
      val wq = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("cand_id").asc)
      q.join(assigned.select(col("vec_id").as("cand_id"), col("v").as("cv"),
          col("nrm").as("cn"), col("cell").as("ccell")),
          col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
        .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("cand_id"))
    }
    def scored(name: String, cands: DataFrame): DataFrame =
      truth.join(cands.select(col("qid"), col("cand_id")), Seq("qid", "cand_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(truth.select(col("qid")).distinct().agg(count(lit(1)).as("nq")))
        .select(lit(name).as("variant"), col("n_hits"),
          (col("n_hits").cast("double") /
            (lit(3.0) * col("nq").cast("double"))).as("recall"))
    scored("hash", q74HashIvf(spark, sfDir))
      .unionAll(scored("trained",
        searchOver(trainedCentroids(e, HashCodebookK, TrainedRounds))))
  }

  val q89TrainedRecallSql: String = s"""
    WITH truth AS (
      SELECT id1 AS qid, id2 AS cand_id FROM ($q29KnnBruteSql) WHERE rk <= 3),
    nq AS (SELECT count(DISTINCT qid) AS n FROM truth),
    hh AS (
      SELECT count(*) AS n_hits FROM truth t
      JOIN (SELECT qid, cand_id FROM ($q74HashIvfSql)) c USING (qid, cand_id)),
    th AS (
      SELECT count(*) AS n_hits FROM truth t
      JOIN (SELECT qid, cand_id FROM ($trainedSearchSql)) c USING (qid, cand_id))
    SELECT 'hash' AS variant, hh.n_hits,
      CAST(hh.n_hits AS DOUBLE) / (3.0 * CAST(nq.n AS DOUBLE)) AS recall
    FROM hh, nq
    UNION ALL
    SELECT 'trained' AS variant, th.n_hits,
      CAST(th.n_hits AS DOUBLE) / (3.0 * CAST(nq.n AS DOUBLE)) AS recall
    FROM th, nq
  """

  /** q75: the ANN recall scoreboard — recall@3 against the brute-force
    * truth (q29) for all four candidate generators side by side: the
    * label-codebook single-probe (q46), its multi-probe widening (q60),
    * the hash-seeded codebook (q74), and the compressed IVF-PQ ADC path
    * (q80). This turns the verdict asks into gate NUMBERS: the multi-probe
    * benefit (recall_multi ≥ recall_single per query — also pinned in
    * EmbeddingsSpec), the hash codebook's quality vs the label one, and
    * what the 64× PQ compression costs in recall.
    *
    * Scale shape: the truth is the query-batch-bounded baseline; the four
    * candidate sets are each ≤ 3 rows per query; every join here is
    * query-batch-sized. The cost of the row is the baseline's, by design. */
  def q75RecallCompare(spark: SparkSession, sfDir: String): DataFrame = {
    // cached: the truth feeds SIX consumers (five hit joins + the query
    // roster) — untracked, the queries×corpus crossJoin replays for each
    val truth = graft.CachedFrames.track(
      q29KnnBrute(spark, sfDir).filter(col("rk") <= 3)
        .select(col("id1").as("qid"), col("id2").as("cand_id")))
    // ONE cached nprobe=2 assignment pass serves BOTH label-codebook
    // candidate sets: single-probe = its probe_rk=1 slice (identical to
    // q46's nprobe=1 assignment — same best cell, same tie-break), multi =
    // all probes. Composing q46+q60 as black boxes would run the centroid
    // build + assignment crossJoin twice for identical rows; the oracle
    // still composes the two queries verbatim because the RESULTS are
    // identical, only the computation is shared.
    val probed = probedCells(spark, sfDir, DefaultAnn.nprobe)
    val home = probed.filter(col("probe_rk") === 1)
    def topk(probes: DataFrame): DataFrame = {
      val q = probes.filter(col("vec_id") < DefaultAnn.knnQueryIds)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
          col("cell"))
      val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand_id").asc)
      q.join(home.select(col("vec_id").as("cand_id"), col("v").as("cv"),
          col("nrm").as("cn"), col("cell").as("ccell")),
          col("cell") === col("ccell") && col("qid") =!= col("cand_id"))
        .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rk", row_number().over(wq))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("cand_id"))
    }
    def recallOf(n: String): org.apache.spark.sql.Column =
      coalesce(col(n), lit(0L)).cast("double") / lit(3.0)
    // ONE cached depth-10 ADC pass serves BOTH compressed candidate sets:
    // pq = its rk≤3 slice (identical to q80's own depth-3 ranking, same
    // window), rerank = the exact re-scoring of all 10 (= q83). Same
    // sharing argument as the label-codebook pass above; the oracle
    // composes q80/q83 verbatim because the RESULTS are identical.
    val ranked = graft.CachedFrames.track(adcRanked(spark, sfDir, RerankDepth))
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    // assembly is ONE union-then-conditional-count pass: all five
    // candidate sets ride a single (qid, cand_id, variant) frame through
    // one truth join and one per-qid aggregation, replacing the former
    // five hit-joins + five left joins (r8 verdict: a 30+-job tail whose
    // scheduling dominated isolated-rep variance). Counting per variant
    // inside one agg is pivot-without-the-pivot: no distinct-values job,
    // no extra exchange — the variant column is a constant per branch.
    def tagged(cands: DataFrame, v: String): DataFrame =
      cands.select(col("qid"), col("cand_id")).withColumn("variant", lit(v))
    val cands = tagged(topk(home), "single")
      .unionByName(tagged(topk(probed), "multi"))
      .unionByName(tagged(q74HashIvf(spark, sfDir), "hash"))
      .unionByName(tagged(ranked.filter(col("rk") <= 3), "pq"))
      .unionByName(tagged(rerankStage(e, ranked), "rerank"))
    val hits = truth.join(cands, Seq("qid", "cand_id"))
      .groupBy(col("qid"))
      .agg(count(when(col("variant") === "single", 1)).as("h1"),
        count(when(col("variant") === "multi", 1)).as("h2"),
        count(when(col("variant") === "hash", 1)).as("h3"),
        count(when(col("variant") === "pq", 1)).as("h4"),
        count(when(col("variant") === "rerank", 1)).as("h5"))
    truth.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        recallOf("h1").as("recall_single"),
        recallOf("h2").as("recall_multi"),
        recallOf("h3").as("recall_hash"),
        recallOf("h4").as("recall_pq"),
        recallOf("h5").as("recall_rerank"))
  }

  /** lazy: embeds [[q80PqAdcSql]], declared later in this object. */
  lazy val q75RecallCompareSql: String = s"""
    WITH truth AS (
      SELECT id1 AS qid, id2 AS cand_id FROM ($q29KnnBruteSql) WHERE rk <= 3),
    h1 AS (
      SELECT t.qid, count(*) AS h FROM truth t
      JOIN (SELECT qid, cand_id FROM ($q46IvfAnnSql)) c USING (qid, cand_id)
      GROUP BY 1),
    h2 AS (
      SELECT t.qid, count(*) AS h FROM truth t
      JOIN (SELECT qid, cand_id FROM ($q60IvfMultiprobeSql)) c USING (qid, cand_id)
      GROUP BY 1),
    h3 AS (
      SELECT t.qid, count(*) AS h FROM truth t
      JOIN (SELECT qid, cand_id FROM ($q74HashIvfSql)) c USING (qid, cand_id)
      GROUP BY 1),
    h4 AS (
      SELECT t.qid, count(*) AS h FROM truth t
      JOIN (SELECT qid, cand_id FROM ($q80PqAdcSql)) c USING (qid, cand_id)
      GROUP BY 1),
    h5 AS (
      SELECT t.qid, count(*) AS h FROM truth t
      JOIN (SELECT qid, cand_id FROM ($q83PqRerankSql)) c USING (qid, cand_id)
      GROUP BY 1),
    qs AS (SELECT DISTINCT qid FROM truth)
    SELECT qs.qid,
      CAST(coalesce(h1.h, 0) AS DOUBLE) / 3.0 AS recall_single,
      CAST(coalesce(h2.h, 0) AS DOUBLE) / 3.0 AS recall_multi,
      CAST(coalesce(h3.h, 0) AS DOUBLE) / 3.0 AS recall_hash,
      CAST(coalesce(h4.h, 0) AS DOUBLE) / 3.0 AS recall_pq,
      CAST(coalesce(h5.h, 0) AS DOUBLE) / 3.0 AS recall_rerank
    FROM qs
    LEFT JOIN h1 ON qs.qid = h1.qid
    LEFT JOIN h2 ON qs.qid = h2.qid
    LEFT JOIN h3 ON qs.qid = h3.qid
    LEFT JOIN h4 ON qs.qid = h4.qid
    LEFT JOIN h5 ON qs.qid = h5.qid
  """

  /** q78 tuning: the admission batch (vec_id < bound plays the arriving
    * delta) and the cosine bound for a semantic-duplicate verdict (q48's
    * near-dup threshold on this synthetic embedding space).
    * private[graft]: the streaming admission twin applies the same bound. */
  private[graft] val AdmitBatchBound = 100
  private[graft] val AdmitCosTau = 0.3

  /** The static index frames behind the STREAMING embedding admission
    * ([[graft.streaming.EventStreams.embeddingAdmissionStream]]): the
    * hash-seeded corpus codebook collapsed to ONE row carrying all
    * (cell, c, cnorm2) structs — k·Dim doubles, broadcast by definition —
    * and the per-cell corpus entries (cell, entries: array of (cid, cv,
    * cn)), so every stream row resolves its verdict ROW-LOCALLY (the same
    * statelessness trick as the text admission's per-bucket cell index).
    * Entry arrays are bounded by cell size = corpus/k, the same quantity
    * that bounds q78's batch candidate join. Takes the RAW corpus
    * (vec_id, embedding); centroids are label-free, so the placeholder
    * label never influences cells.
    *
    * `rounds` > 1 Lloyd-trains the codebook ([[trainedCentroids]]) before
    * indexing — better-balanced cells and higher recall (q89's measured
    * gain) at the cost of rounds−1 extra corpus passes AT BUILD TIME
    * only; admission cost is unchanged. rounds = 1 is the hash-seed
    * codebook and stays the default so the q78 gate and its streaming
    * twin remain bitwise-pinned. */
  private[graft] def admissionIndexFrames(corpus: DataFrame,
      rounds: Int = 1): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus
      .select(col("vec_id"), lit(0).as("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = trainedCentroids(c, HashCodebookK, rounds)
    val centsRow = cents.agg(
      array_sort(collect_list(struct(col("cell"), col("c"), col("cnorm2"))))
        .as("cents"))
    val cells = probeAssign(c, cents, nprobe = 1)
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))).as("entries"))
    (centsRow, cells)
  }

  /** Deletion propagation for the persisted EMBEDDING admission index:
    * filter the forgotten vectors out of every cell's entry array (the
    * deletion list rides in as ONE broadcast row, the filter is a
    * row-local codegen HOF — the index never shuffles), dropping cells
    * that empty out. The codebook is NOT retrained: centroids are
    * corpus-scale means, a deletion batch cannot meaningfully move them,
    * and keeping them frozen preserves every surviving entry's cell
    * assignment — periodic re-trains rewrite both frames wholesale. */
  private[graft] def forgetFromVectorIndex(cells: DataFrame,
      ids: DataFrame): DataFrame = {
    val delRow = ids.agg(collect_set(col("vec_id")).as("del"))
    cells.crossJoin(broadcast(delRow))
      .withColumn("entries",
        expr("filter(entries, e -> NOT array_contains(del, e.cid))"))
      .drop("del")
      .filter(size(col("entries")) > 0)
  }

  /** Vector-index extension — the admitted (verdict `new`) slice of a
    * batch joins the persisted index: each new vector is assigned to its
    * nearest STANDING centroid (the codebook must not shift — q78's
    * invariant, so old entries never move cells) and its (cid, cv, cn)
    * entry concatenates onto that cell's array; cells the batch never
    * touches pass through untouched, and previously-empty cells
    * materialize fresh. Closes the incremental loop (Build → Admit →
    * Extend → next batch admits against the grown index, no rebuild),
    * spec-pinned in CliSpec: a just-extended batch re-admits as
    * `dup_semantic` against itself at cosine 1.
    *
    * Scale shape: the delta's per-cell entry arrays broadcast into the
    * standing cells frame (one LEFT join on cell — the index streams,
    * never shuffles or explodes); genuinely-new cells arrive via an
    * anti-join of the tiny delta against the ≤k cell keys. */
  private[graft] def extendVectorIndex(centsRow: DataFrame, cells: DataFrame,
      vecs: DataFrame): DataFrame = {
    val assigned = assignNearestStandingCell(vecs, centsRow)
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))).as("new_entries"))
    val merged = cells.join(broadcast(assigned), Seq("cell"), "left")
      .withColumn("entries",
        when(col("new_entries").isNull, col("entries"))
          .otherwise(concat(col("entries"), col("new_entries"))))
      .drop("new_entries")
    val fresh = assigned.join(cells.select("cell"), Seq("cell"), "left_anti")
      .select(col("cell"), col("new_entries").as("entries"))
    merged.unionByName(fresh)
  }

  /** The probe stage of the embedding admission against prebuilt index
    * frames ([[admissionIndexFrames]] live, or read back from disk by
    * `cli.AdmitVectors`): every batch vector resolves its verdict
    * ROW-LOCALLY — nearest-centroid argmin over the broadcast codebook row
    * (the exact (d2 ASC, cell ASC) tie-break of the batch assignment),
    * then filter/min/max codegen HOFs over its cell's broadcast entry
    * array. Shared verbatim by the streaming twin and the CLI path, so
    * the formulations cannot diverge; q78 remains the oracle-gated
    * specification of the semantics. `batch` needs (vec_id, embedding);
    * other columns (e.g. the stream's ts) pass through untouched. */
  /** Nearest-STANDING-centroid assignment, shared by [[extendVectorIndex]]
    * and [[admitVectorsAgainstIndex]]: adds `v` (double embedding), `nrm`,
    * and `cell` — the argmin over the broadcast codebook row with the
    * (d2 ASC, cell ASC) tie-break of the batch assignment. One definition
    * on purpose: an extended vector MUST land in the cell admission will
    * probe (the CliSpec closed-loop pin), so the expression cannot be
    * allowed to diverge between the two paths. */
  private[graft] def assignNearestStandingCell(vecs: DataFrame,
      centsRow: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    vecs
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .crossJoin(broadcast(centsRow))
      .withColumn("cell", expr(
        """array_min(transform(cents,
             c -> named_struct(
               'd2', nrm * nrm - 2.0 * dot_product(v, c.c) + c.cnorm2,
               'cell', c.cell))).cell"""))
      .drop("cents")
  }

  /** The cell table of a vector set under a FROZEN codebook row — the
    * from-scratch reference of the vector family's grown-index law: since
    * a from-scratch rebuild would retrain the codebook, the honest law for
    * extension is "extend(build(base), batch) ≡ every base ∪ batch vector
    * assigned to base's standing codebook" (entry-set equality per cell —
    * array order is a collect_list artifact, so the law compares exploded
    * entries). Also doubles as the pinned agreement between the build
    * path's probeAssign(nprobe = 1) and the extend/admit paths'
    * [[assignNearestStandingCell]]. */
  private[graft] def cellsUnderCodebook(vecs: DataFrame,
      centsRow: DataFrame): DataFrame =
    assignNearestStandingCell(vecs, centsRow)
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"))).as("entries"))

  private[graft] def admitVectorsAgainstIndex(batch: DataFrame,
      centsRow: DataFrame, cells: DataFrame): DataFrame = {
    val keep = batch.columns.filterNot(_ == "embedding").toIndexedSeq.map(col)
    assignNearestStandingCell(batch, centsRow)
      .join(broadcast(cells), Seq("cell"), "left")
      .withColumn("match_id", expr(
        s"""array_min(transform(
              filter(entries, e -> dot_product(v, e.cv) / (nrm * e.cn) >= $AdmitCosTau),
              e -> e.cid))"""))
      .withColumn("best_cos", expr(
        "array_max(transform(entries, e -> dot_product(v, e.cv) / (nrm * e.cn)))"))
      .select(keep :+
        when(col("match_id").isNotNull, lit("dup_semantic"))
          .otherwise(lit("new")).as("verdict") :+
        col("match_id") :+ col("best_cos"): _*)
  }

  /** q78: embedding admission — the SEMANTIC twin of the text-side
    * delta-vs-corpus check (q71): each vector in the arriving batch probes
    * the STANDING corpus's IVF index (hash-seeded codebook, trained on the
    * corpus only — an arriving batch must not shift the standing
    * centroids) and emits `dup_semantic` (some same-cell corpus vector
    * with cosine ≥ [[AdmitCosTau]]) or `new`, plus the smallest matching
    * corpus id and the best cosine seen (NULL when the cell has no corpus
    * member). Together with q71 this completes admission-time dedup across
    * both modalities: exact/near text AND embedding space.
    *
    * Scale shape: the same asymmetry as q71 — the codebook is broadcast,
    * both assignments are map-side, and the candidate join is batch ×
    * cell-size, never corpus²; max/min aggregates are order-insensitive so
    * the oracle matches bitwise. */
  def q78EmbeddingAdmission(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val batch = e.filter(col("vec_id") < AdmitBatchBound)
    val corpus = e.filter(col("vec_id") >= AdmitBatchBound)
    val cents = hashCentroids(corpus, HashCodebookK)
    val aCorpus = probeAssign(corpus, cents, nprobe = 1)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell"))
    val aBatch = probeAssign(batch, cents, nprobe = 1)
      .select(col("vec_id").as("bid"), col("v").as("bv"),
        col("nrm").as("bn"), col("cell"))
    val verdicts = aBatch.join(aCorpus, "cell")
      .withColumn("cos", dot(col("bv"), col("cv")) / (col("bn") * col("cn")))
      .groupBy(col("bid"))
      .agg(min(when(col("cos") >= AdmitCosTau, col("cid"))).as("match_id"),
        max(col("cos")).as("best_cos"))
    // r17: the verdict frame is TRACKED — q104's semantic leg and q264's
    // economics rollup embed this exact plan, so within a shared-group rep
    // (Bench "admission" group) or concurrent Verify threads the codebook
    // train + both assignments run ONCE and the consumers read the
    // batch-sized verdicts (the production contract: admission verdicts
    // are computed once per batch and every downstream report reads them)
    graft.CachedFrames.track(batch.select(col("vec_id"))
      .join(verdicts.withColumnRenamed("bid", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("match_id").isNotNull, lit("dup_semantic"))
          .otherwise(lit("new")).as("verdict"),
        col("match_id"), col("best_cos")))
  }

  val q78EmbeddingAdmissionSql: String = s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    corpus AS (SELECT * FROM n WHERE vec_id >= $AdmitBatchBound),
    batch AS (SELECT * FROM n WHERE vec_id < $AdmitBatchBound),
    h AS (
      SELECT vec_id,
        CAST(('0x' || substr(md5('$HashCellSalt' || vec_id::VARCHAR), 1, 14))::BIGINT
          % $HashCodebookK AS INTEGER) AS cell0
      FROM corpus),
    hx AS (
      SELECT h.cell0 AS cell, i.idx - 1 AS idx, c.v[i.idx] AS x
      FROM corpus c JOIN h USING (vec_id),
           LATERAL (SELECT unnest(generate_series(1, len(c.v))) AS idx) i),
    hmeans AS (
      SELECT cell, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM hx GROUP BY cell, idx),
    hcents AS (
      SELECT cell, list(mean_x ORDER BY idx) AS c FROM hmeans GROUP BY cell),
    hcn AS (
      SELECT cell, c,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(c, x -> x * x)), (acc, x) -> acc + x) AS cnorm2
      FROM hcents),
    ca AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT s.vec_id, s.v, s.nrm, hcn.cell,
          row_number() OVER (PARTITION BY s.vec_id ORDER BY
            s.nrm * s.nrm
              - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
                  list_transform(list_zip(s.v, hcn.c), z -> z[1] * z[2])), (acc, x) -> acc + x)
              + hcn.cnorm2 ASC, hcn.cell ASC) AS rk
        FROM corpus s CROSS JOIN hcn) WHERE rk = 1),
    ba AS (
      SELECT vec_id, v, nrm, cell FROM (
        SELECT s.vec_id, s.v, s.nrm, hcn.cell,
          row_number() OVER (PARTITION BY s.vec_id ORDER BY
            s.nrm * s.nrm
              - 2.0 * list_reduce(list_prepend(0.0::DOUBLE,
                  list_transform(list_zip(s.v, hcn.c), z -> z[1] * z[2])), (acc, x) -> acc + x)
              + hcn.cnorm2 ASC, hcn.cell ASC) AS rk
        FROM batch s CROSS JOIN hcn) WHERE rk = 1),
    cand AS (
      SELECT b.vec_id AS bid, c.vec_id AS cid,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(b.v, c.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (b.nrm * c.nrm) AS cos
      FROM ba b JOIN ca c ON b.cell = c.cell),
    m AS (
      SELECT bid, min(CASE WHEN cos >= $AdmitCosTau THEN cid END) AS match_id,
        max(cos) AS best_cos
      FROM cand GROUP BY bid)
    SELECT b.vec_id,
      CASE WHEN m.match_id IS NOT NULL THEN 'dup_semantic' ELSE 'new' END AS verdict,
      m.match_id, m.best_cos
    FROM batch b LEFT JOIN m ON b.vec_id = m.bid
  """

  /** q264: VECTOR-ADMISSION ECONOMICS — the per-batch readout of the
    * semantic admission (q78), completing the admission-economics trio
    * across index families: q240 prices the graph admission, q261 the
    * substring admission, and this the vector one. One row: how much of
    * the batch the standing corpus already covers semantically (the dup
    * bill), how many vectors probed an EMPTY cell (n_empty_cell — cells
    * the corpus never populated: codebook-coverage holes the periodic
    * retrain should look at), the best cosine seen anywhere, and the
    * near-miss ladder (batch vectors whose best corpus cosine clears
    * 0.90/0.95/0.99) — the τ-sensitivity readout: how many verdicts
    * would flip if [[AdmitCosTau]] moved to each rung, which is the
    * number a threshold review actually needs.
    *
    * Exactness: all counts exact BIGINT; dup_rate is one division;
    * max(best_cos) is an order-insensitive max over cosines both engines
    * compute identically per-row (q78 is hash-green), and the ladder
    * compares those same doubles against shared literals. Scale shape:
    * exactly q78's pipeline (broadcast codebook, batch × cell-size
    * candidate join, never corpus²) plus one 1-row rollup. */
  def q264VectorAdmitEconomics(spark: SparkSession, sfDir: String): DataFrame =
    q78EmbeddingAdmission(spark, sfDir)
      .agg(count(lit(1)).as("n_batch"),
        sum(when(col("verdict") === "dup_semantic", 1L).otherwise(0L))
          .as("n_dup"),
        sum(when(col("verdict") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("best_cos").isNull, 1L).otherwise(0L))
          .as("n_empty_cell"),
        max(col("best_cos")).as("max_best_cos"),
        sum(when(col("best_cos") >= 0.90, 1L).otherwise(0L))
          .as("n_best_ge_90"),
        sum(when(col("best_cos") >= 0.95, 1L).otherwise(0L))
          .as("n_best_ge_95"),
        sum(when(col("best_cos") >= 0.99, 1L).otherwise(0L))
          .as("n_best_ge_99"))
      .select(col("n_batch"), col("n_dup"), col("n_new"),
        (col("n_dup").cast("double") / col("n_batch").cast("double"))
          .as("dup_rate"),
        col("n_empty_cell"), col("max_best_cos"),
        col("n_best_ge_90"), col("n_best_ge_95"), col("n_best_ge_99"))

  lazy val q264VectorAdmitEconomicsSql: String = s"""
    WITH v AS ($q78EmbeddingAdmissionSql)
    SELECT CAST(count(*) AS BIGINT) AS n_batch,
      CAST(sum(CASE WHEN verdict = 'dup_semantic' THEN 1 ELSE 0 END)
        AS BIGINT) AS n_dup,
      CAST(sum(CASE WHEN verdict = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_new,
      CAST(sum(CASE WHEN verdict = 'dup_semantic' THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate,
      CAST(sum(CASE WHEN best_cos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_empty_cell,
      max(best_cos) AS max_best_cos,
      CAST(sum(CASE WHEN best_cos >= 0.90 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_best_ge_90,
      CAST(sum(CASE WHEN best_cos >= 0.95 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_best_ge_95,
      CAST(sum(CASE WHEN best_cos >= 0.99 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_best_ge_99
    FROM v
  """

  /** Centroid gram matrix + cosine: joins the long-format centroids on idx,
    * sorted-fold-sums the products (shuffle-order-proof), then normalizes by
    * the diagonal. */
  def q32CentroidCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val c = q31Centroids(spark, sfDir).select(col("label"), col("idx"), col("mean_x"))
    val gram = c.alias("c1")
      .join(c.alias("c2"), col("c1.idx") === col("c2.idx") &&
        col("c1.label") <= col("c2.label"))
      .groupBy(col("c1.label").as("l1"), col("c2.label").as("l2"))
      .agg(sort_array(collect_list(col("c1.mean_x") * col("c2.mean_x"))).as("ps"))
      .withColumn("dot", expr("aggregate(ps, CAST(0 AS DOUBLE), (a, b) -> a + b)"))
      .drop("ps")
    val diag = gram.filter(col("l1") === col("l2"))
      .select(col("l1").as("dl"), col("dot").as("dd"))
    gram
      .join(diag.alias("d1"), col("l1") === col("d1.dl"))
      .join(diag.alias("d2"), col("l2") === col("d2.dl"))
      .select(col("l1"), col("l2"), col("dot"),
        (col("dot") / (sqrt(col("d1.dd")) * sqrt(col("d2.dd")))).as("cos"))
  }

  val q32CentroidCosineSql: String = """
    WITH x AS (
      SELECT label, i.idx - 1 AS idx, v[i.idx] AS x
      FROM (SELECT label, list_transform(embedding, e -> e::DOUBLE) AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS idx) i),
    c AS (
      SELECT label, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM x GROUP BY label, idx),
    gram AS (
      SELECT c1.label AS l1, c2.label AS l2,
        list_reduce(list_prepend(0.0::DOUBLE, list_sort(list(c1.mean_x * c2.mean_x))),
                    (a, b) -> a + b) AS dot
      FROM c c1 JOIN c c2 ON c1.idx = c2.idx AND c1.label <= c2.label
      GROUP BY 1, 2),
    diag AS (SELECT l1 AS dl, dot AS dd FROM gram WHERE l1 = l2)
    SELECT g.l1, g.l2, g.dot, g.dot / (sqrt(d1.dd) * sqrt(d2.dd)) AS cos
    FROM gram g JOIN diag d1 ON g.l1 = d1.dl JOIN diag d2 ON g.l2 = d2.dl
  """

  /** q63: measured recall@3 of the IVF index against the brute-force
    * ground truth — the metric that decides nprobe at corpus scale (an ANN
    * index without a recall gate is a guess). Per query: how many of the
    * true top-3 neighbours (q29, exact) the cell-probe search (q46)
    * returned. Queries whose neighbours cross a cell boundary score < 1
    * here and recover under multi-probe (q60) — EmbeddingsSpec pins that
    * ordering.
    *
    * Scale shape: ground truth is the labeled brute-force baseline over
    * the bounded query batch (queries × corpus, not corpus²); the recall
    * join itself is query-batch-sized — trivially broadcastable. */
  def q63AnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    // cached: the brute-force truth feeds both the hit join and the query
    // roster — untracked, the queries×corpus crossJoin runs once per consumer
    val truth = graft.CachedFrames.track(
      q29KnnBrute(spark, sfDir).filter(col("rk") <= 3)
        .select(col("id1").as("qid"), col("id2").as("cand_id")))
    val ivf = q46IvfAnn(spark, sfDir).select(col("qid"), col("cand_id"))
    val hits = truth.join(ivf, Seq("qid", "cand_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    truth.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_at_3", col("n_hits").cast("double") / lit(3.0))
  }

  val q63AnnRecallSql: String = s"""
    WITH truth AS (
      SELECT id1 AS qid, id2 AS cand_id FROM ($q29KnnBruteSql) WHERE rk <= 3),
    ivf AS (SELECT qid, cand_id FROM ($q46IvfAnnSql)),
    hits AS (
      SELECT t.qid, count(*) AS n_hits
      FROM truth t JOIN ivf i ON t.qid = i.qid AND t.cand_id = i.cand_id
      GROUP BY 1),
    qs AS (SELECT DISTINCT qid FROM truth)
    SELECT qs.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 3.0 AS recall_at_3
    FROM qs LEFT JOIN hits h ON qs.qid = h.qid
  """

  /** q62: symmetric int8 quantization of the embedding column — the
    * standard 4× memory compression that makes billion-vector ANN indexes
    * fit in RAM. Per vector: scale = max |x| (an order-insensitive fold),
    * q_i = floor(x_i·127/scale + 0.5) clamped to [-127, 127] (floor(x+0.5)
    * instead of round() because the engines' round-half tie rules differ
    * while floor is bit-identical), and the reconstruction check
    * max |x_i − q_i·scale/127| that callers gate re-ranking on.
    *
    * Scale shape: a pure per-row codegen projection — no shuffle, no
    * state; at 100 TB it pipelines directly into the parquet scan. The
    * all-zero vector degenerates to scale 0 / q = 0 / err 0 on both
    * engines via the guarded CASE.
    *
    * Output contract: `q` is serialized as the '_'-joined string of its
    * int8 codes (the q26 signature convention) so the gate's row
    * comparator — which sorts rows and cannot hash raw arrays — can
    * canonicalize it; consumers wanting the array re-split on '_'. */
  def q62QuantizeInt8(spark: SparkSession, sfDir: String): DataFrame =
    Tables.parallelized(Tables(spark, sfDir, "embeddings"))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("scale",
        expr("aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("q", expr("""
        CASE WHEN scale = 0.0 THEN transform(v, x -> 0)
             ELSE transform(v, x -> CAST(greatest(CAST(-127 AS DOUBLE),
                    least(CAST(127 AS DOUBLE),
                      floor(x * 127.0 / scale + 0.5))) AS INTEGER)) END"""))
      .withColumn("max_abs_err", expr("""
        aggregate(zip_with(v, q, (x, qi) -> abs(x - CAST(qi AS DOUBLE) * scale / 127.0)),
                  CAST(0 AS DOUBLE), (a, e) -> greatest(a, e))"""))
      .select(col("vec_id"), col("scale"),
        expr("array_join(transform(q, x -> CAST(x AS STRING)), '_')").as("q"),
        col("max_abs_err"))

  val q62QuantizeInt8Sql: String = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
        list_reduce(list_prepend(0.0::DOUBLE, list_transform(v, x -> abs(x))),
                    (a, x) -> greatest(a, x)) AS scale
      FROM e),
    qz AS (
      SELECT vec_id, v, scale,
        CASE WHEN scale = 0.0 THEN list_transform(v, x -> 0::INTEGER)
             ELSE list_transform(v, x -> CAST(greatest(-127.0::DOUBLE,
                    least(127.0::DOUBLE,
                      floor(x * 127.0 / scale + 0.5))) AS INTEGER)) END AS q
      FROM s)
    SELECT vec_id, scale, array_to_string(q, '_') AS q,
      list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(list_zip(v, q),
          z -> abs(z[1] - CAST(z[2] AS DOUBLE) * scale / 127.0))),
        (a, e) -> greatest(a, e)) AS max_abs_err
    FROM qz
  """

  /** q88: per-dimension embedding drift — the vector-space twin of q72's
    * text-distribution drift: for every dimension, the fixed-point DECIMAL
    * mean over the arriving batch (vec_id < [[AdmitBatchBound]], q78's
    * split) vs over the standing corpus, and the absolute difference. A
    * shifted embedding space silently breaks every distance threshold
    * (q48's cosine bar, the IVF cell boundaries), so this is the monitor
    * a production pipeline alerts on before admitting a batch.
    *
    * Scale shape: one posexplode + map-side-combinable (grp, idx)
    * aggregation — the q31 centroid mechanics with a 2-value group key;
    * output is exactly Dim rows. Means are order-insensitive fixed-point,
    * so the oracle matches bitwise. */
  def q88EmbeddingDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val x = vecs(spark, sfDir)
      .withColumn("grp",
        when(col("vec_id") < AdmitBatchBound, lit("batch")).otherwise(lit("corpus")))
      .select(col("grp"), posexplode(col("v")).as(Seq("idx", "x")))
      .groupBy(col("grp"), col("idx"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .select(col("grp"), col("idx"),
        (col("fx").cast("double") / lit(1e12) / col("n").cast("double")).as("mean_x"))
    x.filter(col("grp") === "batch")
      .select(col("idx"), col("mean_x").as("mean_batch"))
      .join(x.filter(col("grp") === "corpus")
        .select(col("idx"), col("mean_x").as("mean_corpus")), Seq("idx"))
      .select(col("idx"), col("mean_batch"), col("mean_corpus"),
        abs(col("mean_batch") - col("mean_corpus")).as("abs_diff"))
  }

  val q88EmbeddingDriftSql: String = s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    x AS (
      SELECT CASE WHEN vec_id < $AdmitBatchBound THEN 'batch' ELSE 'corpus' END AS grp,
        i.idx - 1 AS idx, e.v[i.idx] AS x
      FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS idx) i),
    m AS (
      SELECT grp, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM x GROUP BY grp, idx)
    SELECT CAST(b.idx AS INTEGER) AS idx, b.mean_x AS mean_batch,
      c.mean_x AS mean_corpus, abs(b.mean_x - c.mean_x) AS abs_diff
    FROM (SELECT idx, mean_x FROM m WHERE grp = 'batch') b
    JOIN (SELECT idx, mean_x FROM m WHERE grp = 'corpus') c ON b.idx = c.idx
  """

  // ──────────────────────── Product quantization ────────────────────────

  /** PQ tuning: [[PqM]] subspaces of [[PqSubDim]] dims each (M·subDim =
    * the vector dim) with [[PqKs]]-entry sub-codebooks — M small codes
    * (≈ M bytes) per vector vs Dim·4 bytes of raw FLOAT, the ~64×
    * compression that puts a billion-vector index in executor RAM.
    * Sub-codebooks are hash-seeded exactly like the coarse quantizer
    * ([[hashCentroids]]): seed cells from `md5_prefix56('pq:<m>:' ||
    * vec_id) % Ks`, centroids as fixed-point DECIMAL means — then
    * LLOYD-TRAINED per subspace for [[PqTrainedRounds]] rounds
    * ([[pqTrainedCodebooks]]), the same loop q89 runs on the coarse
    * codebook — deterministic, label-free, oracle-exact. */
  private[ops] val PqM = 4
  private[ops] val PqSubDim = Dim / PqM
  private[ops] val PqKs = 16
  private val PqSalt = "pq:"

  /** Sub-codebook training rounds (mirrors the coarse [[TrainedRounds]]):
    * rounds = 1 is the bare hash-seeded book; 3 = two full per-subspace
    * Lloyd iterations on top of it. */
  private[ops] val PqTrainedRounds = 3

  /** All subspaces of the (vec_id, v, …) frame in long form: (vec_id, m,
    * sv) — ONE pass over the corpus covers every subspace, instead of M
    * separate slice projections. */
  private def pqSubsLong(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(array((0 until PqM).map(m =>
      slice(col("v"), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "sv")))

  /** ALL sub-codebooks in one means pass, keyed (m, cell), from an
    * assignment frame (vec_id, m, sv, cell): fixed-point DECIMAL means
    * (the q31/q74 mechanics on the subvectors). M·Ks×subDim doubles —
    * broadcast by construction. One aggregation chain instead of M: the
    * subspace id is just another grouping key. */
  private def pqMeansOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("idx", "x")))
      .groupBy(col("m"), col("cell"), col("idx"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0))")).as("fx"))
      .select(col("m"), col("cell"), col("idx"),
        (col("fx").cast("double") / lit(1e12) / col("n").cast("double")).as("mean_x"))
      .groupBy(col("m"), col("cell"))
      .agg(array_sort(collect_list(struct(col("idx"), col("mean_x")))).as("im"))
      .select(col("m"), col("cell"), expr("transform(im, x -> x.mean_x)").as("c"))

  /** Hash-seeded sub-codebooks — the rounds = 1 training state. */
  private[ops] def pqCodebooks(e: DataFrame): DataFrame =
    pqMeansOf(pqSubsLong(e).withColumn("cell", expr(
      s"""CAST(md5_prefix56(concat('$PqSalt', CAST(m AS STRING), ':',
           CAST(vec_id AS STRING))) % $PqKs AS INT)""")))

  /** Nearest-sub-centroid reassignment of every (vec, m) subvector — the
    * per-subspace Lloyd reassign step. One broadcast join on the subspace
    * id + the map-side `min(struct(d2, cell, sv))` argmin (struct ordering
    * is (d2 ASC, cell ASC), the oracle's tie-break; sv rides behind cell
    * and is never compared — cells are distinct within a group). */
  private def pqAssigned(e: DataFrame, books: DataFrame): DataFrame =
    pqSubsLong(e)
      .join(broadcast(books), Seq("m"))
      .withColumn("d2", expr(
        """aggregate(zip_with(sv, c, (a, b) -> (a - b) * (a - b)),
             CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("cell"), col("sv"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.sv").as("sv"), col("b.cell").as("cell"))

  /** Lloyd-trained sub-codebooks: `rounds − 1` full reassign+means
    * iterations per subspace ([[trainedCentroids]]'s loop, with m as an
    * extra grouping key) on top of the hash seed — rounds = 1 IS
    * [[pqCodebooks]], so the EmbeddingsSpec comparison isolates exactly
    * what training buys. Deterministic end to end (content-hash seed,
    * (d2, cell) tie-break, order-insensitive fixed-point means).
    *
    * Scale shape per round: ONE broadcast of the M·Ks·subDim codebook,
    * one map-side argmin collapse, one map-side-combinable means pass —
    * no shuffle grows with rounds, exactly the q89 coarse loop. */
  private[ops] def pqTrainedCodebooks(e: DataFrame, rounds: Int): DataFrame =
    (2 to rounds).foldLeft(pqCodebooks(e)) { (books, _) =>
      pqMeansOf(pqAssigned(e, books))
    }

  /** Per-vector codes across ALL subspaces, widened to columns
    * (vec_id, code_0..code_{M-1}, d2_0..d2_{M-1}): the candidate fan-out
    * is ONE broadcast hash join on the subspace id (each (vec, m) row
    * meets its Ks sub-centroids), the argmin per (vec, m) is a map-side
    * `min(struct(d2, cell))` partial aggregation — struct ordering is
    * (d2 ASC, cell ASC), the oracle's exact tie-break — and one more
    * groupBy(vec_id) pivots the M codes wide (bounded M-element arrays).
    * No window, no M-way self-join, two exchanges total. */
  private[ops] def pqCodesWide(e: DataFrame, books: DataFrame): DataFrame = {
    val wide = pqSubsLong(e)
      .join(broadcast(books), Seq("m"))
      .withColumn("d2", expr(
        """aggregate(zip_with(sv, c, (a, b) -> (a - b) * (a - b)),
             CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("cell"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("best")))).as("a"))
    (0 until PqM).foldLeft(wide) { (acc, m) =>
      acc.withColumn(s"code_$m", expr(s"a[$m].best.cell"))
        .withColumn(s"d2_$m", expr(s"a[$m].best.d2"))
    }.drop("a")
  }

  /** q79: product-quantization encode — each vector compressed to [[PqM]]
    * sub-codebook codes plus the reconstruction distortion
    * Σ_m ‖v_m − c_{m,code_m}‖² that re-rankers gate on. Codes address the
    * LLOYD-TRAINED sub-codebooks ([[pqTrainedCodebooks]] at
    * [[PqTrainedRounds]]). Codes serialize as the '_'-joined string
    * (q26/q62 gate convention); consumers re-split.
    *
    * Scale shape: the combined codebook is broadcast; encoding is one
    * broadcast join + two bounded aggregations over a single corpus pass
    * (see [[pqCodesWide]]), after the bounded per-round training cost. At
    * 100 TB the emitted code table is ~1/64 the corpus and is what the
    * ADC search (q80) reads instead of raw floats. */
  def q79PqEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    pqCodesWide(e, pqTrainedCodebooks(e, PqTrainedRounds))
      .select(col("vec_id"),
        concat_ws("_",
          (0 until PqM).map(m => col(s"code_$m").cast("string")): _*).as("codes"),
        (0 until PqM).map(m => col(s"d2_$m")).reduce(_ + _).as("distortion"))
  }

  /** One per-subspace Lloyd round in DuckDB: book r = fixed-point means
    * of assignment r−1, assignment r = argmin vs book r — the verbatim
    * mirror of [[pqMeansOf]] + [[pqAssigned]] for subspace m, emitted as
    * `bk${r}_$m` / `aa${r}_$m`. */
  private def pqRoundSqlCtes(m: Int, r: Int): String = s"""bx${r}_$m AS (
      SELECT s.cell, i.idx - 1 AS idx, s.sv[i.idx] AS x
      FROM aa${r - 1}_$m s, LATERAL (SELECT unnest(generate_series(1, len(s.sv))) AS idx) i),
    bm${r}_$m AS (
      SELECT cell, idx,
        CAST(CAST(sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e12
          / CAST(count(*) AS DOUBLE) AS mean_x
      FROM bx${r}_$m GROUP BY cell, idx),
    bk${r}_$m AS (SELECT cell, list(mean_x ORDER BY idx) AS c FROM bm${r}_$m GROUP BY cell),
    ad${r}_$m AS (
      SELECT s.vec_id, s.sv, b.cell,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(s.sv, b.c), z -> (z[1] - z[2]) * (z[1] - z[2]))),
          (acc, x) -> acc + x) AS d2
      FROM sub$m s CROSS JOIN bk${r}_$m b),
    aa${r}_$m AS (
      SELECT vec_id, sv, cell, d2 FROM (
        SELECT vec_id, sv, cell, d2,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM ad${r}_$m) WHERE rk = 1)"""

  /** DuckDB chain for each subspace m: `sub$m` (vec_id, sv), the seeded
    * assignment `aa0_$m`, [[PqTrainedRounds]] chained Lloyd rounds, and
    * the final TRAINED sub-codebook `book$m` (cell, c) + assignment
    * `pa$m` (vec_id, code, d2). Expects an `e` CTE providing (vec_id, v). */
  private val pqSqlCtes: String = (0 until PqM).map { m =>
    val lo = m * PqSubDim + 1
    val hi = (m + 1) * PqSubDim
    val rounds = (1 to PqTrainedRounds).map(r => pqRoundSqlCtes(m, r))
      .mkString(",\n    ")
    s"""sub$m AS (SELECT vec_id, v[$lo:$hi] AS sv FROM e),
    aa0_$m AS (
      SELECT vec_id, sv,
        CAST(('0x' || substr(md5('$PqSalt$m:' || vec_id::VARCHAR), 1, 14))::BIGINT
          % $PqKs AS INTEGER) AS cell
      FROM sub$m),
    $rounds,
    book$m AS (SELECT cell, c FROM bk${PqTrainedRounds}_$m),
    pa$m AS (SELECT vec_id, cell AS code, d2 FROM aa${PqTrainedRounds}_$m)"""
  }.mkString(",\n    ")

  val q79PqEncodeSql: String = {
    val joins = (0 until PqM).map(m => s"JOIN pa$m USING (vec_id)").mkString(" ")
    val codes = (0 until PqM).map(m => s"CAST(pa$m.code AS VARCHAR)").mkString(", ")
    val dist = (0 until PqM).map(m => s"pa$m.d2").mkString(" + ")
    s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    $pqSqlCtes
    SELECT e.vec_id, concat_ws('_', $codes) AS codes, $dist AS distortion
    FROM e $joins
  """
  }

  /** q80: IVF-PQ ADC search — the memory-resident ANN query path at
    * corpus scale: candidates come from the query's coarse hash-IVF cell
    * (q74's codebook) and distance is ASYMMETRIC — exact query subvectors
    * against each candidate's quantized sub-centroids,
    * Σ_m ‖q_m − c_{m,code_m}‖² — so the corpus side of the search only
    * ever touches the compact codes, never the raw floats. Top-3 per
    * query by (adc ASC, cand_id ASC); q75 reports its measured recall
    * next to the exact and uncompressed-IVF paths.
    *
    * Scale shape: the coarse codebook and all M sub-codebooks are
    * broadcast; the candidate join shuffles on the coarse cell only, and
    * the sub-centroid distances reach the pair stream as the classic
    * per-query ADC LOOKUP TABLE — M code→distance maps built once per
    * query (|queries|·M·Ks rows, trivially bounded) broadcast as ONE join
    * on qid, so each candidate costs M map probes instead of M broadcast
    * hash joins over the whole pair stream. */
  def q80PqAdc(spark: SparkSession, sfDir: String): DataFrame =
    // the rk ≤ 3 slice of ONE tracked depth-[[RerankDepth]] ADC pass —
    // identical rows to a private depth-3 pass (same window, same
    // (adc, cand_id) total order; the argument q75's scaladoc has always
    // made and the oracle composes verbatim), but the pass is now the
    // same canonical plan q83 and q75 track, so the ann bench group
    // materializes the ADC stage once for all three
    graft.CachedFrames.track(adcRanked(spark, sfDir, RerankDepth))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("cand_id"), col("rk"), col("adc"))

  /** The ADC candidate generator shared by q80 (top-3 direct) and q83
    * (top-[[RerankDepth]] then exact re-rank): per query, coarse-cell
    * candidates ranked by asymmetric distance over their PQ codes, kept to
    * `depth`. Carries the query vector + norm so the re-rank stage needs
    * no second query-side lookup.
    *
    * Distance is the per-query LUT form: lut_m maps each subspace-m code
    * to ‖q_m − c_{m,code}‖² (a MAP, not a positional array — hash-seeded
    * sub-codebooks may have empty cells, so observed codes are sparse)
    * and a candidate costs Σ_m lut_m[code_m]. Each LUT entry uses the
    * IDENTICAL slice/zip_with/aggregate expression and m-ascending sum
    * order as the former per-pair join form, so results are bitwise
    * unchanged. */
  private def adcRanked(spark: SparkSession, sfDir: String, depth: Int): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    adcRankedWith(e, graft.CachedFrames.track(
      pqTrainedCodebooks(e, PqTrainedRounds)), depth)
  }

  /** [[adcRanked]] against an explicit sub-codebook frame — the seam
    * EmbeddingsSpec uses to measure trained vs hash-seeded books on the
    * identical search path. */
  private[ops] def adcRankedWith(e: DataFrame, books: DataFrame,
      depth: Int): DataFrame = {
    val coarse = probeAssign(e, hashCentroids(e, HashCodebookK), nprobe = 1)
      .drop("probe_rk")
    val codes = pqCodesWide(e, books)
      .select(col("vec_id") +: (0 until PqM).map(m => col(s"code_$m")): _*)
    val db = coarse.select(col("vec_id").as("cand_id"), col("cell"))
      .join(codes.withColumnRenamed("vec_id", "cand_id"), Seq("cand_id"))
    val q = coarse.filter(col("vec_id") < DefaultAnn.knnQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        col("cell"))
    val lut = q
      .select(col("qid"), posexplode(array((0 until PqM).map(m =>
        slice(col("qv"), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "qsv")))
      .join(broadcast(books), Seq("m"))
      .withColumn("d2", expr(
        """aggregate(zip_with(qsv, c, (a, b) -> (a - b) * (a - b)),
             CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""))
      .groupBy(col("qid"))
      .agg(array_sort(collect_list(struct(col("m"), col("cell"), col("d2")))).as("mc"))
      .select(col("qid") +: (0 until PqM).map(m =>
        expr(s"map_from_entries(transform(filter(mc, x -> x.m = $m), " +
          s"x -> struct(x.cell, x.d2)))").as(s"lut_$m")): _*)
    val pairs = q.join(db, Seq("cell")).filter(col("qid") =!= col("cand_id"))
      .join(broadcast(lut), Seq("qid"))
    val dist = (0 until PqM).map(m =>
      expr(s"element_at(lut_$m, code_$m)")).reduce(_ + _)
    val wq = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("cand_id").asc)
    pairs.withColumn("adc", dist)
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= depth)
      .select(col("qid"), col("qv"), col("qn"), col("cand_id"),
        col("rk").cast("int").as("rk"), col("adc"))
  }

  /** ADC re-rank depth: how many code-ranked candidates the exact stage
    * re-scores per query. */
  private[ops] val RerankDepth = 10

  /** q83: the production two-stage ANN pipeline — ADC candidates, exact
    * re-rank. The compressed index proposes [[RerankDepth]] candidates per
    * query by code distance (q80's stage), then ONLY those fetch their raw
    * vectors for an exact-cosine re-rank to the final top-3. Recovers the
    * recall the lossy codes forfeit while touching RerankDepth raw vectors
    * per query instead of a whole cell: by construction
    * recall_pq ≤ recall_rerank ≤ recall_hash per query (truth inside the
    * ADC pool survives exact re-ranking; truth outside the coarse cell is
    * lost to all three) — pinned in EmbeddingsSpec and measured in q75.
    *
    * Scale shape: the re-rank join is |queries|·RerankDepth rows against
    * the vector table — the random-access fetch a production serving tier
    * does from the id-keyed store; everything upstream touches codes only. */
  def q83PqRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    // tracked: the same canonical depth-10 ADC pass q80 slices and q75
    // composes (the ann group's shared candidate artifact)
    rerankStage(e, graft.CachedFrames.track(
      adcRanked(spark, sfDir, RerankDepth)))
  }

  /** The exact re-rank over an [[adcRanked]] candidate frame: fetch just
    * the candidates' raw vectors from `e` and take the per-query
    * exact-cosine top-3. Shared by q83 and q75 (which reuses one cached
    * depth-10 pass for both the pq slice and the re-rank). */
  private def rerankStage(e: DataFrame, ranked: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand_id").asc)
    ranked
      .join(e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cn")), Seq("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rrk", row_number().over(w))
      .filter(col("rrk") <= 3)
      .select(col("qid"), col("cand_id"), col("rrk").cast("int").as("rk"), col("cos"))
  }

  /** DuckDB chain ending in `adcr` (qid, qv, qn, cand_id, adc, rk ≤ depth)
    * — the oracle image of [[adcRanked]]. */
  private def adcRankedSqlCtes(depth: Int): String = {
    val codeCols = (0 until PqM).map(m => s"pa$m.code AS code_$m").mkString(", ")
    val codeJoins = (0 until PqM).map(m => s"JOIN pa$m ON pa$m.vec_id = c.vec_id").mkString(" ")
    val lutJoins = (0 until PqM).map(m => s"JOIN book$m b$m ON b$m.cell = p.code_$m").mkString(" ")
    val dist = (0 until PqM).map { m =>
      val lo = m * PqSubDim + 1
      val hi = (m + 1) * PqSubDim
      s"""list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(list_zip(p.qv[$lo:$hi], b$m.c), z -> (z[1] - z[2]) * (z[1] - z[2]))),
        (acc, x) -> acc + x)"""
    }.mkString(" + ")
    s"""$hashAssignedSqlCtes,
    $pqSqlCtes,
    pairs AS (
      SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qn, c.vec_id AS cand_id, $codeCols
      FROM hassigned q JOIN hassigned c
        ON q.cell = c.cell AND q.vec_id <> c.vec_id
          AND q.vec_id < ${DefaultAnn.knnQueryIds}
      $codeJoins),
    adc AS (
      SELECT p.qid, p.qv, p.qn, p.cand_id, $dist AS adc
      FROM pairs p $lutJoins),
    adcr AS (
      SELECT qid, qv, qn, cand_id, adc, CAST(rk AS INTEGER) AS rk FROM (
        SELECT qid, qv, qn, cand_id, adc,
          row_number() OVER (PARTITION BY qid ORDER BY adc ASC, cand_id ASC) AS rk
        FROM adc) WHERE rk <= $depth)"""
  }

  val q80PqAdcSql: String = s"""
    WITH ${adcRankedSqlCtes(3)}
    SELECT qid, cand_id, rk, adc FROM adcr
  """

  val q83PqRerankSql: String = s"""
    WITH ${adcRankedSqlCtes(RerankDepth)},
    rer AS (
      SELECT a.qid, a.cand_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.qv, cv.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (a.qn * cv.nrm) AS cos
      FROM adcr a JOIN n cv ON cv.vec_id = a.cand_id)
    SELECT qid, cand_id, CAST(rrk AS INTEGER) AS rk, cos FROM (
      SELECT qid, cand_id, cos,
        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand_id ASC) AS rrk
      FROM rer) WHERE rrk <= 3
  """

  /** q125: K-NEAREST-NEIGHBOR CLASSIFICATION — leave-one-out majority vote
    * of the [[DefaultAnn.topK]] nearest neighbors' labels per query vector
    * (ties break by label ascending — a total order), with the truth column
    * alongside. The standard embedding-space auto-labeler: given a seed set
    * of labeled vectors, label the rest by their neighborhood — and, run
    * leave-one-out over the seed set itself as here, the standard measured
    * health check of the label geometry before trusting it.
    *
    * Scale shape: the neighbor list is the RETRIEVAL layer's output — here
    * the q29 brute pass (bounded query batch, the oracle-cost contract);
    * production swaps in the IVF/PQ candidate generator (q46/q83) and the
    * plan below is unchanged: the label join broadcasts the (vec_id, label)
    * dimension, the vote is a k-row-per-query map-side-combinable rollup,
    * and the winner is one WindowGroupLimit over ≤ queries × labels rows.
    * Nothing downstream of retrieval ever touches the corpus. */
  def q125KnnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = Tables.parallelized(Tables(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("label"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("n_votes").desc, col("clabel").asc)
    q29KnnBrute(spark, sfDir)
      .join(broadcast(labels.select(col("vec_id").as("id2"),
        col("label").as("clabel"))), Seq("id2"))
      .groupBy(col("id1").as("qid"), col("clabel"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(broadcast(labels.select(col("vec_id").as("qid"),
        col("label").as("true_label"))), Seq("qid"))
      .select(col("qid"), col("true_label"), col("clabel").as("pred_label"),
        col("n_votes"), (col("clabel") === col("true_label")).as("correct"))
  }

  val q125KnnClassifySql: String = s"""
    WITH nb AS (
      SELECT id1, id2 FROM ($q29KnnBruteSql)),
    v AS (
      SELECT nb.id1 AS qid, e.label AS clabel, count(*) AS n_votes
      FROM nb JOIN embeddings e ON nb.id2 = e.vec_id
      GROUP BY 1, 2),
    wn AS (
      SELECT qid, clabel, n_votes,
        row_number() OVER (PARTITION BY qid
          ORDER BY n_votes DESC, clabel ASC) AS rk
      FROM v)
    SELECT w.qid, e.label AS true_label, w.clabel AS pred_label, w.n_votes,
      w.clabel = e.label AS correct
    FROM wn w JOIN embeddings e ON w.qid = e.vec_id
    WHERE w.rk = 1
  """

  /** q128 tuning: greedy rounds AFTER the seed — coreset size is
    * [[CoresetRounds]] + 1. */
  val CoresetRounds = 8

  /** q128: K-CENTER CORESET selection (greedy farthest-point traversal,
    * Gonzalez 1985; the data-selection shape of Sener & Savarese 2018) —
    * starting from the lowest vec_id, repeatedly pick the vector FARTHEST
    * (max cosine distance) from everything chosen so far. The selected
    * rows, in order, with each pick's distance-at-selection: a monotone
    * non-increasing sequence that IS the covering-radius curve — the
    * "how much of the space do N exemplars cover" report a data-pruning
    * pipeline reads before fixing its budget.
    *
    * Scale shape: the classic incremental formulation, TRAVERSED PER CELL —
    * the corpus is pre-assigned to the q46 coarse cells and cached ONCE;
    * each round updates the running min-distance with a single
    * `least(md, dist-to-newest-center)` column (distance to the ONE new
    * center, not the whole chosen set) and takes the argmax as a map-side
    * `max_by` PER CELL — every cell's frame is scanned independently in
    * parallel, no global TakeOrdered merge over the corpus — then the
    * global winner is the max of the ≤ |cells| cell winners (max of maxes:
    * byte-identical to the global argmax, same (md desc, vec_id asc)
    * tie-break, spec-pinned on a crafted 2-cell fixture). Per-round driver
    * traffic is ≤ |cells| rows (codebook-bounded — the q97 argmax
    * contract), so R rounds cost R cell-parallel passes over the cached
    * frame; no pairwise distance matrix ever exists. Distances are the
    * fixed-order dot-product fold, so the oracle (same chain, unrolled
    * CTEs — cells don't change the chosen set) matches bitwise. */
  def q128KcenterCoreset(spark: SparkSession, sfDir: String): DataFrame =
    kcenterOn(graft.CachedFrames.track(assignedCells(spark, sfDir)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))))

  /** The greedy loop over ANY cached (vec_id, v, nrm, cell) frame —
    * fixture-testable. The `cell` column only shapes the argmax
    * aggregation; the selection is cell-independent. */
  private[graft] def kcenterOn(base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    def distTo(cv: Seq[Double], cn: Double) =
      lit(1.0) - dot(col("v"), typedLit(cv)) / (col("nrm") * lit(cn))
    // Row-stored arrays come back as mutable.ArraySeq — normalize once
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getAs[scala.collection.Seq[Double]]("v").toSeq
    val seed = base.orderBy(col("vec_id").asc).limit(1).collect()(0)
    var chosenIds = List(seed.getAs[Long]("vec_id"))
    var picks = List((0, seed.getAs[Long]("vec_id"), None: Option[Double]))
    var md = distTo(vecOf(seed), seed.getAs[Double]("nrm"))
    for (r <- 1 to CoresetRounds) {
      // per-cell winners: partial max_by combines map-side, one row per
      // cell reaches the driver; (md, -vec_id) max == (md desc, vec_id asc)
      val winners = base.filter(!col("vec_id").isin(chosenIds: _*))
        .select(col("cell"), col("vec_id"), col("v"), col("nrm"), md.as("md"))
        .groupBy(col("cell"))
        .agg(max_by(struct(col("md"), col("vec_id"), col("v"), col("nrm")),
          struct(col("md"), (-col("vec_id")).as("nid"))).as("w"))
        .select(col("w.md"), col("w.vec_id"), col("w.v"), col("w.nrm"))
        .collect()
      val c = winners.minBy(r0 =>
        (-r0.getAs[Double]("md"), r0.getAs[Long]("vec_id")))
      chosenIds ::= c.getAs[Long]("vec_id")
      picks ::= ((r, c.getAs[Long]("vec_id"), Some(c.getAs[Double]("md"))))
      md = least(md, distTo(vecOf(c), c.getAs[Double]("nrm")))
    }
    import spark.implicits._
    picks.reverse.toDF("sel_round", "vec_id", "cov_dist")
  }

  /** The q128 oracle derives the identical chain: round k's min-distance
    * frame is round k−1's, `least`-folded with the distance to round k−1's
    * pick — same association order as the Spark column, so every distance
    * is bitwise-equal. */
  val q128KcenterCoresetSql: String = {
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |  list_transform(list_zip($a, $b), z -> z[1] * z[2])),
         |  (acc, x) -> acc + x)""".stripMargin
    val rounds = (1 to CoresetRounds).map { k =>
      val (prev, sel) = (if (k == 1) "d1" else s"d$k", s"s$k")
      val mk = if (k == 1)
        s"""d1 AS (
           |  SELECT b.vec_id, b.v, b.nrm,
           |    1.0 - ${dot("b.v", "c.v")} / (b.nrm * c.nrm) AS md
           |  FROM base b, c0 c WHERE b.vec_id <> c.vec_id),""".stripMargin
      else
        s"""d$k AS (
           |  SELECT d.vec_id, d.v, d.nrm,
           |    least(d.md, 1.0 - ${dot("d.v", "s.v")} / (d.nrm * s.nrm)) AS md
           |  FROM d${k - 1} d, s${k - 1} s WHERE d.vec_id <> s.vec_id),""".stripMargin
      s"""$mk
         |$sel AS (
         |  SELECT vec_id, v, nrm, md FROM $prev
         |  ORDER BY md DESC, vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to CoresetRounds)
      .map(k => s"SELECT $k AS sel_round, vec_id, md AS cov_dist FROM s$k")
      .mkString("\n    UNION ALL ")
    s"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_transform(embedding, x -> x::DOUBLE),
            x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM embeddings),
    c0 AS (SELECT vec_id, v, nrm FROM base ORDER BY vec_id ASC LIMIT 1),
    $rounds
    SELECT CAST(sel_round AS INTEGER) AS sel_round, vec_id, cov_dist FROM (
      SELECT 0 AS sel_round, vec_id, CAST(NULL AS DOUBLE) AS cov_dist FROM c0
      UNION ALL $out)
    """
  }

  /** q130 fixed-point grain: component values land on a 1e-5 lattice, so
    * per-dimension sums are exact BIGINTs (and small enough that the
    * BIGINT→DOUBLE casts below are exact — see the scaladoc). */
  private val DimStatsScale = 1e5

  /** q130: per-DIMENSION embedding statistics — n/mean/variance for each of
    * the [[Dim]] components, the embedding-health report (dead dimensions,
    * runaway dimensions, mis-scaled encoders) a vector pipeline runs before
    * trusting any distance in qs 29-89. Components quantize to a 1e-5
    * lattice first, so the cross-row sums are order-insensitive BIGINTs —
    * the q31 fixed-point idiom with integer sums of squares — and
    * mean/variance are then derived by IEEE ops on exactly-cast inputs
    * (sums stay far below 2^53 at every test SF), bitwise-portable.
    *
    * Scale shape: ONE corpus scan, one posexplode bounded by rows × [[Dim]],
    * a map-side-combinable groupBy collapsing to exactly [[Dim]] rows.
    * BIGINT headroom at 100 TB: |x| ≲ 10 ⇒ x²-scaled terms ≲ 1e12, so ~1e6
    * rows per partial before a BIGINT could overflow — the DECIMAL(38,0)
    * variant of q31 is the swap-in if an encoder emits larger components. */
  def q130DimStats(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir)
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("dim"),
        expr(s"CAST(floor(x * $DimStatsScale) AS BIGINT)").as("s"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("s1"),
        sum(col("s") * col("s")).as("s2"))
      .withColumn("mean_x",
        col("s1").cast("double") / (lit(DimStatsScale) * col("n").cast("double")))
      .withColumn("var_x",
        col("s2").cast("double")
          / (lit(DimStatsScale * DimStatsScale) * col("n").cast("double"))
          - col("mean_x") * col("mean_x"))
      .select(col("dim"), col("n"), col("s1"), col("s2"), col("mean_x"),
        col("var_x"))

  val q130DimStatsSql: String = s"""
    WITH ax AS (
      SELECT CAST(i.idx - 1 AS INTEGER) AS dim,
        CAST(floor(embedding[i.idx]::DOUBLE * $DimStatsScale) AS BIGINT) AS s
      FROM embeddings,
        LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS idx) i)
    SELECT dim, count(*) AS n,
      CAST(sum(s) AS BIGINT) AS s1, CAST(sum(s * s) AS BIGINT) AS s2,
      CAST(sum(s) AS BIGINT)::DOUBLE / ($DimStatsScale * count(*)::DOUBLE)
        AS mean_x,
      CAST(sum(s * s) AS BIGINT)::DOUBLE
          / ($DimStatsScale * $DimStatsScale * count(*)::DOUBLE)
        - (CAST(sum(s) AS BIGINT)::DOUBLE / ($DimStatsScale * count(*)::DOUBLE))
          * (CAST(sum(s) AS BIGINT)::DOUBLE / ($DimStatsScale * count(*)::DOUBLE))
        AS var_x
    FROM ax GROUP BY dim
  """

  // ───────── Margin-based mining + matryoshka truncation (round 11) ─────────

  /** q135 tuning: candidate depth for the margin denominator and the
    * admission threshold. */
  val MarginK = 4
  val MarginTau = 1.05

  /** q135: MARGIN-BASED NEAREST-NEIGHBOR MINING — the ratio-margin criterion
    * of Artetxe & Schwenk (ACL 2019), the scoring rule behind LASER/CCMatrix
    * bitext mining. The corpus splits into an even-id "source" side (bounded
    * to 2·knnQueryIds, the q29 batch idiom) and an odd-id "target" side;
    * each source row takes its best-cosine target, scored by
    * margin = cos(best) / mean(top-[[MarginK]] cos). A best neighbor that
    * barely exceeds its local cosine floor is a hubness artifact, not a
    * translation pair — the ratio margin normalizes exactly that away,
    * which no absolute cosine threshold can. admitted = margin ≥
    * [[MarginTau]].
    *
    * Float parity: the top-k list is collected IN RANK ORDER and the
    * denominator folds it left-to-right (Spark `aggregate` over the
    * rank-sorted array ≡ DuckDB `list_reduce` over `list(... ORDER BY rk)`),
    * so every double matches bitwise.
    *
    * Scale shape: the brute pass is the bounded-batch baseline (queries ×
    * target side, never corpus²); the margin itself is a pure function of
    * each query's top-k list, so at corpus scale the feed swaps to the
    * IVF/ADC retrieval (q80/q83) unchanged. The rollup after the rank
    * filter carries ≤ [[MarginK]] rows per query. */
  def q135BitextMargin(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame = {
    // persist: source and target sides both read the normed vectors
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val a = e.filter(col("vec_id") % 2 === 0 &&
        col("vec_id") < 2L * cfg.knnQueryIds)
      .select(col("vec_id").as("src_id"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("v").as("v2"), col("nrm").as("n2"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id").asc)
    a.crossJoin(b)
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= MarginK)
      .groupBy(col("src_id"))
      // struct sorts by its first field, so sort_array puts rank order back
      // after the shuffle — the fold below is deterministic left-to-right
      .agg(sort_array(collect_list(
        struct(col("rk"), col("tgt_id"), col("cos")))).as("arr"))
      .select(col("src_id"),
        col("arr").getItem(0).getField("tgt_id").as("tgt_id"),
        col("arr").getItem(0).getField("cos").as("cos_top1"),
        expr("aggregate(arr, CAST(0 AS DOUBLE), (a, x) -> a + x.cos)" +
          " / CAST(size(arr) AS DOUBLE)").as("mean_topk"))
      .withColumn("margin", col("cos_top1") / col("mean_topk"))
      .withColumn("admitted", col("margin") >= MarginTau)
  }

  val q135BitextMarginSql: String = s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    p AS (
      SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (a.nrm * b.nrm) AS cos
      FROM n a, n b
      WHERE a.vec_id % 2 = 0 AND a.vec_id < ${2 * DefaultAnn.knnQueryIds}
        AND b.vec_id % 2 = 1),
    r AS (
      SELECT src_id, tgt_id, cos,
        row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id ASC) AS rk
      FROM p),
    t AS (
      SELECT src_id, list(tgt_id ORDER BY rk ASC) AS tl,
        list(cos ORDER BY rk ASC) AS cl
      FROM r WHERE rk <= $MarginK GROUP BY 1),
    m AS (
      SELECT src_id, tl[1] AS tgt_id, cl[1] AS cos_top1,
        list_reduce(list_prepend(0.0::DOUBLE, cl), (a, x) -> a + x)
          / CAST(len(cl) AS DOUBLE) AS mean_topk
      FROM t)
    SELECT src_id, tgt_id, cos_top1, mean_topk,
      cos_top1 / mean_topk AS margin,
      cos_top1 / mean_topk >= $MarginTau AS admitted
    FROM m
  """

  /** q136 tuning: prefix truncation levels and the recall depth. */
  val MatryoshkaDims: Seq[Int] = Seq(8, 16, 32)
  val MatryoshkaK = 5

  /** q136: MATRYOSHKA TRUNCATION RECALL — recall@[[MatryoshkaK]] of
    * brute-force search run on DIMENSION PREFIXES (first 8/16/32 of the 64
    * components) against the full-dimension truth, over the bounded query
    * batch. The measured curve behind matryoshka-representation serving
    * (Kusupati et al. 2022): if recall@5 at 16 dims is acceptable, the ANN
    * index stores a quarter of the bytes and the distance kernel does a
    * quarter of the work — this query is the evidence for that decision,
    * the dimension-axis sibling of q75's index-structure scoreboard.
    *
    * Scale shape: ONE queries×corpus pass computes all four prefix cosines
    * (the truth IS the d=64 slice of the same stacked frame — no second
    * crossJoin), one window ranks per (d, query), and everything after the
    * rank filter is ≤ 4·|queries|·k rows — that bounded frame is the only
    * thing cached. Prefix VECTORS and norms are materialized per ROW in the
    * cached frame, so the pair loop does only dot products — no
    * slice-allocation per pair per level — and the d=[[Dim]] level reuses
    * `v`/`nrm` directly (slice(v,1,Dim) is v; vecs' nrm is the same
    * fixed-order fold, so the cosines are bitwise-unchanged). */
  def q136MatryoshkaRecall(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame = {
    val dims = MatryoshkaDims :+ Dim
    // per-row prefix vectors + norms, then one pass over query×corpus pairs
    val e = graft.CachedFrames.track(MatryoshkaDims.foldLeft(vecs(spark, sfDir)) {
      (df, d) => df.withColumn(s"pv$d", expr(s"slice(v, 1, $d)"))
        .withColumn(s"nrm$d", sqrt(dot(col(s"pv$d"), col(s"pv$d"))))
    })
    val a = e.filter(col("vec_id") < cfg.knnQueryIds)
      .select(col("vec_id").as("id1") +: col("v").as("v1") +: col("nrm").as("an") +:
        MatryoshkaDims.flatMap(d => Seq(col(s"pv$d").as(s"apv$d"),
          col(s"nrm$d").as(s"an$d"))): _*)
    val b = e.select(col("vec_id").as("id2") +: col("v").as("v2") +:
      col("nrm").as("bn") +:
      MatryoshkaDims.flatMap(d => Seq(col(s"pv$d").as(s"bpv$d"),
        col(s"nrm$d").as(s"bn$d"))): _*)
    val stacked = a.crossJoin(b).filter(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"), explode(array(dims.map { d =>
        if (d == Dim)
          struct(lit(d).as("d"),
            (dot(col("v1"), col("v2")) / (col("an") * col("bn"))).as("cos"))
        else
          struct(lit(d).as("d"),
            (dot(col(s"apv$d"), col(s"bpv$d"))
              / (col(s"an$d") * col(s"bn$d"))).as("cos"))
      }: _*)).as("dc"))
      .select(col("id1"), col("id2"), col("dc.d").as("d"), col("dc.cos").as("cos"))
    val w = Window.partitionBy(col("d"), col("id1"))
      .orderBy(col("cos").desc, col("id2").asc)
    // cached: the bounded post-rank frame feeds the truth roster AND the
    // per-d hit joins — untracked, the queries×corpus pass re-runs per use
    val ranked = graft.CachedFrames.track(
      stacked.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= MatryoshkaK)
        .select(col("d"), col("id1"), col("id2")))
    val truth = ranked.filter(col("d") === Dim).select(col("id1"), col("id2"))
    val tn = truth.agg(count(lit(1)).as("n_truth"))
    val hits = ranked.filter(col("d") =!= Dim).join(truth, Seq("id1", "id2"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_hits"))
    spark.range(1)
      .select(explode(typedLit(MatryoshkaDims)).as("d"))
      .join(hits, Seq("d"), "left")
      .select(col("d"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .crossJoin(broadcast(tn))
      .withColumn("recall_at_k",
        col("n_hits").cast("double") / col("n_truth").cast("double"))
  }

  val q136MatryoshkaRecallSql: String = {
    val allDims = (MatryoshkaDims :+ Dim).map(d => s"($d)").mkString(", ")
    val outDims = MatryoshkaDims.map(d => s"($d)").mkString(", ")
    s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    dd AS (SELECT * FROM (VALUES $allDims) AS vals(d)),
    pn AS (
      SELECT vec_id, dd.d, v[1:dd.d] AS pv,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v[1:dd.d], x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e, dd),
    p AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2, a.d,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.pv, b.pv), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (a.nrm * b.nrm) AS cos
      FROM pn a JOIN pn b ON a.d = b.d AND a.vec_id <> b.vec_id
      WHERE a.vec_id < ${DefaultAnn.knnQueryIds}),
    r AS (
      SELECT id1, id2, d,
        row_number() OVER (PARTITION BY d, id1 ORDER BY cos DESC, id2 ASC) AS rk
      FROM p),
    k AS (SELECT d, id1, id2 FROM r WHERE rk <= $MatryoshkaK),
    t AS (SELECT id1, id2 FROM k WHERE d = $Dim),
    tn AS (SELECT count(*) AS n_truth FROM t),
    h AS (
      SELECT k.d, count(*) AS n_hits
      FROM k JOIN t ON k.id1 = t.id1 AND k.id2 = t.id2
      WHERE k.d <> $Dim GROUP BY 1),
    od AS (SELECT * FROM (VALUES $outDims) AS vals(d))
    SELECT CAST(od.d AS INTEGER) AS d,
      CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
      CAST(tn.n_truth AS BIGINT) AS n_truth,
      CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(tn.n_truth AS DOUBLE)
        AS recall_at_k
    FROM od LEFT JOIN h ON od.d = h.d, tn
  """
  }

  /** q143 tuning: query batch, candidate pool depth, picks per query, and
    * the MMR trade-off weights. λ and (1−λ) are BOTH written as literal
    * constants — `1.0 - 0.7` is 0.30000000000000004 in IEEE, so deriving
    * one from the other would silently de-sync the engines. */
  val MmrQueryIds = 8L
  val MmrPoolK = 20
  val MmrSelectK = 5
  val MmrLambda = 0.7
  val MmrLambdaC = 0.3

  /** q143: MAXIMAL MARGINAL RELEVANCE selection (Carbonell & Goldstein
    * 1998) — for each query, greedily pick [[MmrSelectK]] of its top-
    * [[MmrPoolK]] candidates by score = λ·relevance − (1−λ)·max-sim-to-
    * already-picked. THE diverse-retrieval move a RAG/few-shot pipeline
    * runs after ANN: q29 returns the most similar documents, which at high
    * duplication are near-copies of each other; MMR keeps relevance while
    * forcing coverage (pick 2 is the best candidate that is NOT redundant
    * with pick 1). Rounds and ties ((score desc, cand_id asc)) are total
    * orders; every similarity is the fixed-order dot fold, so the unrolled
    * oracle matches bitwise.
    *
    * Scale shape: the pool stage is ONE bounded-batch pass (queries ×
    * corpus — the q29 contract; an IVF/ADC feed swaps in) with the
    * rank-filter pushed into a WindowGroupLimit, and everything after it
    * is ≤ |queries|·[[MmrPoolK]] rows, CACHED once. Each greedy round is
    * the q128 shape: per-query `max_by` argmax (map-side, ≤ |queries| rows
    * to the driver), one broadcast of the |queries| new picks back, and an
    * incremental greatest(ms, sim-to-newest) column — never a pairwise
    * matrix, never a corpus re-scan.
    *
    * Plan pinning: the POOL stage ([[mmrPool]]) is pinned in PlanSpec (one
    * bounded-batch BroadcastNestedLoopJoin, rank filter as WindowGroupLimit,
    * no CartesianProduct). The greedy rounds themselves are UNPINNABLE as
    * one executed plan by construction: each round is a separate action
    * (an argmax collect + a broadcast re-join onto the cached pool), so no
    * single physical plan exists to assert on — their scale contract is the
    * value-level bitwise oracle plus the ≤|queries|-rows-per-round collect
    * bound documented above. */
  /** q143's pool stage as its own seam — the ONLY corpus-sized pass in the
    * query (bounded query batch × corpus, rank-filtered to MmrPoolK), and
    * the part of q143 with a single executed plan PlanSpec can pin. */
  private[graft] def mmrPool(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val q = e.filter(col("vec_id") < MmrQueryIds)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= MmrQueryIds)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("cand_id").asc)
    q.crossJoin(c)
      .withColumn("rel", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= MmrPoolK)
      .select(col("qid"), col("cand_id"), col("cv"), col("cn"), col("rel"))
  }

  def q143MmrSelect(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame = {
    // cached: the bounded pool is the only frame the greedy rounds touch
    val pool = graft.CachedFrames.track(mmrPool(spark, sfDir))
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getAs[scala.collection.Seq[Double]]("cv").toSeq
    import spark.implicits._
    var cand = pool.withColumn("ms", lit(0.0))
    var picks = List.empty[(Long, Int, Long, Double, Double)]
    for (r <- 1 to MmrSelectK) {
      val winners = cand
        .withColumn("score",
          lit(MmrLambda) * col("rel") - lit(MmrLambdaC) * col("ms"))
        .groupBy(col("qid"))
        .agg(max_by(
          struct(col("score"), col("cand_id"), col("cv"), col("cn"), col("rel")),
          struct(col("score"), (-col("cand_id")).as("nid"))).as("w"))
        .select(col("qid"), col("w.cand_id").as("cand_id"), col("w.cv").as("cv"),
          col("w.cn").as("cn"), col("w.rel").as("rel"), col("w.score").as("score"))
        .collect()
      picks = picks ++ winners.map(row => (row.getAs[Long]("qid"), r,
        row.getAs[Long]("cand_id"), row.getAs[Double]("rel"),
        row.getAs[Double]("score")))
      val sel = winners.toSeq.map(row => (row.getAs[Long]("qid"),
        row.getAs[Long]("cand_id"), vecOf(row), row.getAs[Double]("cn")))
        .toDF("sqid", "sid", "sv", "sn")
      cand = cand.join(broadcast(sel), col("qid") === col("sqid"))
        .filter(col("cand_id") =!= col("sid"))
        .withColumn("ms", greatest(col("ms"),
          dot(col("cv"), col("sv")) / (col("cn") * col("sn"))))
        .drop("sqid", "sid", "sv", "sn")
    }
    picks.toDF("qid", "sel_round", "cand_id", "rel", "score")
      .select(col("qid"), col("sel_round"), col("cand_id"), col("rel"),
        col("score"))
  }

  /** The q143 oracle unrolls the identical greedy rounds. */
  val q143MmrSelectSql: String = {
    def dotSql(a: String, b: String) =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |  list_transform(list_zip($a, $b), z -> z[1] * z[2])),
         |  (acc, x) -> acc + x)""".stripMargin
    val rounds = (1 to MmrSelectK).map { k =>
      val prev = s"c${k - 1}"
      s"""s$k AS (
         |  SELECT qid, cand_id, cv, cn, rel,
         |    $MmrLambda * rel - $MmrLambdaC * ms AS score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY $MmrLambda * rel - $MmrLambdaC * ms DESC, cand_id ASC)
         |      AS rk FROM $prev) WHERE rk = 1),
         |c$k AS (
         |  SELECT c.qid, c.cand_id, c.cv, c.cn, c.rel,
         |    greatest(c.ms, ${dotSql("c.cv", "s.cv")} / (c.cn * s.cn)) AS ms
         |  FROM $prev c JOIN s$k s
         |    ON c.qid = s.qid AND c.cand_id <> s.cand_id)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MmrSelectK)
      .map(k => s"SELECT qid, $k AS sel_round, cand_id, rel, score FROM s$k")
      .mkString("\n    UNION ALL ")
    s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_transform(embedding, x -> x::DOUBLE),
            x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM embeddings),
    p AS (
      SELECT q.vec_id AS qid, c.vec_id AS cand_id, c.v AS cv, c.nrm AS cn,
        ${dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS rel
      FROM e q JOIN e c
        ON q.vec_id < $MmrQueryIds AND c.vec_id >= $MmrQueryIds),
    c0 AS (
      SELECT qid, cand_id, cv, cn, rel, 0.0::DOUBLE AS ms FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY rel DESC, cand_id ASC) AS rk FROM p)
      WHERE rk <= $MmrPoolK),
    $rounds
    SELECT qid, CAST(sel_round AS INTEGER) AS sel_round, cand_id, rel, score
    FROM ($out)
  """
  }

  /** q158 tuning: quantization scale (2^20) / matrix cap (2^31) /
    * normalization target (2^20) / power rounds. */
  private[ops] val GramQScale = 1L << 20
  private[ops] val GramMCap = 1L << 31
  private[graft] val GramRounds = 4

  /** q158: TOP PRINCIPAL DIRECTION of the embedding set by fixed-point
    * POWER ITERATION on the (uncentered) Gram matrix M = Σ q·qᵀ of the
    * globally-quantized vectors q = ⌊x·2²⁰ + ½⌋ — the direction embedding
    * drift, anisotropy and whitening diagnostics all start from (q130's
    * per-dim stats can't see cross-dim structure; this is the first
    * eigenvector they're missing). Quantize-then-iterate keeps EVERY step
    * integer (the q62 discipline): the Gram sums, the cap-downscale, each
    * matvec, each renormalization — so both engines agree bitwise and the
    * only doubles are the final component divisions. Negative values make
    * floor-vs-truncate division diverge between engines, so every
    * downscale is the sign-split `sign(x)·(|x| DIV d)` — identical
    * truncation by construction.
    *
    * Bounds: |q| ≤ 2²⁰ for unit-scale inputs, the cap-divisor D =
    * max(1, max|M| DIV 2³¹ + 1) forces |m| < 2³¹, and v renormalizes to
    * ~2²⁰ each round, so every matvec term is ≤ 2⁵¹·d — far inside 2⁶³ at
    * any corpus size (the raw Gram sums need DECIMAL past n ≈ 2⁴¹ rows;
    * gate corpora are orders below).
    *
    * Scale shape: the Gram build is ONE scan — each row explodes its own
    * d² index pairs and the 4096-key aggregation combines map-side, so
    * the exchange carries d²·partitions rows and the corpus never
    * shuffles. Every round is a d²-row ⋈ broadcast d-row matvec + a 1-row
    * max broadcast; work after the scan is independent of n. */
  def q158GramPower(spark: SparkSession, sfDir: String): DataFrame =
    gramPowerOn(vecs(spark, sfDir).select(col("v")))

  /** The quantize → Gram → iterate core over ANY frame with a double-array
    * column `v` — fixture-testable. */
  private[graft] def gramPowerOn(rows: DataFrame): DataFrame = {
    val s = GramQScale
    def signDiv(x: String, d: String) =
      expr(s"CASE WHEN $x < 0 THEN -((-$x) DIV $d) ELSE $x DIV $d END")
    graft.functions.GraftFunctions.register(rows.sparkSession)
    val gram = graft.CachedFrames.track {
      // the flattened self outer product runs as the native codegen
      // expression (graft.functions.OuterProductFlat) — the nested-HOF
      // struct form was interpreted per pair and dominated the suite
      val raw = rows
        .select(expr(
          s"transform(v, x -> CAST(floor(x * $s.0D + 0.5D) AS BIGINT))").as("q"))
        .select(expr("size(q)").as("d"),
          posexplode(call_function("outer_product_flat", col("q")))
            .as(Seq("pos", "p")))
        .select(expr("CAST(pos DIV d AS INT)").as("j"),
          expr("CAST(pos % d AS INT)").as("k"), col("p"))
        .groupBy(col("j"), col("k")).agg(sum(col("p")).as("m_raw"))
      val cap = raw.agg(
        expr(s"greatest(1L, max(abs(m_raw)) DIV $GramMCap + 1L)").as("d"))
      raw.crossJoin(broadcast(cap))
        .select(col("j"), col("k"), signDiv("m_raw", "d").as("m"))
    }
    // every round's u feeds TWO consumers (its max and the next v), and v
    // feeds the next round twice more — uncut, the plan replays 2^R-fold
    // (the q156 lineage lesson; measured 47 s cold at sf0.1). Each round's
    // frames are d rows — localCheckpoint them for constant replay cost.
    var v = gram.select(col("j").as("dim")).distinct()
      .withColumn("v", lit(s))
      .localCheckpoint()
    for (_ <- 1 to GramRounds) {
      val u = gram
        .join(broadcast(v.select(col("dim").as("k"), col("v").as("vk"))),
          Seq("k"))
        .groupBy(col("j")).agg(sum(col("m") * col("vk")).as("u"))
        .localCheckpoint()
      val d = u.agg(expr(s"greatest(1L, max(abs(u)) DIV $s)").as("d"))
      v = u.crossJoin(broadcast(d))
        .select(col("j").as("dim"), signDiv("u", "d").as("v"))
        .localCheckpoint()
    }
    val nrm = v.agg(sqrt(sum(col("v") * col("v")).cast("double")).as("nv"))
    v.crossJoin(broadcast(nrm))
      .select(col("dim"), col("v").as("v_i"),
        (col("v").cast("double") / col("nv")).as("component"))
  }

  /** The q158 oracle unrolls the identical integer rounds. */
  val q158GramPowerSql: String = {
    val s = GramQScale
    def signDiv(x: String, d: String) =
      s"CASE WHEN $x < 0 THEN -((-$x) // $d) ELSE $x // $d END"
    val rounds = (1 to GramRounds).map { r =>
      s"""u$r AS (
         |  SELECT m.j AS dim, CAST(sum(m.m * v.v) AS BIGINT) AS u
         |  FROM m JOIN v${r - 1} v ON m.k = v.dim GROUP BY 1),
         |d$r AS (SELECT greatest(1, max(abs(u)) // $s) AS d FROM u$r),
         |v$r AS (SELECT dim, ${signDiv("u", "d")} AS v FROM u$r, d$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""
    WITH e AS (
      SELECT list_transform(embedding,
        x -> CAST(floor(x::DOUBLE * $s.0 + 0.5) AS BIGINT)) AS q
      FROM embeddings),
    pairs AS (
      SELECT CAST(j.idx - 1 AS INTEGER) AS j, CAST(k.idx - 1 AS INTEGER) AS k,
        CAST(sum(q[j.idx] * q[k.idx]) AS BIGINT) AS m_raw
      FROM e,
        LATERAL (SELECT unnest(generate_series(1, len(q))) AS idx) j,
        LATERAL (SELECT unnest(generate_series(1, len(q))) AS idx) k
      GROUP BY 1, 2),
    dd AS (
      SELECT greatest(1, max(abs(m_raw)) // $GramMCap + 1) AS d FROM pairs),
    m AS (
      SELECT j, k, ${signDiv("m_raw", "d")} AS m FROM pairs, dd),
    v0 AS (SELECT DISTINCT j AS dim, CAST($s AS BIGINT) AS v FROM m),
    $rounds
    SELECT v.dim, CAST(v.v AS BIGINT) AS v_i,
      CAST(v.v AS DOUBLE) / nn.nv AS component
    FROM v$GramRounds v,
      (SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) AS nv FROM v$GramRounds) nn
    """
  }

  /** q159: MUTUAL NEAREST NEIGHBORS across the even/odd sides — a pair
    * survives only when each endpoint is the OTHER's single best cosine
    * match (tie-break: lower id). The reciprocity filter CCMatrix-style
    * mining applies after q135's margin: a hub vector that is "everyone's
    * best match" fails reciprocity against all but one partner, so hubness
    * false pairs drop without any threshold to tune. Both sides are
    * bounded to the q29 batch contract; at corpus scale the pair feed
    * swaps to IVF/ADC retrieval (q80/q83) unchanged — reciprocity is a
    * pure function of the two argmax tables.
    *
    * Float parity: per-pair cosine is the q29 fold; the argmax is a
    * rank-1 window with a total (cos DESC, id ASC) order, so both engines
    * pick identical partners bitwise.
    *
    * Scale shape: ONE bounded-batch cross pass (cached) feeds BOTH
    * direction argmaxes as rank-1 WindowGroupLimits; the reciprocity
    * check is an equi-join of two ≤|side|-row argmax tables. */
  def q159MutualNn(spark: SparkSession, sfDir: String,
      cfg: AnnConfig = DefaultAnn): DataFrame =
    mutualNnOn(graft.CachedFrames.track(vecs(spark, sfDir)), cfg)

  /** The reciprocity core over ANY (vec_id, v, nrm) frame —
    * fixture-testable. */
  private[graft] def mutualNnOn(e: DataFrame, cfg: AnnConfig): DataFrame = {
    val a = e.filter(col("vec_id") % 2 === 0 &&
        col("vec_id") < 2L * cfg.knnQueryIds)
      .select(col("vec_id").as("src_id"), col("v").as("v1"), col("nrm").as("n1"))
    val b = e.filter(col("vec_id") % 2 === 1 &&
        col("vec_id") < 2L * cfg.knnQueryIds)
      .select(col("vec_id").as("tgt_id"), col("v").as("v2"), col("nrm").as("n2"))
    val pairs = graft.CachedFrames.track(a.crossJoin(b)
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .select(col("src_id"), col("tgt_id"), col("cos")))
    val wA = Window.partitionBy(col("src_id"))
      .orderBy(col("cos").desc, col("tgt_id").asc)
    val wB = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos").desc, col("src_id").asc)
    val bestA = pairs.withColumn("rk", row_number().over(wA))
      .filter(col("rk") === 1).select(col("src_id"), col("tgt_id"), col("cos"))
    val bestB = pairs.withColumn("rk", row_number().over(wB))
      .filter(col("rk") === 1)
      .select(col("src_id").as("b_src"), col("tgt_id").as("b_tgt"))
    bestA.join(bestB,
        col("src_id") === col("b_src") && col("tgt_id") === col("b_tgt"))
      .select(col("src_id"), col("tgt_id"), col("cos"))
  }

  val q159MutualNnSql: String = s"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
    n AS (
      SELECT vec_id, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    p AS (
      SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
        list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(list_zip(a.v, b.v), z -> z[1] * z[2])), (acc, x) -> acc + x)
          / (a.nrm * b.nrm) AS cos
      FROM n a, n b
      WHERE a.vec_id % 2 = 0 AND a.vec_id < ${2 * DefaultAnn.knnQueryIds}
        AND b.vec_id % 2 = 1 AND b.vec_id < ${2 * DefaultAnn.knnQueryIds}),
    ba AS (
      SELECT src_id, tgt_id, cos FROM (
        SELECT src_id, tgt_id, cos,
          row_number() OVER (PARTITION BY src_id
            ORDER BY cos DESC, tgt_id ASC) AS rk
        FROM p) WHERE rk = 1),
    bb AS (
      SELECT src_id, tgt_id FROM (
        SELECT src_id, tgt_id,
          row_number() OVER (PARTITION BY tgt_id
            ORDER BY cos DESC, src_id ASC) AS rk
        FROM p) WHERE rk = 1)
    SELECT ba.src_id, ba.tgt_id, ba.cos
    FROM ba JOIN bb ON ba.src_id = bb.src_id AND ba.tgt_id = bb.tgt_id
  """

  /** q164: IVF CELL-BALANCE audit — per home cell (nprobe = 1): member
    * count, share of the corpus, and a hot flag where the cell holds more
    * than twice its fair share (n_vecs·n_cells > 2·n_total, the critical
    * value cross-multiplied to EXACT integers — no float threshold). The
    * capacity-planning face of the ANN family: recall tuning (q63/q75)
    * assumes cells are roughly balanced; a hot cell is where IVF latency
    * hides, and the fix (q55's Lloyd refinement, or more cells) starts
    * from this table.
    *
    * Scale shape: the assignment is the shared broadcast-codebook pass
    * every IVF query rides (corpus never shuffles for it); the audit adds
    * ONE |cells|-key map-side-combined count and a 1-row total broadcast. */
  def q164CellBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = assignedCells(spark, sfDir)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
    val tot = cells.agg(sum(col("n_vecs")).as("n_total"),
      count(lit(1)).as("n_cells"))
    cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"), col("n_cells"),
        (col("n_vecs").cast("double") / col("n_total").cast("double"))
          .as("share"),
        (col("n_vecs") * col("n_cells") > lit(2L) * col("n_total"))
          .as("hot_flag"))
  }

  val q164CellBalanceSql: String = s"""
    WITH $ivfAssignedSqlCtes,
    cells AS (SELECT cell, count(*) AS n_vecs FROM assigned GROUP BY 1),
    tot AS (
      SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total, count(*) AS n_cells
      FROM cells)
    SELECT cell, n_vecs, n_cells,
      CAST(n_vecs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
      n_vecs * n_cells > 2 * n_total AS hot_flag
    FROM cells, tot
  """

  /** q192 quantization scale: component sums accumulate over
    * ⌊x·2²⁴⌋-quantized vectors. A float component has a 24-bit mantissa,
    * so x·2²⁴ is EXACT in a double and floor is exact — the quantized
    * integer IS the float's value information, not an approximation knob.
    * Power-of-two so both engines compute the identical integer. */
  private[ops] val CentroidQuantScale = 16777216L // 2^24

  /** q192: PER-LABEL CENTROID COHERENCE — the cosine between each label's
    * centroid and the corpus centroid, on exactly-quantized vectors. The
    * embedding-space drift monitor: a label whose centroid has swung away
    * from the corpus mean (cos well below its siblings') marks a cluster
    * the IVF codebook (q46/q89) underserves and the q69 mixture should
    * reweight. Count normalization cancels in the cosine, so only the
    * component SUMS matter — and those are exact BIGINTs over the
    * [[CentroidQuantScale]] lattice, making this the one vector statistic
    * here that is bitwise-portable WITHOUT a fixed evaluation order
    * (unlike the per-pair dot products, whose fold order is pinned).
    *
    * Exactness: quantized components are exact integers (see scale note);
    * per-(label, dim) sums are exact BIGINTs (exact to ~5e11 vectors);
    * the cosine's three Σ-of-products ride DECIMAL(38,0)/HUGEINT (exact
    * to ~1e9 vectors per label at 64 dims); the output is one
    * division-by-sqrt-product chain (sqrt is correctly-rounded in both
    * engines). Pinned bitwise against a plain-Scala BigInt oracle on
    * axis-aligned fixtures.
    *
    * Scale shape: ONE dim-explode (64 rows per vector) into a map-side
    * combinable (label, dim) rollup — ≤ |labels|·64 rows; the global
    * centroid is a second ≤64-row rollup OVER THAT (never re-scanning
    * vectors); cosine is a dim-keyed join of two tiny frames. No
    * vector-sized shuffle, no pairwise anything. */
  def q192CentroidCoherence(spark: SparkSession, sfDir: String): DataFrame =
    centroidCoherenceOn(
      Tables.parallelized(Tables(spark, sfDir, "embeddings")))

  /** The coherence core over ANY (label, embedding) frame. `cache` is the
    * PlanSpec seam (a tracked frame's nested AdaptiveSparkPlan truncates
    * the plan text, hiding the explode from the pin). */
  /** The exact-lattice per-(label, dim) component sums shared by the
    * cluster-health trio (q192 coherence, q193 dispersion's sibling
    * machinery, q203 separation). `cache` is the PlanSpec seam. */
  private[graft] def quantizedLabelSums(emb: DataFrame,
      cache: Boolean): DataFrame = {
    val qv = emb.select(col("label"), posexplode(expr(
      "transform(embedding, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale.0D) AS BIGINT))"))
      .as(Seq("dim", "qx")))
    val byLabelRaw = qv.groupBy(col("label"), col("dim"))
      .agg(sum(col("qx")).as("s"))
    if (cache) graft.CachedFrames.track(byLabelRaw) else byLabelRaw
  }

  private[graft] def centroidCoherenceOn(emb: DataFrame,
      cache: Boolean = true): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val byLabel = quantizedLabelSums(emb, cache)
    val global = byLabel.groupBy(col("dim")).agg(sum(col("s")).as("g"))
    val nPer = emb.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    byLabel.join(global, Seq("dim"))
      .groupBy(col("label"))
      .agg(sum(d38(col("s")) * d38(col("g"))).as("sg"),
        sum(d38(col("s")) * d38(col("s"))).as("ss"),
        sum(d38(col("g")) * d38(col("g"))).as("gg"))
      .join(nPer, Seq("label"))
      .select(col("label"), col("n_vecs"),
        when(col("ss") > 0 && col("gg") > 0,
          col("sg").cast("double")
            / (sqrt(col("ss").cast("double")) * sqrt(col("gg").cast("double"))))
          .as("cos_to_corpus"))
  }

  val q192CentroidCoherenceSql: String = s"""
    WITH t AS (
      SELECT label,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale) AS BIGINT))
          AS qv
      FROM embeddings),
    q AS (
      SELECT label, i AS dim, qv[i] AS qx
      FROM t, UNNEST(generate_series(1, len(qv))) AS u(i)),
    bl AS (
      SELECT label, dim, CAST(sum(qx) AS BIGINT) AS s
      FROM q GROUP BY 1, 2),
    g AS (SELECT dim, CAST(sum(s) AS BIGINT) AS g FROM bl GROUP BY 1),
    np AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
      FROM embeddings GROUP BY 1),
    d AS (
      SELECT bl.label,
        sum(CAST(bl.s AS HUGEINT) * g.g) AS sg, -- guard:ok internal HUGEINT; output below is exact-cast
        sum(CAST(bl.s AS HUGEINT) * bl.s) AS ss, -- guard:ok internal HUGEINT; output below is exact-cast
        sum(CAST(g.g AS HUGEINT) * g.g) AS gg -- guard:ok internal HUGEINT; output below is exact-cast
      FROM bl JOIN g USING (dim) GROUP BY 1)
    SELECT d.label, np.n_vecs,
      CASE WHEN ss > 0 AND gg > 0 THEN
        CAST(CAST(sg AS VARCHAR) AS DOUBLE) / (sqrt(CAST(CAST(ss AS VARCHAR) AS DOUBLE)) * sqrt(CAST(CAST(gg AS VARCHAR) AS DOUBLE)))
      END AS cos_to_corpus
    FROM d JOIN np USING (label)
  """

  /** q203: LABEL-CENTROID SEPARATION MATRIX — the cosine between every
    * unordered pair of label centroids, on the q192 exact lattice. The
    * third leg of the cluster-health trio: q192 says where each centroid
    * points relative to the corpus, q193 says how tightly members agree
    * WITHIN a label, and this says whether two labels' centroids are
    * MERGING (cos → 1: the label boundary carries no embedding-space
    * signal — a classifier trained on these labels is being asked to
    * split what the geometry doesn't) or genuinely separated. The matrix
    * a label-taxonomy review reads before q125's kNN auto-labeler is
    * trusted.
    *
    * Exactness: per-(label, dim) sums exact BIGINT on the lattice; each
    * pair's Σs_a·s_b and both norms ride DECIMAL(38,0)/HUGEINT (exact to
    * ~1e9 vectors/label at 64 dims); one division by a product of two
    * correctly-rounded sqrts, fixed order both engines. Degenerate
    * all-zero centroids report NULL. The oracle's HUGEINT→DOUBLE casts
    * route through VARCHAR: DuckDB's direct HUGEINT→DOUBLE cast misrounds
    * ~1.5% of values beyond 2⁵³ (measured; this query found it — its
    * sf0.1 Σs_a·s_b is the roster's first hugeint-cast value past 2⁵³),
    * while string→double parse and BIGINT→DOUBLE are correctly rounded.
    *
    * Scale shape: the SAME ≤|labels|·64-row component-sum frame as q192
    * ([[quantizedLabelSums]], shared core); the pair matrix is a dim-keyed
    * self-join of that tiny frame filtered to a < b — label-space-bounded
    * (|labels|²·64 intermediate rows), never touching vectors twice. */
  def q203CentroidSeparation(spark: SparkSession, sfDir: String): DataFrame =
    centroidSeparationOn(
      Tables.parallelized(Tables(spark, sfDir, "embeddings")))

  /** The separation core over ANY (label, embedding) frame. */
  private[graft] def centroidSeparationOn(emb: DataFrame,
      cache: Boolean = true): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val byLabel = quantizedLabelSums(emb, cache)
    val norms = byLabel.groupBy(col("label"))
      .agg(sum(d38(col("s")) * d38(col("s"))).as("ss"))
    byLabel.select(col("label").as("label_a"), col("dim"), col("s").as("sa"))
      .join(byLabel.select(col("label").as("label_b"), col("dim"),
        col("s").as("sb")), Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(d38(col("sa")) * d38(col("sb"))).as("sab"))
      .join(broadcast(norms.select(col("label").as("label_a"),
        col("ss").as("ssa"))), Seq("label_a"))
      .join(broadcast(norms.select(col("label").as("label_b"),
        col("ss").as("ssb"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"),
        when(col("ssa") > 0 && col("ssb") > 0,
          col("sab").cast("double")
            / (sqrt(col("ssa").cast("double"))
              * sqrt(col("ssb").cast("double")))).as("cos_centroids"))
  }

  val q203CentroidSeparationSql: String = s"""
    WITH t AS (
      SELECT label,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale) AS BIGINT))
          AS qv
      FROM embeddings),
    q AS (
      SELECT label, i AS dim, qv[i] AS qx
      FROM t, UNNEST(generate_series(1, len(qv))) AS u(i)),
    bl AS (
      SELECT label, dim, CAST(sum(qx) AS BIGINT) AS s
      FROM q GROUP BY 1, 2),
    nrm AS (
      SELECT label, sum(CAST(s AS HUGEINT) * s) AS ss -- guard:ok internal HUGEINT; output below is exact-cast
      FROM bl GROUP BY 1),
    p AS (
      SELECT a.label AS label_a, b.label AS label_b,
        sum(CAST(a.s AS HUGEINT) * b.s) AS sab -- guard:ok internal HUGEINT; output below is exact-cast
      FROM bl a JOIN bl b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2)
    SELECT p.label_a, p.label_b,
      CASE WHEN na.ss > 0 AND nb.ss > 0 THEN
        CAST(CAST(p.sab AS VARCHAR) AS DOUBLE)
          / (sqrt(CAST(CAST(na.ss AS VARCHAR) AS DOUBLE))
            * sqrt(CAST(CAST(nb.ss AS VARCHAR) AS DOUBLE)))
      END AS cos_centroids
    FROM p JOIN nrm na ON p.label_a = na.label
      JOIN nrm nb ON p.label_b = nb.label
  """

  /** q193: WITHIN-LABEL DISPERSION — the resultant-length coherence
    * R² = |Σv|² / (n·Σ|v|²) per label, on the same exact lattice as q192.
    * The companion question: q192 says where a cluster's centroid POINTS,
    * this says how tightly its members agree with each other —
    * R² = (mean pairwise dot) / (mean squared norm), exactly 1 for n
    * copies of one vector and 1/n for mutually orthogonal members, so a
    * label drifting toward 1/n has stopped being a cluster at all (split
    * it before trusting its q192 heading or its IVF cell assignment).
    *
    * Exactness: |Σv|² = Σ_d S_d² and Σ|v|² = Σ q² are exact
    * DECIMAL(38,0)/HUGEINT sums over the ⌊x·2²⁴⌋ lattice
    * ([[CentroidQuantScale]] — lossless for float components); ONE
    * division. The n-copies law (R² ≡ 1) holds EXACTLY, not to rounding —
    * spec-pinned alongside the plain-Scala BigInt oracle.
    *
    * Scale shape: TWO map-side-combinable rollups over the same cheap
    * codegen dim-explode (re-run rather than cached — the q166
    * two-Generates trade: Σ-dims rows never persist), both collapsing to
    * ≤|labels|·64 and ≤|labels| rows; no vector-sized shuffle. */
  def q193LabelDispersion(spark: SparkSession, sfDir: String): DataFrame =
    labelDispersionOn(Tables.parallelized(Tables(spark, sfDir, "embeddings")))

  /** The dispersion core over ANY (label, embedding) frame. */
  private[graft] def labelDispersionOn(emb: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val qv = emb.select(col("label"), posexplode(expr(
      "transform(embedding, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale.0D) AS BIGINT))"))
      .as(Seq("dim", "qx")))
    val s2 = qv.groupBy(col("label"), col("dim")).agg(sum(col("qx")).as("s"))
      .groupBy(col("label"))
      .agg(sum(d38(col("s")) * d38(col("s"))).as("ss"))
    val v2 = qv.groupBy(col("label"))
      .agg(sum(d38(col("qx")) * d38(col("qx"))).as("svv"))
    val nPer = emb.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    s2.join(v2, Seq("label")).join(nPer, Seq("label"))
      .select(col("label"), col("n_vecs"),
        when(col("svv") > 0,
          col("ss").cast("double")
            / (d38(col("n_vecs")) * col("svv")).cast("double"))
          .as("coherence_r2"))
  }

  val q193LabelDispersionSql: String = s"""
    WITH t AS (
      SELECT label,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale) AS BIGINT))
          AS qv
      FROM embeddings),
    q AS (
      SELECT label, i AS dim, qv[i] AS qx
      FROM t, UNNEST(generate_series(1, len(qv))) AS u(i)),
    s2 AS (
      SELECT label, sum(CAST(s AS HUGEINT) * s) AS ss -- guard:ok internal HUGEINT; output below is exact-cast
      FROM (SELECT label, dim, CAST(sum(qx) AS BIGINT) AS s
            FROM q GROUP BY 1, 2)
      GROUP BY 1),
    v2 AS (
      SELECT label, sum(CAST(qx AS HUGEINT) * qx) AS svv -- guard:ok internal HUGEINT; output below is exact-cast
      FROM q GROUP BY 1),
    np AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
      FROM embeddings GROUP BY 1)
    SELECT s2.label, np.n_vecs,
      CASE WHEN svv > 0 THEN
        CAST(CAST(ss AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(n_vecs AS HUGEINT) * svv AS VARCHAR) AS DOUBLE)
      END AS coherence_r2
    FROM s2 JOIN v2 USING (label) JOIN np ON s2.label = np.label
  """

  /** q230: EMBEDDING-HEALTH AUDIT — the one-row geometry physical: rank-
    * exact p50/p90/p99 of the squared vector norm on the q192 lattice
    * (a fat norm tail distorts every dot-product ranking; a near-zero
    * head means dead vectors feeding NaN-prone normalizations), the mean
    * squared norm, and the GLOBAL resultant coherence R² = |Σv|²/(n·Σ|v|²)
    * — q193's dispersion law applied corpus-wide: 1/n for isotropic
    * spread, → 1 for representation collapse (every vector pointing one
    * way — the classic degenerate-encoder signature, invisible to any
    * per-label view when ALL labels collapsed together).
    *
    * Exactness: quantized components are exact integers ([[CentroidQuantScale]]
    * — float mantissas make ⌊x·2²⁴⌋ exact); per-vector norm² is an exact
    * BIGINT fold (≤ 2⁵⁴ at 64 dims); percentile picks are rank-exact
    * under (norm², vec_id); Σ|v|² and Σ_d G_d² ride DECIMAL(38,0)/HUGEINT;
    * the two emitted ratios are single divisions of exact-cast doubles.
    *
    * Scale shape: ONE quantized projection (cached), a per-vector
    * map-side fold (no explode on the norm path), one ungrouped bucketed
    * [[DistRank]] layout, and a ≤64-row dim rollup for the resultant;
    * 1 row out. */
  def q230EmbeddingHealth(spark: SparkSession, sfDir: String): DataFrame =
    embeddingHealthOn(Tables.parallelized(Tables(spark, sfDir, "embeddings")))

  /** The health core over ANY (vec_id, embedding) frame — fixture-
    * testable. */
  private[graft] def embeddingHealthOn(emb: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val q = graft.CachedFrames.track(emb.select(col("vec_id"), expr(
      "transform(embedding, x -> " +
        s"CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale.0D) AS BIGINT))")
      .as("qv")))
    val norms = graft.CachedFrames.track(q.select(col("vec_id"), expr(
      "aggregate(transform(qv, v -> v * v), 0L, (a, x) -> a + x)")
      .as("norm2")))
    val n = norms.agg(count(lit(1)).as("n_vecs"))
    val picks = TextOps.LengthPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_vecs + ${b - 1}) DIV $b"), col("norm2")))
        .as(s"${name}_norm2")
    }
    val aggs = picks :+ sum(d38(col("norm2"))).as("sum_norm2")
    val stats = DistRank.withBucketedRank(norms, Seq(), "norm2",
      Seq("vec_id"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_vecs"))
      .agg(aggs.head, aggs.tail: _*)
    val resultant = q.select(posexplode(col("qv")).as(Seq("dim", "qx")))
      .groupBy(col("dim")).agg(sum(col("qx")).as("g"))
      .agg(coalesce(sum(d38(col("g")) * d38(col("g"))),
        lit(0L).cast("decimal(38,0)")).as("g2"))
    stats.crossJoin(broadcast(resultant))
      .select(col("n_vecs"), col("p50_norm2"), col("p90_norm2"),
        col("p99_norm2"),
        (col("sum_norm2").cast("double") / col("n_vecs").cast("double"))
          .as("mean_norm2"),
        when(col("sum_norm2") > 0, col("g2").cast("double")
          / (d38(col("n_vecs")) * col("sum_norm2")).cast("double"))
          .as("coherence_r2"))
  }

  val q230EmbeddingHealthSql: String = {
    val cases = TextOps.LengthPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_vecs + ${b - 1}) // $b THEN norm2 END) AS ${name}_norm2"
    }.mkString(",\n      ")
    s"""
    WITH t AS (
      SELECT vec_id,
        list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * $CentroidQuantScale) AS BIGINT))
          AS qv
      FROM embeddings),
    nm AS (SELECT vec_id,
             -- coalesce: list_sum over an EMPTY list is NULL in DuckDB,
             -- while the Spark side's aggregate folds from seed 0L
             CAST(coalesce(list_sum(list_transform(qv, v -> v * v)), 0)
               AS BIGINT) AS norm2
           FROM t),
    r AS (SELECT norm2, row_number() OVER (ORDER BY norm2, vec_id) AS rk,
            count(*) OVER () AS n_vecs
          FROM nm),
    st AS (SELECT CAST(n_vecs AS BIGINT) AS n_vecs,
      $cases,
      sum(CAST(norm2 AS HUGEINT)) AS sum_norm2 -- guard:ok internal HUGEINT; outputs below are exact-cast
      FROM r GROUP BY n_vecs),
    qd AS (SELECT i AS dim, qv[i] AS qx
           FROM t, UNNEST(generate_series(1, len(qv))) AS u(i)),
    gd AS (SELECT dim, CAST(sum(qx) AS BIGINT) AS g FROM qd GROUP BY 1),
    g2 AS (SELECT coalesce(sum(CAST(g AS HUGEINT) * g), 0) AS g2 FROM gd) -- guard:ok internal HUGEINT; output below is exact-cast
    SELECT st.n_vecs, st.p50_norm2, st.p90_norm2, st.p99_norm2,
      CAST(CAST(st.sum_norm2 AS VARCHAR) AS DOUBLE)
        / CAST(st.n_vecs AS DOUBLE) AS mean_norm2,
      CASE WHEN st.sum_norm2 > 0 THEN
        CAST(CAST(g2.g2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(st.n_vecs AS HUGEINT) * st.sum_norm2 AS VARCHAR)
            AS DOUBLE) END AS coherence_r2
    FROM st, g2
  """
  }
  /** q257: SEMANTIC DECONTAMINATION REPORT — the embedding-space face of
    * the q58/q114/q122 benchmark-contamination family: how much of the
    * corpus sits within cosine [[AdmitCosTau]] of ANY benchmark vector
    * (the q78 batch split doubles as the benchmark suite: vec_id <
    * [[AdmitBatchBound]]), rolled up per label — the table a pretraining
    * owner reads to decide which slices need semantic (not just textual)
    * decontamination before an eval is trustworthy.
    *
    * Scale shape — and why there is NO IVF here: decontamination indexes
    * the BENCHMARKS, not the corpus, and a benchmark suite is tiny and
    * fixed (here ≤ AdmitBatchBound vectors; in production, thousands), so
    * the honest 100 TB plan is the corpus STREAMING once past a broadcast
    * of the whole benchmark matrix — exact, one pass, no index to build
    * or drift. (q78 is the opposite asymmetry: a small batch probing a
    * corpus-sized index.) The per-vec best-cos is a max over the
    * broadcast rows (order-insensitive, bitwise-stable); counts exact;
    * the rate is one division per label row.
    *
    * Exactness: dot products are the fixed ascending-index fold both
    * engines share (graft.functions.DotProduct ≡ the oracle's
    * list_reduce); max/count order-insensitive; one division. */
  def q257SemanticDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.CachedFrames.track(vecs(spark, sfDir))
    val bench = e.filter(col("vec_id") < AdmitBatchBound)
      .select(col("v").as("bv"), col("nrm").as("bn"))
    e.filter(col("vec_id") >= AdmitBatchBound)
      .crossJoin(broadcast(bench))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(dot(col("v"), col("bv")) / (col("nrm") * col("bn")))
        .as("best_cos"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("best_cos") >= AdmitCosTau, 1L).otherwise(0L))
          .as("n_contaminated"),
        max(col("best_cos")).as("max_cos"))
      .select(col("label"), col("n_vecs"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_vecs").cast("double"))
          .as("contamination_rate"),
        col("max_cos"))
  }

  val q257SemanticDecontamSql: String = s"""
    WITH e AS (
      SELECT vec_id, label,
        list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    n AS (
      SELECT vec_id, label, v,
        sqrt(list_reduce(list_prepend(0.0::DOUBLE,
          list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM e),
    bench AS (SELECT v AS bv, nrm AS bn FROM n
              WHERE vec_id < $AdmitBatchBound),
    best AS (
      SELECT c.vec_id, c.label,
        max(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(list_zip(c.v, bench.bv), z -> z[1] * z[2])),
            (acc, x) -> acc + x) / (c.nrm * bench.bn)) AS best_cos
      FROM n c, bench
      WHERE c.vec_id >= $AdmitBatchBound
      GROUP BY 1, 2)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      CAST(sum(CASE WHEN best_cos >= $AdmitCosTau THEN 1 ELSE 0 END)
        AS BIGINT) AS n_contaminated,
      CAST(sum(CASE WHEN best_cos >= $AdmitCosTau THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination_rate,
      max(best_cos) AS max_cos
    FROM best GROUP BY 1
  """
}

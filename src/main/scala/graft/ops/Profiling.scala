package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling over a table — the "what is actually in this
  * corpus" pass every curation run starts with (the Deequ/TFDV column-stats
  * family). One operator, two faces:
  *
  *   - [[q105Profile]]: EXACT per-column stats (rows, nulls, distinct,
  *     min/max) — the oracle-checkable contract;
  *   - [[profileApprox]]: the same projection with `approx_count_distinct`
  *     (HLL++) in place of the exact distinct — the bounded-state shape the
  *     streaming twin and a 100 TB profiler actually run, since HLL's
  *     accumulator is constant-size per column while the exact path's
  *     partial-aggregation hash map is sized by each column's distinct-value
  *     volume.
  *
  * Plan shape (both faces): `stack` unpivots the C columns into
  * (col_name, val) rows — a pure codegen projection, C× the row count but
  * read ONCE (one scan feeds every column's stats; C separate per-column
  * jobs would scan the table C times). The exact face then aggregates
  * twice: groupBy(col_name, val) with map-side partial aggregation (heavy
  * repeated values — enum-ish columns — collapse before the shuffle), then
  * groupBy(col_name) over the surviving distinct rows. The shuffled volume
  * is bounded by distinct-value volume, not corpus volume. The approx face
  * is ONE aggregation with constant-size accumulators — no second shuffle
  * at all.
  */
object Profiling {

  /** The profiled table. Values are compared in their canonical string cast
    * (injective for the integer/varchar columns profiled here, so
    * n_distinct is exact) — one (col_name, val) schema covers a
    * heterogeneous column set, exactly how a schema-generic profiler has
    * to work. The cost of that genericity: min_val/max_val are extremes in
    * the STRING ordering, which differs from numeric order ("9" > "10");
    * numeric extremes — with mean/stddev/median — are the numeric face's
    * job ([[q109NumericProfile]]). */
  private val ProfiledTable = "documents"

  private def unpivoted(df: DataFrame): DataFrame = {
    // ProfileCorpus points this at ARBITRARY parquet, and parquet permits
    // quotes/backticks in column names — escape both the string literal
    // (backslash rules) and the backtick-quoted identifier (doubled
    // backtick), or a column named e.g. "it's" kills the stack() parse
    def strLit(c: String) = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def quoted(c: String) = "`" + c.replace("`", "``") + "`"
    val stackArgs =
      df.columns.map(c => s"${strLit(c)}, CAST(${quoted(c)} AS STRING)").mkString(", ")
    df.select(expr(s"stack(${df.columns.length}, $stackArgs) AS (col_name, val)"))
  }

  /** q105: exact column profile — (col_name, n_rows, n_null, n_distinct,
    * min_val, max_val), one row per column of the documents table. */
  def q105Profile(spark: SparkSession, sfDir: String): DataFrame =
    profileExactOn(Tables(spark, sfDir, ProfiledTable))

  /** The exact face over ANY frame — what the `cli.ProfileCorpus` job runs
    * on arbitrary parquet inputs; q105 is this on the documents table. */
  def profileExactOn(df: DataFrame): DataFrame =
    unpivoted(df)
      .groupBy(col("col_name"), col("val"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_null"),
        count(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))

  /** The bounded-state profile: identical projection with HLL++ distinct.
    * Deterministic for a fixed value set (the sketch hashes values, so
    * arrival order and partitioning don't change the estimate) — which is
    * what lets the streaming twin pin row-equality against THIS face while
    * q105 stays the exact oracle-checked one. */
  def profileApprox(docs: DataFrame): DataFrame =
    unpivoted(docs)
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("val").isNull, 1L)), lit(0L)).as("n_null"),
        approx_count_distinct(col("val")).as("n_distinct_approx"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))

  /** The numeric-profile columns — lineitem's four measure columns, the
    * widest numeric surface in the driver tables. */
  private val NumericCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** q109: numeric column profile — n / mean / stddev / median / min / max
    * per measure column, the second profiling face next to q105's generic
    * string-cast stats. One stack-unpivot scan feeds ONE aggregation.
    *
    * Determinism contract: mean and variance come from fixed-point
    * DECIMAL(38,0) sums of floor(x·1e12) and floor(x²·1e6) (the q31
    * pattern — order-insensitive, constant-size accumulators, bitwise
    * match in DuckDB), then a fixed chain of IEEE ops; the median is the
    * `percentile` ↔ `quantile_cont` pair q35 already pins cross-engine.
    *
    * Scale caveat (the honest row in this file's ledger): exact
    * `percentile` buffers each group's DISTINCT values — r17: the scan
    * first collapses to (col_name, x, cnt) in a codegen hash aggregate
    * and the median is `percentile(x, 0.5, cnt)`, whose internal state
    * is the very value→count map the per-row form builds, so the result
    * is bit-identical while the non-codegen ObjectHashAggregate sees
    * |distinct| rows instead of the raw unpivot, and the moment sums run
    * whole-stage-codegen over the collapsed counts (Σ floor(x·s)·cnt ≡
    * the per-row Σ exactly — integer × count). Still wrong for arbitrary
    * cardinality; a 100 TB profiler swaps it for `approx_percentile`
    * exactly as q105's approx face swaps exact distinct for HLL. */
  def q109NumericProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables(spark, sfDir, "lineitem")
    val stackArgs = NumericCols.map(c => s"'$c', `$c`").mkString(", ")
    df.select(expr(s"stack(${NumericCols.length}, $stackArgs) AS (col_name, x)"))
      .groupBy(col("col_name"), col("x"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n"),
        sum(expr("CAST(floor(x * 1e12) AS DECIMAL(38,0)) * cnt")).as("fx"),
        // x² is quantized at 1e6, not 1e12: Spark's floor(double) returns
        // BIGINT, and (1e5)²·1e12 ≈ 1e22 would overflow it — at 1e6 the
        // largest measure column stays under 2^63 while the variance keeps
        // 1e-6 absolute precision on E[x²], identical in both engines
        sum(expr("CAST(floor(x * x * 1e6) AS DECIMAL(38,0)) * cnt")).as("fx2"),
        expr("percentile(x, 0.5D, cnt)").as("p50"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
      .withColumn("mean_x",
        col("fx").cast("double") / lit(1e12) / col("n").cast("double"))
      .withColumn("var0",
        col("fx2").cast("double") / lit(1e6) / col("n").cast("double")
          - col("mean_x") * col("mean_x"))
      .withColumn("std_x", sqrt(greatest(col("var0"), lit(0.0))))
      .select(col("col_name"), col("n"), col("mean_x"), col("std_x"),
        col("p50"), col("min_x"), col("max_x"))
  }

  val q109NumericProfileSql: String = {
    val union = NumericCols.map(c =>
      s"SELECT '$c' AS col_name, $c AS x FROM lineitem").mkString("\n      UNION ALL ")
    s"""
    WITH u AS (
      $union),
    g AS (
      SELECT col_name, count(*) AS n,
        sum(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS fx,
        sum(CAST(floor(x * x * 1e6) AS DECIMAL(38,0))) AS fx2,
        quantile_cont(x, 0.5) AS p50,
        min(x) AS min_x, max(x) AS max_x
      FROM u GROUP BY 1)
    SELECT col_name, n,
      CAST(fx AS DOUBLE) / 1e12 / CAST(n AS DOUBLE) AS mean_x,
      sqrt(greatest(
        CAST(fx2 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)
          - (CAST(fx AS DOUBLE) / 1e12 / CAST(n AS DOUBLE))
            * (CAST(fx AS DOUBLE) / 1e12 / CAST(n AS DOUBLE)),
        0.0)) AS std_x,
      p50, min_x, max_x
    FROM g
  """
  }

  /** q110: key-skew report — the diagnostic a pipeline operator runs
    * before choosing a shuffle strategy ("should this join be salted?").
    * For the chosen key it emits the top-10 heaviest keys by count with
    * their share of all non-null rows, plus the ambient totals
    * (total rows, distinct keys, null-key rows) on every row so one
    * result frame answers the question alone. Deterministic: ranking
    * ties break (n desc, key asc) and nulls are EXCLUDED from the ranked
    * keys (Spark sorts nulls first ascending, DuckDB last — ranking them
    * would un-pin the cross-engine order) and reported in n_null instead.
    *
    * Scale shape: ONE map-side-combined groupBy collapses the corpus to
    * key cardinality; the top-10 is TakeOrderedAndProject (per-partition
    * partial top-k, no global sort); the totals are a 1-row broadcast.
    * This is q95's heavy-hitter machinery pointed at shuffle keys instead
    * of tokens — exact, because the group-by fits; the CMS face takes
    * over when even key cardinality is unwelcome. */
  def q110SkewReport(spark: SparkSession, sfDir: String): DataFrame =
    skewReportOn(Tables(spark, sfDir, "events"), col("user_id").cast("string"))

  private[graft] def skewReportOn(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    // ONE corpus scan: group nulls along with everything else, then split
    // the key-cardinality-sized counts frame into ranked keys vs the null
    // row — only that small frame is cached, never a corpus-sized
    // projection
    val counts = graft.CachedFrames.track(
      df.select(key.as("key")).groupBy(col("key")).agg(count(lit(1)).as("n")))
    val totals = counts.agg(
      coalesce(sum(when(col("key").isNotNull, col("n"))), lit(0L)).as("total"),
      count(col("key")).as("n_keys"),
      coalesce(sum(when(col("key").isNull, col("n"))), lit(0L)).as("n_null"))
    // rank the top-10 WITHOUT a bare global window (even 10 rows through
    // an unpartitioned WindowExec logs the single-partition warning and
    // is the shape this very report exists to flag): rk = 1 + how many
    // rows sort strictly before — the DistRank triangular-join idiom,
    // 10×10 at most
    val top = graft.CachedFrames.track(counts.filter(col("key").isNotNull)
      .orderBy(col("n").desc, col("key").asc).limit(10))
    val before = top.select(col("n").as("_n2"), col("key").as("_k2"))
    top.join(before,
        col("_n2") > col("n") ||
          (col("_n2") === col("n") && col("_k2") < col("key")), "left")
      .groupBy(col("key"), col("n"))
      .agg((count(col("_k2")) + 1L).cast("int").as("rk"))
      .crossJoin(broadcast(totals))
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .select(col("rk"), col("key"), col("n"), col("share"),
        col("total"), col("n_keys"), col("n_null"))
  }

  val q110SkewReportSql: String = """
    WITH k AS (SELECT user_id::VARCHAR AS key FROM events),
    c AS (SELECT key, count(*) AS n FROM k WHERE key IS NOT NULL GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM c),
    nn AS (SELECT count(*) AS n_null FROM k WHERE key IS NULL),
    top AS (
      SELECT key, n, row_number() OVER (ORDER BY n DESC, key ASC) AS rk
      FROM c ORDER BY n DESC, key ASC LIMIT 10)
    SELECT CAST(top.rk AS INTEGER) AS rk, top.key, top.n,
      CAST(top.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
      t.total, t.n_keys, nn.n_null
    FROM top, t, nn
  """

  /** DuckDB mirror of [[profileExactOn]] over relation `from` — the single
    * source of the per-column formulas for the q105 and q111 oracles. */
  private def profileSqlOver(from: String): String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
        (count(*) - count($c))::BIGINT AS n_null,
        count(DISTINCT $c::VARCHAR)::BIGINT AS n_distinct,
        min($c::VARCHAR) AS min_val, max($c::VARCHAR) AS max_val
      FROM $from"""
    }.mkString("\nUNION ALL\n")
  }

  val q105ProfileSql: String = profileSqlOver("documents")

  /** The "next release" slice q111 diffs against: the corpus minus every
    * 97th document — a deterministic stand-in for a version that dropped
    * some rows, chosen so every column's stats actually move. */
  private val V2Predicate = "doc_id % 97 <> 0"

  /** q111: profile DIFF between two corpus versions — the release audit
    * over STATS, the way q101 is the release audit over CONTENT. Profiles
    * both versions with the same exact face and joins per column, emitting
    * the row/distinct deltas and whether the string-space extremes moved.
    * A reviewer reads this table instead of two raw profiles: "release
    * v2 lost 5 documents, doc_id cardinality dropped 5, text extremes
    * unchanged".
    *
    * Scale shape: two q105 passes (each one scan, distinct-bounded
    * shuffle) joined on a column-count-sized frame — the diff itself is
    * free. On a real lake the two sides read different snapshot paths;
    * here both derive from the driver table with a deterministic
    * predicate so the oracle can reproduce them. */
  def q111ProfileDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, ProfiledTable)
    val p1 = profileExactOn(docs)
    val p2 = profileExactOn(docs.filter(expr(V2Predicate)))
    p1.alias("a").join(p2.alias("b"), "col_name")
      .select(col("col_name"),
        col("a.n_rows").as("n_rows_1"), col("b.n_rows").as("n_rows_2"),
        (col("b.n_rows") - col("a.n_rows")).as("rows_delta"),
        col("a.n_distinct").as("n_distinct_1"),
        col("b.n_distinct").as("n_distinct_2"),
        (col("b.n_distinct") - col("a.n_distinct")).as("distinct_delta"),
        // null-safe on purpose: extremes that VANISH (all of a column's
        // non-null values lived in the dropped slice) must read as changed,
        // not NULL — plain <>/=!= would go NULL and hide the loudest case
        (!(col("a.min_val") <=> col("b.min_val")) ||
          !(col("a.max_val") <=> col("b.max_val"))).as("extremes_changed"))
  }

  val q111ProfileDiffSql: String = s"""
    WITH v2 AS (SELECT * FROM documents WHERE $V2Predicate),
    p1 AS (${profileSqlOver("documents")}),
    p2 AS (${profileSqlOver("v2")})
    SELECT p1.col_name,
      p1.n_rows AS n_rows_1, p2.n_rows AS n_rows_2,
      p2.n_rows - p1.n_rows AS rows_delta,
      p1.n_distinct AS n_distinct_1, p2.n_distinct AS n_distinct_2,
      p2.n_distinct - p1.n_distinct AS distinct_delta,
      (p1.min_val IS DISTINCT FROM p2.min_val
        OR p1.max_val IS DISTINCT FROM p2.max_val) AS extremes_changed
    FROM p1 JOIN p2 USING (col_name)
  """
}

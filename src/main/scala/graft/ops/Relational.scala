package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator library over the TPC-H-ish tables (SURVEY.md §2.2/2.4/
  * 2.6/2.7 generalized): each query is a DataFrame program with a DuckDB
  * oracle. Aggregate parity policy: sums over doubles are computed in exact
  * DECIMAL (associative — safe under any shuffle/partial-agg order) and cast
  * to DOUBLE at the end so both engines emit identical bits. Window sums use
  * the same trick (DuckDB evaluates window aggregates with segment trees, so
  * double addition order differs from Spark's running fold — decimal is
  * order-insensitive). Timestamps are surfaced as DATE or epoch seconds to
  * dodge tz-typing mismatches between the two engines.
  *
  * Scale notes are per-query: dimension joins broadcast, fact-fact joins
  * shuffle on the join key and rely on AQE for skew/coalescing.
  */
object Relational {

  private def dec(c: String, p: Int = 18, s: Int = 2) =
    col(c).cast(s"decimal($p,$s)")

  /** TPC-H Q1-shaped scan+filter+hash-aggregate over the fact table.
    * Partial aggregation (map-side combine) collapses 32 shuffle partitions'
    * worth of input to ~6 groups before the exchange. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(dec("l_quantity", 12)).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice", 14)).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice", 14) *
          (lit(1).cast("decimal(3,2)") - dec("l_discount", 4)))
          .cast("double").as("sum_disc_price"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String = """
    SELECT l_returnflag, l_linestatus,
      count(*) AS count_order,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
               (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
  """

  /** Star join: fact ⋈ three dimensions. nation/region are tiny — Catalyst
    * auto-broadcasts them (≤10 MB); customer at 100 TB scale would be a
    * shuffle join on o_custkey, which AQE handles. */
  def q2RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables(spark, sfDir, "orders")
    val customer = Tables(spark, sfDir, "customer")
    val nation = Tables(spark, sfDir, "nation")
    val region = Tables(spark, sfDir, "region")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("revenue"))
  }

  val q2RegionRevenueSql: String = """
    SELECT r_name, count(*) AS n_orders,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
  """

  /** Fact-fact join (lineitem ⋈ orders): both sides large ⇒ shuffle join on
    * the key; filter is pushed to the parquet scan. */
  def q3PriorityRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(dec("l_extendedprice", 14) *
          (lit(1).cast("decimal(3,2)") - dec("l_discount", 4)))
          .cast("double").as("revenue"))

  val q3PriorityRevenueSql: String = """
    SELECT o_orderpriority, count(*) AS n_lines,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
               (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY o_orderpriority
  """

  /** Left-semi join: customers having at least one high-value order. */
  def q4SemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bigOrders = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 300000.0)
    Tables(spark, sfDir, "customer")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q4SemiJoinSql: String = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
  """

  /** Left-anti join: customers with no orders at all. */
  def q5AntiJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val q5AntiJoinSql: String = """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  """

  /** Left outer join + aggregate: per-customer order count/total including
    * order-less customers (count(o_orderkey) skips nulls in both engines). */
  def q6LeftJoinAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec("o_totalprice")), lit(0).cast("decimal(18,2)"))
          .cast("double").as("total_spent"))

  val q6LeftJoinAggSql: String = """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
      CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS VARCHAR) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
  """

  /** Ranking window: top-3 orders per customer. The window shuffles once on
    * the partition key; ties broken by o_orderkey so rank is total. */
  def q7WindowTopN(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(spark, sfDir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  val q7WindowTopNSql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
      FROM orders)
    WHERE rk <= 3
  """

  /** Analytic window: running total (exact decimal — DuckDB's segment-tree
    * window evaluation reorders double addition) and lag per customer. */
  def q8WindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables(spark, sfDir, "orders")
      .withColumn("running_total",
        sum(dec("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        col("running_total"), col("prev_price"))
  }

  val q8WindowRunningSql: String = """
    SELECT o_custkey, o_orderkey,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_total,
      lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
    FROM orders
  """

  /** ROLLUP hierarchy aggregate with grouping indicators. */
  def q9Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"),
        count(lit(1)).as("n"),
        sum(dec("l_quantity", 12)).cast("double").as("sum_qty"))

  val q9RollupSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(GROUPING(l_returnflag) AS TINYINT) AS g_flag, CAST(GROUPING(l_linestatus) AS TINYINT) AS g_status,
      count(*) AS n,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
  """

  /** CUBE over two independent dimensions. */
  def q10Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec("o_totalprice")).cast("double").as("revenue"))

  val q10CubeSql: String = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
  """

  /** Distinct aggregates: per-flag distinct part/supplier counts (expand +
    * two-phase aggregation under the hood). */
  def q11DistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))

  val q11DistinctAggSql: String = """
    SELECT l_returnflag,
      count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps,
      count(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
  """

  /** Global top-k: Catalyst plans orderBy+limit as TakeOrderedAndProject —
    * each partition keeps k rows, driver merges; no global sort at scale. */
  def q12TopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q12TopKSql: String = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
  """

  /** Set operations: customers active in Jan-2024 vs Feb-2024 —
    * INTERSECT / EXCEPT (distinct set semantics in both engines) + UNION. */
  def q13SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables(spark, sfDir, "orders")
    def monthCust(m: Int) = orders
      .filter(month(col("o_orderdate")) === m && year(col("o_orderdate")) === 2024)
      .select(col("o_custkey"))
    val jan = monthCust(1)
    val feb = monthCust(2)
    val both = jan.intersect(feb).agg(count(lit(1)).as("n")).withColumn("cohort", lit("both"))
    val janOnly = jan.except(feb).agg(count(lit(1)).as("n")).withColumn("cohort", lit("jan_only"))
    val febOnly = feb.except(jan).agg(count(lit(1)).as("n")).withColumn("cohort", lit("feb_only"))
    val either = jan.union(feb).distinct().agg(count(lit(1)).as("n")).withColumn("cohort", lit("either"))
    both.union(janOnly).union(febOnly).union(either).select(col("cohort"), col("n"))
  }

  val q13SetOpsSql: String = """
    WITH jan AS (SELECT o_custkey FROM orders
                 WHERE month(o_orderdate) = 1 AND year(o_orderdate) = 2024),
         feb AS (SELECT o_custkey FROM orders
                 WHERE month(o_orderdate) = 2 AND year(o_orderdate) = 2024)
    SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM jan INTERSECT SELECT * FROM feb)
    UNION ALL
    SELECT 'jan_only', count(*) FROM (SELECT * FROM jan EXCEPT SELECT * FROM feb)
    UNION ALL
    SELECT 'feb_only', count(*) FROM (SELECT * FROM feb EXCEPT SELECT * FROM jan)
    UNION ALL
    SELECT 'either', count(*) FROM (SELECT * FROM jan UNION SELECT * FROM feb)
  """

  /** Scalar string/date function sampler — pure projection, stays inside one
    * WholeStageCodegen span; dates surfaced as DATE/epoch for tz-safe parity. */
  def q14ScalarFns(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("status_tag"),
        length(col("o_orderpriority")).as("prio_len"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))

  val q14ScalarFnsSql: String = """
    SELECT o_orderkey,
      upper(o_orderpriority) AS prio_upper,
      substr(o_orderpriority, 1, 1) AS prio_code,
      concat_ws('#', o_orderstatus, o_orderpriority) AS status_tag,
      CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
      CAST(year(o_orderdate) AS INTEGER) AS o_year,
      CAST(month(o_orderdate) AS INTEGER) AS o_month,
      CAST(day(o_orderdate) AS INTEGER) AS o_day,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
  """

  /** JSON extraction over the events.props payload + aggregate. */
  def q15Json(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))

  val q15JsonSql: String = """
    SELECT event_type, count(*) AS n,
      min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
  """

  /** Multi-column distinct (dropDuplicates ⇒ hash aggregate on the pair). */
  def q16Distinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .dropDuplicates("c_nationkey", "c_mktsegment")

  val q16DistinctSql: String = """
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
  """

  /** Exact percentiles per group (sort-based aggregate; linear
    * interpolation matches DuckDB's quantile_cont). */
  def q35Percentile(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("percentile(c_acctbal, 0.25)").as("p25"),
        expr("percentile(c_acctbal, 0.5)").as("p50"),
        expr("percentile(c_acctbal, 0.9)").as("p90"),
        count(lit(1)).as("n"))

  val q35PercentileSql: String = """
    SELECT c_mktsegment,
      quantile_cont(c_acctbal, 0.25) AS p25,
      quantile_cont(c_acctbal, 0.5) AS p50,
      quantile_cont(c_acctbal, 0.9) AS p90,
      count(*) AS n
    FROM customer
    GROUP BY c_mktsegment
  """

  /** Pivot: order counts/revenue per priority, one column per status
    * (Catalyst rewrites to CASE-filtered aggregates — the oracle states
    * that form directly). */
  def q39Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))

  val q39PivotSql: String = """
    SELECT o_orderpriority,
      count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders
    GROUP BY o_orderpriority
  """

  /** Unpivot (melt): wide per-part numeric columns to long (attr, value)
    * rows. */
  def q40Unpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("p_size"), col("p_retailprice")),
        variableColumnName = "attr",
        valueColumnName = "val")

  val q40UnpivotSql: String = """
    SELECT p_partkey, attr, val
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part)
    UNPIVOT (val FOR attr IN (p_size, p_retailprice))
  """

  /** GROUPING SETS through the SQL surface (spark.sql over a temp view) —
    * the explicit multi-grouping generalization of rollup/cube. */
  def q41GroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "orders").createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders_v
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)
  }

  val q41GroupingSetsSql: String = """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
  """

  /** Two-phase salted aggregation — the standard skew-mitigation shape for
    * a hot grouping key: shuffle #1 spreads each key over 16 salt buckets
    * (balanced even if one key dominates), shuffle #2 combines the 16
    * partials per key. DECIMAL partials make the result identical to the
    * direct groupBy, which is exactly what the oracle states. */
  def q42SaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_partkey"), col("l_suppkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(dec("l_quantity", 12)).as("pq"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pn")).as("n"), sum(col("pq")).cast("double").as("sum_qty"))

  val q42SaltedAggSql: String = """
    SELECT l_returnflag, count(*) AS n,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
  """

  /** Range (non-equi) join: quantity bands × lineitem, BETWEEN predicate.
    * The bands side is a tiny inline dimension ⇒ Catalyst plans a
    * BroadcastNestedLoopJoin — the right physical shape for interval
    * predicates against a small reference table. */
  def q47RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("tiny", 0.0, 10.0), ("small", 10.0, 25.0),
      ("mid", 25.0, 40.0), ("big", 40.0, 1e9))
      .toDF("band", "lo", "hi")
    Tables(spark, sfDir, "lineitem")
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(dec("l_extendedprice", 14)).cast("double").as("revenue"))
  }

  val q47RangeJoinSql: String = """
    WITH bands(band, lo, hi) AS (
      VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 25.0),
             ('mid', 25.0, 40.0), ('big', 40.0, 1e9))
    SELECT band, count(*) AS n,
      CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem JOIN bands
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
  """

  /** Approximate aggregates (HLL++ distinct, quantile sketch) — rows-only
    * driver check: sketch outputs are engine-specific, so no DuckDB value
    * oracle. The exact counterparts live in [[q50ExactStats]] (fully
    * oracle-checked), so sketch error is measurable by diffing the two. */
  def q38ApproxStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"))

  /** Exact twin of [[q38ApproxStats]]: deterministic distinct count and
    * median per group — hash-checkable against DuckDB (Spark `percentile`
    * matches `quantile_cont` bitwise). */
  def q50ExactStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"))

  val q50ExactStatsSql: String = """
    SELECT l_returnflag,
      count(DISTINCT l_partkey) AS exact_parts,
      quantile_cont(l_extendedprice, 0.5) AS exact_median
    FROM lineitem
    GROUP BY l_returnflag
  """

  /** q120 tuning — Z-order geometry: 16 bits per dimension interleaved
    * into a 32-bit curve position, cut into [[ZorderShards]] shards by
    * FIXED curve ranges (no sampling — reruns and appends land rows in the
    * same shard forever). */
  val ZorderBits = 16
  val ZorderShards = 16

  /** The bit-interleave as portable integer arithmetic (int-div/%/×) — no
    * shift operators, so Spark (`DIV`) and DuckDB (`//`) evaluate the
    * identical formula: zval = Σ_i ((x div 2^i) % 2)·2^(2i)
    * + ((y div 2^i) % 2)·2^(2i+1). */
  private def zvalExpr(x: String, y: String, idiv: String): String =
    (0 until ZorderBits).flatMap { i =>
      Seq(s"(($x $idiv ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y $idiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** q120: Z-ORDER layout assignment — every lineitem row's position on
    * the 2-D Morton curve over (l_orderkey, l_partkey) and the layout
    * shard that position falls in, with per-shard row counts and min/max
    * of BOTH keys. This is the multi-dimensional clustering a lakehouse
    * runs before writing (Delta's Z-ORDER BY): each dimension is first
    * NORMALIZED to the [[ZorderBits]]-bit budget from its global min/max
    * (what Delta reads from column stats — a 1-row broadcast aggregate
    * here), then the bits interleave; because of the interleave, every
    * shard covers a bounded rectangle in (orderkey × partkey) space — the
    * per-shard min/max columns ARE the skipping index, and a scan filtered
    * on EITHER key can prune most shards (a row-order layout prunes only
    * on the sort's leading key; spec-pinned: every shard's rectangle
    * covers ≤ half of each key range).
    *
    * Scale shape: one metadata-cheap bounds aggregate broadcasts back,
    * then the curve position is a pure codegen projection (portable
    * int-div/mod arithmetic, no UDF, no shift-operator dialect) and the
    * stats rollup is one |shards|-sized map-side-combinable aggregate.
    * The shard cut is a fixed range of the curve — deterministic under
    * reruns (appends that extend the key range re-derive bounds exactly
    * as Delta re-clusters). Writing the layout is then
    * `repartitionByRange` on (shard, zval) — the one exchange any sorted
    * write costs. */
  /** q179: REFERENTIAL-INTEGRITY AUDIT — orphan counts and rates for the
    * four FK edges of the warehouse (orders→customer, lineitem→orders,
    * lineitem→part, lineitem→supplier). The ingestion-hygiene gate a
    * pipeline runs after every load: downstream joins silently DROP
    * orphan children (q2's inner joins would under-count revenue), so
    * the audit quantifies exactly how much every join-based metric can
    * be off by. A NULL foreign key counts as an orphan on purpose — this
    * is a strict audit, not SQL FK semantics. Counts exact; rates single
    * divisions.
    *
    * Scale shape: one pass per edge — child LEFT-joins the parent's
    * deduplicated key column (broadcast for dimension-sized parents; a
    * key-equi shuffle join for fact-sized ones, never wider than the
    * key), then ONE map-side conditional rollup; the four 1-row results
    * union. No second scan per edge, no sort. */
  def q179FkOrphans(spark: SparkSession, sfDir: String): DataFrame = {
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key))
        .join(parent.select(col(pkey)).distinct()
          .withColumnRenamed(pkey, "_pk").withColumn("_hit", lit(1)),
          col(key) === col("_pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"),
          (col("n_orphans").cast("double") / col("n_rows").cast("double"))
            .as("orphan_rate"))
    val orders = Tables(spark, sfDir, "orders")
    val lineitem = Tables(spark, sfDir, "lineitem")
    edge("orders->customer", orders, "o_custkey",
        Tables(spark, sfDir, "customer"), "c_custkey")
      .unionByName(edge("lineitem->orders", lineitem, "l_orderkey",
        orders, "o_orderkey"))
      .unionByName(edge("lineitem->part", lineitem, "l_partkey",
        Tables(spark, sfDir, "part"), "p_partkey"))
      .unionByName(edge("lineitem->supplier", lineitem, "l_suppkey",
        Tables(spark, sfDir, "supplier"), "s_suppkey"))
  }

  val q179FkOrphansSql: String = """
    SELECT 'orders->customer' AS fk_edge,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_orphans,
      CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS orphan_rate
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem->orders',
      CAST(count(*) AS BIGINT),
      CAST(sum(CASE WHEN p.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(sum(CASE WHEN p.o_orderkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE)
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
      ON l.l_orderkey = p.o_orderkey
    UNION ALL
    SELECT 'lineitem->part',
      CAST(count(*) AS BIGINT),
      CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE)
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
      ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem->supplier',
      CAST(count(*) AS BIGINT),
      CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE)
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
      ON l.l_suppkey = s.s_suppkey
  """

  def q120ZorderLayout(spark: SparkSession, sfDir: String): DataFrame =
    zorderLayoutOn(Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("x"), col("l_partkey").as("y")))

  /** The layout pass over ANY (x, y) BIGINT frame — fixture-testable
    * against a plain-Scala Morton oracle. */
  private[ops] def zorderLayoutOn(li: DataFrame): DataFrame = {
    val maxN = (1L << ZorderBits) - 1
    val shardWidth = (1L << (2 * ZorderBits)) / ZorderShards
    val bounds = li.agg(min(col("x")).as("lo_x"), max(col("x")).as("hi_x"),
      min(col("y")).as("lo_y"), max(col("y")).as("hi_y"))
    li.crossJoin(broadcast(bounds))
      .withColumn("xn", expr(
        s"((x - lo_x) * $maxN) DIV greatest(hi_x - lo_x, 1)"))
      .withColumn("yn", expr(
        s"((y - lo_y) * $maxN) DIV greatest(hi_y - lo_y, 1)"))
      .withColumn("zval", expr(zvalExpr("xn", "yn", "DIV")))
      .withColumn("shard", expr(s"CAST(zval DIV $shardWidth AS INT)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_orderkey"), max(col("x")).as("max_orderkey"),
        min(col("y")).as("min_partkey"), max(col("y")).as("max_partkey"))
  }

  val q120ZorderLayoutSql: String = {
    val maxN = (1L << ZorderBits) - 1
    val shardWidth = (1L << (2 * ZorderBits)) / ZorderShards
    s"""
    WITH d AS (
      SELECT l_orderkey AS x, l_partkey AS y FROM lineitem),
    b AS (
      SELECT min(x) AS lo_x, max(x) AS hi_x, min(y) AS lo_y, max(y) AS hi_y
      FROM d),
    nrm AS (
      SELECT x, y,
        ((x - b.lo_x) * $maxN) // greatest(b.hi_x - b.lo_x, 1) AS xn,
        ((y - b.lo_y) * $maxN) // greatest(b.hi_y - b.lo_y, 1) AS yn
      FROM d CROSS JOIN b),
    z AS (
      SELECT x, y, ${zvalExpr("xn", "yn", "//")} AS zval FROM nrm)
    SELECT CAST(zval // $shardWidth AS INTEGER) AS shard,
      CAST(count(*) AS BIGINT) AS n,
      min(x) AS min_orderkey, max(x) AS max_orderkey,
      min(y) AS min_partkey, max(y) AS max_partkey
    FROM z GROUP BY 1
  """
  }

  /** q195 percentile grid: (name, a, b) picks rank (a·n + b−1) DIV b of
    * the ascending fanout order — the q140 exact-index convention. */
  private[ops] val FanoutPercentiles: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  /** q195: JOIN-FANOUT AUDIT over the schema's four FK edges — rank-exact
    * p50/p90/p99 and max of children-per-parent for customer→orders,
    * orders→lineitem, nation→customer and part→lineitem. The numbers a
    * shuffle strategy is actually chosen from: p99≫p50 on an edge says
    * salt it (q42) or lean on AQE skew splitting BEFORE the job runs,
    * and max bounds the worst single reduce task. The distribution is
    * over REFERENCED parents (a parent with zero children contributes no
    * join work — q179 audits those separately as orphans' dual).
    *
    * Exactness: fanouts are exact counts; percentiles are exact
    * order-statistic picks at index (a·n + b−1) DIV b with ties broken
    * by parent key (a total order), the q140 convention — bitwise both
    * engines, no interpolation.
    *
    * Scale shape: each edge is ONE map-side-combinable child rollup to
    * parent cardinality; the four counts frames union under an edge tag
    * into a single GROUPED [[DistRank]] layout (per-edge bucketed rank —
    * no single-partition sort), sizes ride a broadcast, and the answer
    * is a 4-row rollup. */
  def q195JoinFanout(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Seq(
      ("customer->orders",
        Tables(spark, sfDir, "orders").select(col("o_custkey").as("k"))),
      ("orders->lineitem",
        Tables(spark, sfDir, "lineitem").select(col("l_orderkey").as("k"))),
      ("nation->customer", Tables(spark, sfDir, "customer")
        .select(col("c_nationkey").cast("bigint").as("k"))),
      ("part->lineitem",
        Tables(spark, sfDir, "lineitem").select(col("l_partkey").as("k"))))
    val counts = edges.map { case (e, df) =>
      df.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .select(lit(e).as("edge"), col("k"), col("cnt"))
    }.reduce(_.unionByName(_))
    fanoutPercentilesOn(counts)
  }

  /** The percentile rollup over ANY (edge, k, cnt) fanout frame. */
  private[graft] def fanoutPercentilesOn(counts: DataFrame): DataFrame = {
    val sizes = counts.groupBy(col("edge"))
      .agg(count(lit(1)).as("n_parents"))
      .select(col("edge").as("_esz"), col("n_parents"))
    val picks = FanoutPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_parents + ${b - 1}) DIV $b"), col("cnt"))).as(name)
    }
    val aggs = picks :+ max(col("cnt")).as("max_fanout")
    graft.ops.DistRank
      .withBucketedRank(counts, Seq("edge"), "cnt", Seq("k"), "_r")
      .join(broadcast(sizes), col("edge") <=> col("_esz"))
      .groupBy(col("edge"), col("n_parents"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val q195JoinFanoutSql: String = {
    val cases = FanoutPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_parents + ${b - 1}) // $b THEN cnt END) AS $name"
    }.mkString(",\n      ")
    s"""
    WITH ce AS (
      SELECT 'customer->orders' AS edge, o_custkey AS k FROM orders
      UNION ALL
      SELECT 'orders->lineitem', l_orderkey FROM lineitem
      UNION ALL
      SELECT 'nation->customer', CAST(c_nationkey AS BIGINT) FROM customer
      UNION ALL
      SELECT 'part->lineitem', l_partkey FROM lineitem),
    c AS (
      SELECT edge, k, CAST(count(*) AS BIGINT) AS cnt
      FROM ce GROUP BY 1, 2),
    r AS (
      SELECT edge, cnt,
        row_number() OVER (PARTITION BY edge ORDER BY cnt ASC, k ASC) AS rk,
        count(*) OVER (PARTITION BY edge) AS n_parents
      FROM c)
    SELECT edge, CAST(n_parents AS BIGINT) AS n_parents,
      $cases,
      max(cnt) AS max_fanout
    FROM r GROUP BY 1, 2
  """
  }

  /** q211: ORDER-TO-SHIP LAG percentiles — rank-exact p50/p90/p99 of
    * (l_shipdate − o_orderdate) in days across line items, with the
    * NEGATIVE-lag count broken out (a ship date before its order date is
    * an ingestion defect, the temporal sibling of q179's FK orphans — it
    * must be counted, not averaged away). The fulfillment-SLA summary a
    * warehouse reports next to revenue.
    *
    * Exactness: lags are exact integer days (floor-epoch day keys, the
    * q108 convention); percentiles are rank-exact picks under the
    * (lag, orderkey, linenumber) total order; no interpolation.
    *
    * Scale shape: one key-projected join (dates and keys only — no wide
    * columns shuffle), an ungrouped bucketed [[DistRank]] layout (no
    * single-partition sort), map-side conditional-max picks, 1 row. */
  def q211ShipLag(spark: SparkSession, sfDir: String): DataFrame =
    shipLagOn(Tables(spark, sfDir, "orders"),
      Tables(spark, sfDir, "lineitem"))

  /** The lag core over ANY (orders, lineitem) pair — fixture-testable. */
  private[graft] def shipLagOn(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val lag = graft.CachedFrames.track(lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(floor(unix_timestamp(l_shipdate) / 86400.0D) AS BIGINT)")
          .as("sd"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(floor(unix_timestamp(o_orderdate) / 86400.0D) AS BIGINT)")
          .as("od")), "l_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("sd") - col("od")).as("lag_days")))
    val n = lag.agg(count(lit(1)).as("n_lines"))
    val picks = TextOps.LengthPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_lines + ${b - 1}) DIV $b"), col("lag_days")))
        .as(s"${name}_days")
    }
    val aggs = picks :+
      sum(when(col("lag_days") < 0, 1L).otherwise(0L)).as("n_negative")
    DistRank.withBucketedRank(lag, Seq(), "lag_days",
      Seq("l_orderkey", "l_linenumber"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_lines"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val q211ShipLagSql: String = {
    val cases = TextOps.LengthPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_lines + ${b - 1}) // $b THEN lag_days END) AS ${name}_days"
    }.mkString(",\n      ")
    s"""
    WITH lg AS (
      SELECT l.l_orderkey, l.l_linenumber,
        CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400
          - CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    r AS (
      SELECT lag_days,
        row_number() OVER (ORDER BY lag_days ASC, l_orderkey ASC,
          l_linenumber ASC) AS rk,
        count(*) OVER () AS n_lines
      FROM lg)
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
      $cases,
      CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_negative
    FROM r GROUP BY n_lines
  """
  }

  /** q212: MONTHLY REVENUE TREND — per calendar month: order count,
    * exact-cents revenue, and the month-over-month ratio against the
    * PRECEDING calendar month (a missing predecessor month → NULL, never
    * a silently-skipped gap: the month key is year·12+month, so the MoM
    * join is exact calendar adjacency). The finance-facing trend next to
    * the event-side q151/q199/q200 family; ratios instead of growth
    * percentages keep the output one exact division.
    *
    * Scale shape: ONE map-side |months|-row rollup of orders, a tiny
    * self equi-join on mkey−1. */
  def q212MonthlyRevenue(spark: SparkSession, sfDir: String): DataFrame =
    monthlyRevenueOn(Tables(spark, sfDir, "orders"))

  /** The monthly core over ANY orders frame — fixture-testable. */
  private[graft] def monthlyRevenueOn(orders: DataFrame): DataFrame = {
    val m = graft.CachedFrames.track(orders
      .select((year(col("o_orderdate")).cast("long") * 12
        + month(col("o_orderdate")).cast("long") - 1).as("mkey"),
        expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
          .as("cents"))
      .groupBy(col("mkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_cents")))
    m.join(m.select((col("mkey") + 1).as("mkey"),
        col("revenue_cents").as("prev_cents")), Seq("mkey"), "left")
      .select(expr("mkey DIV 12").as("year"),
        (col("mkey") % 12 + 1).as("month"),
        col("n_orders"), col("revenue_cents"),
        when(col("prev_cents") > 0, col("revenue_cents").cast("double")
          / col("prev_cents").cast("double")).as("mom_ratio"))
  }

  val q212MonthlyRevenueSql: String = """
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
          AS mkey,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1)
    SELECT a.mkey // 12 AS year, a.mkey % 12 + 1 AS month,
      a.n_orders, a.revenue_cents,
      CASE WHEN b.revenue_cents > 0 THEN
        CAST(a.revenue_cents AS DOUBLE) / CAST(b.revenue_cents AS DOUBLE) END
        AS mom_ratio
    FROM m a LEFT JOIN m b ON b.mkey = a.mkey - 1
  """

  /** q214: MONTHLY REVENUE TREND READOUT — q199's Mann–Kendall test and
    * q200's Theil–Sen slope applied to the CALENDAR-MONTH revenue series
    * (exact cents, months with no orders = 0 via [[Events.denseSeries]] —
    * the series-generic seam the daily trend family shares). One row:
    * is revenue monotonically drifting (tie-corrected z), and by how many
    * cents per month (the robust slope a forecast extrapolates), computed
    * on the same exactness contract as q199/q200 — the reuse proves the
    * trend cores are series-generic, not events-specific.
    *
    * Scale shape: one |months|-row rollup of orders; everything after is
    * calendar-bounded (the q199/q200 declared pair-cross contract over a
    * ~1e3-row-per-century frame). */
  def q214RevenueTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = Tables(spark, sfDir, "orders")
      .select((year(col("o_orderdate")).cast("long") * 12
        + month(col("o_orderdate")).cast("long") - 1).as("day"),
        expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
          .as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("c"))
    val dense = graft.CachedFrames.track(Events.denseSeries(obs))
    Events.mannKendallOfSeries(dense)
      .withColumnRenamed("n_days", "n_months")
      .crossJoin(broadcast(
        Events.theilSenOfSeries(dense, "slope_cents_per_month")))
  }

  val q214RevenueTrendSql: String = s"""
    WITH obs AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
          AS day,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS c
      FROM orders GROUP BY 1),
    ${Events.DenseFromObsCte},
    s AS (SELECT coalesce(CAST(sum(CASE WHEN b.c > a.c THEN 1
            WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT),
            CAST(0 AS BIGINT)) AS s_stat
          FROM dense a JOIN dense b ON b.day > a.day),
    tg AS (SELECT CAST(count(*) AS BIGINT) AS t FROM dense GROUP BY c),
    tt AS (SELECT coalesce(CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT),
             CAST(0 AS BIGINT)) AS tie_term FROM tg),
    v AS (SELECT n.n_months, s.s_stat,
            n.n_months * (n.n_months - 1) * (n.n_months * 2 + 5)
              - tt.tie_term AS var_num
          FROM (SELECT CAST(count(*) AS BIGINT) AS n_months FROM dense) n,
            s, tt),
    p AS (SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
            AS slope, a.day AS da, b.day AS db
          FROM dense a JOIN dense b ON b.day > a.day),
    r AS (SELECT slope, row_number() OVER (ORDER BY slope, da, db) AS rnk,
            CAST(count(*) OVER () AS BIGINT) AS m FROM p),
    ts AS (SELECT CAST(max(m) AS BIGINT) AS n_pairs,
            (max(CASE WHEN rnk = (m + 1) // 2 THEN slope END)
              + max(CASE WHEN rnk = m // 2 + 1 THEN slope END)) / 2e0
              AS slope_cents_per_month
           FROM r)
    SELECT v.n_months, v.s_stat, v.var_num,
      CASE WHEN v.var_num > 0 THEN
        (CASE WHEN v.s_stat > 0 THEN CAST(v.s_stat - 1 AS DOUBLE)
              WHEN v.s_stat < 0 THEN CAST(v.s_stat + 1 AS DOUBLE)
              ELSE 0e0 END)
          / sqrt(CAST(v.var_num AS DOUBLE) / 18e0) END AS z,
      ts.n_pairs, ts.slope_cents_per_month
    FROM v, ts
  """

  /** q216: SUPPLIER CONCENTRATION per brand — Herfindahl index of each
    * brand's shipped QUANTITY over its suppliers, with the effective
    * supplier count (q194's exact-integer HHI machinery on the supply
    * axis). The supply-chain risk table: a brand with eff_suppliers ≈ 1
    * has a single point of failure no matter how many supplier rows its
    * catalog lists, and is where a sourcing review starts. Quantities are
    * exact units (TPC-H quantities are integral; ⌊q+½⌋ makes the contract
    * explicit); eff = T²/Σc² is its OWN division of exact integers, never
    * 1/hhi of a rounded double (the q194 rule).
    *
    * Scale shape: one partkey-keyed equi-join to recover the brand (the
    * only data-sized shuffle), a map-side (brand, supplier) rollup, then
    * a |brands|-row rollup with Σc² in DECIMAL(38,0)/HUGEINT. */
  def q216SupplierHhi(spark: SparkSession, sfDir: String): DataFrame =
    supplierHhiOn(Tables(spark, sfDir, "lineitem"),
      Tables(spark, sfDir, "part"))

  /** The concentration core over ANY (lineitem, part) pair. */
  private[graft] def supplierHhiOn(lineitem: DataFrame,
      part: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_quantity + 0.5D) AS BIGINT)").as("qty"))
      .join(part.select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum(col("qty")).as("c"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("c")).as("t"),
        sum(d38(col("c")) * d38(col("c"))).as("c2"))
      .select(col("p_brand"), col("n_suppliers"),
        col("t").as("total_qty"),
        when(col("t") > 0, col("c2").cast("double")
          / (d38(col("t")) * d38(col("t"))).cast("double")).as("hhi"),
        when(col("c2") > 0, (d38(col("t")) * d38(col("t"))).cast("double")
          / col("c2").cast("double")).as("eff_suppliers"))
  }

  val q216SupplierHhiSql: String = """
    WITH c AS (
      SELECT p.p_brand, l.l_suppkey,
        CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    m AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
        CAST(sum(c) AS BIGINT) AS t,
        sum(CAST(c AS HUGEINT) * c) AS c2 -- guard:ok internal HUGEINT; outputs below are exact-cast
      FROM c GROUP BY 1)
    SELECT p_brand, n_suppliers, t AS total_qty,
      CASE WHEN t > 0 THEN
        CAST(CAST(c2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(t AS HUGEINT) * t AS VARCHAR) AS DOUBLE) END
        AS hhi,
      CASE WHEN c2 > 0 THEN
        CAST(CAST(CAST(t AS HUGEINT) * t AS VARCHAR) AS DOUBLE)
          / CAST(CAST(c2 AS VARCHAR) AS DOUBLE) END AS eff_suppliers
    FROM m
  """

  /** q217: SPEARMAN ρ between account balance and realized spend — does
    * c_acctbal predict what a customer actually orders? Ranks are robust
    * to the balance's scale and its NEGATIVE tail (TPC-H balances go
    * below zero), and customers with no orders count as spend 0 — they
    * are exactly the signal ("high balance, zero engagement") a
    * correlation that drops them would fabricate away. q173's rank engine
    * reused verbatim through [[TextOps.spearmanOfPairs]].
    *
    * Scale shape: one customer-keyed left join of the per-customer order
    * rollup, then the two-layout bucketed rank engine over one cached
    * |customers|-row frame (no single-partition sort). */
  def q217BalanceSpendRho(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.spearmanOfPairs(graft.CachedFrames.track(
      Tables(spark, sfDir, "customer")
        .select(col("c_custkey").as("pid"),
          expr("CAST(floor(c_acctbal * 100.0D + 0.5D) AS BIGINT)").as("q"))
        .join(Tables(spark, sfDir, "orders")
          .groupBy(col("o_custkey").as("pid"))
          .agg(sum(expr(
            "CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)"))
            .as("spend")), Seq("pid"), "left")
        .select(col("pid"), col("q"),
          coalesce(col("spend"), lit(0L)).as("nt"))))

  val q217BalanceSpendRhoSql: String = """
    WITH sp AS (
      SELECT o_custkey,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS spend
      FROM orders GROUP BY 1),
    x AS (
      SELECT c.c_custkey AS pid,
        CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS q,
        coalesce(sp.spend, CAST(0 AS BIGINT)) AS nt
      FROM customer c LEFT JOIN sp ON c.c_custkey = sp.o_custkey),
    r AS (
      SELECT pid,
        row_number() OVER (ORDER BY q ASC, pid ASC) AS rq,
        row_number() OVER (ORDER BY nt ASC, pid ASC) AS rl
      FROM x),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        sum(CAST(rq - rl AS HUGEINT) * CAST(rq - rl AS HUGEINT)) AS sd2 -- guard:ok internal HUGEINT; outputs below are exact-cast
      FROM r)
    SELECT n, CAST(CAST(sd2 AS VARCHAR) AS DOUBLE) AS sum_d2,
      CASE WHEN n >= 2 THEN
        1.0 - CAST(CAST(6 * sd2 AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1)
            AS VARCHAR) AS DOUBLE)
      END AS rho
    FROM s
  """

  /** q218: PRIORITY-MIX DRIFT — total variation distance between each
    * year's order-priority distribution and the PRECEDING year's (the
    * q108/q144 exact-TVD machinery on the warehouse axis): is the order
    * book's urgency profile shifting, year over year, as one bounded
    * [0, 1] number per adjacent-year pair. A priority present in only one
    * of the two years contributes its full mass (coalesced 0 on the other
    * side — the full-outer grid); a calendar gap produces NO pair row
    * (both years must exist), never a silent comparison across the gap.
    *
    * Exactness: TVD cross-multiplies to integers — ½·Σ|c_i·N' − c'_i·N| /
    * (N·N') — with the numerator summed exactly in DECIMAL(38,0)/HUGEINT
    * (exact to ~1e12 orders/year) and ONE final division.
    *
    * Scale shape: one map-side (year, priority) rollup; everything after
    * is |years|·|priorities| (schema × calendar — tiny). */
  def q218PriorityDrift(spark: SparkSession, sfDir: String): DataFrame =
    priorityDriftOn(Tables(spark, sfDir, "orders"))

  /** The drift core over ANY orders frame — fixture-testable. */
  private[graft] def priorityDriftOn(orders: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cells = graft.CachedFrames.track(orders
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderpriority").as("p"))
      .groupBy(col("yr"), col("p")).agg(count(lit(1)).as("c")))
    val totals = cells.groupBy(col("yr")).agg(sum(col("c")).as("n"))
    val shifted = cells.select((col("yr") + 1).as("yr"), col("p"),
      col("c").as("c_prev"))
    cells.join(shifted, Seq("yr", "p"), "full_outer")
      .select(col("yr"), col("p"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("c_prev"), lit(0L)).as("c_prev"))
      .join(totals, "yr")
      .join(totals.select((col("yr") + 1).as("yr"), col("n").as("n_prev")),
        "yr")
      .groupBy(col("yr"), col("n"), col("n_prev"))
      .agg(sum(abs(d38(col("c")) * d38(col("n_prev"))
        - d38(col("c_prev")) * d38(col("n")))).as("num"))
      .select(col("yr").as("year"), (col("yr") - 1).as("prev_year"),
        col("n").as("n_orders"), col("n_prev").as("prev_orders"),
        (col("num").cast("double")
          / (lit(2).cast("decimal(38,0)") * d38(col("n"))
            * d38(col("n_prev"))).cast("double")).as("tvd"))
  }

  val q218PriorityDriftSql: String = """
    WITH cells AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority AS p,
        CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2),
    t AS (SELECT yr, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
    b AS (SELECT yr + 1 AS yr, p, c AS c_prev FROM cells),
    j AS (
      SELECT coalesce(a.yr, b.yr) AS yr, coalesce(a.p, b.p) AS p,
        coalesce(a.c, CAST(0 AS BIGINT)) AS c,
        coalesce(b.c_prev, CAST(0 AS BIGINT)) AS c_prev
      FROM cells a FULL OUTER JOIN b ON a.yr = b.yr AND a.p = b.p),
    m AS (
      SELECT j.yr, t.n, tp.n AS n_prev,
        sum(abs(CAST(j.c AS HUGEINT) * tp.n -- guard:ok internal HUGEINT; the tvd below is exact-cast
          - CAST(j.c_prev AS HUGEINT) * t.n)) AS num
      FROM j JOIN t ON j.yr = t.yr JOIN t tp ON j.yr = tp.yr + 1
      GROUP BY 1, 2, 3)
    SELECT yr AS year, yr - 1 AS prev_year, n AS n_orders,
      n_prev AS prev_orders,
      CAST(CAST(num AS VARCHAR) AS DOUBLE)
        / CAST(CAST(2 * CAST(n AS HUGEINT) * n_prev AS VARCHAR) AS DOUBLE)
        AS tvd
    FROM m
  """

  /** q205: PARETO / ABC ANALYSIS of customer revenue — customers ranked
    * by total order revenue (descending, custkey tie-break) and cut into
    * the classic inventory classes: A = the head until the cumulative
    * share reaches 80%, B = until 95%, C = the tail. The "which 20% of
    * customers carry 80% of revenue" readout q189's Gini compresses to
    * one number — this names the actual head set a retention program or
    * a storage-tiering decision acts on. A customer belongs to the class
    * its cumulative span STARTS in (the boundary-crossing customer is
    * kept in the richer class) — a deterministic convention mirrored
    * verbatim in the oracle.
    *
    * Exactness: integer cents (q162's quantization); class cuts
    * cross-multiply to exact integers (5·cum_before < 4·T, 20·cum_before
    * < 19·T in DECIMAL(38,0)/HUGEINT — exact to ~1e37 cents); shares are
    * single divisions of exact BIGINTs.
    *
    * Scale shape: one customer collapse, ONE ungrouped bucketed
    * [[DistRank]] layout (no single-partition sort), the cumulative via
    * [[TextOps.distributedRunningSum]]'s two-phase bucketed prefix sum
    * (the q59 engine — offsets ride a broadcast, ReusedExchange shares
    * the one shuffle), a 3-row rollup. */
  def q205AbcAnalysis(spark: SparkSession, sfDir: String): DataFrame =
    abcOn(Tables(spark, sfDir, "orders"))

  /** The ABC core over ANY orders frame — fixture-testable. */
  private[graft] def abcOn(orders: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cust = graft.CachedFrames.track(
      orders.filter(col("o_custkey").isNotNull)
        .select(col("o_custkey"),
          expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
            .as("c_cents"))
        .groupBy(col("o_custkey")).agg(sum(col("c_cents")).as("cents")))
    val ranked = graft.CachedFrames.track(DistRank.withBucketedRank(
      cust.withColumn("nrev", -col("cents")), Seq(), "nrev",
      Seq("o_custkey"), "_r"))
    val slim = ranked.select(
      expr("substring(CAST(cents AS STRING), 1, 0)").as("source"),
      col("_r").as("doc_id"), col("cents"))
    val run = TextOps.distributedRunningSum(slim, "cents", Seq("doc_id"),
      slim).select(col("doc_id").as("_r2"), col("running"))
    val tot = cust.agg(sum(col("cents")).as("t"))
    ranked.join(run, col("_r") === col("_r2"))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(d38(col("running") - col("cents")) * 5 < d38(col("t")) * 4, "A")
          .when(d38(col("running") - col("cents")) * 20
            < d38(col("t")) * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("revenue_cents"), max(col("t")).as("_t"))
      .select(col("abc_class"), col("n_customers"), col("revenue_cents"),
        when(col("_t") > 0, col("revenue_cents").cast("double")
          / col("_t").cast("double")).as("revenue_share"))
  }

  val q205AbcAnalysisSql: String = """
    WITH u AS (
      SELECT o_custkey,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS cents
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
    r AS (
      SELECT o_custkey, cents,
        CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS running,
        CAST(sum(cents) OVER () AS BIGINT) AS t
      FROM u),
    c AS (
      SELECT CASE
          WHEN CAST(running - cents AS HUGEINT) * 5 < CAST(t AS HUGEINT) * 4
            THEN 'A'
          WHEN CAST(running - cents AS HUGEINT) * 20 < CAST(t AS HUGEINT) * 19
            THEN 'B'
          ELSE 'C' END AS abc_class,
        cents, t
      FROM r)
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
      CAST(sum(cents) AS BIGINT) AS revenue_cents,
      CASE WHEN t > 0 THEN
        CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / CAST(t AS DOUBLE) END
        AS revenue_share
    FROM c GROUP BY 1, t
  """

  /** q220: FUNCTIONAL-DEPENDENCY AUDIT — for each candidate dependency
    * X → Y over the warehouse, how far the data is from satisfying it, as
    * the g3 repair measure (Kivinen & Mannila 1995): the MINIMUM number of
    * rows to delete before the FD holds, which is exactly
    * Σ_x (rows(x) − max_y count(x, y)). The table a schema-inference or
    * data-contract layer is actually driven from: `holds` certifies an
    * invariant a downstream join may assume (and an optimizer may exploit
    * — an FD-holding key join can skip a re-aggregation); a large g3 on a
    * "should-hold" edge is an upstream data-entry defect with a priced
    * repair. Rows with a NULL LHS are excluded (no dependency is
    * assertable on an unknown key); a NULL RHS is a VALUE (two RHS values
    * NULL/'x' under one key is a violation, same as GROUP BY semantics).
    *
    * Exactness: all counts exact BIGINT; g3 is one final division.
    *
    * Scale shape: ONE map-side (x, y) rollup per edge (partial aggregation
    * absorbs the data size), then a |distinct x| rollup and a 1-row
    * reduce; the edges union into a |edges|-row frame. Never a self-join,
    * never row×row. */
  def q220FdAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables(spark, sfDir, "orders")
    val customer = Tables(spark, sfDir, "customer")
    val lineitem = Tables(spark, sfDir, "lineitem")
    val nation = Tables(spark, sfDir, "nation")
    def xy(df: DataFrame, x: String, y: String): DataFrame =
      df.select(col(x).cast("long").as("x"), col(y).cast("string").as("y"))
    Seq(
      ("orders: o_custkey -> o_orderpriority",
        xy(orders, "o_custkey", "o_orderpriority")),
      ("orders: o_orderkey -> o_orderstatus",
        xy(orders, "o_orderkey", "o_orderstatus")),
      ("customer: c_nationkey -> c_mktsegment",
        xy(customer, "c_nationkey", "c_mktsegment")),
      ("lineitem: l_orderkey -> l_returnflag",
        xy(lineitem, "l_orderkey", "l_returnflag")),
      ("lineitem: l_partkey -> l_suppkey",
        xy(lineitem, "l_partkey", "l_suppkey")),
      ("nation: n_nationkey -> n_regionkey",
        xy(nation, "n_nationkey", "n_regionkey")))
      .map { case (fd, df) => fdAuditOn(df, fd) }
      .reduce(_.unionByName(_))
  }

  /** The audit core over ANY (x, y) pair frame — fixture-testable. One
    * row out: group counts, the g3 repair bill, and the holds verdict. */
  private[graft] def fdAuditOn(pairs: DataFrame, fd: String): DataFrame =
    pairs.filter(col("x").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .groupBy(col("x"))
      .agg(sum(col("c")).as("nr"), count(lit(1)).as("ny"),
        max(col("c")).as("maxc"))
      .agg(coalesce(sum(col("nr")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        coalesce(sum(when(col("ny") > 1, 1L).otherwise(0L)), lit(0L))
          .as("violating_lhs"),
        coalesce(sum(col("nr") - col("maxc")), lit(0L)).as("repair_rows"))
      .select(lit(fd).as("fd"), col("n_rows"), col("n_lhs"),
        col("violating_lhs"), col("repair_rows"),
        when(col("n_rows") > 0, col("repair_rows").cast("double")
          / col("n_rows").cast("double")).as("g3"),
        (col("violating_lhs") === 0L).as("holds"))

  val q220FdAuditSql: String = {
    def edge(i: Int, fd: String, x: String, y: String, t: String) = s"""
    a$i AS (SELECT $x AS x, $y AS y, CAST(count(*) AS BIGINT) AS c
            FROM $t WHERE $x IS NOT NULL GROUP BY 1, 2),
    b$i AS (SELECT x, CAST(sum(c) AS BIGINT) AS nr,
              CAST(count(*) AS BIGINT) AS ny, CAST(max(c) AS BIGINT) AS maxc
            FROM a$i GROUP BY 1),
    r$i AS (SELECT '$fd' AS fd,
              coalesce(CAST(sum(nr) AS BIGINT), CAST(0 AS BIGINT)) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_lhs,
              coalesce(CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END)
                AS BIGINT), CAST(0 AS BIGINT)) AS violating_lhs,
              coalesce(CAST(sum(nr - maxc) AS BIGINT), CAST(0 AS BIGINT))
                AS repair_rows
            FROM b$i)"""
    val edges = Seq(
      ("orders: o_custkey -> o_orderpriority",
        "o_custkey", "o_orderpriority", "orders"),
      ("orders: o_orderkey -> o_orderstatus",
        "o_orderkey", "o_orderstatus", "orders"),
      ("customer: c_nationkey -> c_mktsegment",
        "c_nationkey", "c_mktsegment", "customer"),
      ("lineitem: l_orderkey -> l_returnflag",
        "l_orderkey", "l_returnflag", "lineitem"),
      ("lineitem: l_partkey -> l_suppkey",
        "l_partkey", "l_suppkey", "lineitem"),
      ("nation: n_nationkey -> n_regionkey",
        "n_nationkey", "n_regionkey", "nation"))
    val ctes = edges.zipWithIndex
      .map { case ((fd, x, y, t), i) => edge(i, fd, x, y, t) }
      .mkString(",")
    val unions = edges.indices.map(i => s"SELECT * FROM r$i")
      .mkString(" UNION ALL ")
    s"""WITH $ctes
    SELECT fd, n_rows, n_lhs, violating_lhs, repair_rows,
      CASE WHEN n_rows > 0 THEN
        CAST(repair_rows AS DOUBLE) / CAST(n_rows AS DOUBLE) END AS g3,
      violating_lhs = 0 AS holds
    FROM ($unions)"""
  }

  /** q225: MONTH-OF-YEAR REVENUE SEASONALITY — q222's one-way ANOVA core
    * on the zero-filled calendar-month revenue series (exact cents, the
    * q214 obs), grouped by month-of-year: how much of monthly revenue
    * variance the ANNUAL cycle explains (η²) and its F significance. The
    * deseasonalization go/no-go for the q214 trend readout — a large η²
    * says a December spike is cycle, not growth, and any YoY comparison
    * must be month-matched; the reuse proves [[Events.seasonalAnovaOn]]
    * is series-generic, not events-specific.
    *
    * Exactness and scale shape: q222's — the one non-portable step (the
    * ≤12-term between-SS sum) folds in group-key order in both engines;
    * one |months|-row rollup of orders, everything after ≤12 rows. */
  def q225MonthEffect(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = Tables(spark, sfDir, "orders")
      .select((year(col("o_orderdate")).cast("long") * 12
        + month(col("o_orderdate")).cast("long") - 1).as("day"),
        expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
          .as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("c"))
    Events.seasonalAnovaOn(Events.denseSeries(obs), 12)
  }

  val q225MonthEffectSql: String = s"""
    WITH obs AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
          AS day,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS c
      FROM orders GROUP BY 1),
    ${Events.DenseFromObsCte},
    ${Events.seasonalAnovaSqlFromDense(12)}
  """

  /** q223: SPEND-DECILE MOBILITY — the year-over-year transition grid of
    * customer revenue deciles (decile 1 = top spenders), for the latest
    * adjacent year pair in the order book, with each cell's independence
    * expectation, Pearson residual and lift from the shared q197 grid
    * core. The retention-economics readout q189's Gini and q205's static
    * ABC classes cannot give: a heavy diagonal says spend rank is sticky
    * (the head is a durable segment worth dedicated capacity); lift
    * concentrated in the (1, 10) corner names whale churn specifically.
    * Only customers active in BOTH years enter the grid — each year's
    * deciles are cut over that year's OWN roster, so margins are
    * front-loaded-equal by the ntile law applied to the joined subset's
    * parent, not forced uniform on the intersection (the off-uniform
    * margins are themselves signal: a decile overrepresented in the
    * survivor set retains better).
    *
    * Exactness: deciles are rank-exact [[DistRank.ntileOfRank]] cuts
    * (byte-identical to ANSI ntile) under the (spend DESC, custkey ASC)
    * total order; cell arithmetic is the grid core's exact
    * DECIMAL(38,0)/HUGEINT single divisions.
    *
    * Scale shape: ONE (custkey, year) map-side rollup; the two year
    * slices rank in ONE grouped bucketed [[DistRank]] layout (group =
    * year axis — r17: the two separate ungrouped layouts each paid their
    * own bounds/offsets barriers; the per-slice ranks are unchanged
    * because the group key IS the slice and each slice keeps its OWN
    * roster count for the ntile cut); one custkey pivot rollup replaces
    * the custkey equi-join; the grid is ≤100 label-space cells. */
  def q223SpendMobility(spark: SparkSession, sfDir: String): DataFrame =
    spendMobilityOn(Tables(spark, sfDir, "orders"))

  /** The mobility core over ANY orders frame — fixture-testable. */
  private[graft] def spendMobilityOn(orders: DataFrame): DataFrame = {
    val sp = graft.CachedFrames.track(orders
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
          .as("cents"))
      .groupBy(col("o_custkey"), col("yr"))
      .agg(sum(col("cents")).as("spend")))
    val yc = sp.agg(max(col("yr")).as("yc"))
    // axis 0 = previous year, axis 1 = current year; each axis's decile is
    // ntile over that axis's OWN roster (per-axis n joined back by axis)
    val two = sp.crossJoin(broadcast(yc))
      .filter(col("yr") === col("yc") || col("yr") === col("yc") - 1)
      .select(when(col("yr") === col("yc"), 1).otherwise(0).as("_axis"),
        col("o_custkey"), (-col("spend")).as("negsp"))
    val ns = two.groupBy(col("_axis")).agg(count(lit(1)).as("n"))
      .select(col("_axis").as("_nax"), col("n"))
    val deciles = DistRank.withBucketedRank(two, Seq("_axis"), "negsp",
        Seq("o_custkey"), "_r")
      .join(broadcast(ns), col("_axis") === col("_nax"))
      .withColumn("_d", DistRank.ntileOfRank("_r", "n", 10))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("_axis") === 0, col("_d"))).as("decile_prev"),
        max(when(col("_axis") === 1, col("_d"))).as("decile_curr"))
    Curation.contingencyGridOn(
      deciles
        .filter(col("decile_prev").isNotNull && col("decile_curr").isNotNull)
        .select(col("decile_prev"), col("decile_curr")),
      "decile_prev", "decile_curr")
  }

  val q223SpendMobilitySql: String = """
    WITH sp AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS spend
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2),
    yc AS (SELECT max(yr) AS yc FROM sp),
    dp AS (
      SELECT o_custkey, CAST(ntile(10) OVER (ORDER BY spend DESC,
        o_custkey ASC) AS INTEGER) AS decile_prev
      FROM sp, yc WHERE sp.yr = yc.yc - 1),
    dc AS (
      SELECT o_custkey, CAST(ntile(10) OVER (ORDER BY spend DESC,
        o_custkey ASC) AS INTEGER) AS decile_curr
      FROM sp, yc WHERE sp.yr = yc.yc),
    cells AS (
      SELECT dp.decile_prev, dc.decile_curr, CAST(count(*) AS BIGINT) AS o
      FROM dp JOIN dc USING (o_custkey) GROUP BY 1, 2),
    r AS (SELECT decile_prev, CAST(sum(o) AS BIGINT) AS rl
          FROM cells GROUP BY 1),
    c AS (SELECT decile_curr, CAST(sum(o) AS BIGINT) AS cs
          FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells)
    SELECT r.decile_prev, c.decile_curr,
      coalesce(cells.o, CAST(0 AS BIGINT)) AS n_obs,
      CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / CAST(n.nn AS DOUBLE) AS expected,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          - CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / sqrt(CAST(CAST(CAST(n.nn AS HUGEINT) * r.rl * c.cs AS VARCHAR)
          AS DOUBLE)) AS residual,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        AS lift
    FROM r CROSS JOIN c CROSS JOIN n
      LEFT JOIN cells ON cells.decile_prev = r.decile_prev
        AND cells.decile_curr = c.decile_curr
  """

  /** q224: INTER-ORDER GAP percentiles — rank-exact p50/p90/p99/max of
    * the day gap between each customer's CONSECUTIVE orders, with the
    * one-time-customer share broken out (customers with one order
    * contribute no gap — they must be counted, not silently shrink the
    * denominator). The purchase-cadence number between q210's lifetime
    * span (first→last, blind to rhythm) and q138's stickiness ratio
    * (calendar-windowed, blind to the individual clock): replenishment
    * SLAs, churn-definition windows (q181's week is an assumption — this
    * measures the real cadence) and campaign timing are all set from it.
    *
    * Exactness: gaps are exact integer days (floor-epoch keys); the picks
    * are rank-exact under the (gap, custkey, orderkey) total order.
    *
    * Scale shape: one key-projected pass; the lag window is PER-CUSTOMER
    * (bounded fanout — the q195-measured contract, never a global sort);
    * one ungrouped bucketed [[DistRank]] layout over the |orders|−
    * |customers| gap rows; map-side conditional-max picks, 1 row. */
  def q224OrderGap(spark: SparkSession, sfDir: String): DataFrame =
    orderGapOn(Tables(spark, sfDir, "orders"))

  /** The gap ROWS over a projected (o_custkey, o_orderkey, od) frame —
    * one row per consecutive order pair under the per-customer
    * (od, orderkey) total order. The single source the streaming twin
    * ([[graft.streaming.EventStreams.orderGapStream]]) mirrors row for
    * row. */
  private[graft] def orderGapsOn(o: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("od"), col("o_orderkey"))
    o.withColumn("prev", lag(col("od"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("od") - col("prev")).as("gap_days"))
  }

  /** The cadence core over ANY orders frame — fixture-testable. */
  private[graft] def orderGapOn(orders: DataFrame): DataFrame = {
    val o = graft.CachedFrames.track(orders
      .filter(col("o_custkey").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(floor(unix_timestamp(o_orderdate) / 86400.0D) AS BIGINT)")
          .as("od")))
    val gaps = graft.CachedFrames.track(orderGapsOn(o))
    val custs = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("no"))
      .agg(count(lit(1)).as("n_customers"),
        coalesce(sum(when(col("no") === 1, 1L).otherwise(0L)), lit(0L))
          .as("one_time"))
    val n = gaps.agg(count(lit(1)).as("n_gaps"))
    val picks = TextOps.LengthPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_gaps + ${b - 1}) DIV $b"), col("gap_days")))
        .as(s"${name}_days")
    }
    val aggs = picks :+ max(col("gap_days")).as("max_days")
    val stats = DistRank.withBucketedRank(gaps, Seq(), "gap_days",
      Seq("o_custkey", "o_orderkey"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_gaps"))
      .agg(aggs.head, aggs.tail: _*)
    custs.crossJoin(broadcast(stats))
      .select(col("n_customers"), col("one_time"),
        when(col("n_customers") > 0, col("one_time").cast("double")
          / col("n_customers").cast("double")).as("one_time_share"),
        col("n_gaps"), col("p50_days"), col("p90_days"), col("p99_days"),
        col("max_days"))
  }

  val q224OrderGapSql: String = {
    val cases = TextOps.LengthPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_gaps + ${b - 1}) // $b THEN gap_days END) AS ${name}_days"
    }.mkString(",\n      ")
    s"""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
        CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS od
      FROM orders WHERE o_custkey IS NOT NULL),
    g AS (
      SELECT o_custkey, o_orderkey,
        od - lag(od) OVER (PARTITION BY o_custkey
          ORDER BY od, o_orderkey) AS gap_days
      FROM o),
    gg AS (SELECT o_custkey, o_orderkey, gap_days FROM g
           WHERE gap_days IS NOT NULL),
    cu AS (
      SELECT CAST(count(*) AS BIGINT) AS n_customers,
        coalesce(CAST(sum(CASE WHEN no = 1 THEN 1 ELSE 0 END) AS BIGINT),
          CAST(0 AS BIGINT)) AS one_time
      FROM (SELECT o_custkey, count(*) AS no FROM o GROUP BY 1)),
    r AS (
      SELECT gap_days,
        row_number() OVER (ORDER BY gap_days ASC, o_custkey ASC,
          o_orderkey ASC) AS rk,
        count(*) OVER () AS n_gaps
      FROM gg),
    st AS (
      SELECT CAST(n_gaps AS BIGINT) AS n_gaps,
      $cases,
      max(gap_days) AS max_days
      FROM r GROUP BY n_gaps)
    SELECT cu.n_customers, cu.one_time,
      CASE WHEN cu.n_customers > 0 THEN
        CAST(cu.one_time AS DOUBLE) / CAST(cu.n_customers AS DOUBLE) END
        AS one_time_share,
      st.n_gaps, st.p50_days, st.p90_days, st.p99_days, st.max_days
    FROM cu CROSS JOIN st
  """
  }

  /** q226: DISCOUNT ELASTICITY — exact ordinary-least-squares fit of
    * shipped quantity on the discount rate (basis points) across all line
    * items: does a deeper discount actually move volume, as a slope
    * (units per bp), the zero-discount baseline (intercept) and the
    * variance explained (r²). The pricing-team number behind TPC-H Q6's
    * "what if" revenue delta: Q6 prices a hypothetical discount band,
    * this measures the demand response the hypothesis assumes. OLS on
    * EXACT integer sufficient statistics — never a re-ordered double sum;
    * a constant-discount corpus (den = 0) reports NULL slope/r², never a
    * division error.
    *
    * Exactness: [[Ols.coreOn]] — moments exact in DECIMAL(38,0)/HUGEINT
    * (bp ≤ 1e4, qty ≤ 1e2 keep the products inside 38 digits past 1e12
    * rows); slope = num/den is one division; intercept and r² are fixed
    * chains on exact-cast doubles, identical op order in both engines.
    *
    * Scale shape: ONE map-side pass over lineitem (partial aggregation
    * absorbs everything), 1 row out. No joins, no shuffle beyond the
    * 6-counter funnel. */
  def q226DiscountElasticity(spark: SparkSession, sfDir: String): DataFrame =
    discountElasticityOn(Tables(spark, sfDir, "lineitem"))

  /** The elasticity readout over ANY lineitem frame — fixture-testable. */
  private[graft] def discountElasticityOn(lineitem: DataFrame): DataFrame =
    Ols.coreOn(lineitem.select(
      expr("CAST(floor(l_discount * 10000.0D + 0.5D) AS BIGINT)").as("x"),
      expr("CAST(floor(l_quantity + 0.5D) AS BIGINT)").as("y")))
      .select(col("n").as("n_lines"),
        when(col("den") > 0, col("num").cast("double")
          / col("den").cast("double")).as("slope_qty_per_bp"),
        when(col("den") > 0, (col("sy").cast("double")
          - col("num").cast("double") / col("den").cast("double")
            * col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept_qty"),
        when(col("den") > 0 && col("deny") > 0,
          col("num").cast("double") * col("num").cast("double")
            / (col("den").cast("double") * col("deny").cast("double")))
          .as("r2"))

  val q226DiscountElasticitySql: String = s"""
    WITH p AS (
      SELECT CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS x,
        CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
      FROM lineitem),
    ${Ols.CoreSqlFromP}
    SELECT n AS n_lines,
      CASE WHEN den > 0 THEN CAST(CAST(num AS VARCHAR) AS DOUBLE)
        / CAST(CAST(den AS VARCHAR) AS DOUBLE) END AS slope_qty_per_bp,
      CASE WHEN den > 0 THEN (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        - CAST(CAST(num AS VARCHAR) AS DOUBLE)
          / CAST(CAST(den AS VARCHAR) AS DOUBLE)
          * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE) END
        AS intercept_qty,
      CASE WHEN den > 0 AND deny > 0 THEN
        CAST(CAST(num AS VARCHAR) AS DOUBLE)
          * CAST(CAST(num AS VARCHAR) AS DOUBLE)
          / (CAST(CAST(den AS VARCHAR) AS DOUBLE)
            * CAST(CAST(deny AS VARCHAR) AS DOUBLE)) END AS r2
    FROM d
  """

  /** q228: BENFORD AUDIT OF ORDER TOTALS — q177's first-significant-digit
    * screen on the axis Benford's law was actually validated on: monetary
    * invoice amounts. Order totals are SUMS of priced line items (organic
    * multiplicative spread), so conformance is expected and deviation is
    * the forensic flag — a pile-up just under a digit boundary is the
    * classic approval-threshold-gaming signature, and a synthetic-data
    * generator that draws totals uniformly fails this audit immediately
    * (the honest reading at this repo's SFs). Same 9-row contract as
    * q177: exact counts, one division, the shared [[Events.BenfordP]]
    * literals, zero-count digits still reported.
    *
    * Scale shape: q177's — one map-side ≤9-group rollup, a 1-row total,
    * the 9-row literal grid. Nothing scales past the scan. */
  def q228PriceBenford(spark: SparkSession, sfDir: String): DataFrame =
    Events.benfordOfCents(Tables(spark, sfDir, "orders").select(
      expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
        .as("cents")))

  val q228PriceBenfordSql: String = Events.benfordSqlFromCents(
    "SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents " +
      "FROM orders")

  /** q235: SHIP-LAG BY PRIORITY — q211's fulfillment percentiles sliced
    * by order priority: does 1-URGENT actually ship faster than
    * 5-LOW, as rank-exact p50/p90/p99/max per priority with the
    * negative-lag defects broken out per slice. THE SLA verification
    * table: q211 prices fulfillment marginally, q233 shows who ORDERS
    * urgently — this shows whether urgency buys anything, which is the
    * number the priority tier is sold on (and at these synthetic SFs the
    * honest answer is a flat table — itself the finding).
    *
    * Exactness: q211's — exact integer day lags, rank-exact picks under
    * the per-priority (lag, orderkey, linenumber) total order.
    *
    * Scale shape: one key-projected join, a GROUPED bucketed [[DistRank]]
    * layout (B-way parallel per priority — no per-group single-task
    * sort), broadcast group sizes, |priorities| rows out. */
  def q235PriorityShipLag(spark: SparkSession, sfDir: String): DataFrame =
    priorityShipLagOn(Tables(spark, sfDir, "orders"),
      Tables(spark, sfDir, "lineitem"))

  /** The sliced-lag core over ANY (orders, lineitem) pair. */
  private[graft] def priorityShipLagOn(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val lag = graft.CachedFrames.track(lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(floor(unix_timestamp(l_shipdate) / 86400.0D) AS BIGINT)")
          .as("sd"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority").as("prio"),
        expr("CAST(floor(unix_timestamp(o_orderdate) / 86400.0D) AS BIGINT)")
          .as("od")), "l_orderkey")
      .select(col("prio"), col("l_orderkey"), col("l_linenumber"),
        (col("sd") - col("od")).as("lag_days")))
    val sizes = lag.groupBy(col("prio")).agg(count(lit(1)).as("n_lines"))
      .select(col("prio").as("_psz"), col("n_lines"))
    val picks = TextOps.LengthPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_lines + ${b - 1}) DIV $b"), col("lag_days")))
        .as(s"${name}_days")
    }
    val aggs = picks :+ max(col("lag_days")).as("max_days") :+
      sum(when(col("lag_days") < 0, 1L).otherwise(0L)).as("n_negative")
    DistRank.withBucketedRank(lag, Seq("prio"), "lag_days",
      Seq("l_orderkey", "l_linenumber"), "_r")
      .join(broadcast(sizes), col("prio") <=> col("_psz"))
      .groupBy(col("prio"), col("n_lines"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("prio").as("o_orderpriority"), col("n_lines"),
        col("p50_days"), col("p90_days"), col("p99_days"), col("max_days"),
        col("n_negative"))
  }

  val q235PriorityShipLagSql: String = {
    val cases = TextOps.LengthPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_lines + ${b - 1}) // $b THEN lag_days END) AS ${name}_days"
    }.mkString(",\n      ")
    s"""
    WITH lg AS (
      SELECT o.o_orderpriority AS prio, l.l_orderkey, l.l_linenumber,
        CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400
          - CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    r AS (
      SELECT prio, lag_days,
        row_number() OVER (PARTITION BY prio ORDER BY lag_days ASC,
          l_orderkey ASC, l_linenumber ASC) AS rk,
        count(*) OVER (PARTITION BY prio) AS n_lines
      FROM lg)
    SELECT prio AS o_orderpriority, CAST(n_lines AS BIGINT) AS n_lines,
      $cases,
      max(lag_days) AS max_days,
      CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_negative
    FROM r GROUP BY prio, n_lines
  """
  }

  /** q236: LEDGER RECONCILIATION — does the order header's total agree
    * with the sum of its own line items priced at
    * extendedprice·(1−discount)·(1+tax)? The classic two-book audit:
    * q179 checks the KEYS agree across tables, this checks the MONEY
    * does — per-order delta in exact cents, the exact-match rate,
    * headerless-total orders (no line items) broken out, and rank-exact
    * p50/p99/max |delta| so a systematic rounding-convention gap (tight
    * percentile band) is distinguishable from data corruption (fat max).
    * On a generator that does not maintain the invariant, the honest
    * output is a large mismatch rate — which is the finding, exactly as
    * an auditor would report it.
    *
    * Exactness: both books are floored to cents through the IDENTICAL
    * double chain in both engines (fixed multiplication order, one
    * floor), then every delta/count is exact BIGINT; percentile picks
    * are rank-exact under (|delta|, orderkey).
    *
    * Scale shape: one map-side per-order line rollup, ONE orderkey
    * equi-join, an ungrouped bucketed [[DistRank]] layout over |orders|
    * rows, 1 row out. */
  def q236LedgerRecon(spark: SparkSession, sfDir: String): DataFrame =
    ledgerReconOn(Tables(spark, sfDir, "orders"),
      Tables(spark, sfDir, "lineitem"))

  /** The reconciliation core over ANY (orders, lineitem) pair. */
  private[graft] def ledgerReconOn(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val lsum = lineitem
      .select(col("l_orderkey"), expr(
        "CAST(floor(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax)" +
          " * 100.0D + 0.5D) AS BIGINT)").as("lc"))
      .groupBy(col("l_orderkey")).agg(sum(col("lc")).as("lsum"))
    val deltas = graft.CachedFrames.track(orders
      .select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)")
          .as("oc"))
      .join(lsum, Seq("l_orderkey"), "left")
      .select(col("l_orderkey").as("okey"),
        (col("oc") - coalesce(col("lsum"), lit(0L))).as("delta"),
        col("lsum").isNull.as("no_lines"))
      .select(col("okey"), col("delta"), abs(col("delta")).as("adelta"),
        col("no_lines")))
    val n = deltas.agg(count(lit(1)).as("n_orders"))
    // p50/p99 only: the band-vs-corruption read needs the middle and the
    // tail, not the q140 trio
    val picks = Seq(("p50", 1, 2), ("p99", 99, 100)).map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_orders + ${b - 1}) DIV $b"), col("adelta")))
        .as(s"${name}_abs_delta")
    }
    val aggs = picks ++ Seq(
      max(col("adelta")).as("max_abs_delta"),
      sum(when(col("delta") === 0L, 1L).otherwise(0L)).as("n_matched"),
      sum(when(col("no_lines"), 1L).otherwise(0L)).as("n_no_lines"),
      sum(col("adelta")).as("sum_abs_delta"))
    DistRank.withBucketedRank(deltas, Seq(), "adelta", Seq("okey"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_orders"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_orders"), col("n_matched"),
        when(col("n_orders") > 0, col("n_matched").cast("double")
          / col("n_orders").cast("double")).as("match_rate"),
        col("n_no_lines"), col("sum_abs_delta"),
        col("p50_abs_delta"), col("p99_abs_delta"), col("max_abs_delta"))
  }

  val q236LedgerReconSql: String = {
    val cases = Seq(("p50", 1, 2), ("p99", 99, 100)).map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_orders + ${b - 1}) // $b THEN adelta END) AS ${name}_abs_delta"
    }.mkString(",\n      ")
    s"""
    WITH ls AS (
      SELECT l_orderkey,
        CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
          * (1.0 + l_tax) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS lsum
      FROM lineitem GROUP BY 1),
    d AS (
      SELECT o.o_orderkey AS okey,
        CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
          - coalesce(ls.lsum, CAST(0 AS BIGINT)) AS delta,
        abs(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
          - coalesce(ls.lsum, CAST(0 AS BIGINT))) AS adelta,
        ls.lsum IS NULL AS no_lines
      FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey),
    r AS (
      SELECT delta, adelta, no_lines,
        row_number() OVER (ORDER BY adelta ASC, okey ASC) AS rk,
        count(*) OVER () AS n_orders
      FROM d)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
      CAST(sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_matched,
      CASE WHEN n_orders > 0 THEN
        CAST(sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(n_orders AS DOUBLE) END AS match_rate,
      CAST(sum(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT)
        AS n_no_lines,
      CAST(sum(adelta) AS BIGINT) AS sum_abs_delta,
      $cases,
      max(adelta) AS max_abs_delta
    FROM r GROUP BY n_orders
  """
  }

  /** q233: SEGMENT × PRIORITY BUSINESS-MIX GRID — does order urgency
    * depend on customer segment, as the full observed-vs-expected
    * contingency (the shared q197 grid core's 5th axis): expectation,
    * Pearson residual and lift per cell, empty cells included. The
    * warehouse-side interaction audit next to q197's lang×source — a
    * residual ridge (e.g. AUTOMOBILE × 1-URGENT) says priority-based
    * capacity planning must be segment-conditioned, and an SLA priced on
    * the marginal priority mix misprices exactly those segments. Orders
    * without a customer are excluded (no segment is attributable).
    *
    * Exactness and scale shape: the grid core's — ONE custkey-keyed
    * equi-join (segment is a broadcast-sized dimension payload), one
    * map-side cell rollup, margins re-aggregating the cached cells,
    * ≤|segments|·|priorities| label-space rows. */
  def q233SegPriorityGrid(spark: SparkSession, sfDir: String): DataFrame =
    Curation.contingencyGridOn(
      Tables(spark, sfDir, "orders")
        .filter(col("o_custkey").isNotNull)
        .select(col("o_custkey"), col("o_orderpriority"))
        .join(Tables(spark, sfDir, "customer")
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment")), "o_custkey")
        .select(col("c_mktsegment"), col("o_orderpriority")),
      "c_mktsegment", "o_orderpriority")

  val q233SegPriorityGridSql: String = """
    WITH cells AS (
      SELECT c.c_mktsegment, o.o_orderpriority, CAST(count(*) AS BIGINT) AS o
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    r AS (SELECT c_mktsegment, CAST(sum(o) AS BIGINT) AS rl
          FROM cells GROUP BY 1),
    c AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS cs
          FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells)
    SELECT r.c_mktsegment, c.o_orderpriority,
      coalesce(cells.o, CAST(0 AS BIGINT)) AS n_obs,
      CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / CAST(n.nn AS DOUBLE) AS expected,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          - CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / sqrt(CAST(CAST(CAST(n.nn AS HUGEINT) * r.rl * c.cs AS VARCHAR)
          AS DOUBLE)) AS residual,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        AS lift
    FROM r CROSS JOIN c CROSS JOIN n
      LEFT JOIN cells ON cells.c_mktsegment = r.c_mktsegment
        AND cells.o_orderpriority = c.o_orderpriority
  """

  /** q243 tuning: RFM quintiles. */
  private[ops] val RfmBuckets = 5

  /** q243: RFM SEGMENTATION — the classic customer-value layout: per
    * customer, Recency (days from their last order to the warehouse's
    * last order date), Frequency (order count) and Monetary (lifetime
    * spend in exact cents), each cut into rank-exact quintiles (1 = most
    * recent / most frequent / biggest spender), rolled into the
    * (r, f, m) segment grid with customer counts and the spend share
    * each segment carries. The capacity question q223's year-over-year
    * mobility doesn't answer: where the VALUE sits right now — a
    * (1,1,1) cell carrying half the spend is a concentration risk, a fat
    * (5,5,5) cell is dead weight a retention campaign can't move.
    *
    * Exactness: recency/frequency/monetary are exact integers (cents
    * convention); quintile cuts are the rank-exact
    * [[DistRank.ntileOfRank]] arithmetic under fully-tie-broken orders
    * (ties to the lower custkey, pinned both engines); per-cell counts
    * and spend sums exact; spend_share is one exact-cast division.
    *
    * Scale shape: ONE per-customer rollup (map-side combinable), then ONE
    * grouped bucketed [[DistRank]] layout over the 3-axis unpivot (group =
    * axis — r17: the three separate ungrouped layouts each paid their own
    * bounds/offsets barriers and rank exchange; stacking the axes ranks
    * all three in a single window pass over 3n rows, and per-axis ranks
    * are unchanged because the group key IS the axis), one custkey pivot
    * rollup, one custkey equi-join, a ≤5³-cell label-space rollup riding
    * one broadcast total. */
  def q243RfmSegments(spark: SparkSession, sfDir: String): DataFrame =
    rfmSegmentsOn(Tables(spark, sfDir, "orders"))

  /** The RFM core over ANY orders frame — fixture-testable. */
  private[graft] def rfmSegmentsOn(orders: DataFrame): DataFrame = {
    val cust = graft.CachedFrames.track(orders
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)"))
          .as("cents")))
    val gmax = cust.agg(max(col("last_d")).as("gd"))
    val base = graft.CachedFrames.track(cust.crossJoin(broadcast(gmax))
      .select(col("o_custkey"),
        datediff(col("gd"), col("last_d")).cast("long").as("recency"),
        col("freq"), col("cents")))
    val n = base.agg(count(lit(1)).as("n"))
    // all three axes are exact BIGINTs, so one stacked long column keeps
    // the integral bucket path; every customer appears once per axis, so
    // the conditional-max pivot is a deterministic 1-of-1 pick
    val axes = base.select(col("o_custkey"), expr(
      "stack(3, 0, recency, 1, -freq, 2, -cents) AS (_axis, _k)"))
    val quintiles = DistRank.withBucketedRank(axes, Seq("_axis"), "_k",
        Seq("o_custkey"), "_r")
      .crossJoin(broadcast(n))
      .withColumn("_q", DistRank.ntileOfRank("_r", "n", RfmBuckets))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("_axis") === 0, col("_q"))).as("r_q"),
        max(when(col("_axis") === 1, col("_q"))).as("f_q"),
        max(when(col("_axis") === 2, col("_q"))).as("m_q"))
    val seg = base
      .join(quintiles, "o_custkey")
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("segment_spend_cents"))
    val tot = seg.agg(sum(col("segment_spend_cents")).as("ts"))
    seg.crossJoin(broadcast(tot))
      .select(col("r_q"), col("f_q"), col("m_q"), col("n_customers"),
        col("segment_spend_cents"),
        when(col("ts") > 0, col("segment_spend_cents").cast("double")
          / col("ts").cast("double")).as("spend_share"))
  }

  val q243RfmSegmentsSql: String = s"""
    WITH cust AS (
      SELECT o_custkey, max(o_orderdate) AS last_d,
        CAST(count(*) AS BIGINT) AS freq,
        CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
          AS BIGINT) AS cents
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
    g AS (SELECT max(last_d) AS gd FROM cust),
    base AS (
      SELECT o_custkey,
        CAST(date_diff('day', last_d, gd) AS BIGINT) AS recency,
        freq, cents
      FROM cust, g),
    q AS (
      SELECT o_custkey, cents,
        ntile($RfmBuckets) OVER (ORDER BY recency, o_custkey) AS r_q,
        ntile($RfmBuckets) OVER (ORDER BY -freq, o_custkey) AS f_q,
        ntile($RfmBuckets) OVER (ORDER BY -cents, o_custkey) AS m_q
      FROM base),
    seg AS (
      SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
        CAST(sum(cents) AS BIGINT) AS segment_spend_cents
      FROM q GROUP BY 1, 2, 3),
    t AS (SELECT CAST(sum(segment_spend_cents) AS BIGINT) AS ts FROM seg)
    SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
      CAST(m_q AS INTEGER) AS m_q, n_customers, segment_spend_cents,
      CASE WHEN ts > 0 THEN CAST(segment_spend_cents AS DOUBLE)
        / CAST(ts AS DOUBLE) END AS spend_share
    FROM seg, t
  """

  /** q244 tuning: minimum co-occurrence count for a reported pair. */
  private[ops] val BasketMinSupport = 3

  /** q244: MARKET-BASKET AFFINITY — part pairs that co-occur within
    * orders, with exact lift: for each pair appearing in at least
    * [[BasketMinSupport]] orders, lift = N·c_ab/(c_a·c_b) (>1 means the
    * parts attract; the association-rule screen run before any
    * recommender). Multiple lines of the same part in one order count
    * once (distinct items per basket).
    *
    * Exactness: all counts exact BIGINT; lift is one exact-cast division
    * of exact integer products (DECIMAL(38,0)/HUGEINT cross-multiplied —
    * exact to N·c_ab ≤ 1e38).
    *
    * Scale shape: the pair join is a self-equi-join on orderkey — work
    * Σ_o |items_o|², bounded by the BASKET size (TPC-H ≤ 7 lines), never
    * parts²; the support floor prunes before the part-count joins; part
    * counts broadcast-join back onto the surviving pairs. */
  def q244BasketLift(spark: SparkSession, sfDir: String): DataFrame =
    basketLiftOn(Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")))

  /** The affinity core over ANY (l_orderkey, l_partkey) frame —
    * fixture-testable. */
  private[graft] def basketLiftOn(lines: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val items = graft.CachedFrames.track(
      lines.select(col("l_orderkey"), col("l_partkey")).distinct())
    val nOrders = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val partCounts = graft.CachedFrames.track(
      items.groupBy(col("l_partkey")).agg(count(lit(1)).as("cp")))
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
        "l_orderkey")
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= BasketMinSupport)
    pairs
      .join(partCounts.select(col("l_partkey").as("p1"), col("cp").as("c1")),
        "p1")
      .join(partCounts.select(col("l_partkey").as("p2"), col("cp").as("c2")),
        "p2")
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("pair_count"), col("c1"), col("c2"),
        ((d38(col("n_orders")) * d38(col("pair_count"))).cast("double")
          / (d38(col("c1")) * d38(col("c2"))).cast("double")).as("lift"))
  }

  val q244BasketLiftSql: String = s"""
    WITH it AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM it),
    pc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cp
           FROM it GROUP BY 1),
    p AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        CAST(count(*) AS BIGINT) AS pair_count
      FROM it a JOIN it b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= $BasketMinSupport)
    SELECT p.p1, p.p2, p.pair_count, c1.cp AS c1, c2.cp AS c2,
      CAST(CAST(CAST(n.n_orders AS HUGEINT) * p.pair_count AS VARCHAR)
        AS DOUBLE)
        / CAST(CAST(CAST(c1.cp AS HUGEINT) * c2.cp AS VARCHAR) AS DOUBLE)
        AS lift
    FROM p JOIN pc c1 ON p.p1 = c1.l_partkey
      JOIN pc c2 ON p.p2 = c2.l_partkey, n
  """

  /** q246 tuning: the on-time threshold (days from order to line ship)
    * and the Wilson z — BOTH z and z² are precomputed literals
    * interpolated into both engines with the e0/D double-literal
    * suffixes (the NdcgDisc discipline — bare decimal literals parse as
    * DECIMAL and their DECIMAL→DOUBLE conversion cost q246 a 1-ULP
    * mismatch on first landing). */
  private[ops] val OnTimeDays = 60L
  private[ops] val WilsonZ = 1.959963984540054
  private[ops] val WilsonZ2 = WilsonZ * WilsonZ

  /** q246: SUPPLIER ON-TIME RELIABILITY with a Wilson lower bound — per
    * supplier: line shipments, the count shipped within [[OnTimeDays]]
    * of the order date, the raw rate, and the 95% Wilson score lower
    * bound — the SHRUNK rate that makes a 9/10 supplier comparable to a
    * 900/1000 one (raw rates tie at 0.9; Wilson ranks the big sample
    * higher), the standard fix before any supplier scorecard ranks on a
    * ratio of small counts.
    *
    * Exactness: counts exact; the rate is one division; the Wilson chain
    * is a FIXED sequence of exactly-rounded IEEE ops (+,−,·,/,sqrt) over
    * the exact-cast counts and the two shared literals — written as the
    * textually identical expression in both engines, so every
    * intermediate rounds identically.
    *
    * Scale shape: one key-projected join (dates + keys only), one
    * per-supplier map-side rollup — |suppliers| rows out. */
  def q246SupplierReliability(spark: SparkSession, sfDir: String): DataFrame =
    supplierReliabilityOn(Tables(spark, sfDir, "orders"),
      Tables(spark, sfDir, "lineitem"))

  /** The reliability core over ANY (orders, lineitem) pair —
    * fixture-testable. */
  private[graft] def supplierReliabilityOn(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val lag = lineitem
      .select(col("l_suppkey"), col("l_orderkey"),
        expr("CAST(floor(unix_timestamp(l_shipdate) / 86400.0D) AS BIGINT)")
          .as("sd"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(floor(unix_timestamp(o_orderdate) / 86400.0D) AS BIGINT)")
          .as("od")), "l_orderkey")
      .select(col("l_suppkey"),
        when(col("sd") - col("od") <= OnTimeDays, 1L).otherwise(0L).as("ot"))
    lag.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("ot")).as("n_on_time"))
      .withColumn("on_time_rate", expr(
        "CAST(n_on_time AS DOUBLE) / CAST(n_lines AS DOUBLE)"))
      .withColumn("wilson_lb", expr(wilsonLbExpr))
      .select(col("l_suppkey"), col("n_lines"), col("n_on_time"),
        col("on_time_rate"), col("wilson_lb"))
  }

  /** The ONE textual Wilson chain both engines evaluate (columns
    * n_on_time / n_lines / on_time_rate in scope). */
  private def wilsonLbExpr: String = s"""
    (on_time_rate + ${WilsonZ2}D / (2.0D * CAST(n_lines AS DOUBLE))
      - ${WilsonZ}D * sqrt(on_time_rate * (1.0D - on_time_rate)
          / CAST(n_lines AS DOUBLE)
        + ${WilsonZ2}D / (4.0D * (CAST(n_lines AS DOUBLE)
          * CAST(n_lines AS DOUBLE)))))
    / (1.0D + ${WilsonZ2}D / CAST(n_lines AS DOUBLE))"""

  val q246SupplierReliabilitySql: String = s"""
    WITH lag AS (
      SELECT l.l_suppkey,
        CASE WHEN CAST(floor(epoch(l.l_shipdate) / 86400.0) AS BIGINT)
          - CAST(floor(epoch(o.o_orderdate) / 86400.0) AS BIGINT)
          <= $OnTimeDays THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
          AS ot
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    s AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
        CAST(sum(ot) AS BIGINT) AS n_on_time
      FROM lag GROUP BY 1),
    r AS (
      SELECT *, CAST(n_on_time AS DOUBLE) / CAST(n_lines AS DOUBLE)
        AS on_time_rate
      FROM s)
    SELECT l_suppkey, n_lines, n_on_time, on_time_rate,
      (on_time_rate + ${WilsonZ2}e0 / (2.0e0 * CAST(n_lines AS DOUBLE))
        - ${WilsonZ}e0 * sqrt(on_time_rate * (1.0e0 - on_time_rate)
            / CAST(n_lines AS DOUBLE)
          + ${WilsonZ2}e0 / (4.0e0 * (CAST(n_lines AS DOUBLE)
            * CAST(n_lines AS DOUBLE)))))
      / (1.0e0 + ${WilsonZ2}e0 / CAST(n_lines AS DOUBLE)) AS wilson_lb
    FROM r
  """
  /** q256: COHORT LTV CURVE — cumulative revenue per acquisition cohort by
    * month index, the lifetime-value readout next to q102's retention
    * matrix (that one counts WHO came back; this one prices WHAT they
    * spent). A customer's cohort is the calendar month of their first
    * order (mkey = year·12 + month − 1, pure integer arithmetic — no
    * timezone surface); each (cohort, month-index k) cell reports active
    * customers, that month's revenue, the running cumulative revenue, and
    * cumulative LTV per cohort member — the curve a growth team reads to
    * see whether newer cohorts monetize faster.
    *
    * Exactness: revenue rides the q212 cents convention
    * (floor(price·100 + 0.5) BIGINT — o_totalprice has two decimals at
    * every SF, so cents are exact); counts exact; the cumulative sum is
    * an integer window; LTV is ONE division per row.
    *
    * Scale shape: one corpus-sized groupBy for first-order months, one
    * for the (cohort, month) cells (both map-side combinable); the
    * cumulative window partitions by cohort over |cohorts × months| rows
    * — never a global ORDER window; cohort sizes broadcast back. */
  def q256CohortLtv(spark: SparkSession, sfDir: String): DataFrame =
    cohortLtvOn(Tables(spark, sfDir, "orders"))

  /** The LTV core over ANY orders frame — fixture-testable. */
  private[graft] def cohortLtvOn(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = graft.CachedFrames.track(orders.select(col("o_custkey"),
      (year(col("o_orderdate")).cast("long") * 12
        + month(col("o_orderdate")).cast("long") - 1).as("mkey"),
      expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)").as("cents")))
    val cohorts = graft.CachedFrames.track(
      o.groupBy(col("o_custkey")).agg(min(col("mkey")).as("cmkey")))
    val sizes = cohorts.groupBy(col("cmkey"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = o.join(cohorts, Seq("o_custkey"))
      .groupBy(col("cmkey"), (col("mkey") - col("cmkey")).as("month_index"))
      .agg(countDistinct(col("o_custkey")).as("n_active_customers"),
        sum(col("cents")).as("revenue_cents"))
    val w = Window.partitionBy(col("cmkey")).orderBy(col("month_index"))
    cells
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
      .join(broadcast(sizes), Seq("cmkey"))
      .select(col("cmkey").as("cohort_mkey"), col("month_index"),
        col("n_active_customers"), col("revenue_cents"),
        col("cum_revenue_cents"), col("cohort_size"),
        (col("cum_revenue_cents").cast("double")
          / col("cohort_size").cast("double")).as("cum_ltv_cents"))
  }

  val q256CohortLtvSql: String = """
    WITH o AS (
      SELECT o_custkey,
        CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
          AS mkey,
        CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders),
    c AS (SELECT o_custkey, min(mkey) AS cmkey FROM o GROUP BY 1),
    sz AS (SELECT cmkey, CAST(count(*) AS BIGINT) AS cohort_size
           FROM c GROUP BY 1),
    cell AS (
      SELECT c.cmkey, o.mkey - c.cmkey AS month_index,
        CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active_customers,
        CAST(sum(o.cents) AS BIGINT) AS revenue_cents
      FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
    cum AS (
      SELECT cmkey, month_index, n_active_customers, revenue_cents,
        CAST(sum(revenue_cents) OVER (PARTITION BY cmkey ORDER BY month_index)
          AS BIGINT) AS cum_revenue_cents
      FROM cell)
    SELECT cum.cmkey AS cohort_mkey, cum.month_index,
      cum.n_active_customers, cum.revenue_cents, cum.cum_revenue_cents,
      sz.cohort_size,
      CAST(cum.cum_revenue_cents AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
        AS cum_ltv_cents
    FROM cum JOIN sz ON cum.cmkey = sz.cmkey
  """
  /** q258 tuning: histogram grain and the percentiles priced. */
  private[ops] val HistQBins = 64
  private[ops] val HistQPs = Seq(0.5, 0.9, 0.99)

  /** q258: HISTOGRAM-QUANTILE ERROR — the one-pass percentile estimator
    * next to its exact answer, error in-row. Exact distributed percentiles
    * need a sort-based aggregate over every value (q35's path — fine per
    * group, brutal over 100 TB of raw values); the scale path is a
    * fixed-grain histogram: min/max pass, one map-side-combinable
    * (bin → count) rollup, then quantiles interpolated from ≤
    * [[HistQBins]] rows. This query runs BOTH on l_extendedprice and
    * reports est/exact/abs/rel error per percentile — the accuracy bill
    * for switching, the same measured-tradeoff shape as q107 (LSH) and
    * q63 (ANN).
    *
    * Determinism: the estimator is a FIXED convention both engines
    * implement identically — t = p·n in count space, b* = first bin with
    * cumulative ≥ t, linear interpolation within b* assuming uniformity —
    * every step per-row double arithmetic in the same op order; the
    * cumulative table is exact integers via a triangular self-join of the
    * 64-row bin table (never a global ORDER window). Exact percentiles
    * are Spark `percentile` ≡ DuckDB `quantile_cont` (the q35 pairing).
    *
    * Scale shape: two passes over the values (min/max/n, then bin
    * counts), both map-side combinable; everything after is ≤64-row
    * arithmetic. The exact side exists to PRICE the estimator at test SF
    * — production runs the histogram alone. */
  def q258HistogramQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    histogramQuantilesOn(Tables(spark, sfDir, "lineitem")
      .select(col("l_extendedprice").cast("double").as("x")))

  /** The estimator core over ANY single-double-column frame `x`. */
  private[graft] def histogramQuantilesOn(xs: DataFrame): DataFrame = {
    // r18: ONE raw pass — collapse to the (x, cnt) value→count map first
    // (whole-stage-codegen hash aggregate, map-side combinable); min/max/n,
    // the bin rollup and the exact percentile then read |distinct| rows
    // instead of re-scanning the raw values three times. The exact side's
    // non-codegen ObjectHashAggregate receives the very value→count map
    // its per-row form would have built internally (`percentile(x, ps,
    // cnt)` — the q109 precedent), so every output is bit-identical.
    val x = graft.CachedFrames.track(
      xs.groupBy(col("x")).agg(count(lit(1)).as("cnt")))
    val mm = graft.CachedFrames.track(x.agg(min(col("x")).as("lo"),
      max(col("x")).as("hi"), coalesce(sum(col("cnt")), lit(0L)).as("n")))
    val nb = lit(HistQBins)
    val binned = x.crossJoin(broadcast(mm))
      .select(when((col("hi") - col("lo")) > 0,
          least(floor((col("x") - col("lo"))
            / ((col("hi") - col("lo")) / nb.cast("double"))),
            lit(HistQBins - 1).cast("double")))
        .otherwise(lit(0.0)).cast("long").as("b"), col("cnt"))
      .groupBy(col("b")).agg(sum(col("cnt")).as("c"))
    val cum = binned.alias("a")
      .join(binned.alias("o"), col("o.b") <= col("a.b"))
      .groupBy(col("a.b").as("b"), col("a.c").as("c"))
      .agg(sum(col("o.c")).as("cum"))
    val exact = x.agg(
      expr(s"percentile(x, array(${HistQPs.mkString(", ")}), cnt)").as("ex"))
    val ps = mm.select(col("lo"), col("hi"), col("n"),
        posexplode(typedLit(HistQPs)).as(Seq("pi", "p")))
      .select(col("pi"), col("p"), col("lo"), col("hi"),
        (col("p") * col("n").cast("double")).as("t"))
    ps.join(broadcast(graft.CachedFrames.track(cum)), col("cum") >= col("t"))
      .groupBy(col("pi"), col("p"), col("lo"), col("hi"), col("t"))
      .agg(min(struct(col("b"), col("c"), col("cum"))).as("s"))
      .crossJoin(broadcast(exact))
      .select(col("p"),
        expr("element_at(ex, CAST(pi + 1 AS INT))").as("exact_value"),
        (col("lo")
          + (col("hi") - col("lo")) / nb.cast("double") * col("s.b").cast("double")
          + (col("hi") - col("lo")) / nb.cast("double")
            * ((col("t") - (col("s.cum") - col("s.c")).cast("double"))
               / col("s.c").cast("double"))).as("est_value"))
      .select(col("p"), col("exact_value"), col("est_value"),
        abs(col("est_value") - col("exact_value")).as("abs_err"),
        (abs(col("est_value") - col("exact_value")) / abs(col("exact_value")))
          .as("rel_err"))
  }

  val q258HistogramQuantilesSql: String = s"""
    WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
    mm AS (SELECT min(x) AS lo, max(x) AS hi,
             CAST(count(*) AS BIGINT) AS n FROM x),
    binned AS (
      SELECT CAST(CASE WHEN (mm.hi - mm.lo) > 0 THEN
          least(floor((x.x - mm.lo) / ((mm.hi - mm.lo) / ${HistQBins}.0)),
            ${HistQBins - 1}.0)
        ELSE 0.0 END AS BIGINT) AS b,
        CAST(count(*) AS BIGINT) AS c
      FROM x, mm GROUP BY 1),
    cum AS (
      SELECT a.b, a.c, CAST(sum(o.c) AS BIGINT) AS cum
      FROM binned a JOIN binned o ON o.b <= a.b GROUP BY 1, 2),
    ex AS (SELECT [${HistQPs.map(p => s"quantile_cont(x, $p)").mkString(", ")}]
             AS ex FROM x),
    ps AS (
      SELECT u.pi, u.p, mm.lo, mm.hi,
        u.p * CAST(mm.n AS DOUBLE) AS t
      FROM mm, (${HistQPs.zipWithIndex.map { case (p, i) =>
        s"SELECT $i AS pi, CAST($p AS DOUBLE) AS p" }.mkString(" UNION ALL ")}) u),
    pick AS (
      SELECT ps.pi, ps.p, ps.lo, ps.hi, ps.t,
        min(cum.b) AS b
      FROM ps JOIN cum ON CAST(cum.cum AS DOUBLE) >= ps.t
      GROUP BY 1, 2, 3, 4, 5),
    est AS (
      SELECT pick.p, pick.pi, pick.lo, pick.hi, pick.t,
        cum.c, cum.cum, pick.b
      FROM pick JOIN cum ON pick.b = cum.b)
    SELECT est.p,
      ex.ex[est.pi + 1] AS exact_value,
      est.lo
        + (est.hi - est.lo) / ${HistQBins}.0 * CAST(est.b AS DOUBLE)
        + (est.hi - est.lo) / ${HistQBins}.0
          * ((est.t - CAST(est.cum - est.c AS DOUBLE))
             / CAST(est.c AS DOUBLE)) AS est_value,
      abs(est.lo
        + (est.hi - est.lo) / ${HistQBins}.0 * CAST(est.b AS DOUBLE)
        + (est.hi - est.lo) / ${HistQBins}.0
          * ((est.t - CAST(est.cum - est.c AS DOUBLE))
             / CAST(est.c AS DOUBLE)) - ex.ex[est.pi + 1]) AS abs_err,
      abs(est.lo
        + (est.hi - est.lo) / ${HistQBins}.0 * CAST(est.b AS DOUBLE)
        + (est.hi - est.lo) / ${HistQBins}.0
          * ((est.t - CAST(est.cum - est.c AS DOUBLE))
             / CAST(est.c AS DOUBLE)) - ex.ex[est.pi + 1])
        / abs(ex.ex[est.pi + 1]) AS rel_err
    FROM est, ex
  """
}

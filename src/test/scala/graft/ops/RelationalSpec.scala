package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the relational family's layout operator (the rest of
  * the family is value-checked by the DuckDB oracle gate and shape-checked
  * in PlanSpec). */
class RelationalSpec extends AnyFunSuite with graft.SparkSpec {

  test("q120 z-order: every shard covers a bounded rectangle in BOTH key dimensions") {
    val sf = "/root/testdata/sf0.001"
    val rows = Relational.q120ZorderLayout(spark, sf).collect()
    assert(rows.length > 1, "normalization must spread rows across shards")
    val globalOx = rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min
    val globalPy = rows.map(_.getLong(5)).max - rows.map(_.getLong(4)).min
    rows.foreach { r =>
      // 16 shards = 4 leading curve bits = 2 bits per dimension, so each
      // shard's rectangle spans at most ~1/4 of each key range; pin <= 1/2
      // to stay robust to normalization rounding at tiny SFs
      assert(r.getLong(3) - r.getLong(2) <= globalOx / 2 + 1,
        s"shard ${r.getInt(0)} spans too much of the orderkey range: $r")
      assert(r.getLong(5) - r.getLong(4) <= globalPy / 2 + 1,
        s"shard ${r.getInt(0)} spans too much of the partkey range: $r")
    }
    // the fixed curve cut is deterministic: a rerun reproduces the layout
    val again = Relational.q120ZorderLayout(spark, sf).collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("q120 z-order: the SQL interleave matches a plain-Scala Morton oracle") {
    import spark.implicits._
    // independent reference implementation of the bit interleave
    def morton(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)) }
    val shardWidth = (1L << 32) / Relational.ZorderShards
    // corner anchors make normalization the identity (lo=0, hi=65535)
    val probes = Seq((0xAAAAL, 0x5555L), (0x1234L, 0xF0F0L), (1L, 65534L))
    val df = (Seq((0L, 0L), (65535L, 65535L)) ++ probes).toDF("x", "y")
    val rows = Relational.zorderLayoutOn(df).collect()
      .map(r => r.getInt(0) -> r).toMap
    (Seq((0L, 0L), (65535L, 65535L)) ++ probes).foreach { case (x, y) =>
      val shard = (morton(x, y) / shardWidth).toInt
      val r = rows(shard)
      assert(r.getLong(2) <= x && x <= r.getLong(3), s"($x,$y) shard $shard: $r")
      assert(r.getLong(4) <= y && y <= r.getLong(5), s"($x,$y) shard $shard: $r")
    }
    // each probe landed in a distinct, correctly-numbered shard row
    assert(rows.keySet === (Seq((0L, 0L), (65535L, 65535L)) ++ probes)
      .map { case (x, y) => (morton(x, y) / shardWidth).toInt }.toSet)
  }

  test("q195 fanout percentiles: exact order-statistic picks on a " +
    "tie-heavy hand distribution, per edge, matching the plain-Scala " +
    "sorted index") {
    import spark.implicits._
    // edge A: fanouts 1,1,2,2,2,3,9,40 (n=8); edge B: 5,5,5 (n=3)
    val fan = Seq(
      ("A", 1L, 1L), ("A", 2L, 1L), ("A", 3L, 2L), ("A", 4L, 2L),
      ("A", 5L, 2L), ("A", 6L, 3L), ("A", 7L, 9L), ("A", 8L, 40L),
      ("B", 1L, 5L), ("B", 2L, 5L), ("B", 3L, 5L))
      .toDF("edge", "k", "cnt")
    def pick(v: Seq[Long], a: Int, b: Int): Long = {
      val n = v.size
      v.sorted.apply(((a * n + b - 1) / b) - 1)
    }
    val got = Relational.fanoutPercentilesOn(fan).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val fa = Seq(1L, 1L, 2L, 2L, 2L, 3L, 9L, 40L)
    assert(got("A") === ((8L, pick(fa, 1, 2), pick(fa, 9, 10),
      pick(fa, 99, 100), 40L)))
    assert(got("B") === ((3L, 5L, 5L, 5L, 5L)))
  }

  test("q211 ship lag: rank-exact picks over [-1, 2, 30] with the " +
    "negative lag counted, not averaged away") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L
    val orders = Seq((1L, 10L * D), (2L, 20L * D))
      .toDF("o_orderkey", "osec")
      .withColumn("o_orderdate", timestamp_seconds(col("osec")))
    val lines = Seq((1L, 1, 12L * D), (1L, 2, 9L * D + 5L),
      (2L, 1, 50L * D))
      .toDF("l_orderkey", "l_linenumber", "ssec")
      .withColumn("l_shipdate", timestamp_seconds(col("ssec")))
    val r = Relational.shipLagOn(orders, lines).collect()(0)
    graft.CachedFrames.drain()
    // lags sorted [-1, 2, 30]: p50 rank 2 → 2, p90/p99 rank 3 → 30
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 2L, 30L, 30L, 1L)))
  }

  test("q212 monthly revenue: exact cents per calendar month, MoM only " +
    "against the true preceding month (a gap yields NULL, not a skip)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val orders = Seq(
      ("2024-01-05", 1.00), ("2024-01-20", 2.00), // Jan: 300 cents
      ("2024-02-11", 6.00),                       // Feb: 600, MoM 2.0
      ("2024-04-01", 1.00))                       // Apr: gap → NULL MoM
      .toDF("d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d")))
    val got = Relational.monthlyRevenueOn(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      (2024L, 1L) -> ((2L, 300L, None)),
      (2024L, 2L) -> ((1L, 600L, Some(2.0))),
      (2024L, 4L) -> ((1L, 100L, None))))
  }

  test("q216 supplier HHI: a single-supplier brand scores exactly 1/1, " +
    "a balanced brand scores the exact integer ratio") {
    import spark.implicits._
    // brand B1: suppliers 1,2 with qty 6 and 3 → T=9, Σc²=45 →
    // hhi = 45/81, eff = 81/45; brand B2: one supplier → exactly 1 / 1
    val lineitem = Seq((10L, 1L, 4.0), (10L, 1L, 2.0), (11L, 2L, 3.0),
      (20L, 7L, 5.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val part = Seq((10L, "B1"), (11L, "B1"), (20L, "B2"))
      .toDF("p_partkey", "p_brand")
    val got = Relational.supplierHhiOn(lineitem, part).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    graft.CachedFrames.drain()
    assert(got("B1") === ((2L, 9L, 45.0 / 81.0, 81.0 / 45.0)))
    assert(got("B2") === ((1L, 5L, 1.0, 1.0)))
  }

  test("q218 priority drift: exact cross-multiplied TVD on a hand mix, " +
    "a one-year-only priority carries full mass, a calendar gap pairs " +
    "nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // 2020: A×3, B×1 (n=4); 2021: A×1, C×1 (n=2); 2023: A×2 (gap at 2022)
    val orders = Seq(
      ("2020-01-01", "A"), ("2020-02-01", "A"), ("2020-03-01", "A"),
      ("2020-04-01", "B"),
      ("2021-05-01", "A"), ("2021-06-01", "C"),
      ("2023-01-01", "A"), ("2023-02-01", "A"))
      .toDF("d", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("d")))
    val got = Relational.priorityDriftOn(orders).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    // 2021 vs 2020 (n=2, n'=4): |1·4 − 3·2| + |0·4 − 1·2| + |1·4 − 0·2|
    // = 2 + 2 + 4 = 8 → tvd = 8 / (2·2·4) = 0.5
    // (check: ½(|½−¾| + |0−¼| + |½−0|) = ½·1 = 0.5)
    assert(got.keySet === Set(2021L)) // the 2022 gap pairs nothing
    assert(got(2021L) === ((2020L, 2L, 4L, 8.0 / 16.0)))
  }

  test("q220 FD audit: g3 is the exact minimum repair bill, a NULL LHS " +
    "is excluded, a NULL RHS is a value, and a holding FD reports 0/true") {
    import spark.implicits._
    // x=1: y in {A, A, B}  → ny=2, repair 1 (keep the two As)
    // x=2: y in {NULL, C}  → NULL is a value → ny=2, repair 1
    // x=3: y in {D, D}     → clean
    // x=NULL: excluded entirely
    val pairs = Seq(
      (Some(1L), Some("A")), (Some(1L), Some("A")), (Some(1L), Some("B")),
      (Some(2L), Option.empty[String]), (Some(2L), Some("C")),
      (Some(3L), Some("D")), (Some(3L), Some("D")),
      (Option.empty[Long], Some("Z")))
      .toDF("x", "y")
    val r = Relational.fdAuditOn(pairs, "t: x -> y").collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5), r.getBoolean(6)) ===
      (("t: x -> y", 7L, 3L, 2L, 2L, 2.0 / 7.0, false)))
    // a clean dependency: one row per key, holds = true at g3 = 0
    val clean = Seq((1L, "A"), (2L, "B")).toDF("x", "y")
    val c = Relational.fdAuditOn(clean, "k").collect()(0)
    assert((c.getLong(1), c.getLong(3), c.getLong(4), c.getDouble(5),
      c.getBoolean(6)) === ((2L, 0L, 0L, 0.0, true)))
  }

  test("q223 spend mobility: deciles cut per-year over each year's own " +
    "roster, only both-year customers enter the grid, the latest " +
    "adjacent pair is chosen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // 2020 noise year (must be ignored); 2021 roster {1,2,3}, 2022 roster
    // {2,3,4}. With 10 buckets and n=3 the ntile law gives each customer
    // its own decile: ranks by spend DESC → decile = rank.
    val orders = Seq(
      ("2020-01-01", 1L, 999.0),
      ("2021-01-01", 1L, 9.0), ("2021-02-01", 2L, 5.0),
      ("2021-03-01", 3L, 1.0),
      ("2022-01-01", 2L, 9.0), ("2022-02-01", 3L, 5.0),
      ("2022-03-01", 4L, 1.0))
      .toDF("d", "o_custkey", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d")))
    val got = try Relational.spendMobilityOn(orders).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      finally graft.CachedFrames.drain()
    // customers 2 (2021 rank 2 → 2022 rank 1) and 3 (3 → 2) survive;
    // customer 1 churned, customer 4 is new — neither appears
    assert(got.values.sum === 2L)
    assert(got((2, 1)) === 1L)
    assert(got((3, 2)) === 1L)
    // the grid is the full cross of observed margins incl. empty cells
    assert(got.keySet === Set((2, 1), (2, 2), (3, 1), (3, 2)))
  }

  test("q224 order gap: per-customer consecutive gaps only, rank-exact " +
    "picks, one-time customers counted in the share but never a gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L
    // cust 1: days 0, 2, 10 → gaps [2, 8]; cust 2: day 5 → no gap;
    // cust 3: days 7, 7 (same day, orderkey break) → gap [0]
    val orders = Seq(
      (1L, 10L, 0L), (1L, 11L, 2L * D), (1L, 12L, 10L * D),
      (2L, 20L, 5L * D),
      (3L, 30L, 7L * D), (3L, 31L, 7L * D))
      .toDF("o_custkey", "o_orderkey", "sec")
      .withColumn("o_orderdate", timestamp_seconds(col("sec")))
    val r = try Relational.orderGapOn(orders).collect()(0)
      finally graft.CachedFrames.drain()
    // gaps sorted [0, 2, 8]: p50 rank 2 → 2, p90/p99 rank 3 → 8
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((3L, 1L, 1.0 / 3.0, 3L, 2L, 8L, 8L, 8L)))
  }

  test("q226 OLS: exact slope/intercept/r2 on hand points — a perfect " +
    "line hits r2 = 1, a scatter gets the exact rational, constant x " +
    "reports NULL not a division error") {
    import spark.implicits._
    def run(pts: Seq[(Long, Long)]) = {
      val li = pts.map { case (x, y) => (x / 10000.0, y.toDouble) }
        .toDF("l_discount", "l_quantity")
      val r = Relational.discountElasticityOn(li).collect()(0)
      graft.CachedFrames.drain()
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }
    // perfect line y = 2x + 1
    assert(run(Seq((0L, 1L), (1L, 3L), (2L, 5L))) ===
      ((3L, Some(2.0), Some(1.0), Some(1.0))))
    // scatter: num = 9, den = 6, deny = 14 → slope 1.5,
    // intercept (8 − 1.5·3)/3, r2 = 81/84 — all exact in doubles
    assert(run(Seq((0L, 1L), (1L, 3L), (2L, 4L))) ===
      ((3L, Some(9.0 / 6.0), Some((8.0 - 9.0 / 6.0 * 3.0) / 3.0),
        Some(81.0 / 84.0))))
    // constant x: den = 0 → all three NULL
    assert(run(Seq((5L, 1L), (5L, 9L))) === ((2L, None, None, None)))
  }

  test("Ols core merge law: the sufficient statistics of a union are " +
    "recoverable from per-batch sums — the digest seam an incremental " +
    "refresh rides — on random integer batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(647)
    (1 to 3).foreach { _ =>
      val a = Seq.fill(20)((rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toLong))
      val b = Seq.fill(15)((rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toLong))
      def sums(pts: Seq[(Long, Long)]) = (
        pts.size.toLong,
        pts.map(p => BigInt(p._1)).sum, pts.map(p => BigInt(p._2)).sum,
        pts.map(p => BigInt(p._1) * p._1).sum,
        pts.map(p => BigInt(p._2) * p._2).sum,
        pts.map(p => BigInt(p._1) * p._2).sum)
      // the engine's moments over the union equal the plain-Scala moments
      // rebuilt from the two batches' independently-accumulated sums
      val (n, sx, sy, sxx, syy, sxy) = {
        val (na, sxa, sya, sxxa, syya, sxya) = sums(a)
        val (nb, sxb, syb, sxxb, syyb, sxyb) = sums(b)
        (na + nb, sxa + sxb, sya + syb, sxxa + sxxb, syya + syyb,
          sxya + sxyb)
      }
      val r = Ols.coreOn((a ++ b).toDF("x", "y")).collect()(0)
      assert(BigInt(r.getLong(0)) === BigInt(n))
      assert(BigInt(r.getDecimal(1).toBigInteger) === n * sxy - sx * sy)
      assert(BigInt(r.getDecimal(2).toBigInteger) === n * sxx - sx * sx)
      assert(BigInt(r.getDecimal(3).toBigInteger) === n * syy - sy * sy)
    }
  }

  test("q235 sliced ship lag: per-priority rank-exact picks on hand " +
    "slices with different sizes, negatives counted in their own slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L
    val orders = Seq((1L, "U", 10L * D), (2L, "L", 20L * D))
      .toDF("o_orderkey", "o_orderpriority", "osec")
      .withColumn("o_orderdate", timestamp_seconds(col("osec")))
    // priority U: lags [-1, 2, 30]; priority L: lags [5]
    val lines = Seq((1L, 1, 12L * D), (1L, 2, 9L * D + 5L),
      (1L, 3, 40L * D), (2L, 1, 25L * D))
      .toDF("l_orderkey", "l_linenumber", "ssec")
      .withColumn("l_shipdate", timestamp_seconds(col("ssec")))
    val got = try Relational.priorityShipLagOn(orders, lines).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      finally graft.CachedFrames.drain()
    // U sorted [-1, 2, 30]: p50 rank 2 → 2, p90/p99 rank 3 → 30
    assert(got("U") === ((3L, 2L, 30L, 30L, 30L, 1L)))
    assert(got("L") === ((1L, 5L, 5L, 5L, 5L, 0L)))
  }

  test("q236 ledger recon: exact per-order deltas on a hand book — a " +
    "matching order, a mismatched one, and a headerless-total order " +
    "whose full amount is the delta") {
    import spark.implicits._
    // order 1: total 3.30, lines price to 220 + 110 cents → delta 0
    // order 2: total 5.00, one line prices to 330 → delta +170
    // order 3: total 1.00, NO lines → delta +100, no_lines
    val orders = Seq((1L, 3.30), (2L, 5.00), (3L, 1.00))
      .toDF("o_orderkey", "o_totalprice")
    // line cents: 2.00·(1−0)·(1+0.1) = 2.20 → 220; 1.10 flat → 110;
    // 3.00·(1−0)·(1+0.1) = 3.30 → 330
    val lines = Seq((1L, 2.00, 0.0, 0.1), (1L, 1.10, 0.0, 0.0),
      (2L, 3.00, 0.0, 0.1))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val r = try Relational.ledgerReconOn(orders, lines).collect()(0)
      finally graft.CachedFrames.drain()
    // |deltas| sorted [0, 100, 170]: p50 rank 2 → 100, p99 rank 3 → 170
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      ((3L, 1L, 1.0 / 3.0, 1L, 270L, 100L, 170L, 170L)))
  }

  test("q205 ABC: the boundary-crossing customer stays in the richer " +
    "class (exact 80% boundary exercised), shares are exact divisions, " +
    "and a null custkey is excluded") {
    import spark.implicits._
    // per-customer cents [50, 30, 15, 4, 1] → T = 100; cum-before:
    // 0, 50 → A; 80 (5·80 = 4·100, NOT <) → B; 95, 99 → C
    val orders = Seq(
      (Some(1L), 0.30), (Some(1L), 0.20),       // cust 1: 50 cents
      (Some(2L), 0.30),                          // cust 2: 30
      (Some(3L), 0.15),                          // cust 3: 15
      (Some(4L), 0.04),                          // cust 4: 4
      (Some(5L), 0.01),                          // cust 5: 1
      (Option.empty[Long], 99.0))                // dropped
      .toDF("o_custkey", "o_totalprice")
    val got = Relational.abcOn(orders).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      "A" -> ((2L, 80L, 80.0 / 100.0)),
      "B" -> ((1L, 15L, 15.0 / 100.0)),
      "C" -> ((2L, 5L, 5.0 / 100.0))))
  }

  test("q243 RFM: hand customers land in the exact rank-derived " +
    "quintile cells with exact spend sums and shares; null custkey " +
    "excluded") {
    import spark.implicits._
    import java.sql.Date
    // 5 customers, one order each except cust 1 (two) — with 5 buckets
    // and 5 customers every quintile is ONE customer, so the cell
    // assignments are fully hand-checkable:
    //   recency rank (days from 2024-01-10): c1=0d, c2=1d, c3=3d, c4=5d,
    //     c5=9d → r_q = 1..5 in that order
    //   frequency: c1=2 orders (f_q 1), rest 1 (ties → custkey asc:
    //     c2→2, c3→3, c4→4, c5→5)
    //   monetary cents: c1=300, c2=500, c3=100, c4=250, c5=50 →
    //     m order (desc): c2, c1, c4, c3, c5 → m_q 1..5
    val d = (s: String) => Date.valueOf(s)
    val orders = Seq(
      (Some(1L), 2.00, d("2024-01-05")), (Some(1L), 1.00, d("2024-01-10")),
      (Some(2L), 5.00, d("2024-01-09")),
      (Some(3L), 1.00, d("2024-01-07")),
      (Some(4L), 2.50, d("2024-01-05")),
      (Some(5L), 0.50, d("2024-01-01")),
      (Option.empty[Long], 99.0, d("2024-01-10")))
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
    val got = Relational.rfmSegmentsOn(orders).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    graft.CachedFrames.drain()
    val total = 1200.0
    assert(got === Map(
      (1, 1, 2) -> ((1L, 300L, 300.0 / total)), // c1
      (2, 2, 1) -> ((1L, 500L, 500.0 / total)), // c2
      (3, 3, 4) -> ((1L, 100L, 100.0 / total)), // c3
      (4, 4, 3) -> ((1L, 250L, 250.0 / total)), // c4
      (5, 5, 5) -> ((1L, 50L, 50.0 / total))))  // c5
  }

  test("q246 supplier reliability: counts and the Wilson chain match a " +
    "plain-Scala mirror bitwise; the bound ranks a 900/1000 supplier " +
    "above a 9/10 one at the same raw rate") {
    import spark.implicits._
    import java.sql.Date
    val d = (s: String) => Date.valueOf(s)
    // supplier 1: 2 lines, one on-time (30 d) one late (90 d);
    // supplier 2: 3 lines, all on-time (exactly 60 d is ON TIME)
    val orders = Seq((100L, d("2024-01-01")), (101L, d("2024-02-01")))
      .toDF("o_orderkey", "o_orderdate")
    val lines = Seq(
      (100L, 1L, d("2024-01-31")), (101L, 1L, d("2024-05-01")),
      (100L, 2L, d("2024-02-15")), (100L, 2L, d("2024-03-01")),
      (101L, 2L, d("2024-02-20")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val got = Relational.supplierReliabilityOn(orders, lines).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    def wilson(ot: Long, n: Long): Double = {
      val (z, z2) = (Relational.WilsonZ, Relational.WilsonZ2)
      val nd = n.toDouble
      val p = ot.toDouble / nd
      (p + z2 / (2.0 * nd) - z * math.sqrt(p * (1.0 - p) / nd
        + z2 / (4.0 * (nd * nd)))) / (1.0 + z2 / nd)
    }
    assert(got(1L) === ((2L, 1L, 0.5, wilson(1, 2))))
    assert(got(2L) === ((3L, 3L, 1.0, wilson(3, 3))))
    // the shrinkage property: same raw rate, bigger n → higher bound
    assert(wilson(900, 1000) > wilson(9, 10))
  }

  test("q244 basket lift: hand baskets — duplicate lines collapse, the " +
    "support floor prunes, lift is the exact N·c_ab/(c_a·c_b)") {
    import spark.implicits._
    // parts 10 & 20 co-occur in orders 1,2,3 (incl. a duplicate line of
    // part 10 in order 1); parts 10 & 30 co-occur only in order 4
    // (below the floor of 3); order 5 is a singleton
    val lines = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (4L, 10L), (4L, 30L),
      (5L, 40L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.basketLiftOn(lines).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    graft.CachedFrames.drain()
    // N=5 baskets, c_10=4, c_20=3, c_ab=3 → lift = 5·3/(4·3) = 1.25
    assert(got === Map((10L, 20L) -> ((3L, 4L, 3L, 1.25))))
  }
}

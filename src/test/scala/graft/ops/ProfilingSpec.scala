package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q105 exact profile matches an independent per-column recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val rows = Profiling.q105Profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === docs.columns.toSet)
    docs.columns.foreach { c =>
      val r = rows(c)
      assert(r.getLong(1) === n, s"$c n_rows")
      // independent recomputation straight off the column (no stack/unpivot)
      val exp = docs.select(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("nn"),
        countDistinct(col(c).cast("string")).as("nd"),
        min(col(c).cast("string")).as("mn"),
        max(col(c).cast("string")).as("mx")).head()
      assert(r.getLong(2) === exp.getLong(0), s"$c n_null")
      assert(r.getLong(3) === exp.getLong(1), s"$c n_distinct")
      assert(r.getString(4) === exp.getString(2), s"$c min_val")
      assert(r.getString(5) === exp.getString(3), s"$c max_val")
    }
  }

  test("q105 profiles nulls without losing them from n_rows") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (null, "a"))
      .toDF("k", "s")
    val p = Profiling.profileApprox(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) === 3L && p("k").getLong(2) === 1L)
    assert(p("s").getLong(1) === 3L && p("s").getLong(2) === 1L)
    // min/max ignore nulls per SQL semantics
    assert(p("s").getString(4) === "a" && p("s").getString(5) === "a")
  }

  test("approx face agrees with the exact face everywhere but the HLL estimate, which stays tight") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Profiling.q105Profile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profiling.profileApprox(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getLong(1) === e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) === e.getLong(2), s"$c n_null")
      assert(a.getString(4) === e.getString(4), s"$c min_val")
      assert(a.getString(5) === e.getString(5), s"$c max_val")
      val nd = e.getLong(3).toDouble
      assert(math.abs(a.getLong(3) - nd) <= math.max(2.0, nd * 0.1),
        s"$c HLL estimate ${a.getLong(3)} vs exact $nd")
    }
  }

  test("hostile column names — quotes and backticks — profile without a parse error") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"))
      .toDF("it's", "o`dd")
    val p = Profiling.profileApprox(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p === Map("it's" -> 2L, "o`dd" -> 2L))
  }

  test("an empty input profiles to an empty frame (no phantom zero-rows), schema intact") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "s")
    val exact = Profiling.profileExactOn(empty)
    val approx = Profiling.profileApprox(empty)
    // contract: a column only appears once it has rows to describe — a
    // consumer joins profiles by col_name and treats absence as "no data",
    // the same convention q108 uses for days without a predecessor
    assert(exact.count() === 0L && approx.count() === 0L)
    assert(exact.columns.toSeq ===
      Seq("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val"))
  }

  test("q109 numeric profile matches an independent plain-Scala recomputation per column") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val raw = li.select(cols.head, cols.tail: _*).collect()
    val got = Profiling.q109NumericProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === cols.toSet)
    cols.zipWithIndex.foreach { case (c, i) =>
      val xs = raw.map(_.getDouble(i)).sorted
      val n = xs.length
      val r = got(c)
      assert(r.getLong(1) === n.toLong, s"$c n")
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
      // fixed-point quantization bounds: 1e-12 on x, 1e-6 on x² per element
      assert(math.abs(r.getDouble(2) - mean) <= 1e-6, s"$c mean")
      assert(math.abs(r.getDouble(3) - math.sqrt(variance)) <= 1e-3, s"$c std")
      // interpolated median, the percentile/quantile_cont formula
      val idx = 0.5 * (n - 1)
      val (lo, hi) = (xs(idx.toInt), xs(math.ceil(idx).toInt))
      val med = lo + (hi - lo) * (idx - idx.toInt)
      assert(math.abs(r.getDouble(4) - med) <= 1e-9, s"$c p50")
      assert(r.getDouble(5) === xs.head && r.getDouble(6) === xs.last, s"$c min/max")
    }
  }

  test("q110 skew report: ties break on key, nulls counted apart, shares sum to the top keys' mass") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // b and c tie at 3 -> key-ascending order decides; two nulls excluded
    // from the ranking but reported
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d") ++ Seq(null, null).map(_.asInstanceOf[String]))
      .toDF("k")
    val got = Profiling.skewReportOn(df, col("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    graft.CachedFrames.drain()
    assert(got.map(x => (x._1, x._2, x._3)).toSeq ===
      Seq((1, "a", 5L), (2, "b", 3L), (3, "c", 3L), (4, "d", 1L)))
    got.foreach { x =>
      assert(x._5 === 12L && x._6 === 4L && x._7 === 2L)
      assert(x._4 === x._3.toDouble / 12.0)
    }
  }

  test("q111 profile diff: deltas equal an independent recomputation of both versions") {
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dropped = docs.filter(expr("doc_id % 97 = 0")).count()
    assert(dropped > 0L)
    val got = Profiling.q111ProfileDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === docs.columns.toSet)
    got.values.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) === dropped, r.toString)
      assert(r.getLong(3) === -dropped)
      // a version that only REMOVES rows can only lose distinct values
      assert(r.getLong(6) <= 0L, r.toString)
    }
    // independent recompute of one column's distinct delta
    val d1 = docs.select(countDistinct(col("n_chars").cast("string"))).head().getLong(0)
    val d2 = docs.filter(expr("doc_id % 97 <> 0"))
      .select(countDistinct(col("n_chars").cast("string"))).head().getLong(0)
    assert(got("n_chars").getLong(6) === d2 - d1)
    // doc_id 0 is always in the dropped set, so its string-min moves
    assert(got("doc_id").getBoolean(7) === true)
  }

  test("q105 plan: one scan feeds all columns, aggregation is partial (map-side combinable)") {
    val plan = Profiling.q105Profile(spark, sf).queryExecution.executedPlan.toString
    // a single parquet scan — the unpivot must not become C per-column jobs
    assert("Scan parquet".r.findAllIn(plan).length === 1, plan)
    assert(plan.contains("partial_"), plan)
  }
}

package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase bucketed rank (DistRank) against its window-function
  * oracles: `row_number()` / `ntile()` over the same total order. These are
  * the q134/q129 scale fixes — the distributed form must be byte-identical
  * to the single-partition window it replaces, on skewed, tied, null-group
  * and non-divisible-bucket inputs, and its plan must actually range-bucket
  * (no global or per-group-only window anywhere). */
class DistRankSpec extends AnyFunSuite with SparkSpec {

  test("grouped bucketedRank over a DOUBLE key equals row_number() on a " +
    "skewed fixture with ties, and shuffles on (source, _bkt)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one dominant group (the serialization failure mode), tied keys every
    // 13 rows (the tie-break path), plus a tiny group and a 1-row group
    val rows = (0 until 600).map(i => ("crawl", i.toLong, (i % 13).toDouble / 7.0)) ++
      (0 until 7).map(i => ("books", 1000L + i, 0.25)) ++
      Seq(("wiki", 2000L, 9.9))
    val df = spark.createDataset(rows).toDF("source", "doc_id", "score")
      .repartition(8)
    val got = DistRank.withBucketedRank(df, Seq("source"), "score",
      Seq("doc_id"), "rk")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").asc, col("doc_id").asc)
    val ref = df.withColumn("rk", row_number().over(w).cast("long"))
    assert(got.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
    val p = got.queryExecution.executedPlan.toString
    // the rank stage partitions by (source, _bkt) — B-way parallel inside
    // the dominant group — and NO window runs on a bare source partition
    assert("hashpartitioning\\(source#\\d+, _bkt".r.findFirstIn(p).isDefined, p)
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("_bkt"), l)
    }
  }

  test("ungrouped bucketedRank over a BIGINT key equals the global " +
    "row_number(), with every window in the plan bucket-partitioned") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // non-contiguous keys, duplicates (ties broken by id), 8-way input
    val rows = (0 until 400).map(i => (i.toLong, (i % 37) * 5L))
    val df = spark.createDataset(rows).toDF("id", "v").repartition(8)
    val got = DistRank.withBucketedRank(df, Nil, "v", Seq("id"), "rk")
    val ref = df.withColumn("rk",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long"))
    assert(got.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
    val p = got.queryExecution.executedPlan.toString
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("_bkt"), l)
    }
    // the key range really splits across buckets (not one degenerate bucket)
    val buckets = got
      .select(expr(s"v DIV ((180 DIV ${DistRank.RankBuckets}) + 1)"))
      .distinct().count()
    assert(buckets > 1L)
  }

  test("NULL group ranks as its own partition (null-safe joins), matching " +
    "the window's PARTITION BY semantics") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val rows: Seq[(Option[String], Long, Long)] =
      (0 until 30).map(i => (None: Option[String], i * 3L, (i % 5).toLong)) ++
        (0 until 10).map(i => (Some("books"), i * 2L, (i % 3).toLong))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.map {
        case (s, d, n) => org.apache.spark.sql.Row(s.orNull, d, n)
      }), StructType(Seq(
        StructField("source", StringType, nullable = true),
        StructField("doc_id", LongType, nullable = false),
        StructField("v", LongType, nullable = false))))
      .repartition(4)
    val got = DistRank.withBucketedRank(df, Seq("source"), "v",
      Seq("doc_id"), "rk")
    val w = Window.partitionBy(col("source")).orderBy(col("v"), col("doc_id"))
    val ref = df.withColumn("rk", row_number().over(w).cast("long"))
    assert(got.count() === 40) // every NULL-group row survives
    assert(got.collect().map(_.toSeq).toSet === ref.collect().map(_.toSeq).toSet)
  }

  test("ntileOfRank reproduces ANSI ntile() exactly, including remainder " +
    "buckets (B does not divide n) and n < B") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for ((n, b) <- Seq((10, 5), (7, 5), (23, 4), (3, 5), (1, 5), (32, 7))) {
      val df = (1 to n).map(_.toLong).toDF("id")
        .withColumn("rank", col("id")) // id IS the rank in this total order
        .crossJoin(broadcast(spark.range(1).select(lit(n.toLong).as("n"))))
      val got = df.select(col("id"),
        DistRank.ntileOfRank("rank", "n", b).as("t"))
      val ref = df.select(col("id"),
        ntile(b).over(Window.orderBy(col("id"))).as("t"))
      assert(got.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ===
        ref.collect().map(r => (r.getLong(0), r.getInt(1))).toSet,
        s"n=$n B=$b")
    }
  }

  test("a constant order key degenerates to one bucket but still ranks " +
    "correctly by tie-break") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, 5.0)).toDF("id", "v")
      .repartition(4)
    val got = DistRank.withBucketedRank(df, Nil, "v", Seq("id"), "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === (0 until 20).map(i => i.toLong -> (i + 1).toLong).toMap)
  }
}

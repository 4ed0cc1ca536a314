package graft.cli

import java.nio.file.Files

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The four REPORT-BUNDLE CLI jobs (release / trend / graph / warehouse):
  * each materializes its shared artifact once and writes every audit table,
  * and the spec pins representative tables row-equal to the gate ops. Split
  * from [[CliSpec]] so the two long end-to-end suites run in PARALLEL forked
  * groups (build.sbt Test/testGrouping) — same tests, same session pattern. */
class CliReportSpec extends AnyFunSuite with SparkSpec {

  test("release-report bundle: five audit tables, each equal to its op's own output") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("cli-release").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the corpus drop = non-benchmark docs; the suite = the %100 slice
    docs.filter(col("doc_id") % 100 =!= 0)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    docs.filter(col("doc_id") % 100 === 0)
      .write.mode("overwrite").parquet(s"$dir/bench")
    ReleaseReport.main(Array("--input", s"$dir/corpus",
      "--bench", s"$dir/bench", "--output", s"$dir/report"))
    for (t <- Seq("profile", "skew", "dedup_savings", "contamination", "pii",
        "contingency", "dup_fof"))
      assert(spark.read.parquet(s"$dir/report/$t").count() > 0, t)
    // contamination table ≡ the q122 gate (same corpus split by construction)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val gotCont = keyed(spark.read.parquet(s"$dir/report/contamination"))
    val expCont = keyed(graft.ops.TextOps.q122ContaminationReport(spark, sf))
    graft.CachedFrames.drain()
    assert(gotCont === expCont)
    // dedup savings ≡ the core over the same frame (no recrawl in the CLI)
    val gotSav = keyed(spark.read.parquet(s"$dir/report/dedup_savings"))
    val expSav = keyed(graft.ops.Curation.dedupSavingsOn(
      docs.filter(col("doc_id") % 100 =!= 0)
        .select(col("source"), col("doc_id"), col("text"))))
    assert(gotSav === expSav)
    // pii incidence row arithmetic holds
    spark.read.parquet(s"$dir/report/pii").collect().foreach { r =>
      val n = r.getAs[Long]("n_docs"); val w = r.getAs[Long]("docs_with_pii")
      assert(w <= n)
      assert(r.getAs[Double]("pii_incidence") === w.toDouble / n.toDouble)
    }
    // dup FoF ≡ the core over the same frame
    def fofKeyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val gotFof = fofKeyed(spark.read.parquet(s"$dir/report/dup_fof"))
    val expFof = fofKeyed(graft.ops.Curation.dupFofOn(
      docs.filter(col("doc_id") % 100 =!= 0).select(col("text"))))
    graft.CachedFrames.drain()
    assert(gotFof === expFof)
  }

  test("trend-report bundle: the dense daily artifact plus all three " +
      "trend tables, each equal to its op's own output") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("cli-trend").toString
    TrendReport.main(Array("--input", s"$sf/events.parquet",
      "--output", s"$dir/trend"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val daily = spark.read.parquet(s"$dir/trend/daily").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(daily.nonEmpty)
    assert(daily.keySet === (daily.keys.min to daily.keys.max).toSet,
      "calendar-dense")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val gotAcf = rows(spark.read.parquet(s"$dir/trend/acf"))
    val expAcf = rows(graft.ops.Events.acfOn(events))
    graft.CachedFrames.drain()
    assert(gotAcf === expAcf)
    val gotMk = rows(spark.read.parquet(s"$dir/trend/mann_kendall"))
    val expMk = rows(graft.ops.Events.mannKendallOn(events))
    graft.CachedFrames.drain()
    assert(gotMk === expMk)
    val gotTs = rows(spark.read.parquet(s"$dir/trend/theil_sen"))
    val expTs = rows(graft.ops.Events.theilSenOn(events))
    graft.CachedFrames.drain()
    assert(gotTs === expTs)
    val gotNr = rows(spark.read.parquet(s"$dir/trend/new_returning"))
    val expNr = rows(graft.ops.Events.newReturningOn(events))
    graft.CachedFrames.drain()
    assert(gotNr === expNr)
    for (t <- Seq("traffic_grid", "funnel"))
      assert(spark.read.parquet(s"$dir/trend/$t").count() > 0, t)
  }

  test("graph-report bundle: edges materialize once, every analytic equals " +
    "its gate core over the same edges") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("cli-graph").toString
    GraphReport.main(Array("--input", s"$sf/documents.parquet",
      "--output", s"$dir/graph"))
    for (t <- Seq("edges", "pagerank", "triangles", "hits", "assortativity",
        "kcore", "links", "modularity"))
      assert(spark.read.parquet(s"$dir/graph/$t").count() > 0, t)
    // triangles table ≡ the q145 core over the WRITTEN edge artifact —
    // the artifact really is the input every analytic consumed
    val edges = spark.read.parquet(s"$dir/graph/edges")
      .select(col("id1"), col("id2"))
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val gotTri = keyed(spark.read.parquet(s"$dir/graph/triangles"))
    val expTri = keyed(graft.ops.TextOps.triangleCountOn(edges))
    // pagerank table ≡ the q127 gate (same corpus, same edge generator)
    val gotPr = keyed(spark.read.parquet(s"$dir/graph/pagerank"))
    val expPr = keyed(graft.ops.TextOps.q127Pagerank(spark, sf))
    graft.CachedFrames.drain()
    assert(gotTri === expTri)
    assert(gotPr === expPr)
  }


  test("warehouse-report bundle: all seventeen audit tables land, each " +
    "row-equal to its gate query") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("cli-wh").toString
    WarehouseReport.main(Array("--input", sf, "--output", s"$dir/wh"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val checks: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "fk_orphans" -> (() => graft.ops.Relational.q179FkOrphans(spark, sf)),
      "fd_audit" -> (() => graft.ops.Relational.q220FdAudit(spark, sf)),
      "spend_mobility" ->
        (() => graft.ops.Relational.q223SpendMobility(spark, sf)),
      "order_gap" -> (() => graft.ops.Relational.q224OrderGap(spark, sf)),
      "discount_elasticity" ->
        (() => graft.ops.Relational.q226DiscountElasticity(spark, sf)),
      "price_benford" ->
        (() => graft.ops.Relational.q228PriceBenford(spark, sf)),
      "rfm_segments" ->
        (() => graft.ops.Relational.q243RfmSegments(spark, sf)),
      "basket_lift" ->
        (() => graft.ops.Relational.q244BasketLift(spark, sf)),
      "supplier_reliability" ->
        (() => graft.ops.Relational.q246SupplierReliability(spark, sf)))
    checks.foreach { case (name, f) =>
      val got = rows(spark.read.parquet(s"$dir/wh/$name"))
      val exp = rows(f())
      graft.CachedFrames.drain()
      assert(got === exp, name)
    }
    for (t <- Seq("join_fanout", "ship_lag", "monthly_revenue",
        "revenue_trend", "month_effect", "priority_drift", "abc",
        "ledger_recon"))
      assert(spark.read.parquet(s"$dir/wh/$t").count() > 0, t)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The SHARED law harness of the [[IndexFamily]] contract: every family in
  * the registry — the four that predate it (corpus/vector/substr/graph)
  * and the lshband family that landed ON it — passes the same grown-index
  * law through one function, on organic sf0.001 splits. The families'
  * own specs keep their deeper crafted fixtures (cap crossings, verdict
  * precedence, closed admission loops); this spec is the contract-level
  * guarantee that Build/Admit/Extend compose the same way everywhere, so
  * family #6 inherits a law suite by joining the registry. */
class IndexFamilySpec extends AnyFunSuite with SparkSpec {

  /** Row set of a law table, canonicalized: the family's own `canonical`
    * normalization plus name-sorted column order (a USING-join moves its
    * key first — e.g. forgetFromIndex's cid — which must not read as a
    * row mismatch). */
  private def rowSet(f: IndexFamily, t: String, df: DataFrame) = {
    val c = f.canonical(t, df)
    c.select(c.columns.sorted.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).toSet
  }

  /** The law: extend(build(base), batch) ≡ the family's grown reference,
    * table for table as canonicalized row sets. */
  private def grownLaw(f: IndexFamily, base: DataFrame,
      batch: DataFrame): Unit = {
    val grown = f.extend(f.build(base), batch)
    val ref = f.grownReference(base, batch)
    try f.tableNames.foreach { t =>
      val g = rowSet(f, t, grown(t))
      val r = rowSet(f, t, ref(t))
      assert(g === r, s"table '$t' of family '${f.name}'")
      assert(g.nonEmpty, s"empty law table '$t' of '${f.name}' tests nothing")
    } finally graft.CachedFrames.drain()
  }

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("registry: five families, unique names, byName round-trips, " +
    "unknown names fail fast") {
    assert(IndexFamily.all.map(_.name) ===
      Seq("corpus", "vector", "substr", "graph", "lshband"))
    IndexFamily.all.foreach(f => assert(IndexFamily.byName(f.name) eq f))
    assertThrows[IllegalArgumentException](IndexFamily.byName("nope"))
  }

  for (f <- IndexFamily.all) {
    test(s"grown-index law (${f.name}): extend(build(base), batch) equals " +
      "the family's from-scratch reference on an organic sf0.001 split") {
      val (base, batch) =
        if (f.idColumn == "vec_id")
          (vecs.filter(col("vec_id") % 5 =!= 0),
            vecs.filter(col("vec_id") % 5 === 0))
        else
          (docs.filter(col("doc_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0))
      grownLaw(f, base, batch)
    }
  }

  test("lshband admit law: admission against the standing index equals " +
    "the from-scratch q27 candidates of the grown corpus restricted to " +
    "batch-incident pairs (and nothing is re-signed to get them)") {
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val tables = LshBandIndexFamily.build(base)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    val admitted = try rows(LshBandIndexFamily.admit(batch, tables))
      finally graft.CachedFrames.drain()
    val truth = try rows(NearDup.lshPairsOn(docs)
        .filter(col("id1") % 5 === 0 || col("id2") % 5 === 0))
      finally graft.CachedFrames.drain()
    assert(admitted === truth)
    assert(admitted.nonEmpty)
  }

  for (f <- IndexFamily.all) {
    test(s"forget law (${f.name}): forget(build(corpus), ids) equals the " +
      "family's surviving-corpus reference on an organic sf0.001 slice") {
      val corpus = if (f.idColumn == "vec_id") vecs else docs
      val ids = corpus.select(col(f.idColumn))
        .filter(col(f.idColumn) % 7 === 0)
      val forgotten = f.forget(f.build(corpus), ids)
        .getOrElse(fail(s"${f.name} must forget"))
      val ref = f.forgetReference(corpus, ids)
      try f.tableNames.foreach { t =>
        val g = rowSet(f, t, forgotten(t))
        val r = rowSet(f, t, ref(t))
        assert(g === r, s"table '$t' of family '${f.name}'")
        assert(g.nonEmpty, s"empty forget table '$t' of '${f.name}'")
      } finally graft.CachedFrames.drain()
    }
  }

  test("substr forgets via writer attribution; a LEGACY gram-only artifact " +
    "(no doc_id column) honestly answers None instead of guessing") {
    val built = SubstrIndexFamily.build(docs.limit(5))
    assert(built("grams").columns.toSeq === Seq("doc_id", "gram"))
    assert(SubstrIndexFamily.forget(built,
      docs.limit(1).select(col("doc_id"))).isDefined)
    // the pre-attribution artifact shape: existence-only grams — deleting
    // a shared gram on one doc's behalf would un-index every surviving
    // doc's copy, so the only honest answer is "rebuild"
    val legacy = Map("grams" -> built("grams").select(col("gram")).distinct())
    assert(SubstrIndexFamily.forget(legacy,
      docs.limit(1).select(col("doc_id"))).isEmpty)
    graft.CachedFrames.drain()
  }

  test("artifact IO round-trips every family's tables through a directory") {
    val dir = java.nio.file.Files.createTempDirectory("idx-fam").toString
    // smallest family end-to-end on disk; write/read are family-generic
    val f = SubstrIndexFamily
    val built = f.build(docs.limit(20))
    IndexFamily.write(s"$dir/s", built, f)
    val back = IndexFamily.read(spark, s"$dir/s", f)
    assert(back.keySet === f.tableNames.toSet)
    assert(back("grams").collect().map(_.toSeq).toSet ===
      built("grams").collect().map(_.toSeq).toSet)
    graft.CachedFrames.drain()
  }
}

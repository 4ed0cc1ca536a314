package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE contract over every persisted incremental index family.
  *
  * Five families maintain a standing-corpus artifact that admission
  * probes and extension grows without ever re-scanning base data:
  *
  *   - `corpus`  — exact digests + SimHash bands (text admission, q71)
  *   - `vector`  — IVF codebook + cell entry arrays (semantic admission, q78)
  *   - `substr`  — writer-attributed W-token gram postings (substring
  *     dedup, q166/q184; attribution priced by q263)
  *   - `graph`   — winnowed fingerprint postings + df/sizes (containment, q68/q238)
  *   - `lshband` — MinHash signatures + band postings (near-dup candidates, q27/q131)
  *
  * Each previously hand-rolled the same four-part shape: a multi-table
  * artifact directory, a doc-disjointness contract between base and batch,
  * a Build/Admit/Extend CLI trio, and a grown ≡ from-scratch law spec.
  * This trait IS that shape, so the shared pieces (artifact IO, the
  * generic CLI trio, the IndexFamilySpec law harness) are written once and
  * a new family is a config — the `lshband` family landed as exactly one
  * object below plus its admit core, not 300 new lines of plumbing.
  *
  * CONTRACTS. `build(corpus)` derives every artifact table from one
  * corpus frame. `extend(tables, batch)` grows the artifact with a batch
  * whose [[idColumn]] values are DISJOINT from everything already
  * indexed, reading none of the base's raw data. The law
  * (IndexFamilySpec, all families): `extend(build(base), batch)` equals
  * [[grownReference]] table-for-table as row sets after [[canonical]]
  * normalization — for most families the reference is the from-scratch
  * `build(base ∪ batch)`; the vector family overrides it because a
  * from-scratch rebuild would RETRAIN the codebook, so its honest law is
  * "every base ∪ batch vector assigned to base's frozen codebook".
  * `admit(batch, tables)` is the family's probe — its output semantics
  * are the family's own (verdicts, removal plans, edges, candidate
  * pairs) and each is pinned by its own oracle-gated query.
  *
  * The existing per-family functions stay where they are (next to their
  * oracles and scale arguments); the objects below are thin adapters, so
  * the CLI jobs and gate queries that predate the contract keep their
  * exact plans. */
trait IndexFamily {
  def name: String

  /** Artifact tables in write order: table name = subdirectory under the
    * artifact dir. */
  def tableNames: Seq[String]

  /** The id column whose base/batch disjointness the extend law assumes. */
  def idColumn: String

  def build(corpus: DataFrame): Map[String, DataFrame]

  def admit(batch: DataFrame, tables: Map[String, DataFrame]): DataFrame

  def extend(tables: Map[String, DataFrame], batch: DataFrame): Map[String, DataFrame]

  /** What `extend(build(base), batch)` must equal, table for table. */
  def grownReference(base: DataFrame, batch: DataFrame): Map[String, DataFrame] =
    build(base.unionByName(batch))

  /** Row-level normalization applied to BOTH sides before the law's
    * row-set comparison — identity except where a table's physical rows
    * carry representation artifacts (the vector family's cell arrays are
    * collect_list-ordered, so they compare exploded). */
  def canonical(table: String, df: DataFrame): DataFrame = df

  /** Deletion propagation ("right to be forgotten"): the artifact with
    * every row derived from the forgotten [[idColumn]] values removed —
    * or None where the ARTIFACT AT HAND cannot forget exactly (a legacy
    * pre-attribution substr index: existence-only grams carry no writer
    * attribution, and deleting a forgotten doc's grams would also forget
    * grams shared with surviving docs; the honest answer there is a
    * rebuild). LAW (IndexFamilySpec, every forgetting family):
    * `forget(build(corpus), ids)` ≡ [[forgetReference]] table-for-table
    * as canonicalized row sets. */
  def forget(tables: Map[String, DataFrame],
      ids: DataFrame): Option[Map[String, DataFrame]] = None

  /** What `forget(build(corpus), ids)` must equal: the from-scratch build
    * of the surviving corpus for the per-doc-derivation families; the
    * vector family overrides (its codebook stays FROZEN through deletions
    * — q78's invariant — so the reference assigns survivors to the
    * corpus-trained codebook rather than retraining). */
  def forgetReference(corpus: DataFrame, ids: DataFrame): Map[String, DataFrame] =
    build(corpus.join(ids.select(col(idColumn)), Seq(idColumn), "left_anti"))
}

object IndexFamily {

  /** The registry the generic CLI trio and the law harness iterate. */
  val all: Seq[IndexFamily] =
    Seq(CorpusIndexFamily, VectorIndexFamily, SubstrIndexFamily,
      GraphIndexFamily, LshBandIndexFamily)

  def byName(n: String): IndexFamily =
    all.find(_.name == n).getOrElse(throw new IllegalArgumentException(
      s"unknown index family '$n'; known: ${all.map(_.name).mkString(", ")}"))

  /** Write every artifact table under `dir/<table>` (overwrite). */
  def write(dir: String, tables: Map[String, DataFrame],
      family: IndexFamily): Unit =
    family.tableNames.foreach { t =>
      tables(t).write.mode("overwrite").parquet(s"$dir/$t")
    }

  /** Read the family's artifact back from `dir`, honoring TOMBSTONES: if
    * `dir/tombstones` exists (appended by [[graft.cli.TombstoneIndex]] —
    * the append-only deletion path), the loaded tables come back with
    * every tombstoned id's rows already forgotten, so every consumer of
    * the generic read (AdmitIndex, ExtendIndex, ForgetIndex) sees the
    * post-deletion artifact WITHOUT anything having rewritten it.
    *
    * This is the log-structured deletion shape a 100 TB artifact wants:
    * a GDPR delete is one tiny parquet append (visible to the very next
    * admission), never a synchronous rewrite of a corpus-scale index;
    * the physical rewrite happens whenever any job next WRITES the
    * artifact — ExtendIndex and ForgetIndex write the filtered tables to
    * a fresh directory with no tombstone dir, so extension doubles as
    * compaction. A family whose artifact cannot forget (a legacy
    * unattributed substr index) fails fast here with the same reason
    * ForgetIndex gives: silently admitting against un-deletable rows
    * would make the tombstone a no-op.
    *
    * Scale shape: the tombstone set rides one anti-join per table (or
    * the vector family's broadcast HOF filter) — O(artifact) read-side
    * work only for jobs that were already reading the artifact. */
  def read(spark: SparkSession, dir: String,
      family: IndexFamily): Map[String, DataFrame] = {
    val tables =
      family.tableNames.map(t => t -> spark.read.parquet(s"$dir/$t")).toMap
    val tomb = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (!tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(tomb)) tables
    else family.forget(tables,
        spark.read.parquet(s"$dir/tombstones").select(col(family.idColumn))
          .distinct())
      .getOrElse(throw new IllegalArgumentException(
        s"index at '$dir' carries tombstones but this '${family.name}' " +
          "artifact cannot forget exactly (no row attribution) — rebuild " +
          "it from the surviving corpus"))
  }
}

/** Text admission: exact digests + SimHash bands ([[Curation]]). Extension
  * is a pure row union of the batch's derived rows — production feeds the
  * verdict-`new` slice (ExtendCorpusIndex), but the law holds for any
  * id-disjoint batch because both tables are per-doc derivations. */
object CorpusIndexFamily extends IndexFamily {
  val name = "corpus"
  val tableNames = Seq("digests", "bands")
  val idColumn = "doc_id"
  def build(corpus: DataFrame): Map[String, DataFrame] = {
    val (digests, bands) = Curation.corpusIndexFrames(corpus)
    Map("digests" -> digests, "bands" -> bands)
  }
  def admit(batch: DataFrame, tables: Map[String, DataFrame]): DataFrame =
    Curation.admitAgainstIndex(batch, tables("digests"), tables("bands"))
  def extend(tables: Map[String, DataFrame], batch: DataFrame): Map[String, DataFrame] = {
    val (digests, bands) = Curation.corpusIndexFrames(batch)
    Map("digests" -> tables("digests").unionByName(digests),
      "bands" -> tables("bands").unionByName(bands))
  }
  override def forget(tables: Map[String, DataFrame],
      ids: DataFrame): Option[Map[String, DataFrame]] = {
    val (d, b) = Curation.forgetFromIndex(tables("digests"), tables("bands"),
      ids)
    Some(Map("digests" -> d, "bands" -> b))
  }
}

/** Semantic admission: IVF codebook + cell entry arrays ([[Embeddings]]).
  * The codebook is FROZEN between retrains (q78's invariant), so the
  * grown reference keeps base's codebook and assigns every vector to it;
  * cell tables compare exploded (entry arrays are collect_list-ordered). */
object VectorIndexFamily extends IndexFamily {
  val name = "vector"
  val tableNames = Seq("codebook", "cells")
  val idColumn = "vec_id"
  def build(corpus: DataFrame): Map[String, DataFrame] = {
    val (centsRow, cells) = Embeddings.admissionIndexFrames(corpus)
    Map("codebook" -> centsRow, "cells" -> cells)
  }
  def admit(batch: DataFrame, tables: Map[String, DataFrame]): DataFrame =
    Embeddings.admitVectorsAgainstIndex(batch, tables("codebook"),
      tables("cells"))
  def extend(tables: Map[String, DataFrame], batch: DataFrame): Map[String, DataFrame] =
    Map("codebook" -> tables("codebook"),
      "cells" -> Embeddings.extendVectorIndex(tables("codebook"),
        tables("cells"), batch))
  override def grownReference(base: DataFrame,
      batch: DataFrame): Map[String, DataFrame] = {
    val b = build(base)
    Map("codebook" -> b("codebook"),
      "cells" -> Embeddings.cellsUnderCodebook(base.unionByName(batch),
        b("codebook")))
  }
  override def canonical(table: String, df: DataFrame): DataFrame =
    if (table == "cells")
      df.select(col("cell"), explode(col("entries")).as("e"))
        .select(col("cell"), col("e.cid"), col("e.cv"), col("e.cn"))
    else df
  override def forget(tables: Map[String, DataFrame],
      ids: DataFrame): Option[Map[String, DataFrame]] =
    Some(Map("codebook" -> tables("codebook"),
      "cells" -> Embeddings.forgetFromVectorIndex(tables("cells"), ids)))
  override def forgetReference(corpus: DataFrame,
      ids: DataFrame): Map[String, DataFrame] = {
    val b = build(corpus)
    val remaining = corpus.join(ids.select(col(idColumn)), Seq(idColumn),
      "left_anti")
    Map("codebook" -> b("codebook"),
      "cells" -> Embeddings.cellsUnderCodebook(remaining, b("codebook")))
  }
}

/** Substring dedup: the WRITER-ATTRIBUTED gram postings
  * ([[TextOps.substrIndexPostingsFrame]] — one (doc_id, gram) row per
  * distinct gram of each doc). Existence is still the only admission
  * signal (the probe dedups to grams), but attribution makes this a
  * per-doc derivation like every other forgetting family: extension is a
  * pure row union (id-disjoint batches cannot collide on (doc_id, gram))
  * and forget is one doc_id anti-join — a gram survives iff any surviving
  * writer still holds it, which the unattributed existence index could
  * not decide (deleting a shared gram on one doc's behalf would un-index
  * every surviving doc's copy). q263 prices the attribution overhead and
  * the shared-gram survivors on the gate corpus.
  *
  * LEGACY tolerance: a pre-attribution artifact (gram-only — built by an
  * older BuildSubstrIndex or left by the old ingest loop) still ADMITS
  * fine, but carries no attribution to forget by: `forget` answers None
  * for it, and the ForgetIndex CLI fails fast with the reason — the
  * honest answer there remains a rebuild of the surviving corpus. */
object SubstrIndexFamily extends IndexFamily {
  val name = "substr"
  val tableNames = Seq("grams")
  val idColumn = "doc_id"
  def build(corpus: DataFrame): Map[String, DataFrame] =
    Map("grams" -> TextOps.substrIndexPostingsFrame(corpus))
  def admit(batch: DataFrame, tables: Map[String, DataFrame]): DataFrame =
    TextOps.substrAdmitAgainstIndex(batch, tables("grams"))
  def extend(tables: Map[String, DataFrame], batch: DataFrame): Map[String, DataFrame] =
    Map("grams" -> tables("grams")
      .unionByName(TextOps.substrIndexPostingsFrame(batch)))
  override def forget(tables: Map[String, DataFrame],
      ids: DataFrame): Option[Map[String, DataFrame]] =
    if (!tables("grams").columns.contains("doc_id")) None // legacy artifact
    else Some(Map("grams" -> tables("grams")
      .join(ids.select(col(idColumn)), Seq(idColumn), "left_anti")))
}

/** Containment graph: winnowed fingerprint postings + df/sizes rollups
  * ([[TextOps]]), with the df-cap crossing bookkeeping in extend. */
object GraphIndexFamily extends IndexFamily {
  val name = "graph"
  val tableNames = Seq("fps", "df", "sizes")
  val idColumn = "doc_id"
  def build(corpus: DataFrame): Map[String, DataFrame] = {
    val fps = graft.CachedFrames.track(TextOps.graphIndexFps(corpus))
    Map("fps" -> fps, "df" -> TextOps.graphIndexDfOf(fps),
      "sizes" -> TextOps.graphIndexSizesOf(fps))
  }
  def admit(batch: DataFrame, tables: Map[String, DataFrame]): DataFrame =
    TextOps.graphAdmitAgainstIndex(batch, tables("fps"), tables("df"),
      tables("sizes"))
  def extend(tables: Map[String, DataFrame], batch: DataFrame): Map[String, DataFrame] = {
    val (fps2, df2, sizes2) = TextOps.graphIndexExtend(tables("fps"),
      tables("df"), tables("sizes"), batch)
    Map("fps" -> fps2, "df" -> df2, "sizes" -> sizes2)
  }
  /** Forgetting SHRINKS document frequencies, so fingerprints the deleted
    * docs had pushed over the cap can UN-drop for every surviving doc —
    * df and sizes must re-derive from the surviving postings (an
    * O(postings) rollup; the fps anti-join is the only per-row work and
    * NO text is ever re-scanned). */
  override def forget(tables: Map[String, DataFrame],
      ids: DataFrame): Option[Map[String, DataFrame]] = {
    val fps2 = graft.CachedFrames.track(tables("fps")
      .join(ids.select(col(idColumn)), Seq(idColumn), "left_anti"))
    Some(Map("fps" -> fps2, "df" -> TextOps.graphIndexDfOf(fps2),
      "sizes" -> TextOps.graphIndexSizesOf(fps2)))
  }
}

/** Near-dup candidates: MinHash signatures + band postings ([[NearDup]]) —
  * family #5, landed ON the contract: q131's consolidation input becomes
  * one banded join against the standing posting table instead of a
  * corpus-wide re-sign. Both tables are per-doc derivations, so extension
  * is a pure row union. */
object LshBandIndexFamily extends IndexFamily {
  val name = "lshband"
  val tableNames = Seq("sig", "bands")
  val idColumn = "doc_id"
  def build(corpus: DataFrame): Map[String, DataFrame] = {
    val sig = graft.CachedFrames.track(NearDup.sigFrame(corpus))
    Map("sig" -> sig, "bands" -> NearDup.bandsFrame(sig))
  }
  def admit(batch: DataFrame, tables: Map[String, DataFrame]): DataFrame =
    NearDup.lshAdmitAgainstIndex(batch, tables("sig"), tables("bands"))
  def extend(tables: Map[String, DataFrame], batch: DataFrame): Map[String, DataFrame] = {
    val bsig = graft.CachedFrames.track(NearDup.sigFrame(batch))
    Map("sig" -> tables("sig").unionByName(bsig),
      "bands" -> tables("bands").unionByName(NearDup.bandsFrame(bsig)))
  }
  override def forget(tables: Map[String, DataFrame],
      ids: DataFrame): Option[Map[String, DataFrame]] = {
    val del = ids.select(col(idColumn))
    Some(Map("sig" -> tables("sig").join(del, Seq(idColumn), "left_anti"),
      "bands" -> tables("bands").join(del, Seq(idColumn), "left_anti")))
  }
}

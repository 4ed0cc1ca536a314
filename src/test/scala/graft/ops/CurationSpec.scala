package graft.ops

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q70 shard positions are a dense 1..n_shard enumeration of the corpus") {
    val rows = Curation.q70ShuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === nDocs) // every doc assigned exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
    // (shard, pos) is a key, and positions are dense from 1 per shard
    assert(rows.map(r => (r._2, r._3)).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val pos = rs.map(_._3).sorted
      assert(pos === (1L to rs.length.toLong).toArray, s"shard $shard not dense")
    }
    // md5 keys spread the corpus: no empty shard at 500 docs / 8 shards,
    // and no shard hoards more than a third of the corpus
    val sizes = rows.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size === Curation.ShuffleShards)
    assert(sizes.values.max < rows.length / 3)
  }

  test("q71 incremental dedup: exact, near, and new verdicts; exact beats near") {
    import spark.implicits._
    // simhash hashes DISTINCT tokens, so a reordering/repetition of the
    // same token set fingerprints identically (hamming 0) while the md5
    // digest differs -> a guaranteed dup_near without banding luck
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven"),
      (12L, "unrelated corpus text about nothing else")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "  Alpha beta GAMMA delta epsilon zeta "), // equals 10 after lower+trim -> exact
      (2L, "two one three four five six seven six"),  // same token set as 11 -> near
      (3L, "totally disjoint vocabulary words here"), // new
      (4L, "one two three four five six seven")       // identical to 11: exact AND near -> exact wins
    ).toDF("doc_id", "text")
    val got = Curation.incrementalDedupOn(batch, corpus).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    graft.CachedFrames.drain()
    // doc 1: md5 uses lower(trim(text)) -> equals corpus 10 lowered? corpus
    // text is already lowercase, so lower-trim of batch 1 == corpus 10 text
    assert(got(1L) === (("dup_exact", 10L)))
    assert(got(2L) === (("dup_near", 11L)))
    assert(got(3L) === (("new", -1L)))
    assert(got(4L) === (("dup_exact", 11L)))
  }

  test("q70 assignment is reproducible run to run") {
    // the window's order key (skey, doc_id) is total, so the assignment is
    // independent of input layout/parallelism — unlike rand() or
    // repartition-based shuffling, a retry cannot move a document
    val a = Curation.q70ShuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Curation.q70ShuffleShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }
}

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

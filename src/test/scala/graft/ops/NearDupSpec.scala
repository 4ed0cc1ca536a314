package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class NearDupSpec extends AnyFunSuite with SparkSpec {

  test("q107 scoreboard: truth counts match a plain-Scala all-pairs Jaccard oracle, hits stay within truth") {
    val sf = "/root/testdata/sf0.001"
    try {
      val rows = NearDup.q107LshScoreboard(spark, sf).collect()
        .map(r => r.getDouble(0) -> r).toMap
      assert(rows.keySet === Set(0.2, 0.5, 0.8))

      // independent truth: ALL-pairs exact Jaccard over the sample window,
      // computed from raw text with scala.collection Sets — no posting-list
      // join, no shared formula with the operator under test
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
        .filter(_._2.length >= 3)
        .map { case (id, t) => id -> t.sliding(3).map(_.mkString(" ")).toSet }
      val sample = docs.filter(_._1 < 100)
      val expTrue = scala.collection.mutable.Map(0.2 -> 0L, 0.5 -> 0L, 0.8 -> 0L)
      for ((a, sa) <- sample; (b, sb) <- docs if a < b) {
        val inter = (sa & sb).size
        if (inter > 0) {
          val j = inter.toDouble / (sa.size + sb.size - inter)
          expTrue.keys.foreach(t => if (j >= t) expTrue(t) += 1)
        }
      }
      expTrue.foreach { case (tau, n) =>
        assert(rows(tau).getLong(1) === n, s"n_true at $tau")
      }

      rows.values.foreach { r =>
        val (nTrue, nCand, nHit) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(nHit <= nTrue && nHit <= nCand, r.toString)
        assert(r.getDouble(4) === (if (nTrue > 0) nHit.toDouble / nTrue else 0.0))
        assert(r.getDouble(5) === (if (nCand > 0) nHit.toDouble / nCand else 0.0))
      }
      // truth can only shrink as the threshold rises
      assert(rows(0.2).getLong(1) >= rows(0.5).getLong(1))
      assert(rows(0.5).getLong(1) >= rows(0.8).getLong(1))
      // the planted near-dups exist and banding finds them all at this SF
      assert(rows(0.8).getLong(1) > 0L)
      assert(rows(0.8).getDouble(4) === 1.0)
    } finally graft.CachedFrames.drain()
  }
}

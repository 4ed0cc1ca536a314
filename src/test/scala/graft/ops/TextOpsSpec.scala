package graft.ops

import graft.{SparkSpec, Tables}
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with SparkSpec {

  test("q65 chunks reproduce an independent sliding-window reference exactly") {
    val sf = "/root/testdata/sf0.001"
    val got = TextOps.q65ChunkOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val (w, s) = (TextOps.ChunkWidth, TextOps.ChunkStride)
    var checked = 0
    docs.foreach { r =>
      val toks = r.getString(1).trim.split("\\s+")
      val nChunks = 1 + math.ceil(math.max(toks.length - w, 0) / s.toDouble).toInt
      (0 until nChunks).foreach { i =>
        val expect = toks.slice(i * s, i * s + w)
        val (n, text) = got((r.getLong(0), i))
        assert(n === expect.length, s"doc ${r.getLong(0)} chunk $i")
        assert(text === expect.mkString(" "), s"doc ${r.getLong(0)} chunk $i")
        checked += 1
      }
    }
    assert(checked > 100)
    assert(got.size === checked) // and not one chunk more
  }
}

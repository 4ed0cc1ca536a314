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
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  import Multimodal._

  test("synthesized media table has the binary + typed-metadata schema") {
    val ds = synthesize(spark, 30)
    val fields = ds.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("payload") === "binary")
    assert(fields("meta") === "struct")
    assert(ds.count() === 30L)
    // deterministic: same seed stream on every evaluation
    val a = ds.filter(col("media_id") === 7L).head().payload
    val b = synthesize(spark, 30).filter(col("media_id") === 7L).head().payload
    assert(a.toSeq === b.toSeq)
  }

  test("decode runs batch-wise, preserves every row, fixed feature width") {
    val ds = synthesize(spark, 100)
    val feats = decode(ds, batchSize = 16, parallelism = Some(8))
    val rows = feats.collect()
    assert(rows.length === 100)
    assert(rows.forall(_.feature.length === Decoder.Fake.FeatureDim))
    // histogram is normalized: bins sum to ~1
    assert(rows.forall(r => math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-3))
    // frame sampling matches the payload length plan
    assert(rows.forall(r => r.frame_count === frameOffsets(r.n_bytes, 1024).length))
  }

  test("decoder sees bounded batch shapes (the mapInPandas contract)") {
    val seen = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val probe = new Decoder {
      override def decodeBatch(b: Seq[MediaFile]): Seq[MediaFeatures] = {
        seen.add(b.size)
        Decoder.Fake.decodeBatch(b)
      }
    }
    decode(synthesize(spark, 100), decoder = probe, batchSize = 16,
      parallelism = Some(4)).collect()
    val sizes = seen.value
    assert(sizes.size() > 0)
    sizes.forEach(s => assert(s <= 16 && s > 0))
  }

  test("features feed the embedding operators downstream") {
    import spark.implicits._
    val feats = decode(synthesize(spark, 50)).cache()
    // brute-force cosine between media feature vectors — same fold shape as
    // Embeddings: proves the decoded column is ANN-ready
    val v = feats.select(col("media_id"),
      expr("transform(feature, x -> CAST(x AS DOUBLE))").as("v"))
    val paired = v.alias("a").crossJoin(v.alias("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
    assert(paired.count() === 50L * 49 / 2)
    assert(paired.agg(min("dot")).head().getDouble(0) >= 0.0) // histograms are non-negative
  }
}

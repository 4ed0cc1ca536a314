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

  test("WAV decoder parses a real RIFF/PCM16 container exactly") {
    val samples = Array[Short](-32768, -1, 0, 1, 32767, 16384, -16384, 4096)
    val wav = wavBytes(samples)
    val out = Decoder.Wav
      .decodeBatch(Seq(MediaFile(1L, "audio", wav, MediaMeta("wav", 0, 0, 1L))))
      .head
    assert(out.frame_count === 8) // dataLen / blockAlign = 16 / 2
    assert(out.n_bytes === wav.length)
    // amplitude bins (s + 32768) >> 12 for the samples above
    val expect = Map(0 -> 1, 7 -> 1, 8 -> 2, 15 -> 1, 12 -> 1, 4 -> 1, 9 -> 1)
    (0 until Decoder.FeatureDim).foreach { b =>
      assert(math.abs(out.feature(b) - expect.getOrElse(b, 0) / 8f) < 1e-6f,
        s"bin $b: ${out.feature(b)}")
    }
  }

  test("Auto decoder routes WAV payloads to the real parser") {
    val feats = decode(synthesize(spark, 60), decoder = Decoder.Auto,
      parallelism = Some(4)).collect()
    assert(feats.length === 60)
    val audio = feats.filter(_.kind == "audio")
    assert(audio.nonEmpty)
    // real parse: frame_count = PCM samples = (payload - 44B header) / 2,
    // which the byte-histogram fake could not produce
    assert(audio.forall(r => r.frame_count === (r.n_bytes - 44) / 2))
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

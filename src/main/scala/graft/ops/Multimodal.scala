package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media payloads are
  * opaque BINARY columns with typed metadata, processed batch-wise inside
  * `mapPartitions` — the Scala analog of arrow-batched `mapInPandas`
  * (SURVEY.md north-star ops; the real decode libs are not in this
  * container, so [[Decoder.Fake]] is a clearly-marked deterministic stub —
  * the Spark-side schema, partitioning, batch shape and operator wiring are
  * real and tested).
  *
  * Scale shape (100 TB): payloads repartition by media_id so decode
  * parallelism is independent of source file layout; batches bound peak
  * executor memory (batchSize × avg payload); the decoded feature column is
  * a fixed-width Array[Float] ready for the Embeddings operators (ANN /
  * centroids) downstream.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, duration_ms: Long)

  /** One media row: opaque bytes + typed metadata. */
  final case class MediaFile(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  /** Decoded per-media features. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      frame_count: Int, feature: Array[Float])

  /** Batch decoder contract — a real implementation would wrap an image /
    * audio codec; calls receive whole batches (the mapInPandas shape) so
    * native decoders can amortize per-call overhead. */
  trait Decoder extends Serializable {
    def decodeBatch(batch: Seq[MediaFile]): Seq[MediaFeatures]
  }

  object Decoder {
    /** STUB decode: deterministic fake standing in for a codec — feature =
      * 16-bin normalized byte histogram, frames = stride-sampled payload
      * offsets. Replace with a real codec wrapper outside this container. */
    object Fake extends Decoder {
      val FeatureDim = 16
      override def decodeBatch(batch: Seq[MediaFile]): Seq[MediaFeatures] =
        batch.map { m =>
          val hist = new Array[Float](FeatureDim)
          var i = 0
          while (i < m.payload.length) {
            hist((m.payload(i) & 0xff) >> 4) += 1f
            i += 1
          }
          val n = math.max(m.payload.length, 1)
          var j = 0
          while (j < FeatureDim) { hist(j) /= n.toFloat; j += 1 }
          val frames = frameOffsets(m.payload.length, 1024).length
          MediaFeatures(m.media_id, m.kind, m.payload.length, frames, hist)
        }
    }
  }

  /** Frame-sampling plan: byte offsets of every `stride`-th frame start. */
  def frameOffsets(nBytes: Int, stride: Int): Array[Int] =
    (0 until nBytes by stride).toArray

  /** Deterministic synthetic media table (no binary fixture ships with the
    * test data): payload bytes are a seeded xorshift stream per media_id. */
  def synthesize(spark: SparkSession, n: Int, maxBytes: Int = 4096): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).map { id =>
      var s = id * 2654435761L + 1
      def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = (math.abs(next()) % maxBytes).toInt + 64
      val payload = Array.tabulate[Byte](len)(_ => next().toByte)
      MediaFile(id, kind,
        payload, MediaMeta(if (kind == "image") "png" else "riff",
          640, 480, if (kind == "image") 0L else 30000L))
    }
  }

  /** q34 (rows-only driver check — no SQL oracle for binary decode):
    * synthesize → batch decode → per-kind feature stats. */
  def q34MediaFeatures(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    decode(synthesize(spark, 300), parallelism = Some(8))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("frame_count")).as("total_frames"))

  /** The decode operator: repartition on media_id (layout-independent
    * parallelism), then batch-wise decode inside mapPartitions — batches of
    * `batchSize` bound executor memory exactly like an Arrow batch would. */
  def decode(
      media: Dataset[MediaFile],
      decoder: Decoder = Decoder.Fake,
      batchSize: Int = 64,
      parallelism: Option[Int] = None): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val repart = parallelism
      .map(p => media.repartition(p, col("media_id")))
      .getOrElse(media.repartition(col("media_id")))
    repart.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decodeBatch(b.toSeq))
    }
  }
}

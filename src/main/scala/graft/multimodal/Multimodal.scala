package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata. The Spark-side plumbing — schema, header parsing as
  * Column expressions, partition-batched inference shape, frame sampling —
  * is real and tested; the actual media DECODE is a deterministic STUB
  * (this container ships no image/audio codecs), clearly marked below.
  *
  * Layout convention for the synthetic payloads (and the stub decoder):
  * bytes 0-3 big-endian width, 4-7 height, 8-11 frame count; the rest is
  * the "pixel" payload, frames laid out contiguously.
  */
object Multimodal {

  final case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeature(asset_id: Long, embedding: Array[Float])

  /** Deterministic synthetic assets (pure function of id). */
  def syntheticAssets(spark: SparkSession, n: Long): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 4 + (id % 8).toInt
      val h = 2 + (id % 5).toInt
      val frames = if (kind == "video") 2 + (id % 6).toInt else 1
      val body = Array.tabulate((w * h * frames).min(256))(i => ((id * 31 + i) % 251).toByte)
      val header = java.nio.ByteBuffer.allocate(12).putInt(w).putInt(h).putInt(frames).array()
      MediaAsset(id, kind, header ++ body)
    }
  }

  /** Header fields parsed from the binary payload with pure Column
    * expressions (hex->int via conv): no UDF, stays in codegen.
    */
  def withParsedMeta(assets: DataFrame): DataFrame = {
    def beInt(c: Column, offset: Int): Column =
      conv(hex(substring(c, offset + 1, 4)), 16, 10).cast("int")
    assets
      .withColumn("width", beInt(col("payload"), 0))
      .withColumn("height", beInt(col("payload"), 4))
      .withColumn("frames", beInt(col("payload"), 8))
      .withColumn("payload_bytes", length(col("payload")))
  }

  /** Frame sampling for video payloads: every `stride`-th frame index, with
    * the byte range of each sampled frame — explode stays relational.
    */
  def sampleFrames(parsed: DataFrame, stride: Int): DataFrame = {
    val frameBytes = (col("width") * col("height")).cast("int")
    parsed
      .filter(col("kind") === "video")
      .select(col("asset_id"), col("frames"), frameBytes.as("frame_bytes"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("byte_start", lit(12) + col("frame_idx") * col("frame_bytes"))
  }

  /** Partition-batched "inference": the mapInPandas analogue. Batches of
    * `batchSize` assets at a time per partition (the real batch shape a
    * model server wants).
    *
    * STUB: the decode+embed step is a deterministic fake (hash-derived
    * 8-dim vector). A real deployment swaps `fakeDecodeEmbed` for a codec +
    * model call; everything around it — batching, schema, partitioning —
    * is the production shape.
    */
  def extractFeatures(assets: Dataset[MediaAsset], batchSize: Int = 16): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch
        batch.map(a => MediaFeature(a.asset_id, fakeDecodeEmbed(a.payload)))
      }
    }
  }

  /** STUB decode+embed — deterministic fake standing in for codec+model. */
  private def fakeDecodeEmbed(payload: Array[Byte]): Array[Float] = {
    var h = 1469598103934665603L
    payload.foreach { b => h = (h ^ (b & 0xff)) * 1099511628211L }
    Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xff).toFloat - 128f) / 128f)
  }
}

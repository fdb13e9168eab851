package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The DECODE step is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs); everything Spark-side — the schema, the
  * typed Dataset, the partition-batched iteration shape (mirroring an
  * Arrow-batch UDF), frame sampling, metadata rewrite — is real and tested.
  * A production deployment swaps [[stubDecode]] for a codec call with the
  * same signature.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)
  final case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, nBytes: Int, digest: String, brightness: Double)

  /** Deterministic synthetic media corpus from a text table: bytes = UTF-8
    * text, metadata derived from the id/length. Stands in for real decoded
    * uploads in tests and queries. */
  def synthesizeFromText(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")), (col(idCol) % 3 + 1).cast("int")).as("format"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        (col(idCol) % 7 + 1).cast("int").as("nFrames")).as("meta"))

  /** ==== STUB ==== "decode" one media blob: a real implementation calls an
    * image/audio codec here; the stub derives deterministic features
    * (brightness := mean byte value). Signature and batch shape are the
    * production ones. */
  def stubDecode(m: MediaRow): MediaFeatures = {
    var s = 0L
    var i = 0
    while (i < m.media.length) { s += (m.media(i) & 0xFF); i += 1 }
    val brightness = if (m.media.length == 0) 0.0 else s.toDouble / m.media.length
    MediaFeatures(m.id, m.media.length,
      java.security.MessageDigest.getInstance("MD5").digest(m.media)
        .map("%02x".format(_)).mkString,
      brightness)
  }

  /** Batched per-partition decode — the mapInPandas/Arrow-batch shape: the
    * iterator is consumed in fixed-size batches so a codec can amortize
    * setup per batch, without materializing a partition in memory. */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map(stubDecode)))
  }

  /** Sample every nth frame of a video-like row (frames as binary chunks of
    * the media blob): posexplode keeps the frame index. */
  def frameSample(df: DataFrame, every: Int): DataFrame =
    df.select(col("id"), col("meta"),
        posexplode(expr(
          s"filter(transform(sequence(0, meta.nFrames - 1), f -> named_struct('f', f, 'chunk', substring(media, f * 16 + 1, 16))), s -> s.f % $every = 0)"))
          .as(Seq("pos", "frame")))
      .select(col("id"), col("frame.f").as("frame_idx"), col("frame.chunk").as("chunk"))

  /** Metadata rewrite for a resize — binary passthrough (STUB: a real
    * resize re-encodes pixels; the metadata contract is what downstream
    * operators consume). */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta",
      struct(col("meta.format"), lit(w).as("width"), lit(h).as("height"),
        col("meta.nFrames")))
}

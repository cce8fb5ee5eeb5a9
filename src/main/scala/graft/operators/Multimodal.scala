package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 tier D).
  *
  * Media payloads are opaque `binary` columns + typed metadata,
  * processed partition-wise — the Scala-Spark equivalent of a Pandas
  * UDF over mapInPandas: one JVM-side pass per partition, batch-shaped,
  * no per-row driver involvement. No image/audio codecs ship in this
  * container, so THE DECODE STEP IS A STUB — `stubDecode` derives
  * deterministic fake features from the content hash. The Spark-side
  * plumbing (schema, binary handling, partition-wise execution,
  * typed output) is real and oracle-checked.
  */
object Multimodal {

  /** Typed row after metadata extraction. */
  case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Long, content_md5: String,
      fake_width: Long, fake_height: Long, n_frames: Long, decode_status: String)

  /** STUB decode: in production this calls the codec (image resize,
    * audio resample, video frame-sample). Here: md5-derived
    * deterministic pseudo-features so the oracle can verify the
    * plumbing end-to-end. */
  private def stubDecode(docId: Long, mediaType: String, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    def h(from: Int, len: Int): Long = java.lang.Long.parseLong(hex.substring(from, from + len), 16)
    MediaMeta(
      doc_id = docId,
      media_type = mediaType,
      n_bytes = bytes.length.toLong,
      content_md5 = hex,
      fake_width = 16 + h(0, 4) % 2048,
      fake_height = 16 + h(4, 4) % 2048,
      n_frames = if (mediaType == "video") 1 + h(8, 4) % 8 else 1L,
      decode_status = "stubbed")
  }

  /** Attach an opaque binary payload + media type to each document.
    * (Synthetic corpus has no real media; text bytes stand in. The
    * schema/partitioning contract is what downstream relies on.) */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  /** d1: partition-wise metadata extraction over binary media columns. */
  def d1MultimodalMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    attachBinary(docs)
      .select(col("doc_id").cast("long"), col("media"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, mt) => stubDecode(id, mt, bytes) })
      .orderBy("doc_id")
  }
}

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

  /** Driver-contract defaults, interpolated into the oracle SQL
    * (SparkEntry) so operator and oracle can't drift. */
  val DefaultChunkBytes = 64
  val DefaultStride = 2

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

  /** d2: binary payload chunking — fixed-size slicing of opaque media
    * blobs with per-chunk checksums: the transport/storage framing a
    * media pipeline needs before shipping payloads to decode workers
    * (and the shape frame-extraction plumbing takes for video). Pure
    * relational spelling: a sequence/explode fan-out + binary
    * substring, all codegen'd — one narrow pass, rows ≈ bytes/64, no
    * shuffle before the final ordered output. */
  /** d3: frame sampling — the every-Nth-frame selection a video
    * pipeline runs before decode (sample-then-decode, never the
    * reverse). Operates on the d2 chunk stream: video payloads only,
    * every `stride`-th chunk kept as a "frame", renumbered densely so
    * downstream batch shapes are contiguous. The stride filter is a
    * narrow predicate on the chunk stream — the decode worker fan-out
    * downstream sees 1/stride of the bytes. */
  def d3FrameSample(docs: DataFrame, stride: Int = DefaultStride): DataFrame =
    d2MediaChunks(docs)
      .filter(col("media_type") === "video" && col("chunk_idx") % stride === 0)
      .select(col("doc_id"), (col("chunk_idx") / stride).cast("long").as("frame_idx"),
        col("chunk_idx"), col("chunk_len"), col("chunk_md5"))
      .orderBy("doc_id", "frame_idx")

  def d2MediaChunks(docs: DataFrame, chunkBytes: Int = DefaultChunkBytes): DataFrame = {
    val n = length(col("media")) // byte length of the blob
    // ≥1 chunk even for an empty blob: sequence(0, -1) would generate
    // a DESCENDING sequence in Spark, not an empty one.
    val nChunks = greatest(ceil(n.cast("double") / chunkBytes).cast("int"), lit(1))
    attachBinary(docs)
      .select(col("doc_id"), col("media_type"), col("media"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"), col("media_type"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("media").substr(col("chunk_idx") * chunkBytes + 1, lit(chunkBytes)).as("chunk"))
      .select(col("doc_id"), col("media_type"), col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_len"),
        // checksum over the hex encoding, not the raw bytes: DuckDB's
        // md5 is VARCHAR-only, and hex is byte-exact in both engines
        // for ANY payload — no ASCII assumption.
        md5(hex(col("chunk"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }
}

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
    * (and the shape frame-extraction plumbing takes for video).
    *
    * Typed flatMap kernel: each emitted chunk row carries only
    * (idx, len, md5) — work and memory linear in blob size. The
    * earlier explode(sequence) spelling rode the FULL binary payload
    * into every chunk row before substr, O(bytes²/chunk) per blob —
    * harmless on the ~1 KB stand-in text, catastrophic on the
    * GB-scale video payload this operator exists for. */
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
    val spark0 = docs.sparkSession
    import spark0.implicits._
    graft.sources.Tables.parallelKernelInput(
        attachBinary(docs).select(col("doc_id"), col("media"), col("media_type")))
      .as[(Long, Array[Byte], String)]
      .flatMap { case (id, bytes, mt) =>
        // ≥1 chunk even for an empty blob (empty payloads still need a
        // framing row downstream).
        val nChunks = math.max(
          math.ceil(bytes.length.toDouble / chunkBytes).toInt, 1)
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until nChunks).iterator.map { i =>
          val from = i * chunkBytes
          val until = math.min(from + chunkBytes, bytes.length)
          // checksum over the hex encoding, not the raw bytes: DuckDB's
          // md5 is VARCHAR-only, and hex is byte-exact in both engines
          // for ANY payload — no ASCII assumption. Uppercase digits =
          // Spark's hex() and DuckDB's hex().
          val sb = new java.lang.StringBuilder((until - from) * 2)
          var j = from
          while (j < until) {
            sb.append(HexDigits((bytes(j) >> 4) & 0xf)); sb.append(HexDigits(bytes(j) & 0xf))
            j += 1
          }
          md.reset()
          val h = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            .map("%02x".format(_)).mkString
          (id, mt, i.toLong, (until - from).toLong, h)
        }
      }
      .toDF("doc_id", "media_type", "chunk_idx", "chunk_len", "chunk_md5")
      .orderBy("doc_id", "chunk_idx")
  }

  /** d4: content-addressed segment dedup over the chunk stream — the
    * media twin of c1's exact text dedup: identical fixed-size
    * segments (repeated frames, shared intros/outros, padding runs)
    * collapse by chunk checksum, reporting copy counts, distinct
    * carriers, the canonical (lowest-doc) copy, and the bytes a
    * dedup'd store would reclaim. For video corpora this is the
    * frame-level pruning pass that runs BEFORE any decode.
    *
    * Scale shape: one shuffle on the checksum — content-addressed
    * keys hash-distribute evenly, and the count/min aggregates are
    * map-side combinable, so even a degenerate corpus (billions of
    * identical black frames) costs one hot-key partial-agg chain,
    * never a blowup. */
  def d4ChunkDedup(docs: DataFrame, chunkBytes: Int = DefaultChunkBytes): DataFrame =
    d2MediaChunks(docs, chunkBytes)
      .groupBy(col("chunk_md5"))
      .agg(
        count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_doc"),
        max(col("chunk_len")).as("chunk_len"))
      .filter(col("n_copies") > 1)
      .withColumn("dup_bytes", (col("n_copies") - 1) * col("chunk_len"))
      .orderBy(col("n_copies").desc, col("chunk_md5"))

  /** d5: per-document media manifest with dedup-aware storage
    * accounting (d2 ∘ d4): for every document, its chunk count and
    * byte total, plus how many of its chunk INSTANCES are redundant —
    * i.e. not the canonical (first-occurring) copy of their content —
    * and the bytes a content-addressed store would reclaim for it.
    * The shipping manifest a CAS-backed media lake derives per asset.
    *
    * Canonical copy = min (doc_id, chunk_idx) per checksum, computed
    * as a map-side-combinable struct-min aggregate and joined back on
    * the checksum — deliberately NOT a per-checksum window, whose
    * partitions would be unbounded on a degenerate corpus (billions
    * of identical black frames in one window partition); the
    * agg+join spelling hash-distributes and degrades to an AQE skew
    * join instead. Two checksum shuffles + the doc regroup. */
  def d5MediaManifest(docs: DataFrame, chunkBytes: Int = DefaultChunkBytes): DataFrame = {
    val chunks = d2MediaChunks(docs, chunkBytes)
    val canon = chunks.groupBy(col("chunk_md5"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("c"))
      .select(col("chunk_md5"), col("c.doc_id").as("c_doc"), col("c.chunk_idx").as("c_idx"))
    chunks.join(canon, Seq("chunk_md5"))
      .withColumn("redundant",
        !(col("doc_id") === col("c_doc") && col("chunk_idx") === col("c_idx")))
      .groupBy(col("doc_id"), col("media_type"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("n_bytes"),
        sum(when(col("redundant"), 1L).otherwise(0L)).as("n_redundant"),
        sum(when(col("redundant"), col("chunk_len")).otherwise(0L)).as("reclaim_bytes"))
      .withColumn("uniq_ratio",
        when(col("n_bytes") === 0L, lit(null).cast("double"))
          .otherwise(round((col("n_bytes") - col("reclaim_bytes")).cast("double")
            / col("n_bytes"), 4)))
      .orderBy("doc_id")
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray
}

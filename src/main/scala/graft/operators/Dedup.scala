package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for the LLM-training-data tier (SURVEY §2
  * tier C, c1–c4). None of these is O(n²): every near-dup variant
  * generates candidates through blocking/LSH (pair count ≪ n²) and
  * verifies only candidates — the shape that survives 100 TB. Pair
  * outputs are deterministic top-50 lists (rounded score, then ids)
  * so the oracle compare is exact and threshold choice isn't
  * load-bearing on synthetic data.
  */
object Dedup {

  /** c1: exact dedup via content-hash groupBy — one shuffle on the
    * hash, emits the canonical keep-list (`min(doc_id)` wins, like the
    * reference's `on conflict do nothing` keeps the first row). */
  def c1Exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("content_hash")

  /** Distinct 32-bit shingle keys per doc. */
  private def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(TextFns.shingles3(col("text")))).as("shingle"))
      .select(col("doc_id"), TextFns.h8(col("shingle")).as("sh8"))

  /** c2: n-gram Jaccard similarity join via inverted index on shingle
    * keys. Document-frequency cap (df ≤ 200) is the prefix-filter
    * analog: it bounds the fan-out of hot shingles, which is what
    * blows up at scale; skew beyond that is AQE's job. */
  def c2NgramJaccard(docs: DataFrame): DataFrame = {
    val sh = docShingles(docs)
    val keep = sh.groupBy("sh8").agg(count(lit(1)).as("df")).filter(col("df") <= 200)
    val shk = sh.join(keep.select("sh8"), Seq("sh8"), "left_semi")
    val sizes = shk.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = shk.as("a"); val b = shk.as("b")
    val inter = a.join(b, col("a.sh8") === col("b.sh8") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  private val MinhashK = 16
  private val Bands = 8 // 8 bands × 2 rows

  /** Per-doc MinHash signature as (doc_id, i, minhash-hex) rows. */
  private def minhashRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(TextFns.shingles3(col("text")))).as("shingle"))
      .select(col("doc_id"), explode(sequence(lit(0), lit(MinhashK - 1))).as("i"), col("shingle"))
      .select(col("doc_id"), col("i"), TextFns.seededH8(col("i"), col("shingle")).as("h"))
      .groupBy("doc_id", "i").agg(min(col("h")).as("v"))

  /** c3: MinHash + LSH near-dup join: 16-hash signature → 8 bands of
    * 2 → band-key bucket join for candidates → exact Jaccard verify on
    * candidates only. Band buckets shuffle on the band key; candidate
    * count scales with true similarity mass, not n². */
  def c3MinhashLsh(docs: DataFrame): DataFrame = {
    val sig = minhashRows(docs)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("i"), col("v")))).as("sv"))
      .select(col("doc_id"), transform(col("sv"), s => s.getField("v")).as("sig"))
    val bands = sig.select(col("doc_id"),
        explode(sequence(lit(0), lit(Bands - 1))).as("j"), col("sig"))
      .select(col("doc_id"),
        md5(concat_ws(":", col("j"),
          element_at(col("sig"), col("j") * 2 + 1),
          element_at(col("sig"), col("j") * 2 + 2))).as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = docs.select(col("doc_id"),
      array_distinct(TextFns.shingles3(col("text"))).as("sh"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      // |A∩B| = |A|+|B|-|A∪B| — avoids depending on each engine's
      // intersect semantics, only union-of-sets must agree.
      .select(col("doc_a"), col("doc_b"),
        round((size(col("sh_a")) + size(col("sh_b")) - size(array_union(col("sh_a"), col("sh_b"))))
          .cast("double") / size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  /** Per-doc 60-bit SimHash from token-count-weighted md5 hashes. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), TextFns.h60(col("w")).as("h"))
    toks
      .select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(59))).as("i"))
      .withColumn("contrib",
        when(expr("(h >> i) & 1") === 1, col("cnt")).otherwise(-col("cnt")))
      .groupBy("doc_id", "i").agg(sum(col("contrib")).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("cast(1 as bigint) << i")).otherwise(lit(0L))).as("simhash"))
  }

  /** c4: SimHash near-dup join. Pigeonhole banding: 4 chunks of 15
    * bits — any pair within hamming distance 3 must agree on ≥1 chunk,
    * so the chunk-bucket join finds all close pairs without n²
    * compares. Candidates verified with bit_count(xor). */
  def c4Simhash(docs: DataFrame): DataFrame = {
    val sh = simhash(docs)
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("chunk", expr("(simhash >> (15 * j)) & 32767"))
    val cand = chunks.as("a")
      .join(chunks.as("b"), col("a.j") === col("b.j") && col("a.chunk") === col("b.chunk")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .distinct()
    cand.orderBy(col("hamming"), col("doc_a"), col("doc_b")).limit(50)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Text-analysis operators (SURVEY §2: c8–c11). All single-pass
  * narrow projections over the documents scan — no shuffle at all
  * except the final report-sized orderBy; this tier is embarrassingly
  * parallel at any scale.
  */
object TextAnalysis {

  private def markerArray = array(TextFns.EnMarkers.map(lit): _*)

  /** c8: language ID via two stacked heuristics — marker words and
    * character-bigram frequency (occurrences counted with the
    * length-difference trick, which both engines compute
    * identically; overlapping-match regexes would not be portable).
    * The marker/bigram lists per language are the model; the
    * synthetic corpus only overlaps the English lists, which the
    * heuristic duly reports. */
  def c8LangId(docs: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val hits = size(filter(toks, t => array_contains(markerArray, t)))
    val bigramHits = Seq("th", "he", "in", "er").map { b =>
      (length(col("text")) - length(regexp_replace(col("text"), b, ""))) / 2
    }.reduce(_ + _)
    docs.select(
        col("doc_id"), col("lang").as("labeled_lang"),
        size(toks).cast("long").as("n_tokens"),
        hits.cast("long").as("en_hits"),
        round(hits.cast("double") / size(toks), 4).as("en_score"),
        round(bigramHits.cast("double") / length(col("text")), 4).as("en_ngram_score"))
      .withColumn("pred_lang",
        when(col("en_score") > 0.01 || col("en_ngram_score") > 0.02, lit("en"))
          .otherwise(lit("und")))
      .orderBy("doc_id")
  }

  /** c9: quality scoring from length / repetition / stopword-rate
    * signals, composed into a bounded [0,1] score. */
  def c9Quality(docs: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    docs.select(
        col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4).as("distinct_ratio"),
        round(size(filter(toks, t => array_contains(markerArray, t))).cast("double") / size(toks), 4)
          .as("stopword_ratio"),
        round(size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).cast("double")
          / col("n_chars"), 4).as("punct_ratio"),
        round(col("n_chars").cast("double") / size(toks), 4).as("chars_per_token"))
      // round to 5, not 4: the addends are multiples of 1e-5 (weights ×
      // 1e-4-rounded ratios), so a 4-decimal round would sit exactly on
      // half-way points where engines' tie-breaking differs.
      .withColumn("quality",
        round(lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0))
          + lit(0.4) * col("distinct_ratio")
          + lit(0.3) * least(col("stopword_ratio") * 5.0, lit(1.0)), 5))
      .orderBy("doc_id")
  }

  /** c10: token counting — whitespace tokens plus a BPE-ish regex
    * lexer count (letters runs / digit runs / single punctuation). */
  def c10TokenCount(docs: DataFrame): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    docs.select(
        col("doc_id"),
        size(toks).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("len_chars"))
      .orderBy("doc_id")
  }

  /** c11: document fingerprinting by winnowing: 32-bit shingle hashes
    * in document order, sliding-window (w=4) minima, the distinct
    * sorted minima form the fingerprint set; its md5 is the doc
    * fingerprint. Robust to small edits — the standard near-dup
    * sketch for plagiarism-style matching. (Classic winnowing uses a
    * Rabin-Karp rolling hash purely to make per-gram hashing O(1);
    * md5-per-gram gives identical selectivity with an engine-portable
    * hash, which is what the oracle compare needs.) */
  def c11Fingerprint(docs: DataFrame): DataFrame = {
    val hashes = transform(TextFns.shingles3(col("text")), s => TextFns.h8(s))
    val mins = when(size(col("hs")) >= 4,
        transform(sequence(lit(1), size(col("hs")) - 3),
          i => array_min(slice(col("hs"), i, lit(4)))))
      .otherwise(array(array_min(col("hs"))))
    docs.select(col("doc_id"), hashes.as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"), mins.as("mins"))
      .select(col("doc_id"), col("n_shingles"),
        array_sort(array_distinct(col("mins"))).as("fp"))
      .select(col("doc_id"), col("n_shingles"),
        size(col("fp")).cast("long").as("fp_size"),
        md5(concat_ws(",", col("fp"))).as("fp_hash"))
      .orderBy("doc_id")
  }
}

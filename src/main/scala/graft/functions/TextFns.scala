package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline tier (SURVEY §2 tier C).
  *
  * Everything is built from codegen'd built-ins and is expressible in
  * ANSI-ish SQL so the DuckDB oracle can replicate it exactly. Hashes
  * are md5-derived (identical across engines); 8 hex chars = 32 bits
  * is plenty for shingle keys (birthday risk documented per use).
  */
object TextFns {

  /** Whitespace tokens (documents are space-separated lowercase). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles, document order, possibly repeated. */
  def shingles3(text: Column): Column = {
    val w = tokens(text)
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** 8-hex-char md5 prefix — the canonical 32-bit shingle key. */
  def h8(c: Column): Column = substring(md5(c), 1, 8)

  /** Seeded hash family for MinHash: h_i(s) = md5(i ++ "|" ++ s)
    * prefix. Minimum over lexicographic hex == minimum over the
    * 32-bit integer value, so engines only need string min. */
  def seededH8(seed: Column, s: Column): Column =
    substring(md5(concat_ws("|", seed.cast("string"), s)), 1, 8)

  /** First 15 md5 hex chars as a 60-bit non-negative long (SimHash
    * token hash). 15 hex digits < 2^60 so no sign issues in either
    * engine. */
  def h60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** English marker words for the langid / quality heuristics. Kept
    * tiny and hard-coded so the oracle SQL can inline the same list. */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "to", "and", "is", "in", "it")
}

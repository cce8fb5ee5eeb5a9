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

  /** 8-hex-char md5 prefix — the canonical 32-bit shingle key.
    * (The MinHash hash family and the 60-bit SimHash token hash are
    * md5-derived the same way but live in their operators' typed
    * kernels — see operators/Dedup.scala — with the SQL spelling in
    * OraclesC.) */
  def h8(c: Column): Column = substring(md5(c), 1, 8)

  /** English marker words for the langid / quality heuristics. Kept
    * tiny and hard-coded so the oracle SQL can inline the same list. */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "to", "and", "is", "in", "it")
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns, computed in doubles
  * with strict left-to-right folds so DuckDB's list functions produce
  * bit-identical results (SURVEY §6).
  *
  * These are codegen-friendly higher-order built-ins; a custom
  * Catalyst Expression with doGenCode is the round-2 optimization if
  * the fold shows up in profiles (it stays inside WholeStageCodegen
  * already, so the win is bounded).
  */
object VectorFns {

  def toDoubles(a: Column): Column = a.cast("array<double>")

  /** Σ a_i * b_i, left-to-right, in doubles — a native codegen'd
    * Catalyst expression (org.apache.spark.sql.graft.DotProduct). The
    * equivalent `aggregate(zip_with(...))` spelling evaluates
    * interpreted and is ~10× slower in the pair loop. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotNative(toDoubles(a), toDoubles(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a,b) = dot/(|a|*|b|) — formula spelled exactly like the
    * oracle SQL so doubles match bit-for-bit. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-pattern LSH bucket over `nBits` dimensions starting at
    * `offset`: bit d set iff a[offset+d+1] >= 0. The fixed coordinate
    * hyperplanes play the role of random projections — deterministic
    * for the oracle; swapping in seeded random hyperplanes is config,
    * not structure. Distinct offsets give INDEPENDENT hash tables
    * (multi-table LSH recall). */
  def signBucket(a: Column, nBits: Int, offset: Int = 0): Column =
    (0 until nBits).map { d =>
      when(element_at(a, offset + d + 1) >= 0, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)
}

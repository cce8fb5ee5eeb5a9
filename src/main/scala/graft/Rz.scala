package graft

/** Sign-of-zero-safe rounding for oracle SQL.
  *
  * DuckDB's `round()` is float arithmetic and keeps IEEE `-0.0` when a
  * tiny negative value (|x| < half-ulp at the rounding scale) rounds
  * to zero; Spark's `round()` goes through BigDecimal, which has no
  * negative zero, and always emits `+0.0`. The driver hashes exact
  * values, so the two zeros mismatch even though `-0.0 == 0.0`
  * numerically (the r12 `c145_jl_audit` red row: two cells at sf0.01).
  *
  * `round(x, d) + 0` is the identity on every other double — NULL and
  * NaN propagate, finite non-zeros are unchanged — and IEEE addition
  * gives `-0.0 + (+0.0) = +0.0`, so wrapping is always safe. Use this
  * for every rounded oracle column whose inner expression can be
  * negative-and-tiny: cosines, slopes, correlations, gaps, signed
  * diffs, divergences, log-probs. Columns that are non-negative by
  * construction (counts, ratios of counts, abs(), sums of squares,
  * sums of non-negative terms) cannot produce `-0.0` and need no wrap.
  */
object Rz {
  def apply(expr: String, d: Int): String = s"(round($expr, $d) + 0)"
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical aggregates (SURVEY §2 tier B, b11/b20): exact
  * interpolated percentiles, stddev, min/max, and the bivariate
  * moment family per group — the profiling surface a data pipeline
  * needs for QA dashboards. Spark's `percentile` and DuckDB's
  * `quantile_cont` share the linear-interpolation definition, so
  * results oracle-match exactly. Exact percentiles sort within
  * groups; at 100 TB swap in `approx_percentile` (KLL-style mergeable
  * sketch, same call shape) when exactness isn't required. */
object Stats {

  def b11Quantiles(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(stddev_samp(col("value")), 4).as("sd"),
        round(min(col("value")), 4).as("vmin"),
        round(max(col("value")), 4).as("vmax"))
      .orderBy("event_type")

  /** b20: bivariate statistics per group — correlation, sample/
    * population covariance and the least-squares fit of value against
    * time. One map-side-combined shuffle; every moment accumulates in
    * a single pass. Time is scaled to unit magnitude before the
    * moments so the running sums stay far from double-precision
    * cancellation (1e17-magnitude epoch-micros would not). */
  def b20Bivariate(events: DataFrame): DataFrame = {
    val t = (unix_micros(col("ts")).cast("double") / 1e12).as("t")
    events
      .select(col("event_type"), col("value"), t)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("t"), col("value")), 4).as("corr_tv"),
        round(covar_samp(col("t"), col("value")), 4).as("covar_s"),
        round(covar_pop(col("t"), col("value")), 4).as("covar_p"),
        round(regr_slope(col("value"), col("t")), 4).as("slope"),
        round(regr_intercept(col("value"), col("t")), 4).as("intercept"))
      .orderBy("event_type")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical aggregates (SURVEY §2 tier B, b11): exact interpolated
  * percentiles, stddev, min/max per group — the profiling surface a
  * data pipeline needs for QA dashboards. Spark's `percentile` and
  * DuckDB's `quantile_cont` share the linear-interpolation
  * definition, so results oracle-match exactly. Exact percentiles
  * sort within groups; at 100 TB swap in `approx_percentile` (KLL-
  * style mergeable sketch, same call shape) when exactness isn't
  * required. */
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
}

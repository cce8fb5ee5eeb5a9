package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling aggregation (SURVEY §2 tier B, b10).
  *
  * A hot grouping key turns a one-shuffle aggregate into a straggler:
  * one reducer gets the giant group. The classic fix is two-phase
  * salted aggregation — shuffle once on (key, salt) so the hot key
  * spreads over `nSalts` reducers, then collapse the salt with a
  * second (tiny) shuffle on key alone. Results are identical to the
  * direct groupBy, which is exactly what the DuckDB oracle checks.
  * (Spark's AQE skew-join handles the JOIN flavor of this at runtime;
  * the aggregation flavor still wants an explicit salt.)
  */
object Skew {

  /** b10: per-user event count + value sum via salted two-phase
    * aggregation. The salt is derived deterministically from a
    * uniformly-distributed existing column. */
  def b10SaltedAgg(events: DataFrame, nSalts: Int = 16): DataFrame =
    events
      .withColumn("_salt", pmod(col("event_id"), lit(nSalts)))
      .groupBy(col("user_id"), col("_salt"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"), round(sum(col("v")), 4).as("sum_value"))
      .orderBy("user_id")
}

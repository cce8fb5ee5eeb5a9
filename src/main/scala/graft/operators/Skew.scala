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

  /** Salted JOIN for a hot fact key: the fact side gets a
    * deterministic salt in [0, nSalts); the (small-ish but not
    * broadcastable) build side is replicated once per salt value, and
    * the join key becomes (key, salt) — the hot key's rows spread
    * over nSalts reducers. Row-identical to the plain join
    * (spec-proven). `saltSource` must be uniformly distributed and
    * non-null (e.g. a row id). */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      saltSource: org.apache.spark.sql.Column, nSalts: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(saltSource, lit(nSalts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

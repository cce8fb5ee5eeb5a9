package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the dbt schema-test analog (the reference
  * declares `unique` / `not_null` tests on every mart key:
  * dbt_spotify/models/marts/_spotify__models.yml). Each check is a
  * LAZY one-row aggregate; `a9DqChecks` unions the suite into a
  * single plan, so all checks run concurrently inside one job — no
  * driver-side counts, no sequential per-check jobs. At scale each
  * branch is a partial-agg tree riding the same shuffle budget as
  * any report. */
object Checks {

  /** One-row frame: count of grouping-key values appearing more than
    * once. */
  def uniqueViolations(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** One-row frame: count of rows with a NULL in the column. */
  def notNullViolations(df: DataFrame, name: String, c: String): DataFrame =
    df.filter(col(c).isNull)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** The test-suite body over ALREADY-MATERIALIZED marts — the dbt
    * shape exactly: tests run against built tables, never against a
    * re-derivation of staging. Callers with marts saved via Sinks
    * point this at the saved frames.
    *
    * Each mart's unique AND not_null checks derive from ONE keyed
    * histogram (groupBy key → both violation counts → stack to check
    * rows): a mart is scanned and shuffled exactly once no matter how
    * many checks it carries, vs the one-branch-per-check spelling's
    * 7 scans + 10 shuffles (the r5 a9 creep). Identical semantics —
    * the null key forms a group, so n>1 on it is a unique violation
    * and its mass is the not_null count, exactly as the per-check
    * aggregates reported. */
  def dqChecksOverMarts(dimUser: DataFrame, dimTrack: DataFrame,
      dimType: DataFrame, fct: DataFrame): DataFrame = {
    def keyed(df: DataFrame, mart: String, key: String, withNotNull: Boolean): DataFrame = {
      val agg = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .agg(
          count(when(col("n") > 1, lit(1))).as("uniq_v"),
          coalesce(sum(when(col(key).isNull, col("n"))), lit(0L)).as("null_v"))
      val pairs =
        if (withNotNull)
          s"2, '$mart.$key.unique', uniq_v, '$mart.$key.not_null', null_v"
        else s"1, '$mart.$key.unique', uniq_v"
      agg.selectExpr(s"stack($pairs) as (check_name, n_violations)")
    }
    Seq(
      keyed(dimUser, "dim_user", "user_sk", withNotNull = true),
      keyed(dimTrack, "dim_track", "track_id", withNotNull = true),
      keyed(dimType, "dim_event_type", "type_id", withNotNull = false),
      keyed(fct, "fct_events", "play_id", withNotNull = true))
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("check_name")
  }

  /** Freshness thresholds (micros) — dbt's source-freshness
    * warn_after/error_after; the oracle interpolates them. */
  val FreshWarnUs: Long = 6L * 3600 * 1000000
  val FreshErrorUs: Long = 24L * 3600 * 1000000

  /** a13: source-freshness check — dbt's `dbt source freshness`
    * (warn_after / error_after on a loaded-at column; the reference's
    * stack checks its `src_recent_tracks` source the same way). Each
    * event type's newest event is compared against the table's
    * global high-water mark: a feed that stopped arriving goes
    * `warn`, then `error`. The anchor is data-derived (max ts), not
    * wall-clock, so the check is replayable and engine-portable —
    * production swaps the anchor for now() at the call site.
    *
    * One aggregate pass + a 1-row broadcast — a report-sized plan. */
  def a13Freshness(events: DataFrame, warnUs: Long = FreshWarnUs,
      errorUs: Long = FreshErrorUs): DataFrame =
    // the global high-water anchor is the max over the per-type
    // maxes, re-aggregated off the SAME per-type frame and broadcast
    // back as a 1-row cross join — one corpus scan (the anchor
    // branch's subtree is exchange-identical to the report's, so
    // ReuseExchange serves both from one shuffle), and no
    // unpartitioned WindowExec, whose "No Partition Defined" WARN is
    // indistinguishable from a real scale bug in a driver log. (An
    // unpartitioned-window spelling is plan-equivalent here — the
    // frame is ≤|event types| rows — but can't be spelled WARN-free:
    // the optimizer folds literal partition keys away.)
    {
      val perType = events.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          max(unix_micros(col("ts"))).as("max_loaded_us"))
      perType.crossJoin(
        broadcast(perType.agg(max(col("max_loaded_us")).as("as_of_us"))))
    }
      .withColumn("lag_us", col("as_of_us") - col("max_loaded_us"))
      .withColumn("freshness",
        when(col("lag_us") > errorUs, "error")
          .when(col("lag_us") > warnUs, "warn")
          .otherwise("pass"))
      .orderBy("event_type")

  /** a9: the mart test-suite (unique + not_null on every dim/fact key,
    * mirroring the reference's yml tests), as a result table.
    *
    * Staging is materialized ONCE (localCheckpoint) and each mart is
    * materialized from it before the checks run — the in-session
    * analog of dbt building tables and then testing them. The r3
    * spelling inlined the staging subtree under each of 7 check
    * branches: 7 source scans per run. Now the source is scanned
    * exactly once, the FOUR mart materializations run as concurrent
    * actions ([[Materialize.frames]] — they were 4 sequential eager-
    * checkpoint jobs, which was most of a9's wall time), and the
    * check job reads executor-local mart blocks. */
  def a9DqChecks(stg: DataFrame): DataFrame = {
    // staging arrives memoized+materialized from SparkEntry.stg — a
    // bare LogicalRDD leaf needs no second checkpoint (skipping it
    // saves one job per call); a raw staging plan (specs) still
    // materializes so the one-scan contract holds.
    val alreadyMaterialized = stg.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    val s = if (alreadyMaterialized) stg else Materialize.frame(stg)
    // the BODIES (no report orderBy): the checks aggregate, so each
    // mart's global sort would buy nothing and cost a range-sampling
    // job + a sort stage per mart
    val Seq(dimUser, dimTrack, dimType, fct) = Materialize.frames(Seq(
      Marts.dimUserBody(s), Marts.dimTrackBody(s),
      Marts.dimEventTypeBody(s), Marts.fctProjection(s)))
    dqChecksOverMarts(dimUser, dimTrack, dimType, fct)
  }
}

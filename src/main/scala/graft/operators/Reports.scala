package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Keys, TimeFns}

/** Report layer: Spark-first forms of the reference's
  * rpt_artist_counts, rpt_track_counts, rpt_discovery_rate models
  * (dbt_spotify/models/marts/reports/&#42;.sql).
  *
  * The reference anchors its 30-day windows on wall-clock
  * `current_date`; we anchor on max(ts_mtn) of the data so results are
  * deterministic for the oracle. The anchor is a 1-row aggregate
  * broadcast-cross-joined into the fact — no driver-side collect, and
  * at 100 TB the anchor agg is a cheap partial-agg tree.
  */
object Reports {

  private def withAnchor(stg: DataFrame): DataFrame = {
    val anchor = stg.agg(max(col("ts_mtn")).as("anchor_mtn"))
    stg.crossJoin(broadcast(anchor))
  }

  /** Last-30-days filter, reference reports' `date_diff('day',
    * played_at, current_date) <= 30`. */
  private def last30(df: DataFrame): DataFrame =
    df.filter(datediff(to_date(col("anchor_mtn")), to_date(col("ts_mtn"))) <= 30)

  /** rpt_artist_counts analog (rpt_artist_counts.sql): recent plays ⋈
    * track dim, grouped by artist(=user): play count + minutes
    * listened. The dim is TRACK-grain — it grows with the corpus, so
    * no broadcast hint: a forced broadcast OOMs instead of degrading
    * at 100×. AQE picks broadcast vs shuffle from measured size;
    * hints stay reserved for fixed-cardinality dims (event types,
    * nation/region). */
  def a5RptUserCounts(stg: DataFrame): DataFrame = {
    val dim = Marts.dimTrack(stg)
      .select(col("track_id"), col("user_id").as("dim_user_id"), col("max_value"))
    last30(withAnchor(stg))
      .join(dim, Seq("track_id"), "inner")
      .groupBy(col("dim_user_id").as("user_id"))
      .agg(
        count(lit(1)).as("plays"),
        round(sum(col("max_value") / 60.0), 4).as("minutes_played"))
      .orderBy(col("plays").desc, col("user_id"))
  }

  /** rpt_track_counts analog (rpt_track_counts.sql): per-track recent
    * counts + display attributes in ONE pass. track_id is a function
    * of (user_id, event_type), so both display attributes are
    * CONSTANT within a track group and ride the counts aggregation as
    * min() — no second dim join, no second aggregation of the
    * corpus-grain track dim (the r3 plan aggregated it twice). The
    * only dim join left fetches all-time max_value (not derivable
    * from the 30-day slice); it's corpus-grain → no broadcast hint
    * (AQE decides, so the join degrades to shuffle instead of OOMing
    * at 100×). The event-type dim is fixed-cardinality → hinted. */
  def a6RptTypeCounts(stg: DataFrame): DataFrame = {
    val trackMax = Marts.dimTrack(stg).select(col("track_id"), col("max_value"))
    val dtype = Marts.dimEventType(stg)
    val counts = last30(withAnchor(stg))
      .join(trackMax, Seq("track_id"), "inner")
      .groupBy(col("track_id"))
      .agg(
        count(lit(1)).as("plays"),
        round(sum(col("max_value") / 60.0), 4).as("minutes_played"),
        min(col("user_id")).as("user_id"),
        min(col("event_type")).as("event_type"))
    counts
      .join(broadcast(dtype.withColumnRenamed("event_type", "type_name")),
        Keys.surrogateKey(col("event_type")) === col("type_id"), "left")
      .select(col("type_name"), col("user_id"), col("plays"), col("minutes_played"))
      .orderBy(col("plays").desc, col("user_id"), col("type_name"))
  }

  /** rpt_discovery_rate analog (rpt_discovery_rate.sql): weekly play /
    * distinct-entity counts, first-week "new" counts from the dims,
    * and safe-divide discovery rates. Three partial aggregates joined
    * on (year, week) — each agg is map-side combinable; the joins are
    * on tiny weekly grain, broadcast. */
  def a7RptDiscovery(stg: DataFrame): DataFrame = {
    val base = stg.groupBy(
        TimeFns.calYear(col("ts_mtn")).as("year_played"),
        TimeFns.isoWeek(col("ts_mtn")).as("week_played"))
      .agg(
        max(to_date(col("ts_mtn"))).as("week_dt"),
        count(lit(1)).as("plays"),
        countDistinct(col("user_sk")).as("uniq_users"),
        countDistinct(col("track_id")).as("uniq_tracks"))

    val newTracks = stg.groupBy(col("track_id"))
      .agg(min(col("ts_mtn")).as("first_mtn"))
      .groupBy(
        TimeFns.calYear(col("first_mtn")).as("year_played"),
        TimeFns.isoWeek(col("first_mtn")).as("week_played"))
      .agg(count(lit(1)).as("new_tracks"))

    val newUsers = stg.groupBy(col("user_sk"))
      .agg(min(col("ts_mtn")).as("first_mtn"))
      .groupBy(
        TimeFns.calYear(col("first_mtn")).as("year_played"),
        TimeFns.isoWeek(col("first_mtn")).as("week_played"))
      .agg(count(lit(1)).as("new_users"))

    base
      .join(broadcast(newTracks), Seq("year_played", "week_played"), "left")
      .join(broadcast(newUsers), Seq("year_played", "week_played"), "left")
      .select(
        col("year_played"), col("week_played"), col("week_dt"), col("plays"),
        col("uniq_users"), col("uniq_tracks"), col("new_tracks"), col("new_users"),
        round(Keys.safeDivide(col("new_tracks"), col("uniq_tracks")), 4).as("track_discovery_rate"),
        round(Keys.safeDivide(col("new_users"), col("uniq_users")), 4).as("user_discovery_rate"))
      .orderBy("year_played", "week_played")
  }
}

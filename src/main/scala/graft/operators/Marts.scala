package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** Dimensional marts: Spark-first forms of the reference's dim_track,
  * dim_artist, dim_album, fct_played_track models
  * (dbt_spotify/models/marts/&#42;.sql).
  *
  * The reference builds each dim as groupBy summary + self left-join +
  * SELECT DISTINCT. Because every dim attribute is functionally
  * determined by the grouping key, we fold that into ONE groupBy —
  * one shuffle instead of two plus a distinct. Same rows, fewer
  * stages; this is the plan you want at 100 TB.
  */
object Marts {

  /** dim_artist analog (dim_artist.sql): per-user totals + first-played
    * calendar fields. Single hash aggregate. */
  def dimUser(stg: DataFrame): DataFrame =
    stg.groupBy(col("user_sk"), col("user_id"))
      .agg(
        count(lit(1)).as("total_plays"),
        min(col("ts_mtn")).as("first_mtn"))
      .select(
        col("user_sk"), col("user_id"), col("total_plays"),
        unix_micros(col("first_mtn")).as("first_played_us"),
        TimeFns.calYear(col("first_mtn")).as("yr_first_played"),
        TimeFns.isoWeek(col("first_mtn")).as("wk_first_played"))
      .orderBy("user_sk")

  /** dim_track analog: per user×type combo (the "track" grain). */
  def dimTrack(stg: DataFrame): DataFrame =
    stg.groupBy(col("track_id"), col("user_id"), col("event_type"))
      .agg(
        count(lit(1)).as("total_plays"),
        min(col("ts_mtn")).as("first_mtn"),
        // reference dim_track.sql:14-20: several observed durations →
        // keep the max.
        max(col("value")).as("max_value"))
      .select(
        col("track_id"), col("user_id"), col("event_type"), col("total_plays"),
        unix_micros(col("first_mtn")).as("first_played_us"),
        TimeFns.calYear(col("first_mtn")).as("yr_first_played"),
        TimeFns.isoWeek(col("first_mtn")).as("wk_first_played"),
        col("max_value"))
      .orderBy("track_id")

  /** dim_album analog (dim_album.sql): pure DISTINCT projection. */
  def dimEventType(stg: DataFrame): DataFrame =
    stg.select(col("type_id"), col("event_type")).distinct().orderBy("type_id")

  /** fct_played_track analog (fct_played_track.sql): keyed fact
    * projection, ordered by local-time recency. The global orderBy is
    * report-friendly at test SF; a 100 TB sink would sortWithinPartitions
    * instead (noted in SURVEY §5). */
  def fctEvents(stg: DataFrame): DataFrame =
    stg.select(
      col("play_id"), col("track_id"), col("type_id"), col("user_sk"),
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      unix_micros(col("ts_mtn")).as("ts_mtn_us"),
      col("value"), col("prop_k"))
      .orderBy(col("ts_mtn_us").desc, col("event_id"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the dbt schema-test analog (the reference
  * declares `unique` / `not_null` tests on every mart key:
  * dbt_spotify/models/marts/_spotify__models.yml). Each check returns
  * a one-row summary; `a9DqChecks` runs the reference's test suite
  * over the mart layer and emits one row per check. Each check is a
  * single aggregate — at scale these ride the same shuffle budget as
  * any report. */
object Checks {

  /** Count of grouping-key values that appear more than once. */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): Long =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()

  /** Count of rows with a NULL in the column. */
  def notNullViolations(df: DataFrame, c: String): Long =
    df.filter(col(c).isNull).count()

  private def check(name: String, violations: Long) = (name, violations, violations == 0L)

  /** a9: the mart test-suite (unique + not_null on every dim/fact key,
    * mirroring the reference's yml tests), as a result table. */
  def a9DqChecks(stg: DataFrame): DataFrame = {
    val dimUser = Marts.dimUser(stg)
    val dimTrack = Marts.dimTrack(stg)
    val dimType = Marts.dimEventType(stg)
    val fct = Marts.fctEvents(stg)
    val rows = Seq(
      check("dim_user.user_sk.unique", uniqueViolations(dimUser, Seq("user_sk"))),
      check("dim_user.user_sk.not_null", notNullViolations(dimUser, "user_sk")),
      check("dim_track.track_id.unique", uniqueViolations(dimTrack, Seq("track_id"))),
      check("dim_track.track_id.not_null", notNullViolations(dimTrack, "track_id")),
      check("dim_event_type.type_id.unique", uniqueViolations(dimType, Seq("type_id"))),
      check("fct_events.play_id.unique", uniqueViolations(fct, Seq("play_id"))),
      check("fct_events.play_id.not_null", notNullViolations(fct, "play_id")))
    val spark0 = stg.sparkSession
    import spark0.implicits._
    rows.toDF("check_name", "n_violations", "passed").orderBy("check_name")
  }
}

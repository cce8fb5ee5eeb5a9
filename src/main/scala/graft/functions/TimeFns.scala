package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time helpers mirroring the reference staging model.
  *
  * The reference converts UTC play timestamps to America/Boise wall
  * clock (stg_recent_tracks.sql:30-34: `timezone('America/Boise',
  * played_at::timestamptz)`) and parses release dates whose precision
  * is 'day' or 'year' (ibid:21-27). Weekly reports use DuckDB
  * year()/week() — week() is ISO week, which Spark's `weekofyear`
  * matches exactly.
  */
object TimeFns {
  val ReferenceZone = "America/Boise"

  /** UTC instant → wall clock in `tz` (reference's played_at_mtn). */
  def toZone(ts: Column, tz: String = ReferenceZone): Column = from_utc_timestamp(ts, tz)

  /** ISO week number (DuckDB `week()` parity). */
  def isoWeek(c: Column): Column = weekofyear(c).cast("long")

  /** Calendar year (DuckDB `year()` parity). */
  def calYear(c: Column): Column = year(c).cast("long")

  /** Parse a date string whose granularity is tagged by a precision
    * column: 'day' → as-is, 'year' → Jan 1 of that year. Mirrors
    * stg_recent_tracks.sql:21-27. */
  def parseDateWithPrecision(dateStr: Column, precision: Column): Column =
    when(precision === "day", to_date(dateStr))
      .when(precision === "year", to_date(concat(dateStr, lit("-01-01"))))
}

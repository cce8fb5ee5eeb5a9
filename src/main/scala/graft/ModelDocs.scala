package graft

/** Model catalog — the reference's dbt documentation layer
  * (dbt_spotify/models/marts/_spotify__models.yml column docs + tests,
  * _spotify__exposures.yml downstream consumers, overview.md) as a
  * MACHINE-READABLE library surface rather than prose: per-mart grain
  * and description, per-column documentation, declared tests, and
  * exposures naming what consumes the marts. DocsSpec pins the
  * catalog to reality — every DAG mart is documented, documented
  * columns equal the materialized schemas, and the declared tests are
  * exactly the a9 DQ suite — so the docs cannot rot the way a
  * hand-maintained yml can.
  */
/** `runMain graft.GenDocs [path]` — regenerate docs/MODELS.md from
  * the catalog (the `dbt docs generate` analog). */
object GenDocs {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "docs/MODELS.md"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      ModelDocs.markdown.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[gendocs] wrote $out")
  }
}

final case class ColumnDoc(name: String, description: String,
    tests: Seq[String] = Nil)

final case class ModelDoc(name: String, grain: String, description: String,
    columns: Seq[ColumnDoc]) {
  /** The dbt-style qualified test ids this model declares,
    * `<model>.<column>.<test>` — the spelling a9's check_name uses. */
  def testIds: Seq[String] =
    columns.flatMap(c => c.tests.map(t => s"$name.${c.name}.$t"))
}

/** A downstream consumer of the marts (dbt exposure): what breaks if
  * the named dependencies do. */
final case class Exposure(name: String, kind: String, description: String,
    dependsOn: Seq[String])

object ModelDocs {

  private val usDoc = "Epoch-microseconds (bigint) — the engine-portable timestamp spelling (SURVEY §6)."

  val models: Seq[ModelDoc] = Seq(
    ModelDoc("stg_events", "one row per ingested event",
      "Staging: surrogate keys (md5), UTC→America/Boise local time, JSON prop extraction, typed casts. Everything downstream builds from this frame.",
      Seq(
        ColumnDoc("play_id", "Surrogate key of the (user, type, timestamp) event instance."),
        ColumnDoc("track_id", "Surrogate key of the (user, type) combination — the 'track' grain."),
        ColumnDoc("type_id", "Surrogate key of the event type."),
        ColumnDoc("user_sk", "Surrogate key of the user."),
        ColumnDoc("event_id", "Source event id as ingested."),
        ColumnDoc("user_id", "Source user id."),
        ColumnDoc("event_type", "Event type name."),
        ColumnDoc("ts", "Event time, UTC."),
        ColumnDoc("ts_mtn", "Event time in America/Boise local time."),
        ColumnDoc("value", "Event magnitude (duration-like payload)."),
        ColumnDoc("prop_k", "The k property extracted from the JSON props payload."))),
    ModelDoc("dim_user", "one row per user",
      "User directory with play totals and first-seen calendar fields.",
      Seq(
        ColumnDoc("user_sk", "Unique user surrogate key.", Seq("unique", "not_null")),
        ColumnDoc("user_id", "Source user id."),
        ColumnDoc("total_plays", "Total events observed for this user."),
        ColumnDoc("first_played_us", usDoc),
        ColumnDoc("yr_first_played", "Calendar year of the user's first event (local time)."),
        ColumnDoc("wk_first_played", "ISO week of the user's first event (local time)."))),
    ModelDoc("dim_track", "one row per (user, event type) combination",
      "The 'track' grain: per-combination totals, first-seen fields, max observed value. Built inside the DQ suite and the reports; not a standalone DAG node.",
      Seq(
        ColumnDoc("track_id", "Unique combination surrogate key.", Seq("unique", "not_null")),
        ColumnDoc("user_id", "Source user id."),
        ColumnDoc("event_type", "Event type name."),
        ColumnDoc("total_plays", "Events observed at this grain."),
        ColumnDoc("first_played_us", usDoc),
        ColumnDoc("yr_first_played", "Calendar year of first observation."),
        ColumnDoc("wk_first_played", "ISO week of first observation."),
        ColumnDoc("max_value", "Largest observed event value at this grain."))),
    ModelDoc("dim_event_type", "one row per event type",
      "Distinct event-type directory.",
      Seq(
        ColumnDoc("type_id", "Unique event-type surrogate key.", Seq("unique")),
        ColumnDoc("event_type", "Event type name."))),
    ModelDoc("fct_events", "one row per event",
      "Keyed fact projection of staging, ordered by local-time recency.",
      Seq(
        ColumnDoc("play_id", "Unique event surrogate key.", Seq("unique", "not_null")),
        ColumnDoc("track_id", "FK to dim_track."),
        ColumnDoc("type_id", "FK to dim_event_type."),
        ColumnDoc("user_sk", "FK to dim_user."),
        ColumnDoc("event_id", "Source event id."),
        ColumnDoc("ts_us", usDoc),
        ColumnDoc("ts_mtn_us", usDoc),
        ColumnDoc("value", "Event magnitude."),
        ColumnDoc("prop_k", "Extracted JSON property."))),
    ModelDoc("rpt_user_counts", "one row per user active in the last 30 days",
      "Last-30-day plays and minutes per user (reference rpt_artist_counts).",
      Seq(
        ColumnDoc("user_id", "Source user id."),
        ColumnDoc("plays", "Plays in the trailing 30 days."),
        ColumnDoc("minutes_played", "Minutes derived from max observed values."))),
    ModelDoc("rpt_type_counts", "one row per (track grain, type) in the last 30 days",
      "Last-30-day play counts at the track grain with type display attributes (reference rpt_track_counts).",
      Seq(
        ColumnDoc("type_name", "Event type display name."),
        ColumnDoc("user_id", "Source user id."),
        ColumnDoc("plays", "Plays in the trailing 30 days."),
        ColumnDoc("minutes_played", "Minutes derived from max observed values."))),
    ModelDoc("rpt_discovery", "one row per ISO week",
      "Weekly distinct users/tracks, new-track discoveries, and discovery rate (reference rpt_discovery_rate).",
      Seq(
        ColumnDoc("year_played", "Calendar year of the week."),
        ColumnDoc("week_played", "ISO week number."),
        ColumnDoc("week_dt", "Last local date observed in the week."),
        ColumnDoc("plays", "Total plays in the week."),
        ColumnDoc("uniq_users", "Distinct users active in the week."),
        ColumnDoc("uniq_tracks", "Distinct track-grain combinations in the week."),
        ColumnDoc("new_tracks", "Track-grain combinations first seen this week."),
        ColumnDoc("new_users", "Users first seen this week."),
        ColumnDoc("track_discovery_rate", "new_tracks / uniq_tracks, null-safe."),
        ColumnDoc("user_discovery_rate", "new_users / uniq_users, null-safe."))),
    ModelDoc("dq_checks", "one row per declared test",
      "The materialized result of the DQ suite: every declared test with its violation count and pass flag.",
      Seq(
        ColumnDoc("check_name", "Qualified test id, <model>.<column>.<test>."),
        ColumnDoc("n_violations", "Rows violating the test."),
        ColumnDoc("passed", "True iff n_violations = 0."))))

  val exposures: Seq[Exposure] = Seq(
    Exposure("events_dashboard", "dashboard",
      "Listening-activity dashboard fed by the report marts (the reference's ndrewwm.com exposure re-pointed at graft's reports).",
      Seq("rpt_user_counts", "rpt_type_counts", "rpt_discovery")),
    Exposure("external_keyed_store", "application",
      "The external keyed store loaded by Sinks.writeExternal (the reference's turso load) — serves the fact and dims to the app tier.",
      Seq("fct_events", "dim_user", "dim_event_type")))

  /** Every declared test across the catalog — spec-pinned to equal
    * the a9 DQ suite's check_name set exactly. */
  def declaredTests: Set[String] = models.flatMap(_.testIds).toSet

  /** Render the catalog as markdown — the `dbt docs generate` analog,
    * suitable for checking into docs/. */
  def markdown: String = {
    val sb = new StringBuilder
    sb ++= "# graft model catalog\n\n(generated from graft.ModelDocs — do not edit by hand)\n"
    models.foreach { m =>
      sb ++= s"\n## ${m.name}\n\n${m.description}\n\n**Grain**: ${m.grain}\n\n"
      sb ++= "| column | description | tests |\n| --- | --- | --- |\n"
      m.columns.foreach { c =>
        sb ++= s"| `${c.name}` | ${c.description} | ${c.tests.mkString(", ")} |\n"
      }
    }
    sb ++= "\n## Exposures\n"
    exposures.foreach { e =>
      sb ++= s"\n- **${e.name}** (${e.kind}): ${e.description} Depends on: ${e.dependsOn.map(d => s"`$d`").mkString(", ")}.\n"
    }
    sb.result()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Checks, Marts, Reports, Staging}
import graft.sources.Tables

/** The model catalog is pinned to reality: every DAG mart documented,
  * documented columns equal materialized schemas, declared tests are
  * exactly the DQ suite. A hand-maintained yml rots; this cannot. */
class DocsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val stg = Staging.stgEvents(Tables.events(spark, sf))

  test("every spotifyDag mart is documented") {
    val documented = ModelDocs.models.map(_.name).toSet
    val dagNames = MartRunner.spotifyDag(spark, sf).map(_.name).toSet
    val missing = dagNames -- documented
    assert(missing.isEmpty, s"undocumented marts: $missing")
  }

  test("documented columns equal the materialized schemas") {
    val frames: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "stg_events" -> stg,
      "dim_user" -> Marts.dimUser(stg),
      "dim_track" -> Marts.dimTrack(stg),
      "dim_event_type" -> Marts.dimEventType(stg),
      "fct_events" -> Marts.fctEvents(stg),
      "rpt_user_counts" -> Reports.a5RptUserCounts(stg),
      "rpt_type_counts" -> Reports.a6RptTypeCounts(stg),
      "rpt_discovery" -> Reports.a7RptDiscovery(stg),
      "dq_checks" -> Checks.a9DqChecks(stg))
    for (m <- ModelDocs.models) {
      val actual = frames(m.name).columns.toSet
      val documented = m.columns.map(_.name).toSet
      assert(documented == actual,
        s"${m.name}: documented $documented != actual $actual")
    }
  }

  test("declared tests are exactly the DQ suite") {
    import spark.implicits._
    val suite = Checks.a9DqChecks(stg).select("check_name").as[String]
      .collect().toSet
    assert(ModelDocs.declaredTests == suite,
      s"catalog tests ${ModelDocs.declaredTests} != DQ suite $suite")
  }

  test("exposures depend only on documented models") {
    val documented = ModelDocs.models.map(_.name).toSet
    for (e <- ModelDocs.exposures) {
      val dangling = e.dependsOn.filterNot(documented)
      assert(dangling.isEmpty, s"exposure ${e.name} depends on unknown: $dangling")
    }
  }

  test("markdown rendering covers every model and exposure") {
    val md = ModelDocs.markdown
    for (m <- ModelDocs.models) assert(md.contains(s"## ${m.name}"))
    for (e <- ModelDocs.exposures) assert(md.contains(e.name))
  }
}

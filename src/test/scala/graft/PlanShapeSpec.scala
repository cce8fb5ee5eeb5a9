package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the physical properties PLANS.md
  * claims (pushdown, broadcast placement, no accidental cartesian
  * products) must survive future edits. String-level checks against
  * the executed plan are deliberately coarse — they catch structural
  * regressions, not cosmetic changes. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("b1 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("b1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "scan reads unneeded columns")
  }

  test("b3 broadcasts the geo dims, not the fact chain") {
    val p = plan("b3_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("nation.parquet") && p.contains("region.parquet"), p)
  }

  test("no query plans a broadcast nested loop or cartesian product") {
    for (name <- Seq("c2_dedup_ngram", "c3_dedup_minhash", "c4_dedup_simhash", "c5_embed_neardup",
      "b13_range_join")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop join")
    }
  }

  test("similarity norms use the fused self-dot expression") {
    assert(plan("c6_ann_topk").contains("graft_self_dot"))
  }

  test("staging is a single projection over the scan (no shuffle)") {
    val p = plan("a1_stg_events")
    assert(!p.contains("Exchange hashpartitioning"), s"staging shuffles:\n$p")
  }
}

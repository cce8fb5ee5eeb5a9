package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-19 contracts: the count-first posting caps (the r10
  * verdict's scale-killer fix). A key whose document frequency /
  * occurrence count is far past the cap must be dropped by the
  * map-side-combinable COUNT filter — its rows never reach a
  * collect_list buffer — while every genuinely-shared key below the
  * cap still produces its evidence. Plan-shape ordering is pinned in
  * PlanShapeSpec; these tests plant the hot key and check semantics. */
class Round19Spec extends AnyFunSuite {
  import TestSpark._

  test("c2: a planted df≫cap shingle is cut by rule; genuine pairs still surface") {
    import spark.implicits._
    val cap = graft.operators.Dedup.DfCap
    // 2·cap docs all sharing ONE hot 3-gram plus unique tails, and two
    // genuine near-dups sharing a rare shingle set
    val hotN = cap * 2
    val docs = ((0 until hotN).map(i => (i.toLong, s"hot key alpha tail$i x$i y$i")) ++
      Seq((9000L, "rare shared trigram here exactly match"),
          (9001L, "rare shared trigram here exactly match")))
      .toDF("doc_id", "text")
    val postings = graft.operators.Dedup.ngramPostingsPlan(docs).collect()
    assert(postings.nonEmpty)
    assert(postings.forall(_.getSeq[Long](1).length <= cap),
      "a posting list longer than the df cap survived the count filter")
    assert(!postings.exists(_.getSeq[Long](1).length >= hotN),
      "the planted hot key reached the posting store")
    val pairs = graft.operators.Dedup.c2NgramJaccard(docs).collect()
    assert(pairs.exists(r => r.getLong(0) == 9000L && r.getLong(1) == 9001L),
      "the genuine near-dup pair vanished")
    // hot docs share ONLY the capped key — no pair between them may exist
    assert(!pairs.exists(r => r.getLong(0) < hotN && r.getLong(1) < hotN),
      "boilerplate-only pairs leaked past the cap")
  }

  test("c33 chain: a planted occ≫cap span key is cut by rule; the real span survives") {
    import spark.implicits._
    // 40 docs share a 4-token boilerplate phrase (every w=3 shingle of
    // it has occ 40 > cap 10); two docs share a real 5-token span
    val docs = ((0 until 40).map(i => (i.toLong, s"one two three four u$i v$i w$i")) ++
      Seq((9000L, "aa bb cc dd ee p0 q0 r0"),
          (9001L, "aa bb cc dd ee p1 q1 r1")))
      .toDF("doc_id", "text")
    val spans = graft.operators.Dedup
      .spanChain(docs, w = 3, minSpan = 4, occCap = 10)
      .collect()
    assert(spans.length == 1, s"expected exactly the one real span, got ${spans.toSeq}")
    val s = spans.head
    assert(s.getLong(0) == 9000L && s.getLong(1) == 9001L)
    assert(s.getLong(2) == 0L && s.getLong(3) == 0L && s.getLong(4) == 5L,
      s"span geometry moved: $s")
  }
}

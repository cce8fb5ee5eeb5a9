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

  test("c103: sequences are contiguous curriculum runs — bins non-increasing, arithmetic closes") {
    val budget = graft.operators.Sampling.DefaultTokenBudget
    val rows = graft.operators.Sampling.c103CurriculumPack(spark, sf).collect()
    assert(rows.nonEmpty)
    // one row per scheduled doc (the schedule covers the corpus; every
    // doc has a stored-tokenizer count)
    val sched = graft.operators.Sampling.c99CurriculumSchedule(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(rows.length == sched.length, "packed universe != schedule universe")
    val schedPos = sched.map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    for ((shard, rs) <- rows.groupBy(_.getLong(2))) {
      val byPos = rs.sortBy(_.getLong(3))
      // packing follows the schedule's exact coordinates
      for (r <- byPos)
        assert(schedPos(r.getLong(0)) == ((r.getLong(2), r.getLong(3))),
          s"doc ${r.getLong(0)} packed off its schedule slot")
      // seq ids non-decreasing along the schedule; bins non-increasing
      // WITHIN each sequence (a sequence is a contiguous curriculum run)
      val seqs = byPos.map(_.getLong(4))
      assert(seqs.zip(seqs.tail).forall { case (a, b) => a <= b },
        s"shard $shard: seq_id decreases along the schedule")
      for ((_, seqRows) <- byPos.groupBy(_.getLong(4))) {
        val bins = seqRows.sortBy(_.getLong(3)).map(_.getLong(1))
        assert(bins.zip(bins.tail).forall { case (a, b) => a >= b },
          s"shard $shard: bin increases inside a sequence")
      }
      // start offsets are the running prefix sum mod the budget
      var cum = 0L
      for (r <- byPos) {
        val (seq, off, nTok) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(seq == cum / budget, s"doc ${r.getLong(0)}: seq_id != prefix-sum block")
        assert(off == cum - seq * budget, s"doc ${r.getLong(0)}: start_offset drifted")
        assert(off >= 0 && off < budget)
        cum += nTok
      }
    }
    // token counts agree with c94's (same stored-tokenizer artifact)
    val c94Tok = graft.operators.Sampling.c94PackBoundaries(spark, sf).collect()
      .map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(rows.forall(r => c94Tok(r.getLong(0)) == r.getLong(6)),
      "c103 prices a doc differently than c94")
  }

  test("c104: the sequence index tiles each shard contiguously and reconciles with c103") {
    val packed = graft.operators.Sampling.c103CurriculumPack(spark, sf).collect()
    val idx = graft.operators.Sampling.c104SeqManifest(spark, sf).collect()
    assert(idx.map(_.getLong(2)).sum == packed.length,
      "sequence-index doc mass != the packing's")
    val budget = graft.operators.Sampling.DefaultTokenBudget
    for ((shard, rs) <- idx.groupBy(_.getLong(0))) {
      val bySeq = rs.sortBy(_.getLong(1))
      assert(bySeq.map(_.getLong(1)).sameElements(0L until bySeq.length.toLong),
        s"shard $shard: sequence ids not dense 0..n")
      assert(bySeq.head.getLong(4) == 1L, s"shard $shard: first sequence skips pos 1")
      for (pair <- bySeq.sliding(2) if pair.length == 2)
        assert(pair(1).getLong(4) == pair(0).getLong(5) + 1,
          s"shard $shard: sequences leave a schedule gap")
    }
    for (r <- idx) {
      assert(r.getLong(5) - r.getLong(4) + 1 == r.getLong(2),
        "pos extent != doc count (schedule not contiguous inside a sequence)")
      assert(r.getLong(6) >= r.getLong(7), "max_bin < min_bin")
      assert(math.abs(r.getDouble(8) - r.getLong(3).toDouble / budget) < 1e-4,
        "fill_frac != sum_tok/budget")
    }
  }

  test("c105: keeps-only schedule — exactly the funnel's keeps, dense easy-first shards") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
    val keepIds = graft.operators.TextAnalysis.funnelDecisions(docs)
      .filter(col("stage") === "keep").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val rows = graft.operators.Sampling.c105KeepsSchedule(spark, sf).collect()
    assert(rows.length == keepIds.size, "schedule universe != the funnel's keeps")
    assert(rows.map(_.getLong(0)).toSet == keepIds)
    for ((shard, rs) <- rows.groupBy(_.getLong(3))) {
      val byPos = rs.sortBy(_.getLong(4))
      assert(byPos.map(_.getLong(4)).sameElements(1L to rs.length.toLong),
        s"shard $shard: positions not dense over keeps")
      val bins = byPos.map(_.getLong(2))
      assert(bins.zip(bins.tail).forall { case (a, b) => a >= b },
        s"shard $shard: quality bin increases along the keeps schedule")
    }
  }

  test("c101: the artifact-backed diff equals the from-scratch two-vintage recompute") {
    val artifact = graft.operators.Sampling.c101ManifestDiff(spark, sf).collect()
    val recomputed = graft.operators.Sampling.c101DiffRecomputed(spark, sf).collect()
    assert(artifact.length == recomputed.length)
    assert(artifact.map(_.toSeq).toSeq == recomputed.map(_.toSeq).toSeq,
      "stored-v1 diff diverged from the live recompute")
  }

  test("byte-grain BPE: ≤256 alphabet, lossless round-trip, compression priced in bytes") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // multi-script corpus: char grain would need an open-ended unicode
    // alphabet here; byte grain never leaves its 256 symbols
    val docs = Seq(
      (1L, "the thé thé cat 😀😀 naïve naïve the"),
      (2L, "ので ので the the résumé résumé thé"),
      (3L, "plain ascii text the the the naïve")).toDF("doc_id", "text")
    val merges = TextAnalysis.c75BpeTrain(docs, 8, TextAnalysis.ByteGrain)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.nonEmpty, "byte-grain trainer learned nothing")
    assert(merges.forall { case (a, b) =>
      (a + b).matches("[0-9a-f]+") && (a + b).length % 2 == 0 },
      "merged symbols must stay even-length hex (whole bytes)")
    // round-trip: segment → apply every learned merge → decode == word
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
    for (w <- words) {
      var syms = TextAnalysis.ByteGrain.symbols(w)
      merges.foreach { case (a, b) => syms = TextAnalysis.bpeApplyOne(syms, a, b) }
      assert(TextAnalysis.ByteGrain.decode(syms) == w, s"round-trip broke on '$w'")
    }
    assert(words.flatMap(TextAnalysis.ByteGrain.symbols).distinct.length <= 256)
    // compression: byte mode prices mass in UTF-8 bytes, char mode in
    // code points — byte mass ≥ char mass on non-ASCII text, and both
    // encodes compress (units ≤ their own mass)
    val byteEnc = TextAnalysis.c76BpeTrainedEncode(docs, 8, TextAnalysis.ByteGrain)
      .collect().map(r => r.getLong(0) -> r).toMap
    val charEnc = TextAnalysis.c76BpeTrainedEncode(docs, 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- byteEnc.keySet) {
      val (b, c) = (byteEnc(id), charEnc(id))
      assert(b.getLong(2) > c.getLong(2), s"doc $id: byte mass not above char mass")
      assert(b.getLong(3) <= b.getLong(2), s"doc $id: byte units exceed byte mass")
      assert(c.getLong(3) <= c.getLong(2), s"doc $id: char units exceed char mass")
    }
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

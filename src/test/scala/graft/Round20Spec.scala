package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-20 contracts: the mixture/retrieval widening — context-
  * length sweep (c106), source-pair JS divergence (c107), Gumbel
  * weighted sampling (c108), RRF hybrid retrieval (c109), and the
  * embedding-vintage PSI (c110). */
class Round20Spec extends AnyFunSuite {
  import TestSpark._

  test("c106: mass conserved across budgets, sequence counts shrink as budgets grow, 512-row ≡ c86") {
    val grid = graft.operators.Sampling.PackSweepBudgets
    val rows = graft.operators.Sampling.c106PackSweep(spark, sf).collect()
    assert(rows.length == grid.length, "one report row per candidate budget")
    val byBudget = rows.map(r => r.getLong(0) -> r).toMap
    assert(byBudget.keySet == grid.toSet)
    // packing conserves the corpus: every budget packs the same docs
    // and the same token mass
    assert(rows.map(_.getLong(2)).distinct.length == 1, "n_docs varies with budget")
    assert(rows.map(_.getLong(3)).distinct.length == 1, "sum_tok varies with budget")
    // a longer context can never need MORE sequences (seq_id is a
    // floor-division of the same prefix sums)
    val nSeqs = grid.map(b => byBudget(b).getLong(1))
    assert(nSeqs.zip(nSeqs.tail).forall { case (a, b) => a >= b },
      s"n_seqs not non-increasing across $grid: $nSeqs")
    // the grid row at the default budget must agree with c86's packing
    assert(grid.contains(graft.operators.Sampling.DefaultTokenBudget))
    val c86 = graft.operators.Sampling.c86PackTokenized(spark, sf).collect()
    val at = byBudget(graft.operators.Sampling.DefaultTokenBudget)
    assert(at.getLong(1) == c86.length, "n_seqs at the default budget != c86's sequence count")
    assert(at.getLong(3) == c86.map(_.getLong(3)).sum, "token mass at the default budget != c86's")
  }

  test("c107: JS in [0,1], full pair coverage, identical sources diverge by zero") {
    import spark.implicits._
    val rows = graft.operators.TextAnalysis.c107SourceDivergence(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val js = r.getDouble(5)
      assert(js >= -1e-4 && js <= 1.0 + 1e-4, s"JS out of range: $r")
      assert(r.getString(0) < r.getString(1), "pair not ordered source_a < source_b")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0 + 1e-4, "overlap_a out of range")
    }
    // every pair that shares at least one term is present exactly once
    val nSources = graft.sources.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(rows.length <= nSources * (nSources - 1) / 2)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    // two sources carrying the SAME text have identical unigram
    // distributions: shared mass 1 on both sides, JS exactly 0
    val twin = Seq(
      (0L, "alpha beta gamma alpha", "s1"),
      (1L, "alpha beta gamma alpha", "s2"),
      (2L, "delta epsilon", "s3"))
      .toDF("doc_id", "text", "source")
    val tw = graft.operators.TextAnalysis.c107SourceDivergence(twin).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val same = tw(("s1", "s2"))
    assert(same.getDouble(5) == 0.0, s"identical sources diverge: $same")
    assert(same.getDouble(3) == 1.0 && same.getDouble(4) == 1.0)
    // s3 shares no term with s1/s2 — absent by the inner-join contract
    assert(!tw.contains(("s1", "s3")) && !tw.contains(("s2", "s3")))
  }

  test("c108: the k-sample is exactly the prefix of the full Gumbel ranking") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val k = graft.operators.TextAnalysis.GumbelSampleK
    val sample = graft.operators.TextAnalysis.c108GumbelSample(docs).collect()
    assert(sample.length == k)
    assert(sample.map(_.getLong(0)).toSeq == (1 to k).map(_.toLong), "ranks not dense 1..k")
    val keys = sample.map(_.getDouble(4))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b }, "keys increase down the ranking")
    // without-replacement: no doc twice; top-k ≡ the prefix of the
    // full ranking (the Gumbel draw is a total order over the corpus)
    assert(sample.map(_.getLong(1)).distinct.length == k)
    val full = graft.operators.TextAnalysis
      .c108GumbelSample(docs, k = docs.count().toInt).collect()
    assert(full.take(k).map(_.getLong(1)).toSeq == sample.map(_.getLong(1)).toSeq,
      "the k-sample is not the full ranking's prefix")
  }

  test("c109: fused candidates come from the legs and the RRF arithmetic closes") {
    val k = graft.operators.Similarity.RrfTopK
    val c = graft.operators.Similarity.RrfC
    val rows = graft.operators.Similarity.c109RrfFusion(spark, sf).collect()
    assert(rows.nonEmpty)
    for ((q, rs) <- rows.groupBy(_.getLong(0))) {
      assert(rs.length <= k, s"query $q returned more than $k fused rows")
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1 to rs.length).map(_.toLong), s"query $q ranks not dense")
    }
    for (r <- rows) {
      val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val sem = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(lex.nonEmpty || sem.nonEmpty, s"candidate surfaced by neither leg: $r")
      val expect = lex.map(x => 1.0 / (c + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (c + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(5) - expect) < 1e-6, s"rrf arithmetic broken: $r")
      assert(lex.forall(_ <= k) && sem.forall(_ <= k), "leg rank deeper than the leg's top-k")
    }
    // a doc surfaced by BOTH legs at equal depth beats either single
    // leg at that depth — the both-leg bonus is the point of RRF
    val both = rows.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    val single = rows.filter(r => r.isNullAt(3) ^ r.isNullAt(4))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getDouble(5)).max > single.map(_.getDouble(5)).min)
  }

  test("c111: packs exactly the kept schedule, contiguous curriculum runs, arithmetic closes") {
    val budget = graft.operators.Sampling.DefaultTokenBudget
    val rows = graft.operators.Sampling.c111KeepsPack(spark, sf).collect()
    assert(rows.nonEmpty)
    // universe ≡ c105's schedule exactly (every kept scheduled doc has
    // a stored-tokenizer count row here and nowhere else)
    val sched = graft.operators.Sampling.c105KeepsSchedule(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == sched.map(_.getLong(0)).toSet,
      "packed universe != keeps schedule universe")
    // strict subset of the whole-corpus packing when the funnel drops
    val full = graft.operators.Sampling.c103CurriculumPack(spark, sf).collect()
    assert(rows.length < full.length, "keeps packing did not shrink vs the full corpus")
    // schedule coordinates respected; prefix-sum closes per shard
    val schedPos = sched.map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    for ((_, rs) <- rows.groupBy(_.getLong(3))) {
      val byPos = rs.sortBy(_.getLong(4))
      var cum = 0L
      for (r <- byPos) {
        assert(schedPos(r.getLong(0)) == ((r.getLong(3), r.getLong(4))),
          s"doc ${r.getLong(0)} packed off its keeps-schedule slot")
        val (seqId, startOff, nTok) = (r.getLong(5), r.getLong(6), r.getLong(7))
        assert(seqId == cum / budget && startOff == cum - seqId * budget,
          s"prefix-sum arithmetic broken at doc ${r.getLong(0)}")
        cum += nTok
      }
      // bins non-increasing within every sequence (contiguous
      // curriculum runs survive the keeps filter)
      for ((_, seqRows) <- byPos.groupBy(_.getLong(5))) {
        val bins = seqRows.sortBy(_.getLong(4)).map(_.getLong(2))
        assert(bins.zip(bins.tail).forall { case (a, b) => a >= b },
          "bin increases inside a packed sequence")
      }
    }
  }

  test("c112: integer repeat math closes, caps bind, weights quantize to ≤ 1000 per-mille") {
    val cap = graft.operators.Sampling.RepeatCap
    val rows = graft.operators.Sampling.c112RepeatMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getLong(2)).sum // Σ n_tok = the one-corpus budget
    assert(rows.map(_.getLong(3)).sum <= 1000L, "per-mille weights overflow 1000")
    for (r <- rows) {
      val (nTok, mille, target, achieved) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(target == budget * mille / 1000L, s"target arithmetic broken: $r")
      assert(achieved == math.min(nTok * cap, target), s"cap arithmetic broken: $r")
      assert(r.getLong(7) == target - achieved && r.getLong(7) >= 0L)
      val epochs = r.getDouble(6)
      assert(epochs <= cap + 1e-9, s"epochs exceed the repeat cap: $r")
      assert(math.abs(epochs - math.rint(achieved.toDouble / nTok * 1e4) / 1e4) < 1e-9)
    }
    // √n flattening: smaller sources get ≥ their proportional share
    val (small, big) = (rows.minBy(_.getLong(2)), rows.maxBy(_.getLong(2)))
    if (small.getLong(2) < big.getLong(2))
      assert(small.getLong(3).toDouble / small.getLong(2) >=
        big.getLong(3).toDouble / big.getLong(2),
        "temperature weighting failed to up-weight the small source")
  }

  test("c113: refine depth bounds candidates and exact re-rank never loses recall vs raw ADC") {
    val k = graft.operators.Similarity.PqTopK
    val depth = graft.operators.Similarity.RerankDepth
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val rows = graft.operators.Similarity.c113PqRerank(emb).collect()
    assert(rows.nonEmpty)
    val adc = graft.operators.Similarity.c47PqAdc(emb, topK = depth).collect()
    val adcByQ = adc.groupBy(_.getLong(0))
    val gt = graft.operators.Similarity.c6AnnTopK(emb, k = k).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    for ((q, rs) <- rows.groupBy(_.getLong(0))) {
      assert(rs.length <= k)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq, "ranks not dense")
      // every refined candidate came from the ADC stage at ≤ depth
      val candSet = adcByQ(q).map(_.getLong(2)).toSet
      assert(rs.forall(r => candSet.contains(r.getLong(2))),
        s"query $q re-ranked a vector the ADC stage never surfaced")
      assert(rs.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= depth))
      // recall@k against the exact baseline: re-ranking the candidate
      // set can only keep or improve what raw ADC@k got from it
      for (g <- gt.get(q)) {
        val rerankHits = rs.map(_.getLong(2)).count(g)
        val adcHits = adcByQ(q).filter(_.getLong(1) <= k).map(_.getLong(2)).count(g)
        assert(rerankHits >= adcHits,
          s"query $q: exact re-rank lost recall vs raw ADC ($rerankHits < $adcHits)")
      }
    }
  }

  test("c114: candidate volume and recall grow with bands, dup counts nest across the grid") {
    val rows = graft.operators.Dedup.c114LshGeometry(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    val grid = graft.operators.Dedup.LshGeometries.map(_._1.toLong).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(grid))
    for (r <- rows) {
      assert(r.getLong(1) == graft.operators.Dedup.MinhashK / r.getLong(0))
      // every distinct sampled pair is counted at least once in the
      // analytic probe mass
      assert(r.getLong(3) <= r.getLong(2), "verified more pairs than the probe mass")
      assert(r.getLong(3) <= graft.operators.Dedup.SweepVerifyCap, "verify budget breached")
      assert(r.getLong(4) <= r.getLong(3), "more dups than verified pairs")
      val prec = r.getDouble(5)
      assert(prec >= 0 && prec <= 1.0 + 1e-9)
    }
    // a pair matching an r-row band matches both r/2-row halves, so
    // probe mass NESTS as bands grow (bucket caps could in theory
    // break this on a degenerate corpus; on the driver corpus they
    // don't bind at these volumes)
    val byBands = rows.sortBy(_.getLong(0))
    val probes = byBands.map(_.getLong(2))
    assert(probes.zip(probes.tail).forall { case (a, b) => a <= b },
      s"probe mass not monotone in bands: ${probes.toSeq}")
  }

  test("c115: bins partition the scored corpus and the gap arithmetic closes") {
    val bins = graft.operators.TextAnalysis.CalibBins
    val rows = graft.operators.TextAnalysis.c115Calibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val scored = graft.operators.TextAnalysis.c89StoredClassifier(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == scored, "bins do not partition the scored corpus")
    for (r <- rows) {
      val bin = r.getLong(0)
      assert(bin >= 0 && bin < bins)
      assert(r.getLong(2) <= r.getLong(1), "more keeps than docs in a bin")
      val (mean, rate, gap) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // fixed-width bin bounds (top bin clamps score 1.0)
      assert(mean >= bin.toDouble / bins - 1e-9 &&
        mean <= (bin + 1).toDouble / bins + (if (bin == bins - 1) 1e-9 else 1e-9),
        s"mean score outside its bin: $r")
      assert(math.abs(gap - math.rint((rate - mean) * 1e4) / 1e4) < 1e-9)
      assert(rate >= 0 && rate <= 1.0 + 1e-9)
    }
  }

  test("c116: the pick is the sweep's max-F1 row, ties to the lower threshold") {
    val pick = graft.operators.TextAnalysis.c116ThresholdPick(spark, sf).collect()
    assert(pick.length == 1)
    val p = pick.head
    // F1 arithmetic closes off the row's own confusion counts
    val (tp, fp, fn) = (p.getLong(2), p.getLong(3), p.getLong(4))
    val f1 = p.getDouble(8)
    assert(math.abs(f1 - math.rint(2.0 * tp / (2 * tp + fp + fn) * 1e4) / 1e4) < 1e-9)
    // no sweep row has a strictly higher F1; equal-F1 rows sit at a
    // higher threshold (the tie rule keeps more data)
    val sweep = graft.operators.TextAnalysis.c102ThresholdSweep(spark, sf).collect()
    for (r <- sweep) {
      val rf1 = 2.0 * r.getLong(2) / (2 * r.getLong(2) + r.getLong(3) + r.getLong(4))
      val rf1r = math.rint(rf1 * 1e4) / 1e4
      assert(rf1r < f1 + 1e-9, s"sweep row beats the pick: $r")
      if (math.abs(rf1r - f1) < 1e-9)
        assert(r.getDouble(0) >= p.getDouble(0) - 1e-9,
          s"an equal-F1 row at a lower threshold was not picked: $r")
    }
  }

  test("c117: epoch 0 preserves the curriculum, later epochs permute the same sequence set") {
    val rows = graft.operators.Sampling.c117EpochPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val epochs = rows.map(_.getLong(0)).distinct.sorted
    assert(epochs.toSeq == (0L until graft.operators.Sampling.EpochCount).toSeq)
    val byEpoch = rows.groupBy(_.getLong(0))
    val seqSet = byEpoch(0L).map(r => (r.getLong(1), r.getLong(2))).toSet
    for ((e, rs) <- byEpoch) {
      // every epoch reads exactly the packed sequence set, once each
      assert(rs.map(r => (r.getLong(1), r.getLong(2))).toSet == seqSet,
        s"epoch $e reads a different sequence universe")
      for ((_, shardRows) <- rs.groupBy(_.getLong(1))) {
        val pos = shardRows.map(_.getLong(3)).sorted.toSeq
        assert(pos == (1L to shardRows.length).toSeq, s"epoch $e positions not dense")
      }
    }
    // epoch 0 IS the curriculum: positions follow sequence ids
    for ((_, shardRows) <- byEpoch(0L).groupBy(_.getLong(1))) {
      val inPos = shardRows.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(inPos.sorted.toSeq == inPos.toSeq, "epoch 0 broke the curriculum order")
    }
    // later epochs actually shuffle (some shard's order differs from
    // the curriculum, given more than one sequence per shard)
    if (byEpoch.contains(1L)) {
      val moved = byEpoch(1L).groupBy(_.getLong(1)).exists { case (_, shardRows) =>
        shardRows.length > 1 && {
          val inPos = shardRows.sortBy(_.getLong(3)).map(_.getLong(2))
          inPos.sorted.toSeq != inPos.toSeq
        }
      }
      assert(moved, "epoch 1 never deviates from the curriculum order")
    }
  }

  test("c110: vintages partition the corpus, proportions close, psi terms non-negative") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val rows = graft.operators.Similarity.c110EmbedDrift(emb).collect()
    assert(rows.nonEmpty)
    assert(rows.length <= graft.operators.Similarity.DefaultCentroidCount)
    val total = emb.count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "cell occupancies do not partition the corpus")
    // proportions are the 4-rounded exact divisions and sum to ~1
    val tb = rows.map(_.getLong(1)).sum.toDouble
    val tl = rows.map(_.getLong(2)).sum.toDouble
    for (r <- rows) {
      assert(math.abs(r.getDouble(3) - math.rint(r.getLong(1) / tb * 1e4) / 1e4) < 1e-9)
      assert(math.abs(r.getDouble(4) - math.rint(r.getLong(2) / tl * 1e4) / 1e4) < 1e-9)
      // (p_live − p_base) and ln((p_live+ε)/(p_base+ε)) share a sign,
      // so every PSI term is ≥ 0 (up to the 6-round)
      assert(r.getDouble(5) >= -1e-6, s"negative psi term: $r")
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-2)
  }
}

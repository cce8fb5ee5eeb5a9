package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Round-17 contracts: the classifier-consumer tier (c90 student-
  * gated funnel, c91 feature drift, c93 active batch) and the
  * tokenizer generalization audit (c92). Structural assertions only
  * at driver-chosen scales (the c78 lesson) — measured quantities
  * (PSI magnitudes, compression gaps) are reported, not asserted. */
class Round17Spec extends AnyFunSuite {
  import TestSpark._

  test("c90 transition matrix: mass = population, corpus-grain stages stay diagonal") {
    val pop = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0).count()
    val rows = TextAnalysis.c90StudentFunnel(spark, sf).collect()
    assert(rows.map(_.getLong(4)).sum == pop, "matrix mass != population")
    for (r <- rows) {
      val (t, s) = (r.getString(1), r.getString(3))
      // duplicate/contaminated are SHARED spelling in both funnels —
      // a doc can only disagree on the quality leg
      if (t == "duplicate" || t == "contaminated")
        assert(s == t, s"corpus-grain stage $t moved to $s")
      if (s == "duplicate" || s == "contaminated")
        assert(t == s, s"corpus-grain stage $s came from $t")
      if (t != "duplicate" && t != "contaminated")
        assert(s == "low_quality" || s == "keep",
          s"quality-leg doc landed on student stage $s")
    }
    // share column sums to ~1 at report grain
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 0.01, "shares do not sum to 1")
  }

  test("c91 drift report: five features, doc-grain slice totals, PSI well-formed") {
    val rows = TextAnalysis.c91FeatureDrift(spark, sf).collect()
    assert(rows.length == TextAnalysis.DriftRanges.length, "one row per feature")
    assert(rows.map(_.getString(0)).sorted.sameElements(
      TextAnalysis.DriftRanges.map(_._1).sorted))
    val nDocs = TextAnalysis.c48QualityClassifier(
      graft.sources.Tables.documents(spark, sf)).count()
    for (r <- rows) {
      assert(r.getLong(1) + r.getLong(2) == nDocs,
        s"${r.getString(0)}: slice totals != scored docs")
      assert(r.getDouble(3) >= 0.0, s"${r.getString(0)}: negative PSI")
      assert(r.getLong(4) >= 0 && r.getLong(4) < TextAnalysis.DriftBins,
        s"${r.getString(0)}: max_gap_bin out of range")
    }
  }

  test("c92 holdout audit: train OOV is zero by construction, two splits, sane ratios") {
    val rows = TextAnalysis.c92TokenizerHoldout(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("train", "holdout"))
    val tr = rows("train")
    // every train term is in the trainer's vocabulary by construction
    assert(tr.getLong(6) == 0L, "train split reports OOV terms")
    assert(tr.getDouble(7) == 0.0, "train split reports OOV token share")
    for ((s, r) <- rows) {
      assert(r.getDouble(4) >= 1.0 - 1e-9, s"$s: tokens_per_word below 1 (BPE never splits words)")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, s"$s: compression out of (0,1]")
    }
  }

  test("c93 active batch: dense ranks, margins are the global minimum K") {
    val rows = TextAnalysis.c93ActiveBatch(spark, sf).collect()
    assert(rows.length == TextAnalysis.ActiveBatchK, "batch size != K")
    assert(rows.map(_.getInt(0)).sameElements(1 to TextAnalysis.ActiveBatchK),
      "ranks not the dense 1..K prefix")
    val margins = rows.map(_.getDouble(3))
    assert(margins.zip(margins.tail).forall { case (a, b) => a <= b },
      "margins not non-decreasing in rank order")
    for (r <- rows)
      assert(math.abs(r.getDouble(3)
          - BigDecimal(math.abs(r.getDouble(2) - TextAnalysis.QcThreshold))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"margin of doc ${r.getLong(1)} != |score - threshold|")
    // no unselected doc beats the worst selected margin
    val selected = rows.map(_.getLong(1)).toSet
    val minOutside = TextAnalysis.c89StoredClassifier(spark, sf)
      .filter(!col("doc_id").isInCollection(selected))
      .select(min(round(abs(col("score") - TextAnalysis.QcThreshold), 4)))
      .collect()(0).getDouble(0)
    assert(margins.last <= minOutside + 1e-9,
      "an unselected doc has a smaller margin than the batch's worst")
  }

  test("c94 boundaries annotate exactly c86's packing: same docs, reconciling offsets") {
    val bounds = graft.operators.Sampling.c94PackBoundaries(spark, sf).collect()
    val packs = graft.operators.Sampling.c86PackTokenized(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // every (shard, seq) in the metadata is a c86 sequence with the
    // same doc count and token mass
    for (((sh, sq), rs) <- bounds.groupBy(r => (r.getLong(0), r.getLong(1)))) {
      val p = packs((sh, sq))
      assert(rs.length == p.getLong(2), s"($sh,$sq): doc count != c86")
      assert(rs.map(_.getLong(4)).sum == p.getLong(3), s"($sh,$sq): token mass != c86")
    }
    assert(bounds.map(r => (r.getLong(0), r.getLong(1))).distinct.length == packs.size,
      "metadata misses a c86 sequence")
    for (r <- bounds) {
      val (start, n) = (r.getLong(3), r.getLong(4))
      assert(start >= 0 && start < graft.operators.Sampling.DefaultTokenBudget,
        s"doc ${r.getLong(2)}: start offset outside the budget window")
      assert(r.getBoolean(5) == (start + n > graft.operators.Sampling.DefaultTokenBudget),
        s"doc ${r.getLong(2)}: straddle flag != its own rule")
    }
  }

  test("c95 keepers: one per c12 cluster, the argmax member, gain consistent") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val clusters = graft.operators.Dedup.c12DupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc -> cluster
    val scores = TextAnalysis.c89StoredClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = graft.operators.Dedup.c95QualityKeeper(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == clusters.values.toSet,
      "keeper rows != c12 cluster set")
    for (r <- rows) {
      val c = r.getLong(0)
      val members = clusters.collect { case (d, cl) if cl == c => d }.toSeq
      assert(r.getLong(1) == members.length, s"cluster $c: member count")
      val best = members.maxBy(d => (scores(d), -d))
      assert(r.getLong(2) == best, s"cluster $c: keeper is not the score argmax")
      assert(math.abs(r.getDouble(3) - scores(best)) < 1e-9, s"cluster $c: keeper score")
      assert(math.abs(r.getDouble(4) - scores(c)) < 1e-9, s"cluster $c: min-id score")
      assert(r.getBoolean(5) == (best != c), s"cluster $c: changed flag")
      assert(r.getDouble(6) >= -1e-9, s"cluster $c: negative quality gain")
    }
  }

  test("c96 student-gated funnel: partition, student stage set, gate agreement with c89") {
    val pop = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0)
    val rows = graft.streaming.FunnelStream.c96StudentGateAudit(spark, sf).collect()
    assert(rows.length == pop.count(), "one decision per population doc")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "doc decided twice")
    val stages = rows.map(_.getString(1)).toSet
    assert(stages.subsetOf(Set("low_quality", "contaminated", "duplicate", "keep")),
      s"illegal student stages: $stages")
    // stage 1 must agree doc-for-doc with the stored classifier's
    // serving view (same artifact, same spellings)
    val verdict = TextAnalysis.c89StoredClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) == 1L)).toMap
    for (r <- rows) {
      if (r.getString(1) == "low_quality")
        assert(!verdict(r.getLong(0)),
          s"doc ${r.getLong(0)} dropped low_quality but c89 keeps it")
      else
        assert(verdict(r.getLong(0)),
          s"doc ${r.getLong(0)} passed stage 1 but c89 refuses it")
      // duplicates cite an admitted keeper (keep-first store discipline)
      if (r.getString(1) == "duplicate") assert(!r.isNullAt(2))
      if (r.getString(1) == "keep" || r.getString(1) == "low_quality"
          || r.getString(1) == "contaminated")
        assert(r.isNullAt(2), s"${r.getString(1)} row carries a cite")
    }
  }

  test("c97 refresh diff: full-weights leg equals c89, flip encodes the keep delta") {
    val rows = TextAnalysis.c97ClassifierRefresh(spark, sf).collect()
    val c89 = TextAnalysis.c89StoredClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(rows.length == c89.size, "one row per scored doc")
    for (r <- rows) {
      val (sFull, kFull) = c89(r.getLong(0))
      assert(math.abs(r.getDouble(2) - sFull) < 1e-9,
        s"doc ${r.getLong(0)}: full-weights score drifted from c89")
      assert(r.getLong(4) == kFull, s"doc ${r.getLong(0)}: full keep bit != c89")
      val expected =
        if (r.getLong(3) < r.getLong(4)) "gained"
        else if (r.getLong(3) > r.getLong(4)) "lost" else null
      assert(Option(r.getString(5)) == Option(expected),
        s"doc ${r.getLong(0)}: flip != its own definition")
    }
  }

  test("c98 manifest: mass reconciles with the kept set, packing within (split, shard)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = graft.operators.Sampling.c98ExportManifest(spark, sf).collect()
    // total docs = the funnel's keeps
    assert(rows.map(_.getLong(2)).sum > 0, "empty manifest")
    val keeps = TextAnalysis.c50CurationFunnel(docs).collect()
      .filter(_.getString(1) == "keep").map(_.getLong(2)).sum
    assert(rows.map(_.getLong(2)).sum == keeps,
      "manifest doc mass != the funnel's keep count")
    // every (split, shard) row's sequences are the dense 0..max of its
    // own packing (start-offset blocks) and checksums are well-formed
    for (r <- rows) {
      assert(Set("train", "val", "test")(r.getString(0)))
      assert(r.getLong(1) >= 0 && r.getLong(1) < graft.operators.Sampling.PackShards)
      assert(r.getLong(3) >= 1, "a manifest row with zero sequences")
      assert(r.getLong(4) >= r.getLong(2), "fewer tokens than docs")
      assert(!r.isNullAt(5), "doc_checksum null")
    }
  }
}

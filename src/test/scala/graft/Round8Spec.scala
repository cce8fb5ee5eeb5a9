package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.operators.{Sampling, TextAnalysis}

/** Round-8 contracts: the Bloom decontamination scan never misses a
  * truly contaminated shingle (superset of the exact scan), the
  * cluster-aware split is leakage-safe where c13's per-doc split is
  * not, BM25 ranks by the textbook formula with stopword elision and
  * static posting pruning, and the temperature mixture up-weights
  * small sources by exactly the floor-quantized sqrt rule. */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  /** The operators' stable hash: md5 of the string, first 7 hex chars
    * as an int, mod m — replicated on the JVM so specs can compute
    * expected admissions/buckets exactly. */
  private def md5Bucket(s: String, m: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 7)
    java.lang.Long.parseLong(hex, 16) % m
  }

  private def docsDF(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  // ---- c35: Bloom decontamination -------------------------------------

  test("c35 planted: copied passage flagged, disjoint doc clean") {
    // doc 0 (0 % 97 == 0) is the benchmark; doc 1 copies its text
    // wholesale; doc 2 shares no vocabulary. With |bench shingles|
    // ≈ 30 and 2^20 bits, the all-4-positions FP probability per
    // clean shingle is ~(120/2^20)^4 ≈ 2e-16 — asserting zero is
    // sound.
    val bench = (1 to 32).map(i => s"tok$i").mkString(" ")
    val clean = (1 to 32).map(i => s"other$i").mkString(" ")
    val docs = docsDF(Seq(
      (0L, bench, "en", "s"),
      (1L, bench + " tail1 tail2", "en", "s"),
      (2L, clean, "en", "s")))
    val out = TextAnalysis.c35BloomContamination(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains(0L), "benchmark doc must not be probed")
    assert(out(1L)._1 >= 30, s"copied passage under-flagged: ${out(1L)}")
    assert(out(2L) == ((0L, 0.0)), s"disjoint doc falsely flagged: ${out(2L)}")
  }

  test("c35 never undercounts the exact scan (Bloom superset property)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sh = docs
      .select(col("doc_id"),
        explode(array_distinct(transform(TextFns.shingles3(col("text")),
          s => TextFns.h8(s)))).as("sh8"))
    val bench = sh.filter(col("doc_id") % 97 === 0).select("sh8").distinct()
    val exact = sh.filter(col("doc_id") % 97 =!= 0)
      .join(bench.withColumn("hit", lit(1L)), Seq("sh8"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TextAnalysis.c35BloomContamination(docs, k = Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom.keySet == exact.keySet)
    for ((id, n) <- exact)
      assert(bloom(id) >= n, s"doc $id: bloom ${bloom(id)} < exact $n — a false NEGATIVE")
  }

  // ---- c36: leakage-safe split ----------------------------------------

  test("c36 keeps a near-dup pair in one split where c13 separates it") {
    // find two ids whose DOC-grain buckets land in different c13
    // splits (one train, one test) — the leakage case
    val ids = (1L to 400L)
    val a = ids.find(i => md5Bucket(i.toString, 100) < Sampling.SplitTrainPct).get
    val b = ids.find(i => md5Bucket(i.toString, 100) >= Sampling.SplitValPct).get
    val shared = (1 to 40).map(i => s"w$i").mkString(" ")
    val filler = (0 until 20).map { i =>
      val id = 1000L + i
      (id, (1 to 30).map(j => s"f${i}x$j").mkString(" "), "en", "s")
    }
    val docs = docsDF(Seq(
      (a, shared, "en", "s"),
      (b, shared + " extra", "en", "s")) ++ filler)

    // expected: cluster(a,b) = min(a,b); every filler is its own
    // cluster; split decided by the CLUSTER id's bucket
    val clusters = Seq(math.min(a, b)) ++ filler.map(_._1)
    def splitOf(c: Long) = {
      val bkt = md5Bucket(c.toString, 100)
      if (bkt < Sampling.SplitTrainPct) "train"
      else if (bkt < Sampling.SplitValPct) "val" else "test"
    }
    val expected = clusters.groupBy(splitOf)
      .map { case (s, cs) =>
        val nDocs = cs.map(c => if (c == math.min(a, b)) 2L else 1L).sum
        s -> ((nDocs, cs.size.toLong))
      }
    val got = Sampling.c36ClusterSplit(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"got $got expected $expected")
    // and the pair really does straddle under the per-DOC split
    assert(splitOf(a) == "train" && splitOf(b) == "test",
      "planted ids no longer straddle — pick different ids")
  }

  test("c36 property: no cluster straddles splits; c13 provably leaks on the same corpus") {
    // the REAL corpus: its planted near-identical docs make non-
    // singleton clusters, so the property is exercised, not vacuous
    val docs = graft.sources.Tables.documents(spark, sf)
    val asg = Sampling.c36Assignments(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(asg.length == docs.count())
    val perCluster = asg.groupBy(_._2).map { case (c, rows) => c -> rows.map(_._3).toSet }
    assert(perCluster.values.forall(_.size == 1),
      s"clusters split across sets: ${perCluster.filter(_._2.size > 1).take(3)}")
    assert(asg.groupBy(_._2).exists(_._2.length > 1),
      "no multi-doc cluster — property vacuous on this corpus")
    // c13's per-doc split separates at least one of those clusters
    // (the leak c36 exists to close)
    val docSplit = asg.map { case (id, _, _) =>
      val b = md5Bucket(id.toString, 100)
      id -> (if (b < Sampling.SplitTrainPct) "train"
             else if (b < Sampling.SplitValPct) "val" else "test")
    }.toMap
    val leaked = asg.groupBy(_._2).exists { case (_, rows) =>
      rows.length > 1 && rows.map(r => docSplit(r._1)).toSet.size > 1 }
    assert(leaked, "corpus never exercises the c13 leak — planted spec still covers it")
  }

  // ---- c37: BM25 --------------------------------------------------------

  test("c37 ranks by tf saturation, elides universal terms, prunes to cap") {
    // query doc 0 (0 % 101 == 0): terms {ubiq, apple, banana, pad}.
    // "ubiq" appears in EVERY corpus doc → df = 100% > 90% → elided.
    // Candidates (none ≡ 0 mod 101): tf(apple) 4 > 2 > 1; doc 5 has
    // only elided/absent terms and must not appear at all.
    val docs = docsDF(Seq(
      (0L, "ubiq apple banana pad", "en", "s"),
      (1L, "ubiq apple apple apple apple pad1", "en", "s"),
      (2L, "ubiq apple apple pad2 pad3 pad4", "en", "s"),
      (3L, "ubiq apple banana pad5 pad6", "en", "s"),
      (5L, "ubiq pad7 pad8 pad9", "en", "s")))
    val out = TextAnalysis.c37Bm25(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.forall(_._1 == 0L))
    val ranked = out.sortBy(_._2).map(_._3)
    assert(!ranked.contains(5L), s"doc with only elided terms retrieved: $ranked")
    // doc 3 matches apple AND banana; banana's idf (df=1 of 4) is
    // high, so it must outrank the tf-only docs; among 1 and 2 the
    // higher apple tf wins
    assert(ranked.indexOf(1L) < ranked.indexOf(2L),
      s"tf ordering violated: $ranked")
    assert(ranked.contains(3L))

    // static pruning: cap=1 keeps only the top-tf doc per (q, term) —
    // doc 1 for apple, doc 3 for banana
    val pruned = TextAnalysis.c37Bm25(docs, postingCap = 1)
      .collect().map(r => r.getLong(2)).toSet
    assert(pruned == Set(1L, 3L), s"cap=1 kept $pruned")
  }

  test("c37 hand-computed BM25 score matches") {
    // one query term, two candidates, tiny corpus — replicate the
    // formula exactly (idf over the 3 corpus docs, length norm vs
    // mean dl) and compare to 4 decimals
    val docs = docsDF(Seq(
      (0L, "apple zz1 zz2 zz3", "en", "s"),
      (1L, "apple apple x1 x2", "en", "s"),
      (2L, "apple y1", "en", "s"),
      (3L, "z1 z2 z3 z4 z5 z6", "en", "s")))
    val n = 3.0
    val avgdl = (4 + 2 + 6) / 3.0
    def score(tf: Long, dl: Long, df: Long): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val c = idf * (tf * (TextAnalysis.Bm25K1 + 1)) /
        (tf + TextAnalysis.Bm25K1 *
          (1 - TextAnalysis.Bm25B + TextAnalysis.Bm25B * dl / avgdl))
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Map(1L -> score(2, 4, 2), 2L -> score(1, 2, 2))
    val got = TextAnalysis.c37Bm25(docs)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  // ---- c38: temperature mixture ---------------------------------------

  test("c38 floor-quantized sqrt rates, small source up-weighted") {
    // 400 big + 100 small: z = 20 + 10 = 30, budget = 250 →
    // mille_big = floor(1000·250·20/(30·400)) = 416,
    // mille_small = floor(1000·250·10/(30·100)) = 833
    val docs = docsDF(
      (0L until 400L).map(i => (i, s"b$i", "en", "big")) ++
        (400L until 500L).map(i => (i, s"s$i", "en", "small")))
    val got = Sampling.c38TemperatureMix(docs)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val keptBig = (0L until 400L).count(i => md5Bucket(i.toString, 1000) < 416)
    val keptSmall = (400L until 500L).count(i => md5Bucket(i.toString, 1000) < 833)
    assert(got("big") == ((400L, 416L, keptBig.toLong,
      BigDecimal(keptBig / 400.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("small") == ((100L, 833L, keptSmall.toLong,
      BigDecimal(keptSmall / 100.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // the temperature property itself: the small source keeps a
    // strictly larger share than the big one
    assert(got("small")._2 > got("big")._2)
  }

  // ---- d7: perceptual-cluster manifest --------------------------------

  test("d7 accounts every payload byte and reclaims exactly the non-canonical mass") {
    import graft.operators.Multimodal
    val docs = graft.sources.Tables.documents(spark, sf)
    val report = Multimodal.d7ClusterManifest(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // regroup d6's per-asset rows + payload sizes in plain Scala
    val assets = Multimodal.d6MediaNearDup(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    val bytes = docs.select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = assets.groupBy(a => (a._3, a._2)).map { case ((cl, mt), as) =>
      (cl, mt, as.length.toLong, as.map(a => bytes(a._1)).sum,
        as.filter(_._4 == 0L).map(a => bytes(a._1)).sum)
    }.toSeq.sortBy(_._1)
    assert(report.toSeq == want, "d7 disagrees with a by-hand regroup of d6")
    // every payload byte is accounted once; reclaim < total wherever
    // a cluster has members, and zero for singletons
    assert(report.map(_._4).sum == bytes.values.sum)
    for ((cl, _, n, tot, rec) <- report) {
      if (n == 1L) assert(rec == 0L, s"singleton cluster $cl reclaims")
      assert(rec < tot || tot == 0L, s"cluster $cl reclaims its canonical too")
    }
    // the corpus plants near-identical docs → at least one multi-
    // asset cluster must exist for the reclaim story to be tested
    assert(report.exists(_._3 > 1), "no multi-asset cluster in the corpus")
  }

  // ---- c39: DSIR ------------------------------------------------------

  test("c39 ranks target-like raw docs above generic ones, hand-checked") {
    // target doc 0 (0 % 97 == 0) speaks "medical"; raw doc 1 shares
    // that vocabulary, raw doc 2 is generic filler also present in
    // the raw background. Expected ordering: doc 1 ≫ doc 2.
    val docs = docsDF(Seq(
      (0L, "dose trial cohort dose trial", "en", "s"),
      (1L, "dose trial cohort", "en", "s"),
      (2L, "web page click web", "en", "s"),
      (3L, "web page click banner ad", "en", "s")))
    val got = TextAnalysis.c39DsirSelection(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L), s"raw docs only: ${got.toSeq}")
    val byDoc = got.map(t => t._1 -> t._3).toMap
    assert(byDoc(1L) > byDoc(2L) && byDoc(1L) > byDoc(3L),
      s"target-like doc not ranked first: $byDoc")

    // hand-check doc 1's mean llr: vocab = {dose,trial,cohort,web,
    // page,click,banner,ad} (V=8), N_tgt=5, N_raw=12
    def llr(cTgt: Long, cRaw: Long): Double =
      math.log10((cTgt + 1).toDouble / (5 + 8)) - math.log10((cRaw + 1).toDouble / (12 + 8))
    val expect1 = BigDecimal((llr(2, 1) + llr(2, 1) + llr(1, 1)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byDoc(1L) == expect1, s"doc 1 llr ${byDoc(1L)} != $expect1")
  }

  // ---- c40: BPE pair stats --------------------------------------------

  test("c40 counts weighted char pairs, in-word repeats included, hand-checked") {
    // corpus: "aaa" ×3 docs (pair "aa" twice per word → total 6),
    // "ab" ×2 within one doc (total 2), "b" too short to pair
    val docs = docsDF(Seq(
      (1L, "aaa b", "en", "s"),
      (2L, "aaa ab ab", "en", "s"),
      (3L, "aaa", "en", "s")))
    val got = TextAnalysis.c40BpePairs(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "aa": n("aaa") = 3, two in-word occurrences → 6; one distinct word
    // "ab": n("ab") = 2 → 2; "aaa" has no "ab"
    assert(got.toSeq == Seq(("aa", 6L, 1L), ("ab", 2L, 1L)), s"got ${got.toSeq}")
  }

  test("c38 single source caps at mille 1000 (keep everything within budget rule)") {
    // one source: mille = min(1000, floor(1000·floor(n/2)·√n/(√n·n)))
    // = floor(1000·(n/2)/n) = 500 for even n — exactly the budget
    // share, no up-weighting possible
    val docs = docsDF((0L until 100L).map(i => (i, s"t$i", "en", "only")))
    val got = Sampling.c38TemperatureMix(docs).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 500L, s"single-source mille: ${got.head}")
  }

  // ---- c41: Gopher rule battery ---------------------------------------

  test("c41 fires each Gopher rule at its measured signal, hand-checked") {
    import graft.operators.TextAnalysis
    val stops = Seq("the", "of")
    def w(n: Int, word: String) = (stops ++ Seq.fill(n - 2)(word)).mkString(" ")
    val docs = docsDF(Seq(
      // 50 words (boundary), mean (3+2+48·5)/50 = 4.9, all-alpha,
      // no symbols, 2 stop hits → keeps
      (1L, w(50, "world"), "en", "s"),
      // 3 words → word_count; mean 8/3 = 2.6667 → mean_word_len
      (2L, "the of aaa", "en", "s"),
      // "abc1" non-alpha: alpha_frac 2/50 = 0.04 → alpha (mean 3.94 ok)
      (3L, w(50, "abc1"), "en", "s"),
      // one '...' per token: symbol_ratio 48/50 = 0.96 → symbol
      // (and '...' breaks the alpha rule too — by the paper's rules)
      (4L, w(50, "abc..."), "en", "s"),
      // alpha and length fine, zero stopword hits → stopword
      (5L, ("apple " * 50).trim, "en", "s")))
    val got = TextAnalysis.c41GopherRules(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    assert(got(1L) == ((50L, 4.9, 1.0, 0.0, 2L, 1L, "")), s"doc1 ${got(1L)}")
    assert(got(2L) == ((3L, 2.6667, 1.0, 0.0, 2L, 0L, "word_count,mean_word_len")),
      s"doc2 ${got(2L)}")
    assert(got(3L) == ((50L, 3.94, 0.04, 0.0, 2L, 0L, "alpha")), s"doc3 ${got(3L)}")
    assert(got(4L) == ((50L, 5.86, 0.04, 0.96, 2L, 0L, "alpha,symbol")),
      s"doc4 ${got(4L)}")
    assert(got(5L) == ((50L, 5.0, 1.0, 0.0, 0L, 0L, "stopword")), s"doc5 ${got(5L)}")
  }

  // ---- c42: asymmetric containment ------------------------------------

  test("c42 surfaces a contained quote that jaccard ranking buries, hand-checked") {
    import graft.operators.Dedup
    // long doc: 60 words → 58 shingles; short doc = its first 12
    // words → 10 shingles, every one shared. Containment 10/10 = 1.0;
    // jaccard 10/58 = 0.1724 — far below any symmetric dup bar, which
    // is exactly the mass c42 exists to surface.
    val words = (1 to 60).map(i => s"w$i")
    val docs = docsDF(Seq(
      (1L, words.mkString(" "), "en", "s"),
      (2L, words.take(12).mkString(" "), "en", "s"),
      (3L, "x y z q", "en", "s")))
    val got = Dedup.c42Containment(docs).collect()
    assert(got.length == 1, s"expected one containment row, got ${got.toSeq}")
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      == ((2L, 1L, 10L, 1.0, 0.1724)), s"row ${r.toSeq}")
  }

  // ---- d8: content-defined chunking -----------------------------------

  test("d8 chunks tile every payload exactly (dense idx, lengths sum to bytes)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val ch = graft.operators.Multimodal.d8CdcChunks(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(col("chunk_idx")).as("mx"),
        sum(col("chunk_len")).as("bytes"), min(col("chunk_len")).as("mn"))
    val sizes = docs.select(col("doc_id"),
      length(encode(col("text"), "UTF-8")).cast("long").as("want"))
    val bad = ch.join(sizes, Seq("doc_id"))
      .filter(col("bytes") =!= col("want") || col("mx") =!= col("n") - 1
        || col("mn") < 1)
      .count()
    assert(bad == 0, s"$bad documents mis-tiled")
    // geometry sanity: the modulus choice actually cuts (~1/63 rate);
    // a degenerate predicate (the mod-64 lattice trap) would leave
    // nearly every doc a single chunk
    val perDoc = ch.agg(avg(col("n"))).head().getDouble(0)
    assert(perDoc > 2.0, s"cut rate degenerate: avg $perDoc chunks/doc")
  }

  test("d8 re-synchronizes after an insertion where d2's fixed grid cannot") {
    import graft.operators.Multimodal
    // B = 3 inserted bytes + A. CDC cut positions are a function of a
    // 16-byte window, so every cut of A recurs in B shifted by 3, and
    // each A-chunk from the first cut onward hashes identically in B.
    val textA = Seq.tabulate(400)(i => s"w${(i * 7) % 97}x${(i * 13) % 89}").mkString(" ")
    val docs = docsDF(Seq((1L, textA, "en", "s"), (2L, "zz " + textA, "en", "s")))
    def chunks(id: Long, df: org.apache.spark.sql.DataFrame) =
      df.filter(col("doc_id") === id)
        .select("chunk_idx", "chunk_md5").collect()
        .sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    val cdc = Multimodal.d8CdcChunks(docs)
    val (a, b) = (chunks(1L, cdc), chunks(2L, cdc))
    assert(a.length >= 4, s"planted payload too smooth: ${a.length} chunks")
    // all of A's chunks except the head (whose B twin carries the
    // inserted prefix) survive the shift byte-for-byte
    val shared = a.tail.count(b.toSet)
    assert(shared == a.length - 1, s"resync lost chunks: $shared of ${a.length - 1}")
    // the fixed grid shares nothing: a 3-byte shift misaligns every
    // 64-byte slice (payload lengths differ, so even tails differ)
    val fix = Multimodal.d2MediaChunks(docs)
    val fixShared = chunks(1L, fix).toSet.intersect(chunks(2L, fix).toSet)
    assert(fixShared.isEmpty, s"fixed grid unexpectedly shared $fixShared")
  }

  test("d8 empty payload still frames one zero-length chunk") {
    val docs = docsDF(Seq((3L, "", "en", "s")))
    val got = graft.operators.Multimodal.d8CdcChunks(docs).collect()
    assert(got.length == 1)
    assert(got.head.getLong(3) == 0L)
    assert(got.head.getString(4) == "d41d8cd98f00b204e9800998ecf8427e")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Round-9 contracts: the k-NN graph ranks planted clusters at the
  * top and bounds every neighbor list, the Zipf report reproduces
  * hand-computed diversity signals (including the OLS slope), the
  * cross-snapshot dedup makes the right decision per planted delta
  * doc (exact beats near, delta-internal duplication is out of
  * scope), and the bigram LM scores word ORDER — same vocabulary,
  * different sequence, different score. */
class Round9Spec extends AnyFunSuite {
  import TestSpark._

  private def md5Bucket(s: String, m: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 7), 16) % m
  }

  private def docsDF(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  private def round4(v: Double): Double =
    BigDecimal.valueOf(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- c43: blocked k-NN graph ----------------------------------------

  test("c43 planted cluster tops each member's list; every list is k-bounded and dense") {
    import spark.implicits._
    // a 3-member near-identical cluster (cos ≈ 1 pairwise) in a sea
    // of sign-varied background vectors; all share sign bucket only
    // within the cluster's pattern
    val dim = 16
    def vec(seed: Int, flip: Boolean): Array[Float] =
      Array.tabulate(dim) { d =>
        val base = math.sin(seed * 31 + d * 7).toFloat + 1.5f
        if (flip && d % 3 == 0) -base else base
      }
    val cluster = Seq(0L, 1L, 2L).map(i =>
      (i, Array.tabulate(dim)(d => 1.0f + 0.001f * (i + d).toFloat)))
    val noise = (3L to 40L).map(i => (i, vec(i.toInt, i % 2 == 0)))
    val out = Similarity.c43KnnGraph((cluster ++ noise).toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byNode = out.groupBy(_._1)
    for (m <- Seq(0L, 1L, 2L)) {
      val nbrs = byNode(m).sortBy(_._2).map(_._3).take(2).toSet
      assert(nbrs == (Set(0L, 1L, 2L) - m),
        s"vec $m top-2 should be its cluster, got ${byNode(m).toSeq.sortBy(_._2)}")
    }
    for ((node, rows) <- byNode) {
      assert(rows.length <= Similarity.KnnK, s"vec $node degree ${rows.length} > k")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"vec $node ranks not dense")
      val cs = rows.sortBy(_._2).map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"vec $node cosines not non-increasing")
    }
  }

  test("c43 edges come from the LSH candidate graph (no cross-bucket neighbor at 1 table)") {
    import spark.implicits._
    // two sign-opposite groups can never share a bucket at nTables=1,
    // so no edge may cross them — the approximation contract is
    // exactly the LSH one
    val a = (0L to 5L).map(i => (i, Array.tabulate(16)(d => 1.0f + 0.01f * (i + d))))
    val b = (6L to 11L).map(i => (i, Array.tabulate(16)(d => -1.0f - 0.01f * (i + d).toFloat)))
    val out = Similarity.c43KnnGraph((a ++ b).toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (v, n) => (v < 6) == (n < 6) },
      s"cross-bucket edge leaked: ${out.filterNot { case (v, n) => (v < 6) == (n < 6) }.toSeq}")
  }

  // ---- c44: Zipf / lexical-diversity report ---------------------------

  test("c44 hand-computed diversity signals and OLS slope") {
    // source 'rich': freqs a=4, b=2, c=1 over 3 docs
    //   n_tokens=7, vocab=3, hapax=1 (c), head covers all → mass 1.0
    // source 'flat': two docs of one repeated word → vocab=1,
    //   single-rank head (slope has zero x-variance)
    val docs = docsDF(Seq(
      (1L, "a a b", "en", "rich"),
      (2L, "a b c", "en", "rich"),
      (3L, "a", "en", "rich"),
      (4L, "z z z", "en", "flat"),
      (5L, "z", "en", "flat")))
    val out = TextAnalysis.c44ZipfDiversity(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val rich = out("rich")
    assert(rich.getLong(1) == 3L && rich.getLong(2) == 7L && rich.getLong(3) == 3L)
    assert(rich.getDouble(4) == round4(3.0 / 7.0), "ttr")
    assert(rich.getDouble(5) == round4(1.0 / 3.0), "hapax_frac")
    assert(rich.getDouble(6) == 1.0, "head covers the whole vocab")
    // OLS slope over (log10 rank, log10 freq) points (0,log4),
    // (log2,log2), (log3,0)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log10)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log10)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(rich.getDouble(7) == round4(slope), s"zipf slope ${rich.getDouble(7)} vs $slope")
    val flat = out("flat")
    assert(flat.getLong(2) == 4L && flat.getLong(3) == 1L)
    assert(flat.isNullAt(7), "single-rank head has no defined slope")
  }

  // ---- c45: cross-snapshot incremental dedup --------------------------

  test("c45 planted: exact beats near, near picks max-jaccard base, delta-delta ignored") {
    // content-independent split: find real base/delta ids
    val ids = (1L to 600L)
    def isBase(i: Long) = md5Bucket(i.toString, 100) < Dedup.DeltaBasePct
    val base = ids.filter(isBase).take(3).toArray
    val delta = ids.filterNot(isBase).take(4).toArray
    val words = (1 to 11).map(i => s"w$i")
    val shared = words.mkString(" ")
    val near = (words.dropRight(1) :+ "CHANGED").mkString(" ")
    val uniq = (1 to 11).map(i => s"u$i").mkString(" ")
    val docs = docsDF(Seq(
      (base(0), shared, "en", "s"),   // exact carrier (and near carrier)
      (base(1), shared, "en", "s"),   // second exact copy — min id must win
      (base(2), (1 to 11).map(i => s"q$i").mkString(" "), "en", "s"),
      (delta(0), shared, "en", "s"),  // dup_exact (has near evidence too)
      (delta(1), near, "en", "s"),    // dup_near: 8 shared / 10 union... vs both base copies
      (delta(2), uniq, "en", "s"),    // new
      (delta(3), uniq, "en", "s")))   // delta-internal twin: still new
    val out = Dedup.c45DeltaDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(out.keySet == delta.toSet, "every delta doc reported exactly once")
    val minBase = math.min(base(0), base(1))
    val (d0dec, d0match, d0jac) = out(delta(0))
    assert(d0dec == "dup_exact" && d0match == minBase && d0jac.isNaN,
      s"exact with keep-first carrier: ${out(delta(0))}")
    val (dn, nd, jac) = out(delta(1))
    assert(dn == "dup_near" && (nd == base(0) || nd == base(1)) && jac >= Dedup.DeltaNearBar,
      s"near decision: ${out(delta(1))}")
    assert(nd == math.min(base(0), base(1)), "jaccard tie between twin carriers → min id")
    assert(out(delta(2))._1 == "new" && out(delta(3))._1 == "new",
      "delta-internal duplication is not this operator's question")
  }

  test("c45 on the real corpus: decisions partition the delta side; evidence rows are sound") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDelta = docs.filter(
      conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100 >= Dedup.DeltaBasePct).count()
    val out = Dedup.c45DeltaDedup(docs)
    assert(out.count() == nDelta)
    assert(out.filter(col("decision") === "new"
      && col("match_doc").isNotNull).count() == 0)
    assert(out.filter(col("decision") =!= "new"
      && col("match_doc").isNull).count() == 0)
    assert(out.filter(col("decision") === "dup_near"
      && col("jaccard") < Dedup.DeltaNearBar).count() == 0)
  }

  // ---- c47: product-quantization ADC ----------------------------------

  test("c47 planted: a codeword clone encodes onto its codeword and its query ranks it first") {
    import spark.implicits._
    val dim = 64
    // 16 well-separated codebook seeds (vec_ids 0..15), one exact
    // clone of codeword 5 (id 100), and background noise
    def seed(k: Int) = Array.tabulate(dim)(d =>
      (math.sin(k * 101 + d * 13) * 10).toFloat)
    val cbs = (0 until 16).map(k => (k.toLong, seed(k)))
    val clone = Seq((100L, seed(5)))
    val noise = (101L to 140L).map(i =>
      (i, Array.tabulate(dim)(d => (math.sin(i * 17 + d * 29) * 10).toFloat)))
    val out = graft.operators.Similarity.c47PqAdc((cbs ++ clone ++ noise).toDF("vec_id", "embedding"),
      nQueries = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // query 5 (the codeword itself) must rank its exact clone first
    // with ADC distance 0 — the clone's every sub-slice encodes onto
    // codeword 5, and the query's lut row for its own codeword is 0
    val q5 = out.filter(_._1 == 5L).sortBy(_._2)
    assert(q5.head._3 == 100L && q5.head._4 == 0.0,
      s"codeword clone not first for its own query: ${q5.take(3).toSeq}")
    // ranks dense, adist non-decreasing, k-bounded — for every query
    for ((q, rows0) <- out.groupBy(_._1)) {
      val rows = rows0.sortBy(_._2)
      assert(rows.length <= graft.operators.Similarity.PqTopK)
      assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq, s"q $q ranks not dense")
      val ds = rows.map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, s"q $q adist not monotone")
    }
  }

  test("c47 narrow-embedding corpus fails loudly, not silently") {
    import spark.implicits._
    val bad = Seq((0L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.operators.Similarity.c47PqAdc(bad, nQueries = 1).collect()
    }
    assert(e.getMessage != null)
  }

  // ---- c50: the batch curation funnel ---------------------------------

  test("c50 planted: one doc per stage, first failure wins, benchmark excluded") {
    val bench = (1 to 12).map(i => s"w$i").mkString(" ")
    val fluent = "the cat and the dog run in the park today now"
    val piiText = "the a of to and is in it " + (100 to 120).map(_.toString).mkString(" ")
    val docs = docsDF(Seq(
      (0L, bench, "en", "s"),                    // benchmark slice — not in the report
      (1L, bench, "en", "s"),                    // contaminated (NOT duplicate: the twin is eval-side)
      (2L, fluent, "en", "s"),                   // keep (first copy wins)
      (3L, fluent, "en", "s"),                   // duplicate
      (4L, "a b c", "en", "s"),                  // too_short
      (5L, "zxq vbn qwp olm akz pfu", "en", "s"),// non_en
      (6L, "the the the the the the", "en", "s"),// repetitive
      (7L, piiText, "en", "s")))                 // pii_heavy
    val out = TextAnalysis.c50CurationFunnel(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2), r.getDouble(3))).toMap
    val expShare = round4(1.0 / 7.0)
    val expected = Map(
      "duplicate" -> 1L, "contaminated" -> 2L, "too_short" -> 3L,
      "non_en" -> 4L, "repetitive" -> 5L, "pii_heavy" -> 6L, "keep" -> 7L)
    assert(out.keySet == expected.keySet, s"stages: ${out.keySet}")
    for ((stage, ord) <- expected)
      assert(out(stage) == ((ord, 1L, expShare)), s"$stage: ${out(stage)}")
    // the per-doc decisions behind the report (the frame the chained
    // streaming gates are held to)
    val dec = TextAnalysis.funnelDecisions(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec == Map(1L -> "contaminated", 2L -> "keep", 3L -> "duplicate",
      4L -> "too_short", 5L -> "non_en", 6L -> "repetitive", 7L -> "pii_heavy"))
  }

  test("c50 real corpus: decisions partition the population, shares sum to ~1") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val pop = docs.filter(col("doc_id") % 97 =!= 0).count()
    val rows = TextAnalysis.c50CurationFunnel(docs).collect()
    assert(rows.map(_.getLong(2)).sum == pop, "every population doc counted once")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.01)
    val allowed = Set("duplicate", "contaminated", "too_short", "non_en",
      "repetitive", "pii_heavy", "keep")
    assert(rows.map(_.getString(1)).toSet.subsetOf(allowed))
  }

  // ---- c51: dedup-threshold sweep -------------------------------------

  test("c51 planted pairs land in exactly the bars their jaccard clears") {
    val words = (1 to 11).map(i => s"s$i")
    val twinA = words.mkString(" ")
    val nearA = (words.dropRight(1) :+ "CHANGED").mkString(" ")  // jac 0.8 vs twinA
    val other = (1 to 11).map(i => s"t$i").mkString(" ")
    val docs = docsDF(Seq(
      (1L, twinA, "en", "s"), (2L, twinA, "en", "s"),   // jac 1.0 pair
      (3L, nearA, "en", "s"),                            // 0.8 vs 1 and vs 2
      (4L, other, "en", "s")))                           // untouched
    val out = Dedup.c51DedupSweep(docs).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // pairs: (1,2) at 1.0; (1,3) and (2,3) at 0.8
    assert(out(0.5) == ((3L, 3L)) && out(0.8) == ((3L, 3L)), s"low bars: $out")
    assert(out(0.9) == ((1L, 2L)) && out(1.0) == ((1L, 2L)), s"high bars: $out")
    // curves are monotone non-increasing in the bar
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case ((p1, d1), (p2, d2)) => p1 >= p2 && d1 >= d2 })
    assert(!out.contains(0.4) && out.size == Dedup.SweepBars.size)
  }

  test("c51 real corpus: monotone curves, doc 4 never appears, bars complete") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = Dedup.c51DedupSweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Dedup.SweepBars)
    val ps = rows.map(_._2); val ds = rows.map(_._3)
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    // a doc can't be touched by more pairs than exist: n_docs ≤ 2·n_pairs
    rows.foreach { case (b, p, d) => assert(d <= 2 * p, s"bar $b: $d docs from $p pairs") }
  }

  // ---- c48: model-based quality classifier ----------------------------

  test("c48 hand-computed logistic score; signal disclosure matches the features") {
    import graft.operators.TextAnalysis._
    val docs = docsDF(Seq(
      (1L, "the cat ran", "en", "s"),        // fluent-ish: stopword + alpha
      (2L, "zz9 zz9 zz9 zz9", "en", "s")))   // repetitive, no stopwords, non-alpha
    val out = TextAnalysis.c48QualityClassifier(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def r4(v: Double) = round4(v)
    // doc 1: n=3, mwl=3.0, alpha=1.0, stop=1/3, distinct=1.0
    val z1 = QcWLogWords * r4(math.log10(3.0)) + QcWMeanLen * 3.0 + QcWAlpha * 1.0 +
      QcWStop * r4(1.0 / 3.0) + QcWDistinct * 1.0 + QcBias
    val s1 = r4(1.0 / (1.0 + math.exp(-z1)))
    val d1 = out(1L)
    assert(d1.getLong(1) == 3L && d1.getDouble(2) == 3.0 && d1.getDouble(3) == 1.0)
    assert(d1.getDouble(4) == r4(1.0 / 3.0) && d1.getDouble(5) == 1.0)
    assert(d1.getDouble(6) == s1, s"doc1 score ${d1.getDouble(6)} vs $s1")
    assert(d1.getLong(7) == (if (s1 >= QcThreshold) 1L else 0L))
    // doc 2: alpha=0 (digits), stop=0, distinct=1/4 — must score
    // BELOW doc 1 and be dropped while doc 1 is kept
    val d2 = out(2L)
    assert(d2.getDouble(3) == 0.0 && d2.getDouble(4) == 0.0)
    assert(d2.getDouble(6) < d1.getDouble(6), "garbage doc outscored fluent doc")
    assert(d1.getLong(7) == 1L && d2.getLong(7) == 0L,
      s"keep bits: fluent=${d1.getLong(7)} garbage=${d2.getLong(7)}")
  }

  // ---- c49: feature-hashing document vectors --------------------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("c49 hand-built vector, checksum, and bag-of-words invariance") {
    import graft.operators.TextAnalysis.FhDim
    val docs = docsDF(Seq(
      (1L, "x x y", "en", "s"),
      (2L, "y x x", "en", "s"),    // same bag, different order
      (3L, "x y z w", "en", "s")))
    val out = TextAnalysis.c49FeatureHash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = out.map(t => t._1 -> t).toMap
    // expected vector for {x:2, y:1} via the same md5 slices
    val v = Array.fill(FhDim)(0L)
    def add(term: String, tf: Long): Unit = {
      val hex = md5Hex(term)
      val j = (java.lang.Long.parseLong(hex.substring(0, 7), 16) % FhDim).toInt
      val sign = if (java.lang.Long.parseLong(hex.substring(7, 8), 16) % 2 == 0) 1L else -1L
      v(j) += sign * tf
    }
    add("x", 2L); add("y", 1L)
    val expMd5 = md5Hex(v.mkString(","))
    val expNnz = v.count(_ != 0L).toLong
    val expL1 = v.map(math.abs).sum
    assert(byDoc(1L) == ((1L, expNnz, expL1, expMd5)), s"doc1: ${byDoc(1L)}")
    // bag-of-words invariance: word order cannot change the vector
    assert(byDoc(2L)._4 == byDoc(1L)._4 && byDoc(2L)._2 == byDoc(1L)._2)
    // doc3 replicated the same way (collisions, if any, included)
    val v3 = Array.fill(FhDim)(0L)
    def add3(term: String): Unit = {
      val hex = md5Hex(term)
      val j = (java.lang.Long.parseLong(hex.substring(0, 7), 16) % FhDim).toInt
      v3(j) += (if (java.lang.Long.parseLong(hex.substring(7, 8), 16) % 2 == 0) 1L else -1L)
    }
    Seq("x", "y", "z", "w").foreach(add3)
    assert(byDoc(3L) == ((3L, v3.count(_ != 0L).toLong, v3.map(math.abs).sum,
      md5Hex(v3.mkString(",")))), s"doc3: ${byDoc(3L)}")
  }

  // ---- c46: bigram LM scoring -----------------------------------------

  test("c46 hand-computed add-1 conditional scores; order is the signal") {
    // corpus: two docs sharing a vocabulary, one in the common order,
    // one scrambled. Counts: 'a b' ×3 (doc1 ×2 + doc2 ×1) …
    val docs = docsDF(Seq(
      (1L, "a b a b", "en", "s"),   // bigrams: a b, b a, a b
      (2L, "b a b", "en", "s"),     // bigrams: b a, a b
      (3L, "a", "en", "s")))        // no bigram evidence — absent
    // corpus bigram counts: C(a b)=3, C(b a)=2; contexts: C(a·)=3,
    // C(b·)=2; V=2
    val pab = (3.0 + 1) / (3 + 2)
    val pba = (2.0 + 1) / (2 + 2)
    val exp1 = round4((2 * math.log10(pab) + 1 * math.log10(pba)) / 3)
    val exp2 = round4((math.log10(pba) + math.log10(pab)) / 2)
    val out = TextAnalysis.c46BigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L), "doc 3 has no bigram evidence")
    assert(out(1L) == ((3L, exp1)), s"doc1: ${out(1L)} vs $exp1")
    assert(out(2L) == ((2L, exp2)), s"doc2: ${out(2L)} vs $exp2")
  }

  test("c46 ranks frequent-order text above rare-order text at equal unigram mass") {
    // both docs use each word the same number of times — a unigram
    // model (c31) cannot separate them; the bigram model must: doc 20
    // repeats the corpus-dominant transition, doc 21 uses each
    // transition once
    val common = (1 to 6).map(_ => "x y").mkString(" ")   // 'x y' dominant
    val docs = docsDF(
      (1L to 8L).map(i => (i, common, "en", "s")) ++ Seq(
        (20L, "x y x y x y", "en", "s"),
        (21L, "y y x x y x", "en", "s")))
    val out = TextAnalysis.c46BigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(20L) > out(21L),
      s"order signal inverted: common ${out(20L)} vs scrambled ${out(21L)}")
  }
}

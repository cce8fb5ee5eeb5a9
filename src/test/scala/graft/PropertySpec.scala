package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage for the engine's algebraic invariants
  * (scalacheck generators driven with fixed seeds — the
  * scalatest-scalacheck bridge isn't on the classpath). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  private val edgeListGen: Gen[List[(Long, Long)]] =
    Gen.sized { n =>
      Gen.listOfN(math.min(n, 40), for {
        a <- Gen.choose(0L, 19L)
        b <- Gen.choose(0L, 19L)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    }

  test("union-find and distributed label propagation agree on random graphs") {
    import spark.implicits._
    for (edges <- samples(edgeListGen, 3) if edges.nonEmpty) {
      val pairs = edges.distinct.toDF("doc_a", "doc_b")
      val uf = operators.Dedup.testUnionFind(pairs).orderBy("doc_id").collect().toSeq
      val lp = operators.Dedup.testPropagate(pairs).orderBy("doc_id").collect().toSeq
      assert(uf == lp, s"mismatch for edges $edges")
    }
  }

  test("surrogateKey distinguishes null from the string sentinel position-wise") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), Option.empty[String]),
      (Option.empty[String], Option("a")),
      (Option("a"), Option("a"))
    ).toDF("x", "y")
      .select(functions.Keys.surrogateKey(col("x"), col("y")).as("k"))
    val keys = df.collect().map(_.getString(0))
    assert(keys.distinct.length == 3)
  }

  private val corpusGen: Gen[List[(Long, String, Int)]] =
    Gen.sized { _ =>
      for {
        nDocs <- Gen.choose(1, 120)
        docs <- Gen.listOfN(nDocs, for {
          id <- Gen.choose(0L, 100000L)
          src <- Gen.oneOf("s0", "s1", "s2", null) // null source is a legal group
          nTok <- Gen.oneOf(Gen.choose(0, 3), Gen.choose(1, 60)) // incl. empty docs
        } yield (id, src, nTok))
      } yield docs.distinctBy(_._1)
    }

  test("c30 bucketed admission equals the exact window on random corpora and budgets") {
    import spark.implicits._
    val budgetGen = Gen.oneOf(Gen.choose(1L, 30L), Gen.choose(1L, 3000L))
    for ((docs, i) <- samples(corpusGen, 5).zipWithIndex if docs.nonEmpty) {
      val df = docs.map { case (id, src, n) =>
        (id, src, (1 to n).map(j => s"w$j").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val budget = samples(budgetGen, i + 1).last
      val exact = operators.TextAnalysis
        .c30SourceMixture(df, Map.empty, budget).collect().toSeq
      val bucketed = operators.TextAnalysis
        .c30SourceMixtureBucketed(df, Map.empty, budget).collect().toSeq
      assert(exact == bucketed,
        s"divergence at budget=$budget corpus#$i (${docs.size} docs)")
    }
  }

  private val embCorpusGen: Gen[List[(Long, Array[Float])]] =
    Gen.sized { _ =>
      for {
        n <- Gen.choose(2, 80)
        rows <- Gen.listOfN(n, for {
          id <- Gen.choose(0L, 10000L)
          v <- Gen.listOfN(8, Gen.choose(-100, 100))
          // a zero vector has no cosine (NaN) — the contract, like
          // c5's, assumes real embeddings
          if v.exists(_ != 0)
        } yield (id, v.map(_ / 100.0f).toArray))
      } yield rows.distinctBy(_._1)
    }

  // reference machinery for the c32 fuzz: same LSH geometry (sign
  // bucket over the 8 dims, degenerate-bucket cap), cosine in
  // left-to-right double arithmetic with Spark's HALF_UP 4-decimal
  // rounding, plain union-find over the verified pairs
  private def embBucket(v: Array[Float]): Long =
    (0 until 8).map(d => if (v(d) >= 0) 1L << d else 0L).sum
  private def embDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { s += a(j).toDouble * b(j).toDouble; j += 1 }
    s
  }
  private def embCos4(a: Array[Float], b: Array[Float]): Double =
    BigDecimal.valueOf(embDot(a, b) / (math.sqrt(embDot(a, a)) * math.sqrt(embDot(b, b))))
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force SemDeDup at threshold `th`: (cluster, canonical,
    * n_members, reclaimable), the rows c32 must reproduce. */
  private def bruteClusters(rows: List[(Long, Array[Float])],
      th: Double): Seq[(Long, Long, Long, Long)] = {
    val pairs = embCorpusPairs(rows, embBucket, embCos4, th)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.groupBy(find).toSeq
      .map { case (root, ms) => (root, ms.min, ms.size.toLong, ms.size.toLong - 1) }
      .sortBy(_._1)
  }

  test("c32 equals a brute-force semantic-dedup reference on random corpora") {
    import spark.implicits._
    val th = operators.Similarity.SemDedupThreshold
    for ((rows, i) <- samples(embCorpusGen, 4).zipWithIndex if rows.size >= 2) {
      val got = operators.Similarity
        .c32SemanticClusters(rows.toDF("vec_id", "embedding"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val want = bruteClusters(rows, th)
      assert(got == want, s"corpus#$i (${rows.size} vectors)")
    }
  }

  test("c32 admission bar holds across thresholds, including the production ~0.95 regime") {
    import spark.implicits._
    // a corpus BUILT to discriminate thresholds: random bases plus
    // planted near-identical copies (cos ≈ 0.999+, the SemDeDup
    // "same semantic content, different wording" case) and planted
    // mid-similarity variants (cos ≈ 0.85–0.92) that a production
    // bar must REJECT and a loose bar must admit
    val rnd = new scala.util.Random(32)
    def vec(): Array[Float] = {
      val v = Array.fill(8)((rnd.nextInt(201) - 100) / 100.0f)
      if (v.forall(_ == 0f)) { v(0) = 0.5f }; v
    }
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, Array[Float])]
    var id = 0L
    for (_ <- 0 until 12) {
      val base = vec()
      rows += ((id, base)); id += 1
      // near-identical: uniform scale + one-permille nudge
      if (rnd.nextBoolean()) {
        val c = base.map(_ * 1.02f); c(3) = c(3) + 0.001f
        rows += ((id, c)); id += 1
      }
      // mid-similarity: blend toward an unrelated direction
      if (rnd.nextBoolean()) {
        val o = vec()
        val m = Array.tabulate(8)(d => (0.85f * base(d) + 0.35f * o(d)))
        if (m.forall(_ == 0f)) m(0) = 0.5f
        rows += ((id, m)); id += 1
      }
    }
    val corpus = rows.toList
    val df = corpus.toDF("vec_id", "embedding")
    val byTh = (for (th <- Seq(0.25, 0.7, 0.95, 0.99)) yield {
      val got = operators.Similarity
        .c32SemanticClusters(df, threshold = th)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == bruteClusters(corpus, th),
        s"c32 diverges from brute force at threshold $th")
      th -> got
    }).toMap
    // the sweep must actually discriminate: the loose bar admits
    // strictly more duplicate mass than the production bar, and the
    // production bar still catches the planted near-identical copies
    def dupMass(cl: Seq[(Long, Long, Long, Long)]): Long = cl.map(_._4).sum
    assert(dupMass(byTh(0.25)) > dupMass(byTh(0.95)),
      "loose and production thresholds admitted the same mass — sweep is vacuous")
    assert(dupMass(byTh(0.95)) > 0,
      "production threshold missed every planted near-identical copy")
  }

  private def embCorpusPairs(rows: List[(Long, Array[Float])],
      bucket: Array[Float] => Long, cos4: (Array[Float], Array[Float]) => Double,
      th: Double): Seq[(Long, Long)] =
    rows.groupBy(r => bucket(r._2)).valuesIterator
      .filter(_.size <= operators.Dedup.BucketCap)
      .flatMap { bs =>
        val sorted = bs.sortBy(_._1)
        for {
          x <- sorted; y <- sorted if x._1 < y._1
          if cos4(x._2, y._2) >= th
        } yield (x._1, y._1)
      }.toSeq

  test("safeDivide never throws and nulls on zero") {
    import spark.implicits._
    for (xs <- samples(Gen.listOfN(20, Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.const(0.0))), 2)) {
      val df = xs.toDF("x")
        .select(functions.Keys.safeDivide(lit(1.0), col("x")).as("d"), col("x"))
      df.collect().foreach { r =>
        if (r.getDouble(1) == 0.0) assert(r.isNullAt(0))
        else assert(!r.isNullAt(0))
      }
    }
  }
}

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

  test("c32 equals a brute-force semantic-dedup reference on random corpora") {
    import spark.implicits._
    val th = operators.Similarity.SemDedupThreshold
    for ((rows, i) <- samples(embCorpusGen, 4).zipWithIndex if rows.size >= 2) {
      val got = operators.Similarity
        .c32SemanticClusters(rows.toDF("vec_id", "embedding"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      // reference: same LSH geometry (sign bucket over the 8 dims,
      // degenerate-bucket cap), cosine in left-to-right double
      // arithmetic with Spark's HALF_UP 4-decimal rounding, plain
      // union-find over the verified pairs
      def bucket(v: Array[Float]): Long =
        (0 until 8).map(d => if (v(d) >= 0) 1L << d else 0L).sum
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var j = 0
        while (j < a.length) { s += a(j).toDouble * b(j).toDouble; j += 1 }
        s
      }
      def cos4(a: Array[Float], b: Array[Float]): Double =
        BigDecimal.valueOf(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      val pairs = embCorpusPairs(rows, bucket, cos4, th)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.groupBy(find).toSeq
        .map { case (root, ms) => (root, ms.min, ms.size.toLong, ms.size.toLong - 1) }
        .sortBy(_._1)
      assert(got == want, s"corpus#$i (${rows.size} vectors, ${pairs.size} pairs)")
    }
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

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

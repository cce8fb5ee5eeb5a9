package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Round-10 contracts: token entropy matches hand-computed H with
  * the single-term degenerate pinned, the cross-source matrix puts
  * every planted pair in its canonical cell, label consistency is
  * perfect on separable planted clusters and degrades exactly where
  * a mislabeled vector sits, and PQ recall equals an independent
  * recomputation from the two underlying operators' own outputs. */
class Round10Spec extends AnyFunSuite {
  import TestSpark._

  private def docsDF(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  private def round4(v: Double): Double =
    BigDecimal.valueOf(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- c52: token entropy ---------------------------------------------

  test("c52 hand-computed entropy; single-term doc has zero H and no ratio") {
    val docs = docsDF(Seq(
      (1L, "a a a a", "en", "s"),     // H = 0, ratio undefined
      (2L, "a b c d", "en", "s"),     // H = 2, ratio 1
      (3L, "a a b b", "en", "s"),     // H = 1, ratio 1
      (4L, "a a a b", "en", "s"),     // H = 2 - (3·log2 3)/4
      // n=10 single-vocab: raw binary64 H is a NEGATIVE ~1e-16
      // residual that Spark rounds to +0.0 and DuckDB to -0.0 —
      // the vocab=1 pin makes both emit literal 0.0
      (5L, Seq.fill(10)("a").mkString(" "), "en", "s")))
    val out = TextAnalysis.c52TokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(out(1L)._3 == 0.0 && out(1L)._4.isNaN, s"degenerate: ${out(1L)}")
    assert(out(5L)._3 == 0.0 && (1.0 / out(5L)._3) > 0, // +0.0, not -0.0
      s"n=10 degenerate must pin to +0.0: ${out(5L)}")
    assert(out(2L) == ((4L, 4L, 2.0, 1.0)), s"uniform-4: ${out(2L)}")
    assert(out(3L) == ((4L, 2L, 1.0, 1.0)), s"uniform-2: ${out(3L)}")
    val h4 = round4(2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0)
    assert(out(4L)._3 == h4 && out(4L)._4 == round4(h4 / 1.0), s"skewed: ${out(4L)} vs $h4")
    // skew lowers the ratio below the uniform doc at equal vocab
    assert(out(4L)._3 < out(2L)._3)
  }

  // ---- c53: cross-source duplication matrix ---------------------------

  test("c53 planted pairs land in canonical source cells; clean source absent") {
    val words = (1 to 11).map(i => s"w$i")
    val t = words.mkString(" ")
    val near = (words.dropRight(1) :+ "CHANGED").mkString(" ")  // jac 0.8 vs t
    val docs = docsDF(Seq(
      (1L, t, "en", "srcX"),     // X-internal twin with 2
      (2L, t, "en", "srcX"),
      (3L, near, "en", "srcY"),  // straddles X↔Y vs 1 AND 2
      (4L, (1 to 11).map(i => s"z$i").mkString(" "), "en", "srcZ")))  // clean
    val out = Dedup.c53CrossSourceDup(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("srcX", "srcX")) == ((1L, 2L)), s"diagonal: $out")
    assert(out(("srcX", "srcY")) == ((2L, 3L)), s"off-diagonal: $out")
    assert(out.size == 2, s"clean source leaked into the matrix: $out")
  }

  test("c51 equals a brute-force threshold sweep on random small corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](gen: Gen[A], n: Int): Seq[A] =
      (1 to n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(30), Seed(100 + i.toLong)))
    // tiny vocab makes trigram overlap common; ≤25 docs keeps every
    // df far below the cap, so the capped operator and the uncapped
    // brute reference see identical evidence
    val corpus = for {
      n <- Gen.choose(2, 25)
      docs <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 999L)
        len <- Gen.choose(0, 12)
        ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield (id, ws.mkString(" ")))
    } yield docs.distinctBy(_._1)
    for ((docs, i) <- samples(corpus, 4).zipWithIndex if docs.nonEmpty) {
      val df = docsDF(docs.map { case (id, t) => (id, t, "en", "s") })
      val got = Dedup.c51DedupSweep(df).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
      def tri(t: String): Set[String] = {
        val w = t.split(" ", -1)
        if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> tri(t) }.filter(_._2.nonEmpty)
      val jacs = for {
        (a, sa) <- sets
        (b, sb) <- sets if a < b
        inter = (sa & sb).size if inter > 0
        j = round4(inter.toDouble / (sa.size + sb.size - inter))
        if j >= Dedup.SweepBars.min
      } yield (a, b, j)
      val want = Dedup.SweepBars.map { bar =>
        val sel = jacs.filter(_._3 >= bar)
        (bar, sel.size.toLong, sel.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
      }
      assert(got == want, s"corpus#$i (${docs.size} docs): got ${got.toList} want $want")
    }
  }

  // ---- c54: neighborhood label consistency ----------------------------

  test("c54 separable planted clusters are perfectly consistent; a mislabel degrades its label only") {
    import spark.implicits._
    val dim = 16
    // group A: all-positive near-identical; group B: all-negative —
    // disjoint sign buckets, so no cross edges at 1 table
    val a = (0L to 3L).map(i => (i, Array.tabulate(dim)(d => 1.0f + 0.01f * (i + d)), "A"))
    val b = (4L to 7L).map(i => (i, Array.tabulate(dim)(d => -1.0f - 0.01f * (i + d).toFloat), "B"))
    val clean = Similarity.c54LabelConsistency((a ++ b).toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(clean("A") == ((4L, 1.0)) && clean("B") == ((4L, 1.0)), s"clean: $clean")
    // plant one mislabeled vector inside A's cluster: ITS consistency
    // is 0 (all neighbors are A), and every A member now sees one
    // wrong-label neighbor — B's mean drops to the planted vec's 0,
    // A's mean reflects exactly one bad neighbor per list
    val mis = Seq((8L, Array.tabulate(dim)(d => 1.0f + 0.01f * (8 + d).toFloat), "B"))
    val dirty = Similarity.c54LabelConsistency((a ++ b ++ mis).toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(dirty("A")._2 < 1.0 && dirty("A")._2 > 0.5, s"A after mislabel: $dirty")
    assert(dirty("B")._1 == 5L && dirty("B")._2 < 1.0, s"B after mislabel: $dirty")
  }

  // ---- c55: PQ recall -------------------------------------------------

  test("c55 equals an independent recall recomputation from c6 and c47 outputs") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val k = Similarity.PqTopK
    val approx = Similarity.c47PqAdc(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val exact = Similarity.c6AnnTopK(emb, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = approx.groupBy(_._1).map { case (q, rows) =>
      val hits = rows.count(exact.contains)
      q -> ((hits.toLong, round4(hits.toDouble / k)))
    }
    val got = Similarity.c55PqRecall(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want, s"recall diverged: got ${got.size} rows")
    assert(got.values.forall { case (h, rec) => h >= 0 && h <= k && rec >= 0.0 && rec <= 1.0 })
    assert(got.keySet.size == Similarity.DefaultQueryCount)
  }
}

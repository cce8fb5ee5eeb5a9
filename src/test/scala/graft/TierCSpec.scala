package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tier C (LLM-data-pipeline operators) invariants at sf0.001. */
class TierCSpec extends AnyFunSuite {
  import TestSpark._

  test("all tier C queries return rows and have oracles") {
    for (name <- SparkEntry.queries.keys.filter(_.startsWith("c"))) {
      assert(SparkEntry.oracleSql.contains(name), s"$name missing oracle")
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("c1 exact dedup covers every document exactly once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("c1_dedup_exact")(spark, sf)
    assert(out.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("c2/c3 jaccard and c5 cosine scores are in range") {
    val j2 = SparkEntry.queries("c2_dedup_ngram")(spark, sf)
    assert(j2.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    val j3 = SparkEntry.queries("c3_dedup_minhash")(spark, sf)
    assert(j3.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    val c5 = SparkEntry.queries("c5_embed_neardup")(spark, sf)
    assert(c5.filter(col("cos") < -1.0001 || col("cos") > 1.0001).count() == 0)
  }

  test("c4 simhash banding finds all pairs with hamming <= 3 (pigeonhole)") {
    // brute-force check at sf0.001: every close pair must be a candidate
    val sh = operators.Dedup.simhash(spark.read.parquet(s"$sf/documents.parquet"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
    val cand = SparkEntry.queries("c4_dedup_simhash")(spark, sf)
    val missed = brute.join(cand, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0, "banding missed a close pair")
  }

  test("c6 returns exactly k ranked neighbors per query") {
    val out = SparkEntry.queries("c6_ann_topk")(spark, sf)
    val perQ = out.groupBy("q_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 10))
    assert(out.filter(col("rank") < 1 || col("rank") > 10).count() == 0)
  }

  test("c7 IVF searches only within the query's cluster") {
    val out = SparkEntry.queries("c7_ann_ivf")(spark, sf)
    assert(out.select("cluster").distinct().count() > 0)
    assert(out.filter(col("vec_id") === col("q_id")).count() == 0)
  }

  test("c12 clusters put every qualifying pair in the same component") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.minhashCandidatePairs(docs).filter(col("jaccard") >= 0.5)
    val clusters = SparkEntry.queries("c12_dup_clusters")(spark, sf)
      .select(col("doc_id"), col("cluster"))
    val broken = pairs
      .join(clusters.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("cluster", "ca"), Seq("doc_a"))
      .join(clusters.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("cluster", "cb"), Seq("doc_b"))
      .filter(col("ca") =!= col("cb"))
    assert(broken.count() == 0, "edge endpoints in different clusters")
  }

  test("c11 fingerprints are stable across recomputation") {
    val x = SparkEntry.queries("c11_fingerprint")(spark, sf).collect()
    val y = SparkEntry.queries("c11_fingerprint")(spark, sf).collect()
    assert(x.sameElements(y))
  }
}

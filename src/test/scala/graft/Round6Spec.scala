package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Materialize, Sampling, Similarity}

/** Round-6 contracts: conf-driven shard resolution wired into the
  * c22/c28 call sites, concurrent multi-frame materialization (the a9
  * profile fix), and the c32 semantic-dedup cluster report. */
class Round6Spec extends AnyFunSuite {
  import TestSpark._

  // ---- graft.shards resolution ----------------------------------------

  test("resolveShards: default is the pinned constant, auto scales with the cluster") {
    // unset conf → the oracle-contract constant, independent of the
    // session's parallelism
    assert(Sampling.resolveShards(spark, Sampling.PackShards) == Sampling.PackShards)
    assert(Sampling.resolveShards(spark, Sampling.ShuffleShards) == Sampling.ShuffleShards)
    withConf(Sampling.ShardsConfKey -> "default") {
      assert(Sampling.resolveShards(spark, Sampling.PackShards) == Sampling.PackShards)
    }
    // auto: perCore × defaultParallelism, floored at the pinned
    // constant — on this local[4] session that is max(pinned, 8)
    val p = spark.sparkContext.defaultParallelism
    withConf(Sampling.ShardsConfKey -> "auto") {
      assert(Sampling.resolveShards(spark, Sampling.PackShards) ==
        math.max(Sampling.PackShards, 2 * p))
      assert(Sampling.resolveShards(spark, 2) == math.max(2, 2 * p))
    }
    withConf(Sampling.ShardsConfKey -> "24") {
      assert(Sampling.resolveShards(spark, Sampling.PackShards) == 24)
    }
    withConf(Sampling.ShardsConfKey -> "0") {
      intercept[IllegalArgumentException] {
        Sampling.resolveShards(spark, Sampling.PackShards)
      }
    }
    withConf(Sampling.ShardsConfKey -> "lots") {
      intercept[IllegalArgumentException] {
        Sampling.resolveShards(spark, Sampling.PackShards)
      }
    }
  }

  test("keyed c22/c28 rows are invariant to execution parallelism under the default contract") {
    val docs = graft.sources.Tables.documents(spark, sf)
    def run(): (Set[String], Set[String]) = {
      val pack = SparkEntry.queries("c22_seq_pack")(spark, sf)
        .collect().map(_.mkString("|")).toSet
      val shuf = SparkEntry.queries("c28_epoch_shuffle")(spark, sf)
        .collect().map(_.mkString("|")).toSet
      (pack, shuf)
    }
    val base = run()
    // a different shuffle-partition count and a repartitioned input
    // are EXECUTION changes; the shard layout is data-defined, so the
    // rows must not move
    withConf("spark.sql.shuffle.partitions" -> "7") {
      assert(run() == base, "c22/c28 rows changed under a different shuffle-partition count")
    }
    val repart = Sampling.c22SequencePack(docs.repartition(13),
      shards = Sampling.resolveShards(spark, Sampling.PackShards))
      .collect().map(_.mkString("|")).toSet
    assert(repart == base._1, "c22 rows changed under a repartitioned input")
  }

  test("a non-default shard count still conserves every doc and token (deployment mode)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val totTok = docs.select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    withConf(Sampling.ShardsConfKey -> "48") {
      val pack = SparkEntry.queries("c22_seq_pack")(spark, sf)
      val agg = pack.agg(sum("n_docs"), sum("sum_tok"), max("shard")).head()
      assert(agg.getLong(0) == nDocs, "c22@48 lost or duplicated docs")
      assert(agg.getLong(1) == totTok, "c22@48 lost or duplicated tokens")
      assert(agg.getLong(2) < 48)
      val shuf = SparkEntry.queries("c28_epoch_shuffle")(spark, sf)
      assert(shuf.count() == nDocs)
      assert(shuf.select("shard", "pos").distinct().count() == nDocs,
        "c28@48 (shard,pos) is not a permutation")
      assert(shuf.agg(max("shard")).head().getLong(0) < 48)
    }
  }

  // ---- Materialize.frames ---------------------------------------------

  test("Materialize.frames equals per-frame materialization on every strategy") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val b = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    val Seq(ma, mb) = Materialize.frames(Seq(a, b))
    assert(ma.collect().toSet == Materialize.frame(a).collect().toSet)
    assert(mb.collect().toSet == Materialize.frame(b).collect().toSet)
    assert(Materialize.frames(Seq.empty) == Seq.empty)
    // the concurrent actions run the conf'd strategy too — same rows
    // through the durable path (two frames so the pool engages)
    val scratch = java.nio.file.Files.createTempDirectory("graft-mats-").toString
    withConf("graft.materialize" -> s"scratch:$scratch") {
      val Seq(sa, sb) = Materialize.frames(Seq(a, b))
      assert(sa.collect().toSet == ma.collect().toSet)
      assert(sb.collect().toSet == mb.collect().toSet)
    }
  }

  // ---- c32 semantic dedup clusters ------------------------------------

  test("c32 collapses planted embedding clusters to canonical-min reports") {
    import spark.implicits._
    def vec(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat)
    val e = 0.01
    val rows = Seq(
      // cluster {10,11,12}: same all-positive direction (bucket 255)
      10L -> vec(1, 1, 1, 1, 1, 1, 1, 1),
      11L -> vec(2, 2, 2, 2, 2, 2, 2, 2),
      12L -> vec(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5),
      // cluster {20,21}: same all-negative direction (bucket 0)
      20L -> vec(-1, -1, -1, -1, -1, -1, -1, -1),
      21L -> vec(-3, -3, -3, -3, -3, -3, -3, -3),
      // same bucket (253), nearly orthogonal — candidates but NOT a
      // verified pair: must stay singletons, absent from the report
      40L -> vec(1, -1, e, e, e, e, e, e),
      41L -> vec(e, -e, 1, e, e, e, e, e))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Similarity.c32SemanticClusters(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((10L, 10L, 3L, 2L), (20L, 20L, 2L, 1L)), s"got $got")
  }

  test("c32 on real data: clusters are transitively closed over the verified pairs") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val clusters = Similarity.c32SemanticClusters(emb)
    val pairs = Similarity.c5Candidates(emb, Similarity.DefaultSignBits, 1)
      .select(col("vec_a"), col("vec_b"),
        round(graft.functions.VectorFns.dot(col("emb_a"), col("emb_b"))
          / (col("nrm_a") * col("nrm_b")), 4).as("cos"))
      .filter(col("cos") >= Similarity.SemDedupThreshold)
      .select("vec_a", "vec_b")
    val labels = Dedup.labelComponents(pairs)
    // closure: both endpoints of every verified pair share a cluster
    val mismatched = pairs
      .join(labels.withColumnRenamed("doc_id", "vec_a").withColumnRenamed("label", "la"), Seq("vec_a"))
      .join(labels.withColumnRenamed("doc_id", "vec_b").withColumnRenamed("label", "lb"), Seq("vec_b"))
      .filter(col("la") =!= col("lb")).count()
    assert(mismatched == 0, s"$mismatched verified pairs split across clusters")
    // every labeled endpoint appears in exactly one reported cluster,
    // and the report's member counts add up to the endpoint count
    val nEndpoints = labels.select("doc_id").distinct().count()
    val sums = clusters.agg(sum("n_members"), sum("reclaimable"), count(lit(1))).head()
    assert(sums.getLong(0) == nEndpoints,
      "cluster member counts don't cover the pair-graph endpoints")
    assert(sums.getLong(1) == nEndpoints - sums.getLong(2),
      "reclaimable must be members minus one canonical per cluster")
    // canonical == cluster label == min member, per construction on
    // BOTH labeler paths (PropertySpec's equivalence): spot-assert here
    assert(clusters.filter(col("canonical") =!= col("cluster")).count() == 0)
    // determinism
    val again = Similarity.c32SemanticClusters(emb).collect().toSeq
    assert(clusters.collect().toSeq == again)
  }
}

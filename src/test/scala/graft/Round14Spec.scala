package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Round-14 contracts: the persisted trained index (c79) and the
  * trained recall grid over the clustered derivation (c80). */
class Round14Spec extends AnyFunSuite {
  import TestSpark._

  test("c79 stored-index serving equals the per-invocation c71 compose row-for-row") {
    // the whole point of the artifact store: train once, persist,
    // serve from the STORED index — and lose nothing. Same corpus,
    // same training contract, so every (q_id, rank, vec_id, adist)
    // row must match the in-memory compose exactly.
    val live = Similarity.c71IvfPqTrained(
      graft.sources.Tables.embeddings(spark, sf)).collect()
    val stored = Similarity.c79StoredIndexServe(spark, sf).collect()
    assert(stored.length == live.length,
      s"stored ${stored.length} rows vs live ${live.length}")
    assert(stored.sameElements(live), "stored-index serving diverged from c71")
  }

  test("c79 artifacts have the index shape: dense centroids, full codebook, whole corpus coded") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    Similarity.c79StoredIndexServe(spark, sf).count() // ensure built
    val root = System.getProperty("java.io.tmpdir")
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("graft_store_c79_index_") &&
        f.getName.contains(spark.sparkContext.applicationId))
    assert(dirs.length == 1, s"expected one c79 artifact root, got ${dirs.length}")
    val idx = dirs.head.getPath
    val cent = spark.read.parquet(s"$idx/centroids").collect()
    assert(cent.map(_.getLong(0)).sorted.toSeq ==
      (0L until Similarity.DefaultCentroidCount).toSeq, "centroid ids not dense")
    val books = spark.read.parquet(s"$idx/codebooks")
    assert(books.count() == Similarity.PqSubspaces.toLong * Similarity.PqCodebookK,
      "codebook cell count")
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() == emb.count(), "every corpus vector must be coded")
    // every code is a valid codebook row; every cluster a real centroid
    val bad = codes.filter(exists(col("codes"),
        c => c < 0 || c >= Similarity.PqCodebookK) ||
      col("cluster") < 0 || col("cluster") >= Similarity.DefaultCentroidCount)
    assert(bad.count() == 0L, "out-of-range code or cluster in the artifact store")
  }

  test("c81 append encodes the delta under BASE-trained artifacts, whole corpus coded") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    Similarity.c81IndexAppendServe(spark, sf).count() // ensure built
    val root = System.getProperty("java.io.tmpdir")
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("graft_store_c81_index_") &&
        f.getName.contains(spark.sparkContext.applicationId))
    assert(dirs.length == 1, s"expected one c81 artifact root, got ${dirs.length}")
    val idx = dirs.head.getPath
    // every vector coded exactly once — base from the build, delta
    // from the append — and the delta really is in the codes store
    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() == emb.count(), "append must complete the corpus")
    assert(codes.select("vec_id").distinct().count() == emb.count(), "duplicate codes")
    val nDelta = codes.filter(!Similarity.isBaseVec(col("vec_id"))).count()
    assert(nDelta == emb.filter(!Similarity.isBaseVec(col("vec_id"))).count()
      && nDelta > 0, s"delta rows in store: $nDelta")
    // the stored centroids are the BASE corpus's training output —
    // proof no retrain happened when the delta arrived
    val base = emb.filter(Similarity.isBaseVec(col("vec_id")))
    val want = Similarity.trainCentroidsQuantized(base)
      .select(col("c_id"), col("c_emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val stored = spark.read.parquet(s"$idx/centroids")
      .select(col("c_id"), col("c_emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(stored == want, "stored centroids are not the base-corpus training output")
  }

  test("c81 serves appended vectors: a planted delta twin surfaces as its query's top hit") {
    import spark.implicits._
    // 16 one-hot-block centers (ids 0–15 = seeds AND queries, all
    // base); ONE delta vector (id 100: every-5th ≥ the boundary) just
    // off center 5. Cluster 5 has no other member, so if the append
    // path serves at all, query 5's rank-1 must be the delta vector.
    def vec(j: Int, eps: Float): Array[Float] =
      Array.tabulate(64)(i => (if (i / 4 == j) 8.0f else 0.0f) +
        (if (i == 20) eps else 0.0f))
    val rows = (0 until 16).map(j => (j.toLong, vec(j, 0.0f), "x")) :+
      ((100L, vec(5, 0.1f), "x"))
    val dir = java.nio.file.Files.createTempDirectory("graft-c81-").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.c81IndexAppendServe(spark, dir, nQueries = 16).collect()
    val top5 = out.filter(r => r.getLong(0) == 5L && r.getLong(1) == 1L)
    assert(top5.length == 1, "query 5 has no rank-1 row")
    assert(top5.head.getLong(2) == 100L,
      s"query 5's top hit is ${top5.head.getLong(2)}, not the appended twin")
  }

  test("c82 churn: touched-only maintenance equals a full re-encode of the live corpus") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    Similarity.c82IndexChurnServe(spark, sf).count() // ensure built
    val root = System.getProperty("java.io.tmpdir")
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("graft_store_c82_index_") &&
        f.getName.contains(spark.sparkContext.applicationId))
    assert(dirs.length == 1, s"expected one c82 artifact root, got ${dirs.length}")
    val idx = dirs.head.getPath
    val live = Similarity.churnedCorpus(emb)
    val v1 = spark.read.parquet(s"$idx/codes")
    val v2 = spark.read.parquet(s"$idx/codes_v2")
    // tombstones really removed, row count tracks the live corpus
    assert(v2.count() == live.count(), "v2 row count != live corpus")
    assert(v2.filter(Similarity.isDroppedVec(col("vec_id"))).count() == 0L,
      "dropped vectors still in v2")
    // untouched rows carried over EXACTLY (no silent re-encode)
    val untouchedDrift = v2
      .filter(!Similarity.isDroppedVec(col("vec_id")) &&
        !Similarity.isUpdatedVec(col("vec_id")))
      .exceptAll(v1.filter(!Similarity.isDroppedVec(col("vec_id")) &&
        !Similarity.isUpdatedVec(col("vec_id"))))
    assert(untouchedDrift.count() == 0L, "untouched codes drifted across the churn")
    // updated rows really changed cluster-or-codes where the content
    // moved them (the churn map rescales toward 0.25·1s — at least
    // one vector must re-encode differently, else the plant is dead)
    val changed = v2.join(v1.withColumnRenamed("cluster", "cl1")
        .withColumnRenamed("codes", "co1"), Seq("vec_id"))
      .filter(Similarity.isUpdatedVec(col("vec_id")))
      .filter(col("cluster") =!= col("cl1") || col("codes") =!= col("co1"))
    assert(changed.count() > 0L, "no updated vector re-encoded differently")
  }

  test("c83 stored tokenizer equals the in-session learned-list encode row-for-row") {
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, sf)
    val live = TextAnalysis.c76BpeTrainedEncode(docs).collect()
    val stored = TextAnalysis.c83StoredTokenizer(spark, sf).collect()
    assert(stored.length == live.length)
    assert(stored.sameElements(live), "stored-tokenizer encode diverged from c76")
    // the artifact is the rank-ordered merge list, dense from 1
    val root = System.getProperty("java.io.tmpdir")
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("graft_store_c83_tokenizer_") &&
        f.getName.contains(spark.sparkContext.applicationId))
    assert(dirs.length == 1)
    val ranks = spark.read.parquet(s"${dirs.head.getPath}/merges")
      .select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.headOption.contains(1) && ranks.toSeq == (1 to ranks.length),
      s"merge ranks not dense from 1: ${ranks.mkString(",")}")
  }

  test("c80 trained grid on the clustered derivation: grid contract, monotone nprobe") {
    // structural asserts only — the trained-residual-vs-trained-plain
    // ORDERING on a driver-scaled corpus is a measurement, reported
    // not asserted (the r9 c78 lesson, applied before shipping).
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val cells = Similarity.c80ClusteredTrainedGrid(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(cells.keySet == (for {
      np <- Similarity.RecallNprobes; mb <- Similarity.RecallMBudgets
    } yield (np, mb)).toSet, s"grid keys: ${cells.keySet}")
    val nQs = cells.values.map(_._1).toSet
    assert(nQs.size == 1, s"cells price different query counts: $nQs")
    assert(cells.values.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    // recall is monotone in nprobe at full code budget (prefix
    // property of the probe ranking — structural, scale-free)
    val byNp = Similarity.RecallNprobes.map(np =>
      cells((np, Similarity.PqSubspaces))._2)
    assert(byNp.zip(byNp.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"not monotone in nprobe: $byNp")
    info(s"c80 cells: ${cells.toSeq.sortBy(_._1).mkString(", ")}")
  }
}

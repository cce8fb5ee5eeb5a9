package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Embedding similarity operators (SURVEY §2: c5–c7).
  *
  * Scale stance: the query/centroid sides are broadcast (bounded);
  * the corpus side streams through — no n×n shuffle anywhere except
  * the sign-bucket join whose fan-out is bucket-bounded. Norms are
  * computed ONCE per vector and carried as a column, so each pair
  * costs a single dot-product fold; cosine = dot/(nrm_a*nrm_b) is
  * bit-identical to the inline sqrt(dot(a,a)) spelling the oracle
  * uses, because sqrt and multiply are IEEE-deterministic.
  */
object Similarity {

  /** Deterministic bounded query sample: every 100th vector. */
  private def queriesOf(emb: DataFrame): DataFrame =
    withNorm(emb).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))

  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", VectorFns.norm(col("embedding")))

  private def pairCos(aEmb: String, aNrm: String, bEmb: String, bNrm: String) =
    round(VectorFns.dot(col(aEmb), col(bEmb)) / (col(aNrm) * col(bNrm)), 4)

  /** c5: embedding-cosine near-dup pairs via sign-pattern LSH over the
    * first 8 dims (256 buckets) — candidates share a bucket, cosine
    * verified on candidates only, top-50 emitted. */
  def c5EmbedNearDup(emb: DataFrame): DataFrame = {
    val b = withNorm(emb).select(col("vec_id"), col("embedding"), col("nrm"),
      VectorFns.signBucket(col("embedding"), 8).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        pairCos("a.embedding", "a.nrm", "b.embedding", "b.nrm").as("cos"))
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  /** c6: brute-force cosine top-k — the exact ANN baseline. Queries
    * are broadcast against the corpus scan; ranking is per-query via
    * window. At 100 TB the corpus side stays a single pass. */
  def c6AnnTopK(emb: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = withNorm(emb).crossJoin(broadcast(queriesOf(emb)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        pairCos("q_emb", "q_nrm", "embedding", "nrm").as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** c7: IVF-style ANN. Coarse centroids here are the first 16
    * vectors — a deterministic stand-in for a k-means training step
    * (training is an offline job; the serving-path structure is what
    * matters): broadcast centroids → one-pass cluster assignment →
    * per-query search restricted to the query's cluster (nprobe=1).
    * Scan cost drops from |corpus| to |cluster| per query. The
    * assignment feeds both the corpus and query sides, so it is
    * persisted rather than recomputed per branch. */
  def c7AnnIvf(emb: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = withNorm(emb).filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("c_cos").desc, col("c_id"))
    val assigned = withNorm(emb).crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"),
        pairCos("embedding", "nrm", "c_emb", "c_nrm").as("c_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id").as("cluster"))
      .localCheckpoint()
    val q = assigned.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cluster"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(q), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cluster"),
        pairCos("q_emb", "q_nrm", "embedding", "nrm").as("cos"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }
}

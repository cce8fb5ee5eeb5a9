package graft

import org.apache.spark.sql.functions._

/** Dev tool (optimization receipts): bisect the per-row cost of the
  * similarity tier's scoring stage. Times variants of the c6 brute
  * cross-join over the real embeddings at the bench SF. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    import graft.operators.Similarity
    import graft.functions.VectorFns
    val emb = graft.sources.Tables.documents(spark, dir).sparkSession
      .read.parquet(s"$dir/embeddings.parquet")
    println(s"[micro] emb schema: ${emb.schema.simpleString}")
    val corpus = emb.repartition(32).localCheckpoint()
    val q = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[micro] $name: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val joined = corpus.crossJoin(broadcast(q))
    time("baseline: count pairs only")(joined.select(col("vec_id"), col("q_id")))
    time("dot only (graft_dot)")(joined.select(
      VectorFns.dot(col("q_emb"), col("embedding")).as("d")))
    time("dot + round")(joined.select(
      round(VectorFns.dot(col("q_emb"), col("embedding")), 4).as("d")))
    val corpusD = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding")).localCheckpoint()
    val qD = q.select(col("q_id"), col("q_emb").cast("array<double>").as("q_emb"))
      .localCheckpoint()
    time("pre-cast dot (no per-row cast)")(corpusD.crossJoin(broadcast(qD)).select(
      VectorFns.dot(col("q_emb"), col("embedding")).as("d")))
    val wn = Similarity.withNorm(corpus)
    val qn = wn.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    time("full pairCos stage (withNorm + cos)")(
      wn.crossJoin(broadcast(qn)).select(
        Similarity.pairCos("q_emb", "q_nrm", "embedding", "nrm").as("cos")))
    spark.stop()
  }
}

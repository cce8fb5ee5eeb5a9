package graft.operators

import org.apache.spark.sql.DataFrame

/** Strategy switch for materializing corpus-grain intermediates (the
  * staged tf frames of c17/c31, a9's staging+marts, CorpusPrep's
  * shingle/bigram kernels, c30's scored frame).
  *
  * `localCheckpoint` is the right default for a single-JVM session
  * (Verify/Bench/local notebooks): blocks land in executor
  * MEMORY_AND_DISK storage with no durable write. But it CUTS lineage
  * while pinning blocks to executors — on a real cluster, losing one
  * executor mid-job kills the query unrecoverably. At 100 TB these
  * intermediates belong on durable storage, so the strategy is a
  * session conf, not code:
  *
  *   spark.conf.set("graft.materialize", "local")            // default
  *   spark.conf.set("graft.materialize", "reliable")         // rdd checkpoint
  *   spark.conf.set("graft.materialize", "scratch:/durable/tmp")
  *
  * `reliable` uses Spark's reliable `checkpoint()` (requires
  * `sparkContext.setCheckpointDir` on a durable FS); `scratch:<root>`
  * round-trips through parquet under `<root>` — the spelling that
  * also survives driver restarts and lets a second job reuse the
  * frame. Cluster deployments should set `reliable` or `scratch:`
  * (docs/DEPLOY.md); results are strategy-independent — spec-asserted
  * by Round5Spec ("materialize strategies agree").
  *
  * NOT routed through here: the streaming upsert sink's micro-batch
  * checkpoint (partitioning preservation is load-bearing there, and a
  * failed micro-batch is simply replayed) and the k-row k-means
  * centroid frames (bounded, rebuilt per iteration).
  */
object Materialize {

  private val ConfKey = "graft.materialize"

  /** Materialize `df` per the session's `graft.materialize` conf and
    * return the re-readable frame. */
  def frame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ConfKey, "local") match {
      case "local"    => df.localCheckpoint()
      case "reliable" => df.checkpoint()
      case s if s.startsWith("scratch:") =>
        val root = s.stripPrefix("scratch:")
        require(root.nonEmpty, s"$ConfKey=scratch: needs a root path")
        // one dir per materialization, keyed by application so two
        // drivers sharing a scratch root never collide; callers own
        // cleanup of the root (it is scratch by contract)
        val path = s"$root/graft_mat_${spark.sparkContext.applicationId}_" +
          java.util.UUID.randomUUID().toString
        df.write.mode("error").parquet(path)
        // bound the scratch footprint to the JVM's lifetime: each
        // materialization registers its own dir for exit cleanup, so
        // only a crash leaves anything for the caller's root sweep
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).deleteOnExit(p)
        spark.read.parquet(path)
      case other => throw new IllegalArgumentException(
        s"$ConfKey='$other' — expected local | reliable | scratch:<root>")
    }
  }

  /** Materialize SEVERAL independent frames as one unit. Under the
    * `local` strategy each frame is lazily checkpoint-marked and a
    * single trigger job computes them all — their stages schedule
    * concurrently inside one job instead of running one eager
    * checkpoint job per frame, so N materializations pay ONE
    * job-scheduling floor rather than N (the a9 profile fix: 4 mart
    * checkpoints were 4 sequential jobs). `reliable` and `scratch:`
    * fall back to per-frame [[frame]] — both are a durable write per
    * frame by nature, and correctness is identical (Round5Spec's
    * strategy-equality contract covers [[frame]]; Round6Spec asserts
    * frames == frame row-for-row under `local`). */
  def frames(dfs: Seq[DataFrame]): Seq[DataFrame] =
    if (dfs.isEmpty) Seq.empty
    else {
      val spark = dfs.head.sparkSession
      spark.conf.get(ConfKey, "local") match {
        case "local" =>
          val marked = dfs.map(_.localCheckpoint(eager = false))
          // one job over a count-shaped union: every leg's partitions
          // are computed (committing its lazy checkpoint as a side
          // effect) and nothing but the 1-per-row literal is moved
          marked.map(_.select(org.apache.spark.sql.functions.lit(1L).as("one")))
            .reduce(_ union _)
            .count()
          marked
        case _ => dfs.map(frame)
      }
    }
}

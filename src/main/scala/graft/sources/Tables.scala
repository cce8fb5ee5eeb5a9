package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Parquet scans are left unprojected here on purpose: callers select
  * the columns they need and Catalyst pushes pruning + predicates into
  * the scan (verify with `.explain` → `ReadSchema`/`PushedFilters`).
  */
object Tables {
  // Memoized per (session, path): `spark.read.parquet` re-lists the
  // directory and re-reads footers for schema on EVERY call, which is
  // pure fixed cost when 50+ queries hit the same 10 tables in one
  // session. A DataFrame is an immutable logical plan — safe to share.
  // Keyed by session so tests/Verify/Bench sessions don't cross-talk.
  // Assumes immutable inputs (true for the test tables); mutated
  // paths need `invalidate()`.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def invalidate(): Unit = cache.clear()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // drop entries pinning STOPPED sessions — otherwise a JVM that
    // cycles sessions (test suites, long-lived services) accumulates
    // unreclaimable plans + FileIndex listings forever
    cache.keys.foreach { k =>
      if (k._1.sparkContext.isStopped) cache.remove(k)
    }
    cache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Ensure a frame has enough partitions to parallelize a per-row
    * JVM kernel (typed flatMap/mapPartitions). A single small parquet
    * file arrives as ONE input split, which would serialize the kernel
    * on one core no matter how many the host has. At cluster scale
    * scans arrive pre-split and this is a no-op — the guard only fires
    * when the planned partition count is below the session's
    * parallelism, so it never adds a shuffle to an already-distributed
    * input. */
  def parallelKernelInput(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** events.ts is parquet TIMESTAMP(NANOS); with
    * spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos
    * long. Convert with integer `div` (a double division would lose
    * precision above 2^53) to Spark's native micros timestamp —
    * matching DuckDB, which also truncates ns→us on read. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, sfDir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}

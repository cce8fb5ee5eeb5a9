package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sink/source connectors (SURVEY §2 "Sources / sinks").
  *
  * The reference exports its marts to downstream stores
  * (flows/dbt_build_and_load_turso.py: duckdb → sqlite dump → HTTP
  * batch inserts). Spark-native, an export is a partitioned columnar
  * write; csv/json round-trips cover interchange formats. JDBC is
  * omitted: the zero-egress container ships no driver jar.
  */
object Sinks {

  /** Partitioned parquet export — the scalable mart sink. Partition
    * columns become directory keys (partition pruning on read);
    * writer-side `maxRecordsPerFile` would bound file sizes at scale. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Mart sink for ordered outputs at scale: instead of a global
    * orderBy (one massive range shuffle + stragglers), partition by
    * the pruning key and sort WITHIN partitions — readers get
    * partition pruning plus locally-ordered row groups, which is what
    * downstream range scans actually exploit. */
  def writeSortedMart(df: DataFrame, path: String, partitionCol: String,
      sortCols: Seq[String]): Unit =
    // Sort by the partition column FIRST: the file writer requires its
    // input ordered on the partition column and would insert its own
    // sort otherwise — relying on that inserted sort being stable to
    // preserve the sortCols order is an implementation detail, not a
    // contract. Leading with partitionCol satisfies the writer's
    // requirement, so no extra sort is inserted and the intra-file
    // sortCols ordering is guaranteed by OUR sort.
    df.sortWithinPartitions((partitionCol +: sortCols).map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** External keyed-store export — the reference's turso load
    * (flows/dbt_build_and_load_turso.py) behind a store-agnostic
    * contract (ExternalStore: JDBC in deployment, embedded in specs).
    * DDL once from the driver; rows flow from the EXECUTORS, one
    * connection per partition, `batchSize`-chunked conflict-free
    * inserts — replays and overlapping loads are idempotent, and the
    * driver never becomes a row funnel. */
  def writeExternal(df: DataFrame, store: ExternalStore, table: String,
      keyCols: Seq[String], batchSize: Int = 500): Unit = {
    // the sink's replay-safety comes ENTIRELY from key conflicts:
    // Spark retries/speculatively re-runs partitions, and a keyless
    // append would land those rows twice — refuse loudly
    require(keyCols.nonEmpty,
      "writeExternal is an idempotent keyed load; a keyless append is not replay-safe")
    val schema = df.schema
    val ddl = store.connect()
    try ddl.ensureTable(table, schema, keyCols) finally ddl.close()
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val conn = store.connect()
      try it.grouped(batchSize).foreach { chunk =>
        conn.insertIgnoreBatch(table, schema, keyCols, chunk)
      } finally conn.close()
    }
  }

  /** CSV export/import with header; schema pinned on read (inference
    * is a full extra pass — never at scale). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines export/import, schema pinned on read. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC export/import — the second columnar interchange format Spark
    * ships natively (predicate pushdown + column pruning work the same
    * as parquet's). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** External keyed-store sink — the Spark-native form of the
  * reference's load step (flows/dbt_build_and_load_turso.py:1-183:
  * duckdb → sqlite dump → batched conflict-free inserts into turso).
  * The write contract is the reference's `insert … on conflict do
  * nothing`: per-partition connections, batched prepared inserts,
  * existing keys win, so replays are idempotent.
  *
  * Connections are opened ON THE EXECUTORS (one per partition) — the
  * driver never funnels rows, so the sink scales with the cluster,
  * bounded by the store's ingest capacity, not Spark. The JDBC
  * implementation uses only `java.sql`; the driver jar is deployment
  * classpath (this container ships none — zero egress), so the spec
  * proves the sink path through an embedded in-memory store behind
  * the same interface.
  */
trait ExternalStore extends Serializable {
  def connect(): ExternalConnection
}

trait ExternalConnection {
  /** Idempotent DDL: create the keyed table if absent. */
  def ensureTable(table: String, schema: StructType, keyCols: Seq[String]): Unit

  /** Insert a batch, skipping rows whose key already exists
    * (`on conflict do nothing`); returns rows actually inserted. */
  def insertIgnoreBatch(table: String, schema: StructType, keyCols: Seq[String],
      rows: Seq[Row]): Long

  def close(): Unit
}

/** JDBC implementation of the store contract (sqlite/turso/postgres
  * `ON CONFLICT DO NOTHING` dialect — the reference's target family).
  * Requires a JDBC driver on the deployment classpath. */
final class JdbcExternalStore(url: String, props: Map[String, String] = Map.empty)
    extends ExternalStore {

  /** Quote an identifier for the target family (sqlite/turso/
    * postgres all take ANSI double quotes). Legal Spark column names
    * ("order", "group", names with spaces) would otherwise break the
    * built DDL/INSERT. Dot-qualified table names quote per segment so
    * "main.tracks" stays schema-qualified. */
  private def q(id: String): String =
    id.split('.').map(s => "\"" + s.replace("\"", "\"\"") + "\"").mkString(".")

  def connect(): ExternalConnection = new ExternalConnection {
    private val info = new java.util.Properties()
    props.foreach { case (k, v) => info.setProperty(k, v) }
    private val conn = java.sql.DriverManager.getConnection(url, info)

    private def sqlType(dt: DataType): String = dt match {
      case LongType | IntegerType | ShortType | ByteType => "BIGINT"
      case DoubleType | FloatType                        => "DOUBLE PRECISION"
      case BooleanType                                   => "BOOLEAN"
      case TimestampType                                 => "TIMESTAMP"
      case DateType                                      => "DATE"
      case _: DecimalType                                => "NUMERIC"
      case _                                             => "TEXT"
    }

    def ensureTable(table: String, schema: StructType, keyCols: Seq[String]): Unit = {
      val cols = schema.fields.map(f => s"${q(f.name)} ${sqlType(f.dataType)}").mkString(", ")
      val pk = if (keyCols.nonEmpty) s", PRIMARY KEY (${keyCols.map(q).mkString(", ")})" else ""
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE IF NOT EXISTS ${q(table)} ($cols$pk)")
      finally st.close()
    }

    def insertIgnoreBatch(table: String, schema: StructType, keyCols: Seq[String],
        rows: Seq[Row]): Long = {
      val names = schema.fieldNames
      // keyless = plain INSERT ("ON CONFLICT ()" is a syntax error).
      // NOTE: only reachable by direct callers — Sinks.writeExternal
      // requires keys, because keyless appends are not replay-safe
      // under Spark task retry.
      val onConflict =
        if (keyCols.isEmpty) ""
        else s" ON CONFLICT (${keyCols.map(q).mkString(", ")}) DO NOTHING"
      val sql = s"INSERT INTO ${q(table)} (${names.map(q).mkString(", ")}) " +
        s"VALUES (${names.map(_ => "?").mkString(", ")})" + onConflict
      val ps = conn.prepareStatement(sql)
      try {
        rows.foreach { r =>
          names.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
          ps.addBatch()
        }
        // SUCCESS_NO_INFO (-2) means the driver executed the element
        // but won't report a count (batched-rewrite drivers do this);
        // treat it as landed — mapping it to 0 would report "nothing
        // inserted" for fully-successful batches
        ps.executeBatch().map {
          case java.sql.Statement.SUCCESS_NO_INFO => 1
          case n                                  => math.max(n, 0)
        }.sum.toLong
      } finally ps.close()
    }

    def close(): Unit = conn.close()
  }
}

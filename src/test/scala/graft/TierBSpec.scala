package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tier B (OLAP) invariants at sf0.001. */
class TierBSpec extends AnyFunSuite {
  import TestSpark._

  test("all tier B queries return rows and have oracles") {
    for (name <- SparkEntry.queries.keys.filter(_.startsWith("b"))) {
      assert(SparkEntry.oracleSql.contains(name), s"$name missing oracle")
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("b4 emits at most 3 parts per brand, ranked") {
    val out = SparkEntry.queries("b4_window_topn")(spark, sf)
    assert(out.groupBy("p_brand").count().filter(col("count") > 3).count() == 0)
  }

  test("b5 rollup grand total equals customer count") {
    val out = SparkEntry.queries("b5_rollup")(spark, sf)
    val total = out.filter(col("region") === "ALL" && col("nation") === "ALL")
      .select("n_customers").head.getLong(0)
    assert(total == spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("b6 semi + anti partitions all orders") {
    val out = SparkEntry.queries("b6_semi_anti")(spark, sf)
    val sums = out.agg(sum(col("n_with_lineitems") + col("n_without_lineitems"))).head.getLong(0)
    assert(sums == spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("b13 range join pairs are within the band and cross-user") {
    val out = SparkEntry.queries("b13_range_join")(spark, sf)
    assert(out.filter(abs(col("dt_us")) > 1000000L).count() == 0)
    assert(out.filter(col("id_a") >= col("id_b")).count() == 0)
  }

  test("c13 split buckets are exhaustive and deterministic") {
    val out = SparkEntry.queries("c13_split")(spark, sf)
    val total = out.agg(sum("n_docs")).head.getLong(0)
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    val again = SparkEntry.queries("c13_split")(spark, sf).collect()
    assert(again.sameElements(out.collect()))
  }

  test("b8 attribution only ever looks backwards") {
    val out = SparkEntry.queries("b8_asof_attr")(spark, sf)
    assert(out.filter(col("gap_us") <= 0).count() == 0)
  }

  test("b9 session ids are monotone per user") {
    val out = SparkEntry.queries("b9_sessionize")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val bad = out.withColumn("prev_seq", lag(col("session_seq"), 1).over(w))
      .filter(col("prev_seq").isNotNull &&
        (col("session_seq") < col("prev_seq") || col("session_seq") > col("prev_seq") + 1))
    assert(bad.count() == 0)
  }
}

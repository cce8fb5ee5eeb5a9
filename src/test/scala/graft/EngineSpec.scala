package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, Tables}

/** Engine-level capabilities: sinks, SQL function registration,
  * bucketed co-located joins, salted aggregation. */
class EngineSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name-").toString

  test("partitioned parquet sink round-trips with partition pruning layout") {
    val stg = operators.Staging.stgEvents(Tables.events(spark, sf))
      .select("event_id", "event_type", "value")
    val path = tmp("part")
    Sinks.writePartitionedParquet(stg, path, Seq("event_type"))
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("event_type=")))
    val back = Sinks.readParquet(spark, path)
    assert(back.count() == stg.count())
    // partition filter prunes directories: plan must show a pruned scan
    val pruned = back.filter(col("event_type") === "click")
    assert(pruned.count() == stg.filter(col("event_type") === "click").count())
  }

  test("csv and json round-trip with pinned schema") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val p1 = tmp("csv"); val p2 = tmp("json")
    Sinks.writeCsv(docs, p1)
    Sinks.writeJson(docs, p2)
    assert(Sinks.readCsv(spark, p1, docs.schema).count() == docs.count())
    assert(Sinks.readJson(spark, p2, docs.schema).count() == docs.count())
  }

  test("graft_dot is registered as a SQL function via SparkSessionExtensions") {
    val r = spark.sql("select graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) as d")
      .head.getDouble(0)
    assert(r == 11.0)
  }

  test("RewriteSelfDot optimizer rule rewrites graft_dot(a,a) and preserves values") {
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.VectorFns.dot(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_self_dot"), s"rule did not fire:\n$optimized")
    // value parity vs the unfused spelling (distinct attrs, rule can't fire)
    val unfused = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("e2"), col("embedding").as("e1"))
      .select(col("vec_id"), graft.functions.VectorFns.dot(col("e1"), col("e2")).as("d"))
    val a = df.orderBy("vec_id").collect().map(_.getDouble(1))
    val b = unfused.orderBy("vec_id").collect().map(_.getDouble(1))
    assert(a.sameElements(b))
  }

  test("b10 salted aggregation equals direct groupBy") {
    val direct = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id").collect()
    val salted = SparkEntry.queries("b10_salted_agg")(spark, sf).collect()
    assert(direct.sameElements(salted))
  }

  test("TopKPerKey custom operator matches the window spelling and plans as TopKPerKeyExec") {
    val rev = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val topk = plans.TopK.perKey(rev, Seq("p_brand"),
      Seq("revenue" -> true, "p_partkey" -> false), 3)
    assert(topk.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = topk.select("p_brand", "p_partkey", "revenue")
      .orderBy("p_brand", "p_partkey").collect()
    val want = SparkEntry.queries("b4_window_topn")(spark, sf)
      .select("p_brand", "p_partkey", "revenue")
      .orderBy("p_brand", "p_partkey").collect()
    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("salted join equals the plain join on a skewed key") {
    // synthetic skew: map most lineitems onto one hot supplier key
    val fact = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_orderkey") % 10 < 7, 1L).otherwise(col("l_suppkey")).as("s_key"))
    val dim = Tables.supplier(spark, sf)
      .select(col("s_suppkey").as("s_key"), col("s_name"))
    val plain = fact.join(dim, Seq("s_key"))
      .orderBy("s_key", "l_orderkey", "l_linenumber").collect()
    val salted = operators.Skew.saltedJoin(fact, dim, "s_key",
        col("l_orderkey") * 10 + col("l_linenumber"))
      .select("s_key", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("s_key", "l_orderkey", "l_linenumber").collect()
    assert(plain.length == salted.length && plain.sameElements(salted))
  }

  test("sorted mart sink writes partition dirs with locally ordered rows") {
    val stg = operators.Staging.stgEvents(Tables.events(spark, sf))
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val path = tmp("mart")
    Sinks.writeSortedMart(stg, path, "event_type", Seq("ts_us"))
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("event_type=")))
    // rows inside each output file are locally sorted by ts_us
    val files = new java.io.File(path).listFiles().filter(_.getName.startsWith("event_type="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.take(3).foreach { f =>
      val ts = spark.read.parquet(f.getAbsolutePath).select("ts_us")
        .collect().map(_.getLong(0))
      assert(ts.sameElements(ts.sorted), s"unsorted rows in $f")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = tmp("warehouse") // external-table paths; warehouse conf untouched (static)
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("drop table if exists orders_b")
      spark.sql("drop table if exists lineitem_b")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** Set session confs for the body, restoring (or unsetting) the
    * prior values afterwards — the shared spelling for every spec
    * that flips a conf. */
  def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

/** Tier A (reference-pipeline parity) invariants at sf0.001. */
class TierASpec extends AnyFunSuite {
  import TestSpark._

  test("all tier A queries return rows") {
    for (name <- SparkEntry.queries.keys.filter(_.startsWith("a"))) {
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("the driver's flagship entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("a1 staging preserves row count and has unique play ids") {
    val stg = SparkEntry.queries("a1_stg_events")(spark, sf)
    val n = stg.count()
    assert(n == spark.read.parquet(s"$sf/events.parquet").count())
    assert(stg.select("play_id").distinct().count() == n)
  }

  test("a2 dim_user keys are unique") {
    val dim = SparkEntry.queries("a2_dim_user")(spark, sf)
    assert(dim.select("user_sk").distinct().count() == dim.count())
  }

  test("a8 ingest dedup is idempotent: one row per event_id, batch1 wins overlap") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("a8_ingest_dedup")(spark, sf)
    assert(out.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
    // overlap region (3 <= event_id%10 < 7) must come from batch 1
    assert(out.filter(col("event_id") % 10 >= 3 && col("event_id") % 10 < 7
      && col("src_batch") =!= 1).count() == 0)
  }

  test("parseDateWithPrecision handles day and year precision (reference staging rule)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TimeFns
    val df = spark.createDataFrame(Seq(
      ("2024-03-05", "day"), ("1999", "year"), ("2024-03-05", "bogus")))
      .toDF("d", "p")
      .select(TimeFns.parseDateWithPrecision(col("d"), col("p")).as("parsed"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.toSeq == Seq(Some("2024-03-05"), Some("1999-01-01"), None))
  }

  test("a7 discovery rates are null-safe and within [0,1]") {
    import org.apache.spark.sql.functions._
    val rpt = SparkEntry.queries("a7_rpt_discovery")(spark, sf)
    assert(rpt.filter(col("track_discovery_rate") > 1.0 || col("track_discovery_rate") < 0.0).count() == 0)
  }
}

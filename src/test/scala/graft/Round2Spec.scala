package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-2 operators (b14–b15, c15–c18, d2) at
  * sf0.001. Oracle value parity is covered by Verify + compare; these
  * check structural properties the hash compare can't express. */
class Round2Spec extends AnyFunSuite {
  import TestSpark._

  test("b14 cube: grand total equals the gid=0 detail sum and gids cover 0..3") {
    val out = SparkEntry.queries("b14_cube")(spark, sf)
    val gids = out.select("gid").distinct().collect().map(_.getLong(0)).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    val detail = out.filter(col("gid") === 0).agg(sum("n_orders")).head.getLong(0)
    val grand = out.filter(col("gid") === 3).head.getLong(out.columns.indexOf("n_orders"))
    assert(detail == grand)
  }

  test("b15 set ops: cohorts partition each year's distinct customers") {
    val out = SparkEntry.queries("b15_setops")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ord = sources.Tables.orders(spark, sf)
    def n(yr: Int) = ord.filter(year(col("o_orderdate")) === yr)
      .select("o_custkey").distinct().count()
    assert(out("both_years") + out("only_1997") == n(1997))
    assert(out("both_years") + out("only_1998") == n(1998))
  }

  test("c15 normalize: never lengthens, unchanged docs keep their md5") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("c15_normalize")(spark, sf)
    assert(out.filter(col("len_norm") > col("len_raw")).count() == 0)
    val joined = out.join(docs.select(col("doc_id"), md5(col("text")).as("raw_md5")), Seq("doc_id"))
    assert(joined.filter(!col("changed") && col("norm_md5") =!= col("raw_md5")).count() == 0)
    assert(joined.filter(col("changed") && col("norm_md5") === col("raw_md5")).count() == 0)
  }

  test("c16 pii redact: redaction only fires when matches exist") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = SparkEntry.queries("c16_pii_redact")(spark, sf)
      .join(docs.select(col("doc_id"), md5(col("text")).as("raw_md5"),
        length(col("text")).cast("long").as("len_raw")), Seq("doc_id"))
    assert(out.filter(col("n_emails") === 0 && col("n_nums") === 0
      && col("redacted_md5") =!= col("raw_md5")).count() == 0)
    assert(out.filter((col("n_emails") > 0 || col("n_nums") > 0)
      && col("redacted_md5") === col("raw_md5")).count() == 0)
  }

  test("c17 tfidf: at most 3 ranked terms per doc, scores non-increasing in rank") {
    val out = SparkEntry.queries("c17_tfidf")(spark, sf)
    assert(out.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
    assert(out.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rank")
    val bad = out.withColumn("prev", lag(col("tfidf"), 1).over(w))
      .filter(col("prev").isNotNull && col("tfidf") > col("prev"))
    assert(bad.count() == 0)
  }

  test("c18 stratified sample: en downsampled, other strata kept whole") {
    val out = SparkEntry.queries("c18_stratified")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.nonEmpty)
    out.foreach { case (lang, total, kept) =>
      assert(kept <= total)
      if (lang != "en") assert(kept == total, s"stratum $lang unexpectedly sampled")
    }
    out.find(_._1 == "en").foreach { case (_, total, kept) =>
      assert(kept < total, "en stratum not downsampled")
    }
  }

  test("b16 gap fill: dense hour×type grid, observed cells preserved") {
    val out = SparkEntry.queries("b16_gapfill")(spark, sf)
    val nHours = out.select("hour_us").distinct().count()
    val nTypes = out.select("event_type").distinct().count()
    assert(out.count() == nHours * nTypes, "grid not dense")
    val observed = SparkEntry.queries("e1_stream_hourly")(spark, sf)
    val mismatch = observed.join(out, Seq("hour_us", "event_type"), "left_anti")
    assert(mismatch.count() == 0, "observed cell missing from the filled grid")
    assert(out.agg(sum("n_events")).head.getLong(0) ==
      sources.Tables.events(spark, sf).count())
  }

  test("b17 unpivot inverts b7 pivot exactly") {
    val long = SparkEntry.queries("b17_unpivot")(spark, sf)
    val wide = SparkEntry.queries("b7_pivot")(spark, sf)
    val users = wide.count()
    assert(long.count() == users * 5)
    val repivoted = long.groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .sum("n")
    assert(repivoted.orderBy("user_id").collect()
      .sameElements(wide.orderBy("user_id").collect()))
  }

  test("b18 listagg: csv is sorted-distinct and counts cover all events") {
    val out = SparkEntry.queries("b18_listagg")(spark, sf)
    val bad = out.filter(not(array_sort(array_distinct(split(col("types_csv"), ",")))
      === split(col("types_csv"), ",")))
    assert(bad.count() == 0, "csv not sorted-distinct")
    assert(out.agg(sum("n_events")).head.getLong(0) ==
      sources.Tables.events(spark, sf).count())
  }

  test("c19 ngram stats: df never exceeds total count, ordered by count") {
    val out = SparkEntry.queries("c19_ngram_stats")(spark, sf).collect()
    assert(out.length <= 50 && out.nonEmpty)
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)), "n_docs > n")
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not count-descending")
  }

  test("c20 contamination: fractions bounded, benchmark docs excluded") {
    val out = SparkEntry.queries("c20_contamination")(spark, sf)
    assert(out.filter(col("contamination") < 0 || col("contamination") > 1).count() == 0)
    assert(out.filter(col("doc_id") % 97 === 0).count() == 0)
    assert(out.filter(col("n_hit") > col("n_sh")).count() == 0)
  }

  test("c21 repetition: ratios bounded and top bigram count is the per-doc max") {
    val out = SparkEntry.queries("c21_repetition")(spark, sf)
    assert(out.filter(col("max_rep") > col("n_bigrams")).count() == 0)
    assert(out.filter(col("rep_ratio") <= 0 || col("rep_ratio") > 1).count() == 0)
  }

  test("graft_minhash aggregate equals the 16-column min-agg spelling") {
    // native one-pass TypedImperativeAggregate vs the declarative
    // spelling used by the oracle-checked c3 chain
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("docs_mh")
    val viaAgg = spark.sql("""
      with sh as (
        select doc_id, explode(array_distinct(
          transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
            i -> concat_ws(' ', element_at(split(text, ' '), i),
                                element_at(split(text, ' '), i + 1),
                                element_at(split(text, ' '), i + 2))))) as s
        from docs_mh where size(split(text, ' ')) >= 3)
      select doc_id, graft_minhash(s) as sig from sh group by doc_id""")
    val declared = spark.sql("""
      with sh as (
        select doc_id, explode(array_distinct(
          transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
            i -> concat_ws(' ', element_at(split(text, ' '), i),
                                element_at(split(text, ' '), i + 1),
                                element_at(split(text, ' '), i + 2))))) as s
        from docs_mh where size(split(text, ' ')) >= 3),
      h as (select doc_id, md5(concat('0|', s)) as d0, md5(concat('1|', s)) as d1 from sh)
      select doc_id, array(
        min(substring(d0, 1, 4)), min(substring(d0, 5, 4)), min(substring(d0, 9, 4)),
        min(substring(d0, 13, 4)), min(substring(d0, 17, 4)), min(substring(d0, 21, 4)),
        min(substring(d0, 25, 4)), min(substring(d0, 29, 4)),
        min(substring(d1, 1, 4)), min(substring(d1, 5, 4)), min(substring(d1, 9, 4)),
        min(substring(d1, 13, 4)), min(substring(d1, 17, 4)), min(substring(d1, 21, 4)),
        min(substring(d1, 25, 4)), min(substring(d1, 29, 4))) as sig
      from h group by doc_id""")
    val a = viaAgg.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val b = declared.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("the SQL surface serves the same plans as the DataFrame API") {
    // the reference's users write dbt SQL; the engine must serve that
    // surface directly — temp views + spark.sql over the same tables
    sources.Tables.events(spark, sf).createOrReplaceTempView("events_v")
    val viaSql = spark.sql("""
      select user_id, count(*) as n_events, round(sum(value), 4) as sum_value
      from events_v group by user_id order by user_id""").collect()
    val viaApi = sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id").collect()
    assert(viaSql.sameElements(viaApi))
  }

  test("d3 frame sampling keeps every 2nd video chunk, densely renumbered") {
    val frames = SparkEntry.queries("d3_frame_sample")(spark, sf)
    val chunks = SparkEntry.queries("d2_media_chunks")(spark, sf)
    assert(frames.filter(col("chunk_idx") =!= col("frame_idx") * 2).count() == 0)
    // every sampled frame is a real chunk with the same checksum
    val joined = frames.join(
      chunks.filter(col("media_type") === "video")
        .select(col("doc_id"), col("chunk_idx"), col("chunk_md5").as("d2_md5")),
      Seq("doc_id", "chunk_idx"))
    assert(joined.count() == frames.count())
    assert(joined.filter(col("chunk_md5") =!= col("d2_md5")).count() == 0)
    // dense renumbering: per doc, frame_idx runs 0..n-1
    val dense = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("frame_idx").as("lo"), max("frame_idx").as("hi"))
    assert(dense.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1).count() == 0)
  }

  test("c22 sequence packing conserves documents and tokens") {
    val out = SparkEntry.queries("c22_seq_pack")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.agg(sum("n_docs")).head.getLong(0) == docs.count())
    val totalTok = docs.select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(out.agg(sum("sum_tok")).head.getLong(0) == totalTok)
    // id ranges of consecutive sequences within a shard never overlap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("seq_id")
    val bad = out.withColumn("prev_last", lag(col("last_doc"), 1).over(w))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
    assert(bad.count() == 0, "sequence id ranges overlap within a shard")
  }

  test("orc sink round-trips with schema and row count intact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "lang", "n_chars")
    val path = java.nio.file.Files.createTempDirectory("graft-orc-").toString
    sources.Sinks.writeOrc(docs, path)
    val back = sources.Sinks.readOrc(spark, path)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    // filters reach the ORC scan the same way they do parquet's
    assert(back.filter(col("lang") === "en").count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("approx_percentile tracks the exact percentile (b11's documented scale path)") {
    val ev = sources.Tables.events(spark, sf)
    val rows = ev.groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact"),
        expr("approx_percentile(value, 0.5, 1000)").as("approx"),
        (max(col("value")) - min(col("value"))).as("range"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx, range) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(approx - exact) <= math.max(range * 0.05, 1e-9),
        s"${r.getString(0)}: approx=$approx exact=$exact range=$range")
    }
  }

  test("approx_count_distinct stays within its error bound of the exact count") {
    val ev = sources.Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), rsd = 0.05)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"approx=$approx exact=$exact drifted past 3x the configured rsd")
  }

  test("d2 media chunks: per-doc chunk lengths reassemble the payload exactly") {
    val out = SparkEntry.queries("d2_media_chunks")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
    val sums = out.groupBy("doc_id").agg(
      sum("chunk_len").as("total_len"),
      count(lit(1)).as("n_chunks"),
      max("chunk_idx").as("max_idx"),
      min("chunk_idx").as("min_idx"))
    val joined = sums.join(docs, Seq("doc_id"))
    assert(joined.filter(col("total_len") =!= col("n_bytes")).count() == 0)
    // contiguous indices 0..n-1
    assert(joined.filter(col("min_idx") =!= 0 || col("max_idx") =!= col("n_chunks") - 1).count() == 0)
    // all chunks except the last are exactly 64 bytes
    assert(out.join(sums.select("doc_id", "max_idx"), Seq("doc_id"))
      .filter(col("chunk_idx") < col("max_idx") && col("chunk_len") =!= 64).count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operational behaviors a 100 TB deployment leans on: AQE skew-join
  * splitting, streaming checkpoint recovery with an exactly-once file
  * sink, schema evolution on read, and malformed-record isolation. */
class RobustnessSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name-").toString


  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // one pathological hot key (the situation salting/AQE exist for)
    val left = spark.range(0, 60000).select(
      when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val right = spark.range(0, 200).select(col("id").as("k"), col("id").as("r"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB") {
      val joined = left.join(right, Seq("k"))
      // run THIS Dataset's own query execution (count() would plan a
      // separate query and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length == 54000 + 20)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    }
  }

  test("streaming ingest to a file sink survives restart exactly-once") {
    import spark.implicits._
    val in = tmp("ckpt-in"); val out = tmp("ckpt-out"); val ck = tmp("ckpt-state")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val half = ev.count() / 2
    // the file-stream source lists FILES under `in` (it does not
    // recurse into nested directory-writes), so stage each batch as a
    // single moved part-file
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = tmp(s"stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.move(part, java.nio.file.Paths.get(in, s"$name.parquet"))
    }
    drop(ev.limit(half.toInt), "batch1")

    def run(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(in)
        .select(col("event_id"), col("event_type"), col("value"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == half)

    // second batch arrives while the query is DOWN; restart from the
    // same checkpoint must pick it up without re-emitting batch 1
    drop(ev, "batch2")
    run()
    val result = spark.read.parquet(out)
    assert(result.count() == half + ev.count(), "restart lost or duplicated rows")
    assert(result.select("event_id").distinct().count() == ev.count())
  }

  test("upsertSink recovers from a store dir with no committed files") {
    import graft.streaming.EventsStream
    // simulate a first micro-batch that died after mkdir: the path
    // exists but holds only an uncommitted _temporary dir — a bare
    // exists() gate would try to read it and fail on every retry
    val store = tmp("upsert-recover") + "/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store, "_temporary"))
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    EventsStream.upsertSink(ev, store, "event_id")
    assert(spark.read.parquet(store).count() == ev.count())
    // and the retry after recovery stays idempotent
    EventsStream.upsertSink(ev, store, "event_id")
    assert(spark.read.parquet(store).count() == ev.count())
  }

  test("upsert store reads are partition-pruned to the batch's key buckets") {
    import graft.streaming.EventsStream
    val store = tmp("upsert-prune") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    EventsStream.upsertSink(ev, store, "event_id")
    val full = spark.read.parquet(store)
    val schema = full.schema
    val bucketsOnDisk = full.select("__kb").distinct().collect().map(_.getInt(0)).sorted
    assert(bucketsOnDisk.length > 1, "store did not fan out over key buckets")
    val probe = Seq(bucketsOnDisk.head)
    val scan = EventsStream.storeScan(spark, store, schema, probe)
    // the bucket filter must reach the scan as a PARTITION filter —
    // that is what keeps a small micro-batch from rescanning the store
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__kb"),
      s"bucket filter did not become a partition filter:\n$plan")
    assert(scan.count() == full.filter(col("__kb") === probe.head).count())
  }

  test("an interrupted compaction swap heals on the next store touch") {
    import graft.streaming.EventsStream
    val store = tmp("upsert-heal") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    EventsStream.upsertSink(ev, store, "event_id")
    val n = spark.read.parquet(store).count()
    // simulate the one crash window: live store moved aside, the
    // compacted replacement never installed
    java.nio.file.Files.move(java.nio.file.Paths.get(store),
      java.nio.file.Paths.get(store + "__precompact"))
    assert(!new java.io.File(store).exists())
    // the next merge must restore the aside copy, NOT fork a fresh
    // store and re-insert every key — replay only a SUBSET, so a heal
    // that silently dropped the aside copy could not fake the full
    // count with re-inserted rows
    EventsStream.upsertSink(ev.limit(10), store, "event_id")
    val healed = spark.read.parquet(store)
    assert(healed.count() == n, "heal lost rows or forked the store")
    assert(healed.select("event_id").distinct().count() == n)
    assert(!new java.io.File(store + "__precompact").exists(), "aside copy left behind")
  }

  test("the store's bucket layout is frozen in its meta sidecar; foreign layouts refused") {
    import graft.streaming.EventsStream
    val store = tmp("upsert-meta") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    EventsStream.upsertSink(ev, store, "event_id")
    val meta = java.nio.file.Paths.get(store, "_graft_store_meta")
    assert(java.nio.file.Files.readString(meta).trim ==
      s"${EventsStream.StoreBuckets} murmur3")
    // compaction carries the layout meta into the swapped-in store
    EventsStream.compactStore(spark, store)
    assert(java.nio.file.Files.readString(meta).trim ==
      s"${EventsStream.StoreBuckets} murmur3")
    // a path holding flat (non-bucketed) parquet is another dataset —
    // the sink must refuse rather than mix layouts
    val flat = tmp("upsert-flat") + "/store"
    ev.limit(10).write.parquet(flat)
    intercept[java.io.IOException] {
      EventsStream.upsertSink(ev, flat, "event_id")
    }
  }

  test("store compaction collapses per-batch files without changing content") {
    import graft.streaming.EventsStream
    val store = tmp("upsert-compact") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    // three overlapping loads → up to three files per bucket
    EventsStream.upsertSink(ev.filter(col("event_id") % 3 === 0), store, "event_id")
    EventsStream.upsertSink(ev.filter(col("event_id") % 3 =!= 2), store, "event_id")
    EventsStream.upsertSink(ev, store, "event_id")
    def filesPerBucket: Map[String, Int] =
      new java.io.File(store).listFiles().filter(_.getName.startsWith("__kb="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = spark.read.parquet(store)
    val (nBefore, sumBefore) =
      (before.count(), before.agg(sum("value")).head.getDouble(0))
    assert(filesPerBucket.values.max > 1, "appends did not fragment (test premise)")
    EventsStream.compactStore(spark, store)
    assert(filesPerBucket.values.max == 1, s"compaction left fragments: $filesPerBucket")
    val after = spark.read.parquet(store)
    assert(after.count() == nBefore)
    assert(math.abs(after.agg(sum("value")).head.getDouble(0) - sumBefore) < 1e-6)
    assert(after.select("event_id").distinct().count() == nBefore)
  }

  test("selective compaction rewrites only fragmented buckets; others stay byte-identical") {
    import graft.streaming.EventsStream
    val store = tmp("upsert-selcompact") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    // first load seeds every bucket with ONE file; follow-ups insert
    // FRESH keys confined to buckets 0..7 (filtered on the store's own
    // hash), fragmenting only those
    EventsStream.upsertSink(ev, store, "event_id")
    val nb = EventsStream.StoreBuckets
    for (i <- 1 to 3)
      EventsStream.upsertSink(
        ev.select((col("event_id") + 1000000L * i).as("event_id"),
            col("event_type"), col("value"))
          .filter(pmod(hash(col("event_id")), lit(nb)) < 8)
          .limit(50), store, "event_id")
    def bucketFiles(): Map[String, Map[String, Long]] =
      new java.io.File(store).listFiles().filter(_.getName.startsWith("__kb="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    val before = bucketFiles()
    val cold = before.filter(_._2.size == 1).keys.toSet
    val hot = before.filter(_._2.size >= 3).keys.toSet
    assert(hot.nonEmpty, "test premise: no bucket fragmented")
    assert(cold.nonEmpty, "test premise: every bucket fragmented")
    def md5s(b: String): Seq[Seq[Byte]] =
      new java.io.File(s"$store/$b").listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
        .map(f => java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath)).toSeq).toSeq
    val rowsBefore = spark.read.parquet(store).count()
    val sumBefore = spark.read.parquet(store).agg(sum("value")).head.getDouble(0)
    val md5Before = cold.map(b => b -> md5s(b)).toMap
    val compacted = EventsStream.compactStoreSelective(spark, store, minFiles = 3)
    assert(compacted.map(n => s"__kb=$n").toSet == hot,
      s"compacted $compacted, expected exactly the fragmented buckets $hot")
    val after = bucketFiles()
    // untouched buckets: same file names, same mtimes, same bytes
    for (b <- cold) {
      assert(after(b) == before(b), s"cold bucket $b was rewritten")
      assert(md5s(b) == md5Before(b), s"cold bucket $b content changed")
    }
    // fragmented buckets: one file each now, content preserved
    for (b <- hot) assert(after(b).size == 1, s"hot bucket $b still fragmented: ${after(b)}")
    val got = spark.read.parquet(store)
    assert(got.count() == rowsBefore)
    assert(got.select("event_id").distinct().count() == rowsBefore)
    assert(math.abs(got.agg(sum("value")).head.getDouble(0) - sumBefore) < 1e-6,
      "selective compaction changed row content")
    // leftovers from a simulated bucket-swap crash heal on next touch
    val kb = s"__kb=${compacted.head}"
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$store/$kb"),
      java.nio.file.Paths.get(s"$store/_compact_aside_kb${compacted.head}"))
    EventsStream.upsertSink(ev.limit(5), store, "event_id")
    assert(new java.io.File(s"$store/$kb").exists(), "bucket aside not restored")
    assert(spark.read.parquet(store).count() == rowsBefore)
  }

  test("murmur3 stores align bucket==partition; legacy v1 stores stay on xxhash64") {
    import graft.streaming.EventsStream
    val nb = EventsStream.StoreBuckets
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    // fresh store → v2 meta, murmur3 buckets (== Spark partition ids)
    val m3 = tmp("store-m3") + "/store"
    EventsStream.upsertSink(ev, m3, "event_id")
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$m3/_graft_store_meta")), "UTF-8").trim
    assert(metaText == s"$nb murmur3", s"unexpected meta '$metaText'")
    assert(spark.read.parquet(m3)
      .filter(col("__kb") =!= pmod(hash(col("event_id")), lit(nb))).count() == 0,
      "murmur3 store bucket values drifted from the layout hash")
    // the single-exchange claim, observed: one file per bucket dir
    val files = new java.io.File(m3).listFiles().filter(_.getName.startsWith("__kb="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty && files.forall(_ == 1),
      s"murmur3 first merge did not land one file per bucket: ${files.mkString(",")}")
    // legacy store: a v1 meta pins xxhash64 forever
    val xx = tmp("store-xx") + "/store"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(xx))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$xx/_graft_store_meta"), s"$nb\n".getBytes("UTF-8"))
    EventsStream.upsertSink(ev, xx, "event_id")
    assert(spark.read.parquet(xx)
      .filter(col("__kb") =!= pmod(xxhash64(col("event_id")), lit(nb))).count() == 0,
      "legacy store abandoned its frozen xxhash64 layout")
    // same rows under either layout; replays no-op on both
    EventsStream.upsertSink(ev, m3, "event_id")
    EventsStream.upsertSink(ev, xx, "event_id")
    val a = spark.read.parquet(m3).drop("__kb")
    val b = spark.read.parquet(xx).drop("__kb")
    assert(a.count() == ev.count() && b.count() == ev.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("migrateStore rewrites a legacy store to murmur3: same rows, one exchange after") {
    import graft.streaming.EventsStream
    val nb = EventsStream.StoreBuckets
    val store = tmp("store-migrate") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    // legacy store: v1 meta pins xxhash64; two merges fragment it
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/_graft_store_meta"), s"$nb\n".getBytes("UTF-8"))
    EventsStream.upsertSink(ev.filter(col("event_id") % 2 === 0), store, "event_id")
    EventsStream.upsertSink(ev, store, "event_id")
    val before = spark.read.parquet(store).drop("__kb").orderBy("event_id").collect()
    assert(EventsStream.migrateStore(spark, store, "event_id"),
      "legacy store should migrate")
    // layout flipped: v2 meta, buckets re-hashed with the partitioner
    // hash, one file per bucket (the migration IS a compaction)
    val metaText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/_graft_store_meta")), "UTF-8").trim
    assert(metaText == s"$nb murmur3", s"meta not bumped: '$metaText'")
    assert(spark.read.parquet(store)
      .filter(col("__kb") =!= pmod(hash(col("event_id")), lit(nb))).count() == 0,
      "migrated buckets drifted from the murmur3 layout hash")
    def filesPerBucket(): Array[Int] =
      new java.io.File(store).listFiles().filter(_.getName.startsWith("__kb="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerBucket().forall(_ == 1),
      s"migration did not compact: ${filesPerBucket().mkString(",")}")
    // content byte-equal: identical rows before and after
    val after = spark.read.parquet(store).drop("__kb").orderBy("event_id").collect()
    assert(after.sameElements(before), "migration changed store content")
    // already-murmur3 → no-op
    assert(!EventsStream.migrateStore(spark, store, "event_id"))
    // a post-migration merge rides the single exchange: one NEW file
    // per touched bucket, and replays stay idempotent
    val fresh = ev.select((col("event_id") + 5000000L).as("event_id"),
      col("event_type"), col("value"))
    EventsStream.upsertSink(fresh, store, "event_id")
    assert(filesPerBucket().forall(_ <= 2),
      s"post-migration merge fragmented buckets: ${filesPerBucket().mkString(",")}")
    EventsStream.upsertSink(ev, store, "event_id") // full replay: all dups
    assert(spark.read.parquet(store).count() == before.length + fresh.count())
  }

  test("withReaderRetry survives a compaction swap under a stale reader") {
    import graft.streaming.EventsStream
    val store = tmp("store-reader") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    // several merges fragment the buckets so compaction has work
    for (i <- 0 to 3)
      EventsStream.upsertSink(ev.select((col("event_id") + 1000000L * i)
        .as("event_id"), col("event_type"), col("value")), store, "event_id")
    val expected = spark.read.parquet(store).count()
    // a reader captures its file listing BEFORE the swap…
    val stale = spark.read.parquet(store)
    assert(stale.count() == expected)
    assert(EventsStream.compactStoreSelective(spark, store, minFiles = 2).nonEmpty,
      "compaction had nothing to rewrite — the scenario needs a swap")
    // …and that captured frame now points at deleted files: the
    // failure withReaderRetry exists to absorb
    val bare = intercept[Exception] { stale.count() }
    def fnfInChain(t: Throwable): Boolean = {
      var c: Throwable = t
      while (c != null) {
        if (c.isInstanceOf[java.io.FileNotFoundException]) return true
        c = c.getCause
      }
      false
    }
    assert(fnfInChain(bare), s"expected FileNotFoundException, got: $bare")
    // the wrapped read retries across the swap: first attempt replays
    // the stale listing, the rebuild-from-path attempt succeeds
    var attempt = 0
    val n = EventsStream.withReaderRetry(spark, store) {
      attempt += 1
      if (attempt == 1) stale.count()
      else spark.read.parquet(store).count()
    }
    assert(attempt == 2 && n == expected,
      s"retry did not recover: attempt=$attempt n=$n expected=$expected")
    // non-listing failures pass straight through, no retry
    var calls = 0
    intercept[IllegalStateException] {
      EventsStream.withReaderRetry(spark, store) {
        calls += 1; throw new IllegalStateException("unrelated")
      }
    }
    assert(calls == 1, "unrelated failure must not retry")
  }

  test("upsertSink auto-compaction keeps touched buckets bounded, content intact") {
    import graft.streaming.EventsStream
    val store = tmp("upsert-autoc") + "/store"
    val plain = tmp("upsert-autoc-plain") + "/store"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_id") % 7 === 0) // deterministic slice
    for (i <- 0 to 5) {
      val slice = ev.select((col("event_id") + 1000000L * i).as("event_id"),
        col("event_type"), col("value"))
      EventsStream.upsertSink(slice, store, "event_id", autoCompactMinFiles = Some(3))
      EventsStream.upsertSink(slice, plain, "event_id")
    }
    def bucketCounts(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("__kb="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    // trigger fires at 3 files → 1, so at rest a bucket holds ≤ 2
    val auto = bucketCounts(store)
    assert(auto.values.max <= 2, s"trigger failed to bound fragmentation: $auto")
    // the untriggered twin DID fragment (premise the trigger mattered)
    assert(bucketCounts(plain).values.max >= 3,
      "test premise: plain store never fragmented")
    // identical contents either way
    val a = spark.read.parquet(store)
    val b = spark.read.parquet(plain)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0,
      "auto-compaction changed store content")
  }

  test("parquet schema evolution: mergeSchema unions columns, absent ones are null") {
    val p = tmp("evolve")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.select("doc_id", "lang").write.parquet(s"$p/v1.parquet")
    docs.select(col("doc_id"), col("lang"), col("n_chars").as("added_later"))
      .write.parquet(s"$p/v2.parquet")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$p/v1.parquet", s"$p/v2.parquet")
    assert(merged.columns.toSet == Set("doc_id", "lang", "added_later"))
    assert(merged.count() == docs.count() * 2)
    assert(merged.filter(col("added_later").isNull).count() == docs.count())
  }

  test("malformed json rows are isolated, not fatal") {
    import org.apache.spark.sql.types._
    val p = tmp("corrupt")
    java.nio.file.Files.write(java.nio.file.Paths.get(p, "data.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": "ok"}""",
        """{"id": 2, "v": "also ok"}""",
        """{"id": 3, "v": BROKEN""",
        """{"id": 4, "v": "fine"}"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (default): bad line lands in _corrupt_record
    // querying only the corrupt column from raw files is disallowed;
    // cache first (the documented pattern)
    val permissive = spark.read.schema(schema).json(p).cache()
    assert(permissive.count() == 4)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    // the corrupt row's data columns are all null; the raw line is kept
    val corrupt = permissive.filter(col("_corrupt_record").isNotNull).head
    assert(corrupt.isNullAt(corrupt.fieldIndex("id")) && corrupt.isNullAt(corrupt.fieldIndex("v")))
    assert(corrupt.getString(corrupt.fieldIndex("_corrupt_record")).contains("BROKEN"))
    // DROPMALFORMED: bad line excluded entirely
    val dropped = spark.read.schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(p)
    assert(dropped.count() == 3)
    permissive.unpersist()
  }
}

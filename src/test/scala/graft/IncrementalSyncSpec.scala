package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.DocumentSink
import graft.streaming.IncrementalSync

case class Change(entity_id: Long, ts: Timestamp, value: Double,
                  payload: String)

class IncrementalSyncSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("latestPerKeyInBatch reduces to newest row per key") {
    val batch = Seq(
      Change(1L, ts("2026-01-01 00:00:00"), 1.0, "old"),
      Change(1L, ts("2026-01-01 00:05:00"), 2.0, "new"),
      Change(2L, ts("2026-01-01 00:01:00"), 3.0, "only"))
      .toDF()
    val out = IncrementalSync.latestPerKeyInBatch(batch, "entity_id", "ts")
      .orderBy("entity_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("payload") == "new")
  }

  test("changelog stream upserts latest state per key into the lake") {
    val path = Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[Change](spark)
    input.addData(
      Change(1L, ts("2026-01-01 00:00:00"), 1.0, "v1"),
      Change(2L, ts("2026-01-01 00:00:00"), 1.0, "v1"))
    val q1 = IncrementalSync.changelogUpsert(
      input.toDF(), "entity_id", "ts", path)
      .option("checkpointLocation", s"$path/_chk")
      .start()
    q1.awaitTermination(60000)
    assert(DocumentSink.count(spark, path) == 2)

    // second batch: entity 1 updated, entity 3 new → upsert, not append
    input.addData(Change(1L, ts("2026-01-01 01:00:00"), 9.0, "v2"),
      Change(3L, ts("2026-01-01 01:00:00"), 1.0, "v1"))
    val q2 = IncrementalSync.changelogUpsert(
      input.toDF(), "entity_id", "ts", path)
      .option("checkpointLocation", s"$path/_chk")
      .start()
    q2.awaitTermination(60000)
    val state = DocumentSink.read(spark, path)
    assert(state.count() == 3)
    assert(state.filter(col("entity_id") === 1L).collect()(0)
      .getAs[String]("payload") == "v2")
  }

  test("changelogUpsert replays safely: a batch written but not " +
    "committed is re-applied after restart with identical lake state") {
    // The exactly-once story a 100 TB incremental sync leans on:
    // Structured Streaming commits a batch AFTER foreachBatch returns,
    // so a crash between the sink write and the commit marker makes the
    // engine REPLAY that batch on restart. The upsert must be
    // idempotent under that replay. Simulated faithfully through the
    // engine itself: run a file-source stream to completion, delete the
    // checkpoint's commit marker (crash-after-write, before-commit),
    // restart, and compare lake state.
    val root = Files.createTempDirectory("graft-replay")
    val src = root.resolve("src"); Files.createDirectory(src)
    val lake = root.resolve("lake").toString
    val chk = root.resolve("chk").toString
    Seq(
      Change(1L, ts("2026-01-01 00:00:00"), 1.0, "v1"),
      Change(1L, ts("2026-01-01 00:05:00"), 2.0, "v2"),
      Change(2L, ts("2026-01-01 00:01:00"), 3.0, "v1"))
      .toDF().write.parquet(s"$src/b0")
    val schema = Seq.empty[Change].toDF().schema
    def runStream(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$src/*")
      val q = IncrementalSync.changelogUpsert(stream, "entity_id", "ts", lake)
        .option("checkpointLocation", chk)
        .start()
      q.awaitTermination(120000)
    }
    runStream()
    val first = DocumentSink.read(spark, lake).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("payload")))
      .toSet
    assert(first == Set((1L, "v2"), (2L, "v1")))
    // crash window: batch 0 wrote to the lake but never committed
    val commit0 = java.nio.file.Paths.get(chk, "commits", "0")
    assert(Files.exists(commit0), "expected commit marker for batch 0")
    Files.delete(commit0)
    // the local FS checkpoint manager writes a checksum sidecar next to
    // the marker; leaving it behind fails the replay's rename
    Files.deleteIfExists(java.nio.file.Paths.get(chk, "commits", ".0.crc"))
    runStream() // restart → engine replays batch 0 against the lake
    val replayed = DocumentSink.read(spark, lake).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("payload")))
      .toSet
    assert(replayed == first, "replayed batch changed the lake state")
    assert(DocumentSink.read(spark, lake).count() == 2)
    // and the stream still makes progress after the replay
    Seq(Change(2L, ts("2026-01-01 01:00:00"), 4.0, "v2"))
      .toDF().write.parquet(s"$src/b1")
    runStream()
    val advanced = DocumentSink.read(spark, lake).collect()
      .map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("payload")))
      .toSet
    assert(advanced == Set((1L, "v2"), (2L, "v2")))
  }

  test("changelogUpsert maintains the adjacent write-time search index " +
    "incrementally: after a streamed upsert, indexed search == rebuild") {
    // Verdict r6 task #2: the R3 re-sync path must UPDATE the postings/
    // stats of the write-time index by deltas, not rebuild them — and an
    // upserted index must be indistinguishable from a full rebuild over
    // the merged corpus. Driven through the real streaming entry point.
    import graft.sinks.SearchIndex
    val path = Files.createTempDirectory("graft-stream-idx").toString
    val input = MemoryStream[Change](spark)
    input.addData(
      Change(1L, ts("2026-01-01 00:00:00"), 1.0, "window batch run"),
      Change(2L, ts("2026-01-01 00:00:00"), 1.0, "no match here"))
    IncrementalSync.changelogUpsert(input.toDF(), "entity_id", "ts", path)
      .option("checkpointLocation", s"$path/_chk")
      .start().awaitTermination(60000)
    // sync time: build the index adjacent to the lake (DocumentSink's
    // sidecar contract) over the payload field
    SearchIndex.build(DocumentSink.read(spark, path),
      Seq("payload"), "document_id", s"$path/_search_index")
    // streamed re-sync: entity 1 replaced, entity 3 inserted
    input.addData(
      Change(1L, ts("2026-01-01 01:00:00"), 9.0, "window window batch"),
      Change(3L, ts("2026-01-01 01:00:00"), 1.0, "a brand new window"))
    IncrementalSync.changelogUpsert(input.toDF(), "entity_id", "ts", path)
      .option("checkpointLocation", s"$path/_chk")
      .start().awaitTermination(60000)
    // the maintained index must equal one rebuilt from the merged lake
    val reb = Files.createTempDirectory("graft-stream-idx-reb").toString
    SearchIndex.build(DocumentSink.read(spark, path),
      Seq("payload"), "document_id", reb)
    val maintained = SearchIndex.ranked(spark, s"$path/_search_index",
      "window batch", Seq("payload")).collect().map(_.toString).toSeq
    val rebuilt = SearchIndex.ranked(spark, reb,
      "window batch", Seq("payload")).collect().map(_.toString).toSeq
    assert(maintained == rebuilt,
      s"streamed upsert diverged from rebuild\n$maintained\nvs\n$rebuilt")
    assert(maintained.exists(_.startsWith("[3,")),
      "streamed insert missing from the maintained index")
    // match-only contract: entity 2 ("no match here") shares no term with
    // the query, so exactly the replaced doc 1 and the inserted doc 3 hit
    assert(maintained.size == 2)
  }

  test("sessionizedCounts merges events within the gap into one session") {
    val input = MemoryStream[Change](spark)
    input.addData(
      Change(1L, ts("2026-01-01 00:00:00"), 1.0, "a"),
      Change(1L, ts("2026-01-01 00:03:00"), 2.0, "b"), // within 5m gap
      Change(1L, ts("2026-01-01 01:00:00"), 4.0, "c")) // new session
    val agg = IncrementalSync.sessionizedCounts(
      input.toDF(), "ts", "entity_id", "5 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess").orderBy("session_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("events") == 2L)  // a+b merged
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
    assert(rows(1).getAs[Long]("events") == 1L)
  }

  test("streamingDedup keeps first-seen per key across micro-batches") {
    val input = MemoryStream[Change](spark)
    input.addData(
      Change(1L, ts("2026-01-01 00:00:00"), 1.0, "hashA"),
      Change(2L, ts("2026-01-01 00:00:01"), 2.0, "hashA"),
      Change(3L, ts("2026-01-01 00:00:02"), 3.0, "hashB"))
    val deduped = IncrementalSync.streamingDedup(
      input.toDS(), (c: Change) => c.payload)
    val q = deduped.writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("sd").count() == 2) // one per hash

    // next batch: hashA again (dropped — state remembers), hashC new
    input.addData(
      Change(4L, ts("2026-01-01 01:00:00"), 4.0, "hashA"),
      Change(5L, ts("2026-01-01 01:00:01"), 5.0, "hashC"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sd").orderBy("entity_id").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("payload")).sorted
      .sameElements(Array("hashA", "hashB", "hashC")))
    assert(!out.map(_.getAs[Long]("entity_id")).contains(4L))
  }

  test("windowedCounts: watermarked tumbling event-time aggregation") {
    val input = MemoryStream[Change](spark)
    input.addData(
      Change(1L, ts("2026-01-01 00:01:00"), 1.0, "a"),
      Change(1L, ts("2026-01-01 00:02:00"), 2.0, "b"),
      Change(1L, ts("2026-01-01 00:11:00"), 4.0, "c"))
    val agg = IncrementalSync.windowedCounts(
      input.toDF(), "ts", "entity_id", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc").orderBy("window_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("events") == 2L)
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
  }

  test("windowedDistinctProfile: sketch-sized streaming distinct counts") {
    val input = MemoryStream[Change](spark)
    // window 1: payloads a,b,a → 2 distinct; window 2: c → 1
    input.addData(
      Change(1L, ts("2026-01-01 00:01:00"), 1.0, "a"),
      Change(1L, ts("2026-01-01 00:02:00"), 2.0, "b"),
      Change(1L, ts("2026-01-01 00:03:00"), 3.0, "a"),
      Change(1L, ts("2026-01-01 00:11:00"), 4.0, "c"))
    val agg = IncrementalSync.windowedDistinctProfile(
      input.toDF(), "ts", "entity_id", "payload",
      "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("wdp")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wdp").orderBy("window_start").collect()
    assert(rows.length == 2)
    // tiny cardinalities: HLL++ is exact here
    assert(rows(0).getAs[Long]("distinct_est") == 2L)
    assert(rows(1).getAs[Long]("distinct_est") == 1L)
  }

  test("dedupWithinWatermark drops repeats inside the horizon, " +
      "state is watermark-bounded") {
    val input = MemoryStream[Change](spark)
    input.addData(
      Change(1L, ts("2026-01-01 00:01:00"), 1.0, "hashA"),
      Change(1L, ts("2026-01-01 00:02:00"), 2.0, "hashA"), // dup in-batch
      Change(2L, ts("2026-01-01 00:03:00"), 3.0, "hashB"))
    val dedup = IncrementalSync.dedupWithinWatermark(
      input.toDF(), Seq("payload"), "ts", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dww")
      .outputMode("append").start()
    q.processAllAvailable()
    // cross-batch dup within the watermark window → also dropped
    input.addData(Change(3L, ts("2026-01-01 00:04:00"), 4.0, "hashA"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dww").collect()
    assert(out.map(_.getAs[String]("payload")).sorted
      .sameElements(Array("hashA", "hashB")))
  }

  test("intervalJoin attributes events to same-key partners within " +
      "the lookback, state evicted by watermark") {
    val conv = MemoryStream[Change](spark)
    val imp = MemoryStream[Change](spark)
    // conversions at 00:30 (entity 1) and 00:40 (entity 2);
    // impressions: entity 1 at 00:25 (in 10-min lookback) and 00:05
    // (outside); entity 2 at 00:45 (in the future — excluded)
    conv.addData(
      Change(1L, ts("2026-01-01 00:30:00"), 1.0, "conv1"),
      Change(2L, ts("2026-01-01 00:40:00"), 1.0, "conv2"))
    imp.addData(
      Change(1L, ts("2026-01-01 00:25:00"), 0.0, "imp-close"),
      Change(1L, ts("2026-01-01 00:05:00"), 0.0, "imp-stale"),
      Change(2L, ts("2026-01-01 00:45:00"), 0.0, "imp-future"))
    val joined = IncrementalSync.intervalJoin(
      conv.toDF(), imp.toDF(), "entity_id", "ts",
      delay = "1 minute", lookback = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ij").collect()
    assert(out.map(r => (r.getAs[String]("payload"),
      r.getAs[String]("r_payload"))).toSet ==
      Set(("conv1", "imp-close")))
  }
}

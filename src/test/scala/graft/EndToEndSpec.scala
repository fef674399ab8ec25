package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Denormalize
import graft.sinks.DocumentSink
import graft.sources.Tables
import graft.streaming.IncrementalSync

/** End-to-end lifecycle proofs tying the pieces together the way the
  * reference's entrypoints do: §3.2 denormalize → §3.1 bulk load
  * (through the DSv2 sink), and the production file-stream path
  * (readStream over parquet → changelog upsert). */
class EndToEndSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("flagship denormalization flows through the graft-bulk DSv2 sink") {
    val out = Files.createTempDirectory("graft-e2e").toString
    val docs = Denormalize(
      Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "region"))
    docs.write.format("graft-bulk")
      .option("path", out)
      .option("requiredCols", "ticket_id")
      .mode("overwrite").save()
    val meta = Files.readString(Paths.get(out, "_meta.json"))
    assert(meta.contains(""""doc_count": 1500"""), meta)
    assert(meta.contains(""""failed": 0"""), meta)
    // bulk wire shape: action line carries the historized document id
    val firstLines = Files.list(Paths.get(out, "data")).iterator().asScala
      .filter(_.toString.endsWith(".jsonl")).toSeq.headOption
      .map(p => Files.readAllLines(p).asScala.take(2)).get
    assert(firstLines.head.startsWith("""{"index":{"_id":""""))
    assert(firstLines(1).contains(""""ticket_id":"""))
  }

  test("file-based changelog stream (readStream parquet) upserts the lake") {
    val lake = Files.createTempDirectory("graft-e2e-lake").toString
    val events = Tables(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    // file streams read directories; the testdata table is a single file
    val streamDir = Files.createTempDirectory("graft-e2e-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(events.schema)
      .parquet(streamDir.toString)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val q = IncrementalSync.changelogUpsert(stream, "user_id", "ts", lake)
      .option("checkpointLocation", s"$lake/_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // one latest-state doc per user
    val expected = events.select("user_id").distinct().count()
    assert(DocumentSink.count(spark, lake) === expected)
  }

  test("CurateData CLI writes a split-partitioned chunk lake") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-curate").toString
    assert(graft.CurateData.run(spark, "/root/testdata/sf0.001", out))
    val chunks = spark.read.parquet(s"$out/chunks")
    assert(chunks.count() > 0)
    assert(chunks.select("split").distinct().count() == 3)
    // partition pruning: a split predicate lists one partition dir
    val plan = chunks.filter(col("split") === "train")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("split=val"),
      s"split filter did not prune partitions:\n$plan")
    // chunks respect the window size
    assert(chunks.agg(max(col("n_chunk_tokens"))).collect()(0)
      .getInt(0) <= 64)
  }
}

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

  test("JDBC production path end-to-end: partitioned extract → " +
    "denormalize → validated document sink (§3.2 over a real database)") {
    // the reference's actual deployment shape (src/db_connector.py:
    // 225-300 partitioned extraction → src/ticket_sync.py denormalize →
    // src/es_connector.py bulk load), composed against embedded Derby
    import java.sql.DriverManager
    import graft.sources.Jdbc
    System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")
    val url = "jdbc:derby:memory:grafte2e;create=true"
    val conn = Jdbc.Conn(url, "app", "app")
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate("CREATE TABLE e2e_tickets (id INT NOT NULL " +
        "PRIMARY KEY, title VARCHAR(64), deleted_at TIMESTAMP)")
      st.executeUpdate("CREATE TABLE e2e_statuses (id INT NOT NULL " +
        "PRIMARY KEY, ticket_id INT, name VARCHAR(32), " +
        "created_at TIMESTAMP)")
      st.executeUpdate("CREATE TABLE e2e_tlabels (ticket_id INT, " +
        "label_id INT)")
      st.executeUpdate("CREATE TABLE e2e_labels (id INT NOT NULL " +
        "PRIMARY KEY, name VARCHAR(32))")
      (1 to 20).foreach { i =>
        val del =
          if (i == 20) "TIMESTAMP('2026-01-01 00:00:00')" else "NULL"
        val title = if (i == 19) "NULL" else s"'ticket $i'"
        st.executeUpdate(s"INSERT INTO e2e_tickets VALUES ($i, $title, $del)")
        // two status rows per ticket: 'open' then 'closed' — latest wins
        st.executeUpdate(s"INSERT INTO e2e_statuses VALUES (${2 * i - 1}, " +
          s"$i, 'open', TIMESTAMP('2026-01-01 10:00:00'))")
        st.executeUpdate(s"INSERT INTO e2e_statuses VALUES (${2 * i}, " +
          s"$i, 'closed', TIMESTAMP('2026-01-02 10:00:00'))")
      }
      st.executeUpdate("INSERT INTO e2e_labels VALUES (1, 'bug')")
      st.executeUpdate("INSERT INTO e2e_labels VALUES (2, 'feature')")
      st.executeUpdate("INSERT INTO e2e_tlabels VALUES (1, 1)")
      st.executeUpdate("INSERT INTO e2e_tlabels VALUES (1, 2)")
      st.executeUpdate("INSERT INTO e2e_tlabels VALUES (2, 2)")
      st.close()
    } finally c.close()

    // extract: partitioned parallel read + soft-delete pushdown
    val tickets = Jdbc.partitionedTable(spark, conn, "e2e_tickets",
        partitionColumn = "ID", lowerBound = 1, upperBound = 20,
        numPartitions = 4)
      .filter(col("DELETED_AT").isNull)
    // denormalize: latest status per ticket + labels-as-array + lineage
    val latest = Denormalize.latestPerKey(
      Jdbc.table(spark, conn, "e2e_statuses"), "TICKET_ID",
      Seq(col("CREATED_AT").desc, col("ID").desc))
    val labels = Jdbc.table(spark, conn, "e2e_tlabels")
      .join(broadcast(Jdbc.table(spark, conn, "e2e_labels")
        .withColumnRenamed("ID", "LID")), col("LABEL_ID") === col("LID"))
      .groupBy(col("TICKET_ID").as("LT_ID"))
      .agg(array_sort(collect_set(col("NAME"))).as("label_names"))
    val docs = tickets
      .join(latest.select(col("TICKET_ID"), col("NAME").as("STATUS")),
        tickets("ID") === col("TICKET_ID"), "left")
      .join(labels, tickets("ID") === col("LT_ID"), "left")
      .select(col("ID").as("ticket_id"), col("TITLE").as("ticket_title"),
        col("STATUS").as("status_name"),
        array_join(coalesce(col("label_names"),
          array().cast("array<string>")), "|").as("labels"))
    val withLineage = Denormalize.withLineage(
      docs, "ticket_id", Denormalize.RunTs)
    // load: validated bulk write with per-item error accounting
    val out = Files.createTempDirectory("graft-e2e-jdbc").toString
    val (ok, bad) = DocumentSink.validatedWrite(withLineage,
      s"$out/tickets", requiredCols = Seq("ticket_id", "ticket_title"))
    // 20 tickets − 1 soft-deleted = 19 extracted; 1 null title → error
    assert(ok == 18L && bad == 1L)
    val stored = spark.read.parquet(s"$out/tickets/data")
    assert(stored.count() == 18)
    val t1 = stored.filter(col("ticket_id") === 1).collect()(0)
    assert(t1.getAs[String]("status_name") == "closed") // latest wins
    assert(t1.getAs[String]("labels") == "bug|feature")
    assert(t1.getAs[String]("document_id") ==
      s"1_${Denormalize.RunTs}")
    assert(stored.filter(col("ticket_id") === 20).isEmpty) // soft-deleted
    // the ES-mapping sidecar derives from the real schema
    val mapping = Files.readString(Paths.get(out, "tickets/_mapping.json"))
    assert(mapping.contains("\"ticket_id\""), mapping)
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

package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sinks.DocumentSink
import graft.sinks.DocumentSink.{BareId, ContentHash, IdTimestamp}

class DocumentSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("content-hash ids are deterministic; id_timestamp historizes") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val h1 = DocumentSink.withDocId(df, ContentHash)
      .select("document_id").collect().map(_.getString(0)).sorted
    val h2 = DocumentSink.withDocId(df, ContentHash)
      .select("document_id").collect().map(_.getString(0)).sorted
    assert(h1.sameElements(h2)) // same content ⇒ same ids (idempotent)
    val t1 = DocumentSink.withDocId(df, IdTimestamp("id", "T1"))
    val t2 = DocumentSink.withDocId(df, IdTimestamp("id", "T2"))
    val ids = (t1.union(t2)).select("document_id").distinct().count()
    assert(ids == 4) // disjoint across runs (append-only historization)
  }

  test("save writes data + derived mapping + count meta") {
    val path = tmp()
    val df = Seq((1L, "x", 1.5)).toDF("id", "name", "score")
    val n = DocumentSink.save(df, path)
    assert(n == 1)
    val mapping = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/_mapping.json")))
    assert(mapping.contains("\"id\": {\"type\": \"long\"}"))
    assert(mapping.contains("\"name\": {\"type\": \"text\"}"))
    assert(mapping.contains("\"score\": {\"type\": \"double\"}"))
  }

  test("validatedWrite splits failures to the error side-channel") {
    val path = tmp()
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
                 (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("id", "v")
    val (ok, bad) = DocumentSink.validatedWrite(df, path, Seq("id"))
    assert(ok == 1 && bad == 1)
  }

  test("upsert overwrites by document_id, keeps others") {
    val path = tmp()
    val v1 = DocumentSink.withDocId(
      Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), BareId("id"))
    DocumentSink.save(v1, path)
    val v2 = DocumentSink.withDocId(
      Seq((1L, "new")).toDF("id", "v"), BareId("id"))
    val n = DocumentSink.upsert(v2, path)
    assert(n == 2)
    val out = spark.read.parquet(s"$path/data")
      .orderBy("id").collect().map(_.getAs[String]("v")).toSeq
    assert(out == Seq("new", "keep"))
  }

  test("overwrite mode is drop-and-recreate (destructive, like the ES sink)") {
    val path = tmp()
    DocumentSink.save(Seq((1L, "a")).toDF("id", "v"), path)
    DocumentSink.save(Seq((2L, "b")).toDF("id", "v"), path,
      SaveMode.Overwrite)
    val rows = spark.read.parquet(s"$path/data").collect()
    assert(rows.length == 1 && rows(0).getAs[String]("v") == "b")
  }
}

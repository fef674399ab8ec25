package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.Ingest

/** Corrupt-tolerant raw-file ingestion: a malformed line never fails
  * the job and never silently vanishes — it lands in the quarantine
  * frame with its raw text. */
class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.resolve(name).toString
  }

  test("jsonl: clean rows typed, broken lines quarantined with raw text") {
    val path = write("in.jsonl", Seq(
      """{"id": 1, "name": "a", "score": 1.5}""",
      """{"id": 2, "name": "b", "score": 2.5}""",
      """{"id": 3, "name": "c", "score": BROKEN"""))
    val (good, bad) = Ingest.jsonl(spark, path, schema)
    assert(good.count() == 2)
    assert(good.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(good.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
    val rows = bad.collect().map(_.getString(0))
    assert(rows.length == 1 && rows(0).contains("BROKEN"))
  }

  test("csv: type-mismatched row quarantined, not nulled into the clean set") {
    val path = write("in.csv", Seq(
      "id,name,score",
      "1,a,1.5",
      "oops,b,not_a_number",
      "3,c,3.5"))
    val (good, bad) = Ingest.csv(spark, path, schema)
    assert(good.count() == 2)
    assert(good.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 3L))
    val rows = bad.collect().map(_.getString(0))
    assert(rows.length == 1 && rows(0).startsWith("oops"))
  }

  test("fully clean input yields an empty quarantine") {
    val path = write("ok.jsonl",
      Seq("""{"id": 9, "name": "z", "score": 0.25}"""))
    val (good, bad) = Ingest.jsonl(spark, path, schema)
    assert(good.count() == 1 && bad.count() == 0)
  }
}

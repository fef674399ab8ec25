package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** The graft-bulk DataSourceV2 sink: ES-bulk-shaped NDJSON output,
  * per-record error quarantine, commit-time count aggregation,
  * overwrite-as-truncate. */
class BulkDocsSpec extends SparkSpec {
  import spark.implicits._

  private def readAll(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".jsonl"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  test("writes bulk action/doc line pairs with _id, meta counts match") {
    val path = Files.createTempDirectory("graft-bulk").toString
    Seq((1L, "alice", "1_t"), (2L, "bob", "2_t"))
      .toDF("id", "name", "document_id")
      .coalesce(1)
      .write.format("graft-bulk").option("path", path).mode("append").save()

    val lines = readAll(s"$path/data")
    assert(lines.length === 4) // 2 docs × (action + source)
    assert(lines(0) === """{"index":{"_id":"1_t"}}""")
    assert(lines(1) === """{"id":1,"name":"alice","document_id":"1_t"}""")

    val meta = Files.readString(Paths.get(path, "_meta.json"))
    assert(meta.contains(""""doc_count": 2""") && meta.contains(""""failed": 0"""))
    val mapping = Files.readString(Paths.get(path, "_mapping.json"))
    assert(mapping.contains(""""name": {"type": "text"}"""))
  }

  test("rows missing requiredCols are quarantined, not fatal") {
    val path = Files.createTempDirectory("graft-bulk").toString
    Seq((Some(1L), "ok"), (None, "bad"))
      .toDF("id", "v")
      .coalesce(1)
      .write.format("graft-bulk")
      .option("path", path).option("requiredCols", "id").mode("append").save()

    assert(readAll(s"$path/data").length === 2) // 1 good doc
    assert(readAll(s"$path/_errors").length === 1)
    val meta = Files.readString(Paths.get(path, "_meta.json"))
    assert(meta.contains(""""doc_count": 1""") && meta.contains(""""failed": 1"""))
  }

  private def causeChain(t: Throwable): Seq[Throwable] = {
    val b = Seq.newBuilder[Throwable]
    var cur = t
    while (cur != null && !b.result().contains(cur)) { b += cur; cur = cur.getCause }
    b.result()
  }

  test("misspelled docIdCol fails the job at the driver, not row-by-row") {
    val path = Files.createTempDirectory("graft-bulk").toString
    val e = intercept[Throwable] {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-bulk")
        .option("path", path).option("docIdCol", "documnt_id")
        .mode("append").save()
    }
    assert(causeChain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("not in schema")),
      s"expected driver-side misconfiguration failure, got: $e")
  }

  test("non-string docIdCol fails fast with a cast hint") {
    val path = Files.createTempDirectory("graft-bulk").toString
    val e = intercept[Throwable] {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-bulk")
        .option("path", path).option("docIdCol", "id")
        .mode("append").save()
    }
    assert(causeChain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("must be StringType")),
      s"expected StringType validation failure, got: $e")
  }

  test("overwrite truncates (drop-and-recreate semantics)") {
    val path = Files.createTempDirectory("graft-bulk").toString
    def write(n: Int): Unit =
      (1 to n).map(i => (i.toLong, s"${i}_t")).toDF("id", "document_id")
        .coalesce(1)
        .write.format("graft-bulk").option("path", path)
        .mode("overwrite").save()
    write(5)
    write(2)
    val meta = Files.readString(Paths.get(path, "_meta.json"))
    assert(meta.contains(""""doc_count": 2"""))
    assert(readAll(s"$path/data").length === 4)
  }

  test("append accumulates across writes instead of clobbering") {
    val path = Files.createTempDirectory("graft-bulk").toString
    def append(ids: Range): Unit =
      ids.map(i => (i.toLong, s"${i}_t")).toDF("id", "document_id")
        .coalesce(1)
        .write.format("graft-bulk").option("path", path)
        .mode("append").save()
    append(1 to 3)
    append(4 to 5)
    assert(readAll(s"$path/data").length === 10) // (3+2) docs × 2 lines
    val meta = Files.readString(Paths.get(path, "_meta.json"))
    assert(meta.contains(""""doc_count": 5"""), meta)
  }

  test("parallel partitions each write their own bulk file") {
    val path = Files.createTempDirectory("graft-bulk").toString
    spark.range(100).selectExpr("id", "cast(id as string) AS document_id")
      .repartition(4)
      .write.format("graft-bulk").option("path", path).mode("overwrite").save()
    val files = Files.list(Paths.get(path, "data")).iterator().asScala
      .filter(_.toString.endsWith(".jsonl")).toSeq
    assert(files.size === 4)
    val meta = Files.readString(Paths.get(path, "_meta.json"))
    assert(meta.contains(""""doc_count": 100"""))
  }
}

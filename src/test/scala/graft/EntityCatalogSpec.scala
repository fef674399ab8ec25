package graft

import org.apache.spark.sql.functions._

import graft.catalog.{EntityCatalog, EntitySpec}

class EntityCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val spec = EntitySpec("user", "id", Seq("id", "name"))
  private def users = Seq(
    (java.lang.Long.valueOf(1L), "alice"),
    (java.lang.Long.valueOf(2L), null),
    (null.asInstanceOf[java.lang.Long], "ghost")
  ).toDF("id", "name")

  test("pipeline namespaces, validates, and stamps lineage") {
    val docs = EntityCatalog.pipeline(users, spec, "2026-01-01T00:00:00Z")
    assert(docs.columns.toSeq == Seq("user_id", "user_name", "table",
      "document_id", "indexed_at"))
    val rows = docs.collect()
    assert(rows.length == 1) // only the fully-valid row survives
    assert(rows(0).getAs[String]("document_id") == "1_2026-01-01T00:00:00Z")
    assert(rows(0).getAs[String]("table") == "user")
  }

  test("rejects captures exactly the invalid rows (bulk error contract)") {
    val bad = EntityCatalog.rejects(users, spec)
    assert(bad.count() == 2)
  }

  test("catalog + pipeline replaces per-entity copies: all specs run") {
    // every cataloged entity spec produces a namespaced, lineage-stamped
    // frame from a one-row sample with its required columns
    for ((name, s) <- EntityCatalog.entities if name == "nation") {
      val df = Seq((1L, "x", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      val docs = EntityCatalog.pipeline(df, s, "2026-01-01T00:00:00Z")
      assert(docs.columns.contains(s"${name}_n_name"))
      assert(docs.count() == 1)
    }
  }

  test("defaulted mints uuids for null ids and stamps null timestamps") {
    val withTs = users.withColumn("createdAt",
      when(col("id") === 1L, lit("2026-01-01 00:00:00").cast("timestamp")))
    val out = EntityCatalog.defaulted(withTs, spec, Seq("createdAt"))
      .collect()
    val ids = out.map(_.getAs[String]("id"))
    assert(ids.forall(_ != null))
    assert(ids.toSet.size == 3) // minted ids are unique
    // uuid v4 shape for the minted one
    assert(ids.exists(_.matches("[0-9a-f-]{36}")))
    assert(out.forall(!_.isNullAt(out.head.fieldIndex("createdAt"))))
  }

  test("fieldTypes: jsonCols→object, textCols→text, other strings→keyword") {
    val s = EntitySpec("doc", "id", Seq("id"),
      jsonCols = Seq("payload"), textCols = Seq("body"))
    val df = Seq((1L, """{"a":1}""", "hello world", "OPEN"))
      .toDF("id", "payload", "body", "status")
    val docs = EntityCatalog.pipeline(df, s, "2026-01-01T00:00:00Z")
    val ft = EntityCatalog.fieldTypes(docs.schema, s)
    assert(ft("doc_payload") == "object")
    assert(ft("doc_body") == "text")
    assert(ft("doc_status") == "keyword") // varchar-like ⇒ keyword
    assert(ft("table") == "keyword" && ft("document_id") == "keyword")
    assert(!ft.contains("doc_id")) // non-string: schema-derived type wins
    // and the sink sidecar reflects it end-to-end
    val out = java.nio.file.Files.createTempDirectory("graft-ft").toString
    graft.sinks.DocumentSink.save(docs, out, fieldTypes = ft)
    val mapping = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_mapping.json"))
    assert(mapping.contains("\"doc_payload\": {\"type\": \"object\"}"))
    assert(mapping.contains("\"doc_body\": {\"type\": \"text\"}"))
    assert(mapping.contains("\"doc_status\": {\"type\": \"keyword\"}"))
  }

  test("syncAll writes one validated index per entity with counts") {
    val out = java.nio.file.Files.createTempDirectory("graft-sync").toString
    val counts = EntityCatalog.syncAll(
      spark, "/root/testdata/sf0.001", out, "2026-01-01T00:00:00Z")
    assert(counts.keySet == EntityCatalog.entities.keySet)
    assert(counts.values.forall { case (ok, _) => ok > 0 })
    // sidecars for a sample entity
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "customer", "_mapping.json")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "customer", "_meta.json")))
  }
}

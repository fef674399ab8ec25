package graft

import org.apache.spark.sql.DataFrame

import graft.serving.Search
import graft.sinks.{DocumentSink, SearchIndex}

/** The write-time search index must be INDISTINGUISHABLE from the
  * scan-path scorers in results (same expression tree over the same
  * integers ⇒ same doubles), radically different in plan (postings
  * probe, no corpus scan), and exactly maintainable under upserts
  * (integer-delta statistics == full rebuild). */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs = Seq(
    (1L, "the window is a window", "src_a"),
    (2L, "no match here", "src_b"),
    (3L, "window", "window_src3"),
    (4L, null, "also window src3"),
    (5L, "the the the of of window batch", "src3"),
    (6L, "of a window to the batch run", null)
  ).toDF("doc_id", "text", "source")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("indexed bm25/tfidf == scan-path scorers, bit for bit, across " +
    "single-field, most_fields, best_fields, boosts and cursors") {
    val path = tmp("graft-idx-eq-")
    SearchIndex.build(docs, Seq("text", "source"), "doc_id", path)
    val cases: Seq[(DataFrame, DataFrame)] = Seq(
      // single field, bm25
      Search.bm25(docs, "window the of", "text", "doc_id") ->
        SearchIndex.ranked(spark, path, "window the of", Seq("text")),
      // single field, tfidf
      Search.tfidf(docs, "window the of", "text", "doc_id") ->
        SearchIndex.ranked(spark, path, "window the of", Seq("text"),
          bm25 = false),
      // most_fields sum across both fields
      Search.bm25Fields(docs, "window src3", Seq("text", "source"),
        "doc_id") ->
        SearchIndex.ranked(spark, path, "window src3",
          Seq("text", "source")),
      // best_fields max
      Search.bm25Fields(docs, "window src3", Seq("text", "source"),
        "doc_id", bestFields = true) ->
        SearchIndex.ranked(spark, path, "window src3",
          Seq("text", "source"), bestFields = true),
      // field^boost
      Search.bm25Fields(docs, "window src3", Seq("text", "source"),
        "doc_id", boosts = Map("source" -> 3.0)) ->
        SearchIndex.ranked(spark, path, "window src3",
          Seq("text", "source"), boosts = Map("source" -> 3.0)),
      // pagination cursor (strictly-after semantics)
      Search.bm25Fields(docs, "window src3", Seq("text", "source"),
        "doc_id", after = Some((2.0, 1L))) ->
        SearchIndex.ranked(spark, path, "window src3",
          Seq("text", "source"), after = Some((2.0, 1L))))
    cases.zipWithIndex.foreach { case ((scan, probe), i) =>
      val s = scan.collect().map(_.toString).toSeq
      val p = probe.collect().map(_.toString).toSeq
      assert(p == s, s"case $i: indexed != scan\nscan:  $s\nprobe: $p")
      assert(s.nonEmpty, s"case $i: degenerate (empty) comparison")
    }
  }

  test("probe plan reads ONLY the index (term filter pushed to the " +
    "postings scan) — no corpus scan, no corpus-wide aggregate") {
    val src = tmp("graft-idx-src-")
    docs.write.mode("overwrite").parquet(s"$src/docs.parquet")
    val onDisk = spark.read.parquet(s"$src/docs.parquet")
    val path = tmp("graft-idx-plan-")
    SearchIndex.build(onDisk, Seq("text", "source"), "doc_id", path)
    val probe = SearchIndex.ranked(spark, path, "window src3",
      Seq("text", "source"))
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10000")
      probe.collect()
      val plan = probe.queryExecution.executedPlan.toString
      assert(!plan.contains(src),
        s"probe plan scans the corpus:\n$plan")
      assert(plan.contains("In(term"),
        s"term filter not pushed to the postings scan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"cartesian in the probe plan:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"),
        s"top-k is not a TakeOrdered:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("upsert == full rebuild: postings, doclens, termstats, " +
    "fieldstats and query results all identical after replace+insert") {
    val v2new = Seq(
      (3L, "batch of batch window", "src9"), // replaces doc 3
      (7L, "a brand new window doc", null))  // inserted
      .toDF("doc_id", "text", "source")
    val merged = docs.filter($"doc_id" =!= 3L).unionByName(v2new)
    val inc = tmp("graft-idx-inc-")
    val reb = tmp("graft-idx-reb-")
    SearchIndex.build(docs, Seq("text", "source"), "doc_id", inc)
    SearchIndex.upsert(v2new, inc)
    SearchIndex.build(merged, Seq("text", "source"), "doc_id", reb)
    for (t <- Seq("postings", "doclens", "termstats", "fieldstats")) {
      val a = sortedRows(spark.read.parquet(s"$inc/$t"))
      val b = sortedRows(spark.read.parquet(s"$reb/$t"))
      assert(a == b, s"$t diverged after upsert\nupserted: $a\nrebuilt:  $b")
    }
    val qi = SearchIndex.ranked(spark, inc, "window batch of",
      Seq("text", "source")).collect().map(_.toString).toSeq
    val qr = SearchIndex.ranked(spark, reb, "window batch of",
      Seq("text", "source")).collect().map(_.toString).toSeq
    val qs = Search.bm25Fields(merged, "window batch of",
      Seq("text", "source"), "doc_id").collect().map(_.toString).toSeq
    assert(qi == qr, "upserted index ranks differently from rebuild")
    assert(qi == qs, "upserted index ranks differently from scan path")
  }

  test("DocumentSink.upsert maintains an adjacent search index " +
    "incrementally (the R1/R2 re-sync path)") {
    val path = tmp("graft-idx-sink-")
    val v1 = docs.withColumn("document_id",
      org.apache.spark.sql.functions.col("doc_id").cast("string"))
    DocumentSink.save(v1, path)
    SearchIndex.build(v1, Seq("text", "source"), "document_id",
      s"$path/_search_index")
    val batch = Seq((2L, "window window window", "src3", "2"))
      .toDF("doc_id", "text", "source", "document_id")
    DocumentSink.upsert(batch, path)
    // the maintained index must equal one rebuilt from the merged docs
    val mergedDocs = spark.read.parquet(s"$path/data")
    val reb = tmp("graft-idx-sink-reb-")
    SearchIndex.build(mergedDocs, Seq("text", "source"), "document_id", reb)
    val a = SearchIndex.ranked(spark, s"$path/_search_index",
      "window src3", Seq("text", "source")).collect().map(_.toString).toSeq
    val b = SearchIndex.ranked(spark, reb,
      "window src3", Seq("text", "source")).collect().map(_.toString).toSeq
    assert(a == b, s"sink-maintained index != rebuild\nmaint: $a\nreb:   $b")
    assert(a.exists(_.contains("[2,")), "upserted doc missing from ranking")
  }

  test("indexed data_lake_* wildcard == scan-path wildcard, with and " +
    "without a 3-key cursor") {
    val dir = "/root/testdata/sf0.001"
    val runTs = queries.ParityQueries.RunTs
    val root = tmp("graft-idx-union-")
    Search.buildEntityIndexes(spark, dir, root, runTs)
    val scan = Search.acrossIndexesRanked(spark, dir, runTs,
      "small error household").collect().map(_.toString).toSeq
    val probe = Search.acrossIndexesRankedIndexed(spark, root,
      "small error household").collect().map(_.toString).toSeq
    assert(probe == scan, s"wildcard indexed != scan\n${
      scan.take(5)}\nvs\n${probe.take(5)}")
    assert(scan.nonEmpty)
    // resume from hit #7's (score, document_id, table) — both paths
    // must produce the identical continuation
    val anchor = Search.acrossIndexesRanked(spark, dir, runTs,
      "small error household").collect()(6)
    val cur = Some((anchor.getDouble(2), anchor.getString(1),
      anchor.getString(0)))
    val scanPage = Search.acrossIndexesRanked(spark, dir, runTs,
      "small error household", limit = 10, after = cur)
      .collect().map(_.toString).toSeq
    val probePage = Search.acrossIndexesRankedIndexed(spark, root,
      "small error household", limit = 10, after = cur)
      .collect().map(_.toString).toSeq
    assert(probePage == scanPage,
      s"cursor continuation diverged\n$scanPage\nvs\n$probePage")
    assert(scanPage.size == 10)
  }
}

package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.serving.Percolate

/** Reverse search: stored queries against request documents
  * ([[graft.serving.Percolate]]). */
class PercolateSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def q(json: String) = mapper.readTree(json)

  private def docsDf = Seq(
    (1L, "window batch run", "en", 120L),
    (2L, "window only", "de", 250L),
    (3L, "nothing here", "en", 90L),
    (4L, "batch batch window", "en", 300L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  private val stored = Seq(
    "pq_win"  -> q("""{"match": {"text": "window"}}"""),
    "pq_long" -> q("""{"range": {"n_chars": {"gte": 200}}}"""),
    "pq_en"   -> q("""{"term": {"lang": "en"}}"""))

  test("tagAll: one scan tags every document with its matching " +
    "stored queries in stored order; unmatched rows drop by default") {
    val out = Percolate.tagAll(docsDf, stored)
      .orderBy($"doc_id")
      .select($"doc_id", $"matched_queries").as[(Long, String)]
      .collect().toSeq
    assert(out == Seq(
      1L -> "pq_win,pq_en",
      2L -> "pq_win,pq_long",
      3L -> "pq_en",
      4L -> "pq_win,pq_long,pq_en"))
    // keepUnmatched keeps every row (none unmatched here, so equal
    // counts prove only the flag path compiles; add a no-match query)
    val none = stored :+ ("pq_never" -> q("""{"term": {"lang": "xx"}}"""))
    val kept = Percolate.tagAll(docsDf.filter($"doc_id" === 99),
      none, keepUnmatched = true)
    assert(kept.count() == 0 && kept.columns.contains("matched_queries"))
  }

  test("matches: document slots per stored query; a query on a field " +
    "the documents lack never matches (ES percolator semantics)") {
    val docs = Seq(
      q("""{"text": "window", "lang": "en"}"""),
      q("""{"text": "nope", "lang": "de", "extra": 5}"""))
    val hit = Percolate.matches(spark, stored :+
      ("pq_ghost" -> q("""{"range": {"no_such_field": {"gte": 1}}}""")) :+
      ("pq_extra" -> q("""{"range": {"extra": {"gte": 1}}}""")), docs)
    // n_chars absent from BOTH docs -> pq_long never matches;
    // no_such_field absent -> never matches; extra present on slot 1
    assert(hit == Seq(
      "pq_win" -> Seq(0L),
      "pq_en" -> Seq(0L),
      "pq_extra" -> Seq(1L)))
  }

  test("search: hits are the stored-query ROWS with _score and " +
    "_percolator_document_slot, ordered by id") {
    val queriesDf = Seq(
      ("a_win", """{"match": {"text": "window"}}""", "alerting"),
      ("b_de", """{"term": {"lang": "de"}}""", "routing"),
      ("c_none", """{"term": {"lang": "xx"}}""", "dead")
    ).toDF("query_id", "query", "purpose")
    val hits = Percolate.search(queriesDf, "query", Seq(
      q("""{"text": "a window", "lang": "en"}"""),
      q("""{"text": "b", "lang": "de"}""")))
    val got = hits.select($"query_id", $"purpose", $"_score",
      $"_percolator_document_slot").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a_win", "b_de"))
    assert(got.forall(_.getDouble(2) == 1.0))
    assert(got.map(_.getSeq[Long](3)).toSeq == Seq(Seq(0L), Seq(1L)))
    // full stored row content rides along
    assert(got.map(_.getString(1)).toSeq == Seq("alerting", "routing"))
  }

  test("fail-loud boundary: unsupported constructs throw with the " +
    "construct named; malformed stored JSON, empty documents, the " +
    "query-count bound, reserved slot field") {
    val e = intercept[IllegalArgumentException] {
      Percolate.tagAll(docsDf,
        Seq("x" -> q("""{"made_up_query": {}}""")))
    }
    assert(e.getMessage.contains("made_up_query"))
    intercept[IllegalArgumentException] {
      Percolate.search(
        Seq(("a", "not json")).toDF("id", "query"), "query",
        Seq(q("""{"text": "x"}""")))
    }
    intercept[IllegalArgumentException] {
      Percolate.matches(spark, stored, Nil)
    }
    intercept[IllegalArgumentException] {
      Percolate.matches(spark,
        (1 to Percolate.MaxQueries + 1).map(i =>
          s"q$i" -> q("""{"match_all": {}}""")),
        Seq(q("""{"text": "x"}""")))
    }
    intercept[IllegalArgumentException] {
      Percolate.matches(spark, stored,
        Seq(q("""{"__percolator_slot__": 1}""")))
    }
    intercept[IllegalArgumentException] {
      Percolate.matches(spark, stored, Seq(q("[1]")))
    }
  }

  test("document validation runs BEFORE the empty-query early return: " +
    "a malformed document 400s identically with zero stored queries") {
    intercept[IllegalArgumentException] {
      Percolate.matches(spark, Nil, Seq(q("[1]")))
    }
    intercept[IllegalArgumentException] {
      Percolate.matches(spark, Nil,
        Seq(q("""{"__percolator_slot__": 1}""")))
    }
    intercept[IllegalArgumentException] { Percolate.matches(spark, Nil, Nil) }
    // well-formed documents against an empty store: still no hits
    assert(Percolate.matches(spark, Nil,
      Seq(q("""{"text": "x"}"""))) == Nil)
  }

  test("cross-document TYPE conflicts reject by name (merged schema " +
    "inference would flip comparisons to lexicographic)") {
    val e = intercept[IllegalArgumentException] {
      Percolate.matches(spark, stored, Seq(
        q("""{"n_chars": 250, "text": "a"}"""),
        q("""{"n_chars": "many", "text": "b"}""")))
    }
    assert(e.getMessage.contains("n_chars") &&
      e.getMessage.contains("number") && e.getMessage.contains("string"))
    // nested objects recurse; null is compatible with anything;
    // int vs double is NOT a conflict (numeric widening is faithful)
    intercept[IllegalArgumentException] {
      Percolate.matches(spark, stored, Seq(
        q("""{"meta": {"depth": 1}}"""),
        q("""{"meta": {"depth": [2]}}""")))
    }
    assert(Percolate.matches(spark,
      Seq("pq" -> q("""{"range": {"n_chars": {"gte": 2}}}""")),
      Seq(q("""{"n_chars": 1}"""), q("""{"n_chars": null}"""),
        q("""{"n_chars": 2.5}"""))) == Seq("pq" -> Seq(2L)))
  }

  test("a stored query with a TYPE error stays loud instead of " +
    "silently never-matching (only missing fields map to no-match)") {
    // range over a field the documents carry as an OBJECT: the
    // analysis probe fails with a non-resolution error -> rethrown
    intercept[Exception] {
      Percolate.matches(spark,
        Seq("bad" -> q("""{"range": {"meta": {"gte": 1}}}""")),
        Seq(q("""{"meta": {"a": 1}}""")))
    }
    // eagerly-validated clause kinds route through the SAME
    // never-match path as lazily-resolved ones: combined_fields and
    // query_string on a missing field no-match instead of 400ing
    assert(Percolate.matches(spark,
      Seq("cf" -> q(
        """{"combined_fields": {"query": "x", "fields": ["ghost"]}}""")),
      Seq(q("""{"text": "x"}"""))) == Nil)
    assert(Percolate.matches(spark,
      Seq("qs" -> q(
        """{"query_string": {"query": "ghost:[1 TO 2]"}}""")),
      Seq(q("""{"text": "x"}"""))) == Nil)
  }
}

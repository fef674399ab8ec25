package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.serving.EsDsl

/** The ES-DSL translator's semantics: scoring combination, bool
  * minimum_should_match defaulting, null-safe must_not, sort, and the
  * explicit-rejection contract for unsupported constructs. */
class EsDslSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def q(json: String) =
    EsDsl.search(docs, mapper.readTree(json))

  private def docs = Seq(
    (1L, "window batch run", "src3", 10L),
    (2L, "window only", "src1", 20L),
    (3L, "nothing here", null, 30L),
    (4L, "batch batch window", "src3", 40L)
  ).toDF("doc_id", "text", "source", "n")

  test("match scores by token counts; operator and bool combination " +
    "follow ES rules") {
    val or = q("""{"query": {"match": {"text": "window batch"}},
      "size": 10}""").collect()
    assert(or.map(_.getLong(0)).toSeq == Seq(4L, 1L, 2L)) // 3,2,1 counts
    assert(or.map(_.getDouble(4)).toSeq == Seq(3.0, 2.0, 1.0))
    val and = q("""{"query": {"match": {"text":
      {"query": "window batch", "operator": "and"}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSeq
    assert(and == Seq(4L, 1L)) // doc 2 lacks "batch"
    // bool: must scores + matching should scores; filter scores 0
    val b = q("""{"query": {"bool": {
      "must": [{"match": {"text": "window"}}],
      "filter": [{"range": {"n": {"lte": 20}}}],
      "should": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect()
    assert(b.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(b.map(_.getDouble(4)).toSeq == Seq(2.0, 1.0)) // 1+1 vs 1+0
  }

  test("bool minimum_should_match: defaults to 1 without must/filter, " +
    "0 with; explicit specs use the full grammar") {
    val shouldOnly = q("""{"query": {"bool": {
      "should": [{"term": {"source": "src3"}},
                 {"term": {"source": "src1"}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(shouldOnly == Set(1L, 2L, 4L)) // doc 3 matches neither
    val withMust = q("""{"query": {"bool": {
      "must": [{"match": {"text": "nothing"}}],
      "should": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(withMust == Set(3L)) // should optional when must present
    val pct = q("""{"query": {"bool": {
      "should": [{"term": {"source": "src3"}},
                 {"term": {"source": "src1"}}],
      "minimum_should_match": "100%"}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(pct.isEmpty) // no doc has both sources
  }

  test("must_not is null-safe (ES: null fields PASS a must_not term)") {
    val r = q("""{"query": {"bool": {
      "must_not": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(r == Set(2L, 3L)) // doc 3's null source must pass
  }

  test("terms / range / exists filter; explicit sort gets the id " +
    "tiebreak appended") {
    val r = q("""{"query": {"terms": {"source": ["src1", "src3"]}},
      "size": 10, "sort": [{"n": {"order": "desc"}}]}""")
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(4L, 2L, 1L))
    val ex = q("""{"query": {"exists": {"field": "source"}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(ex == Set(1L, 2L, 4L))
  }

  test("multi_match with boosts and best_fields; fuzziness widens the " +
    "match") {
    val mm = q("""{"query": {"multi_match": {"query": "window src3",
      "fields": ["text", "source^3"], "type": "best_fields"}},
      "size": 10}""").collect()
    // doc 1: text 1 vs source 3 -> 3.0; doc 4: max(1, 3) = 3.0
    assert(mm.map(r => r.getLong(0) -> r.getDouble(4)).toMap ==
      Map(1L -> 3.0, 2L -> 1.0, 4L -> 3.0))
    val fz = q("""{"query": {"match": {"text":
      {"query": "windoq", "fuzziness": "1"}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(fz == Set(1L, 2L, 4L))
  }

  test("from + size page deterministically: two pages == one larger " +
    "request") {
    val all = q("""{"query": {"match_all": {}}, "size": 4}""")
      .collect().map(_.getLong(0)).toSeq
    val p1 = q("""{"query": {"match_all": {}}, "size": 2}""")
      .collect().map(_.getLong(0)).toSeq
    val p2 = q("""{"query": {"match_all": {}}, "from": 2, "size": 2}""")
      .collect().map(_.getLong(0)).toSeq
    assert(p1 ++ p2 == all, s"$p1 ++ $p2 != $all")
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "from": 999, "size": 5}""")
    }
  }

  test("match_phrase (adjacency), ids, and constant_score translate") {
    val ph = q("""{"query": {"match_phrase": {"text": "window batch"}},
      "size": 10}""").collect().map(_.getLong(0)).toSeq
    assert(ph == Seq(1L)) // only doc 1 has the tokens ADJACENT in order
    val ids = q("""{"query": {"ids": {"values": [2, 4]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 4L))
    val cs = q("""{"query": {"constant_score": {"filter":
      {"term": {"source": "src3"}}, "boost": 2.5}}, "size": 10}""")
      .collect()
    assert(cs.map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(cs.forall(_.getDouble(4) == 2.5))
  }

  test("aggregations: terms buckets with metric sub-aggs follow ES " +
    "ordering; global metrics return one row; unsupported aggs reject") {
    val b = q("""{"query": {"match_all": {}},
      "aggs": {"by_source": {"terms": {"field": "source", "size": 10},
        "aggs": {"avg_n": {"avg": {"field": "n"}},
                 "total_n": {"sum": {"field": "n"}},
                 "docs": {"value_count": {"field": "doc_id"}}}}},
      "size": 0}""").collect()
    // buckets: src3 ×2 then src1 ×1 — ES terms buckets SKIP documents
    // missing the field, so doc 3's null source forms no bucket
    assert(b.map(_.getString(0)).toSeq == Seq("src3", "src1"))
    val src3 = b.find(_.getString(0) == "src3").get
    assert(src3.getLong(1) == 2L)          // doc_count
    assert(src3.getDouble(2) == 25.0)      // avg of 10, 40
    assert(src3.getLong(3) == 50L)         // sum
    assert(src3.getLong(4) == 2L)          // value_count
    val g = q("""{"query": {"term": {"source": "src3"}},
      "aggs": {"n_docs": {"value_count": {"field": "doc_id"}}}}""")
      .collect()
    assert(g.length == 1 && g.head.getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "aggs": {"h": {"date_histogram": {"field": "n"}}}}""").collect()
    }
    // histogram: fixed-interval buckets keyed by lower bound, in order
    val h = q("""{"query": {"match_all": {}},
      "aggs": {"by_n": {"histogram": {"field": "n", "interval": 25}}}}""")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toSeq
    assert(h == Seq(0.0 -> 2L, 25.0 -> 2L)) // n=10,20 | 30,40
  }

  test("nested terms-in-terms buckets: top parents, top children per " +
    "parent, child metrics; parent-level metrics beside them reject") {
    val n = q("""{"query": {"match_all": {}},
      "aggs": {"by_source": {"terms": {"field": "source", "size": 2},
        "aggs": {"by_text": {"terms": {"field": "text", "size": 1},
          "aggs": {"max_n": {"max": {"field": "n"}}}}}}},
      "size": 0}""").collect()
    // top-2 parents: src3 (2 docs), then src1 (1; null source is no
    // bucket) — each with its single top child bucket (texts unique, so
    // doc_count 1, key asc wins)
    assert(n.length == 2, n.mkString("; "))
    val bySrc = n.map(r => r.getString(0) -> r).toMap
    assert(bySrc.contains("src3") && bySrc.contains("src1"))
    val s3 = bySrc("src3")
    assert(s3.getAs[Long]("parent_doc_count") == 2L)
    assert(s3.getAs[String]("text") == "batch batch window") // key asc
    assert(s3.getAs[Long]("doc_count") == 1L)
    assert(s3.getAs[Long]("max_n") == 40L)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "aggs": {"a": {"terms": {"field": "source"},
          "aggs": {"b": {"terms": {"field": "text"}},
                   "m": {"avg": {"field": "n"}}}}}}""")
    }
  }

  test("date_histogram rejects malformed, calendar, and zero intervals") {
    for (iv <- Seq("\"1month\"", "\"xx\"", "\"0d\""))
      intercept[IllegalArgumentException] {
        q(s"""{"query": {"match_all": {}},
          "aggs": {"t": {"date_histogram":
            {"field": "n", "fixed_interval": $iv}}}}""")
      }
  }

  test("_source filtering: false returns hit identity, an array a " +
    "column subset; unknown fields reject") {
    val idOnly = q("""{"query": {"term": {"source": "src3"}},
      "_source": false, "size": 10}""")
    assert(idOnly.columns.toSeq == Seq("doc_id", "_score"))
    assert(idOnly.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    val subset = q("""{"query": {"match_all": {}},
      "_source": ["source", "n"], "size": 10}""")
    assert(subset.columns.toSeq == Seq("source", "n", "_score"))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "_source": ["nope"]}""")
    }
  }

  test("unsupported constructs are rejected by name, never mistranslated") {
    for (body <- Seq(
        """{"query": {"query_string": {"query": "x"}}}""",
        """{"query": {"span_near": {"clauses": []}}}""",
        """{"size": 10}""",
        """{"query": {"bool": {"should": []}, "extra": 1}}""",
        """{"query": {"range": {"n": {}}}}"""))
      intercept[IllegalArgumentException] { q(body).collect() }
    // size above the serving cap is refused, not silently clamped
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "size": 100000}""").collect()
    }
  }
}

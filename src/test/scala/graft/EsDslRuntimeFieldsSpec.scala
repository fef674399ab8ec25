package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.serving.EsDsl

/** Runtime fields, the fields/script_fields response options, and the
  * computed sort entries (_geo_distance, _script): value correctness,
  * the runtime-fields-are-not-source contract, Infinity for missing
  * geo points, and the named-rejection edge of every new knob. */
class EsDslRuntimeFieldsSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def sales = Seq(
    (1L, 10.0, 3L, "a"),
    (2L, 5.0, 10L, "b"),
    (3L, 20.0, 1L, "a"),
    (4L, 8.0, 4L, "b")
  ).toDF("id", "price", "qty", "tag")

  private def geoDf = Seq(
    (1L, Some(0.0), Some(10.0)),   // ~1113 km from origin
    (2L, Some(0.0), Some(1.0)),    // ~111 km
    (3L, None: Option[Double], None: Option[Double]), // missing point
    (4L, Some(0.0), Some(5.0))     // ~556 km
  ).toDF("id", "lat", "lon")
    .selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS loc")

  test("runtime field: queryable, sortable, aggregatable; surfaces " +
    "ONLY through fields, never as a raw or _source column") {
    val body = mapper.readTree(
      """{"runtime_mappings": {"total": {"type": "double",
        |   "script": {"source":
        |     "emit(doc['price'].value * doc['qty'].value)"}}},
        | "query": {"range": {"total": {"gte": 25}}},
        | "sort": [{"total": "desc"}],
        | "fields": ["total"],
        | "size": 10}""".stripMargin)
    val rows = EsDsl.search(sales, body).collect()
    // totals: 30, 50, 20, 32 → matches 30/50/32, desc = 50, 32, 30
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L, 1L))
    assert(rows.map(_.getAs[Double]("fields_total")).toSeq ==
      Seq(50.0, 32.0, 30.0))
    assert(!rows(0).schema.fieldNames.contains("total"))
  }

  test("runtime field drives aggregations like a mapped column") {
    val body = mapper.readTree(
      """{"runtime_mappings": {"total": {"type": "double",
        |   "script": {"source":
        |     "emit(doc['price'].value * doc['qty'].value)"}}},
        | "query": {"match_all": {}}, "size": 0,
        | "aggs": {"by_tag": {"terms": {"field": "tag"},
        |   "aggs": {"avg_total": {"avg": {"field": "total"}}}}}}"""
        .stripMargin)
    val rows = EsDsl.search(sales, body).collect()
      .map(r => r.getAs[String]("tag") ->
        r.getAs[Double]("avg_total")).toMap
    assert(rows("a") == 25.0) // (30 + 20) / 2
    assert(rows("b") == 41.0) // (50 + 32) / 2
  }

  test("runtime params bind; long and boolean types cast the value") {
    val body = mapper.readTree(
      """{"runtime_mappings": {
        |   "taxed": {"type": "long", "script": {"source":
        |     "emit(doc['price'].value * params.rate)",
        |     "params": {"rate": 2}}},
        |   "cheap": {"type": "boolean", "script": {"source":
        |     "emit(doc['price'].value < 9)"}}},
        | "query": {"term": {"cheap": true}},
        | "sort": [{"taxed": "asc"}],
        | "fields": ["taxed", "cheap"], "size": 10}""".stripMargin)
    val rows = EsDsl.search(sales, body).collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L))
    assert(rows.map(_.getAs[Long]("fields_taxed")).toSeq ==
      Seq(10L, 16L))
    assert(rows.forall(_.getAs[Boolean]("fields_cheap")))
  }

  test("script_fields compute on the page with _score and params") {
    val body = mapper.readTree(
      """{"query": {"match": {"tag": "a"}},
        | "script_fields": {"boosted": {"script": {"source":
        |   "_score * params.f + doc['qty'].value",
        |   "params": {"f": 10}}}},
        | "size": 10}""".stripMargin)
    val rows = EsDsl.search(sales, body).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fields_boosted") ==
        r.getAs[Double]("_score") * 10 + r.getAs[Long]("qty"))
    }
  }

  test("fields option: concrete columns project as fields_<name>; " +
    "_source: false keeps them (the highlight precedent)") {
    val body = mapper.readTree(
      """{"query": {"match_all": {}}, "_source": false,
        | "fields": ["price", {"field": "tag"}], "size": 10}"""
        .stripMargin)
    val rows = EsDsl.search(sales, body).collect()
    val names = rows(0).schema.fieldNames.toSet
    assert(names("fields_price") && names("fields_tag"))
    assert(!names("price") && !names("qty"))
  }

  test("_geo_distance sort: nearest first, missing points at " +
    "Infinity (last), km unit") {
    val body = mapper.readTree(
      """{"query": {"match_all": {}},
        | "sort": [{"_geo_distance": {"loc": {"lat": 0, "lon": 0},
        |   "order": "asc", "unit": "km"}}],
        | "size": 10}""".stripMargin)
    val rows = EsDsl.search(geoDf, body).collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L, 1L, 3L))
  }

  test("_script sort orders by the computed value") {
    val body = mapper.readTree(
      """{"query": {"match_all": {}},
        | "sort": [{"_script": {"type": "number",
        |   "script": {"source":
        |     "doc['price'].value * doc['qty'].value"},
        |   "order": "desc"}}],
        | "size": 2}""".stripMargin)
    val rows = EsDsl.search(sales, body).collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L))
  }

  test("named rejection: every new knob fails loud") {
    def rej(body: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        EsDsl.search(sales, mapper.readTree(body)).collect()
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // shadowing a mapped column
    rej("""{"runtime_mappings": {"price": {"type": "double",
        |"script": {"source": "emit(1)"}}},
        |"query": {"match_all": {}}}""".stripMargin, "shadows")
    // unsupported runtime type
    rej("""{"runtime_mappings": {"k": {"type": "keyword",
        |"script": {"source": "emit(1)"}}},
        |"query": {"match_all": {}}}""".stripMargin, "keyword")
    // missing emit wrapper
    rej("""{"runtime_mappings": {"x": {"type": "double",
        |"script": {"source": "doc['price'].value"}}},
        |"query": {"match_all": {}}}""".stripMargin, "emit")
    // runtime field is not _source
    rej("""{"runtime_mappings": {"x": {"type": "double",
        |"script": {"source": "emit(1)"}}},
        |"query": {"match_all": {}}, "_source": ["x"]}""".stripMargin,
      "unknown _source fields")
    // fields: format changes values; wildcards; unknown; duplicates
    rej("""{"query": {"match_all": {}},
        |"fields": [{"field": "price", "format": "0.0"}]}"""
        .stripMargin, "format")
    rej("""{"query": {"match_all": {}}, "fields": ["pri*"]}""",
      "wildcard")
    rej("""{"query": {"match_all": {}}, "fields": ["nope"]}""",
      "unknown fields entry")
    rej("""{"query": {"match_all": {}},
        |"fields": ["price", "price"]}""".stripMargin, "duplicate")
    // script_fields unknown key
    rej("""{"query": {"match_all": {}},
        |"script_fields": {"x": {"script": {"source": "1"},
        |"ignore_failure": true}}}""".stripMargin, "ignore_failure")
    // _geo_distance: mode / bad unit / second field
    rej("""{"query": {"match_all": {}},
        |"sort": [{"_geo_distance": {"loc": {"lat": 0, "lon": 0},
        |"mode": "min"}}]}""".stripMargin, "mode")
    // _script: type string
    rej("""{"query": {"match_all": {}},
        |"sort": [{"_script": {"type": "string",
        |"script": {"source": "1"}}}]}""".stripMargin, "string")
    // knn-only bodies keep their contract
    rej("""{"knn": {"field": "v", "query_vector": [1.0], "k": 1,
        |"num_candidates": 10},
        |"runtime_mappings": {"x": {"type": "double",
        |"script": {"source": "emit(1)"}}}}""".stripMargin,
      "runtime_mappings")
  }

  test("_geo_distance sort with a bad unit and a second point field " +
    "reject by name") {
    def rej(body: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        EsDsl.search(geoDf, mapper.readTree(body)).collect()
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rej("""{"query": {"match_all": {}},
        |"sort": [{"_geo_distance": {"loc": {"lat": 0, "lon": 0},
        |"unit": "ft"}}]}""".stripMargin, "ft")
    rej("""{"query": {"match_all": {}},
        |"sort": [{"_geo_distance": {"loc": {"lat": 0, "lon": 0},
        |"loc2": {"lat": 1, "lon": 1}}}]}""".stripMargin,
      "exactly one point field")
  }
}

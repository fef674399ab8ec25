package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions.{col, lit}

import graft.serving.EsDsl

/** The round-10 geo / sampling / ip aggregation family: geohash
  * known-vector parity, geotile slippy-map tiles, geo_bounds
  * longitude wrap, sampler determinism and the diversified cap,
  * reverse_nested parent counts, ip_range parsing edges, and the
  * named-rejection contract for every new knob. */
class EsDslGeoSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def geoDf = Seq(
    (1L, 57.64911, 10.40744), // the classic geohash test vector
    (2L, 51.5074, -0.1278),   // London
    (3L, -33.8688, 151.2093), // Sydney
    (4L, 64.1466, -21.9426)   // Reykjavík
  ).toDF("id", "lat", "lon")
    .selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS loc")

  test("geohashColumn: classic known vectors at several precisions") {
    val out = geoDf
      .select(col("id"),
        EsDsl.geohashColumn(col("loc.lat"), col("loc.lon"), 11).as("h11"),
        EsDsl.geohashColumn(col("loc.lat"), col("loc.lon"), 5).as("h5"),
        EsDsl.geohashColumn(col("loc.lat"), col("loc.lon"), 1).as("h1"))
      .orderBy("id").collect()
    // independent references: geohash.org / the original Niemeyer
    // encoding of these coordinates
    assert(out(0).getString(1) == "u4pruydqqvj")
    assert(out(0).getString(2) == "u4pru")
    assert(out(0).getString(3) == "u")
    assert(out(1).getString(2) == "gcpvj") // London
    assert(out(2).getString(2) == "r3gx2") // Sydney
    assert(out(3).getString(2) == "ge2ku") // Reykjavík
  }

  test("geo_shape: envelope wrap, polygon with hole, multipolygon " +
    "union, disjoint complement, and the rejection contract") {
    def hits(body: String): Set[Long] =
      EsDsl.search(geoDf, mapper.readTree(body)).collect()
        .map(_.getAs[Long]("id")).toSet
    // envelope across the date line: lon >= 140 OR lon <= -15 picks
    // Sydney (151.2) and Reykjavík (-21.9); London (-0.13) is out
    assert(hits(
      """{"query": {"geo_shape": {"loc": {"shape": {"type": "envelope",
        |  "coordinates": [[140, 70], [-15, -40]]}}}},
        | "size": 10}""".stripMargin) == Set(3L, 4L))
    // polygon around northern Europe with a hole excising Denmark:
    // the outer box holds 1 (57.6,10.4), 2 (51.5,-0.1), 4 (64.1,
    // -21.9); the hole [5..15]x[55..60] swallows point 1
    assert(hits(
      """{"query": {"geo_shape": {"loc": {"shape": {"type": "polygon",
        |  "coordinates": [
        |   [[-30, 45], [20, 45], [20, 70], [-30, 70], [-30, 45]],
        |   [[5, 55], [15, 55], [15, 60], [5, 60], [5, 55]]]},
        |  "relation": "within"}}}, "size": 10}""".stripMargin) ==
      Set(2L, 4L))
    // multipolygon: the Denmark hole as its own polygon ∪ a Sydney
    // box — the union matches 1 and 3
    assert(hits(
      """{"query": {"geo_shape": {"loc": {"shape":
        |  {"type": "multipolygon", "coordinates": [
        |   [[[5, 55], [15, 55], [15, 60], [5, 60], [5, 55]]],
        |   [[[150, -35], [152, -35], [152, -33], [150, -33],
        |     [150, -35]]]]}}}}, "size": 10}""".stripMargin) ==
      Set(1L, 3L))
    // disjoint = the complement over docs carrying a point: only
    // Sydney sits outside the (un-holed) northern-Europe box
    assert(hits(
      """{"query": {"geo_shape": {"loc": {"shape": {"type": "polygon",
        |  "coordinates": [
        |   [[-30, 45], [20, 45], [20, 70], [-30, 70], [-30, 45]]]},
        |  "relation": "disjoint"}}}, "size": 10}""".stripMargin) ==
      Set(3L))
    // rejections by name: contains on a point field, indexed_shape,
    // unclosed ring, date-line-crossing polygon edge, unknown type
    def rej(body: String) = intercept[IllegalArgumentException] {
      EsDsl.search(geoDf, mapper.readTree(body))
    }
    rej("""{"query": {"geo_shape": {"loc": {"shape": {"type":
      "polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,1],[0,0]]]},
      "relation": "contains"}}}, "size": 10}""")
    rej("""{"query": {"geo_shape": {"loc": {"indexed_shape":
      {"index": "shapes", "id": "x"}}}}, "size": 10}""")
    rej("""{"query": {"geo_shape": {"loc": {"shape": {"type":
      "polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,1]]]}}}},
      "size": 10}""")
    rej("""{"query": {"geo_shape": {"loc": {"shape": {"type":
      "polygon", "coordinates": [[[-170,0],[170,0],[180,10],
      [-170,0]]]}}}}, "size": 10}""")
    rej("""{"query": {"geo_shape": {"loc": {"shape": {"type":
      "circle", "coordinates": [0, 0]}}}}, "size": 10}""")
  }

  test("geotile_grid: OSM tile identities and the single-bucket sum") {
    val body = mapper.readTree(
      """{"query": {"match_all": {}}, "size": 0,
        | "aggs": {"t": {"geotile_grid":
        |   {"field": "loc", "precision": 7}}}}""".stripMargin)
    val rows = EsDsl.search(geoDf, body).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // z=7 slippy-map tiles (openstreetmap tile calculator values)
    assert(rows("7/63/42") == 1L)  // London
    assert(rows("7/67/38") == 1L)  // the 57.649/10.407 vector
    assert(rows.values.sum == 4L)
  }

  test("geo_bounds: wrap_longitude picks the narrower date-line box; " +
    "false keeps the unwrapped envelope") {
    val dl = Seq((1L, 10.0, 170.0), (2L, -5.0, -170.0))
      .toDF("id", "lat", "lon")
      .selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS loc")
    def bounds(extra: String) = EsDsl.search(dl, mapper.readTree(
      s"""{"query": {"match_all": {}}, "size": 0,
         | "aggs": {"v": {"geo_bounds": {"field": "loc"$extra}}}}"""
        .stripMargin)).collect()(0)
    val wrapped = bounds("")
    // 20° across the date line beats the 340° unwrapped span
    assert(wrapped.getAs[Double]("v_top_left_lon") == 170.0)
    assert(wrapped.getAs[Double]("v_bottom_right_lon") == -170.0)
    assert(wrapped.getAs[Double]("v_top_left_lat") == 10.0)
    assert(wrapped.getAs[Double]("v_bottom_right_lat") == -5.0)
    val flat = bounds(""", "wrap_longitude": false""")
    assert(flat.getAs[Double]("v_top_left_lon") == -170.0)
    assert(flat.getAs[Double]("v_bottom_right_lon") == 170.0)
  }

  test("geo_centroid: mean point and contributing count skip rows " +
    "with a null component") {
    val df = Seq((1L, Some(10.0), Some(20.0)), (2L, Some(30.0), Some(40.0)),
      (3L, None, Some(50.0))).toDF("id", "lat", "lon")
      .selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS loc")
    val r = EsDsl.search(df, mapper.readTree(
      """{"query": {"match_all": {}}, "size": 0,
        | "aggs": {"c": {"geo_centroid": {"field": "loc"}}}}"""
        .stripMargin)).collect()(0)
    assert(r.getAs[Double]("c_lat") == 20.0)
    assert(r.getAs[Double]("c_lon") == 30.0)
    assert(r.getAs[Long]("c_count") == 2L)
  }

  private def docs = Seq(
    (1L, "window batch run", "src3", 10L),
    (2L, "window only", "src1", 20L),
    (3L, "nothing here", null, 30L),
    (4L, "batch batch window", "src3", 40L)
  ).toDF("doc_id", "text", "source", "n")

  test("sampler: sub-aggs see exactly the top shard_size docs, id " +
    "tiebreak deterministic") {
    val r = EsDsl.search(docs, mapper.readTree(
      """{"query": {"query_string": {"query": "text:window"}},
        | "size": 0,
        | "aggs": {"s": {"sampler": {"shard_size": 2},
        |   "aggs": {"n": {"value_count": {"field": "doc_id"}},
        |            "hi": {"max": {"field": "n"}}}}}}""".stripMargin))
      .collect()(0)
    // three docs match with equal occurrence score → ids 1, 2 win
    assert(r.getAs[Long]("doc_count") == 2L)
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("hi") == 20L)
  }

  test("diversified_sampler: max_docs_per_value caps per key BEFORE " +
    "the top cut; child terms agg recurses over the sample") {
    val rows = EsDsl.search(docs, mapper.readTree(
      """{"query": {"query_string": {"query": "text:window"}},
        | "size": 0,
        | "aggs": {"s": {"diversified_sampler":
        |   {"shard_size": 10, "field": "source",
        |    "max_docs_per_value": 1},
        |   "aggs": {"by_src": {"terms": {"field": "source",
        |     "size": 10}}}}}}""".stripMargin)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src3 holds docs 1 and 4 — the cap keeps only doc 1
    assert(rows == Map("src3" -> 1L, "src1" -> 1L))
  }

  private def orders = Seq(
    (10L, Seq(("A", 1L), ("B", 2L))),
    (11L, Seq(("A", 3L))),
    (12L, Seq(("A", 4L), ("A", 5L)))
  ).toDF("order_id", "raw")
    .selectExpr("order_id",
      "transform(raw, x -> named_struct('color', x._1, 'id', x._2)) " +
        "AS labels")

  test("reverse_nested: per-bucket distinct parent count rides the " +
    "same aggregation") {
    val rows = EsDsl.search(orders, mapper.readTree(
      """{"query": {"match_all": {}}, "size": 0,
        | "aggs": {"l": {"nested": {"path": "labels"},
        |   "aggs": {"by_color": {"terms":
        |     {"field": "labels.color", "size": 10},
        |     "aggs": {"parents": {"reverse_nested": {}}}}}}}}"""
        .stripMargin)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // A: 4 elements across 3 parents; B: 1 element, 1 parent
    assert(rows.toSeq == Seq(("A", 4L, 3L), ("B", 1L, 1L)))
  }

  test("ip_range: malformed and out-of-range addresses match no " +
    "bucket; the CIDR mask aligns to its network address") {
    val ips = Seq((1L, "10.0.0.5"), (2L, "10.0.0.200"), (3L, "256.1.1.1"),
      (4L, "abc"), (5L, null.asInstanceOf[String]), (6L, "1.2.3"),
      (7L, "10.0.1.7")).toDF("id", "ip")
    val rows = EsDsl.search(ips, mapper.readTree(
      """{"query": {"match_all": {}}, "size": 0,
        | "aggs": {"r": {"ip_range": {"field": "ip",
        |   "ranges": [{"from": "10.0.0.0", "to": "10.0.0.128"},
        |              {"mask": "10.0.1.99/24"}]}}}}""".stripMargin))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("10.0.0.0-10.0.0.128") == 1L) // only 10.0.0.5
    assert(rows("10.0.1.99/24") == 1L)        // aligned to 10.0.1.0/24
  }

  test("sampler > significant_terms: the sample is the FOREGROUND " +
    "and the whole index stays the background corpus") {
    val rows = EsDsl.search(docs, mapper.readTree(
      """{"query": {"query_string": {"query": "text:window"}},
        | "size": 0,
        | "aggs": {"s": {"sampler": {"shard_size": 2},
        |   "aggs": {"sig": {"significant_terms":
        |     {"field": "source", "size": 10}}}}}}""".stripMargin))
      .collect()
    // sample = docs 1 (src3) and 2 (src1); index: src3 ×2, src1 ×1.
    // src1: fg 50% vs bg 25% → significant; src3: 50% vs 50% → not.
    // (fg == bg — the pre-fix recursion — returned ZERO buckets.)
    assert(rows.map(_.getAs[String]("key")).toSeq == Seq("src1"))
  }

  test("geo_bounds: a row with one null coordinate is excluded from " +
    "BOTH axes, not just the null one") {
    val df = Seq((1L, Some(10.0), Some(20.0)),
      (2L, Some(80.0), None: Option[Double]))
      .toDF("id", "lat", "lon")
      .selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS loc")
    val r = EsDsl.search(df, mapper.readTree(
      """{"query": {"match_all": {}}, "size": 0,
        | "aggs": {"v": {"geo_bounds": {"field": "loc"}}}}"""
        .stripMargin)).collect()(0)
    assert(r.getAs[Double]("v_top_left_lat") == 10.0)
    assert(r.getAs[Double]("v_bottom_right_lat") == 10.0)
  }

  test("named rejection: every new knob fails loud, never silently " +
    "wrong") {
    def rej(agg: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        EsDsl.search(geoDf, mapper.readTree(
          s"""{"query": {"match_all": {}}, "size": 0,
             | "aggs": {"a": $agg}}""".stripMargin)).collect()
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    rej("""{"sampler": {"shard_size": 0}}""", "shard_size")
    rej("""{"sampler": {"shard_size": 5, "seed": 1}}""", "seed")
    rej("""{"diversified_sampler": {"shard_size": 5}}""", "field")
    rej("""{"diversified_sampler": {"shard_size": 5, "field": "loc",
        |"max_docs_per_value": 0}}""".stripMargin, "max_docs_per_value")
    rej("""{"geotile_grid": {"field": "loc", "precision": 30}}""",
      "precision")
    rej("""{"geohash_grid": {"field": "loc", "precision": 13}}""",
      "precision")
    rej("""{"geo_distance": {"field": "loc",
        |"origin": {"lat": 0, "lon": 0}, "unit": "ft",
        |"ranges": [{"to": 5}]}}""".stripMargin, "unit")
    rej("""{"geo_distance": {"field": "loc",
        |"origin": {"lat": 0, "lon": 0}, "distance_type": "plane",
        |"ranges": [{"to": 5}]}}""".stripMargin, "plane")
    rej("""{"ip_range": {"field": "loc", "ranges":
        |[{"mask": "10.0.0.0/40"}]}}""".stripMargin, "prefix")
    rej("""{"ip_range": {"field": "loc", "ranges":
        |[{"from": "1.2.3.4", "mask": "10.0.0.0/8"}]}}""".stripMargin,
      "not both")
    rej("""{"geo_bounds": {"field": "loc", "ignore_unmapped": true}}""",
      "ignore_unmapped")
    rej("""{"geo_distance": {"field": "loc",
        |"origin": {"lat": 0, "lon": 0},
        |"ranges": [{"to": "5km"}]}}""".stripMargin, "numeric")
    rej("""{"geotile_grid": {"field": "loc", "precision": 4,
        |"size": 10.5}}""".stripMargin, "integer")
    // a whole-frame single agg cannot MIX with metric children under
    // the sampler — named rejection, not a misleading metric error
    val mix = intercept[IllegalArgumentException] {
      EsDsl.search(docs, mapper.readTree(
        """{"query": {"match_all": {}}, "size": 0,
          | "aggs": {"s": {"sampler": {"shard_size": 5},
          |   "aggs": {"bp": {"boxplot": {"field": "n"}},
          |            "c": {"value_count": {"field": "n"}}}}}}"""
          .stripMargin)).collect()
    }
    assert(mix.getMessage.contains("only child"))
    // reverse_nested outside its nested-terms home
    val e = intercept[IllegalArgumentException] {
      EsDsl.search(orders, mapper.readTree(
        """{"query": {"match_all": {}}, "size": 0,
          | "aggs": {"l": {"nested": {"path": "labels"},
          |   "aggs": {"by_color": {"terms":
          |     {"field": "labels.color", "size": 10},
          |     "aggs": {"p": {"reverse_nested": {"path": "x"}}}}}}}}"""
          .stripMargin)).collect()
    }
    assert(e.getMessage.contains("empty body"))
  }
}

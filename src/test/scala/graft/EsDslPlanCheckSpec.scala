package graft

/** Plan-shape pin for the DSL translator: range/terms predicates must
  * reach the parquet scan as pushed filters (the translation is a plan
  * rewrite, not an opaque UDF), and the sorted page must execute as one
  * TakeOrdered. */
class EsDslPlanCheckSpec extends SparkSpec {
  test("q7_esdsl_range_sort: filters pushed to the scan, top-k is " +
    "TakeOrdered") {
    val df = queries.ParityQueries.queries("q7_esdsl_range_sort")(
      spark, "/root/testdata/sf0.001")
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10000")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.contains("GreaterThanOrEqual(o_totalprice,1000"),
        s"range not pushed:\n${plan.take(2000)}")
      assert(plan.contains("In(o_orderstatus"),
        s"terms not pushed:\n${plan.take(2000)}")
      assert(plan.contains("TakeOrderedAndProject"),
        s"sorted page is not a TakeOrdered:\n${plan.take(2000)}")
    } finally spark.conf.set(key, saved)
  }

  test("q7_esdsl_wildcard: the prefix clause reaches the scan as " +
    "StringStartsWith; page is TakeOrdered") {
    val df = queries.ParityQueries.queries("q7_esdsl_wildcard")(
      spark, "/root/testdata/sf0.001")
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10000")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("StringStartsWith(p_type,S"),
        s"prefix not pushed:\n${plan.take(2000)}")
      assert(plan.contains("TakeOrderedAndProject"),
        s"page is not a TakeOrdered:\n${plan.take(2000)}")
    } finally spark.conf.set(key, saved)
  }

  test("range/filters aggs are ONE aggregation — no union of " +
    "per-bucket scans, no shuffle beyond the single agg") {
    Seq("q7_esdsl_range", "q7_esdsl_filters").foreach { qn =>
      val df = queries.ParityQueries.queries(qn)(
        spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Union"),
        s"$qn unioned per-bucket scans:\n${plan.take(2000)}")
      val scans = df.queryExecution.optimizedPlan.collectLeaves().size
      assert(scans == 1, s"$qn scanned the corpus $scans times")
    }
  }

  test("composite page: one hash aggregation + TakeOrdered, resume " +
    "filter applied before the sort") {
    val df = queries.ParityQueries.queries("q7_esdsl_composite")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"composite page is not TakeOrdered:\n${plan.take(2000)}")
    val scans = df.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1, s"composite scanned the corpus $scans times")
  }

  test("top_hits: parent buckets broadcast back onto the corpus, " +
    "hits picked by a window limit — no global sort, no cartesian") {
    val df = queries.ParityQueries.queries("q7_esdsl_top_hits")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"parent gate is not broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("RunningWindowFunction") ||
      plan.contains("Window"),
      s"no window limit in top_hits plan:\n${plan.take(2000)}")
  }

  test("q7_esdsl_bm25: no cartesian in the score-join plan, one " +
    "TakeOrdered page (PlanSweepSpec re-checks with the full rules)") {
    val df = queries.ParityQueries.queries("q7_esdsl_bm25")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in the score join:\n${plan.take(2000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"page is not a TakeOrdered:\n${plan.take(2000)}")
  }

  test("multi-clause match scoring is ONE shared pass: a 3-match-clause " +
    "bool plans exactly as many corpus scans as a single match") {
    def planOf(body: String) = {
      val json = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body)
      val docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
      val df = serving.EsDsl.search(docs, json)
      df.collect()
      df.queryExecution
    }
    val single = planOf(
      """{"query": {"match": {"text": "window batch"}}, "size": 10}""")
    val multi = planOf(
      """{"query": {"bool": {"must": [
        |  {"match": {"text": "window batch"}},
        |  {"match": {"source": "src3"}},
        |  {"multi_match": {"query": "error small",
        |    "fields": ["text", "source"]}}
        |]}}, "size": 10}""".stripMargin)
    val s1 = single.optimizedPlan.collectLeaves().size
    val s3 = multi.optimizedPlan.collectLeaves().size
    assert(s3 == s1,
      s"3 match clauses planned $s3 corpus scans vs $s1 for one — " +
        "the shared pass regressed to per-clause scans")
    // one score join total: the hit path joins ONE shared frame
    val joins = multi.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.count(_.joinType.sql == "LEFT OUTER") == 1,
      s"expected ONE left score join, got:\n${multi.optimizedPlan}")
  }

  test("a MIXED standard+english body keeps the contains prefilter " +
    "on the shared scoring pass: stems are literal standard terms, " +
    "so every clause contributes substring probes") {
    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(
        """{"query": {"bool": {"must": [
          |  {"match": {"text": "window batch"}},
          |  {"match": {"text": {"query": "the sorted windows",
          |    "analyzer": "english"}}}
          |]}}, "size": 10}""".stripMargin)
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val df = serving.EsDsl.search(docs, json)
    df.collect()
    val plan = df.queryExecution.optimizedPlan.toString
    // the prefilter survives with BOTH clauses' terms: the standard
    // clause's tokens AND the english clause's stems probe as
    // Contains before tokenize+explode (round 12's document-side
    // english design disabled the whole pass's prefilter when a stem
    // lacked a safe probe — the query-side design never does).
    // Checked PER TERM: Contains(lower(text#<id>), <term>) — the
    // standard clause's tokens (window, batch) and the english
    // clause's stems (sort; its "windows" stems to the same
    // window probe the standard clause already carries)
    for (t <- Seq("window", "batch", "sort"))
      assert(s"Contains\\(lower\\(text#\\d+\\), $t\\)".r
          .findFirstIn(plan).isDefined,
        s"term '$t' missing from the contains prefilter:\n${
          plan.take(1500)}")
  }

  test("wildcard BM25 is ONE shared pass across entities: the whole " +
    "ranking plans a constant handful of aggregates/joins, not a " +
    "per-entity scoring pipeline") {
    val df = serving.Search.acrossIndexesRanked(spark,
      "/root/testdata/sf0.001", operators.Denormalize.RunTs,
      "small error household")
    df.collect()
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val p = df.queryExecution.optimizedPlan
    val aggs = p.collect { case a: Aggregate => a }.size
    val joins = p.collect { case j: Join => j }.size
    // stacked shape: stats + df + tf + final (+ countDistinct's
    // expand) = 5 aggregates and 3 joins TOTAL; the round-10
    // per-entity shape planned ~4 aggregates and 2+ joins PER entity
    // (5 entities -> ~20/10) — regressing to per-leg scoring trips
    // these bounds long before it hurts at scale
    assert(aggs <= 6, s"wildcard ranking plans $aggs aggregates — " +
      "per-entity legs are back")
    assert(joins <= 4, s"wildcard ranking plans $joins joins — " +
      "per-entity legs are back")
  }

  test("wildcard DSL routing is engine-side: a COVERED indexRoot " +
    "probes postings with ZERO entity-table scans; a missing entity " +
    "index falls back to the shared scan pass, identical rows") {
    val dir = "/root/testdata/sf0.001"
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def body = om.readTree(
      """{"query": {"multi_match": {"query": "small error household"}},
        | "size": 100}""".stripMargin)
    val root = java.nio.file.Files
      .createTempDirectory("graft-entity-idx-").toString
    serving.Search.buildEntityIndexes(spark, dir, root,
      operators.Denormalize.RunTs)
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    val (probedRows, scanRows) = try {
      spark.conf.set(key, "10000")
      val probed = serving.EsDsl.searchAcrossIndexes(spark, dir,
        operators.Denormalize.RunTs, body, indexRoot = Some(root))
      val rows = probed.collect().toSeq
      val plan = probed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // zero scans of ANY entity source table — the whole ranking is
      // postings probes (query-term-sized IO, the 100 TB plan)
      val tableScans = "(\\w+)\\.parquet".r.findAllMatchIn(plan)
        .map(_.group(1)).toSeq
        .filterNot(Set("postings", "fieldstats", "termstats"))
      assert(tableScans.isEmpty,
        s"covered wildcard still scanned: ${tableScans.distinct}")
      assert(plan.contains("postings"), "no index probe in the plan")
      (rows, serving.EsDsl.searchAcrossIndexes(spark, dir,
        operators.Denormalize.RunTs, body).collect().toSeq)
    } finally spark.conf.set(key, saved)
    // bit-identity with the scan pass (the twins' shared oracle)
    assert(probedRows == scanRows,
      "indexed wildcard diverged from the scan pass")
    // delete ONE entity's index -> the root no longer covers; the
    // SAME call degrades to the scan pass with the same rows, never
    // a missing-index failure
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$root/customer"))
    val fallback = serving.EsDsl.searchAcrossIndexes(spark, dir,
      operators.Denormalize.RunTs, body, indexRoot = Some(root))
    assert(fallback.collect().toSeq == scanRows,
      "fallback rows diverged from the scan pass")
    assert(!fallback.queryExecution.executedPlan.toString
        .contains("postings"),
      "an uncovered root must not probe a partial index set")
  }

  test("index-probe scoring: a statsIndex body's match clauses score " +
    "from postings — exactly ONE corpus scan (the hit path) remains") {
    val df = queries.ParityQueries.queries("q7_esdsl_bm25_probe")(
      spark, "/root/testdata/sf0.001")
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10000")
      df.collect()
      // the AQE wrapper hides children from collect() — the rendered
      // final plan shows every scan's Location
      // the AdaptiveSparkPlan string prints Final AND Initial plans —
      // count scans in the FINAL section only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val corpusScans = "documents\\.parquet".r.findAllIn(plan).size
      assert(corpusScans == 1,
        s"probe-routed scoring scanned the corpus $corpusScans times:\n${
          plan.take(2000)}")
      assert(plan.contains("postings"), "no index probe in the plan")
    } finally spark.conf.set(key, saved)
  }

  test("phrase statistics ride the index when statsIndex covers the " +
    "field: exactly ONE corpus scan (the positional hit path) remains") {
    val df = queries.ParityQueries.queries("q7_esdsl_phrase_stats_probe")(
      spark, "/root/testdata/sf0.001")
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10000")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val corpusScans = "documents\\.parquet".r.findAllIn(plan).size
      assert(corpusScans == 1,
        s"phrase stats scanned the corpus $corpusScans times:\n${
          plan.take(2000)}")
    } finally spark.conf.set(key, saved)
    // bit-identity with the corpus-aggregate route: same body, no
    // statsIndex — identical hit rows and scores
    val scan = queries.ParityQueries.queries("q7_esdsl_phrase_bm25")(
      spark, "/root/testdata/sf0.001")
    assert(df.collect().toSeq == scan.collect().toSeq,
      "index-served phrase stats diverged from the corpus aggregate")
  }

  test("filter-context scoring clauses queue NOTHING: match and " +
    "match_phrase in filter position plan one corpus scan, no joins") {
    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(
        """{"query": {"bool": {"filter": [
          |  {"match": {"text": "window batch"}},
          |  {"match_phrase": {"text": "the window"}}
          |]}}, "size": 10}""".stripMargin)
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val df = serving.EsDsl.search(docs, json)
    df.collect()
    val scans = df.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1,
      s"filter-context clauses cost $scans corpus scans, expected 1")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, "filter-context clauses grew a join")
  }

  test("adjacency_matrix is ONE conditional aggregation pass; the " +
    "nested query is a projection predicate — no explode, no join") {
    val adj = queries.ParityQueries.queries("q7_esdsl_adjacency")(
      spark, "/root/testdata/sf0.001")
    adj.collect()
    val adjScans = adj.queryExecution.optimizedPlan.collectLeaves().size
    assert(adjScans == 1,
      s"adjacency_matrix scanned the corpus $adjScans times")
    assert(!adj.queryExecution.executedPlan.toString.contains("Union"),
      "adjacency_matrix unioned per-bucket scans")
    val nq = queries.ParityQueries.queries("q7_esdsl_nested_query")(
      spark, "/root/testdata/sf0.001")
    nq.collect()
    val nPlan = nq.queryExecution.executedPlan.toString
    assert(!nPlan.contains("Generate"),
      s"nested query exploded the array:\n${nPlan.take(2000)}")
  }

  test("gap filling joins a broadcast-bounds key range — no driver " +
    "collect, no cartesian; function_score stays one projection") {
    val gf = queries.ParityQueries.queries("q7_esdsl_gap_fill")(
      spark, "/root/testdata/sf0.001")
    gf.collect()
    val gPlan = gf.queryExecution.executedPlan.toString
    assert(!gPlan.contains("CartesianProduct"),
      s"cartesian in gap fill:\n${gPlan.take(2000)}")
    val fs = queries.ParityQueries.queries("q7_esdsl_function_score")(
      spark, "/root/testdata/sf0.001")
    fs.collect()
    val fPlan = fs.queryExecution.executedPlan.toString
    assert(!fPlan.contains("Join"),
      s"function_score grew a join:\n${fPlan.take(2000)}")
    assert(fPlan.contains("TakeOrderedAndProject"),
      s"function_score page is not a TakeOrdered:\n${fPlan.take(2000)}")
  }

  test("significance aggs: fg and bg ride ONE conditional-count pass " +
    "— two corpus scans total (term counts + totals), never four") {
    Seq("q7_esdsl_significant_terms",
        "q7_esdsl_significant_text").foreach { qn =>
      val df = queries.ParityQueries.queries(qn)(
        spark, "/root/testdata/sf0.001")
      df.collect()
      val scans = df.queryExecution.optimizedPlan.collectLeaves().size
      assert(scans <= 2, s"$qn scanned the corpus $scans times")
    }
  }

  test("rescore window executes as TakeOrdered + in-window re-sort — " +
    "hit path + one phrase-stats aggregate, nothing more") {
    val rs = queries.ParityQueries.queries("q7_esdsl_rescore")(
      spark, "/root/testdata/sf0.001")
    rs.collect()
    // 2 leaves: the hit-path scan and the single-row phrase-BM25
    // statistics aggregate (the rescore_query is a match_phrase)
    assert(rs.queryExecution.optimizedPlan.collectLeaves().size <= 2,
      "rescore re-scanned the corpus")
    val plan = rs.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"rescore window is not a TakeOrdered:\n${plan.take(2000)}")
  }

  test("span family and script_score are pure single-scan " +
    "projections: one corpus leaf, no join, page is TakeOrdered") {
    Seq("q7_esdsl_span_near", "q7_esdsl_span_unordered",
        "q7_esdsl_span_not", "q7_esdsl_span_first",
        "q7_esdsl_intervals", "q7_esdsl_script_score",
        "q7_esdsl_post_filter", "q7_esdsl_decay").foreach { qn =>
      val df = queries.ParityQueries.queries(qn)(
        spark, "/root/testdata/sf0.001")
      df.collect()
      val scans = df.queryExecution.optimizedPlan.collectLeaves().size
      assert(scans == 1, s"$qn scanned the corpus $scans times")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"),
        s"$qn joined:\n${plan.take(2000)}")
      assert(plan.contains("TakeOrderedAndProject"),
        s"$qn page is not a TakeOrdered:\n${plan.take(2000)}")
    }
  }

  test("terms-level pipelines post-process the size-bounded bucket " +
    "cut — the corpus is aggregated once") {
    val df = queries.ParityQueries.queries("q7_esdsl_terms_having")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val scans = df.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1, s"terms_having scanned the corpus $scans times")
  }

  test("geo / ip aggregations are single-scan column arithmetic: one " +
    "corpus leaf, no join, no union of per-bucket scans") {
    Seq("q7_esdsl_geo_distance_agg", "q7_esdsl_geotile_grid",
        "q7_esdsl_geohash_grid", "q7_esdsl_ip_range",
        "q7_esdsl_geo_bounds", "q7_esdsl_geo_centroid").foreach { qn =>
      val df = queries.ParityQueries.queries(qn)(
        spark, "/root/testdata/sf0.001")
      df.collect()
      val scans = df.queryExecution.optimizedPlan.collectLeaves().size
      assert(scans == 1, s"$qn scanned the corpus $scans times")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$qn joined:\n${plan.take(2000)}")
      assert(!plan.contains("Union"),
        s"$qn unioned per-bucket scans:\n${plan.take(2000)}")
    }
  }

  test("sampler: the sample cut is a TakeOrdered (never a global " +
    "sort), and the whole body stays on one corpus scan") {
    val df = queries.ParityQueries.queries("q7_esdsl_sampler")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sampler cut is not a TakeOrdered:\n${plan.take(2000)}")
    val scans = df.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1, s"sampler scanned the corpus $scans times")
  }

  test("percolate tagAll: K stored queries are K projection branches " +
    "on ONE scan — zero joins, zero exchanges (the 100 TB tagging " +
    "contract)") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val docs = sources.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val tagged = serving.Percolate.tagAll(docs, Seq(
      "a" -> m.readTree("""{"match": {"text": "window"}}"""),
      "b" -> m.readTree("""{"range": {"n_chars": {"gte": 200}}}"""),
      "c" -> m.readTree("""{"term": {"lang": "en"}}""")))
    tagged.collect()
    val plan = tagged.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Cartesian"),
      s"tagAll planned a join:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange"),
      s"tagAll planned a shuffle:\n${plan.take(2000)}")
    val scans = tagged.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans == 1, s"tagAll scanned the corpus $scans times")
  }
}

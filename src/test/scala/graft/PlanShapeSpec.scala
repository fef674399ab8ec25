package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: the properties that make these
  * operators scale are plan shapes, not results — a change that silently
  * loses a pushed filter, broadcasts a fact table, or knocks a pair join
  * out of whole-stage codegen would pass every correctness test while
  * costing orders of magnitude at 100 TB. Checked on sf0.001 (plan
  * shapes are scale-independent except where stats flip join strategies;
  * those assertions target the always-small dimension sides). */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("q6: every selective predicate reaches the parquet scan") {
    // default maxMetadataStringLength=100 truncates the PushedFilters
    // list in treeString — raise it for the assertion
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10000")
      val plan =
        q("q6_forecast_revenue").queryExecution.executedPlan.toString
      for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
          "GreaterThanOrEqual(l_discount,0.05)",
          "LessThanOrEqual(l_discount,0.07)", "LessThan(l_quantity,24.0)"))
        assert(plan.contains(f), s"predicate $f not pushed in:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("bm25: inverted probe keeps the substring prefilter at the scan, " +
    "stats/idf broadcast, no cartesian on the corpus") {
    val plan = executedPlan(q("q2_search_bm25"))
    // the contains-any prefilter evaluates scan-side (inside a Filter
    // over the file scan, not after a shuffle): the corpus rows that
    // survive tokenize+explode are query-term-sized
    assert(plan.contains("Contains(lower(text"),
      s"substring prefilter missing from the plan:\n$plan")
    // idf + corpus stats join back broadcast — the per-(doc,term) table
    // never hash-shuffles against a 1-row stats relation
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"stats/idf not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in the bm25 plan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k is not a TakeOrdered:\n$plan")
  }

  test("multi-field bm25 is SINGLE-PASS: one stacked token explode, " +
    "stats equi-broadcast, no nested loop, no per-field join") {
    val plan = executedPlan(q("q2_search_bm25_multi"))
    // the cross-field prefilter still evaluates at the scan
    assert(plan.contains("Contains(lower(text"),
      s"substring prefilter missing:\n$plan")
    // stats/idf ride equi-key broadcasts — the 1-row-cross join shape
    // of the per-field form is gone entirely
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop stats join crept back:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("FullOuter"),
      s"per-field full-outer combine crept back:\n$plan")
    // one stacked subtree feeds idf and tf (two physical reads) plus
    // the stats scan = 3 scans TOTAL, independent of field count (the
    // per-field form paid ~3 scans PER FIELD); count the final plan
    // only — AQE's string repeats the initial plan below it
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(finalPlan).size
    assert(scans <= 3, s"$scans corpus scans in:\n$finalPlan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k is not a TakeOrdered:\n$plan")
  }

  test("j11: range join plans as a hash equi-join, not a nested loop") {
    val plan = executedPlan(q("j11_range_join"))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to an O(n·m) join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      s"no equi join in range-join plan:\n$plan")
  }

  test("split: assignment is a shuffle-free projection") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val df = q("split_assign")
    df.collect()
    val exchanges = df.queryExecution.executedPlan
      .collect { case e: Exchange => e }
    assert(exchanges.isEmpty, "hash split must not shuffle")
  }

  test("s1: filter is pushed to the parquet scan, columns pruned") {
    val plan = q("s1_scan_filter").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"missing pushed filter in:\n$plan")
    assert(!plan.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("denorm: dimension joins broadcast, no fact-side broadcast") {
    val plan = executedPlan(q("denorm_tickets"))
    assert(plan.contains("BroadcastHashJoin"), "dimension joins should broadcast")
    // the fact-key aggregations must keep map-side partial aggregation
    assert(plan.contains("partial_max_by") || plan.contains("ObjectHashAggregate"),
      s"latest-status lost its partial aggregation:\n$plan")
  }

  test("dedup_embedding_lsh: banded candidates are equi-joins — no " +
      "nested loop, no cartesian, anywhere in the plan") {
    val plan = executedPlan(q("dedup_embedding_lsh"))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"the LSH form must never pair-join the corpus all-pairs:\n$plan")
    // the (band, bucket) self-join and both verify joins are hash joins
    assert("HashJoin".r.findAllIn(plan).size >= 3,
      s"expected candidate + 2 verify hash joins:\n$plan")
  }

  test("dedup_embedding (spec tier): the brute-force pair join stays " +
      "inside whole-stage codegen") {
    // codegen'd operators are starred `*(n)` in the final plan string
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = executedPlan(
      graft.operators.Dedup.embeddingNearDups(emb, "vec_id", "embedding"))
    assert("""\*\(\d+\) BroadcastNestedLoopJoin""".r.findFirstIn(plan).isDefined,
      "BroadcastNestedLoopJoin fell out of codegen — an interpreted HOF " +
        s"crept back into the similarity projections:\n$plan")
  }

  test("o3: top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan(q("o3_topk"))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k regressed:\n$plan")
  }

  test("quality_model: model scoring is one scan, zero Exchanges") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val df = q("quality_model")
    df.collect()
    val exchanges = df.queryExecution.executedPlan
      .collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"linear scoring should be a pure projection, found: $exchanges")
  }

  test("dedup_incremental: bloom prefilter reaches the plan as " +
      "might_contain; corpus documents never join") {
    val df = q("dedup_incremental")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from the plan:\n$plan")
  }

  test("ivf: centroid assignment is a pure projection — no Exchange") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(0.1, 1.0)),
      (3L, Seq(0.9, 0.2)), (4L, Seq(0.2, 0.8))
    ).toDF("id", "vec")
    val cent: Seq[(Any, Seq[Double])] =
      Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
    val assigned = graft.operators.Similarity
      .ivfAssign(corpus, "id", "vec", cent)
    val byId = assigned.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("centroid_id")).toMap
    assert(byId == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
    import org.apache.spark.sql.execution.exchange.Exchange
    val exchanges = assigned.queryExecution.executedPlan
      .collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      "IVF assignment shuffled the corpus — argmax must stay a projection")
  }

  test("r6_scd2: both windows ride ONE key-hash shuffle") {
    // plan.collect does not descend into AQE's materialized query
    // stages, so count exchanges in the final-plan string instead
    val plan = executedPlan(q("r6_scd2"))
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(finalPlan).size
    assert(shuffles == 1,
      s"SCD2 must shuffle once on the key; got $shuffles:\n$finalPlan")
    assert(finalPlan
      .split("\n").count(_.trim.startsWith("+- Window")) == 2,
      s"expected two Window operators over one exchange:\n$finalPlan")
  }

  test("group top-k and stratified sample prune map-side via " +
      "WindowGroupLimit — no global sort, no full-table shuffle") {
    for (name <- Seq("o5_group_topk", "sample_stratified")) {
      val plan = executedPlan(q(name))
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost its WindowGroupLimit pruning:\n$plan")
      assert(!plan.split("\n").exists(l =>
          l.contains("Sort ") && l.contains("true, 0")),
        s"$name plans a GLOBAL sort:\n$plan")
    }
  }

  test("chunk_docs: chunking is a shuffle-free projection+explode") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val df = q("chunk_docs")
    df.collect()
    val exchanges = df.queryExecution.executedPlan
      .collect { case e: Exchange => e }
    assert(exchanges.isEmpty, "chunking must not shuffle")
  }

  test("q3: selective dimension filter stays pushed under the join") {
    val plan = executedPlan(q("q3_top_revenue"))
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment filter not pushed to customer scan:\n$plan")
  }
}

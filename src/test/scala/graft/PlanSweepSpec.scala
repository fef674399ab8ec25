package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Blanket insurance on top of PlanShapeSpec's query-by-query guards:
  * EVERY registered query's physical plan is swept for the two shapes
  * that silently turn into corpus² work at scale — CartesianProduct
  * (shuffled cartesian) and BroadcastNestedLoopJoin over anything that
  * is not a provably single-row side. A global aggregate (no grouping
  * keys) is exactly one row — the deliberate crossJoin(stats) pattern
  * the ranked-retrieval and mixture operators use — and stays allowed;
  * anything else fails the sweep with the query name. */
class PlanSweepSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }

  /** Operators that never RAISE the row count of their one input —
    * classification recurses through them to the operator that
    * actually determines the side's cardinality. (Generate/explode is
    * deliberately absent: exploding a collected array re-inflates a
    * one-row aggregate to data-dependent size.) */
  private val rowNonIncreasing = Set(
    "ProjectExec", "FilterExec", "SortExec", "CoalesceExec",
    "ShuffleExchangeExec", "BroadcastExchangeExec",
    "WholeStageCodegenExec", "InputAdapter", "AQEShuffleReadExec",
    "ColumnarToRowExec", "RowToColumnarExec")

  /** Build sides that cannot grow with the corpus, classified from the
    * side's ROOT operator down (an any-descendant scan would accept a
    * corpus scan merely JOINED with a one-row aggregate — the negative
    * test below pins that rejection): a global aggregate is one row; a
    * top-k/limit subtree is capped; a ≤1-row literal leaf is constant
    * (range(1) / one-row local relation — the index-served statistics
    * frames project driver-collected constants); grouped aggregates
    * and row-non-increasing wrappers are bounded iff their input is;
    * joins and unions are bounded iff EVERY child is (k×m stays
    * corpus-independent; one unbounded side grows the product). */
  private def boundedRows(side: SparkPlan): Boolean = side match {
    case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
      true
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.CollectLimitExec => true
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.range.numElements <= 1
    case lt: org.apache.spark.sql.execution.LocalTableScanExec =>
      lt.rows.lengthCompare(1) <= 0
    case a: BaseAggregateExec => boundedRows(a.child)
    case e: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      boundedRows(e.child)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      boundedRows(j.left) && boundedRows(j.right)
    case u: org.apache.spark.sql.execution.UnionExec =>
      u.children.forall(boundedRows)
    case p if p.children.size == 1 &&
        rowNonIncreasing(p.getClass.getSimpleName) =>
      boundedRows(p.children.head)
    case _ => false
  }

  /** Deliberate broadcast-the-probes designs: the brute-force ANN tier
    * nested-loops a small QUERY BATCH against the corpus — the batch is
    * bounded by operator contract (a filter on probe ids), not by a
    * structural limit the sweep can see. Anything newly added here
    * needs the same justification. */
  private val probeBroadcast = Set("ann_topk")

  test("no registered query plans a CartesianProduct or a nested-loop " +
    "join over a non-single-row side") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !probeBroadcast(name)) {
      val plan = physical(fn(spark, dir))
      plan.collectWithSubqueries {
        case c: CartesianProductExec =>
          offenders += s"$name: CartesianProduct"
        case j: BroadcastNestedLoopJoinExec =>
          val side = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          if (!boundedRows(side))
            offenders += s"$name: BroadcastNestedLoopJoin over an " +
              s"unbounded side (${side.nodeName})"
      }
    }
    assert(offenders.isEmpty,
      s"scale-hostile join shapes:\n${offenders.mkString("\n")}")
  }

  test("boundedRows classifies the ROOT operator: a corpus scan " +
    "joined above a one-row aggregate is NOT bounded, while the " +
    "aggregate itself (through exchanges/projections) is") {
    import org.apache.spark.sql.functions._
    val corpus = spark.range(1000).toDF("id")
    val stats = corpus.agg(count(lit(1)).as("n"))
    // the one-row aggregate, wrapped in a projection, stays bounded
    assert(boundedRows(physical(stats.select(col("n") * 2))))
    // the corpus enriched WITH the aggregate (the shape the old
    // any-descendant check accepted) must classify as unbounded:
    // its row count is the corpus's
    val enriched = corpus.crossJoin(broadcast(stats))
    assert(!boundedRows(physical(enriched)))
    // ... and re-exploding a one-row collect_list aggregate is
    // data-dependent size, not one row — Generate never passes
    val reExploded = corpus.agg(collect_list(col("id")).as("xs"))
      .select(explode(col("xs")))
    assert(!boundedRows(physical(reExploded)))
    // top-k stays bounded through a projection
    assert(boundedRows(physical(
      corpus.orderBy(col("id")).limit(5).select(col("id") + 1))))
  }
}

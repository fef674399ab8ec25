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

  /** Build sides that cannot grow with the corpus: a global aggregate
    * (exactly one row), a top-k/limit-bounded subtree, or a literal
    * ≤1-row leaf (range(1) / one-row local relation — the index-served
    * statistics frames project driver-collected constants). */
  private def boundedRows(side: SparkPlan): Boolean =
    side.collectWithSubqueries {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      case l: org.apache.spark.sql.execution.GlobalLimitExec => l
      case r: org.apache.spark.sql.execution.RangeExec
          if r.range.numElements <= 1 => r
      case lt: org.apache.spark.sql.execution.LocalTableScanExec
          if lt.rows.lengthCompare(1) <= 0 => lt
    }.nonEmpty

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
}

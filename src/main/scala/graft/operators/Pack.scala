package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget batch packing — assigning documents to training batches
  * such that each batch carries at most ~`budget` tokens (beyond the
  * reference; the step between a curated corpus and a training run).
  *
  * Deterministic prefix-sum packing: within each group, documents are
  * laid out in `orderCol` order and `batch_id = floor(prefix_sum /
  * budget)` where `prefix_sum` EXCLUDES the current document — a
  * document starts in the batch its prefix ends in, so batch sums
  * exceed `budget` by at most one document (the classic streaming-pack
  * guarantee; a bin-packing optimum is NP-hard and non-deterministic
  * under re-runs, which disqualifies it for reproducible training).
  *
  * Scale: one window per group — parallelism = |groups|, so group by
  * something with enough cardinality (split × lang, or a hash slice:
  * `Split.hashBucket(key) % nSlices`) and accept per-group budgets;
  * a single global ordered window would serialize 100 TB through one
  * partition. */
object Pack {

  def packByBudget(df: DataFrame, tokenCol: String, budget: Long,
                   orderCol: String,
                   groupCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("batch_id",
        floor((col("_cum") - col(tokenCol)) / lit(budget.toDouble))
          .cast("long"))
      .drop("_cum")
  }
}

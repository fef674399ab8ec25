package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a numeric
  * column — PSI (population stability index), the standard monitoring
  * statistic a production pipeline computes before accepting a new
  * extract (PSI > 0.2 ⇒ investigate). Beyond the reference (which
  * re-syncs blindly); pairs with [[ChangeDataCapture]]: snapshotDiff
  * says WHICH rows changed, PSI says whether the DISTRIBUTION moved.
  *
  * Shape: one tiny global min/max agg broadcast back (shared bucket
  * edges — per-snapshot edges would make the buckets incomparable),
  * one hash agg per snapshot over bucket ids, then a 10-row join. The
  * snapshots are scanned once each and never shuffled row-wise.
  *
  * Laplace-smoothed ((c+1)/(n+buckets)) so empty buckets stay finite —
  * deterministic and oracle-reproducible, unlike epsilon hacks. */
object Drift {

  /** Per-bucket PSI decomposition: (bucket, n_prev, n_next,
    * psi_contrib); sum of psi_contrib = the PSI. Buckets are `nBuckets`
    * equi-width bins over the COMBINED min/max. NULL values are dropped
    * (Spark's `least` would otherwise skip the null operand and silently
    * route every null row to the top bucket); a constant column
    * (mx == mn) puts all rows in bucket 0 instead of evaluating the
    * 0/0 = NaN bucket expression, whose NaN→int cast engines disagree
    * on. */
  def psiBuckets(prev: DataFrame, next: DataFrame, valueCol: String,
                 nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 1, "need at least 2 buckets")
    val all = prev.select(col(valueCol)).unionByName(next.select(col(valueCol)))
    val mm = all.agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    def bucketed(df: DataFrame, cnt: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .crossJoin(broadcast(mm))
        .select(when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col(valueCol) - col("mn")) /
              ((col("mx") - col("mn")) / nBuckets.toDouble)).cast("int")))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cnt))
    val p = bucketed(prev, "n_prev")
    val q = bucketed(next, "n_next")
    // totals as broadcast one-row aggregates of the 10-row bucket
    // tables — no driver-side count() actions in the plan
    val pt = p.agg(sum(col("n_prev")).cast("double").as("tot_p"))
    val qt = q.agg(sum(col("n_next")).cast("double").as("tot_q"))
    def share(c: Column, tot: Column): Column =
      (coalesce(c, lit(0L)).cast("double") + 1.0) / (tot + nBuckets)
    val ps = share(col("n_prev"), col("tot_p"))
    val qs = share(col("n_next"), col("tot_q"))
    p.join(q, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(pt)).crossJoin(broadcast(qt))
      .select(col("bucket"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_next"), lit(0L)).as("n_next"),
        (floor((ps - qs) * log(ps / qs) * 1e6 + 0.5).cast("double") / 1e6)
          .as("psi_contrib"))
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Iterative-algorithm plumbing that needs `private[sql]` access (same
  * packaging constraint as the expression files).
  *
  * `Dataset.localCheckpoint(eager = false)` is the right lineage cut for
  * a per-round loop — the returned plan is a flat [[LogicalRDD]], so
  * round k's Catalyst analysis cost stays O(1) instead of O(k) (a
  * 64-round nested-join plan overflows the tree-string stack before it
  * even gets slow) — but `Dataset.unpersist` cannot free it: the data
  * lives on the checkpoint-marked RDD, not in the CacheManager. This
  * reaches through the plan to that RDD.
  */
object DatasetUtils {

  /** Release the storage behind a locally-checkpointed DataFrame (no-op
    * fallback to `unpersist` for plans that are not a LogicalRDD).
    * Caller contract: every downstream dependent has already
    * materialized ITS checkpoint (lineage is truncated there, so the
    * freed blocks can no longer be needed).
    *
    * RELIABLY-checkpointed frames additionally delete their checkpoint
    * FILES: `spark.cleaner.referenceTracking.cleanCheckpoints` defaults
    * to false, so without this a k-round iterative run leaves k full
    * table snapshots in the checkpoint dir — disk exhaustion on exactly
    * the multi-day runs the reliable mode exists for. */
  def unpersistPlanRdd(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        if (l.rdd.getCheckpointFile.isDefined)
          org.apache.spark.rdd.ReliableRDDCheckpointData
            .cleanCheckpoint(l.rdd.sparkContext, l.rdd.id)
      case _ => df.unpersist()
    }
}

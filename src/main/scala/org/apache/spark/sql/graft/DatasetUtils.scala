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
  /** Force a LAZILY-marked checkpoint to materialize now, truncating
    * the plan RDD's dependency chain.
    *
    * Needed because `RDD.doCheckpoint` (invoked by `runJob` on every
    * action) only checkpoints the NEAREST marked RDD on each lineage
    * path and skips marked ANCESTORS (unless
    * `spark.checkpoint.checkpointAllMarkedAncestors` is set, which a
    * library cannot assume). In a two-table iterative loop where the
    * per-round action lands on table A's mark, table B's marks are
    * always ancestors — they persist their blocks (the storage side
    * effect happens at mark time) but NEVER truncate, so B's RDD chain
    * grows with the round count and task serialization eventually
    * overflows the stack (observed: BPE at ~250 rounds, depth ~500).
    *
    * Call AFTER an action has computed the frame's partitions: for a
    * local checkpoint they are then all cached, so materialization is a
    * metadata-only no-op job; for a reliable checkpoint this runs the
    * file-writing job (the documented durability tax). */
  def materializeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.doCheckpoint()
      case _ => ()
    }

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

package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic release for caches created inside LAZY query builders.
  *
  * A `queries()` entry returns an unevaluated plan; when that plan needs
  * a persisted stage boundary (e.g. the scrub+score subtree of
  * `pipeline_curation_full`, consumed by five downstream branches), the
  * builder cannot unpersist it — the cache must outlive the builder and
  * serve the caller's eventual action. Relying on ContextCleaner's
  * reference tracking works in batch but is nondeterministic: in a
  * long-lived serving or bench session, repeated invocations ratchet
  * block-manager footprint until a GC happens to run, and a later
  * identical plan can silently warm-start off a leaked cache — the exact
  * bench-flattering artifact the round-6 `dedup_components` fix removed.
  *
  * Contract: builders persist through [[stage]]; the harness that OWNS
  * the query lifecycle (Verify after each dump, Bench after each timed
  * action, a serving loop after each request) calls [[releaseAll]] once
  * the action is done. Unpersist is blocking=false — executors drop
  * blocks asynchronously; correctness never depends on a cache.
  */
object StageCache {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for the next
    * [[releaseAll]]. Returns the SAME frame reference (Spark matches
    * cached plans by analyzed-plan equality on this reference). */
  def stage(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    live.add(p)
    p
  }

  /** Unpersist every staged frame registered since the last call. Safe
    * to call at any query boundary — double-unpersist is a no-op. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }

  /** Staged frames awaiting release (spec observability). */
  def liveCount: Int = live.size()
}

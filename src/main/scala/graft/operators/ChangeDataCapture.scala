package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-diff change-data-capture: derive a changelog from two lake
  * snapshots. The reference re-extracts and re-indexes every entity on
  * every sync run (src/data_sync.py:923-934) — at 100 TB the only
  * viable sync is shipping the *delta*. This operator computes it from
  * any two snapshots with one full-outer join on the key plus a
  * structural row-hash comparison (no column-by-column predicate
  * explosion, constant-width shuffle rows regardless of entity width).
  *
  * Output: (key, change_type ∈ insert|delete|update) — `unchanged` rows
  * are dropped (they are the overwhelming majority at scale and carry
  * no information for the sink). Feeding the result into
  * [[graft.streaming.IncrementalSync.changelogUpsert]]'s batch analog
  * closes the loop: extract-diff-upsert instead of full rewrite.
  */
object ChangeDataCapture {

  /** Rows of `next` not in `prev` (insert), rows gone (delete), rows
    * whose compared columns' md5 differs (update). `compareCols` defaults
    * to all non-key columns shared by both snapshots.
    *
    * The row hash is `xxhash64(struct(cols))`: Spark hashes the struct
    * STRUCTURALLY (per-field, null bits included), so column boundaries
    * and null-vs-value are unambiguous — unlike a separator-joined
    * string concat, where a value containing the separator shifts
    * boundaries and a literal sentinel string collides with NULL. A
    * 64-bit collision maps a real update to "unchanged" with P≈2⁻⁶⁴
    * per changed key — the standard CDC trade, and the same keying
    * argument as the dedup operators'. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
                   compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else prev.columns.toSeq.filter(c =>
        c != idCol && next.columns.contains(c))
    def hashed(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol),
        xxhash64(struct(cols.map(col): _*)).as(s"_h_$tag"))
    hashed(prev, "a").join(hashed(next, "b"), Seq(idCol), "full_outer")
      .withColumn("change_type",
        when(col("_h_a").isNull, "insert")
          .when(col("_h_b").isNull, "delete")
          .when(col("_h_a") =!= col("_h_b"), "update"))
      .filter(col("change_type").isNotNull)
      .select(col(idCol), col("change_type"))
  }
}

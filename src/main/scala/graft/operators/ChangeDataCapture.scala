package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-diff change-data-capture: derive a changelog from two lake
  * snapshots. The reference re-extracts and re-indexes every entity on
  * every sync run (src/data_sync.py:923-934) — at 100 TB the only
  * viable sync is shipping the *delta*. This operator computes it from
  * any two snapshots with one full-outer join on the key plus an
  * md5-row-hash comparison (no column-by-column predicate explosion,
  * constant-width shuffle rows regardless of entity width).
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
    * to all non-key columns shared by both snapshots. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
                   compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else prev.columns.toSeq.filter(c =>
        c != idCol && next.columns.contains(c))
    def hashed(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws("\u0001",
          cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))
          .as(s"_h_$tag"))
    hashed(prev, "a").join(hashed(next, "b"), Seq(idCol), "full_outer")
      .withColumn("change_type",
        when(col("_h_a").isNull, "insert")
          .when(col("_h_b").isNull, "delete")
          .when(col("_h_a") =!= col("_h_b"), "update"))
      .filter(col("change_type").isNotNull)
      .select(col(idCol), col("change_type"))
  }
}

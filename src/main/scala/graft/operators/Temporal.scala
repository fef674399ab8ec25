package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal join operators — beyond the reference (SURVEY §2.12 lists
  * as-of/range joins as absent), but core to a training-data pipeline
  * that aligns events with the latest state snapshot at event time
  * (features-as-of-label-time, point-in-time correctness).
  *
  * [[asOfJoin]] is the composition-first implementation (design-brief
  * preference (a)): no custom strategy, no range cross join. The two
  * sides are unioned with a side tag and processed by ONE window over
  * (key, time): the most recent right-side row is carried forward onto
  * each left row as a single struct — `last(struct, ignoreNulls)` over
  * the unbounded-preceding frame — so a right row's columns can never
  * be mixed across rows even when individual values are null. Cost: a
  * single hash shuffle on the key + per-partition sort — the same
  * complexity as the latest-per-key window (W1), linear in input,
  * skew-safe under AQE. A custom-`SparkStrategy` range-binning variant
  * only becomes necessary when one side must stay unshuffled.
  */
object Temporal {

  /** For each left row, attach the latest right row with
    * `right.tsCol <= left.tsCol` and equal join key ("backward" as-of
    * join — the Pandas `merge_asof` / DuckDB `ASOF JOIN` default). Left
    * rows with no prior right row keep null right columns (left outer).
    *
    * Right-side ties on (key, ts) are resolved by `rightTiebreak`
    * (largest wins), making the result total-order deterministic — the
    * same determinism stance as the W1 latest-per-key tiebreak.
    *
    * Both inputs must share `keyCol`/`tsCol` names; `valueCols` are the
    * right-side columns carried onto left rows (appended to the output).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      valueCols: Seq[String],
      rightTiebreak: String): DataFrame =
    asOfImpl(left, right, keyCol, tsCol, valueCols, rightTiebreak,
      forward = false)

  /** FORWARD as-of join: each left row attaches the EARLIEST right row
    * with `right.tsCol >= left.tsCol` — next-state-at-or-after
    * (label-after-feature alignment: "what happened next"). Same
    * one-window machinery as [[asOfJoin]] scanning time DESCENDING;
    * right ties on (key, ts) resolve by SMALLEST `rightTiebreak` (the
    * mirror of backward's largest-wins). */
  def asOfJoinForward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      valueCols: Seq[String],
      rightTiebreak: String): DataFrame =
    asOfImpl(left, right, keyCol, tsCol, valueCols, rightTiebreak,
      forward = true)

  private def asOfImpl(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      valueCols: Seq[String],
      rightTiebreak: String,
      forward: Boolean): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val leftCols = left.columns.toSeq
    val passCols = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val lvType = StructType(passCols.map(c =>
      StructField(c, left.schema(c).dataType, nullable = true)))
    val rvType = StructType(valueCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    val l = left.select(
      col(keyCol), col(tsCol),
      struct(passCols.map(col): _*).as("_lv"),
      lit(1).as("_side"),
      lit(null).cast("long").as("_tb"),
      lit(null).cast(rvType).as("_rv"))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(null).cast(lvType).as("_lv"),
      lit(0).as("_side"),
      col(rightTiebreak).cast("long").as("_tb"),
      struct(valueCols.map(col): _*).as("_rv"))

    // at equal ts, right rows (side 0) sort before left rows (<=/>=
    // joins same-instant state); among right ties the winning tiebreak
    // sorts LAST in scan order so `last` keeps it — largest for
    // backward (ts asc, tb asc), smallest for forward (ts desc, tb desc)
    val w = (if (forward)
        Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).desc, col("_side"), col("_tb").desc)
      else
        Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol), col("_side"), col("_tb")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map {
        case c if c == keyCol || c == tsCol => col(c)
        case c => col(s"_lv.$c").as(c)
      } ++ valueCols.map(c => col(s"_rv.$c").as(c)): _*)
  }

  /** Interval (range) join: each left "point" row meets the right
    * "interval" rows whose `[loCol, hiCol)` contains `pointCol` —
    * re-expressed as an EQUI join by overlap binning, because the naive
    * form (`join` on a `>= && <` condition) plans as a nested-loop /
    * cartesian product, O(n·m) and a non-starter at scale:
    *
    *  - each interval is exploded to the bins it overlaps
    *    (`sequence(floor(lo/w), floor(hi/w))` — tiny for intervals not
    *    much wider than `binWidth`);
    *  - each point computes its single bin;
    *  - a hash equi-join on the bin meets every (point, interval) pair
    *    in EXACTLY one bin — the point's — so the residual range
    *    predicate only filters, never dedups;
    *  - cost: one hash shuffle of points + intervals×(width/binWidth),
    *    combiner-friendly, AQE-skew-splittable. Pick `binWidth` near
    *    the typical interval width: wider bins → fewer interval
    *    replicas but more false candidates to filter, and vice versa.
    */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
                       floor(col(hiCol) / binWidth).cast("long"))))
    val pts = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    pts.join(binned, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}

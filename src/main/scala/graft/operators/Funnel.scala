package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — for each user, the longest prefix of an ordered
  * step sequence (view → click → purchase …) completed in strictly
  * increasing event time. The product-analytics staple that looks like
  * a self-join chain but is really a per-key linear scan.
  *
  * ONE key-hash shuffle: events collect per user, sort in-row, and a
  * higher-order `aggregate` advances the stage pointer on the first
  * step-matching event strictly after the previous stage's timestamp —
  * sequential-min semantics (stage k's time = min time of step-k events
  * after stage k−1), so the result is a pure function of the (ts, type)
  * VALUES: ties in the sort order cannot change it. The equivalent
  * self-join formulation (k−1 joins) shuffles the events table k times;
  * this shuffles it once and does per-user O(events·k) comparisons
  * in-row — per-user state is that user's events, the same bound as any
  * sessionization.
  */
object Funnel {

  /** (userCol, stage_reached) — stage_reached ∈ [0, steps.length].
    *
    * `tsCol` may be an integral time unit (compared as-is) or a real
    * TimestampType (compared at microsecond precision via
    * `unix_micros`). A bare `cast("long")` on a timestamp would yield
    * epoch SECONDS and silently collapse same-second events under the
    * strictly-after rule. */
  def stages(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val tsLong = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val evs = sort_array(collect_list(
      struct(tsLong.as("ts"), col(typeCol).as("ty"))))
    val zero = struct(lit(0).as("stage"),
      lit(Long.MinValue).as("last"))
    val step = (acc: Column, e: Column) => {
      val stage = acc.getField("stage")
      val last = acc.getField("last")
      // the step name this stage is waiting for (null once complete)
      val want = steps.zipWithIndex
        .foldLeft(lit(null).cast("string")) { case (a, (s, i)) =>
          when(stage === i, s).otherwise(a)
        }
      when(want.isNotNull && e.getField("ty") === want &&
          e.getField("ts") > last,
        struct((stage + 1).as("stage"), e.getField("ts").as("last")))
        .otherwise(acc)
    }
    events.groupBy(col(userCol))
      .agg(aggregate(evs, zero, step, _.getField("stage"))
        .as("stage_reached"))
  }
}

package graft

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def run(evs: Seq[(Long, Long, String)]): Map[Long, Int] =
    Funnel.stages(evs.toDF("u", "ts", "ty"), "u", "ts", "ty", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("stage advances only on the right step in strict time order") {
    val out = run(Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"), // full
      (2L, 10L, "click"), (2L, 20L, "view"),                   // view only
      (3L, 10L, "view"), (3L, 20L, "buy"),  // skipped click: stuck at 1
      (4L, 10L, "other")))                                     // nothing
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("TimestampType events compare at MICROsecond precision — " +
    "same-second events are not collapsed") {
    // 100µs apart within one second: a bare cast("long") would see
    // equal epoch-seconds and the strict > rule would stall the funnel
    val evs = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.0001"), "view"),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.0002"), "click"),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.0003"), "buy"))
      .toDF("u", "ts", "ty")
    val out = Funnel.stages(evs, "u", "ts", "ty", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3))
  }

  test("equal timestamps do not advance (strict >), later events do") {
    // click at the SAME instant as the view must not count; a later one
    // does even if an earlier-sorted same-ts event exists
    assert(run(Seq((1L, 10L, "view"), (1L, 10L, "click"))) == Map(1L -> 1))
    assert(run(Seq(
      (2L, 10L, "view"), (2L, 10L, "click"), (2L, 11L, "click")))
      == Map(2L -> 2))
  }

  test("earliest qualifying event wins: a later view cannot reset") {
    // view@10, view@50, click@20: funnel uses view@10 → click@20 counts
    assert(run(Seq((1L, 10L, "view"), (1L, 50L, "view"),
      (1L, 20L, "click"))) == Map(1L -> 2))
  }
}

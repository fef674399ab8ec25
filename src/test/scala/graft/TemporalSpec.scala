package graft

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // trades (left) pick up the latest quote (right) at-or-before their ts
  private val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
    (2L, 10L, "t3")
  ).toDF("k", "ts", "trade")
  private val quotes = Seq(
    (1L, 10L, 100.0, 1L), (1L, 15L, 150.0, 2L),
    (2L, 99L, 999.0, 3L)
  ).toDF("k", "ts", "px", "qid")

  test("backward as-of join: latest right row at-or-before each left ts") {
    val out = Temporal.asOfJoin(trades, quotes, "k", "ts",
      Seq("px", "qid"), "qid")
      .orderBy("k", "ts").collect()
    // k=1: t0@5 → no quote; t1@10 → quote@10 (<=); t2@20 → quote@15
    assert(out(0).isNullAt(3))                       // t0: no prior quote
    assert(out(1).getAs[Double]("px") == 100.0)      // t1: same-ts quote
    assert(out(2).getAs[Double]("px") == 150.0)      // t2: latest prior
    assert(out(3).isNullAt(3))                       // k=2: quote after
  }

  test("right ties on (key, ts) resolve to the largest tiebreak") {
    val dupQuotes = Seq(
      (1L, 10L, 1.0, 1L), (1L, 10L, 2.0, 2L)).toDF("k", "ts", "px", "qid")
    val out = Temporal.asOfJoin(
      trades.filter($"trade" === "t1"), dupQuotes, "k", "ts",
      Seq("px"), "qid").collect()
    assert(out.head.getAs[Double]("px") == 2.0)
  }

  test("forward as-of join: earliest right row at-or-after each left ts") {
    val out = Temporal.asOfJoinForward(trades, quotes, "k", "ts",
      Seq("px", "qid"), "qid")
      .orderBy("k", "ts").collect()
    // k=1: t0@5 → quote@10; t1@10 → quote@10 (>=); t2@20 → none
    assert(out(0).getAs[Double]("px") == 100.0)
    assert(out(1).getAs[Double]("px") == 100.0)
    assert(out(2).isNullAt(3))
    assert(out(3).getAs[Double]("px") == 999.0)      // k=2: quote@99
  }

  test("forward ties on (key, ts) resolve to the smallest tiebreak") {
    val dupQuotes = Seq(
      (1L, 10L, 1.0, 1L), (1L, 10L, 2.0, 2L)).toDF("k", "ts", "px", "qid")
    val out = Temporal.asOfJoinForward(
      trades.filter($"trade" === "t1"), dupQuotes, "k", "ts",
      Seq("px"), "qid").collect()
    assert(out.head.getAs[Double]("px") == 1.0)
  }

  test("right row columns are carried as one unit (no cross-row mixing)") {
    // latest quote has null px — an ignoreNulls-per-column carry would
    // wrongly surface the OLDER px with the NEWER qid
    val q = Seq((1L, 8L, Some(100.0), 1L), (1L, 9L, None, 2L))
      .toDF("k", "ts", "px", "qid")
    val out = Temporal.asOfJoin(
      trades.filter($"trade" === "t1"), q, "k", "ts",
      Seq("px", "qid"), "qid").collect()
    assert(out.head.isNullAt(3))                 // px from the @9 row
    assert(out.head.getAs[Long]("qid") == 2L)    // qid from the @9 row
  }
}

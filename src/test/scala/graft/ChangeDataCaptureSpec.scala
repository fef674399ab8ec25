package graft

import graft.operators.ChangeDataCapture

class ChangeDataCaptureSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update, drops unchanged") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v")
    val next = Seq((2L, "b"), (3L, "C"), (4L, "d"))
      .toDF("id", "v")
    val out = ChangeDataCapture.snapshotDiff(prev, next, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("scd2History collapses runs, intervals chain, one current row") {
    // user 1: a@10, a@20 (collapsed), b@30, a@40 — 3 versions
    // user 2: x@15 only — a single current row
    val log = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "a"),
      (1L, 30L, 102L, "b"), (1L, 40L, 103L, "a"),
      (2L, 15L, 104L, "x")
    ).toDF("k", "ts", "seq", "v")
    val out = ChangeDataCapture
      .scd2History(log, "k", "ts", "seq", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4),
        r.getBoolean(5))).toSet
    assert(out == Set(
      (1L, "a", 10L, Some(30L), 1, false),
      (1L, "b", 30L, Some(40L), 2, false),
      (1L, "a", 40L, None, 3, true),
      (2L, "x", 15L, None, 1, true)))
  }

  test("scd2History: same-ts changes are ordered by the tie column") {
    val log = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
      .toDF("k", "ts", "seq", "v")
    val out = ChangeDataCapture
      .scd2History(log, "k", "ts", "seq", Seq("v"))
      .collect().map(r => (r.getString(1), r.getInt(4))).toSet
    assert(out == Set(("a", 1), ("b", 2)))
  }

  test("null and empty values do not collide; field boundaries hold") {
    // (null) vs ("") must differ; ("ab","c") vs ("a","bc") must differ
    val prev = Seq((1L, Option.empty[String], "x"), (2L, Some("ab"), "c"))
      .toDF("id", "v1", "v2")
    val next = Seq((1L, Some(""), "x"), (2L, Some("a"), "bc"))
      .toDF("id", "v1", "v2")
    val out = ChangeDataCapture.snapshotDiff(prev, next, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "update", 2L -> "update"))
  }
}

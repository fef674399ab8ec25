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

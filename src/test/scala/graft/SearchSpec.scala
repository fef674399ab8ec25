package graft

import org.apache.spark.sql.functions._

import graft.serving.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the window is a window", "src_a"),
    (2L, "no match here", "src_b"),
    (3L, "window", "window_src"),
    (4L, null, "also window")
  ).toDF("doc_id", "text", "source")

  test("multiField retrieves matches across fields, ranked by occurrences") {
    val out = Search.multiField(docs, "window", Seq("text", "source"))
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 4L))
    assert(out(0).getAs[Int]("score") == 2)
    assert(out(1).getAs[Int]("score") == 2) // tie broken by doc_id
  }

  test("multiField is case-insensitive and null-safe") {
    val out = Search.multiField(docs, "WINDOW", Seq("text"))
    assert(out.count() == 2) // null text row doesn't blow up
  }

  test("bm25: term-frequency saturation — repeating a term cannot " +
    "grow its contribution past (k1+1)·idf") {
    // same length (8 tokens), same single query term, different tf:
    // scores must increase with tf but with strictly diminishing returns
    val d = Seq(
      (1L, "window pad pad pad pad pad pad pad"),
      (2L, "window window pad pad pad pad pad pad"),
      (3L, "window window window window pad pad pad pad"),
      (4L, "window window window window window window window window"))
      .toDF("doc_id", "text")
    val s = Search.bm25(d, "window", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1) < s(2) && s(2) < s(3) && s(3) < s(4))
    assert(s(2) - s(1) > s(3) - s(2) && s(3) - s(2) > s(4) - s(3),
      s"no diminishing returns: $s")
    // tf·idf by contrast is linear in tf on this corpus (tf = 1,2,4,8;
    // idf = (4+1)/(4+1) = 1 exactly, so scores are exact doubles)
    val lin = Search.tfidf(d, "window", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lin(2) == 2 * lin(1) && lin(3) == 2 * lin(2) &&
      lin(4) == 2 * lin(3), s"tfidf not linear in tf: $lin")
  }

  test("bm25: doc-length normalization — same tf scores lower in a " +
    "longer document") {
    val d = Seq(
      (1L, "window short doc"),
      (2L, "window " + Seq.fill(40)("pad").mkString(" ")),
      (3L, "unrelated text entirely"))
      .toDF("doc_id", "text")
    val s = Search.bm25(d, "window", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!s.contains(3L))
    assert(s(1) > s(2), s"length normalization missing: $s")
  }

  test("sql passthrough serves registered lake tables") {
    docs.createOrReplaceTempView("search_docs")
    val out = Search.sql(spark,
      "SELECT count(*) AS n FROM search_docs WHERE source LIKE 'src%'")
    assert(out.collect()(0).getAs[Long]("n") == 2L)
  }
}

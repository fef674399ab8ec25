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

  test("sql passthrough serves registered lake tables") {
    docs.createOrReplaceTempView("search_docs")
    val out = Search.sql(spark,
      "SELECT count(*) AS n FROM search_docs WHERE source LIKE 'src%'")
    assert(out.collect()(0).getAs[Long]("n") == 2L)
  }
}

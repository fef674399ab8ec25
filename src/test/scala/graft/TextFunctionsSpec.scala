package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)

  test("tokens drops empties from repeated/leading whitespace") {
    assert(one("  a  b\tc ", tokenCount(col("text"))) == 3)
  }

  test("analyzerTokens: standard-analyzer segmentation — punctuation " +
    "splits, word-internal apostrophe/dot join, lowercase; the " +
    "driver-side twin analyzeText agrees") {
    val cases = Seq(
      "Hello, world!" -> Seq("hello", "world"),
      "don't stop-me now" -> Seq("don't", "stop", "me", "now"),
      "U.S.A. rocks" -> Seq("u.s.a", "rocks"),
      "3.14 is pi" -> Seq("3.14", "is", "pi"),
      "foo_bar baz's" -> Seq("foo_bar", "baz's"),
      "CUSTOMER#000000042" -> Seq("customer", "000000042"),
      "4-NOT SPECIFIED" -> Seq("4", "not", "specified"),
      "a''b" -> Seq("a", "b"),
      "'quoted'" -> Seq("quoted"),
      "" -> Nil,
      "  ,.!  " -> Nil)
    cases.foreach { case (text, want) =>
      assert(one(text, analyzerTokens(col("text")))
        .asInstanceOf[scala.collection.Seq[String]].toSeq == want,
        s"column path: '$text'")
      assert(analyzeText(text) == want, s"driver path: '$text'")
    }
    // null column analyzes to the empty token array (coalesced)
    import spark.implicits._
    val n = Seq[Option[String]](None).toDF("text")
      .select(analyzerTokenCount(col("text"))).collect()(0).getInt(0)
    assert(n == 0)
  }

  test("analyzerTokensSql spells the SAME grammar for DuckDB (RE2): " +
    "pattern constants stay in lockstep") {
    assert(AnalyzerPatternSql == AnalyzerPattern.replace("'", "''"))
    assert(analyzerTokensSql("text").contains(AnalyzerPatternSql))
  }

  test("shingles builds word n-grams; short docs collapse to one") {
    assert(one("a b c d", shingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b c", "b c d"))
    assert(one("a b", shingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b"))
  }

  test("stopwordRatio and qualityScore stay in [0,1]") {
    for (t <- Seq("the the the", "zzz qqq", "", "the quick brown fox is")) {
      val q = one(t, qualityScore(col("text"))).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"quality($t)=$q")
    }
  }

  test("langId picks the dominant lexicon, 'und' when none hits") {
    assert(one("the cat is in the house", langId(col("text"))) == "en")
    assert(one("el gato que se fue no es de la casa", langId(col("text"))) == "es")
    assert(one("der hund ist nicht mit der katze", langId(col("text"))) == "de")
    assert(one("le chat est une des betes du pas", langId(col("text"))) == "fr")
    assert(one("zzz qqq www", langId(col("text"))) == "und")
  }

  test("fingerprint is order-insensitive and content-sensitive") {
    assert(one("a b c", fingerprint(col("text"))) ==
           one("c b a b", fingerprint(col("text"))))
    assert(one("a b c", fingerprint(col("text"))) !=
           one("a b d", fingerprint(col("text"))))
  }

  test("simhash64: identical text agrees, near text is close, far is far") {
    def sh(t: String): Long =
      one(t, simhash64(col("text"))).asInstanceOf[Long]
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "spark scan filter join group window sort agg merge batch " +
      "stream table row column value key hash part"
    val near = base + " extra"
    val far = "totally different words about cats dogs birds fish " +
      "mountains rivers oceans clouds thunder lightning"
    assert(sh(base) == sh(base))
    assert(hamming(sh(base), sh(near)) <= 12)
    assert(hamming(sh(base), sh(far)) > 12)
  }
}

package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{KeywordAutomaton, KeywordExpressions}

/** Aho–Corasick keyword tagging: automaton == naive contains-filter on
  * adversarial keyword sets (shared prefixes/suffixes, keywords inside
  * keywords, overlapping occurrences), plus the Spark expression
  * round-trip. */
class KeywordSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, kws: Seq[String]): Seq[String] =
    kws.filter(text.contains)

  test("classic AC case: ushers finds he, she, hers via failure links") {
    val ac = new KeywordAutomaton(
      Array("he", "she", "his", "hers"))
    val got = ac.matchSet("ushers").map(Array("he", "she", "his", "hers"))
    assert(got.toSeq == Seq("he", "she", "hers"))
  }

  test("keywords nested in keywords and overlapping matches all fire") {
    val kws = Seq("win", "window", "dow", "indo", "w", "o")
    val ac = new KeywordAutomaton(kws.toArray)
    assert(ac.matchSet("window").map(kws).toSeq == kws)
    assert(ac.matchSet("xyz").isEmpty)
    assert(new KeywordAutomaton(Array("aa")).matchSet("aaa").length == 1)
  }

  test("automaton == naive contains on random keyword sets and texts") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alpha = Gen.choose('a', 'd') // tiny alphabet → dense overlaps
    val word = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    val caseGen = for {
      kws <- Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
      text <- Gen.choose(0, 60)
        .flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    } yield (kws.distinct, text)
    val cases = (0 until 300).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(31L + i)))
    assert(cases.size > 250)
    cases.foreach { case (kws, text) =>
      val ac = new KeywordAutomaton(kws.toArray)
      val got = ac.matchSet(text).map(kws).toSeq
      assert(got == naive(text, kws), s"kws=$kws text=$text")
    }
  }

  test("Spark expression: codegen path matches naive filter per row") {
    val kws = Seq("he", "she", "his", "hers", "ush")
    val rows = Seq((1L, "ushers"), (2L, "history of his"), (3L, ""),
      (4L, "nothing relevant"))
    val got = rows.toDF("id", "t")
      .select(col("id"),
        KeywordExpressions.keywordMatches(col("t"), kws).as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    rows.foreach { case (id, t) =>
      assert(got(id) == naive(t, kws), s"row $id")
    }
    // null text → null result, not a crash
    val n = Seq((5L, null: String)).toDF("id", "t")
      .select(KeywordExpressions.keywordMatches(col("t"), kws))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("graft_keywords is reachable from SQL with a literal keyword " +
    "array; non-literal lists are a clear error") {
    val r = spark.sql(
      "SELECT graft_keywords('ushers', array('he','she','his','hers'))")
      .collect().head.getSeq[String](0)
    assert(r == Seq("he", "she", "hers"))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_keywords(t, array(t)) " +
        "FROM VALUES ('x') AS v(t)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}

package graft

import org.apache.spark.sql.Row

import graft.operators.LanguageModel

/** Stupid-backoff LM scoring: every branch (seen bigram, backoff to
  * unigram, OOV floor) pinned against hand-computed values on a corpus
  * small enough to verify on paper. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // train corpus: "a b" x2, "a c" x1  => c1: a=3, b=1, c=1 (wait: "a b"
  // contributes a,b) — computed precisely in each test below.
  private val train = Seq(
    (1L, "a b a b"), // bigrams: a b, b a, a b
    (2L, "a c")      // bigrams: a c
  ).toDF("doc_id", "text")

  test("unigram and bigram counts are plain multiplicity counts") {
    val uni = LanguageModel.unigramCounts(train, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 3, "b" -> 2, "c" -> 1))
    val bg = LanguageModel.bigramCounts(train, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bg == Map("a b" -> 2, "b a" -> 1, "a c" -> 1))
  }

  test("seen-bigram, backoff, and OOV-floor branches score correctly") {
    // N = 6 total train tokens; alpha = 0.4
    // eval doc 10: "a b"    -> seen bigram:   ln(c2("a b")/c1(a)) = ln(2/3)
    // eval doc 11: "b c"    -> unseen bigram, seen c: ln(0.4 * 1/6)
    // eval doc 12: "a z"    -> OOV z:         ln(0.4 / 6)
    val eval = Seq((10L, "a b"), (11L, "b c"), (12L, "a z"))
      .toDF("doc_id", "text")
    val out = LanguageModel
      .scoreStupidBackoff(train, eval, "doc_id", "text")
      .collect().map { case Row(id: Long, n: Long, lp: Double, _: Double) =>
        id -> ((n, lp))
      }.toMap
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    assert(out(10L) == ((1L, r4(math.log(2.0 / 3.0)))))
    assert(out(11L) == ((1L, r4(math.log(0.4 * 1.0 / 6.0)))))
    assert(out(12L) == ((1L, r4(math.log(0.4 / 6.0)))))
  }

  test("ppl = exp(-avg_logp); multi-bigram docs average") {
    // eval doc: "a b a" -> bigrams "a b" (ln 2/3), "b a" (ln 1/2)
    val eval = Seq((20L, "a b a")).toDF("doc_id", "text")
    val Row(_, n: Long, lp: Double, ppl: Double) = LanguageModel
      .scoreStupidBackoff(train, eval, "doc_id", "text").collect()(0)
    val expected = (math.log(2.0 / 3.0) + math.log(1.0 / 2.0)) / 2.0
    assert(n == 2L)
    assert(math.abs(lp - expected) < 1e-4)
    assert(math.abs(ppl - math.exp(-expected)) < 1e-3)
  }

  test("docs under 2 tokens produce no rows") {
    val eval = Seq((30L, "a"), (31L, "")).toDF("doc_id", "text")
    assert(LanguageModel
      .scoreStupidBackoff(train, eval, "doc_id", "text").count() == 0)
  }
}

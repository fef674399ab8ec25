package graft

import graft.operators.Bpe
import graft.oracle.GoldenModels

/** BPE merge training: hand-checkable merges on a tiny corpus, exact
  * agreement with the from-scratch golden trainer on real testdata, and
  * the early-stop path. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges follow pair frequency with deterministic tie-break") {
    // corpus: "low low low lower" — 'l o' and 'o w' both appear 4 times
    // (every word), tie broken lexicographically: "l o" < "o w".
    // After merging (l,o): pairs are (lo,w)x4 ... then (lo,w) wins.
    val docs = Seq("low low low", "lower").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 2)
    assert(merges == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L)))
  }

  test("merged symbol does not re-pair within the same round") {
    // "aaaa</w>": pairs (a,a)x3 — merge produces [aa, aa, </w>], i.e.
    // leftmost-nonoverlapping, NOT [aa, a, a, ...] double-merge
    val docs = Seq("aaaa").toDF("text")
    val m1 = Bpe.trainMerges(docs, "text", numMerges = 2)
    assert(m1(0) == ((1, "a", "a", 3L)))
    // round 2: symbols [aa, aa, </w>] → (aa,aa) and (aa,</w>) tie at 1;
    // '<' < 'a' so the right-side tie-break picks (aa, </w>)
    assert(m1(1) == ((2, "aa", "</w>", 1L)))
  }

  test("early-stops when words are fully merged") {
    val docs = Seq("ab").toDF("text")
    // symbols [a, b, </w>]: merge 1 (a,b), merge 2 (ab,</w>), then the
    // single symbol [ab</w>] has no pairs left
    val merges = Bpe.trainMerges(docs, "text", numMerges = 10)
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode: subword counts shrink as merges apply, words unchanged") {
    val docs = Seq((1L, "low low lower"), (2L, "x")).toDF("doc_id", "text")
    // no merges: every word costs |chars|+1 symbols
    val none = Bpe.encodeTokenCounts(docs, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(none(1L) == ((3L, (4L + 4L + 6L))))
    assert(none(2L) == ((1L, 2L)))
    // merges (l,o), (lo,w), (low,</w>): "low" → 1 symbol, "lower" → lo|w|e|r|</w>
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val m = Bpe.encodeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == (1L + 1L + 4L))
    // golden encoder agrees
    val g = GoldenModels.bpeEncode(
      Seq((1L, "low low lower"), (2L, "x")), merges)
    assert(g == Set((1L, 3L, 6L), (2L, 1L, 2L)))
  }

  test("vocab: corpus-weighted symbol frequencies after merges") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    // "low"x2 → [low, </w>] each; "lower" → [low, e, r, </w>]
    val v = graft.operators.Bpe.vocab(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("low" -> 3L, "</w>" -> 3L, "e" -> 1L, "r" -> 1L))
    // golden agrees, ordered head
    val g = GoldenModels.bpeVocab(Seq("low low lower"), merges, k = 10)
    assert(g == Seq(("</w>", 3L), ("low", 3L), ("e", 1L), ("r", 1L)))
  }

  test("agrees exactly with the from-scratch golden trainer on testdata") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Bpe.trainMerges(docs, "text", numMerges = 6)
    val want = GoldenModels.bpeMerges(
      docs.select("text").collect().map(_.getString(0)).toSeq,
      numMerges = 6)
    assert(got == want)
  }
}

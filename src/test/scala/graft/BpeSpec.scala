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

  test("64 merges: incremental trainer == golden; recount reference " +
    "form agrees on its prefix") {
    // 100 real docs keep the corpus rich enough that 64 distinct merges
    // exist while the per-round tables stay tiny
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("doc_id % 5 = 0")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = GoldenModels.bpeMerges(texts, numMerges = 64)
    assert(want.length == 64, s"corpus too small: ${want.length} merges")
    val inc = Bpe.trainMerges(docs, "text", numMerges = 64)
    assert(inc == want)
    // the recount form is cross-checked on a prefix (its per-round plan
    // depth grows linearly — exactly why it is not the production path)
    val rec = Bpe.trainMergesRecount(docs, "text", numMerges = 24)
    assert(rec == want.take(24))
  }

  /** The sub-linear witness's corpus: 1500 seeded word types with
    * Zipf-ish counts — a realistic word-type table (the testdata lexicon
    * has only ~31 types, too few for deep merge budgets). */
  private def zipfTexts(): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val types = (1 to 1500).map { rank =>
      val len = 3 + rnd.nextInt(8)
      val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      w -> math.max(1L, 3000L / rank)
    }.toMap // map: random duplicates collapse
    types.toSeq.map { case (w, c) => Seq.fill(c.toInt)(w).mkString(" ") }
  }

  test("batched merge rounds == sequential greedy BPE at 256 merges, " +
    "in far fewer driver rounds") {
    val texts = zipfTexts()
    val want = GoldenModels.bpeMerges(texts, numMerges = 256)
    assert(want.length == 256, s"corpus too small: ${want.length}")
    val (got, rounds) = Bpe.trainMergesBatched(
      texts.toDF("text"), "text", numMerges = 256, batchCap = 64)
    // EXACT sequential semantics — the batch-selection invariants
    // (prefix, symbol-disjoint, created-pair dominance) make the
    // batched trainer bit-identical to one-merge-per-round greedy
    assert(got == want)
    // and the point of batching: a vocabulary costs far fewer driver
    // round-trips than merges (the 32k-vocab scale story). ≥2× on this
    // interaction-heavy 26-letter corpus (observed ~2.9×); batches grow
    // with depth as the pair tail sparsifies, which is where a 32k-run
    // spends nearly all its rounds.
    info(s"256 merges in $rounds rounds")
    assert(rounds <= 256 / 2, s"expected ≥2× round reduction: $rounds")
    // batchCap=1 is the sequential form: one merge per round
    val (one, oneRounds) = Bpe.trainMergesBatched(
      texts.toDF("text"), "text", numMerges = 8, batchCap = 1)
    assert(one == want.take(8) && oneRounds == 8)
  }

  test("deep vocab: 1000 merges match the golden greedy trainer (the " +
    "depth that overflowed task serialization before the ancestor-" +
    "checkpoint materialization fix)") {
    val texts = zipfTexts()
    val want = GoldenModels.bpeMerges(texts, numMerges = 1000)
    assert(want.length == 1000, s"corpus exhausted at ${want.length}")
    val (adaptive, adaptiveRounds) = Bpe.trainMergesBatched(
      texts.toDF("text"), "text", numMerges = 1000)
    assert(adaptive == want, "adaptive trainer diverged from greedy")
    info(s"1000 merges in $adaptiveRounds driver rounds")
    // the accept window is open (fetch > want), so the binding
    // constraint is the data's interaction structure, never the cap
    assert(adaptiveRounds < 1000, "batching made no progress over 1/round")
  }

  test("batch selection refuses created-symbol aliasing: two merges " +
    "minting the same string, or a prior round's symbol, never share " +
    "a batch") {
    // ('a','bc') and ('ab','c') both mint "abc": if batched together,
    // created-pair counts from the two origins would AGGREGATE and
    // could out-rank a later candidate invisibly — must stop after the
    // first
    val top = Array(("a", "bc", 12L), ("ab", "c", 11L), ("y", "z", 10L))
    val b1 = Bpe.selectBatch(top, fetchedAll = true, Set.empty)
    assert(b1 == Seq(("a", "bc", 12L)))
    // same collision against a PRIOR round's made symbol
    val top2 = Array(("y", "z", 12L), ("ab", "c", 11L))
    val b2 = Bpe.selectBatch(top2, fetchedAll = true, Set("abc"))
    assert(b2 == Seq(("y", "z", 12L)))
    // an aliasing FIRST member is legal alone but seals the batch
    val top3 = Array(("ab", "c", 12L), ("y", "z", 11L))
    val b3 = Bpe.selectBatch(top3, fetchedAll = true, Set("abc"))
    assert(b3 == Seq(("ab", "c", 12L)))
    // the end-of-word marker and single-code-point strings count as
    // pre-existing symbols too
    val top4 = Array(("y", "z", 12L), ("<", "/w>", 11L))
    assert(Bpe.selectBatch(top4, fetchedAll = true, Set.empty)
      == Seq(("y", "z", 12L)))
    // and a clean pair of non-interacting merges still batches
    val top5 = Array(("a", "b", 12L), ("c", "d", 11L))
    assert(Bpe.selectBatch(top5, fetchedAll = true, Set.empty).size == 2)
  }

  test("batched trainer == golden on a corpus whose merges MINT the " +
    "end-of-word marker string (real aliasing, end to end)") {
    // tokens of literal '<','/','w','>' characters drive merges
    // ('w','>')→'w>', ('/','w>')→'/w>', ('<','/w>')→'</w>' — the last
    // minting a string that ALIASES the end-of-word marker symbol, so
    // created-pair counts aggregate across origins; the batch seals at
    // that member and output must still equal sequential greedy
    val texts = Seq(
      Seq.fill(40)("</w>").mkString(" "),
      Seq.fill(25)("a</w>b").mkString(" "),
      Seq.fill(15)("ab").mkString(" "))
    val want = GoldenModels.bpeMerges(texts, numMerges = 12)
    assert(want.nonEmpty)
    val got = Bpe.trainMerges(texts.toDF("text"), "text",
      numMerges = 12)
    assert(got == want, s"got=$got\nwant=$want")
    // the aliasing merge really happened (the scenario is live)
    assert(got.exists { case (_, l, r, _) => l + r == Bpe.EndOfWord },
      s"corpus did not mint ${Bpe.EndOfWord}: $got")
  }

  test("reliable-checkpoint path: configured checkpoint dir switches " +
    "rounds to checkpoint(), output identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .filter("doc_id % 5 = 0")
      val texts = docs.select("text").collect().map(_.getString(0)).toSeq
      val want = GoldenModels.bpeMerges(texts, numMerges = 64)
      val got = Bpe.trainMerges(docs, "text", numMerges = 64)
      assert(got == want)
      // rounds really went through the RELIABLE path: checkpoint files
      // landed under the configured dir
      val walk = java.nio.file.Files.walk(dir)
      val files = try walk.count() finally walk.close()
      assert(files > 1, s"no checkpoint files under $dir")
      // the iterative dedup operator takes the same path
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
        .toDF("doc_a", "doc_b")
      val comp = graft.operators.Dedup.components(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L))
    } finally {
      org.apache.spark.graft.TestCheckpoint.clear(spark.sparkContext)
    }
  }

  test("incremental training is sub-linear per merge: delta volume " +
    "shrinks to a small fraction of the recount volume") {
    // Deterministic witness computed from the golden trace (the same
    // semantics the Spark trainer is pinned to): per round, the recount
    // form re-aggregates EVERY adjacent pair of EVERY word type, while
    // the incremental delta explodes only words containing the merged
    // pair (old + new pairs). No timing flakiness — this is the exact
    // data volume each plan shuffles into its aggregation.
    //
    // The testdata corpus has only ~31 distinct words (fixed lexicon
    // soup), so the type table can't show the effect; a realistic
    // seeded vocabulary (1500 types, Zipf-ish counts) is what a real
    // corpus' word-type table looks like.
    val rnd = new scala.util.Random(42)
    val types = (1 to 1500).map { rank =>
      val len = 3 + rnd.nextInt(8)
      val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      w -> math.max(1L, 3000L / rank)
    }.toMap // map: random duplicates collapse
    var words: Map[Vector[String], Long] = types.toSeq
      .map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    // golden trace over the same corpus, one "document" per word type
    // (counts folded in by repeating the word). 512 merges: the early
    // rounds of any BPE run merge ubiquitous character pairs and touch
    // most types — the incremental win compounds over a real
    // vocabulary-sized merge budget, which is exactly the regime the
    // recount form cannot reach
    val texts = types.toSeq.map { case (w, c) =>
      Seq.fill(c.toInt)(w).mkString(" ") }
    val merges = GoldenModels.bpeMerges(texts, numMerges = 512)
    assert(merges.length == 512)
    var recountVol = 0L
    var deltaVol = 0L
    for ((_, l, r, _) <- merges) {
      // keysIterator, not keys: mapping over the key SET would collapse
      // words of equal length into one element and undercount
      recountVol += words.keysIterator.map(s => (s.length - 1).toLong).sum
      def hasPair(s: Vector[String]) =
        s.indices.dropRight(1).exists(i => s(i) == l && s(i + 1) == r)
      def applied(s: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += s(i); i += 1 }
        }
        out.result()
      }
      deltaVol += words.keysIterator.filter(hasPair)
        .map(s => (s.length - 1).toLong + (applied(s).length - 1)).sum
      words = words.toSeq
        .map { case (s, c) => (if (hasPair(s)) applied(s) else s) -> c }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    }
    assert(deltaVol < recountVol / 5,
      s"delta volume $deltaVol not sub-linear vs recount $recountVol")
    // and the Spark incremental trainer produces the same merges on
    // this corpus, tying the witness to the implementation
    import spark.implicits._
    val got = Bpe.trainMerges(texts.toDF("text"), "text", numMerges = 16)
    assert(got == merges.take(16))
  }

  test("flat-loop encode expression == nested-HOF fold, incl. " +
    "stale-presence-set and no-op merges") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("doc_id % 5 = 0")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 24)
      .map(m => (m._2, m._3))
    // extra merges that never / conditionally apply exercise the skip
    // path and a pair whose left symbol was consumed earlier
    val withNoise = merges ++ Seq(("zz", "qq"), ("</w>", "</w>"))
    val w = docs.select(org.apache.spark.sql.functions
      .explode(graft.functions.TextFunctions.tokens(col("text")))
      .as("word")).distinct()
    val fast = w.select(col("word"),
      Bpe.encodedSymbols(col("word"), withNoise).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val slow = w.select(col("word"),
      Bpe.encodedSymbolsHof(col("word"), withNoise).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(fast.nonEmpty && fast == slow)
  }
}

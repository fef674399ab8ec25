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

  test("phrase: adjacency on TOKENS, not raw substrings — runs of " +
    "whitespace and case don't matter, word boundaries do") {
    val d = Seq(
      (1L, "the  window opens"), // double space: still adjacent tokens
      (2L, "the windowsill"), // substring only — NOT a token match
      (3L, "window the"), // both terms, wrong order
      (4L, "THE WINDOW"), // case-insensitive
      (5L, "the window the window") // two occurrences
    ).toDF("doc_id", "text")
    val out = Search.phrase(d, "the window", Seq("text")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L, 1L, 4L))
    assert(out.head.getAs[Int]("score") == 2)
  }

  test("slopPhrase: sloppy proximity — the adjusted-position span is " +
    "bounded by slop (transposed alignments included, Lucene " +
    "parity), slop=0 equals exact adjacency") {
    val d = Seq(
      (1L, "the window opens"),        // adjacent: matches any slop
      (2L, "the big window"),          // gap 1: needs slop >= 1
      (3L, "the very big window"),     // gap 2: needs slop >= 2
      (4L, "window the"),              // TRANSPOSED: span 2 (r16)
      (5L, "the big window the big window"), // two sloppy starts, 0 adjacent
      (6L, "quick brown the fox lazy window dog") // gap 2 mid-sentence
    ).toDF("doc_id", "text")
    def ids(slop: Int) = Search.slopPhrase(d, "the window", Seq("text"),
      slop).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids(0) == Set(1L))
    assert(ids(1) == Set(1L, 2L, 5L))
    // doc 4's swap costs exactly its span: the@1 adj 1, window@0
    // adj -1 — out-of-order placements price >= 2, so it appears at
    // slop 2 and never at slop 1 (ES's "fox quick" for "quick fox")
    assert(ids(2) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // score = count of head positions admitting a match
    val s2 = Search.slopPhrase(d, "the window", Seq("text"), 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("score")).toMap
    assert(s2(5L) == 2, s"two viable starts: $s2")
    assert(s2(1L) == 1)
  }

  test("slopPhrase: 3-term matches spend ONE shared budget — the span " +
    "of adjusted positions, not per-adjacent-pair gaps; a " +
    "transposition is priced by the same span") {
    val d = Seq(
      (1L, "a x b y c"),   // gaps 1+1 = 2: needs slop >= 2
      (2L, "a b x x c"),   // gaps 0+2 = 2: needs slop >= 2
      (3L, "a x x b y c"), // gaps 2+1 = 3: needs slop >= 3
      (4L, "a c b")        // b/c transposed: span 2 (r16)
    ).toDF("doc_id", "text")
    def ids(slop: Int) = Search.slopPhrase(d, "a b c", Seq("text"), slop)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids(1) == Set())
    // doc 4's swap: a@0 adj 0, b@2 adj 1, c@1 adj -1 — span 2
    assert(ids(2) == Set(1L, 2L, 4L))
    assert(ids(3) == Set(1L, 2L, 3L, 4L))
  }

  test("multiFieldFuzzy knobs: prefix_length exempts the prefix from " +
    "edits; max_expansions caps the expansion set deterministically") {
    val d = Seq(
      (1L, "part"),   // lev(pat)=1, starts with 'p'
      (2L, "data"),   // lev(pat)=2, wrong first char
      (3L, "fast"),   // lev(pat)=2, wrong first char
      (4L, "pit"),    // lev(pat)=1, starts with 'p'
      (5L, "past")    // lev(pat)=1, starts with 'p'
    ).toDF("doc_id", "text")
    def ids(pl: Int, me: Option[Int]) =
      Search.multiFieldFuzzy(d, "pat", Seq("text"), "2",
        prefixLength = pl, maxExpansions = me)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids(0, None) == Set(1L, 2L, 3L, 4L, 5L))
    // prefix gate drops data/fast
    assert(ids(1, None) == Set(1L, 4L, 5L))
    // expansion cap: candidates ordered (lev asc, tok asc) =
    // part(1), past(1), pit(1), data(2), fast(2) → top 2 = part, past
    assert(ids(0, Some(2)) == Set(1L, 5L))
    // cap composes with the prefix gate (same top-2 here)
    assert(ids(1, Some(2)) == Set(1L, 5L))
    // cap of 1 keeps only 'part' (lev 1, alphabetically first)
    assert(ids(0, Some(1)) == Set(1L))
    intercept[IllegalArgumentException] {
      Search.multiFieldFuzzy(d, "pat", Seq("text"), "2",
        maxExpansions = Some(0))
    }
    intercept[IllegalArgumentException] {
      Search.multiFieldFuzzy(d, "pat", Seq("text"), "2",
        prefixLength = -1)
    }
  }

  test("multiFieldAnd: every term must token-match somewhere; " +
    "substring-only hits don't count") {
    val d = Seq(
      (1L, "alpha beta", "x"),
      (2L, "alpha", "beta"), // terms split across fields: matches
      (3L, "alphabet beta", "x"), // 'alpha' only as substring: no
      (4L, "alpha alpha", "x") // missing 'beta': no
    ).toDF("doc_id", "text", "source")
    val out = Search.multiFieldAnd(d, "alpha beta", Seq("text", "source"))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(out == Seq(1L, 2L))
  }

  test("bm25Fields: single-field form equals bm25; best_fields takes " +
    "the max; a field the term misses contributes zero") {
    val d = Seq(
      (1L, "window seat", "src_a"),
      (2L, "window window view", "src_b"),
      (3L, "no hits", "window_src") // substring in source, not a token
    ).toDF("doc_id", "text", "source")
    val single = Search.bm25(d, "window", "text", "doc_id").collect()
    val multi1 = Search.bm25Fields(d, "window", Seq("text"), "doc_id")
      .collect()
    assert(single.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      multi1.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // source has no token match anywhere → sum and best agree with text
    val sum2 = Search.bm25Fields(d, "window", Seq("text", "source"),
      "doc_id").collect()
    val best2 = Search.bm25Fields(d, "window", Seq("text", "source"),
      "doc_id", bestFields = true).collect()
    assert(sum2.map(_.getDouble(1)).toSeq == best2.map(_.getDouble(1)).toSeq)
    // boosts scale a field's contribution
    val boosted = Search.bm25Fields(d, "window", Seq("text"), "doc_id",
      boosts = Map("text" -> 2.0)).collect()
    assert(boosted.map(_.getDouble(1)).zip(multi1.map(_.getDouble(1)))
      .forall { case (b, u) => math.abs(b - 2 * u) < 2e-4 })
  }

  test("minimum_should_match: k-of-n sits strictly between OR and AND") {
    val d = Seq(
      (1L, "alpha beta gamma"), // 3 of 3
      (2L, "alpha beta x"), // 2 of 3
      (3L, "alpha x y"), // 1 of 3
      (4L, "none here")
    ).toDF("doc_id", "text")
    def ids(k: Int) = Search.multiFieldMinShould(
        d, "alpha beta gamma", Seq("text"), minMatch = k)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids(1) == Set(1L, 2L, 3L))
    assert(ids(2) == Set(1L, 2L))
    assert(ids(3) == Set(1L))
    // above the term count clamps to AND; AND delegates here
    assert(ids(99) == Set(1L))
    val and = Search.multiFieldAnd(d, "alpha beta gamma", Seq("text"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(and == ids(3))
  }

  test("search_after cursor: strictly-after filter, no overlap, no gap") {
    val d = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) "window window" else "window"))
      .toDF("doc_id", "text")
    val p1 = Search.multiField(d, "window", Seq("text"), limit = 7)
      .collect()
    val last = p1.last
    val p2 = Search.multiField(d, "window", Seq("text"), limit = 7,
      after = Some((last.getAs[Int]("score").toDouble,
        last.getAs[Long]("doc_id")))).collect()
    val all = Search.multiField(d, "window", Seq("text"), limit = 14)
      .collect()
    assert((p1 ++ p2).map(_.getLong(0)).toSeq == all.map(_.getLong(0)).toSeq)
  }

  test("sql passthrough serves registered lake tables") {
    docs.createOrReplaceTempView("search_docs")
    val out = Search.sql(spark,
      "SELECT count(*) AS n FROM search_docs WHERE source LIKE 'src%'")
    assert(out.collect()(0).getAs[Long]("n") == 2L)
  }
}

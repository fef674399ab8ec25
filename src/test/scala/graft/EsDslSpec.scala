package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions.col

import graft.serving.{EsDsl, QueryString, Search}

/** The ES-DSL translator's semantics: BM25 scoring parity with the
  * /search rank=bm25 machinery, bool minimum_should_match defaulting,
  * null-safe must_not, sort, pattern clauses, hits+aggs pairing, and
  * the explicit-rejection contract for unsupported constructs. */
class EsDslSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def q(json: String) =
    EsDsl.search(docs, mapper.readTree(json))

  private def docs = Seq(
    (1L, "window batch run", "src3", 10L),
    (2L, "window only", "src1", 20L),
    (3L, "nothing here", null, 30L),
    (4L, "batch batch window", "src3", 40L)
  ).toDF("doc_id", "text", "source", "n")

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.8f, 0.6f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)),
    (5L, Array(0.0f, 0.0f, 0.0f)), // zero norm: never a hit
    (6L, null.asInstanceOf[Array[Float]])
  ).toDF("vec_id", "embedding")

  test("knn: exact cosine top-k, ES score transform, filter applies " +
    "before ranking, zero-norm and null vectors never match") {
    val hits = EsDsl.search(vecs, mapper.readTree(
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |  "k": 3, "num_candidates": 10}, "size": 3,
        | "_source": ["vec_id"]}""".stripMargin)).collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // (1 + cos)/2: cos(q, v1)=1 → 1.0; cos(q, v2)=0.8 → 0.9; v3 → 0.5
    assert(hits.map(_.getAs[Double]("_score")).toSeq ==
      Seq(1.0, 0.9, 0.5))
    val filtered = EsDsl.search(vecs, mapper.readTree(
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |  "k": 3, "num_candidates": 10,
        |  "filter": {"range": {"vec_id": {"gte": 3}}}},
        | "size": 3, "_source": ["vec_id"]}""".stripMargin)).collect()
    // pre-filtered: only 3 and 4 remain (5 zero-norm, 6 null)
    assert(filtered.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(filtered.map(_.getAs[Double]("_score")).toSeq == Seq(0.5, 0.0))
  }

  test("term-level fuzzy is UNANALYZED (one raw lowercased term): a " +
    "punctuated value does not split into per-word fuzzy matches") {
    import spark.implicits._
    val df = Seq((1L, "fooxbar here"), (2L, "foo alone"),
      (3L, "bar alone")).toDF("doc_id", "text")
    def ids(body: String) =
      EsDsl.search(df, mapper.readTree(body))
        .select("doc_id").as[Long].collect().toSet
    // 'foo-bar' stays one term: fooxbar is 1 edit away; plain 'foo'
    // (4 edits) and 'bar' (4 edits) are NOT within budget — analyzed
    // per-word fuzzy would have matched docs 2 and 3
    assert(ids("""{"query": {"fuzzy": {"text": {"value": "FOO-bar",
      "fuzziness": "1"}}}}""") == Set(1L))
    // pure punctuation is an empty fuzzy value — named 400
    val e = intercept[IllegalArgumentException] {
      ids("""{"query": {"fuzzy": {"text": {"value": "  "}}}}""")
    }
    assert(e.getMessage.contains("fuzzy"))
  }

  test("analyzer knob: \"standard\"/\"default\" accepted (it IS the " +
    "engine's chain), unknown analyzers reject by name") {
    import spark.implicits._
    val d = docs
    def ids(body: String) =
      EsDsl.search(d, mapper.readTree(body))
        .select("doc_id").as[Long].collect().toSet
    assert(ids("""{"query": {"match": {"text": {"query": "window",
      "analyzer": "standard"}}}}""") ==
      ids("""{"query": {"match": {"text": "window"}}}"""))
    assert(ids("""{"query": {"multi_match": {"query": "window",
      "fields": ["text"], "analyzer": "default"}}}""").nonEmpty)
    assert(ids("""{"query": {"match_phrase": {"text": {"query":
      "window batch", "analyzer": "standard"}}}}""") == Set(1L))
    // whitespace joined the accepted inventory in round 15: a
    // lowercase single word analyzes identically under it
    assert(ids("""{"query": {"multi_match": {"query": "window",
      "fields": ["text"], "analyzer": "whitespace"}}}""").nonEmpty)
    // french joined in round 16 ("window" is its own french stem),
    // german in round 17, spanish in round 18
    assert(ids("""{"query": {"match": {"text": {"query": "window",
      "analyzer": "french"}}}}""").nonEmpty)
    assert(ids("""{"query": {"match": {"text": {"query": "window",
      "analyzer": "german"}}}}""").nonEmpty)
    assert(ids("""{"query": {"match": {"text": {"query": "window",
      "analyzer": "spanish"}}}}""").nonEmpty)
    intercept[IllegalArgumentException] {
      ids("""{"query": {"match": {"text": {"query": "window",
        "analyzer": "italian"}}}}""")
    }
  }

  test("query-time english analyzer: stems ONLY the query — the " +
    "stems search the standard-analyzed document tokens (ES " +
    "semantics against standard-analyzed mappings)") {
    import spark.implicits._
    val df = Seq(
      (1L, "they run the tests"),       // literal token "run"
      (2L, "running tests all day"),    // only the inflection
      (3L, "a runner runs daily"),      // "runs" -> standard "runs"
      (4L, "nothing relevant here"))
      .toDF("doc_id", "text")
    def ids(body: String) =
      EsDsl.search(df, mapper.readTree(body))
        .select("doc_id").as[Long].collect().toSet
    def english(q: String) =
      ids(s"""{"query": {"match": {"text": {"query": "$q",
        "analyzer": "english"}}}}""")
    // query "running" -> stem "run": matches the LITERAL token "run"
    // only — doc 2's standard token stays "running" and doc 3's stays
    // "runs", so neither matches (exactly ES, where the query-time
    // stem is searched against the unstemmed index terms)
    assert(english("running") == Set(1L))
    assert(english("run") == Set(1L))
    // stopwords drop from the query ("the" matches nothing even
    // though docs contain it); remaining stems still match
    assert(english("the running") == Set(1L))
    // a query that is ALL stopwords analyzes to zero terms —
    // zero_terms_query default "none": no hits, not an error
    assert(english("the it was") == Set.empty)
    // possessive strips before stemming: "runner's" -> "runner"
    assert(english("runner's") == Set(3L))
    // multi_match accepts the knob too
    assert(ids("""{"query": {"multi_match": {"query": "running",
      "fields": ["text"], "analyzer": "english"}}}""") == Set(1L))
    // english + fuzziness composes in ES's order (analyze first,
    // fuzzy-expand the analyzed stems second): stem "runninng" stays
    // "runninng" (no -ing suffix), then 1 edit reaches doc 2's
    // literal "running"
    assert(ids("""{"query": {"match": {"text": {"query": "runninng",
      "analyzer": "english", "fuzziness": "1"}}}}""") == Set(2L))
    // BM25 scores ride the STANDARD statistics: english and standard
    // spellings of the same literal term score identically
    val std = EsDsl.search(df, mapper.readTree(
      """{"query": {"match": {"text": "run"}}}"""))
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    val eng = EsDsl.search(df, mapper.readTree(
      """{"query": {"match": {"text": {"query": "the running",
        "analyzer": "english"}}}}"""))
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(std == eng)
    // match_phrase + english: the query's stems keep POSITION GAPS
    // where stopwords stood and match exact offsets in the standard
    // token stream — "run the tests" analyzes to (run@0, test@2),
    // which fits doc 1's "run the tests" (test ≠ tests... so pick
    // stems that ARE literal tokens)
    val phraseDf = Seq(
      (1L, "they run the test daily"),  // run@1, test@3 — offset 2
      (2L, "run test now"),             // adjacent — offset 1
      (3L, "run a the test now"))       // run@0, test@3 — offset 3
      .toDF("doc_id", "text")
    def phrase(q: String) = EsDsl.search(phraseDf, mapper.readTree(
      s"""{"query": {"match_phrase": {"text": {"query": "$q",
        "analyzer": "english"}}}}"""))
      .select("doc_id").as[Long].collect().toSet
    // stems (run@0, test@2): exactly one token between them
    assert(phrase("running the tests") == Set(1L))
    // no interior stop -> plain adjacency of the stems
    assert(phrase("running tests") == Set(2L))
    // two interior stops -> gap of 3
    assert(phrase("running a the tests") == Set(3L))
    // all-stopword phrase analyzes to zero terms: no hits, no error
    assert(phrase("the it was") == Set.empty)
    // zero_terms_query (round 16): "all" turns the all-removed
    // analysis into match_all (constant 1.0 times the boost), on
    // match AND match_phrase; a term-ful query is unaffected; any
    // other value rejects by name
    def zt(kind: String, q: String, ztq: String) =
      EsDsl.search(phraseDf, mapper.readTree(
        s"""{"query": {"$kind": {"text": {"query": "$q",
          "analyzer": "english", "zero_terms_query": "$ztq",
          "boost": 2}}}, "size": 10}"""))
        .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(zt("match", "the it was", "all") ==
      Map(1L -> 2.0, 2L -> 2.0, 3L -> 2.0))
    assert(zt("match", "the it was", "none").isEmpty)
    assert(zt("match_phrase", "the it was", "all") ==
      Map(1L -> 2.0, 2L -> 2.0, 3L -> 2.0))
    assert(zt("match_phrase", "the it was", "none").isEmpty)
    assert(zt("match", "running", "all") ==
      zt("match", "running", "none"), "a term-ful query is unaffected")
    intercept[IllegalArgumentException] {
      zt("match", "the", "sometimes")
    }
    // english + slop (round 14): each gapped stem may drift ±slop
    // from its stop-gap offset, in order. Stems (run@0, test@2) with
    // slop 1: doc 1 sits at the exact offset (dev 0), doc 2's
    // adjacent "run test" pulls test one EARLY (dev 1 — the document
    // omits the stopword), doc 3's extra token pushes it one LATE
    // (dev 1) — all three match; at slop 0 only doc 1 does.
    def phraseSlop(q: String, slop: Int) =
      EsDsl.search(phraseDf, mapper.readTree(
        s"""{"query": {"match_phrase": {"text": {"query": "$q",
          "analyzer": "english", "slop": $slop}}}}"""))
        .select("doc_id").as[Long].collect().toSet
    assert(phraseSlop("running the tests", 1) == Set(1L, 2L, 3L))
    assert(phraseSlop("running the tests", 0) == Set(1L))
    // a DENSE english query (no interior stopword) rides the plain
    // ordered-proximity walk: "running tests" -> (run@0, test@1),
    // slop 1 admits one interleaved token (doc 1's gap of 2 needs
    // test <= run + 1 + slop — exactly on the cap), not doc 3's
    // gap of 3
    assert(phraseSlop("running tests", 1) == Set(1L, 2L))
    // round 15: >=3 gapped stems spend ONE SHARED slop budget — the
    // span of adjusted positions p_k - offset_k, Lucene's sloppy
    // matchLength — not ±slop per stem. Query "run the test batch"
    // -> stems (run@0, test@2, batch@3). Doc 2 pulls test one EARLY
    // (adj -1) and pushes batch one LATE (adj +1): the opposite
    // drifts SUM to span 2, so slop 1 must NOT match (the old
    // per-term window wrongly admitted it). Doc 3 drifts test and
    // batch one late TOGETHER (adj +1, +1): span 1, so slop 1
    // matches — the budget charges the span, not the drift count.
    // Round 16: TRANSPOSED alignments within the budget — full parity
    // with Lucene's SloppyPhraseMatcher (no in-order restriction).
    // Doc 4 swaps test before run: adj (run@1 -> 1, test@0 -> -2,
    // batch@2 -> -1) spans 3, so slop 3 admits it and slop 2 does not.
    val budgetDf = Seq(
      (1L, "run the test batch"),  // exact stop-gap offsets
      (2L, "run test x x batch"),  // test@1 (adj -1), batch@4 (adj +1)
      (3L, "run a a test batch"),  // test@3 (adj +1), batch@4 (adj +1)
      (4L, "test run batch"))      // transposed: span 3
      .toDF("doc_id", "text")
    def budget(slop: Int) = EsDsl.search(budgetDf, mapper.readTree(
      s"""{"query": {"match_phrase": {"text": {"query":
        "running the tests batched", "analyzer": "english",
        "slop": $slop}}}}"""))
      .select("doc_id").as[Long].collect().toSet
    assert(budget(0) == Set(1L))
    assert(budget(1) == Set(1L, 3L))
    assert(budget(2) == Set(1L, 2L, 3L))
    assert(budget(3) == Set(1L, 2L, 3L, 4L))
    // dense transposition, the canonical ES example shape: "quick
    // fox" matches "fox quick" at slop 2 (swap costs span 2), not at
    // slop 1 — out-of-order placements price >= 2 by the span
    // arithmetic alone, so low slops stay in-order with no case-split
    val transDf = Seq(
      (1L, "run test now"),   // in order, adjacent
      (2L, "test run now"),   // transposed: span 2
      (3L, "test x run"))     // transposed with a gap: span 3
      .toDF("doc_id", "text")
    def trans(slop: Int) = EsDsl.search(transDf, mapper.readTree(
      s"""{"query": {"match_phrase": {"text": {"query":
        "running tests", "analyzer": "english",
        "slop": $slop}}}}"""))
      .select("doc_id").as[Long].collect().toSet
    assert(trans(0) == Set(1L))
    assert(trans(1) == Set(1L))
    assert(trans(2) == Set(1L, 2L))
    assert(trans(3) == Set(1L, 2L, 3L))
    // repeating terms keep Lucene's distinct-positions rule: "test
    // test" needs TWO occurrences, at any slop
    val repDf = Seq(
      (1L, "test and test"),
      (2L, "one test only")).toDF("doc_id", "text")
    def rep(slop: Int) = EsDsl.search(repDf, mapper.readTree(
      s"""{"query": {"match_phrase": {"text": {"query": "test test",
        "slop": $slop}}}}"""))
      .select("doc_id").as[Long].collect().toSet
    assert(rep(1) == Set(1L))
    assert(rep(4) == Set(1L))
  }

  test("whitespace and keyword query analyzers: case-kept splits / " +
    "whole-value terms matched against the standard-analyzed index; " +
    "absent terms still count toward operator totals") {
    def ids(body: String): Set[Long] =
      q(body).select("doc_id").as[Long].collect().toSet
    // whitespace keeps case: 'BATCH' can never be a standard token,
    // so it matches nothing — but under operator=or 'window' carries
    assert(ids("""{"query": {"match": {"text": {"query":
      "window BATCH", "analyzer": "whitespace"}}}}""") ==
      Set(1L, 2L, 4L))
    // ... and under operator=and the absent term gates the clause
    // (ES: a term not in the index fails the conjunction)
    assert(ids("""{"query": {"match": {"text": {"query":
      "window BATCH", "analyzer": "whitespace",
      "operator": "and"}}}}""") == Set.empty)
    assert(ids("""{"query": {"match": {"text": {"query":
      "window batch", "analyzer": "whitespace",
      "operator": "and"}}}}""") == Set(1L, 4L))
    // when one term survives, the score IS the one-term standard
    // match score (the absent term contributes exactly 0.0)
    val ws = q("""{"query": {"match": {"text": {"query":
      "window BATCH", "analyzer": "whitespace"}}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    val std = q("""{"query": {"match": {"text": "window"}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(ws == std)
    // keyword: the WHOLE input is one term — a single word probes
    // the token stream; multi-word or case-varied inputs cannot
    // exist in a standard-analyzed index
    assert(ids("""{"query": {"match": {"text": {"query": "window",
      "analyzer": "keyword"}}}}""") == Set(1L, 2L, 4L))
    assert(ids("""{"query": {"match": {"text": {"query":
      "window batch", "analyzer": "keyword"}}}}""") == Set.empty)
    assert(ids("""{"query": {"match": {"text": {"query": "Window",
      "analyzer": "keyword"}}}}""") == Set.empty)
    // phrases: whitespace terms are dense positions (adjacency);
    // keyword's single term degenerates to a term probe
    assert(ids("""{"query": {"match_phrase": {"text": {"query":
      "window batch", "analyzer": "whitespace"}}}}""") == Set(1L))
    assert(ids("""{"query": {"match_phrase": {"text": {"query":
      "window Batch", "analyzer": "whitespace"}}}}""") == Set.empty)
    assert(ids("""{"query": {"match_phrase": {"text": {"query":
      "window", "analyzer": "keyword"}}}}""") == Set(1L, 2L, 4L))
    // multi-word keyword phrase: ONE term with an internal space —
    // never bridges token boundaries in the normalized stream
    assert(ids("""{"query": {"match_phrase": {"text": {"query":
      "window batch", "analyzer": "keyword"}}}}""") == Set.empty)
    // empty/whitespace-only input analyzes to zero terms: no hits,
    // not an error (zero_terms_query "none"), like the english chain
    assert(q("""{"query": {"match": {"text": {"query": "   ",
      "analyzer": "whitespace"}}}}""").count() == 0)
    // multi_match rides the same term rewrite across fields
    assert(ids("""{"query": {"multi_match": {"query": "window SRC3",
      "fields": ["text", "source"],
      "analyzer": "whitespace"}}}""") == Set(1L, 2L, 4L))
    assert(ids("""{"query": {"multi_match": {"query": "window src3",
      "fields": ["text", "source"],
      "analyzer": "whitespace"}}}""") == Set(1L, 2L, 4L))
  }

  test("analyzer inventory is a CONTRACT: match/match_phrase/" +
    "multi_match accept standard/default/english/french/german/" +
    "spanish/simple/stop/whitespace/keyword; every other name " +
    "rejects by name; prefix types and fuzziness combinations " +
    "reject; query_string/simple_query_string take the knob on " +
    "TERM atoms") {
    // accepted inventory — none of these may throw
    for (a <- Seq("standard", "default", "english", "french",
        "german", "spanish", "simple", "stop", "whitespace",
        "keyword")) {
      q(s"""{"query": {"match": {"text": {"query": "window",
        "analyzer": "$a"}}}}""").count()
      q(s"""{"query": {"match_phrase": {"text": {"query": "window",
        "analyzer": "$a"}}}}""").count()
      q(s"""{"query": {"multi_match": {"query": "window",
        "fields": ["text"], "analyzer": "$a"}}}""").count()
      q(s"""{"query": {"multi_match": {"query": "window",
        "fields": ["text", "source"], "type": "cross_fields",
        "analyzer": "$a"}}}""").count()
    }
    // every other name rejects BY NAME on the match family
    for (a <- Seq("italian", "snowball", "my_custom")) {
      val e = intercept[IllegalArgumentException] {
        q(s"""{"query": {"match": {"text": {"query": "window",
          "analyzer": "$a"}}}}""")
      }
      assert(e.getMessage.contains(a), e.getMessage)
    }
    // prefix types take no analyzer rewrite (the expansion
    // dictionary is standard-analyzed)
    for (a <- Seq("english", "french", "german", "spanish",
        "simple", "stop", "whitespace", "keyword");
         t <- Seq("phrase_prefix", "bool_prefix"))
      intercept[IllegalArgumentException] {
        q(s"""{"query": {"multi_match": {"query": "window",
          "fields": ["text"], "type": "$t", "analyzer": "$a"}}}""")
      }
    // fuzzy expansion runs on the standard/english chains only
    for (a <- Seq("whitespace", "keyword"))
      intercept[IllegalArgumentException] {
        q(s"""{"query": {"match": {"text": {"query": "windoq",
          "analyzer": "$a", "fuzziness": "1"}}}}""")
      }
    // clause kinds outside the match family keep the standard-only
    // knob (or no analyzer key at all) — whitespace must not leak in
    for (body <- Seq(
      """{"query": {"match_bool_prefix": {"text": {"query": "win",
        "analyzer": "whitespace"}}}}""",
      """{"query": {"match_phrase_prefix": {"text": {"query": "win",
        "analyzer": "whitespace"}}}}""",
      """{"query": {"combined_fields": {"query": "window",
        "fields": ["text"], "analyzer": "whitespace"}}}"""))
      intercept[IllegalArgumentException] { q(body) }
  }

  test("multi_match type=phrase: a match_phrase per field with a " +
    "BEST-FIELD combine (dis_max); ^boosts scale the per-field " +
    "phrase score; slop rides; boolean knobs reject by name") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha window batch", "nothing here"),
      (2L, "nothing here", "window batch again"),
      (3L, "window batch", "window batch"),   // both fields match
      (4L, "window then batch", "no"))        // neither (not adjacent)
      .toDF("doc_id", "title", "body")
    def run(bodyJson: String) =
      EsDsl.search(df, mapper.readTree(bodyJson))
        .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    val multi = run("""{"query": {"multi_match": {"query":
      "window batch", "type": "phrase",
      "fields": ["title", "body"]}}, "size": 10}""")
    assert(multi.keySet == Set(1L, 2L, 3L))
    // best-field: each doc's score equals the max of the single-field
    // match_phrase scores
    val title = run("""{"query": {"match_phrase":
      {"title": "window batch"}}, "size": 10}""")
    val body = run("""{"query": {"match_phrase":
      {"body": "window batch"}}, "size": 10}""")
    for (id <- multi.keySet)
      assert(multi(id) ==
        math.max(title.getOrElse(id, 0.0), body.getOrElse(id, 0.0)),
        s"doc $id best-field combine")
    // ^boost scales the per-field leg BEFORE the max
    val boosted = run("""{"query": {"multi_match": {"query":
      "window batch", "type": "phrase",
      "fields": ["title^3", "body"]}}, "size": 10}""")
    assert(boosted(1L) == 3.0 * title(1L))
    // slop lets the gap through on doc 4's title
    assert(run("""{"query": {"multi_match": {"query": "window batch",
      "type": "phrase", "slop": 1,
      "fields": ["title", "body"]}}, "size": 10}""").contains(4L))
    // slop outside type=phrase rejects by name
    intercept[IllegalArgumentException] {
      run("""{"query": {"multi_match": {"query": "window batch",
        "slop": 1, "fields": ["title"]}}, "size": 10}""")
    }
    // boolean knobs make no sense on a phrase — named 400
    intercept[IllegalArgumentException] {
      run("""{"query": {"multi_match": {"query": "window batch",
        "type": "phrase", "operator": "and",
        "fields": ["title", "body"]}}, "size": 10}""")
    }
    // english analysis rides per leg: stems + stop gaps
    val eng = run("""{"query": {"multi_match": {"query":
      "the windows batches", "type": "phrase",
      "analyzer": "english", "fields": ["title", "body"]}}, "size": 10}""")
    assert(eng.keySet == Set(1L, 2L, 3L))
  }

  test("multi_match type=phrase_prefix (best field) and " +
    "type=bool_prefix (per-field sums, own-gate-scored)") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha window batch", "window beta"),
      (2L, "nothing", "window batch online"),
      (3L, "window alone", "batch alone"))
      .toDF("doc_id", "title", "body")
    def run(bodyJson: String) =
      EsDsl.search(df, mapper.readTree(bodyJson))
        .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    // phrase_prefix "window ba*": title leg hits doc 1, body leg doc 2
    val pp = run("""{"query": {"multi_match": {"query": "window ba",
      "type": "phrase_prefix", "fields": ["title", "body"]}},
      "size": 10}""")
    assert(pp.keySet == Set(1L, 2L))
    // best-field: each equals its single-field count
    assert(pp(1L) == 1.0 && pp(2L) == 1.0)
    // bool_prefix sums across fields: doc 1 scores title(window=1,
    // ba*=1) + body(window=1) = 3; doc 3 scores 1 + 1 = 2
    val bp = run("""{"query": {"multi_match": {"query": "window ba",
      "type": "bool_prefix", "fields": ["title", "body"]}},
      "size": 10}""")
    assert(bp.keySet == Set(1L, 2L, 3L))
    assert(bp(1L) == 3.0, s"doc1 sums fields: $bp")
    assert(bp(3L) == 2.0, s"doc3 sums fields: $bp")
    // operator=and gates PER FIELD and a failing field scores 0:
    // doc 3 has window in title only, batch-prefix in body only —
    // neither field satisfies and, so it drops; doc 1's title
    // satisfies and (window + ba*) and contributes alone (body has
    // window but no ba* -> gated to 0)
    val bpAnd = run("""{"query": {"multi_match": {"query": "window ba",
      "type": "bool_prefix", "operator": "and",
      "fields": ["title", "body"]}}, "size": 10}""")
    assert(bpAnd.keySet == Set(1L, 2L))
    assert(bpAnd(1L) == 2.0, s"failing field must score 0: $bpAnd")
    // english on prefix types rejects by name
    intercept[IllegalArgumentException] {
      run("""{"query": {"multi_match": {"query": "window ba",
        "type": "phrase_prefix", "analyzer": "english",
        "fields": ["title"]}}, "size": 10}""")
    }
  }

  test("multi_match type=cross_fields: term-centric — operator gates " +
    "per TERM across fields; blended idf; dis_max + tie_breaker per " +
    "term") {
    import spark.implicits._
    val df = Seq(
      (1L, "ada", "lovelace"),   // first name one field, last the other
      (2L, "lovelace", "ada"),
      (3L, "ada", "byron"),      // only one of the two terms
      (4L, "grace", "hopper"),
      (5L, "ada", "ada king"))   // 'ada' in BOTH fields
      .toDF("doc_id", "first", "last")
    def run(bodyJson: String) =
      EsDsl.search(df, mapper.readTree(bodyJson))
        .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    // operator=and requires EVERY term in SOME field — the
    // first-name-in-one-column use case cross_fields exists for
    val and = run("""{"query": {"multi_match": {"query":
      "ada lovelace", "type": "cross_fields", "operator": "and",
      "fields": ["first", "last"]}}, "size": 10}""")
    assert(and.keySet == Set(1L, 2L))
    // default or: any term anywhere
    val or = run("""{"query": {"multi_match": {"query":
      "ada lovelace", "type": "cross_fields",
      "fields": ["first", "last"]}}, "size": 10}""")
    assert(or.keySet == Set(1L, 2L, 3L, 5L))
    // tie_breaker adds the non-best field's score: only doc 5 holds
    // 'ada' in both fields, so only its score moves
    val tb = run("""{"query": {"multi_match": {"query":
      "ada lovelace", "type": "cross_fields", "tie_breaker": 0.5,
      "fields": ["first", "last"]}}, "size": 10}""")
    assert(tb(5L) > or(5L), "tie_breaker must add the second field")
    for (id <- Seq(1L, 2L, 3L))
      assert(tb(id) == or(id), s"doc $id has no second-field score")
    // minimum_should_match counts TERMS (not fields)
    val msm = run("""{"query": {"multi_match": {"query":
      "ada lovelace byron", "type": "cross_fields",
      "minimum_should_match": "2",
      "fields": ["first", "last"]}}, "size": 10}""")
    assert(msm.keySet == Set(1L, 2L, 3L),
      "doc 3 holds ada+byron; docs 1/2 hold ada+lovelace")
    // named rejections: fuzziness on cross_fields, tie_breaker
    // outside cross_fields, out-of-range tie_breaker
    intercept[IllegalArgumentException] {
      run("""{"query": {"multi_match": {"query": "ada",
        "type": "cross_fields", "fuzziness": "1",
        "fields": ["first"]}}, "size": 10}""")
    }
    intercept[IllegalArgumentException] {
      run("""{"query": {"multi_match": {"query": "ada",
        "type": "best_fields", "tie_breaker": 0.3,
        "fields": ["first"]}}, "size": 10}""")
    }
    intercept[IllegalArgumentException] {
      run("""{"query": {"multi_match": {"query": "ada",
        "type": "cross_fields", "tie_breaker": 1.5,
        "fields": ["first"]}}, "size": 10}""")
    }
  }

  test("scripted_metric: sum-fold family computes; everything " +
    "outside the shape rejects by name (non-zero seed, list state, " +
    "non-sum reduce, unseeded accumulators)") {
    def sm(init: String, map: String, combine: String, reduce: String) =
      q(s"""{"query": {"match_all": {}}, "aggs": {"m":
        {"scripted_metric": {
          "init_script": "$init", "map_script": "$map",
          "combine_script": "$combine", "reduce_script": "$reduce",
          "params": {"w": 3}}}}, "size": 0}""")
    val v = sm("state.t = 0", "state.t += doc['n'].value * params.w",
      "return state",
      "double s = 0; for (a in states) { s += a.t } return s")
      .collect()(0).getDouble(0)
    assert(v == (10 + 20 + 30 + 40) * 3.0)
    // scalar combine + scalar fold; ternary in the map expression
    val c = sm("state.n = 0",
      "state.n += doc['n'].value > 15 ? 1 : 0", "return state.n",
      "double s = 0; for (a in states) { s += a } return s")
      .collect()(0).getDouble(0)
    assert(c == 3.0)
    def badSm(init: String, map: String, combine: String,
              reduce: String): Unit =
      intercept[IllegalArgumentException] { sm(init, map, combine, reduce) }
    badSm("state.t = 7", "state.t += 1", "return state",
      "double s = 0; for (a in states) { s += a.t } return s")
    badSm("state.t = []", "state.t += 1", "return state",
      "double s = 0; for (a in states) { s += a.t } return s")
    badSm("state.t = 0", "state.u += 1", "return state",
      "double s = 0; for (a in states) { s += a.t } return s")
    badSm("state.t = 0", "state.t += 1", "return state",
      "double s = 1; for (a in states) { s += a.t } return s")
    badSm("state.t = 0", "state.t += 1", "return state",
      "double s = 0; for (a in states) { s = Math.max(s, a.t) } return s")
    badSm("state.t = 0", "state.t += 1", "return state.u",
      "double s = 0; for (a in states) { s += a } return s")
  }

  test("scripted_metric min/max folds: scalar Math folds with " +
    "clamping literal seeds, array-collect state with a fold-to-" +
    "scalar combine; mismatched stage folds reject by name") {
    def sm(init: String, map: String, combine: String, reduce: String) =
      q(s"""{"query": {"match_all": {}}, "aggs": {"m":
        {"scripted_metric": {
          "init_script": "$init", "map_script": "$map",
          "combine_script": "$combine", "reduce_script": "$reduce",
          "params": {"w": 3}}}}, "size": 0}""")
    def one(init: String, map: String, combine: String,
            reduce: String): Double =
      sm(init, map, combine, reduce).collect()(0).getDouble(0)
    // scalar min with non-binding extreme seeds = plain min (n: 10..40)
    assert(one("state.m = Double.MAX_VALUE",
      "state.m = Math.min(state.m, doc['n'].value * params.w)",
      "return state",
      "double m = Double.MAX_VALUE; for (a in states) " +
        "{ m = Math.min(m, a.m) } return m") == 30.0)
    // scalar max via the scalar-combine form
    assert(one("state.m = -Double.MAX_VALUE",
      "state.m = Math.max(state.m, doc['n'].value)", "return state.m",
      "double m = -Double.MAX_VALUE; for (a in states) " +
        "{ m = Math.max(m, a) } return m") == 40.0)
    // min/max seeds CLAMP (idempotent folds — shard-independent for
    // any literal): a 25 seed floors the max at 25... and ceils the
    // min at 25
    assert(one("state.m = 25",
      "state.m = Math.max(state.m, doc['n'].value)", "return state.m",
      "double m = 25; for (a in states) { m = Math.max(m, a) } " +
        "return m") == 40.0)
    assert(one("state.m = 25",
      "state.m = Math.min(state.m, doc['n'].value)", "return state",
      "double m = 25; for (a in states) { m = Math.min(m, a.m) } " +
        "return m") == 10.0)
    assert(one("state.m = 5",
      "state.m = Math.min(state.m, doc['n'].value)", "return state",
      "double m = 5; for (a in states) { m = Math.min(m, a.m) } " +
        "return m") == 5.0)
    // array-collect state folded by the combine (sum and max)
    assert(one("state.vals = []", "state.vals.add(doc['n'].value)",
      "double x = 0; for (t in state.vals) { x += t } return x",
      "double s = 0; for (a in states) { s += a } return s") == 100.0)
    assert(one("state.vals = []", "state.vals.add(doc['n'].value)",
      "double x = -Double.MAX_VALUE; for (t in state.vals) " +
        "{ x = Math.max(x, t) } return x",
      "double m = -Double.MAX_VALUE; for (a in states) " +
        "{ m = Math.max(m, a) } return m") == 40.0)
    def badSm(init: String, map: String, combine: String,
              reduce: String): Unit =
      intercept[IllegalArgumentException] { sm(init, map, combine, reduce) }
    // min map + max reduce is shard-count-dependent — reject
    badSm("state.m = 0", "state.m = Math.min(state.m, doc['n'].value)",
      "return state",
      "double m = 0; for (a in states) { m = Math.max(m, a.m) } " +
        "return m")
    // min-of-per-shard-sums — reject
    badSm("state.t = 0", "state.t += doc['n'].value", "return state.t",
      "double m = 0; for (a in states) { m = Math.min(m, a) } return m")
    // a combine returning the raw LIST cannot reduce order-
    // independently here — reject by name
    badSm("state.vals = []", "state.vals.add(doc['n'].value)",
      "return state.vals",
      "double s = 0; for (a in states) { s += a } return s")
    // array combine fold must match the reduce fold
    badSm("state.vals = []", "state.vals.add(doc['n'].value)",
      "double x = 0; for (t in state.vals) { x += t } return x",
      "double m = 0; for (a in states) { m = Math.max(m, a) } return m")
    // Math fold must fold the accumulator with itself
    badSm("state.m = 0", "state.m = Math.min(state.x, doc['n'].value)",
      "return state",
      "double m = 0; for (a in states) { m = Math.min(m, a.m) } " +
        "return m")
    // non-literal init seeds reject
    badSm("state.m = doc['n'].value",
      "state.m = Math.min(state.m, doc['n'].value)", "return state",
      "double m = 0; for (a in states) { m = Math.min(m, a.m) } " +
        "return m")
  }

  test("standard analyzer: punctuated text matches its bare terms " +
    "(\"hello, world!\" matches query hello) across the match family") {
    import spark.implicits._
    val punct = Seq(
      (1L, "Hello, world!"),
      (2L, "don't stop"),
      (3L, "plain hello text"),
      (4L, "CUSTOMER#42 shipped")
    ).toDF("doc_id", "text")
    def run(body: String) =
      EsDsl.search(punct, mapper.readTree(body))
        .select("doc_id").as[Long].collect().toSeq.sorted
    // punctuation splits: "Hello," analyzes to hello
    assert(run("""{"query": {"match": {"text": "hello"}}}""")
      == Seq(1L, 3L))
    // the QUERY text analyzes too: "hello," finds the same docs
    assert(run("""{"query": {"match": {"text": "HELLO,"}}}""")
      == Seq(1L, 3L))
    // word-internal apostrophe stays one token
    assert(run("""{"query": {"match": {"text": "don't"}}}""") == Seq(2L))
    // '#' splits like ES's standard tokenizer: customer and 42
    assert(run("""{"query": {"match": {"text": "customer"}}}""") == Seq(4L))
    assert(run("""{"query": {"match": {"text": "42"}}}""") == Seq(4L))
    // phrase adjacency across punctuation: "hello, world!" is the
    // token sequence [hello, world]
    assert(run("""{"query": {"match_phrase": {"text": "hello world"}}}""")
      == Seq(1L))
  }

  test("fuzziness defaults to transpositions=true (Damerau): abcd " +
    "fuzzy-matches abdc at distance 1; explicit false stays Levenshtein") {
    import spark.implicits._
    val df = Seq((1L, "abdc xyz"), (2L, "abcd here")).toDF("doc_id", "text")
    def ids(body: String) =
      EsDsl.search(df, mapper.readTree(body))
        .select("doc_id").as[Long].collect().toSeq.sorted
    // Damerau: abcd -> abdc is ONE adjacent transposition
    assert(ids("""{"query": {"fuzzy": {"text": {"value": "abcd",
      "fuzziness": "1"}}}}""") == Seq(1L, 2L))
    // plain Levenshtein needs 2 edits for the swap
    assert(ids("""{"query": {"fuzzy": {"text": {"value": "abcd",
      "fuzziness": "1", "transpositions": false}}}}""") == Seq(2L))
    // match + fuzziness takes the same default
    assert(ids("""{"query": {"match": {"text": {"query": "abcd",
      "fuzziness": "1"}}}}""") == Seq(1L, 2L))
    assert(ids("""{"query": {"match": {"text": {"query": "abcd",
      "fuzziness": "1", "fuzzy_transpositions": false}}}}""") == Seq(2L))
    // ES's key naming is per-family: `transpositions` on match 400s
    intercept[IllegalArgumentException] {
      ids("""{"query": {"match": {"text": {"query": "abcd",
        "transpositions": false}}}}""")
    }
    // ...and `fuzzy_transpositions` on the term-level fuzzy 400s
    intercept[IllegalArgumentException] {
      ids("""{"query": {"fuzzy": {"text": {"value": "abcd",
        "fuzzy_transpositions": false}}}}""")
    }
    // non-boolean transpositions rejects by type
    intercept[IllegalArgumentException] {
      ids("""{"query": {"fuzzy": {"text": {"value": "abcd",
        "transpositions": "yes"}}}}""")
    }
  }

  test("knn knob validation: k/num_candidates bounds, zero-norm and " +
    "unknown-field rejection, size caps the k hits") {
    def knn(body: String) = EsDsl.search(vecs, mapper.readTree(body))
    intercept[IllegalArgumentException] { knn(
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |"k": 0, "num_candidates": 10}}""".stripMargin) }
    intercept[IllegalArgumentException] { knn( // num_candidates < k
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |"k": 5, "num_candidates": 4}}""".stripMargin) }
    intercept[IllegalArgumentException] { knn( // hybrid + rescore
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |"k": 2, "num_candidates": 5},
        |"query": {"match_all": {}},
        |"rescore": {"window_size": 5, "query":
        |  {"rescore_query": {"match_all": {}}}}}""".stripMargin) }
    intercept[IllegalArgumentException] { knn( // zero-norm query
      """{"knn": {"field": "embedding", "query_vector": [0, 0, 0],
        |"k": 2, "num_candidates": 5}}""".stripMargin) }
    intercept[IllegalArgumentException] { knn( // unknown field
      """{"knn": {"field": "nope", "query_vector": [1, 0, 0],
        |"k": 2, "num_candidates": 5}}""".stripMargin) }
    val one = knn(
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |"k": 3, "num_candidates": 10}, "size": 1}""".stripMargin)
      .collect()
    assert(one.length == 1 && one.head.getAs[Long]("vec_id") == 1L)
  }

  test("hybrid knn + query: the union hit set, scores sum on overlap, " +
    "each side alone keeps its own score") {
    val hits = EsDsl.search(vecs, mapper.readTree(
      """{"query": {"range": {"vec_id": {"gte": 2}}},
        | "knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |  "k": 2, "num_candidates": 5},
        | "size": 10, "_source": ["vec_id"]}""".stripMargin))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // query matches 2..6 (score 1.0); knn top-2 = {1: 1.0, 2: 0.9};
    // doc 2 overlaps (1.0 + 0.9), doc 1 is knn-only, 3..6 query-only
    assert(hits == Map(1L -> 1.0, 2L -> 1.9, 3L -> 1.0, 4L -> 1.0,
      5L -> 1.0, 6L -> 1.0), s"hybrid scores: $hits")
    // dimension mismatch rejected by name, hybrid path included
    intercept[IllegalArgumentException] {
      EsDsl.search(vecs, mapper.readTree(
        """{"query": {"match_all": {}},
          | "knn": {"field": "embedding", "query_vector": [1, 0],
          |  "k": 2, "num_candidates": 5}}""".stripMargin))
    }
  }

  test("clause-level boost multiplies the clause score everywhere; " +
    "result-changing clause knobs reject by name") {
    // term-level boost: constant 1.0 → boost
    val tb = q("""{"query": {"term": {"source": {"value": "src3",
      "boost": 3.5}}}, "size": 10}""")
      .collect().map(_.getAs[Double]("_score")).toSet
    assert(tb == Set(3.5), s"term boost: $tb")
    // match boost multiplies the (rounded) BM25 score
    val plain = q("""{"query": {"match": {"text": "window"}},
      "size": 10}""")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val boostd = q("""{"query": {"match": {"text": {"query": "window",
      "boost": 2}}}, "size": 10}""")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(boostd == plain.map { case (k, v) => k -> v * 2.0 },
      s"match boost: $boostd vs $plain")
    // bool boost multiplies the combined score
    val bb = q("""{"query": {"bool": {"must": [{"term":
      {"source": "src3"}}], "boost": 4}}, "size": 10}""")
      .collect().map(_.getAs[Double]("_score")).toSet
    assert(bb == Set(4.0), s"bool boost: $bb")
    // silently-dropped result-changing knobs now reject by name
    // (analyzer "standard" is accepted since round 11 — it IS the
    // engine's chain; english/french/german/spanish joined the
    // inventory in r13/r16/r17/r18, so the rejection pin moved to a
    // language the engine lacks)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match": {"text": {"query": "x",
        "analyzer": "italian"}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"range": {"n": {"gte": 1,
        "format": "epoch_millis"}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "random_score": {}}}}""")
    }
    // accuracy knobs exact evaluation subsumes are accepted
    val rw = q("""{"query": {"wildcard": {"text": {"value": "wind*",
      "rewrite": "constant_score", "_name": "w"}}}, "size": 10}""")
      .collect()
    assert(rw.nonEmpty)
  }

  test("rate divides by the bucket's ACTUAL calendar length (leap " +
    "Feb included), doc_count and value_count modes; " +
    "cumulative_cardinality credits each value once, at its first " +
    "bucket; both reject off their supported parents") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val evs = Seq(
      (1L, ts("2024-01-05T00:00:00Z"), "u1"),
      (2L, ts("2024-01-20T00:00:00Z"), "u2"),
      (3L, ts("2024-02-10T00:00:00Z"), "u1"), // u1 again — not new
      (4L, ts("2024-02-11T00:00:00Z"), "u3"),
      (5L, ts("2024-04-01T00:00:00Z"), "u4"),
      (6L, ts("2024-02-12T00:00:00Z"), null.asInstanceOf[String])
    ).toDF("id", "ts", "u")
    val rows = EsDsl.search(evs, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
        |  {"field": "ts", "calendar_interval": "month"},
        |  "aggs": {
        |    "per_day": {"rate": {"unit": "day"}},
        |    "users": {"cardinality": {"field": "u"}},
        |    "vc_per_day": {"rate": {"field": "u",
        |       "mode": "value_count", "unit": "day"}},
        |    "total_users": {"cumulative_cardinality":
        |       {"buckets_path": "users"}}}}},
        | "size": 0}""".stripMargin)).collect()
    // Jan/31d: 2 docs; Feb 2024/29d (leap): 3 docs, 2 with a user;
    // Mar: empty (omitted at the min_doc_count=1 default); Apr/30d: 1
    assert(rows.length == 3)
    val byKey = rows.map(r => r.getAs[Long]("key") -> r).toMap
    def monthMs(iso: String) =
      java.time.Instant.parse(iso).toEpochMilli
    val jan = byKey(monthMs("2024-01-01T00:00:00Z"))
    val feb = byKey(monthMs("2024-02-01T00:00:00Z"))
    val apr = byKey(monthMs("2024-04-01T00:00:00Z"))
    assert(jan.getAs[Double]("per_day") == 2.0 * 86400000.0 /
      (31L * 86400000L).toDouble)
    assert(feb.getAs[Double]("per_day") == 3.0 * 86400000.0 /
      (29L * 86400000L).toDouble)
    assert(feb.getAs[Double]("vc_per_day") == 2.0 * 86400000.0 /
      (29L * 86400000L).toDouble)
    assert(apr.getAs[Double]("per_day") == 1.0 * 86400000.0 /
      (30L * 86400000L).toDouble)
    assert(jan.getAs[Long]("total_users") == 2L)
    assert(feb.getAs[Long]("total_users") == 3L) // u1 NOT re-counted
    assert(apr.getAs[Long]("total_users") == 4L)
    // rate outside date_histogram rejects by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs": {"h": {"histogram":
        {"field": "n", "interval": 10},
        "aggs": {"r": {"rate": {"unit": "day"}}}}}, "size": 0}""")
    }
    // cumulative_cardinality's path must be a cardinality agg
    intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
          |  {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"s": {"sum": {"field": "id"}},
          |    "t": {"cumulative_cardinality":
          |      {"buckets_path": "s"}}}}}, "size": 0}""".stripMargin))
    }
    // month-unit rate on a month parent is the identity; a month
    // unit on a DAY parent has no fixed millis — rejects
    intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
          |  {"field": "ts", "calendar_interval": "day"},
          |  "aggs": {"r": {"rate": {"unit": "month"}}}}},
          | "size": 0}""".stripMargin))
    }
    // a unit LARGER than the bucket interval rejects by name (ES
    // does): a per-week rate of daily buckets would extrapolate ×7
    val tooBig = intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
          |  {"field": "ts", "calendar_interval": "day"},
          |  "aggs": {"r": {"rate": {"unit": "week"}}}}},
          | "size": 0}""".stripMargin))
    }
    assert(tooBig.getMessage.contains("larger than"))
    intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
          |  {"field": "ts", "fixed_interval": "1h"},
          |  "aggs": {"r": {"rate": {"unit": "day"}}}}},
          | "size": 0}""".stripMargin))
    }
    // an explicit mode with no field has nothing to count — ES
    // rejects; a silent doc_count fallback would answer a different
    // question
    val noField = intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
          |  {"field": "ts", "calendar_interval": "month"},
          |  "aggs": {"r": {"rate": {"mode": "value_count",
          |    "unit": "day"}}}}}, "size": 0}""".stripMargin))
    }
    assert(noField.getMessage.contains("field"))
    // an earlier bucket_selector drops Jan (doc_count 2): first-seen
    // credit moves to each value's first SURVIVING bucket — u1/u3
    // surface in Feb, u2 (Jan-only) never, u4 in Apr — ES's merge of
    // the remaining buckets' sketches
    val surv = EsDsl.search(evs, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs": {"m": {"date_histogram":
        |  {"field": "ts", "calendar_interval": "month"},
        |  "aggs": {
        |    "users": {"cardinality": {"field": "u"}},
        |    "keep": {"bucket_selector": {
        |      "buckets_path": {"c": "_count"},
        |      "script": "!(params.c == 2)"}},
        |    "total_users": {"cumulative_cardinality":
        |       {"buckets_path": "users"}}}}},
        | "size": 0}""".stripMargin)).collect()
    assert(surv.length == 2)
    val sByKey = surv.map(r => r.getAs[Long]("key") -> r).toMap
    assert(sByKey(monthMs("2024-02-01T00:00:00Z"))
      .getAs[Long]("total_users") == 2L)
    assert(sByKey(monthMs("2024-04-01T00:00:00Z"))
      .getAs[Long]("total_users") == 3L)
  }

  test("date_histogram time_zone buckets in the zone-local frame " +
    "(DST-aware for named zones); unknown agg knobs reject by name") {
    import java.sql.Timestamp
    // 2024-03-10 is the US spring-forward date: 04:30 UTC on Mar 10
    // is still Mar 9 in New York (23:30 EST), 11:00 UTC is Mar 10
    // 07:00 EDT — a UTC-truncating engine would put both in Mar 10
    val evs = Seq(
      (1L, Timestamp.from(java.time.Instant.parse("2024-03-10T04:30:00Z"))),
      (2L, Timestamp.from(java.time.Instant.parse("2024-03-10T11:00:00Z"))),
      (3L, Timestamp.from(java.time.Instant.parse("2024-03-11T02:00:00Z")))
    ).toDF("id", "ts")
    val buckets = EsDsl.search(evs, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs": {"d": {"date_histogram":
        |  {"field": "ts", "calendar_interval": "day",
        |   "time_zone": "America/New_York"}}}, "size": 0}"""
        .stripMargin))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def nyDayStartMs(iso: String): Long =
      java.time.LocalDate.parse(iso)
        .atStartOfDay(java.time.ZoneId.of("America/New_York"))
        .toInstant.toEpochMilli
    // docs 1 → NY Mar 9; 2 and 3 → NY Mar 10 (3 is 22:00 EDT Mar 10)
    assert(buckets == Map(nyDayStartMs("2024-03-09") -> 1L,
      nyDayStartMs("2024-03-10") -> 2L), s"tz buckets: $buckets")
    // result-changing knobs the engine does not model reject by name
    // (offset is SUPPORTED since round 10 — `format` still rewrites
    // keys this flat projection does not model)
    intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"d": {"date_histogram":
          |  {"field": "ts", "fixed_interval": "1d",
          |   "format": "yyyy-MM-dd"}}}, "size": 0}""".stripMargin))
    }
    // offset buckets on the shifted grid; calendar offset rejects
    val offs = EsDsl.search(evs, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs": {"d": {"date_histogram":
        |  {"field": "ts", "fixed_interval": "1d",
        |   "offset": "+6h"}}}, "size": 0}""".stripMargin)).collect()
    assert(offs.forall(r =>
      Math.floorMod(r.getLong(0), 86400000L) == 21600000L))
    intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs": {"d": {"date_histogram":
          |  {"field": "ts", "calendar_interval": "day",
          |   "offset": "+6h"}}}, "size": 0}""".stripMargin))
    }
    intercept[IllegalArgumentException] { // script metrics
      q("""{"query": {"match_all": {}}, "aggs":
        {"a": {"avg": {"script": {"source": "doc.n"}}}}, "size": 0}""")
    }
    // accuracy knobs exactness subsumes are accepted and ignored
    val t = q("""{"query": {"match_all": {}}, "aggs":
      {"src": {"terms": {"field": "source", "shard_size": 500,
       "execution_hint": "map"}}}, "size": 0}""").collect()
    assert(t.nonEmpty)
  }

  test("function_score min_score keeps REAL scores even in filter " +
    "context; in aggregation filters it rejects by name") {
    // the min_score PREDICATE reads the combined score, so the base
    // match's BM25 score must escape the filter-context suppression
    val hits = q("""{"query": {"bool": {"filter": [
      {"function_score": {"query": {"match": {"text": "window"}},
       "min_score": 0.1}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L, 4L),
      s"min_score in filter context mis-gated: $hits")
    // a high threshold still filters — proving the score is real,
    // not a constant
    val none = q("""{"query": {"bool": {"filter": [
      {"function_score": {"query": {"match": {"text": "window"}},
       "min_score": 99.0}}]}}, "size": 10}""").collect()
    assert(none.isEmpty)
    // aggregation filters compile after the score-join fold — a
    // min_score there cannot resolve and must 400, never mis-gate
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs": {"f": {"filter":
        {"function_score": {"query": {"match": {"text": "window"}},
         "min_score": 0.1}}}}, "size": 0}""")
    }
  }

  test("rrf: each retriever's window ranks independently and fuses " +
    "by reciprocal rank — score scales never mix") {
    val rows = EsDsl.search(vecs, mapper.readTree(
      """{"query": {"range": {"vec_id": {"gte": 2}}},
        | "knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |  "k": 2, "num_candidates": 5},
        | "rank": {"rrf": {"rank_window_size": 10,
        |  "rank_constant": 60}},
        | "size": 10, "_source": ["vec_id"]}""".stripMargin))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // query ranks (constant score, id order): 2→1, 3→2, 4→3, 5→4,
    // 6→5; knn top-2: 1→1, 2→2. Fused: doc 2 = 1/61 + 1/62 (both
    // lists), doc 1 = 1/61 (knn only), docs 3..6 query-only.
    val exp = Seq(
      2L -> (1.0 / 61 + 1.0 / 62), 1L -> 1.0 / 61, 3L -> 1.0 / 62,
      4L -> 1.0 / 63, 5L -> 1.0 / 64, 6L -> 1.0 / 65)
    assert(rows == exp, s"rrf: $rows")
    intercept[IllegalArgumentException] { // rrf needs both retrievers
      EsDsl.search(vecs, mapper.readTree(
        """{"query": {"match_all": {}},
          | "rank": {"rrf": {}}}""".stripMargin))
    }
  }

  test("knn IVF twin ranks identically to brute force when every cell " +
    "is probed") {
    val body = mapper.readTree(
      """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
        |  "k": 3, "num_candidates": 10}, "size": 3,
        | "_source": ["vec_id"]}""".stripMargin)
    val brute = EsDsl.search(vecs, body).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = EsDsl.searchKnnIvf(vecs, body,
        nCentroids = 4, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute, s"ivf=$ivf brute=$brute")
  }

  test("stats / extended_stats / percentiles flatten to one row; " +
    "variance is population like ES") {
    val st = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"extended_stats": {"field": "n"}}}, "size": 0}""")
      .collect().head
    assert(st.getAs[Long]("s_count") == 4L)
    assert(st.getAs[Long]("s_min") == 10L)
    assert(st.getAs[Long]("s_max") == 40L)
    assert(st.getAs[Double]("s_avg") == 25.0)
    assert(st.getAs[Long]("s_sum") == 100L)
    assert(st.getAs[Double]("s_sum_of_squares") == 3000.0)
    // population variance: E[x²] − E[x]² = 750 − 625 = 125
    assert(math.abs(st.getAs[Double]("s_variance") - 125.0) < 1e-9)
    assert(math.abs(st.getAs[Double]("s_std_deviation") -
      math.sqrt(125.0)) < 1e-9)
    val pc = q("""{"query": {"match_all": {}}, "aggs":
      {"p": {"percentiles": {"field": "n", "percents": [50]}}},
      "size": 0}""").collect().head
    assert(pc.getAs[Double]("p_p50") == 25.0)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"p": {"percentiles": {"field": "n", "percents": [101]}}},
        "size": 0}""")
    }
  }

  test("terms knobs: missing buckets nulls under a stand-in key, " +
    "min_doc_count prunes, order overrides the default") {
    // source: src3×2, src1×1, null×1
    val m = q("""{"query": {"match_all": {}}, "aggs":
      {"src": {"terms": {"field": "source", "missing": "none"}}},
      "size": 0}""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("src3" -> 2L, "src1" -> 1L, "none" -> 1L))
    val pruned = q("""{"query": {"match_all": {}}, "aggs":
      {"src": {"terms": {"field": "source", "min_doc_count": 2}}},
      "size": 0}""").collect().map(_.getString(0)).toSeq
    assert(pruned == Seq("src3"))
    val byKey = q("""{"query": {"match_all": {}}, "aggs":
      {"src": {"terms": {"field": "source",
        "order": {"_key": "asc"}}}}, "size": 0}""")
      .collect().map(_.getString(0)).toSeq
    assert(byKey == Seq("src1", "src3"))
    // order by a sub-metric
    val byMetric = q("""{"query": {"match_all": {}}, "aggs":
      {"src": {"terms": {"field": "source",
        "order": {"top_n": "desc"}},
        "aggs": {"top_n": {"max": {"field": "n"}}}}}, "size": 0}""")
      .collect().map(_.getString(0)).toSeq
    assert(byMetric == Seq("src3", "src1")) // max n: 40 vs 20
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"src": {"terms": {"field": "source", "min_doc_count": 0}}},
        "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"src": {"terms": {"field": "source",
          "order": {"nope": "asc"}}}}, "size": 0}""")
    }
  }

  test("range and filters aggs: every enumerated bucket in request " +
    "order, empty ones at doc_count 0, custom keys honored") {
    val rg = q("""{"query": {"match_all": {}}, "aggs":
      {"r": {"range": {"field": "n", "ranges": [
        {"to": 15}, {"from": 15, "to": 35, "key": "mid"},
        {"from": 1000}]},
        "aggs": {"lo": {"min": {"field": "n"}}}}}, "size": 0}""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // request order preserved; the open-ended empty bucket is PRESENT
    assert(rg == Seq(("*-15.0", 1L), ("mid", 2L), ("1000.0-*", 0L)))
    val fl = q("""{"query": {"match_all": {}}, "aggs":
      {"f": {"filters": {"filters": {
        "windows": {"match": {"text": "window"}},
        "big": {"range": {"n": {"gte": 30}}},
        "nobody": {"term": {"source": "zzz"}}}},
        "aggs": {"hi": {"max": {"field": "n"}}}}}, "size": 0}""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Any]("hi"))).toSeq
    assert(fl.map(t3 => (t3._1, t3._2)) ==
      Seq(("windows", 3L), ("big", 2L), ("nobody", 0L)))
    assert(fl.head._3 == 40L) // max n over the window docs
    assert(fl.last._3 == null) // empty bucket: null metric, like ES
  }

  test("highlight wraps analyzed query terms in tags, original case " +
    "kept, custom tags honored, negated terms skipped") {
    val hl = q("""{"query": {"match": {"text": "window run"}},
      "highlight": {"fields": {"text": {}}}, "size": 10}""")
      .collect().map(r => r.getLong(0) ->
        r.getAs[String]("highlight_text")).toMap
    assert(hl(1L) == "<em>window</em> batch <em>run</em>")
    assert(hl(2L) == "<em>window</em> only")
    val tags = q("""{"query": {"bool": {
      "must": [{"match": {"text": "batch"}}],
      "must_not": [{"match": {"text": "run"}}]}},
      "highlight": {"fields": {"text": {}},
        "pre_tags": ["["], "post_tags": ["]"]}, "size": 10}""")
      .collect().map(r => r.getLong(0) ->
        r.getAs[String]("highlight_text")).toMap
    // doc 4 matches; 'run' is negated so it never highlights
    assert(tags(4L) == "[batch] [batch] window")
    // a pure keyword query has nothing analyzed to highlight → 400
    intercept[IllegalArgumentException] {
      q("""{"query": {"term": {"source": "src3"}},
        "highlight": {"fields": {"text": {}}}}""")
    }
  }

  test("collapse keeps each field value's best hit; search_after " +
    "resumes strictly after with no overlap or gap") {
    // collapse on source under (n desc): src3 keeps doc 4 (n=40),
    // src1 keeps doc 2, the null group keeps doc 3
    val cl = q("""{"query": {"match_all": {}},
      "collapse": {"field": "source"},
      "sort": [{"n": {"order": "desc"}}], "size": 10}""")
      .collect().map(_.getLong(0)).toSeq
    assert(cl == Seq(4L, 3L, 2L))
    // collapse inner_hits: each kept hit carries its group's top-2
    // docs under the effective sort (winner included); the null
    // group collapses and carries its own inner list
    val ihRows = q("""{"query": {"match_all": {}},
      "collapse": {"field": "source",
        "inner_hits": {"name": "grp", "size": 2}},
      "sort": [{"n": {"order": "desc"}}], "size": 10}""")
      .selectExpr("doc_id",
        "transform(inner_hits_grp, x -> x.doc_id)")
      .as[(Long, Seq[Long])].collect().toMap
    assert(ihRows == Map(4L -> Seq(4L, 1L), 3L -> Seq(3L),
      2L -> Seq(2L)), ihRows)
    // knob hygiene: unknown collapse/inner_hits keys reject by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "collapse": {"field": "source", "max_concurrent_group_searches":
          4}, "size": 1}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "collapse": {"field": "source", "inner_hits": {"sort":
          [{"n": "asc"}]}}, "size": 1}""")
    }
    // size 0 would leave a NULL list whose key vanishes from the
    // JSON hit — rejected, never silently dropped
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "collapse": {"field": "source", "inner_hits": {"size": 0}},
        "size": 1}""")
    }
    // walk ALL docs by (n desc, doc_id) in pages of 2 via search_after
    val p1 = q("""{"query": {"match_all": {}},
      "sort": [{"n": {"order": "desc"}}], "size": 2}""")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(p1.map(_._1).toSeq == Seq(4L, 3L))
    val (lastId, lastN) = (p1.last._1, p1.last._2)
    val p2 = q(s"""{"query": {"match_all": {}},
      "sort": [{"n": {"order": "desc"}}],
      "search_after": [$lastN, $lastId], "size": 2}""")
      .collect().map(_.getLong(0)).toSeq
    assert(p2 == Seq(2L, 1L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "search_after": [1],
        "sort": [{"n": "asc"}], "from": 5}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "sort": [{"n": "asc"}], "search_after": [1, 2, 3]}""")
    }
  }

  test("composite agg: source-ordered pages, after resumes strictly " +
    "after, desc sources honored; missing agg buckets the nulls") {
    def page(extra: String) = q(s"""{"query": {"match_all": {}},
      "aggs": {"pg": {"composite": {"size": 2, "sources": [
        {"src": {"terms": {"field": "source"}}}]$extra}}},
      "size": 0}""").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    // buckets: src1×1, src3×2 (null source excluded)
    assert(page("") == Seq(("src1", 1L), ("src3", 2L)))
    assert(page(""", "after": {"src": "src1"}""") == Seq(("src3", 2L)))
    assert(page(""", "after": {"src": "src3"}""") == Seq())
    // desc source order flips both the page order and the resume
    val desc = q("""{"query": {"match_all": {}},
      "aggs": {"pg": {"composite": {"size": 1, "sources": [
        {"src": {"terms": {"field": "source", "order": "desc"}}}],
        "after": {"src": "src3"}}}}, "size": 0}""")
      .collect().map(_.getString(0)).toSeq
    assert(desc == Seq("src1"))
    // two sources page lexicographically
    val two = q("""{"query": {"match_all": {}},
      "aggs": {"pg": {"composite": {"size": 10, "sources": [
        {"src": {"terms": {"field": "source"}}},
        {"len": {"terms": {"field": "n"}}}]}}}, "size": 0}""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(two == Seq(("src1", 20L), ("src3", 10L), ("src3", 40L)))
    // missing agg: the null-source doc, metrics over just that bucket
    val miss = q("""{"query": {"match_all": {}},
      "aggs": {"no_src": {"missing": {"field": "source"},
        "aggs": {"hi": {"max": {"field": "n"}}}}}, "size": 0}""")
      .collect().head
    assert(miss.getAs[Long]("doc_count") == 1L)
    assert(miss.getAs[Long]("hi") == 30L)
  }

  test("date_range agg: ISO bounds, from inclusive / to exclusive, " +
    "custom keys, empty buckets present") {
    val ts = Seq(
      (1L, "2024-03-01 00:00:00"), (2L, "2024-03-10 12:00:00"),
      (3L, "2024-03-20 00:00:00")).toDF("id", "t")
      .select(col("id"), col("t").cast("timestamp").as("t"))
    val dr = EsDsl.search(ts, mapper.readTree(
      """{"query": {"match_all": {}},
        "aggs": {"w": {"date_range": {"field": "t", "ranges": [
          {"to": "2024-03-10"},
          {"from": "2024-03-10", "to": "2024-03-20", "key": "mid"},
          {"from": "2024-06-01"}]}}}, "size": 0}"""))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // boundary doc 3 (exactly 03-20) is EXCLUDED from mid (to is
    // exclusive); the far-future bucket is present and empty
    assert(dr == Seq(("*-2024-03-10", 1L), ("mid", 1L),
      ("2024-06-01-*", 0L)))
  }

  test("top_hits: per-bucket top documents with explicit sort; " +
    "buckets follow terms ordering, ranks are per bucket") {
    val th = q("""{"query": {"match_all": {}},
      "aggs": {"by_src": {"terms": {"field": "source", "size": 2},
        "aggs": {"best": {"top_hits": {"size": 1,
          "sort": [{"n": {"order": "desc"}}],
          "_source": ["doc_id", "n"]}}}}}, "size": 0}""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Int]("hit_rank"), r.getAs[Long]("doc_id"))).toSeq
    // src3 (2 docs) first, its top-n doc is 4 (n=40); then src1's doc 2
    assert(th == Seq(("src3", 2L, 1, 4L), ("src1", 1L, 1, 2L)))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "aggs": {"by_src": {"terms": {"field": "source"},
          "aggs": {"best": {"top_hits": {"size": 1}}}}}, "size": 0}""")
    }
  }

  test("match ranks and scores EXACTLY like /search rank=bm25 — the " +
    "ES-parity contract") {
    val dsl = q("""{"query": {"match": {"text": "window batch"}},
      "size": 10}""").select(col("doc_id"), col("_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ref = Search.bm25Fields(docs.select("doc_id", "text"),
        "window batch", Seq("text"), "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(dsl == ref, s"DSL $dsl != /search bm25 $ref")
    // the qualitative order survives: tf saturation keeps the 2x-batch
    // doc on top, the one-term doc last
    assert(dsl.map(_._1) == Seq(4L, 1L, 2L))
    val and = q("""{"query": {"match": {"text":
      {"query": "window batch", "operator": "and"}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSeq
    assert(and == Seq(4L, 1L)) // doc 2 lacks "batch"
  }

  test("bool combines BM25 must scores with should scores per ES's " +
    "sum rule; filter scores 0") {
    val b = q("""{"query": {"bool": {
      "must": [{"match": {"text": "window"}}],
      "filter": [{"range": {"n": {"lte": 20}}}],
      "should": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect()
    assert(b.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val bm25 = Search.bm25Fields(docs.select("doc_id", "text"),
        "window", Seq("text"), "doc_id", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1: bm25(window) + 1.0 (should matched); doc 2: bm25 alone
    assert(b.map(_.getDouble(4)).toSeq ==
      Seq(bm25(1L) + 1.0, bm25(2L)))
  }

  test("bool minimum_should_match: defaults to 1 without must/filter, " +
    "0 with; explicit specs use the full grammar") {
    val shouldOnly = q("""{"query": {"bool": {
      "should": [{"term": {"source": "src3"}},
                 {"term": {"source": "src1"}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(shouldOnly == Set(1L, 2L, 4L)) // doc 3 matches neither
    val withMust = q("""{"query": {"bool": {
      "must": [{"match": {"text": "nothing"}}],
      "should": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(withMust == Set(3L)) // should optional when must present
    val pct = q("""{"query": {"bool": {
      "should": [{"term": {"source": "src3"}},
                 {"term": {"source": "src1"}}],
      "minimum_should_match": "100%"}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(pct.isEmpty) // no doc has both sources
  }

  test("must_not is null-safe (ES: null fields PASS a must_not term)") {
    val r = q("""{"query": {"bool": {
      "must_not": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(r == Set(2L, 3L)) // doc 3's null source must pass
  }

  test("terms / range / exists filter; explicit sort gets the id " +
    "tiebreak appended") {
    val r = q("""{"query": {"terms": {"source": ["src1", "src3"]}},
      "size": 10, "sort": [{"n": {"order": "desc"}}]}""")
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(4L, 2L, 1L))
    val ex = q("""{"query": {"exists": {"field": "source"}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(ex == Set(1L, 2L, 4L))
  }

  test("wildcard / prefix / regexp: whole-value LIKE and anchored " +
    "RLIKE; Lucene-only regexp operators reject") {
    // wildcard matches the ENTIRE value — "*batch*" needs the leading *
    val w = q("""{"query": {"wildcard": {"text": "*batch*"}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(w == Set(1L, 4L))
    val wq = q("""{"query": {"wildcard": {"text": "window ?nly"}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(wq == Set(2L)) // ? = exactly one char
    val ci = q("""{"query": {"wildcard": {"text":
      {"value": "WINDOW*", "case_insensitive": true}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(ci == Set(1L, 2L))
    val p = q("""{"query": {"prefix": {"text": {"value": "window"}}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(p == Set(1L, 2L))
    // regexp is fully anchored: "batch.*" must match from the START
    val re = q("""{"query": {"regexp": {"text": "batch.*"}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(re == Set(4L)) // doc 1 has batch mid-string: no match
    val re2 = q("""{"query": {"regexp": {"text": ".*(batch|only).*"}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(re2 == Set(1L, 2L, 4L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"regexp": {"text": "a~b"}}, "size": 10}""")
    }
    // malformed syntax 400s at the wire like ES, never a plan-time
    // internal error (round 16)
    intercept[IllegalArgumentException] {
      q("""{"query": {"regexp": {"text": "(unclosed"}}, "size": 10}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"regexp": {"text": "a&b"}}, "size": 10}""")
    }
  }

  test("multi_match BM25: boosts and best_fields match the bm25Fields " +
    "scorer; fuzziness keeps the fuzzy-occurrence family") {
    val mm = q("""{"query": {"multi_match": {"query": "window src3",
      "fields": ["text", "source^3"], "type": "best_fields"}},
      "size": 10}""").select(col("doc_id"), col("_score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ref = Search.bm25Fields(docs.select("doc_id", "text", "source"),
        "window src3", Seq("text", "source"), "doc_id", 10,
        bestFields = true, boosts = Map("source" -> 3.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mm == ref, s"DSL $mm != bm25Fields $ref")
    val fz = q("""{"query": {"match": {"text":
      {"query": "windoq", "fuzziness": "1"}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(fz == Set(1L, 2L, 4L))
  }

  test("from + size page deterministically: two pages == one larger " +
    "request; the window caps at ES's max_result_window") {
    val all = q("""{"query": {"match_all": {}}, "size": 4}""")
      .collect().map(_.getLong(0)).toSeq
    val p1 = q("""{"query": {"match_all": {}}, "size": 2}""")
      .collect().map(_.getLong(0)).toSeq
    val p2 = q("""{"query": {"match_all": {}}, "from": 2, "size": 2}""")
      .collect().map(_.getLong(0)).toSeq
    assert(p1 ++ p2 == all, s"$p1 ++ $p2 != $all")
    // a deep-but-legal page (ES serves up to from+size = 10,000)
    assert(q("""{"query": {"match_all": {}}, "from": 9995, "size": 5}""")
      .collect().isEmpty)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "from": 9999, "size": 5}""")
    }
  }

  test("match_phrase (adjacency), ids, and constant_score translate") {
    val ph = q("""{"query": {"match_phrase": {"text": "window batch"}},
      "size": 10}""").collect().map(_.getLong(0)).toSeq
    assert(ph == Seq(1L)) // only doc 1 has the tokens ADJACENT in order
    val ids = q("""{"query": {"ids": {"values": [2, 4]}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 4L))
    val cs = q("""{"query": {"constant_score": {"filter":
      {"term": {"source": "src3"}}, "boost": 2.5}}, "size": 10}""")
      .collect()
    assert(cs.map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(cs.forall(_.getDouble(4) == 2.5))
  }

  test("match_phrase slop: sloppy proximity through the DSL — " +
    "slop widens the match set, transposed alignments cost their " +
    "adjusted span (Lucene parity), negative rejects") {
    // adjacency misses doc 4 ("batch batch window": gap 1, in order)
    val p0 = q("""{"query": {"match_phrase": {"text": "batch window"}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(p0 == Set(4L))
    val p1 = q("""{"query": {"match_phrase": {"text":
      {"query": "window run", "slop": 1}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(p1 == Set(1L)) // "window batch run": gap 1
    val p0run = q("""{"query": {"match_phrase": {"text":
      {"query": "window run", "slop": 0}}}, "size": 10}""").collect()
    assert(p0run.isEmpty) // not adjacent anywhere
    // transposed alignment (round 16 — Lucene's SloppyPhraseMatcher):
    // the reversed "run window" reaches doc 1's "window batch run"
    // once the adjusted-position span fits — run@2 adj 2, window@0
    // adj -1, span 3 — so slop 3 matches and slop 2 does not
    assert(q("""{"query": {"match_phrase": {"text":
      {"query": "run window", "slop": 2}}}, "size": 10}""")
      .collect().isEmpty)
    assert(q("""{"query": {"match_phrase": {"text":
      {"query": "run window", "slop": 3}}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    val e = intercept[IllegalArgumentException] {
      q("""{"query": {"match_phrase": {"text":
        {"query": "a b", "slop": -1}}}}""")
    }
    assert(e.getMessage.contains("slop"))
  }

  test("match fuzziness knobs: prefix_length gates candidates, " +
    "max_expansions caps the expansion set, invalid values reject") {
    val d = Seq((1L, "part"), (2L, "data"), (3L, "fast"),
      (4L, "pit"), (5L, "past")).toDF("doc_id", "text")
    def ids(extra: String) = EsDsl.search(d, mapper.readTree(
      s"""{"query": {"match": {"text": {"query": "pat",
         "fuzziness": "2"$extra}}}, "size": 10}"""))
      .collect().map(_.getLong(0)).toSet
    assert(ids("") == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(""", "prefix_length": 1""") == Set(1L, 4L, 5L))
    // candidates (lev asc, tok asc): part, past, pit, data, fast
    assert(ids(""", "max_expansions": 2""") == Set(1L, 5L))
    intercept[IllegalArgumentException] {
      ids(""", "max_expansions": 0""")
    }
    intercept[IllegalArgumentException] {
      ids(""", "prefix_length": -2""")
    }
  }

  test("simple_query_string: operators, grouping, negation, prefix, " +
    "fuzzy, phrase slop — and ES's never-throw leniency") {
    def ids(query: String, extra: String = "") =
      q(s"""{"query": {"simple_query_string": {"query": "$query",
           "fields": ["text"]$extra}}, "size": 10}""")
        .collect().map(_.getLong(0)).toSet
    // docs: 1 "window batch run" / 2 "window only" / 3 "nothing here"
    //       4 "batch batch window"
    assert(ids("window batch") == Set(1L, 2L, 4L)) // default OR
    assert(ids("window batch",
      """, "default_operator": "and"""") == Set(1L, 4L))
    assert(ids("window + batch") == Set(1L, 4L)) // explicit AND
    assert(ids("window + -batch") == Set(2L)) // negation
    assert(ids("only | here") == Set(2L, 3L))
    // AND binds tighter than OR: nothing | (batch AND run) -> 1, 3
    assert(ids("nothing | batch + run") == Set(1L, 3L))
    assert(ids("(nothing | batch) + run") == Set(1L)) // grouping
    assert(ids("wind*") == Set(1L, 2L, 4L)) // prefix
    assert(ids("windoq~1") == Set(1L, 2L, 4L)) // fuzzy
    assert(ids("\\\"batch window\\\"") == Set(4L)) // phrase, adjacency
    assert(ids("\\\"window run\\\"~1") == Set(1L)) // phrase slop
    // leniency: unclosed quote runs to end; stray ) and dangling +
    // are dropped — never a 400 for syntax
    assert(ids("\\\"window only") == Set(2L))
    assert(ids("window ) + ") == Set(1L, 2L, 4L))
    // no usable atoms IS a request error
    intercept[IllegalArgumentException] { ids("   ") }
    // scoring: matching clauses sum (doc 4: batch×2 + window×1)
    val sc = q("""{"query": {"simple_query_string": {"query":
      "window batch", "fields": ["text"]}}, "size": 10}""")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(sc(4L) == 3.0 && sc(1L) == 2.0 && sc(2L) == 1.0, s"$sc")
  }

  /** The engine's phrase-BM25 score over THIS spec's 4-doc corpus
    * (n = 4, Σdl = 10 → avgdl = 2.5) — op-for-op
    * Ctx.phraseBm25Score: idf sums one term-idf per phrase position,
    * tf = the phrase count, one floor-rounding. */
  private def phb(termDfs: Seq[Long], pf: Int, dl: Int): Double = {
    val idf = termDfs.map(d =>
      math.log(1.0 + (4L - d + 0.5) / (d + 0.5))).sum
    val raw = idf * ((pf * 2.2) / (pf + 1.2 * (0.25 + 0.75 * dl / 2.5)))
    math.floor(raw * 10000.0 + 0.5) / 10000.0
  }

  test("dis_max: best matching subquery + tie_breaker share of the " +
    "rest; boosting demotes without excluding") {
    val dm = q("""{"query": {"dis_max": {"queries": [
      {"term": {"source": "src3"}},
      {"match_phrase": {"text": "batch batch"}}],
      "tie_breaker": 0.5}}, "size": 10}""")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // doc 1: only the term matches (1.0); doc 4: both — best subquery
    // plus tie_breaker × the other; the phrase is BM25-scored
    // (df(batch)=2, pf=1, dl=3), combined exactly as the engine does
    val ph4 = phb(Seq(2L, 2L), 1, 3)
    val best = math.max(1.0, ph4)
    val exp4 = best + 0.5 * ((1.0 + ph4) - best)
    assert(dm == Map(1L -> 1.0, 4L -> exp4), s"dis_max scores: $dm")
    val bo = q("""{"query": {"boosting": {
      "positive": {"match_phrase": {"text": "window"}},
      "negative": {"term": {"source": "src1"}},
      "negative_boost": 0.5}}, "size": 10}""")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // all three window docs stay IN; the src1 one is halved
    // (df(window)=3; dl 3/2/3)
    assert(bo == Map(1L -> phb(Seq(3L), 1, 3),
        2L -> phb(Seq(3L), 1, 2) * 0.5, 4L -> phb(Seq(3L), 1, 3)),
      s"boosting scores: $bo")
    intercept[IllegalArgumentException] {
      q("""{"query": {"dis_max": {"queries": [], "tie_breaker": 0.5}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"boosting": {"positive": {"match_all": {}},
        "negative": {"match_all": {}}, "negative_boost": 1.5}}}""")
    }
  }

  test("match_phrase_prefix: leading terms exact, final slot by " +
    "prefix; max_expansions caps the dictionary expansion") {
    val p1 = q("""{"query": {"match_phrase_prefix": {"text":
      "window ba"}}, "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(p1 == Set(1L)) // "window batch run"
    val p2 = q("""{"query": {"match_phrase_prefix": {"text":
      "batch win"}}, "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(p2 == Set(4L)) // "batch batch window"
    // single-term: a bare prefix-token count
    val p3 = q("""{"query": {"match_phrase_prefix": {"text": "wi"}},
      "size": 10}""").collect().map(_.getLong(0)).toSet
    assert(p3 == Set(1L, 2L, 4L))
    // max_expansions: dictionary expansion capped token-asc — with a
    // frame whose 'a'-prefix vocabulary is {aa, ab, ac}, capping at 2
    // drops 'ac' matches
    val d = Seq((1L, "x aa"), (2L, "x ab"), (3L, "x ac"))
      .toDF("doc_id", "text")
    def pp(extra: String) = EsDsl.search(d, mapper.readTree(
      s"""{"query": {"match_phrase_prefix": {"text":
         {"query": "x a"$extra}}}, "size": 10}"""))
      .collect().map(_.getLong(0)).toSet
    assert(pp("") == Set(1L, 2L, 3L))
    assert(pp(""", "max_expansions": 2""") == Set(1L, 2L))
  }

  test("term-level fuzzy: one unanalyzed term, AUTO budget; " +
    "multi-word values reject") {
    val fz = q("""{"query": {"fuzzy": {"text": "windoq"}}, "size": 10}""")
      .collect().map(_.getLong(0)).toSet
    assert(fz == Set(1L, 2L, 4L)) // 'windoq' ~2 edits from 'window'
    val fz0 = q("""{"query": {"fuzzy": {"text": {"value": "windoq",
      "fuzziness": "0"}}}, "size": 10}""").collect()
    assert(fz0.isEmpty)
    val e = intercept[IllegalArgumentException] {
      q("""{"query": {"fuzzy": {"text": "two words"}}}""")
    }
    assert(e.getMessage.contains("term-level"))
  }

  test("aggregations: terms buckets with metric sub-aggs follow ES " +
    "ordering; global metrics return one row; unsupported aggs reject") {
    val b = q("""{"query": {"match_all": {}},
      "aggs": {"by_source": {"terms": {"field": "source", "size": 10},
        "aggs": {"avg_n": {"avg": {"field": "n"}},
                 "total_n": {"sum": {"field": "n"}},
                 "docs": {"value_count": {"field": "doc_id"}}}}},
      "size": 0}""").collect()
    // buckets: src3 ×2 then src1 ×1 — ES terms buckets SKIP documents
    // missing the field, so doc 3's null source forms no bucket
    assert(b.map(_.getString(0)).toSeq == Seq("src3", "src1"))
    val src3 = b.find(_.getString(0) == "src3").get
    assert(src3.getLong(1) == 2L)          // doc_count
    assert(src3.getDouble(2) == 25.0)      // avg of 10, 40
    assert(src3.getLong(3) == 50L)         // sum
    assert(src3.getLong(4) == 2L)          // value_count
    val g = q("""{"query": {"term": {"source": "src3"}},
      "aggs": {"n_docs": {"value_count": {"field": "doc_id"}}}}""")
      .collect()
    assert(g.length == 1 && g.head.getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "aggs": {"h": {"date_histogram": {"field": "n"}}}}""").collect()
    }
    // histogram: fixed-interval buckets keyed by lower bound, in order
    val h = q("""{"query": {"match_all": {}},
      "aggs": {"by_n": {"histogram": {"field": "n", "interval": 25}}}}""")
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toSeq
    assert(h == Seq(0.0 -> 2L, 25.0 -> 2L)) // n=10,20 | 30,40
  }

  test("searchParts returns hits AND buckets from one body — ES's " +
    "response always carries both; ids-under-aggs binds the marker") {
    val (hits, aggs) = EsDsl.searchParts(docs, mapper.readTree(
      """{"query": {"match_all": {}}, "size": 2,
        "aggs": {"by_source": {"terms": {"field": "source"}}}}"""))
    assert(hits.collect().length == 2)
    assert(aggs.get.collect().map(_.getString(0)).toSeq ==
      Seq("src3", "src1"))
    // an ids query under aggs must filter, not 500 (round-8 regression:
    // the marker column was only bound on the hits path)
    val (h2, a2) = EsDsl.searchParts(docs, mapper.readTree(
      """{"query": {"ids": {"values": [1, 4]}}, "size": 10,
        "aggs": {"by_source": {"terms": {"field": "source"}}}}"""))
    assert(h2.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(a2.get.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toSeq == Seq("src3" -> 2L))
  }

  test("nested terms-in-terms buckets: top parents, top children per " +
    "parent, child metrics; parent-level metrics beside them reject") {
    val n = q("""{"query": {"match_all": {}},
      "aggs": {"by_source": {"terms": {"field": "source", "size": 2},
        "aggs": {"by_text": {"terms": {"field": "text", "size": 1},
          "aggs": {"max_n": {"max": {"field": "n"}}}}}}},
      "size": 0}""").collect()
    // top-2 parents: src3 (2 docs), then src1 (1; null source is no
    // bucket) — each with its single top child bucket (texts unique, so
    // doc_count 1, key asc wins)
    assert(n.length == 2, n.mkString("; "))
    val bySrc = n.map(r => r.getString(0) -> r).toMap
    assert(bySrc.contains("src3") && bySrc.contains("src1"))
    val s3 = bySrc("src3")
    assert(s3.getAs[Long]("parent_doc_count") == 2L)
    assert(s3.getAs[String]("text") == "batch batch window") // key asc
    assert(s3.getAs[Long]("doc_count") == 1L)
    assert(s3.getAs[Long]("max_n") == 40L)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "aggs": {"a": {"terms": {"field": "source"},
          "aggs": {"b": {"terms": {"field": "text"}},
                   "m": {"avg": {"field": "n"}}}}}}""")
    }
  }

  test("date_histogram: calendar_interval truncates to the calendar " +
    "unit with epoch-millis bucket keys; malformed intervals reject") {
    val ts = Seq(
      (1L, "2024-01-05 10:00:00"), (2L, "2024-01-28 23:59:59"),
      (3L, "2024-02-01 00:00:00"), (4L, "2024-04-30 12:00:00")
    ).toDF("id", "s").select(col("id"),
      org.apache.spark.sql.functions.to_timestamp(col("s")).as("ts"))
    val m = EsDsl.search(ts, mapper.readTree(
      """{"query": {"match_all": {}},
        "aggs": {"per": {"date_histogram":
          {"field": "ts", "calendar_interval": "month"}}}}"""))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // bucket keys = month starts in epoch millis (session zone is UTC)
    assert(m == Seq(
      1704067200000L -> 2L,   // 2024-01-01
      1706745600000L -> 1L,   // 2024-02-01
      1711929600000L -> 1L))  // 2024-04-01
    val qtr = EsDsl.search(ts, mapper.readTree(
      """{"query": {"match_all": {}},
        "aggs": {"per": {"date_histogram":
          {"field": "ts", "calendar_interval": "quarter"}}}}"""))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(qtr == Seq(1704067200000L -> 3L, 1711929600000L -> 1L))
    for (iv <- Seq("\"fixed_interval\": \"1month\"",
        "\"fixed_interval\": \"xx\"", "\"fixed_interval\": \"0d\"",
        "\"calendar_interval\": \"fortnight\""))
      intercept[IllegalArgumentException] {
        q(s"""{"query": {"match_all": {}},
          "aggs": {"t": {"date_histogram": {"field": "n", $iv}}}}""")
      }
    // fixed_interval buckets by FLOOR division: a pre-1970 timestamp
    // lands in the bucket BELOW zero, not the truncated-toward-zero one
    val neg = Seq((1L, "1969-12-31 22:00:00"), (2L, "1970-01-01 01:00:00"))
      .toDF("id", "s").select(col("id"),
        org.apache.spark.sql.functions.to_timestamp(col("s")).as("ts"))
    val nb = EsDsl.search(neg, mapper.readTree(
      """{"query": {"match_all": {}},
        "aggs": {"per": {"date_histogram":
          {"field": "ts", "fixed_interval": "1d"}}}}"""))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(nb == Seq(-86400000L -> 1L, 0L -> 1L))
  }

  test("_source filtering: false returns hit identity, an array a " +
    "column subset, an object includes/excludes wildcards; unknown " +
    "fields reject") {
    val idOnly = q("""{"query": {"term": {"source": "src3"}},
      "_source": false, "size": 10}""")
    assert(idOnly.columns.toSeq == Seq("doc_id", "_score"))
    assert(idOnly.collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    val subset = q("""{"query": {"match_all": {}},
      "_source": ["source", "n"], "size": 10}""")
    assert(subset.columns.toSeq == Seq("source", "n", "_score"))
    val obj = q("""{"query": {"match_all": {}},
      "_source": {"includes": ["*o*"], "excludes": ["doc*"]},
      "size": 10}""")
    assert(obj.columns.toSeq == Seq("source", "_score"))
    val excOnly = q("""{"query": {"match_all": {}},
      "_source": {"excludes": ["text"]}, "size": 10}""")
    assert(excOnly.columns.toSeq == Seq("doc_id", "source", "n", "_score"))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "_source": ["nope"]}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "_source": {"include": ["x"]}}""")
    }
  }

  test("unsupported constructs are rejected by name, never mistranslated") {
    for (body <- Seq(
        """{"query": {"percolate": {"field": "q"}}}""",
        """{"query": {"span_near": {"clauses": []}}}""",
        """{"size": 10}""",
        """{"query": {"bool": {"should": []}, "extra": 1}}""",
        """{"query": {"range": {"n": {}}}}"""))
      intercept[IllegalArgumentException] { q(body).collect() }
    // size above the result window is refused, not silently clamped
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "size": 100000}""").collect()
    }
  }

  test("pipeline aggs: cumulative_sum and derivative window over the " +
    "bucket table in key order; bucket_sort sorts and truncates last") {
    // histogram on n, interval 10: buckets 10/20/30/40, one doc each
    val p = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 10},
       "aggs": {
         "cum": {"cumulative_sum": {"buckets_path": "_count"}},
         "d": {"derivative": {"buckets_path": "cum"}}}}},
      "size": 0}""").collect()
    assert(p.map(_.getAs[Double]("key")).toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    assert(p.map(_.getAs[Long]("cum")).toSeq == Seq(1L, 2L, 3L, 4L))
    // first bucket's derivative is null (ES omits the key there);
    // the chained path references the earlier pipeline's output
    assert(p.head.isNullAt(p.head.fieldIndex("d")))
    assert(p.tail.map(_.getAs[Long]("d")).toSeq == Seq(1L, 1L, 1L))
    // bucket_sort: by a metric desc, size-truncated, applied last
    val bs = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 20},
       "aggs": {
         "top": {"bucket_sort": {"sort": [{"_count": {"order": "desc"}}],
                 "size": 1}}}}},
      "size": 0}""").collect()
    // interval 20: bucket 0 (n=10) count 1, bucket 20 (n=20,30) count 2,
    // bucket 40 count 1 -> top-1 by count is bucket 20
    assert(bs.length == 1 && bs.head.getAs[Double]("key") == 20.0 &&
      bs.head.getAs[Long]("doc_count") == 2L)
    // a dangling buckets_path and a bad sort key are the caller's error
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"cum": {"cumulative_sum": {"buckets_path": "nope"}}}}},
        "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"t": {"bucket_sort": {"sort": [{"nope": {}}]}}}}},
        "size": 0}""")
    }
  }

  test("serial_diff: x_t - x_{t-lag} over the bucket table; lag " +
    "validates; insert_zeros gap_policy rejects by name") {
    // interval 10 -> buckets 10/20/30/40 one doc each; cum 1,2,3,4;
    // serial_diff(cum, lag 2) -> null, null, 2, 2
    val p = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 10},
       "aggs": {
         "cum": {"cumulative_sum": {"buckets_path": "_count"}},
         "sd": {"serial_diff": {"buckets_path": "cum", "lag": 2}}}}},
      "size": 0}""").collect()
    assert(p.take(2).forall(_.isNullAt(p.head.fieldIndex("sd"))))
    assert(p.drop(2).map(_.getAs[Long]("sd")).toSeq == Seq(2L, 2L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"sd": {"serial_diff":
           {"buckets_path": "_count", "lag": 0}}}}}, "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"sd": {"serial_diff": {"buckets_path": "_count",
           "gap_policy": "insert_zeros"}}}}}, "size": 0}""")
    }
  }

  test("normalize: every ES method over the bucket table; unknown " +
    "method rejects by name") {
    // interval 20 -> buckets 0 (n=10), 20 (n=20,30), 40 (n=40):
    // counts 1, 2, 1
    def norm(method: String) = q(s"""{"query": {"match_all": {}},
      "aggs": {"h": {"histogram": {"field": "n", "interval": 20},
       "aggs": {"v": {"normalize":
         {"buckets_path": "_count", "method": "$method"}}}}},
      "size": 0}""").collect().map(_.getAs[Double]("v")).toSeq
    assert(norm("percent_of_sum") == Seq(0.25, 0.5, 0.25))
    assert(norm("rescale_0_1") == Seq(0.0, 1.0, 0.0))
    assert(norm("rescale_0_100") == Seq(0.0, 100.0, 0.0))
    // mean: (x - mean) / (max - min), mean = 4/3
    val m = norm("mean")
    assert(math.abs(m(1) - (2.0 - 4.0 / 3)) < 1e-12 &&
      math.abs(m(0) - (1.0 - 4.0 / 3)) < 1e-12)
    // z-score: sd_pop of (1,2,1) = sqrt(2/9); z(2) = (2/3)/sd = sqrt(2)
    val z = norm("z-score")
    assert(math.abs(z(1) - math.sqrt(2)) < 1e-12)
    val soft = norm("softmax")
    val denom = 2 * math.exp(1) + math.exp(2)
    assert(math.abs(soft(1) - math.exp(2) / denom) < 1e-12 &&
      math.abs(soft.sum - 1.0) < 1e-12)
    intercept[IllegalArgumentException] { norm("minmax") }
  }

  test("bucket_script compiles the Painless arithmetic subset; " +
    "bucket_selector filters before bucket_sort; bad scripts 400") {
    // interval 20 -> counts 1, 2, 1
    val p = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 20},
       "aggs": {
         "a": {"bucket_script": {
           "buckets_path": {"c": "_count"},
           "script": "(params.c + 1) * 2 - params.c % 2"}},
         "b": {"bucket_script": {
           "buckets_path": {"c": "_count", "a": "a"},
           "script": "params['a'] / params.c"}}}}},
      "size": 0}""").collect()
    // a = (c+1)*2 - c%2 -> 3, 6, 3; b = a/c -> 3, 3, 3
    assert(p.map(_.getAs[Double]("a")).toSeq == Seq(3.0, 6.0, 3.0))
    assert(p.map(_.getAs[Double]("b")).toSeq == Seq(3.0, 3.0, 3.0))
    // selector keeps count>=2 buckets, then bucket_sort pages the rest
    val sel = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 10},
       "aggs": {
         "keep": {"bucket_selector": {
           "buckets_path": {"k": "_key"},
           "script": "params.k >= 20 && !(params.k > 30)"}},
         "top": {"bucket_sort": {"sort": [{"_key": {"order": "desc"}}],
                 "size": 1}}}}},
      "size": 0}""").collect()
    assert(sel.length == 1 && sel.head.getAs[Double]("key") == 30.0)
    def badScript(script: String) = intercept[IllegalArgumentException] {
      q(s"""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"s": {"bucket_script": {
           "buckets_path": {"c": "_count"}, "script": "$script"}}}}},
        "size": 0}""")
    }
    // unknown param, unknown Math member, comment, trailing
    // garbage: all reject at parse time, by name. Ternary and the
    // supported Math.* members compile (round 11).
    badScript("params.c + params.missing")
    badScript("Math.cbrt(params.c)")
    badScript("Math.max(params.c)") // wrong arity rejects
    badScript("params.c > 1 ? 1")   // missing ':' rejects
    badScript("params.c // 2")
    badScript("params.c + 1 extra")
    def scripted(script: String) =
      q(s"""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"s": {"bucket_script": {
           "buckets_path": {"c": "_count"}, "script": "$script"}}}}},
        "size": 0}""").orderBy(col("key"))
        .select("s").collect().map(_.getDouble(0)).toSeq
    // docs: n = 10, 20, 30, 40 -> buckets 10..40, one doc each
    assert(scripted("params.c > 1 ? 1 : 0") == Seq(0.0, 0.0, 0.0, 0.0))
    assert(scripted("Math.max(params.c, 2)") == Seq(2.0, 2.0, 2.0, 2.0))
    assert(scripted("Math.log(Math.exp(params.c))") ==
      Seq(1.0, 1.0, 1.0, 1.0))
    // right-associative ternary chains like Java
    assert(scripted("params.c == 1 ? 5 : params.c == 2 ? 6 : 7") ==
      Seq(5.0, 5.0, 5.0, 5.0))
    // a STRING buckets_path (the single-path form) is the map form's
    // caller error here
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"s": {"bucket_script": {
           "buckets_path": "_count", "script": "params.c"}}}}},
        "size": 0}""")
    }
  }

  test("stats_bucket / extended_stats_bucket / percentiles_bucket " +
    "siblings reduce the bucket table; percents validate") {
    // interval 20 -> counts 1, 2, 1
    val p = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 20}},
       "es": {"extended_stats_bucket": {"buckets_path": "h>_count"}},
       "pb": {"percentiles_bucket": {"buckets_path": "h>_count",
         "percents": [50]}}},
      "size": 0}""").collect()
    val r = p.head
    assert(r.getAs[Long]("es_count") == 3L &&
      r.getAs[Long]("es_min") == 1L && r.getAs[Long]("es_max") == 2L &&
      r.getAs[Long]("es_sum") == 4L &&
      r.getAs[Double]("es_sum_of_squares") == 6.0)
    assert(math.abs(r.getAs[Double]("es_avg") - 4.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("es_variance") - 2.0 / 9) < 1e-12)
    assert(math.abs(r.getAs[Double]("es_std_deviation") -
      math.sqrt(2.0 / 9)) < 1e-12)
    assert(r.getAs[Double]("pb_p50") == 1.0)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 20}},
         "pb": {"percentiles_bucket": {"buckets_path": "h>_count",
           "percents": [150]}}}, "size": 0}""").collect()
    }
  }

  test("rare_terms: long-tail buckets at most max_doc_count, " +
    "rare-first order; bounds validate") {
    // source: src3 x2, src1 x1, null (skipped)
    val r = q("""{"query": {"match_all": {}}, "aggs":
      {"rare": {"rare_terms": {"field": "source"},
       "aggs": {"mx": {"max": {"field": "n"}}}}},
      "size": 0}""").collect()
    assert(r.length == 1 && r.head.getAs[String]("source") == "src1" &&
      r.head.getAs[Long]("doc_count") == 1L &&
      r.head.getAs[Long]("mx") == 20L)
    val r2 = q("""{"query": {"match_all": {}}, "aggs":
      {"rare": {"rare_terms": {"field": "source",
        "max_doc_count": 2}}}, "size": 0}""").collect()
    assert(r2.map(_.getAs[String]("source")).toSeq == Seq("src1", "src3"))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"rare": {"rare_terms": {"field": "source",
          "max_doc_count": 0}}}, "size": 0}""")
    }
  }

  test("top_metrics: top-1 row's metrics by sort, null sort rows " +
    "never win; knobs validate") {
    val r = q("""{"query": {"match_all": {}}, "aggs":
      {"best": {"top_metrics": {"metrics": [{"field": "doc_id"}],
        "sort": [{"n": {"order": "desc"}}]}}},
      "size": 0}""").collect()
    assert(r.head.getAs[Long]("best_sort") == 40L &&
      r.head.getAs[Long]("best_doc_id") == 4L)
    val asc = q("""{"query": {"match_all": {}}, "aggs":
      {"best": {"top_metrics": {"metrics": [{"field": "doc_id"}],
        "sort": {"n": "asc"}}}}, "size": 0}""").collect()
    assert(asc.head.getAs[Long]("best_sort") == 10L &&
      asc.head.getAs[Long]("best_doc_id") == 1L)
    // size != 1, duplicate metric fields: reject by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"b": {"top_metrics": {"metrics": [{"field": "doc_id"}],
          "sort": {"n": "asc"}, "size": 2}}}, "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"b": {"top_metrics": {"metrics": [{"field": "n"},
          {"field": "n"}], "sort": {"n": "asc"}}}}, "size": 0}""")
    }
  }

  test("boxplot and median_absolute_deviation: exact quartiles, IQR " +
    "whiskers, exact MAD") {
    // n = 10,20,30,40: q1 17.5, q2 25, q3 32.5; whisker bounds
    // -5 .. 55 -> lower 10, upper 40
    val b = q("""{"query": {"match_all": {}}, "aggs":
      {"nn": {"boxplot": {"field": "n"}}}, "size": 0}""").collect().head
    assert(b.getAs[Long]("nn_min") == 10L && b.getAs[Long]("nn_max") == 40L)
    assert(b.getAs[Double]("nn_q1") == 17.5 &&
      b.getAs[Double]("nn_q2") == 25.0 &&
      b.getAs[Double]("nn_q3") == 32.5)
    assert(b.getAs[Long]("nn_lower") == 10L &&
      b.getAs[Long]("nn_upper") == 40L)
    // deviations from median 25: 15,5,5,15 -> MAD 10
    val m = q("""{"query": {"match_all": {}}, "aggs":
      {"sp": {"median_absolute_deviation": {"field": "n"}}},
      "size": 0}""").collect().head
    assert(m.getAs[Double]("sp") == 10.0)
  }

  test("string_stats: length stats and character entropy; " +
    "matrix_stats: per-field stats and pairwise covariance") {
    val s = q("""{"query": {"match_all": {}}, "aggs":
      {"t": {"string_stats": {"field": "text"}}},
      "size": 0}""").collect().head
    assert(s.getAs[Long]("t_count") == 4L &&
      s.getAs[Int]("t_min_length") == 11 &&
      s.getAs[Int]("t_max_length") == 18 &&
      s.getAs[Double]("t_avg_length") == 14.25)
    val ent = s.getAs[Double]("t_entropy")
    assert(ent > 0 && ent < 6) // bounded by log2(|alphabet|)
    // doc_id (1..4) and n (10..40) are perfectly correlated
    val mx = q("""{"query": {"match_all": {}}, "aggs":
      {"m": {"matrix_stats": {"fields": ["doc_id", "n"]}}},
      "size": 0}""").collect().head
    assert(mx.getAs[Long]("m_doc_id_count") == 4L)
    assert(math.abs(mx.getAs[Double]("m_doc_id_mean") - 2.5) < 1e-12)
    assert(math.abs(mx.getAs[Double]("m_doc_id_variance") - 5.0 / 3) < 1e-12)
    assert(math.abs(mx.getAs[Double]("m_doc_id_n_covariance") -
      50.0 / 3) < 1e-12)
    assert(math.abs(mx.getAs[Double]("m_doc_id_n_correlation") - 1.0)
      < 1e-12)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"m": {"matrix_stats": {"fields": ["n"]}}}, "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"m": {"matrix_stats": {"fields": ["n", "n"]}}}, "size": 0}""")
    }
  }

  test("auto_date_histogram: smallest ladder rung fitting the " +
    "buckets target; overflow and bounds reject by name") {
    import java.sql.Timestamp
    val evs = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:45")),
      (3L, Timestamp.valueOf("2024-01-01 00:01:40"))
    ).toDF("id", "ts")
    // span 100 s: 1s->101, 5s->21, 10s->11 buckets, 30s->4 <= 10
    val r = EsDsl.search(evs, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs":
        {"a": {"auto_date_histogram": {"field": "ts"}}},
        "size": 0}""")).collect()
    assert(r.head.getAs[String]("interval") == "30s")
    assert(r.map(_.getAs[Long]("doc_count")).sum == 3L)
    // a 3-year span cannot fit 10 fixed 7d buckets: reject, never
    // silently re-bucket
    val wide = Seq(
      (1L, Timestamp.valueOf("2020-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2023-01-01 00:00:00"))
    ).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      EsDsl.search(wide, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs":
          {"a": {"auto_date_histogram": {"field": "ts"}}},
          "size": 0}""")).collect()
    }
    intercept[IllegalArgumentException] {
      EsDsl.search(evs, mapper.readTree(
        """{"query": {"match_all": {}}, "aggs":
          {"a": {"auto_date_histogram": {"field": "ts",
            "buckets": 0}}}, "size": 0}"""))
    }
  }

  test("span family: ordered/unordered proximity, span_or token " +
    "sets, span_first prefix window, span_not exclusion") {
    // docs: 1 "window batch run", 2 "window only", 3 "nothing here",
    // 4 "batch batch window"
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(0)).toSeq
    // in-order batch->window, slop 0: only doc 4 (batch@1, window@2)
    val near = q("""{"query": {"span_near": {"clauses": [
      {"span_term": {"text": "batch"}},
      {"span_term": {"text": "window"}}],
      "slop": 0, "in_order": true}}, "size": 10}""").collect()
    assert(ids(near) == Seq(4L) &&
      near.head.getAs[Double]("_score") == 1.0)
    // unordered adjacency: docs 1 (window batch) and 4 (batch window)
    val uno = q("""{"query": {"span_near": {"clauses": [
      {"span_term": {"text": "window"}},
      {"span_term": {"text": "batch"}}],
      "slop": 0, "in_order": false}}, "size": 10}""").collect()
    assert(ids(uno) == Seq(1L, 4L))
    // span_or: per-doc token-set frequency
    val or = q("""{"query": {"span_or": {"clauses": [
      {"span_term": {"text": "window"}},
      {"span_term": {"text": "batch"}}]}}, "size": 10}""").collect()
    assert(or.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 2.0, 2L -> 1.0, 4L -> 3.0))
    // span_first: window among the first token only -> docs 1, 2
    val first = q("""{"query": {"span_first": {
      "match": {"span_term": {"text": "window"}}, "end": 1}},
      "size": 10}""").collect()
    assert(ids(first) == Seq(1L, 2L))
    // span_not: batch with no window in [p, p+1] -> docs 1 and 4
    // (doc 4's batch@1 is excluded, batch@0 survives)
    val not = q("""{"query": {"span_not": {
      "include": {"span_term": {"text": "batch"}},
      "exclude": {"span_term": {"text": "window"}},
      "post": 1}}, "size": 10}""").collect()
    assert(not.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0, 4L -> 1.0))
    // pre=1 widens the exclusion window backwards: doc 1's batch@1
    // now sees window@0
    val pre = q("""{"query": {"span_not": {
      "include": {"span_term": {"text": "batch"}},
      "exclude": {"span_term": {"text": "window"}},
      "pre": 1, "post": 1}}, "size": 10}""").collect()
    assert(ids(pre) == Seq(4L))
    // rejections: unordered 3 clauses, mixed fields, nested
    // span_near, inner boost
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
        {"span_term": {"text": "c"}}],
        "slop": 1, "in_order": false}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": "a"}},
        {"span_term": {"source": "b"}}], "slop": 1}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_near": {"clauses": [{"span_term": {"text": "a"}}],
          "slop": 0}},
        {"span_term": {"text": "b"}}], "slop": 1}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": {"value": "a", "boost": 2}}},
        {"span_term": {"text": "b"}}], "slop": 1}}}""")
    }
  }

  test("span_field_masking: cross-field span_near in one position " +
    "space, unordered pair, standalone mask, knob validation") {
    // docs: 1 "window batch run"/src3, 2 "window only"/src1,
    // 3 "nothing here"/null, 4 "batch batch window"/src3.
    // source is a one-token stream: src3 sits at position 0.
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(0)).toSeq
    // masked src3@0 (reported as text) then window within slop 1:
    // doc 4's window@2 is in (0, 2]; doc 1's window@0 is not after 0
    val ordered = q("""{"query": {"span_near": {"clauses": [
      {"span_field_masking": {
        "query": {"span_term": {"source": "src3"}}, "field": "text"}},
      {"span_term": {"text": "window"}}],
      "slop": 1, "in_order": true}}, "size": 10}""").collect()
    assert(ids(ordered) == Seq(4L) &&
      ordered.head.getAs[Double]("_score") == 1.0)
    // three in-order slots across two source fields: src3@0 ->
    // batch <= pos 2 -> window <= pos 3: doc 4 only (doc 1's window
    // precedes its batch)
    val three = q("""{"query": {"span_near": {"clauses": [
      {"span_field_masking": {
        "query": {"span_term": {"source": "src3"}}, "field": "text"}},
      {"span_term": {"text": "batch"}},
      {"span_term": {"text": "window"}}],
      "slop": 1, "in_order": true}}, "size": 10}""").collect()
    assert(ids(three) == Seq(4L))
    // unordered masked pair: src3@0 within one token of a batch —
    // doc 1 (batch@1) and doc 4 (batch@1; batch@0 collides at p=q)
    val uno = q("""{"query": {"span_near": {"clauses": [
      {"span_field_masking": {
        "query": {"span_term": {"source": "src3"}}, "field": "text"}},
      {"span_term": {"text": "batch"}}],
      "slop": 0, "in_order": false}}, "size": 10}""").collect()
    assert(ids(uno) == Seq(1L, 4L))
    // standalone mask: match set and score ARE the wrapped span's
    val alone = q("""{"query": {"span_field_masking": {
      "query": {"span_term": {"text": "batch"}},
      "field": "source"}}, "size": 10}""").collect()
    assert(alone.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0, 4L -> 2.0))
    // legacy client name
    val legacy = q("""{"query": {"span_near": {"clauses": [
      {"field_masking_span": {
        "query": {"span_term": {"source": "src3"}}, "field": "text"}},
      {"span_term": {"text": "window"}}],
      "slop": 1, "in_order": true}}, "size": 10}""").collect()
    assert(ids(legacy) == Seq(4L))
    // rejections: missing query, missing field, unknown key, and a
    // mask that still leaves span_near's reported fields mixed
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_field_masking": {"field": "text"}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_field_masking": {
        "query": {"span_term": {"text": "a"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_field_masking": {
          "query": {"span_term": {"source": "a"}}, "field": "text",
          "bogus": 1}},
        {"span_term": {"text": "b"}}], "slop": 1}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_field_masking": {
          "query": {"span_term": {"source": "a"}}, "field": "other"}},
        {"span_term": {"text": "b"}}], "slop": 1}}}""")
    }
  }

  test("parent/child: has_child score modes and children bounds, " +
    "has_parent, parent_id, children/parent aggs, bool composition") {
    val kids = Seq(
      (10L, 1L, "alpha", 5L), (11L, 1L, "beta", 7L),
      (12L, 2L, "alpha alpha", 9L), (13L, 99L, "gamma", 1L)
    ).toDF("kid_id", "parent_id", "ktext", "kv")
    val relP = EsDsl.Relations(
      children = Map("kid" -> ((kids, "parent_id"))))
    val relC = EsDsl.Relations(
      parents = Map("doc" -> ((docs, "parent_id"))))
    def qp(json: String) = EsDsl.search(docs,
      mapper.readTree(json), relations = relP)
    def qc(json: String) = EsDsl.search(kids,
      mapper.readTree(json), relations = relC)
    // score_mode sum over a constant-scored child clause = child count
    val sum2 = qp("""{"query": {"has_child": {"type": "kid",
      "query": {"range": {"kv": {"gte": 5}}},
      "score_mode": "sum"}}, "size": 10}""").collect()
    assert(sum2.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 2.0, 2L -> 1.0))
    // min_children / max_children cut on the matching-child count
    assert(qp("""{"query": {"has_child": {"type": "kid",
      "query": {"range": {"kv": {"gte": 5}}},
      "min_children": 2}}, "size": 10}""").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(qp("""{"query": {"has_child": {"type": "kid",
      "query": {"range": {"kv": {"gte": 5}}},
      "max_children": 1}}, "size": 10}""").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // default score_mode none: constant 1.0, boost applies
    val none = qp("""{"query": {"has_child": {"type": "kid",
      "query": {"match": {"ktext": "alpha"}}, "boost": 3}},
      "size": 10}""").collect()
    assert(none.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 3.0, 2L -> 3.0))
    // has_child composes inside bool (join fold resolves post-compile)
    val boolQ = qp("""{"query": {"bool": {
      "must": [{"has_child": {"type": "kid",
        "query": {"range": {"kv": {"gte": 5}}}}}],
      "filter": [{"term": {"source": "src3"}}]}}, "size": 10}""")
      .collect()
    assert(boolQ.map(_.getLong(0)).toSeq == Seq(1L))
    // has_parent: children of src3 parents (docs 1, 4 — only 1 has
    // kids); score: true carries the parent's score
    val hp = qc("""{"query": {"has_parent": {"parent_type": "doc",
      "query": {"term": {"source": "src3"}}}},
      "sort": [{"kid_id": "asc"}], "size": 10}""").collect()
    assert(hp.map(_.getLong(0)).toSeq == Seq(10L, 11L) &&
      hp.forall(_.getAs[Double]("_score") == 1.0))
    // parent_id: one parent's children; unknown type fails by name
    assert(qc("""{"query": {"parent_id": {"type": "doc", "id": "2"}},
      "size": 10}""").collect().map(_.getLong(0)).toSeq == Seq(12L))
    intercept[IllegalArgumentException] {
      qc("""{"query": {"parent_id": {"type": "nope", "id": "2"}}}""")
    }
    // children agg: kids of the matching parents (kid 13's parent 99
    // is no doc — excluded by the semi-join)
    val ca = qp("""{"query": {"match_all": {}},
      "aggs": {"kids": {"children": {"type": "kid"}, "aggs": {
        "min_v": {"min": {"field": "kv"}},
        "max_v": {"max": {"field": "kv"}}}}}, "size": 0}""").collect()
    assert(ca.head.getAs[Long]("doc_count") == 3L &&
      ca.head.getAs[Long]("min_v") == 5L &&
      ca.head.getAs[Long]("max_v") == 9L)
    // parent agg: distinct parents of the matching children
    val pa = qc("""{"query": {"match": {"ktext": "alpha"}},
      "aggs": {"ps": {"parent": {"type": "doc"}, "aggs": {
        "n": {"value_count": {"field": "doc_id"}}}}}, "size": 0}""")
      .collect()
    assert(pa.head.getAs[Long]("doc_count") == 2L &&
      pa.head.getAs[Long]("n") == 2L)
    // nested parent/child rejects (one-level join contract); unknown
    // child type and score_mode reject by name
    intercept[IllegalArgumentException] {
      qp("""{"query": {"has_child": {"type": "kid", "query":
        {"has_child": {"type": "kid", "query":
          {"match_all": {}}}}}}}""")
    }
    intercept[IllegalArgumentException] {
      qp("""{"query": {"has_child": {"type": "nope",
        "query": {"match_all": {}}}}}""")
    }
    intercept[IllegalArgumentException] {
      qp("""{"query": {"has_child": {"type": "kid",
        "query": {"match_all": {}}, "score_mode": "mul"}}}""")
    }
  }

  test("t_test: Welch / pooled / paired statistics; paired rejects " +
    "filters; unknown type and side keys reject by name") {
    val tdf = Seq(
      (1L, "a", 10L, 4L), (2L, "a", 20L, 4L), (5L, "a", 30L, 2L),
      (3L, "b", 40L, 1L), (4L, "b", 80L, 1L)
    ).toDF("id", "g", "v", "w")
    def tval(body: String): Double =
      EsDsl.search(tdf, mapper.readTree(body)).collect()
        .head.getAs[Double]("t")
    // a: 10,20,30 (m=20, var=100); b: 40,80 (m=60, var=800)
    val welch = tval("""{"query": {"match_all": {}}, "aggs":
      {"t": {"t_test": {
        "a": {"field": "v", "filter": {"term": {"g": "a"}}},
        "b": {"field": "v", "filter": {"term": {"g": "b"}}}}}},
      "size": 0}""")
    // (20-60)/sqrt(100/3 + 800/2)
    assert(math.abs(welch - (-40.0 / math.sqrt(100.0 / 3 + 400))) < 1e-9)
    val pooled = tval("""{"query": {"match_all": {}}, "aggs":
      {"t": {"t_test": {
        "a": {"field": "v", "filter": {"term": {"g": "a"}}},
        "b": {"field": "v", "filter": {"term": {"g": "b"}}},
        "type": "homoscedastic"}}}, "size": 0}""")
    // sp2 = (2·100 + 1·800)/3; t = -40/sqrt(sp2·(1/3 + 1/2))
    assert(math.abs(pooled -
      (-40.0 / math.sqrt(1000.0 / 3 * (1.0 / 3 + 0.5)))) < 1e-9)
    // paired over a-rows' (v, w): d = 6, 16, 28 -> m=50/3,
    // var=(124²-...)  — compute directly: d mean 50/3, sample var
    // ((6-50/3)²+(16-50/3)²+(28-50/3)²)/2 = 368/3... assert vs direct
    val paired = tval("""{"query": {"term": {"g": "a"}}, "aggs":
      {"t": {"t_test": {"a": {"field": "v"}, "b": {"field": "w"},
        "type": "paired"}}}, "size": 0}""")
    val ds = Seq(6.0, 16.0, 28.0)
    val m = ds.sum / 3
    val vv = ds.map(d => (d - m) * (d - m)).sum / 2
    assert(math.abs(paired - m / math.sqrt(vv / 3)) < 1e-9)
    intercept[IllegalArgumentException] {
      tval("""{"query": {"match_all": {}}, "aggs":
        {"t": {"t_test": {
          "a": {"field": "v", "filter": {"term": {"g": "a"}}},
          "b": {"field": "w"}, "type": "paired"}}}, "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      tval("""{"query": {"match_all": {}}, "aggs":
        {"t": {"t_test": {"a": {"field": "v"}, "b": {"field": "w"},
          "type": "zscore"}}}, "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      tval("""{"query": {"match_all": {}}, "aggs":
        {"t": {"t_test": {"a": {"field": "v", "script": "x"},
          "b": {"field": "w"}}}}, "size": 0}""")
    }
  }

  test("terms lookup: referenced doc's field values become the term " +
    "list; missing doc matches nothing; edges reject by name") {
    val lkp: EsDsl.IndexResolver =
      name => if (name == "docs") Some((docs, Nil)) else None
    def ql(json: String) =
      EsDsl.search(docs, mapper.readTree(json), lookup = Some(lkp))
    // doc 1's source is src3 -> docs 1 and 4 match on source
    val hit = ql("""{"query": {"terms": {"source":
      {"index": "docs", "id": "1", "path": "source"}}},
      "size": 10}""").collect()
    assert(hit.map(_.getLong(0)).toSeq == Seq(1L, 4L) &&
      hit.forall(_.getAs[Double]("_score") == 1.0))
    // doc 3's source is null -> no terms -> matches nothing
    assert(ql("""{"query": {"terms": {"source":
      {"index": "docs", "id": "3", "path": "source"}}}}""")
      .collect().isEmpty)
    // missing doc -> matches nothing (ES contract), not an error
    assert(ql("""{"query": {"terms": {"source":
      {"index": "docs", "id": "99", "path": "source"}}}}""")
      .collect().isEmpty)
    // unknown lookup index / unknown path / routing knob / absent
    // resolver: all 400 by name
    intercept[IllegalArgumentException] {
      ql("""{"query": {"terms": {"source":
        {"index": "nope", "id": "1", "path": "source"}}}}""")
    }
    intercept[IllegalArgumentException] {
      ql("""{"query": {"terms": {"source":
        {"index": "docs", "id": "1", "path": "missing_col"}}}}""")
    }
    intercept[IllegalArgumentException] {
      ql("""{"query": {"terms": {"source":
        {"index": "docs", "id": "1", "path": "source",
         "routing": "r"}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"terms": {"source":
        {"index": "docs", "id": "1", "path": "source"}}}}""")
    }
  }

  test("span_containing/span_within interval relations; span_multi " +
    "pattern leaves; rejection edges") {
    // docs: 1 "window batch run", 2 "window only", 3 "nothing here",
    // 4 "batch batch window"
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(0)).toSeq
    val bigNear = """{"span_near": {"clauses": [
      {"span_term": {"text": "batch"}},
      {"span_term": {"text": "window"}}],
      "slop": 0, "in_order": true}}"""
    // doc 4's only big span is batch@1..window@2; it contains batch@1
    val containing = q(s"""{"query": {"span_containing": {
      "big": $bigNear, "little": {"span_term": {"text": "batch"}}}},
      "size": 10}""").collect()
    assert(containing.map(r => r.getLong(0) ->
      r.getAs[Double]("_score")).toMap == Map(4L -> 1.0))
    // within counts the little side: batch@1 is covered, batch@0 not
    val within = q(s"""{"query": {"span_within": {
      "big": $bigNear, "little": {"span_term": {"text": "batch"}}}},
      "size": 10}""").collect()
    assert(within.map(r => r.getLong(0) ->
      r.getAs[Double]("_score")).toMap == Map(4L -> 1.0))
    // width-1 big: containment degenerates to position coincidence
    val coincide = q("""{"query": {"span_containing": {
      "big": {"span_term": {"text": "window"}},
      "little": {"span_term": {"text": "window"}}}},
      "size": 10}""").collect()
    assert(ids(coincide) == Seq(1L, 2L, 4L))
    assert(q("""{"query": {"span_containing": {
      "big": {"span_term": {"text": "window"}},
      "little": {"span_term": {"text": "batch"}}}},
      "size": 10}""").collect().isEmpty)
    // span_multi: prefix / wildcard / regexp / fuzzy token patterns
    val pre = q("""{"query": {"span_multi": {"match":
      {"prefix": {"text": {"value": "win"}}}}}, "size": 10}""")
      .collect()
    assert(ids(pre) == Seq(1L, 2L, 4L))
    val wild = q("""{"query": {"span_multi": {"match":
      {"wildcard": {"text": {"value": "b?tch"}}}}}, "size": 10}""")
      .collect()
    assert(wild.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0, 4L -> 2.0))
    val rex = q("""{"query": {"span_multi": {"match":
      {"regexp": {"text": {"value": "b.tch"}}}}}, "size": 10}""")
      .collect()
    assert(rex.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0, 4L -> 2.0))
    val fz = q("""{"query": {"span_multi": {"match":
      {"fuzzy": {"text": {"value": "windoe", "fuzziness": "1"}}}}},
      "size": 10}""").collect()
    assert(ids(fz) == Seq(1L, 2L, 4L))
    // span_multi rides a span_near slot
    val slot = q("""{"query": {"span_near": {"clauses": [
      {"span_term": {"text": "batch"}},
      {"span_multi": {"match": {"prefix": {"text":
        {"value": "win"}}}}}],
      "slop": 0, "in_order": true}}, "size": 10}""").collect()
    assert(ids(slot) == Seq(4L))
    // rejections: unordered big, mixed fields, unknown span_multi
    // match kind, stray knob inside the wrapped pattern
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_containing": {
        "big": {"span_near": {"clauses": [
          {"span_term": {"text": "a"}},
          {"span_term": {"text": "b"}}],
          "slop": 1, "in_order": false}},
        "little": {"span_term": {"text": "c"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_within": {
        "big": {"span_term": {"text": "a"}},
        "little": {"span_term": {"source": "b"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_multi": {"match":
        {"term": {"text": "window"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_multi": {"match":
        {"prefix": {"text": {"value": "win", "rewrite":
          "top_terms_10"}}}}}}""")
    }
  }

  test("intervals: ordered/unordered match rules, any_of union, " +
    "all_of rejects by name; filter context compiles to predicate") {
    // ordered batch->window max_gaps 0: doc 4 only
    val iv = q("""{"query": {"intervals": {"text": {"match":
      {"query": "batch window", "max_gaps": 0, "ordered": true}}}},
      "size": 10}""").collect()
    assert(iv.map(_.getLong(0)).toSeq == Seq(4L))
    // unlimited unordered = conjunction; frequency = head term count
    val conj = q("""{"query": {"intervals": {"text": {"match":
      {"query": "run window"}}}}, "size": 10}""").collect()
    assert(conj.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0))
    // any_of sums rule frequencies
    val any = q("""{"query": {"intervals": {"text": {"any_of":
      {"intervals": [
        {"match": {"query": "only"}},
        {"match": {"query": "nothing here", "max_gaps": 0,
          "ordered": true}}]}}}}, "size": 10}""").collect()
    assert(any.map(_.getLong(0)).toSeq.sorted == Seq(2L, 3L))
    // intervals inside bool.filter: match set only, no scoring frame
    val filtered = q("""{"query": {"bool": {
      "filter": [{"intervals": {"text": {"match":
        {"query": "batch window", "max_gaps": 0, "ordered": true}}}}]}},
      "size": 10}""").collect()
    assert(filtered.map(_.getLong(0)).toSeq == Seq(4L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"all_of":
        {"intervals": []}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"match":
        {"query": "a b c", "max_gaps": 1, "ordered": false}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"match":
        {"query": "a b", "fuzzy": {}}}}}}""")
    }
  }

  test("terms-level pipelines: bucket_script/selector/sort apply " +
    "after the top-size cut; histogram-only pipelines reject") {
    // source: src3 x2 (n sum 50), src1 x1 (n 20); doc 3's null source
    // drops. per = sum/count -> src3 25, src1 20
    val r = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source"},
       "aggs": {
         "t": {"sum": {"field": "n"}},
         "per": {"bucket_script": {
           "buckets_path": {"t": "t", "c": "_count"},
           "script": "params.t / params.c"}},
         "keep": {"bucket_selector": {
           "buckets_path": {"p": "per"},
           "script": "params.p > 20"}}}}},
      "size": 0}""").collect()
    assert(r.length == 1 && r.head.getAs[String]("source") == "src3" &&
      r.head.getAs[Double]("per") == 25.0)
    // bucket_sort re-orders the cut by a script column
    val bs = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source"},
       "aggs": {
         "t": {"sum": {"field": "n"}},
         "per": {"bucket_script": {
           "buckets_path": {"t": "t", "c": "_count"},
           "script": "params.t / params.c"}},
         "page": {"bucket_sort": {"sort": [{"per": {"order": "asc"}}],
           "size": 1}}}}},
      "size": 0}""").collect()
    assert(bs.length == 1 && bs.head.getAs[String]("source") == "src1")
    // cumulative_sum needs a total key order terms lacks: reject
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"s": {"terms": {"field": "source"},
         "aggs": {"c": {"cumulative_sum":
           {"buckets_path": "_count"}}}}}, "size": 0}""")
    }
  }

  test("script_score / script query / match_none: Painless arithmetic " +
    "subset with _score, doc refs and params; rejections by name") {
    // base: term window (docs 1, 2, 4 score 1); script: _score * n / 10
    val ss = q("""{"query": {"script_score": {
      "query": {"query_string": {"query": "text:window"}},
      "script": {"source": "_score * doc['n'].value / params.d",
        "params": {"d": 10}}}}, "size": 10}""").collect()
    assert(ss.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0, 2L -> 2.0, 4L -> 4.0))
    // min_score filters on the NEW score
    val ms = q("""{"query": {"script_score": {
      "query": {"query_string": {"query": "text:window"}},
      "script": "_score * doc['n'].value / 10",
      "min_score": 2.5}}, "size": 10}""").collect()
    assert(ms.map(_.getLong(0)).toSeq == Seq(4L))
    // script query: boolean filter, constant score 1
    val sq = q("""{"query": {"script": {"script":
      {"source": "doc['n'].value > 15 && doc['n'].value < 35"}}},
      "size": 10}""").collect()
    assert(sq.map(_.getLong(0)).toSeq == Seq(2L, 3L) &&
      sq.head.getAs[Double]("_score") == 1.0)
    // script_score FUNCTION inside function_score (no _score binding)
    val fs = q("""{"query": {"function_score": {
      "query": {"query_string": {"query": "text:window"}},
      "functions": [{"script_score":
        {"script": "doc['n'].value / 10"}}],
      "boost_mode": "replace"}}, "size": 10}""").collect()
    assert(fs.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap == Map(1L -> 1.0, 2L -> 2.0, 4L -> 4.0))
    // match_none: empty set
    assert(q("""{"query": {"match_none": {}}, "size": 10}""")
      .collect().isEmpty)
    // rejections: non-painless lang, unsupported Math member,
    // _score inside a function, doc refs inside bucket_script —
    // supported Math.* members now COMPILE in score scripts
    intercept[IllegalArgumentException] {
      q("""{"query": {"script": {"script": {"source": "1",
        "lang": "mustache"}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"script_score": {
        "query": {"match_all": {}},
        "script": "Math.atan2(doc['n'].value, 1)"}}}""")
    }
    assert(q("""{"query": {"script_score": {
        "query": {"match_all": {}},
        "script": "Math.sqrt(doc['n'].value)"}}, "size": 1,
        "sort": [{"_score": "desc"}]}""")
      .collect()(0).getAs[Double]("_score") == math.sqrt(40.0))
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {
        "query": {"match_all": {}},
        "functions": [{"script_score": {"script": "_score * 2"}}]}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"s": {"bucket_script": {
           "buckets_path": {"c": "_count"},
           "script": "doc['n'].value"}}}}}, "size": 0}""")
    }
  }

  test("top-level min_score, post_filter, and the body-key " +
    "inventory: unknown keys reject by name, accuracy knobs ignored") {
    // query_string window scores 1 per doc; script-free gate
    val ms = q("""{"query": {"script_score": {
      "query": {"query_string": {"query": "text:window"}},
      "script": "_score * doc['n'].value"}},
      "min_score": 25, "size": 10}""").collect()
    assert(ms.map(_.getLong(0)).toSeq == Seq(4L))
    // post_filter narrows hits AFTER the match set; with aggs the
    // buckets keep the full set (asserted via searchParts)
    val (hits, aggs) = EsDsl.searchParts(docs, mapper.readTree(
      """{"query": {"query_string": {"query": "text:window"}},
        | "post_filter": {"term": {"source": "src3"}},
        | "aggs": {"by_src": {"terms": {"field": "source"}}},
        | "size": 10}""".stripMargin))
    assert(hits.collect().map(_.getLong(0)).toSeq.sorted == Seq(1L, 4L))
    // aggs see docs 1, 2, 4 (the un-narrowed match set): src3 x2 +
    // src1 x1
    val buckets = aggs.get.collect()
    assert(buckets.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("src3" -> 2L, "src1" -> 1L))
    // exact totals subsume track_total_hits; timeout is a
    // partial-results knob — both accepted and ignored
    assert(q("""{"query": {"match_all": {}},
      "track_total_hits": true, "timeout": "2s", "size": 10}""")
      .collect().length == 4)
    // a typo'd "agg" (and any unknown top-level key) rejects by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "agg": {"x": {"terms": {"field": "source"}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "explain": true}""")
    }
    // min_score + aggs cannot resolve scoring in the agg frame
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "min_score": 1,
        "aggs": {"x": {"terms": {"field": "source"}}}, "size": 0}""")
    }
  }

  test("round-10 review regressions: sortless bucket_sort preserves " +
    "parent order, single-entry sort form, script boost, degenerate " +
    "span terms, double matrix_stats") {
    // from/size-only bucket_sort truncates the TERMS order (count
    // desc) — src3 (2 docs) survives, not the alphabetical first
    val cut = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source"},
       "aggs": {"page": {"bucket_sort": {"size": 1}}}}},
      "size": 0}""").collect()
    assert(cut.length == 1 && cut.head.getAs[String]("source") == "src3")
    // the single-object (non-array) sort form is honored, not dropped
    val obj = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source"},
       "aggs": {"page": {"bucket_sort":
         {"sort": {"_key": {"order": "desc"}}, "size": 1}}}}},
      "size": 0}""").collect()
    assert(obj.head.getAs[String]("source") == "src3")
    // two bucket_sorts on one parent: reject, never silently drop one
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"s": {"terms": {"field": "source"},
         "aggs": {"a": {"bucket_sort": {"size": 1}},
                  "b": {"bucket_sort": {"size": 2}}}}}, "size": 0}""")
    }
    // knn-only bodies reject a silent score floor / post filter
    intercept[IllegalArgumentException] {
      EsDsl.search(vecs, mapper.readTree(
        """{"knn": {"field": "embedding", "query_vector": [1, 0, 0],
          |  "k": 2, "num_candidates": 5}, "min_score": 0.5}"""
          .stripMargin))
    }
    // script query boost multiplies the constant score
    val sb = q("""{"query": {"script": {"script":
      {"source": "doc['n'].value > 15"}, "boost": 3}},
      "size": 10}""").collect()
    assert(sb.head.getAs[Double]("_score") == 3.0)
    // empty span_term value would match every multi-token doc via the
    // separator needle: reject
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_term": {"text": ""}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": "a b"}}], "slop": 0}}}""")
    }
    // intervals any_of validates its own keys (a silently dropped
    // `filter` would change the match set)
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"any_of":
        {"intervals": [{"match": {"query": "x"}}],
         "filter": {}}}}}}""")
    }
    // top_metrics object-form sort with two fields: reject
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"b": {"top_metrics": {"metrics": [{"field": "doc_id"}],
          "sort": {"n": "asc", "doc_id": "desc"}}}}, "size": 0}""")
    }
    // malformed numeric literal surfaces as the parser's named error
    val e = intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"s": {"bucket_script": {
           "buckets_path": {"c": "_count"},
           "script": "params.c * 2e"}}}}}, "size": 0}""")
    }
    assert(e.getMessage.contains("malformed numeric literal"))
    // matrix_stats DOUBLE branch: fractional values must NOT truncate
    // through the decimal path (x: 1.5, 2.5, 4.0 -> sample variance
    // 19/12, covariance with id 5/4)
    val dmx = EsDsl.search(
      Seq((1L, 1.5), (2L, 2.5), (3L, 4.0)).toDF("id", "x"),
      mapper.readTree("""{"query": {"match_all": {}}, "aggs":
        {"m": {"matrix_stats": {"fields": ["id", "x"]}}},
        "size": 0}""")).collect().head
    assert(math.abs(dmx.getAs[Double]("m_x_variance") - 19.0 / 12)
      < 1e-12)
    assert(math.abs(dmx.getAs[Double]("m_id_x_covariance") - 1.25)
      < 1e-12)
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"m": {"matrix_stats": {"fields": ["doc_id", "nope"]}}},
        "size": 0}""")
    }
    // the {"field": "desc"} string shorthand is honored on all three
    // sort surfaces (was silently ascending)
    val sh = q("""{"query": {"match_all": {}},
      "sort": [{"n": "desc"}], "size": 2}""").collect()
    assert(sh.map(_.getLong(0)).toSeq == Seq(4L, 3L))
    val shb = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source"},
       "aggs": {"page": {"bucket_sort":
         {"sort": [{"_count": "asc"}], "size": 1}}}}},
      "size": 0}""").collect()
    assert(shb.head.getAs[String]("source") == "src1")
    val shh = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source", "size": 2},
       "aggs": {"top": {"top_hits": {"size": 1,
         "sort": [{"n": "desc"}]}}}}}, "size": 0}""").collect()
    // src3's best hit by n desc is doc 4 (n=40), not doc 1
    assert(shh.find(_.getAs[String]("source") == "src3")
      .get.getAs[Long]("n") == 40L)
    // a bad order value and unknown entry knobs reject by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "sort": [{"n": "descc"}]}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}},
        "sort": [{"n": {"order": "desc", "missing": "_last"}}]}""")
    }
  }

  test("filters other_bucket: the none-matched catch-all; knob " +
    "contradictions and key collisions reject") {
    val r = q("""{"query": {"match_all": {}}, "aggs":
      {"k": {"filters": {"filters": {
        "win": {"query_string": {"query": "text:window"}}},
        "other_bucket": true}}},
      "size": 0}""").collect()
    // windows: docs 1, 2, 4; other: doc 3
    assert(r.map(x => x.getString(0) -> x.getLong(1)).toMap ==
      Map("win" -> 3L, "_other_" -> 1L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"k": {"filters": {"filters": {"a": {"match_all": {}}},
          "other_bucket": false, "other_bucket_key": "x"}}},
        "size": 0}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"k": {"filters": {"filters": {"a": {"match_all": {}}},
          "other_bucket_key": "a"}}}, "size": 0}""")
    }
  }

  test("geo family: haversine radius filter and bounding box with " +
    "date-line wrap over struct<lat,lon> points") {
    import org.apache.spark.sql.functions.{struct => fstruct, col => fcol}
    // Paris (48.8566, 2.3522), London (51.5074, -0.1278),
    // Auckland (-36.85, 174.76), Suva (-18.14, 178.44),
    // Papeete (-17.53, -149.57) — the last two straddle 180°
    val places = Seq(
      (1L, "paris", 48.8566, 2.3522),
      (2L, "london", 51.5074, -0.1278),
      (3L, "auckland", -36.85, 174.76),
      (4L, "suva", -18.14, 178.44),
      (5L, "papeete", -17.53, -149.57)
    ).toDF("id", "name", "_lat", "_lon")
      .select(fcol("id"), fcol("name"),
        fstruct(fcol("_lat").as("lat"), fcol("_lon").as("lon"))
          .as("location"))
    def g(json: String) =
      EsDsl.search(places, mapper.readTree(json)).collect()
    // Paris→London ≈ 344 km: 400km catches both, 200km only Paris
    val near = g("""{"query": {"geo_distance": {"distance": "400km",
      "location": {"lat": 48.8566, "lon": 2.3522}}}, "size": 10}""")
    assert(near.map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L))
    val tight = g("""{"query": {"geo_distance": {"distance": "200km",
      "location": "48.8566,2.3522"}}, "size": 10}""")
    assert(tight.map(_.getLong(0)).toSeq == Seq(1L))
    // bounding box around western Europe
    val eu = g("""{"query": {"geo_bounding_box": {"location": {
      "top_left": {"lat": 55, "lon": -5},
      "bottom_right": {"lat": 45, "lon": 10}}}}, "size": 10}""")
    assert(eu.map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L))
    // date-line wrap: left 170 > right -140 spans 180° — Auckland,
    // Suva AND Papeete are inside, Europe is not
    val pacific = g("""{"query": {"geo_bounding_box": {"location": {
      "top_left": {"lat": 0, "lon": 170},
      "bottom_right": {"lat": -50, "lon": -140}}}}, "size": 10}""")
    assert(pacific.map(_.getLong(0)).toSeq.sorted == Seq(3L, 4L, 5L))
    // validation: bad unit, out-of-range lat, inverted box, two point
    // fields
    intercept[IllegalArgumentException] {
      g("""{"query": {"geo_distance": {"distance": "3parsec",
        "location": {"lat": 0, "lon": 0}}}}""")
    }
    intercept[IllegalArgumentException] {
      g("""{"query": {"geo_distance": {"distance": "1km",
        "location": {"lat": 91, "lon": 0}}}}""")
    }
    intercept[IllegalArgumentException] {
      g("""{"query": {"geo_bounding_box": {"location": {
        "top_left": {"lat": -50, "lon": 0},
        "bottom_right": {"lat": 50, "lon": 10}}}}}""")
    }
    intercept[IllegalArgumentException] {
      g("""{"query": {"geo_distance": {"distance": "1km",
        "location": {"lat": 0, "lon": 0},
        "other": {"lat": 0, "lon": 0}}}}""")
    }
  }

  test("decay functions: linear/exp/gauss score decay with distance " +
    "from an origin; wrapper decodes base64 queries; all_of reduces " +
    "single-token sequences") {
    // linear on n: origin 10, scale 15, decay 0.5 -> s = 30;
    // dist 0,10,20,30 -> 1.0, 2/3, 1/3, 0.0
    val lin = q("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"linear": {"n":
        {"origin": 10, "scale": 15, "decay": 0.5}}}],
      "boost_mode": "replace"}}, "size": 10}""").collect()
    val byId = lin.map(r => r.getLong(0) -> r.getAs[Double]("_score"))
      .toMap
    assert(byId(1L) == 1.0 && math.abs(byId(2L) - 2.0 / 3) < 1e-12 &&
      math.abs(byId(3L) - 1.0 / 3) < 1e-12 && byId(4L) == 0.0)
    // exp at the scale point decays to exactly `decay`
    val ex = q("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"exp": {"n":
        {"origin": 10, "scale": 10, "decay": 0.25}}}],
      "boost_mode": "replace"}}, "size": 10}""").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("_score")).toMap
    assert(ex(1L) == 1.0 && math.abs(ex(2L) - 0.25) < 1e-12 &&
      math.abs(ex(3L) - 0.0625) < 1e-12)
    // gauss at the scale point equals decay; offset flattens the top
    val ga = q("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"gauss": {"n":
        {"origin": 10, "scale": 10, "offset": 10, "decay": 0.5}}}],
      "boost_mode": "replace"}}, "size": 10}""").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("_score")).toMap
    // dist(n=20) = 0 (inside offset) -> 1.0; dist(n=30) = 10 = scale
    // -> 0.5
    assert(ga(1L) == 1.0 && ga(2L) == 1.0 &&
      math.abs(ga(3L) - 0.5) < 1e-12)
    // shorthand position + weight compose
    val sh = q("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "linear": {"n": {"origin": 10, "scale": 15, "decay": 0.5}},
      "weight": 3, "boost_mode": "replace"}}, "size": 10}""").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("_score")).toMap
    assert(sh(1L) == 3.0 && math.abs(sh(2L) - 2.0) < 1e-12)
    // 'now' origin and bad decay reject by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"gauss": {"n":
          {"origin": "now", "scale": "1d"}}}]}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"linear": {"n":
          {"origin": 0, "scale": 10, "decay": 1}}}]}}}""")
    }
    // wrapper: base64 of {"query_string": {"query": "text:window"}}
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"query_string": {"query": "text:window"}}"""
        .getBytes("UTF-8"))
    val wr = q(s"""{"query": {"wrapper": {"query": "$b64"}},
      "size": 10}""").collect()
    assert(wr.map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L, 4L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"wrapper": {"query": "!!!not-base64!!!"}}}""")
    }
    // all_of: batch then (window|run), ordered, adjacent -> docs 1
    // ("batch run") and 4 ("batch window")
    val ao = q("""{"query": {"intervals": {"text": {"all_of": {
      "ordered": true, "max_gaps": 0, "intervals": [
        {"match": {"query": "batch"}},
        {"any_of": {"intervals": [{"match": {"query": "window"}},
                                  {"match": {"query": "run"}}]}}]}}}},
      "size": 10}""").collect()
    assert(ao.map(_.getLong(0)).toSeq.sorted == Seq(1L, 4L))
    // multi-token sub-interval rejects by name
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"all_of": {
        "intervals": [{"match": {"query": "two tokens"}},
                      {"match": {"query": "x"}}]}}}}}""")
    }
    // fourth review pass pins: a shorthand function key NEXT TO a
    // functions array rejects (was silently dropped); two function
    // kinds in one entry reject; garbage max_gaps/ordered/slop knobs
    // reject instead of coercing to 0/false; wrapper queries highlight
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"weight": 2}],
        "linear": {"n": {"origin": 0, "scale": 10}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"script_score": {"script": "2"},
          "gauss": {"n": {"origin": 0, "scale": 10}}}]}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"match":
        {"query": "a b", "max_gaps": "unbounded"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"intervals": {"text": {"match":
        {"query": "a b", "ordered": "yes"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
        "slop": "lots"}}}""")
    }
    val wb64 = java.util.Base64.getEncoder.encodeToString(
      """{"query_string": {"query": "text:window"}}"""
        .getBytes("UTF-8"))
    val hl = q(s"""{"query": {"wrapper": {"query": "$wb64"}},
      "highlight": {"fields": {"text": {}}}, "size": 10}""").collect()
    assert(hl.exists(_.getAs[String]("highlight_text")
      .contains("<em>window</em>")))
    // fifth pass: a non-array functions value, garbage numeric knobs
    // (max_boost / clause boost) and fractional span windows all 400
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": {"weight": 2}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"weight": 2}], "max_boost": "ten"}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"term": {"source": {"value": "src3",
        "boost": "two"}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_first": {"match":
        {"span_term": {"text": "a"}}, "end": 2.9}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"span_not": {
        "include": {"span_term": {"text": "a"}},
        "exclude": {"span_term": {"text": "b"}}, "pre": 1.9}}}""")
    }
  }

  test("review regressions: fractional-interval gap fill keeps " +
    "populated buckets; malformed inputs 400, never 500 or silence") {
    // fractional interval: group key floor(0.65/0.1)*0.1 =
    // 0.6000000000000001 — the generated keys must walk the SAME
    // floor-index arithmetic or the join drops the populated bucket
    val fr = spark.sql(
      "SELECT * FROM VALUES (1, CAST(0.15 AS DOUBLE)), " +
      "(2, CAST(0.65 AS DOUBLE)) AS t(id, v)")
    val gf = EsDsl.search(fr, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "v", "interval": 0.1,
          "min_doc_count": 0}}}, "size": 0}"""))
      .collect().map(r => r.getAs[Double]("key") ->
        r.getAs[Long]("doc_count"))
    assert(gf.length == 6, s"got ${gf.toSeq}")
    assert(gf.head._2 == 1L && gf.last._2 == 1L,
      s"populated edge buckets lost: ${gf.toSeq}")
    assert(gf.map(_._2).sum == 2L)
    // index recovery must ROUND, not re-floor: for interval 1.1 the
    // max key floor(34045.5/1.1)*1.1 re-floors to index 30949 and a
    // floor-based bound would drop the populated top bucket
    val fr2 = spark.sql(
      "SELECT * FROM VALUES (1, CAST(34040.0 AS DOUBLE)), " +
      "(2, CAST(34045.5 AS DOUBLE)) AS t(id, v)")
    val gf2 = EsDsl.search(fr2, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "v", "interval": 1.1,
          "min_doc_count": 0}}}, "size": 0}"""))
      .collect().map(_.getAs[Long]("doc_count"))
    assert(gf2.sum == 2L, s"top bucket dropped: ${gf2.toSeq}")
    assert(gf2.head == 1L && gf2.last == 1L, s"edges: ${gf2.toSeq}")
    // malformed date_range bound: 400, not a silent empty bucket
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"p": {"date_range": {"field": "n",
          "ranges": [{"from": "not-a-date"}]}}}, "size": 0}""")
    }
    // huge numeric suffixes: simple_query_string stays lenient
    // (clamped, no throw), query_string throws its TYPED error
    assert(q("""{"query": {"simple_query_string":
      {"query": "windoq~99999999999", "fields": ["text"]}}}""")
      .count() >= 0)
    // a saturated phrase slop must still MATCH (the window arithmetic
    // clamps; an Int overflow would wrap negative and match nothing)
    assert(q("""{"query": {"simple_query_string":
      {"query": "\"window run\"~99999999999", "fields": ["text"]}}}""")
      .count() == 1)
    intercept[QueryString.ParseError] {
      QueryString.parse("a~99999999999")
    }
    intercept[QueryString.ParseError] { QueryString.parse("a^1.2.3") }
    // zero-padded and full-Int suffixes are VALID integers
    assert(QueryString.parse("\"a b\"~0000000010") ==
      QueryString.Phrase(None, Seq("a", "b"), 10))
    // date_range bounds follow SPARK'S cast grammar — fractional
    // seconds parse (and bucket) instead of 400ing
    assert(q("""{"query": {"match_all": {}}, "aggs":
      {"p": {"date_range": {"field": "n", "ranges":
        [{"from": "1970-01-01 00:00:00.5"}]}}}, "size": 0}""")
      .collect().length == 1)
    // a range query's textual bound on a TIMESTAMP column validates
    // the same way — a junk date 400s instead of silently matching
    // nothing (string columns keep lexicographic textual bounds)
    val tsf = spark.sql(
      "SELECT * FROM VALUES (1, TIMESTAMP '2024-01-05 00:00:00') " +
      "AS t(id, ts)")
    assert(EsDsl.search(tsf, mapper.readTree(
      """{"query": {"range": {"ts": {"gte": "2024-01-01"}}}}"""))
      .count() == 1)
    intercept[IllegalArgumentException] {
      EsDsl.search(tsf, mapper.readTree(
        """{"query": {"range": {"ts": {"gte": "not-a-date"}}}}"""))
    }
    // empty sort entries and top_hits _score sorts are caller errors
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "sort": [{}]}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"s": {"terms": {"field": "source"},
         "aggs": {"t": {"top_hits": {"sort": ["_score"]}}}}},
        "size": 0}""")
    }
    // ordering a terms agg by a multi-valued sub-metric is a 400 for
    // percentile_ranks too, not an unresolved-column 500
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"s": {"terms": {"field": "source",
          "order": {"pr": "desc"}},
         "aggs": {"pr": {"percentile_ranks":
           {"field": "n", "values": [20]}}}}}, "size": 0}""")
    }
  }

  test("combined_fields: single-field degenerate case scores exactly " +
    "like match (same BM25 machinery); operator gates; boosts 400") {
    def scores(body: String): Map[Long, Double] =
      q(body).select("doc_id", "_score").as[(Long, Double)]
        .collect().toMap
    val cf = scores("""{"query": {"combined_fields":
      {"query": "window batch", "fields": ["text"]}}}""")
    val mm = scores("""{"query": {"match":
      {"text": "window batch"}}}""")
    assert(cf == mm, s"combined_fields $cf != match $mm")
    // two fields combine into ONE synthetic field: 'src3' in source
    // and 'window' in text both count, operator=and needs both
    assert(scores("""{"query": {"combined_fields":
      {"query": "window src3", "fields": ["text", "source"],
       "operator": "and"}}}""").keySet == Set(1L, 4L))
    intercept[IllegalArgumentException] {
      q("""{"query": {"combined_fields":
        {"query": "x", "fields": ["text^2"]}}}""")
    }
  }

  test("rank_feature / distance_feature / pinned ranking queries") {
    // saturation: n/(n+10)
    val rf = q("""{"query": {"rank_feature": {"field": "n",
      "saturation": {"pivot": 10}}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(rf == Map(1L -> 0.5, 2L -> (20.0 / 30), 3L -> 0.75,
      4L -> 0.8))
    // the index-statistics pivot default is refused; one function only
    intercept[IllegalArgumentException] {
      q("""{"query": {"rank_feature": {"field": "n",
        "saturation": {}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"rank_feature": {"field": "n", "linear": {},
        "log": {"scaling_factor": 2}}}}""")
    }
    // numeric distance_feature: 10/(10+|n-20|)
    val dfq = q("""{"query": {"distance_feature": {"field": "n",
      "origin": 20, "pivot": 10}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(dfq == Map(1L -> 0.5, 2L -> 1.0, 3L -> 0.5, 4L -> (10.0 / 30)))
    // pinned: curated order first, organic (window matches) after
    val pn = q("""{"query": {"pinned": {"ids": [3, 2],
      "organic": {"query_string": {"query": "text:window"}}}}}""")
      .select("doc_id").as[Long].collect().toSeq
    assert(pn == Seq(3L, 2L, 1L, 4L))
  }

  test("more_like_this: tf/df term selection, minimum_should_match " +
    "gate, occurrence-count scoring; doc references rejected") {
    def run(body: String): Map[Long, Double] =
      q(body).select("doc_id", "_score").as[(Long, Double)]
        .collect().toMap
    // like terms window/batch survive (df >= 1), 'zzz' drops (df 0);
    // integer msm 2 -> both must match: docs 1 (1+1) and 4 (1+2)
    assert(run("""{"query": {"more_like_this": {"fields": ["text"],
      "like": "window batch zzz", "min_term_freq": 1,
      "min_doc_freq": 1, "minimum_should_match": 2}}}""")
      == Map(1L -> 2.0, 4L -> 3.0))
    // ES default min_term_freq 2: single-occurrence like terms are
    // not selected -> empty match set
    assert(run("""{"query": {"more_like_this": {"fields": ["text"],
      "like": "window batch", "min_doc_freq": 1}}}""").isEmpty)
    // repeated like terms pass min_term_freq 2
    assert(run("""{"query": {"more_like_this": {"fields": ["text"],
      "like": "window window", "min_doc_freq": 1,
      "minimum_should_match": 1}}}""").keySet == Set(1L, 2L, 4L))
    // document references are rejected, not guessed at
    intercept[IllegalArgumentException] {
      q("""{"query": {"more_like_this": {"fields": ["text"],
        "like": [{"_index": "documents", "_id": "1"}]}}}""")
    }
  }

  test("gap filling: min_doc_count 0 + extended_bounds emit empty " +
    "buckets; min_doc_count >= 2 prunes; new metric/bucket aggs") {
    // histogram over n (10..40), extended to [-10, 60]: 8 buckets,
    // empties carry doc_count 0 and null metrics
    val gf = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 10,
        "min_doc_count": 0,
        "extended_bounds": {"min": -10, "max": 60}},
       "aggs": {"mx": {"max": {"field": "n"}}}}}, "size": 0}""")
      .collect()
    assert(gf.map(_.getAs[Double]("key")).toSeq ==
      (-1 to 6).map(_ * 10.0))
    assert(gf.map(_.getAs[Long]("doc_count")).toSeq ==
      Seq(0L, 0L, 1L, 1L, 1L, 1L, 0L, 0L))
    assert(gf.head.isNullAt(gf.head.fieldIndex("mx")))
    // extended_bounds without min_doc_count 0 is contradictory
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10,
          "extended_bounds": {"min": 0, "max": 50}}}}, "size": 0}""")
    }
    // min_doc_count 2 prunes buckets below the floor
    val p2 = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 20,
        "min_doc_count": 2}}}, "size": 0}""").collect()
    assert(p2.length == 1 && p2.head.getAs[Double]("key") == 20.0)
    // weighted_avg: (10·1 + 20·2 + 30·3 + 40·4) / 10 = 30
    val wa = q("""{"query": {"match_all": {}}, "aggs":
      {"wavg": {"weighted_avg": {"value": {"field": "n"},
        "weight": {"field": "doc_id"}}}}, "size": 0}""")
      .collect().head.getAs[Double]("wavg")
    assert(wa == 30.0)
    // percentile_ranks: share of n <= 20 is 50%
    val pr = q("""{"query": {"match_all": {}}, "aggs":
      {"pr": {"percentile_ranks": {"field": "n", "values": [20]}}},
      "size": 0}""").collect().head.getAs[Double]("pr_p20")
    assert(pr == 50.0)
    // multi_terms: composite keys, null key rows dropped
    val mt = q("""{"query": {"match_all": {}}, "aggs":
      {"m": {"multi_terms": {"terms": [{"field": "source"},
        {"field": "text"}]}}}, "size": 0}""").collect()
    assert(mt.length == 3 && mt.forall(_.getAs[Long]("doc_count") == 1L))
    // terms include/exclude: full-match regex or exact-value array
    // gates bucket keys before the top-N cut
    val inc = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source", "include": "src[13]"}}},
      "size": 0}""").collect().map(_.getString(0)).toSet
    assert(inc == Set("src1", "src3"))
    val exc = q("""{"query": {"match_all": {}}, "aggs":
      {"s": {"terms": {"field": "source",
        "exclude": ["src3"]}}}, "size": 0}""")
      .collect().map(_.getString(0)).toSet
    assert(exc == Set("src1"))
    // adjacency_matrix: singles + non-empty pairwise intersections
    val adj = q("""{"query": {"match_all": {}}, "aggs":
      {"adj": {"adjacency_matrix": {"filters": {
        "x": {"term": {"source": "src3"}},
        "y": {"range": {"n": {"gte": 20}}}}}}}, "size": 0}""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(adj == Map("x" -> 2L, "y" -> 3L, "x&y" -> 1L))
  }

  test("significant_text: JLH over distinct tokens per doc; term " +
    "suggester ranks vocabulary terms by (distance, frequency)") {
    // fg = src3 docs (1, 4): 'batch' 2/2 fg vs 2/4 bg -> 1.0;
    // 'run' 1/2 vs 1/4 -> 0.5; 'window' 2/2 vs 3/4 -> 1/3
    val sig = q("""{"query": {"term": {"source": "src3"}},
      "aggs": {"sig": {"significant_text": {"field": "text"}}},
      "size": 0}""").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Double]("score"))
    assert(sig.map(_._1).toSeq == Seq("batch", "run", "window"))
    assert(math.abs(sig.head._2 - 1.0) < 1e-12)
    // suggest-only body: 'windoq' -> window (1 edit); suggest_mode
    // missing stays silent for vocabulary tokens; alongside a query
    // it is refused
    val sug = q("""{"suggest": {"fix": {"text": "windoq",
      "term": {"field": "text"}}}}""")
      .select("suggestion", "distance").as[(String, Int)].collect().toSeq
    assert(sug.contains(("window", 1)))
    assert(q("""{"suggest": {"fix": {"text": "window",
      "term": {"field": "text"}}}}""").count() == 0)
    // always-mode suggests for misspelled tokens too (and never
    // returns the input term itself)
    val alw = q("""{"suggest": {"fix": {"text": "windoq",
      "term": {"field": "text", "suggest_mode": "always"}}}}""")
      .select("suggestion").as[String].collect().toSeq
    assert(alw.contains("window") && !alw.contains("windoq"))
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "suggest":
        {"s": {"text": "x", "term": {"field": "text"}}}}""")
    }
    // suggest_mode=popular: only candidates MORE FREQUENT than the
    // input token (0 when absent); sort=frequency puts the corpus
    // frequency first where the score sort puts edit distance first
    val pdf = Seq((1L, "spark sparc"), (2L, "spark"),
      (3L, "spark stark")).toDF("doc_id", "text")
    def tsug(body: String): Seq[String] =
      EsDsl.search(pdf, mapper.readTree(body))
        .select("suggestion").as[String].collect().toSeq
    // 'sparc' is in the vocabulary at freq 1: spark (3) outranks it,
    // stark (1) does not exceed it
    assert(tsug("""{"suggest": {"fix": {"text": "sparc",
      "term": {"field": "text", "suggest_mode": "popular"}}}}""") ==
      Seq("spark"))
    assert(tsug("""{"suggest": {"fix": {"text": "sparc",
      "term": {"field": "text", "suggest_mode": "always"}}}}""")
      .toSet == Set("spark", "stark"))
    // score sort ranks stark (1 edit) first; frequency sort ranks
    // spark (freq 3, 2 edits) first
    assert(tsug("""{"suggest": {"fix": {"text": "star",
      "term": {"field": "text", "suggest_mode": "always"}}}}""") ==
      Seq("stark", "spark", "sparc"))
    assert(tsug("""{"suggest": {"fix": {"text": "star",
      "term": {"field": "text", "suggest_mode": "always",
      "sort": "frequency"}}}}""") == Seq("spark", "stark", "sparc"))
    // string_distance: the engine's one metric accepted under both
    // ES spellings; other metrics and stray term keys reject by name
    assert(tsug("""{"suggest": {"fix": {"text": "sparc",
      "term": {"field": "text", "suggest_mode": "popular",
      "string_distance": "internal"}}}}""") == Seq("spark"))
    for (body <- Seq(
      """{"suggest": {"fix": {"text": "sparc", "term":
        {"field": "text", "string_distance": "jaro_winkler"}}}}""",
      """{"suggest": {"fix": {"text": "sparc", "term":
        {"field": "text", "sort": "sideways"}}}}""",
      """{"suggest": {"fix": {"text": "sparc", "term":
        {"field": "text", "suggest_mode": "sometimes"}}}}""",
      """{"suggest": {"fix": {"text": "sparc", "term":
        {"field": "text", "prefix_length": 1}}}}"""))
      intercept[IllegalArgumentException] { tsug(body) }
    // suggest-level shared "text" (ES's global default): the named
    // entry inherits it; the completion suggester reads it as its
    // prefix; a per-entry text overrides the global
    assert(q("""{"suggest": {"text": "windoq",
      "fix": {"term": {"field": "text"}}}}""")
      .select("suggestion").as[String].collect().contains("window"))
    assert(q("""{"suggest": {"text": "windo",
      "ac": {"completion": {"field": "text"}}}}""")
      .as[(Long, String, Double)].collect().map(_._1).toSet ==
      Set(1L, 2L))
    assert(q("""{"suggest": {"text": "zzzzz",
      "fix": {"text": "windoq", "term": {"field": "text"}}}}""")
      .select("suggestion").as[String].collect().contains("window"))
    // text alone is not a suggester
    intercept[IllegalArgumentException] {
      q("""{"suggest": {"text": "windoq"}}""")
    }
  }

  test("phrase suggester: single-token corrections ranked by the " +
    "bigram stupid-backoff LM; knobs fail loud") {
    // corpus: u(window)=3 u(batch)=3 u(run)=u(only)=u(nothing)=
    // u(here)=1, N=10, V=6; bigrams (window,batch) (batch,run)
    // (window,only) (nothing,here) (batch,batch) (batch,window) ×1
    val s1 = q("""{"suggest": {"fix": {"text": "windoq batch",
      "phrase": {"field": "text"}}}}""")
      .select("suggestion", "score").as[(String, Double)].collect().toSeq
    assert(s1.map(_._1) == Seq("window batch"), s1)
    // log10(4/16) + log10(1/3)
    assert(math.abs(s1.head._2 -
      (math.log10(0.25) + math.log10(1.0 / 3.0))) < 1e-12)
    // backoff: (only, window) is not a corpus bigram ->
    // log10((1+1)/16) + log10(0.4*(3+1)/16)
    val s2 = q("""{"suggest": {"fix": {"text": "only windoq",
      "phrase": {"field": "text"}}}}""")
      .select("suggestion", "score").as[(String, Double)].collect().toSeq
    assert(s2.map(_._1) == Seq("only window"), s2)
    assert(math.abs(s2.head._2 -
      (math.log10(2.0 / 16.0) + math.log10(0.1))) < 1e-12)
    // multi-error budgets and unknown knobs reject by name
    intercept[IllegalArgumentException] {
      q("""{"suggest": {"fix": {"text": "windoq batch",
        "phrase": {"field": "text", "max_errors": 2}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"suggest": {"fix": {"text": "windoq",
        "phrase": {"field": "text", "gram_size": 3}}}}""")
    }
  }

  test("completion suggester: whole-value prefix autocomplete — " +
    "case-folded prefix, weightless score 1.0, surface-form then id " +
    "order, skip_duplicates collapses repeated values, FUZZY " +
    "prefixes within the edit budget (AUTO on the prefix, min_length " +
    "gate, exact head, transpositions knob), REGEX form anchored at " +
    "the input's start; stray keys reject by name") {
    import spark.implicits._
    val df = Seq(
      (1L, "Window functions"),
      (2L, "window functions"), // the same value, case-varied
      (3L, "window aggregate"),
      (4L, "windmill"),
      (7L, "windmill"),         // exact duplicate value
      (5L, "batch jobs"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    def sugg(body: String) =
      EsDsl.search(df, mapper.readTree(body))
        .as[(Long, String, Double)].collect().toSeq
    // case-folded prefix; all scores 1.0 (weightless inputs); rank =
    // surface form asc ('W' < 'm' < 'o' in ASCII), id breaks the tie
    // between the two windmills
    assert(sugg("""{"suggest": {"ac": {"prefix": "Wind",
        "completion": {"field": "text", "size": 10}}}}""") == Seq(
      (1L, "Window functions", 1.0),
      (4L, "windmill", 1.0),
      (7L, "windmill", 1.0),
      (3L, "window aggregate", 1.0),
      (2L, "window functions", 1.0)))
    // size caps the options after the rank
    assert(sugg("""{"suggest": {"ac": {"prefix": "wind",
        "completion": {"field": "text", "size": 2}}}}""").map(_._1) ==
      Seq(1L, 4L))
    // skip_duplicates keeps ONE option per distinct value (lowest id)
    assert(sugg("""{"suggest": {"ac": {"prefix": "windmill",
        "completion": {"field": "text",
        "skip_duplicates": true}}}}""") == Seq((4L, "windmill", 1.0)))
    // no match is an empty options table, not an error
    assert(sugg("""{"suggest": {"ac": {"prefix": "zzz",
        "completion": {"field": "text"}}}}""").isEmpty)
    // FUZZY: "wimd" is one substitution from the inputs' "wind"
    // prefix — fuzziness 1 (and the AUTO ladder via "fuzzy": true,
    // which gives 1 at length 4) reaches every wind* value; the
    // first character stays exact (ES prefix_length default 1)
    val windIds = Set(1L, 2L, 3L, 4L, 7L)
    assert(sugg("""{"suggest": {"ac": {"prefix": "wimd",
        "completion": {"field": "text", "size": 10,
        "fuzzy": {"fuzziness": 1}}}}}""").map(_._1).toSet == windIds)
    assert(sugg("""{"suggest": {"ac": {"prefix": "wimd",
        "completion": {"field": "text", "size": 10,
        "fuzzy": true}}}}""").map(_._1).toSet == windIds)
    // min_length gates fuzziness off for short prefixes: "xa" (2 <
    // default 3) stays exact and matches nothing, even though "ba"
    // is one edit away; with min_length 0 and a free head it reaches
    // "batch jobs"
    assert(sugg("""{"suggest": {"ac": {"prefix": "xa",
        "completion": {"field": "text",
        "fuzzy": {"fuzziness": 1}}}}}""").isEmpty)
    assert(sugg("""{"suggest": {"ac": {"prefix": "xa",
        "completion": {"field": "text", "fuzzy": {"fuzziness": 1,
        "min_length": 0, "prefix_length": 0}}}}}""")
      .map(_._1).toSet == Set(5L))
    // transpositions: the interior swap "wnid" ~ "wind" is ONE
    // Damerau edit (default) but TWO plain-Levenshtein edits
    assert(sugg("""{"suggest": {"ac": {"prefix": "wnidmill",
        "completion": {"field": "text",
        "fuzzy": {"fuzziness": 1}}}}}""").map(_._1).toSet ==
      Set(4L, 7L))
    assert(sugg("""{"suggest": {"ac": {"prefix": "wnidmill",
        "completion": {"field": "text", "fuzzy": {"fuzziness": 1,
        "transpositions": false}}}}}""").isEmpty)
    // prefix_length past the whole edit band (valid in ES): the exact
    // head subsumes the budget — degrades to plain prefix matching
    // instead of crashing on an empty candidate-length band
    assert(sugg("""{"suggest": {"ac": {"prefix": "wind",
        "completion": {"field": "text", "size": 10, "fuzzy":
        {"fuzziness": 1, "prefix_length": 9}}}}}""").map(_._1).toSet ==
      windIds)
    assert(sugg("""{"suggest": {"ac": {"prefix": "wimd",
        "completion": {"field": "text", "fuzzy":
        {"fuzziness": 1, "prefix_length": 9}}}}}""").isEmpty)
    // REGEX completion (round 16 — ES's third input form): the
    // pattern matches from the START of the case-folded input with an
    // open end (any continuation completes); "windm?ill" has an
    // optional char, "w.*gg" needs the literal tail INSIDE the value
    assert(sugg("""{"suggest": {"ac": {"regex": "windm.l+",
        "completion": {"field": "text", "size": 10}}}}""")
      .map(_._1).toSet == Set(4L, 7L))
    assert(sugg("""{"suggest": {"ac": {"regex": "window (f|a)",
        "completion": {"field": "text", "size": 10}}}}""")
      .map(_._1).toSet == Set(1L, 2L, 3L))
    assert(sugg("""{"suggest": {"ac": {"regex": "zzz.*",
        "completion": {"field": "text"}}}}""").isEmpty)
    // ... with skip_duplicates and size riding unchanged
    assert(sugg("""{"suggest": {"ac": {"regex": "windmill",
        "completion": {"field": "text",
        "skip_duplicates": true}}}}""") == Seq((4L, "windmill", 1.0)))
    // CATEGORY contexts: a context name is a sibling column; names
    // intersect, values union, object entries carry "context" only
    val cdf = Seq(
      (1L, "window functions", "en", "docs"),
      (2L, "window aggregate", "fr", "docs"),
      (3L, "windmill", "en", "blog"),
      (4L, "batch", "en", "docs"))
      .toDF("doc_id", "text", "lang", "source")
    def csugg(ctx: String): Set[Long] =
      EsDsl.search(cdf, mapper.readTree(
        s"""{"suggest": {"ac": {"prefix": "wind", "completion":
          {"field": "text", "size": 10, "contexts": $ctx}}}}"""))
        .as[(Long, String, Double)].collect().map(_._1).toSet
    assert(csugg("""{"lang": ["en"]}""") == Set(1L, 3L))
    assert(csugg("""{"lang": ["en", "fr"]}""") == Set(1L, 2L, 3L))
    assert(csugg("""{"lang": ["en"], "source": ["docs"]}""") ==
      Set(1L))
    assert(csugg("""{"lang": [{"context": "fr"}]}""") == Set(2L))
    // BOOSTED entries (round 16): the matched boost multiplies the
    // weightless 1.0; several matching contexts take the MAX (ES's
    // multi-context scoring) — here the doc matches lang=en (boost 3)
    // and source=docs (boost 2), so it scores 3.0 and en outranks fr
    val boosted = EsDsl.search(cdf, mapper.readTree(
      """{"suggest": {"ac": {"prefix": "wind", "completion":
        {"field": "text", "size": 10, "contexts":
        {"lang": [{"context": "en", "boost": 3}, "fr"],
         "source": [{"context": "docs", "boost": 2},
                    {"context": "blog"}]}}}}}"""))
      .as[(Long, String, Double)].collect().toSeq
    assert(boosted.map(r => r._1 -> r._3).toMap ==
      Map(1L -> 3.0, 2L -> 2.0, 3L -> 3.0), boosted.toString)
    assert(boosted.head._3 == 3.0, "score must lead the rank")
    for (ctx <- Seq(
        """{"lang": [{"context": "fr", "boost": 0}]}""",
        """{"lang": [{"context": "fr", "boost": "x"}]}""",
        """{"lang": [{"context": "fr", "precision": 2}]}""",
        """{"nope": ["x"]}""", """{"lang": []}""", """{}"""))
      intercept[IllegalArgumentException] { csugg(ctx) }
    // knobs this engine does not model reject BY NAME
    for (body <- Seq(
      """{"suggest": {"ac": {"prefix": "w", "completion":
        {"field": "text", "fuzzy": {"zeal": 1}}}}}""",
      """{"suggest": {"ac": {"prefix": "w", "completion":
        {"field": "text", "fuzzy": {"unicode_aware": true}}}}}""",
      """{"suggest": {"ac": {"prefix": "w", "completion":
        {"field": "text", "fuzzy": {"fuzziness": "3"}}}}}""",
      """{"suggest": {"ac": {"regex": "w.*", "prefix": "w",
        "completion": {"field": "text"}}}}""",
      """{"suggest": {"ac": {"regex": "w.*", "completion":
        {"field": "text", "fuzzy": {"fuzziness": 1}}}}}""",
      """{"suggest": {"ac": {"regex": "", "completion":
        {"field": "text"}}}}""",
      """{"suggest": {"ac": {"regex": "a~b", "completion":
        {"field": "text"}}}}""",
      """{"suggest": {"ac": {"regex": "(", "completion":
        {"field": "text"}}}}""",
      """{"suggest": {"ac": {"regex": {"value": "w.*"}, "completion":
        {"field": "text"}}}}""",
      """{"suggest": {"ac": {"prefix": "", "completion":
        {"field": "text"}}}}""",
      """{"suggest": {"ac": {"prefix": "w", "completion":
        {"field": "text", "size": 0}}}}""",
      """{"suggest": {"ac": {"prefix": "w", "completion":
        {"field": "text", "skip_duplicates": "yes"}}}}""",
      """{"suggest": {"ac": {"prefix": "w",
        "completion": {"field": "text"},
        "term": {"field": "text"}}}}"""))
      intercept[IllegalArgumentException] { sugg(body) }
  }

  test("approximate-sketch knobs: cardinality precision_threshold " +
    "opts into the HLL sketch at ES's register budget (error-" +
    "bounded); percentiles AND boxplot tdigest opt into the " +
    "mergeable quantile sketch (rank-error-bounded, boxplot min/max " +
    "stay exact); percentile_ranks tdigest validates then answers " +
    "exactly; a tdigest sibling feeds moving_percentiles; without " +
    "the knobs all stay EXACT (the oracle tier); bad knob values " +
    "reject by name") {
    val df = spark.range(20000L).select(
      col("id").as("doc_id"),
      (col("id") % 17000L).as("v"),
      (col("id") % 2500L).as("w"),
      col("id").cast("double").as("x"))
    def one(body: String) =
      EsDsl.search(df, mapper.readTree(body)).collect().head
    // ES's threshold -> precision mapping, reused as lgConfigK
    assert(EsDsl.lgkFromThreshold(3000) == 14)
    assert(EsDsl.lgkFromThreshold(1) == 4)
    assert(EsDsl.lgkFromThreshold(40000) == 18)
    // exact default — bit-exact distinct count, the oracle tier
    assert(one("""{"query": {"match_all": {}}, "aggs": {"u": {"cardinality": {"field": "v"}}},
      "size": 0}""").getAs[Long]("u") == 17000L)
    // knobbed: threshold 3000 -> lgK 14 -> relative standard error
    // 1.04/sqrt(2^14) ~ 0.81%; assert inside +-3 sigma
    val est = one("""{"query": {"match_all": {}}, "aggs": {"u": {"cardinality": {"field": "v",
      "precision_threshold": 3000}}}, "size": 0}""")
      .getAs[Long]("u").toDouble
    assert(math.abs(est - 17000.0) / 17000.0 < 0.025,
      s"HLL estimate $est out of the 3-sigma band")
    // below the threshold: ES promises "almost exact" (its HLL++
    // linear-counting regime); DataSketches' estimator lands within
    // well under 1% there — pin that band (measured 2491/2500)
    val low = one("""{"query": {"match_all": {}}, "aggs": {"u": {"cardinality": {"field": "w",
      "precision_threshold": 3000}}}, "size": 0}""")
      .getAs[Long]("u").toDouble
    assert(math.abs(low - 2500.0) / 2500.0 < 0.01,
      s"below-threshold estimate $low outside the almost-exact band")
    // percentiles: exact interpolation by default
    assert(one("""{"query": {"match_all": {}}, "aggs": {"q": {"percentiles": {"field": "x",
      "percents": [50]}}}, "size": 0}""").getAs[Double]("q_p50")
      == 9999.5)
    // tdigest opts into the quantile sketch: compression 100 ->
    // accuracy 10000 -> rank error <= 1e-4 -> within a couple of
    // ranks on 20k uniform values (generous 20-value slack)
    val ap = one("""{"query": {"match_all": {}}, "aggs": {"q": {"percentiles": {"field": "x",
      "percents": [50], "tdigest": {"compression": 100}}}},
      "size": 0}""").getAs[Double]("q_p50")
    assert(math.abs(ap - 9999.5) <= 20.0,
      s"approx p50 $ap outside the rank-error band")
    // boxplot tdigest (round 16): the QUARTILES ride the same sketch
    // at the same accuracy (rank error <= 1/accuracy); min/max stay
    // exact like ES's
    val bxe = one("""{"query": {"match_all": {}}, "aggs": {"b": {"boxplot": {"field": "x"}}},
      "size": 0}""")
    assert(bxe.getAs[Double]("b_q2") == 9999.5 &&
      bxe.getAs[Double]("b_min") == 0.0 &&
      bxe.getAs[Double]("b_max") == 19999.0)
    val bxa = one("""{"query": {"match_all": {}}, "aggs": {"b": {"boxplot": {"field": "x",
      "tdigest": {"compression": 100}}}}, "size": 0}""")
    assert(math.abs(bxa.getAs[Double]("b_q2") - 9999.5) <= 20.0 &&
      math.abs(bxa.getAs[Double]("b_q1") - 4999.75) <= 20.0 &&
      math.abs(bxa.getAs[Double]("b_q3") - 14999.25) <= 20.0,
      s"approx quartiles outside the rank-error band: $bxa")
    assert(bxa.getAs[Double]("b_min") == 0.0 &&
      bxa.getAs[Double]("b_max") == 19999.0,
      "boxplot min/max must stay exact under tdigest")
    // percentile_ranks tdigest (round 16): VALIDATED then answered
    // exactly — the exact rank is already a constant-memory streaming
    // aggregate, so the sketch trade buys nothing; exact trivially
    // meets the rank-error bound (documented at the metric)
    val pre = one("""{"query": {"match_all": {}}, "aggs": {"r": {"percentile_ranks": {"field": "x",
      "values": [9999.5]}}}, "size": 0}""").getAs[Double]("r_p9999_5")
    val pra = one("""{"query": {"match_all": {}}, "aggs": {"r": {"percentile_ranks": {"field": "x",
      "values": [9999.5], "tdigest": {"compression": 100}}}},
      "size": 0}""").getAs[Double]("r_p9999_5")
    assert(pra == pre, s"knobbed ranks must equal exact: $pra vs $pre")
    // moving_percentiles over a tdigest-knobbed SIBLING percentiles
    // (where ES's approximation actually rides): accepted — the
    // sibling's columns go approximate, the moving recompute stays
    // the exact tier
    val mp = EsDsl.search(df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "timestampadd(SECOND, CAST(doc_id AS INT), " +
          "timestamp'2024-01-01')")),
      mapper.readTree("""{"query": {"match_all": {}}, "aggs": {"h":
        {"date_histogram": {"field": "ts", "fixed_interval": "1h"},
         "aggs": {"q": {"percentiles": {"field": "x",
           "percents": [50], "tdigest": {"compression": 100}}},
          "mq": {"moving_percentiles": {"buckets_path": "q",
            "window": 2}}}}}, "size": 0}"""))
      .collect()
    assert(mp.length > 2 && mp.drop(1).forall(r =>
      !r.isNullAt(r.fieldIndex("mq_p50"))),
      "sibling-tdigest moving_percentiles must run")
    // knob validation — all reject by name, never silently degrade
    for (body <- Seq(
      """{"query": {"match_all": {}}, "aggs": {"u": {"cardinality": {"field": "v",
        "precision_threshold": 40001}}}, "size": 0}""",
      """{"query": {"match_all": {}}, "aggs": {"u": {"cardinality": {"field": "v",
        "precision_threshold": -1}}}, "size": 0}""",
      """{"query": {"match_all": {}}, "aggs": {"q": {"percentiles": {"field": "x",
        "tdigest": {"compression": 5}}}}, "size": 0}""",
      """{"query": {"match_all": {}}, "aggs": {"q": {"percentiles": {"field": "x",
        "tdigest": {"zeal": 1}}}}, "size": 0}""",
      """{"query": {"match_all": {}}, "aggs": {"b": {"boxplot": {"field": "x",
        "tdigest": {"compression": 10001}}}}, "size": 0}""",
      """{"query": {"match_all": {}}, "aggs": {"r": {"percentile_ranks": {"field": "x",
        "values": [1], "tdigest": {"zeal": 1}}}}, "size": 0}""",
      """{"query": {"match_all": {}}, "aggs": {"q": {"percentiles": {"field": "x",
        "hdr": {"number_of_significant_value_digits": 3}}}},
        "size": 0}"""))
      intercept[IllegalArgumentException] { one(body) }
  }

  test("rescore recombines the top primary window only; terms_set " +
    "matches against a per-document threshold field") {
    // primary: 'window' count (docs 1, 2, 4 all score 1); window_size
    // 2 keeps docs 1, 2 (doc_id tiebreak) — doc 4 never rescores.
    // combined = 1·primary + 10·phraseBM25("window batch") → doc 1
    // first (df window/batch = 3/2, pf=1, dl=3)
    val rs = q("""{"query": {"query_string": {"query": "text:window"}},
      "rescore": {"window_size": 2, "query": {
        "rescore_query": {"match_phrase": {"text": "window batch"}},
        "query_weight": 1, "rescore_query_weight": 10}},
      "size": 2}""").select("doc_id", "_score").as[(Long, Double)]
      .collect().toSeq
    val exp1 = 1.0 * 1.0 + 10.0 * phb(Seq(3L, 2L), 1, 3)
    assert(rs == Seq((1L, exp1), (2L, 1.0)), s"rescore: $rs")
    // guards: sort/collapse/search_after, and pages past the window
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "sort": [{"n": {"order": "asc"}}],
        "rescore": {"window_size": 5, "query":
          {"rescore_query": {"term": {"source": "src3"}}}}}""")
    }
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "size": 10,
        "rescore": {"window_size": 5, "query":
          {"rescore_query": {"term": {"source": "src3"}}}}}""")
    }
    // terms_set: required count = n/10 per doc — only doc 1 (3 of 3
    // terms, needs 1) passes; scores are matching-term counts
    val ts = EsDsl.search(
      docs.withColumn("req", (col("n") / 10).cast("int")),
      mapper.readTree("""{"query": {"terms_set": {"text": {
        "terms": ["window", "batch", "run"],
        "minimum_should_match_field": "req"}}}}"""))
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(ts == Map(1L -> 3.0))
    intercept[IllegalArgumentException] {
      q("""{"query": {"terms_set": {"text": {"terms": ["a"],
        "minimum_should_match_script": {"source": "params.x"}}}}}""")
    }
  }

  test("nested query: the WHOLE inner query must hold on ONE array " +
    "element — not across elements; null/empty arrays never match") {
    val nest = spark.sql(
      """SELECT * FROM VALUES
        | (1, array(named_struct('color', 'red', 'n', 1),
        |           named_struct('color', 'blue', 'n', 2))),
        | (2, array(named_struct('color', 'red', 'n', 5))),
        | (3, CAST(array() AS ARRAY<STRUCT<color: STRING, n: INT>>)),
        | (4, CAST(NULL AS ARRAY<STRUCT<color: STRING, n: INT>>))
        | AS t(id, labels)""".stripMargin)
    def run(body: String): Map[Int, Double] =
      EsDsl.search(nest, mapper.readTree(body))
        .select("id", "_score").as[(Int, Double)].collect().toMap
    // term on one element field; score_mode sum counts matches
    assert(run("""{"query": {"nested": {"path": "labels",
      "score_mode": "sum",
      "query": {"term": {"labels.color": "red"}}}}}""")
      == Map(1 -> 1.0, 2 -> 1.0))
    // THE nested semantics: color=red AND n>=2 on the SAME element —
    // doc 1 has red(n=1) and blue(n=2) but no single element with
    // both, doc 2's red(n=5) qualifies
    assert(run("""{"query": {"nested": {"path": "labels",
      "query": {"bool": {"must": [
        {"term": {"labels.color": "red"}},
        {"range": {"labels.n": {"gte": 2}}}]}}}}}""")
      == Map(2 -> 1.0)) // default score_mode avg: 1.0 on match
    // nested AGGREGATION: buckets over elements (doc_count counts
    // nested docs), ES's convention
    val na = EsDsl.search(nest, mapper.readTree(
      """{"query": {"match_all": {}}, "aggs":
        {"l": {"nested": {"path": "labels"},
         "aggs": {"c": {"terms": {"field": "labels.color"}}}}},
        "size": 0}""")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(na == Map("red" -> 2L, "blue" -> 1L))
    // inner_hits: the MATCHING elements ride the hit as an
    // `inner_hits_<name>` array column, in element order (ES's
    // score-desc order degenerates to index order for constant-score
    // inner queries), capped at `size`
    val ih = EsDsl.search(nest, mapper.readTree(
      """{"query": {"nested": {"path": "labels", "score_mode": "sum",
        |  "query": {"term": {"labels.color": "red"}},
        |  "inner_hits": {"size": 1}}}}""".stripMargin))
      .selectExpr("id", "inner_hits_labels[0].color",
        "size(inner_hits_labels)")
      .as[(Int, String, Int)].collect().toSeq
      .map { case (k, c, s) => k -> ((c, s)) }.toMap
    assert(ih.keySet == Set(1, 2) &&
      ih.values.toSeq.distinct == Seq(("red", 1)), ih)
    // a custom name renames the column; survives _source subsetting
    val named = EsDsl.search(nest, mapper.readTree(
      """{"query": {"nested": {"path": "labels",
        |  "query": {"term": {"labels.color": "blue"}},
        |  "inner_hits": {"name": "blues"}}}, "_source": ["id"]}"""
        .stripMargin))
    assert(named.columns.toSeq ==
      Seq("id", "_score", "inner_hits_blues"), named.columns.toSeq)
    assert(named.selectExpr("inner_hits_blues[0].n")
      .as[Int].collect().toSeq == Seq(2))
    // errors: flat/unknown path, field outside the path, scored
    // clauses inside nested, unknown inner_hits knob
    for (body <- Seq(
        """{"query": {"nested": {"path": "id",
           "query": {"match_all": {}}}}}""",
        """{"query": {"nested": {"path": "nope",
           "query": {"match_all": {}}}}}""",
        """{"query": {"nested": {"path": "labels",
           "query": {"term": {"color": "red"}}}}}""",
        """{"query": {"nested": {"path": "labels",
           "query": {"match": {"labels.color": "red"}}}}}""",
        """{"query": {"nested": {"path": "labels",
           "query": {"match_all": {}},
           "inner_hits": {"from": 2}}}}"""))
      intercept[IllegalArgumentException] {
        EsDsl.search(nest, mapper.readTree(body))
      }
  }

  test("match_bool_prefix: leading terms exact, last term prefix, " +
    "independent bool clauses (no adjacency)") {
    def hits(body: String): Map[Long, Double] =
      q(body).select("doc_id", "_score").as[(Long, Double)]
        .collect().toMap
    // 'batch' exact + 'win' prefix, operator or
    assert(hits("""{"query": {"match_bool_prefix":
      {"text": "batch win"}}}""")
      == Map(1L -> 2.0, 2L -> 1.0, 4L -> 3.0))
    // operator and: every clause must match
    assert(hits("""{"query": {"match_bool_prefix":
      {"text": {"query": "batch win", "operator": "and"}}}}""").keySet
      == Set(1L, 4L))
    // unlike match_phrase_prefix, order/adjacency is irrelevant:
    // "run window" never appears adjacent but both clauses match doc 1
    assert(hits("""{"query": {"match_bool_prefix":
      {"text": {"query": "run windo", "operator": "and"}}}}""").keySet
      == Set(1L))
  }

  test("moving_fn: sliding window over preceding buckets (shift " +
    "moves it right); sibling *_bucket aggs reduce the bucket table") {
    // histogram interval 10 -> buckets 10/20/30/40, one doc each
    val mv = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 10},
       "aggs": {"mov": {"moving_fn": {"buckets_path": "_count",
         "window": 2, "script": "MovingFunctions.sum(values)"}}}}},
      "size": 0}""").collect()
    assert(mv.head.isNullAt(mv.head.fieldIndex("mov"))) // empty window
    assert(mv.tail.map(_.getAs[Long]("mov")).toSeq == Seq(1L, 2L, 2L))
    // shift 1 slides the window to include the current bucket
    val mvs = q("""{"query": {"match_all": {}}, "aggs":
      {"h": {"histogram": {"field": "n", "interval": 10},
       "aggs": {"mov": {"moving_fn": {"buckets_path": "_count",
         "window": 2, "shift": 1,
         "script": "MovingFunctions.unweightedAvg(values)"}}}}},
      "size": 0}""").collect()
    assert(mvs.map(_.getAs[Double]("mov")).toSeq == Seq(1.0, 1.0, 1.0, 1.0))
    // a custom script is rejected by name, never guessed at
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs":
        {"h": {"histogram": {"field": "n", "interval": 10},
         "aggs": {"m": {"moving_fn": {"buckets_path": "_count",
           "window": 2, "script": "values[0] * 2"}}}}}, "size": 0}""")
    }
    // siblings: avg/max over the histogram's bucket counts appear as
    // constant columns beside the buckets (ES returns both at once)
    val sib = q("""{"query": {"match_all": {}}, "aggs": {
      "h": {"histogram": {"field": "n", "interval": 20}},
      "avg_n": {"avg_bucket": {"buckets_path": "h>_count"}},
      "max_n": {"max_bucket": {"buckets_path": "h>_count"}}},
      "size": 0}""").collect()
    assert(sib.length == 3) // buckets 0, 20, 40 with counts 1, 2, 1
    assert(sib.forall(r => math.abs(r.getAs[Double]("avg_n") -
      4.0 / 3.0) < 1e-12))
    assert(sib.forall(_.getAs[Long]("max_n") == 2L))
    // a path that names the wrong bucket agg is the caller's error
    intercept[IllegalArgumentException] {
      q("""{"query": {"match_all": {}}, "aggs": {
        "h": {"histogram": {"field": "n", "interval": 20}},
        "a": {"avg_bucket": {"buckets_path": "nope>_count"}}},
        "size": 0}""")
    }
  }

  test("significant_terms scores fg-vs-bg over-representation (JLH); " +
    "filter agg buckets a sub-set; global escapes the query context") {
    // fg = docs matching 'batch' (1, 4); src3 is 2/2 in fg vs 2/4 in
    // bg -> JLH (1 - 0.5) * (1 / 0.5) = 1.0; src1 absent from fg
    val sig = q("""{"query": {"query_string": {"query": "text:batch"}},
      "aggs": {"s": {"significant_terms": {"field": "source"}}},
      "size": 0}""").collect()
    assert(sig.length == 1)
    assert(sig.head.getAs[String]("key") == "src3")
    assert(sig.head.getAs[Long]("doc_count") == 2L)
    assert(sig.head.getAs[Long]("bg_count") == 2L)
    assert(math.abs(sig.head.getAs[Double]("score") - 1.0) < 1e-12)
    // filter agg: one bucket row, metrics over the filtered sub-set
    // of the query's match set
    val fl = q("""{"query": {"match_all": {}}, "aggs":
      {"f": {"filter": {"term": {"source": "src3"}},
       "aggs": {"mx": {"max": {"field": "n"}}}}}, "size": 0}""")
      .collect().head
    assert(fl.getAs[Long]("doc_count") == 2L && fl.getAs[Long]("mx") == 40L)
    // a match clause inside the filter agg is FILTER CONTEXT (round
    // 10): its row-level predicate buckets, no score join needed —
    // the clause works instead of 400ing
    val fm = q("""{"query": {"match_all": {}}, "aggs":
      {"f": {"filter": {"match": {"text": "window"}}}}, "size": 0}""")
      .collect().head
    assert(fm.getAs[Long]("doc_count") == 3L) // docs 1, 2, 4
    // global: the whole index, regardless of the query
    val gl = q("""{"query": {"term": {"source": "src1"}}, "aggs":
      {"g": {"global": {}, "aggs": {"mx": {"max": {"field": "n"}}}}},
      "size": 0}""").collect().head
    assert(gl.getAs[Long]("doc_count") == 4L && gl.getAs[Long]("mx") == 40L)
  }

  test("function_score: field_value_factor and filtered weights " +
    "combine under score_mode/boost_mode; min_score and max_boost") {
    def scores(body: String): Map[Long, Double] =
      q(body).select("doc_id", "_score").as[(Long, Double)]
        .collect().toMap
    // multiply (defaults): match_all score 1 × factor·n
    assert(scores("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"field_value_factor":
        {"field": "n", "factor": 2}}]}}}""")
      == Map(1L -> 20.0, 2L -> 40.0, 3L -> 60.0, 4L -> 80.0))
    // score_mode sum; the filter gates the weight (null source is
    // null-safe — doc 3 gets no weight)
    assert(scores("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [
        {"filter": {"term": {"source": "src3"}}, "weight": 10},
        {"field_value_factor": {"field": "n"}}],
      "score_mode": "sum"}}}""")
      == Map(1L -> 20.0, 2L -> 20.0, 3L -> 30.0, 4L -> 50.0))
    // max_boost caps the combined function value; boost_mode replace
    // discards the query score; min_score filters the final score
    assert(scores("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"field_value_factor": {"field": "n"}}],
      "max_boost": 25, "boost_mode": "replace"}}}""")
      == Map(1L -> 10.0, 2L -> 20.0, 3L -> 25.0, 4L -> 25.0))
    assert(scores("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"field_value_factor": {"field": "n"}}],
      "boost_mode": "replace", "min_score": 25}}}""").keySet
      == Set(3L, 4L))
    // no matching function -> factor 1 (ES); nondeterministic and
    // script functions are rejected by name
    assert(scores("""{"query": {"function_score": {
      "query": {"match_all": {}},
      "functions": [{"filter": {"term": {"source": "nope"}},
        "weight": 9}], "boost_mode": "replace"}}}""")
      .values.toSet == Set(1.0))
    intercept[IllegalArgumentException] {
      q("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"random_score": {}}]}}}""")
    }
  }

  test("query_string: field scoping, classic occur resolution, " +
    "modifiers, wildcard/prefix, boost, range, exists") {
    def ids(body: String): Seq[Long] =
      q(body).select("doc_id").as[Long].collect().toSeq
    // field-scoped AND: text has window AND source is src3
    assert(ids("""{"query": {"query_string":
      {"query": "text:window AND source:src3"}}}""") == Seq(1L, 4L))
    // '-' prohibits; default fields = every string column
    assert(ids("""{"query": {"query_string":
      {"query": "window -batch"}}}""") == Seq(2L))
    // default_operator=and joins bare terms as MUST
    assert(ids("""{"query": {"query_string":
      {"query": "window batch", "default_operator": "and"}}}""")
      == Seq(4L, 1L) || ids("""{"query": {"query_string":
      {"query": "window batch", "default_operator": "and"}}}""")
      .toSet == Set(1L, 4L))
    // wildcard and prefix atoms are token-level
    assert(ids("""{"query": {"query_string":
      {"query": "text:w?ndow"}}}""").toSet == Set(1L, 2L, 4L))
    assert(ids("""{"query": {"query_string":
      {"query": "text:bat*"}}}""").toSet == Set(1L, 4L))
    // range + exists compose; range scores a constant 1
    val r = q("""{"query": {"query_string":
      {"query": "n:[20 TO 40] AND _exists_:source"}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(r == Map(2L -> 2.0, 4L -> 2.0))
    // boost multiplies the occurrence-count score
    val b = q("""{"query": {"query_string":
      {"query": "text:batch^3"}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(b == Map(1L -> 3.0, 4L -> 6.0))
    // fields option with per-field boost; default_field narrows
    val f = q("""{"query": {"query_string":
      {"query": "src3", "fields": ["source^2"]}}}""")
      .select("doc_id", "_score").as[(Long, Double)].collect().toMap
    assert(f == Map(1L -> 2.0, 4L -> 2.0))
    assert(ids("""{"query": {"query_string":
      {"query": "src3", "default_field": "text"}}}""").isEmpty)
    // strictness: syntax errors and unknown fields are the caller's
    // error; fields+default_field together are contradictory
    for (body <- Seq(
        """{"query": {"query_string": {"query": "(a"}}}""",
        """{"query": {"query_string": {"query": "a AND"}}}""",
        """{"query": {"query_string": {"query": "nope:x"}}}""",
        """{"query": {"query_string": {"query": "x",
           "fields": ["text"], "default_field": "text"}}}"""))
      intercept[IllegalArgumentException] { q(body).collect() }
  }

  test("simple and stop query analyzers (round 17): letter-run " +
    "lowercase tokenization, stop drops the classic english set " +
    "and consumes positions; analyzer rides query_string/" +
    "simple_query_string term atoms and the term suggester; " +
    "syntax-bound atoms reject the combination by name") {
    import spark.implicits._
    val d = docs
    def ids(body: String) =
      EsDsl.search(d, mapper.readTree(body))
        .select("doc_id").as[Long].collect().toSet
    // simple splits at the digit where standard keeps one token
    assert(ids("""{"query": {"match": {"text": {
      "query": "Batch7Window", "analyzer": "simple"}}}}""") ==
      ids("""{"query": {"match": {"text": "batch window"}}}"""))
    assert(ids("""{"query": {"match": {"text": {
      "query": "batch7window", "analyzer": "standard"}}}}""").isEmpty)
    // stop = simple + the classic english stop set
    assert(ids("""{"query": {"match": {"text": {
      "query": "The Window And The Batch",
      "analyzer": "stop"}}}}""") ==
      ids("""{"query": {"match": {"text": "window batch"}}}"""))
    // an all-stopword stop-analyzed query: zero terms — none, or
    // match_all under zero_terms_query "all"
    assert(ids("""{"query": {"match": {"text": {"query": "the and",
      "analyzer": "stop"}}}}""").isEmpty)
    assert(ids("""{"query": {"match": {"text": {"query": "the and",
      "analyzer": "stop", "zero_terms_query": "all"}}}}""").size == 4)
    // stop phrase carries the consumed position as a gap:
    // (batch@0, window@2) matches doc 4's batch batch window
    assert(ids("""{"query": {"match_phrase": {"text": {
      "query": "batch the window", "analyzer": "stop"}}}}""") ==
      Set(4L))
    assert(ids("""{"query": {"match_phrase": {"text": {
      "query": "batch the window",
      "analyzer": "standard"}}}}""").isEmpty)
    // query_string / simple_query_string: term atoms analyze with
    // the knob (german batches -> batch)
    assert(ids("""{"query": {"query_string": {"query": "batches",
      "default_field": "text", "analyzer": "german"}}}""") ==
      Set(1L, 4L))
    assert(ids("""{"query": {"simple_query_string": {
      "query": "windows + batches", "fields": ["text"],
      "analyzer": "english"}}}""") == Set(1L, 4L))
    // syntax-bound atoms (phrase/prefix/wildcard/fuzzy) reject the
    // analyzer combination by name
    for (body <- Seq(
        """{"query": {"query_string": {"query": "\"window batch\"",
           "default_field": "text", "analyzer": "german"}}}""",
        """{"query": {"query_string": {"query": "bat*",
           "default_field": "text", "analyzer": "english"}}}""",
        """{"query": {"query_string": {"query": "windoq~1",
           "default_field": "text", "analyzer": "english"}}}""",
        """{"query": {"simple_query_string": {"query": "\"a b\"",
           "fields": ["text"], "analyzer": "english"}}}""",
        """{"query": {"simple_query_string": {"query": "bat*",
           "fields": ["text"], "analyzer": "german"}}}"""))
      assert(intercept[IllegalArgumentException] {
        ids(body)
      }.getMessage.contains("analyzer"), body)
    // term suggester takes the knob: "the windoq" under stop drops
    // the stopword (no suggestions row for it) and corrects windoq
    val sug = EsDsl.suggest(d, mapper.readTree(
      """{"fix": {"text": "the windoq", "term": {"field": "text",
        |  "analyzer": "stop"}}}""".stripMargin))
      .select("token", "suggestion").as[(String, String)]
      .collect().toSeq
    assert(sug.map(_._1).toSet == Set("windoq"), sug.toString)
    assert(sug.exists(_._2 == "window"), sug.toString)
  }

  test("geo completion contexts (round 17; neighbours round 18): a " +
    "struct<lat,lon> context column gates options by the query " +
    "point's geohash cell PLUS its neighbour cells (ES 8.11's " +
    "default), matched boosts take the max; mixed entries / bad " +
    "precision / empty neighbours reject by name") {
    import spark.implicits._
    val d = Seq(
      (1L, "window one", 57.64, 10.40),   // u... cell (north europe)
      (2L, "window two", 57.60, 10.41),   // same precision-5-ish area
      (3L, "window far", -33.86, 151.20)) // sydney: different cell
      .toDF("doc_id", "text", "lat", "lon")
      .selectExpr("doc_id", "text",
        "named_struct('lat', lat, 'lon', lon) AS loc")
    def sug(body: String) =
      EsDsl.search(d, mapper.readTree(body))
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // precision 2: docs 1+2 share the query point's cell, 3 does not
    val near = sug("""{"suggest": {"ac": {"prefix": "win",
      "completion": {"field": "text", "size": 10, "contexts": {"loc": [
        {"context": {"lat": 57.6, "lon": 10.4}, "precision": 2,
         "boost": 3}]}}}}}""")
    assert(near == Map(1L -> 3.0, 2L -> 3.0), near.toString)
    // a second weightless cell unions in the far doc; max-boost rule
    val both = sug("""{"suggest": {"ac": {"prefix": "win",
      "completion": {"field": "text", "size": 10, "contexts": {"loc": [
        {"context": {"lat": 57.6, "lon": 10.4}, "precision": 2,
         "boost": 3},
        {"context": {"lat": -33.8, "lon": 151.2},
         "precision": 2}]}}}}}""")
    assert(both == Map(1L -> 3.0, 2L -> 3.0, 3L -> 1.0), both.toString)
    // entry type must match the column's SCHEMA: geo entries on a
    // string column / category entries on the geo_point struct both
    // reject by name (never an opaque analysis error or a silent
    // zero-match)
    val d2 = d.withColumn("lang", org.apache.spark.sql.functions
      .lit("en"))
    for ((cf, entry) <- Seq(
        ("lang", """{"context": {"lat": 1, "lon": 2}}"""),
        ("loc", "\"enval\"")))
      assert(intercept[IllegalArgumentException] {
        EsDsl.search(d2, mapper.readTree(
          s"""{"suggest": {"ac": {"prefix": "win", "completion":
             {"field": "text", "contexts":
             {"$cf": [$entry]}}}}}""")).collect()
      }.getMessage.contains(cf))
    // term-suggester analyzer whitespace: the RAW case-kept token is
    // the response token (never a sentinel string)
    val ws = EsDsl.suggest(d2, mapper.readTree(
      """{"fix": {"text": "Windoq", "term": {"field": "text",
        |  "analyzer": "whitespace"}}}""".stripMargin))
      .select("token").as[String].collect().toSeq
    assert(ws == Seq("Windoq"), ws.toString)
    // NEIGHBOUR cells (round 18 — ES 8.11's GeoQueryContext default):
    // a doc just across a precision-2 cell boundary (lon 11.25° is a
    // grid line: 11.20 → x=16, 11.30 → x=17) matches the query cell's
    // NEIGHBOUR, with and without the explicit `neighbours` knob
    val dN = Seq(
      (1L, "window same", 57.60, 11.20),
      (2L, "window next", 57.60, 11.30),   // adjacent p2 cell
      (3L, "window far", -33.86, 151.20))
      .toDF("doc_id", "text", "lat", "lon")
      .selectExpr("doc_id", "text",
        "named_struct('lat', lat, 'lon', lon) AS loc")
    def sugN(body: String) =
      EsDsl.search(dN, mapper.readTree(body))
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val nDefault = sugN("""{"suggest": {"ac": {"prefix": "win",
      "completion": {"field": "text", "size": 10, "contexts": {"loc": [
        {"context": {"lat": 57.6, "lon": 11.2}, "precision": 2,
         "boost": 3}]}}}}}""")
    assert(nDefault == Map(1L -> 3.0, 2L -> 3.0), nDefault.toString)
    val nExplicit = sugN("""{"suggest": {"ac": {"prefix": "win",
      "completion": {"field": "text", "size": 10, "contexts": {"loc": [
        {"context": {"lat": 57.6, "lon": 11.2}, "precision": 2,
         "neighbours": [2]}]}}}}}""")
    assert(nExplicit.keySet == Set(1L, 2L), nExplicit.toString)
    // a neighbour precision FINER than the entry's caps at the
    // entry precision (ES truncates, never extends) — [12] at
    // precision 2 answers exactly like [2]
    val nClamped = sugN("""{"suggest": {"ac": {"prefix": "win",
      "completion": {"field": "text", "size": 10, "contexts": {"loc": [
        {"context": {"lat": 57.6, "lon": 11.2}, "precision": 2,
         "neighbours": [12]}]}}}}}""")
    assert(nClamped.keySet == nExplicit.keySet, nClamped.toString)
    // a DISTANCE-STRING precision selects the level whose cell edge
    // is at most the distance ("1000km" → level 3; docs 1+2 sit
    // ~6 km apart, same-or-neighbour level-3 cells — doc 3 is not)
    val nDist = sugN("""{"suggest": {"ac": {"prefix": "win",
      "completion": {"field": "text", "size": 10, "contexts": {"loc": [
        {"context": {"lat": 57.6, "lon": 11.2},
         "precision": "1000km"}]}}}}}""")
    assert(nDist.keySet == Set(1L, 2L), nDist.toString)
    // rejections: category+geo mix, precision bounds, precision on a
    // category entry, empty/invalid neighbours, malformed distance
    for (body <- Seq(
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context":
           {"lat": 1, "lon": 2}}, "enval"]}}}}}""",
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context":
           {"lat": 1, "lon": 2}, "precision": 13}]}}}}}""",
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context": "x",
           "precision": 3}]}}}}}""",
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context":
           {"lat": 1, "lon": 2}, "neighbours": []}]}}}}}""",
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context":
           {"lat": 1, "lon": 2}, "precision": "fast"}]}}}}}""",
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context":
           {"lat": 1, "lon": 2},
            "precision": "99999999999"}]}}}}}""",
        """{"suggest": {"ac": {"prefix": "win", "completion":
           {"field": "text", "contexts": {"loc": [{"context": "x",
           "neighbours": [1]}]}}}}}"""))
      intercept[IllegalArgumentException] { sug(body) }
  }
}

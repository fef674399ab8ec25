package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Decontaminate, Mix, Scrub}
import graft.sources.Tables

/** Round-3 curation-layer queries: PII scrubbing, within-document
  * repetition metrics, benchmark decontamination, and domain-mixture
  * sampling — the remaining standard stages of an LLM training-data
  * pipeline. Every query has a full DuckDB oracle.
  *
  * The testdata corpus is synthetic word soup with no PII, so
  * `scrub_pii` deterministically APPENDS pii-bearing suffixes (same
  * string construction in both engines) to two thirds of the documents —
  * the redaction paths are exercised against real matches, and the
  * remaining third pins the no-op path.
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Tagging lexicon for `text_keywords` — deliberately includes
    * keywords that are prefixes/suffixes/substrings of each other and
    * of corpus words, plus absent terms. */
  val TagKeywords: Seq[String] = Seq(
    "window", "win", "dow", "spark", "park", "merge", "erg", "the",
    "he", "batch", "at", "stream", "quantum")

  /** Target domain mixture over the corpus's ten sources. */
  val MixWeights: Map[String, Double] = Map(
    "src0" -> 0.25, "src1" -> 0.20, "src2" -> 0.15, "src3" -> 0.10,
    "src4" -> 0.10, "src5" -> 0.05, "src6" -> 0.05, "src7" -> 0.04,
    "src8" -> 0.03, "src9" -> 0.03)

  /** Deterministic PII suffix for docs with doc_id % 3 != 0: an email,
    * an IPv4, and a phone number derived from doc_id. Double space after
    * the text exercises whitespace normalization. */
  private def dirtyText(text: Column, id: Column): Column =
    concat(text,
      when(id % 3 =!= 0,
        concat(lit("  Contact: user"), id.cast("string"),
          lit("@mail.example.com from 10."),
          (id % 256).cast("string"), lit(".0."),
          ((id * 7) % 256).cast("string"),
          lit(" or call +55 "),
          (id % 900 + 100).cast("string"), lit(" "),
          (id % 9000 + 1000).cast("string"), lit(".")))
        .otherwise(lit("")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "scrub_pii" -> ((s, dir) => {
      val norm = t(s, dir, "documents").select(col("doc_id"),
        Scrub.normalizeWs(Scrub.stripControl(
          dirtyText(col("text"), col("doc_id")))).as("t"))
      norm.select(col("doc_id"),
        md5(Scrub.clean(col("t"))).as("clean_hash"),
        Scrub.countEmails(col("t")).as("n_emails"),
        Scrub.countIps(col("t")).as("n_ips"),
        Scrub.countPhones(col("t")).as("n_phones"))
    }),

    "repetition_stats" -> ((s, dir) => {
      import TextFunctions._
      t(s, dir, "documents").select(col("doc_id"),
        dupTokenFrac(col("text")).as("dup_token_frac"),
        topBigramFrac(col("text")).as("top_bigram_frac"))
    }),

    // Benchmark set = every 20th document (stand-in for an eval suite);
    // corpus docs sharing any 5-gram with it are flagged for removal.
    "decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Decontaminate.overlap(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 5)
    }),

    "mix_sample" -> ((s, dir) =>
      Mix.sample(t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", MixWeights, targetFrac = 0.5, salt = "mix")
        .select("doc_id", "source")),

    // TEMPERATURE-scaled mixture: sampling weights derived from the
    // corpus' own domain counts, p_g ∝ sqrt(n_g) (alpha = 0.5, the
    // multilingual low-resource up-weighting rule) — alpha pinned at
    // 0.5 so the weight arithmetic is sqrt (IEEE-exact in any engine)
    // and the oracle can reproduce the weights bit-for-bit.
    "mix_temperature" -> ((s, dir) =>
      Mix.temperatureSample(
          t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id")
        .select("doc_id", "source")),

    // Mixture by epoch replication — the up-weighting path: rates may
    // exceed 1, each doc emitted floor(rate) times + a deterministic
    // fractional slice, every copy tagged with its epoch index. One
    // corpus scan, replication via row-level explode.
    "mix_epochs" -> ((s, dir) =>
      Mix.epochs(t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", MixWeights, targetFrac = 1.0, salt = "epoch")
        .select("doc_id", "source", "epoch")),

    // EXACT stratified sample: 15 docs per source (binds at every SF), deterministic salted-
    // hash ranking; WindowGroupLimit prunes map-side (PlanShapeSpec).
    "sample_stratified" -> ((s, dir) =>
      Mix.stratifiedExact(t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", cap = 15)
        .select("doc_id", "source")),

    // Model-based quality scoring: a linear model over the engine's own
    // text features + the algebraic sigmoid — pure codegen'd projection,
    // zero shuffles, the model broadcast as plan literals (the fasttext-
    // classifier stage of a curation pipeline, scored at scan speed).
    "quality_model" -> ((s, dir) => {
      import TextFunctions._
      val feats = t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        stopwordRatio(col("text")).as("stop_ratio"),
        punctRatio(col("text")).as("punct_ratio"),
        avgWordLen(col("text")).as("avg_wlen"))
      graft.operators.Score.linear(feats, Seq(
          (col("stop_ratio"), 2.5),
          (least(col("n_tokens").cast("double"), lit(100.0)) / 100.0, 0.8),
          (col("punct_ratio"), -3.0),
          (abs(col("avg_wlen") - 4.5) / 10.0, -0.5)),
          bias = -0.6)
        .select("doc_id", "logit", "score", "keep")
    }),

    // Perplexity-style LM quality scoring (CCNet/KenLM-class signal):
    // stupid-backoff bigram LM trained on 19/20ths of the corpus, every
    // 20th document scored against it (same eval slice as decontaminate
    // — and the held-out split is what makes the backoff branches
    // reachable). The LM stays a distributed count table end to end.
    "lm_perplexity" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      graft.operators.LanguageModel.scoreStupidBackoff(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0),
        "doc_id", "text")
    }),

    // BPE tokenizer training: 8 merge rounds over the corpus word-type
    // table (Bpe.trainMerges — per round one pair-count agg + top-1,
    // merge applied as a projection; driver state = one pair/round). No
    // SQL oracle (iterative); golden-gated in Verify against the plain-
    // Scala from-scratch trainer, and spec'd in BpeSpec.
    "bpe_train" -> ((s, dir) =>
      graft.operators.Bpe.trainMergesDf(
        s, t(s, dir, "documents"), "text", numMerges = 8)),

    // CALIBRATED quality filter: keep documents at or above their own
    // source's 25th-percentile quality — per-domain thresholds instead
    // of one global cutoff (web text and code score differently; the
    // calibration step every production quality gate runs). The
    // threshold is the DISCRETE k-th smallest score (k = ⌈0.25·n⌉):
    // a grid value both engines agree on exactly, where interpolated
    // percentiles can differ in the last ulp and flip boundary docs.
    //
    // SCALE-SAFE two-pass form: qualityScore is rounded to the 1e-4
    // grid, so per-(source, q) counts are a BOUNDED histogram (≤ ~10⁴
    // rows per source regardless of corpus size) and the k-th smallest
    // is the first grid value whose running count reaches k — exact,
    // same answer as sorting all scores, but the aggregation state never
    // grows with the corpus (the collect_list form this replaces held
    // every score of a source in one buffer; see
    // QualityThresholdSpec for the pinned agreement, incl. the
    // ε-approximate Sketches.gkQuantiles variant for un-gridded scores).
    "quality_calibrated" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import TextFunctions._
      // r19: the scored frame is consumed twice (threshold histogram +
      // the final gate join) — staged so the six-regex qualityScore
      // scan runs once, not twice (the same boundary
      // pipeline_curation_full stages; released by the harness at the
      // query boundary)
      val scored = graft.StageCache.stage(
        t(s, dir, "documents").select(col("doc_id"),
          col("source"), qualityScore(col("text")).as("q")))
      val hist = scored.groupBy(col("source"), col("q"))
        .agg(count(lit(1)).as("c"))
      val bySrc = Window.partitionBy(col("source"))
      val cum = bySrc.orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = hist
        .withColumn("_cum", sum(col("c")).over(cum))
        .withColumn("_k", ceil(sum(col("c")).over(bySrc) * 0.25))
        .filter(col("_cum") >= col("_k"))
        .groupBy(col("source")).agg(min(col("q")).as("q25"))
      scored.join(broadcast(thr), Seq("source"))
        .filter(col("q") >= col("q25"))
        .select("doc_id", "source", "q")
    }),

    // Quantile-sketch gate (the sketch layer's oracle-adjacent check):
    // per-source EXACT p25/p50/p75 of the quality score — the oracled
    // part — plus booleans asserting the GK sketch (percentile_approx,
    // the 100 TB path) lands within its rank-error guarantee of the
    // exact value. The GK output itself is merge-order-dependent and
    // can't be oracled; the BOUND is deterministic (guaranteed by the
    // sketch), so the booleans hash-compare against literal TRUE in
    // DuckDB — a violation anywhere trips the gate. Same bounded
    // histogram + running-count shape as quality_calibrated.
    "quality_quantile_gate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import TextFunctions._
      // NOT staged (r19 negative result): scored feeds two branches
      // like quality_calibrated, but here both are cheap aggregations —
      // staging measured 0.28 → 0.73 s (the cache materialization costs
      // more than the second qualityScore scan it saves); calibrated's
      // second consumer is an expensive join branch, hence the split
      // decision
      val scored = t(s, dir, "documents").select(col("source"),
        qualityScore(col("text")).as("q"))
      val hist = scored.groupBy(col("source"), col("q"))
        .agg(count(lit(1)).as("c"))
      val bySrc = Window.partitionBy(col("source"))
      val cum = bySrc.orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = hist
        .withColumn("_cum", sum(col("c")).over(cum))
        .withColumn("_n", sum(col("c")).over(bySrc))
      // exact value at rank j = min grid value whose running count
      // reaches j; rank tolerance = the GK guarantee n/accuracy (≥ 1)
      def valAt(rank: Column) = min(when(col("_cum") >= rank, col("q")))
      val err = greatest(lit(1L), ceil(col("_n") / 10000.0).cast("long"))
      def k(p: Double) = ceil(col("_n") * p).cast("long")
      val exact = ranked.groupBy(col("source")).agg(
        valAt(k(0.25)).as("q25"), valAt(k(0.50)).as("q50"),
        valAt(k(0.75)).as("q75"),
        valAt(greatest(lit(1L), k(0.25) - err)).as("_lo25"),
        valAt(least(col("_n"), k(0.25) + err)).as("_hi25"),
        valAt(greatest(lit(1L), k(0.50) - err)).as("_lo50"),
        valAt(least(col("_n"), k(0.50) + err)).as("_hi50"),
        valAt(greatest(lit(1L), k(0.75) - err)).as("_lo75"),
        valAt(least(col("_n"), k(0.75) + err)).as("_hi75"))
      val gk = scored.groupBy(col("source")).agg(
        percentile_approx(col("q"), array(lit(0.25), lit(0.5), lit(0.75)),
          lit(10000)).as("_gk"))
      exact.join(gk, Seq("source"))
        .select(col("source"), col("q25"), col("q50"), col("q75"),
          (element_at(col("_gk"), 1) >= col("_lo25") &&
            element_at(col("_gk"), 1) <= col("_hi25")).as("gk25_ok"),
          (element_at(col("_gk"), 2) >= col("_lo50") &&
            element_at(col("_gk"), 2) <= col("_hi50")).as("gk50_ok"),
          (element_at(col("_gk"), 3) >= col("_lo75") &&
            element_at(col("_gk"), 3) <= col("_hi75")).as("gk75_ok"))
    }),

    // The WHOLE LLM-curation path as ONE registered artifact:
    // scrub → calibrated per-source quality gate → exact dedup →
    // benchmark decontamination → mixture sampling → split + token-
    // budget packing. Every stage is an operator with its own oracle
    // elsewhere; this pins the full COMPOSITION (stage coupling,
    // column flow, filter interactions) under one hash. Scale shape:
    // one corpus scan feeds codegen'd projections; the shuffles are
    // the bounded quality histogram, the content-hash dedup group, the
    // shingle semi-join (bench side broadcast-sized), and the per-split
    // pack window — nothing quadratic, no corpus-proportional driver
    // state.
    "pipeline_curation_full" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import TextFunctions._
      // 1. scrub: deterministic PII dirtying (see scrub_pii) → strip
      //    control chars → whitespace normalize → redact
      val cleaned = t(s, dir, "documents").select(
        col("doc_id"), col("source"),
        Scrub.clean(dirtyText(col("text"), col("doc_id"))).as("t"))
      // 2. calibrated gate: keep docs at/above their source's discrete
      //    p25 quality (bounded-histogram two-pass, as quality_calibrated).
      //    The scrub+score subtree has FIVE downstream consumers
      //    (threshold histogram, gate, dedup canon, bench shingles,
      //    survivors) — persist it once instead of re-running six regex
      //    passes plus tokenization over the corpus per consumer; at
      //    production scale this is the stage boundary a pipeline
      //    materializes (MEMORY_AND_DISK spills, never OOMs). A lazy
      //    builder cannot unpersist its own stage — the cache goes
      //    through StageCache, and the harness owning the action
      //    (Verify/Bench/serving loop) releases it at the query boundary
      val scored = graft.StageCache.stage(
        cleaned.select(col("doc_id"), col("source"), col("t"),
          qualityScore(col("t")).as("q")))
      val hist = scored.groupBy(col("source"), col("q"))
        .agg(count(lit(1)).as("c"))
      val bySrc = Window.partitionBy(col("source"))
      val cum = bySrc.orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = hist
        .withColumn("_cum", sum(col("c")).over(cum))
        .withColumn("_k", ceil(sum(col("c")).over(bySrc) * 0.25))
        .filter(col("_cum") >= col("_k"))
        .groupBy(col("source")).agg(min(col("q")).as("q25"))
      // r19: `kept` has three consumers (dedup canon, the unique join,
      // and through it the decontamination corpus) — without its own
      // stage each consumer re-derived the threshold tower (histogram +
      // two windows + broadcast join) on top of the cached scan; the
      // plan showed the thr subtree 3×. Staged like `scored`, the tower
      // runs once.
      val kept = graft.StageCache.stage(
        scored.join(broadcast(thr), Seq("source"))
          .filter(col("q") >= col("q25")).drop("q25"))
      // 3. exact dedup on the CLEANED text, canonical = min doc_id
      val canon = kept.groupBy(md5(col("t")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
      val unique = kept.join(canon.select("doc_id"), Seq("doc_id"))
      // 4. decontaminate: drop the benchmark slice itself, then every
      //    survivor sharing a 5-gram with it (bench = UNGATED cleaned
      //    docs — an eval suite is external to curation). `corpus` is
      //    consumed twice (the shingle-overlap flag pass and the anti
      //    join that applies it) — staged so the dedup join above runs
      //    once (r19).
      val corpus = graft.StageCache.stage(
        unique.filter(col("doc_id") % 20 =!= 0))
      val flagged = Decontaminate.overlap(
        corpus.select("doc_id", "t"),
        cleaned.filter(col("doc_id") % 20 === 0).select("doc_id", "t"),
        "doc_id", "t", n = 5)
      val decon = corpus.join(flagged.select("doc_id"),
        Seq("doc_id"), "left_anti")
      // 5. mixture sampling toward the target domain weights
      val mixed = Mix.sample(decon, "source", "doc_id", MixWeights,
        targetFrac = 0.5, salt = "mix")
      // 6. deterministic split + per-split token-budget packing
      val labeled = graft.operators.Split.assign(
        mixed.withColumn("n_tokens", tokenCount(col("t"))),
        "doc_id", salt = "cur")
      graft.operators.Pack.packByBudget(labeled, "n_tokens",
          budget = 2000L, orderCol = "doc_id", groupCols = Seq("split"))
        .select(col("doc_id"), col("source"), col("split"), col("q"),
          col("n_tokens"), col("batch_id"))
    }),

    // Context-window chunking: 64-token chunks at stride 48 (16-token
    // overlap) — zero-shuffle projection+explode; (doc_id, chunk_idx)
    // is the stable downstream key.
    "chunk_docs" -> ((s, dir) =>
      graft.operators.Chunk.split(
        t(s, dir, "documents"), "doc_id", "text", window = 64, stride = 48)),

    // BPE encode: word + subword counts per document under the merges
    // trained by bpe_train — the tokenizer round-trip (train on the
    // corpus, then budget the corpus with it). Golden-gated like
    // bpe_train; vocab-level encode means the k-deep merge chain runs
    // over distinct words only.
    "bpe_encode" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val merges = graft.operators.Bpe
        .trainMerges(d, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      graft.operators.Bpe.encodeTokenCounts(d, "doc_id", "text", merges)
    }),

    // BPE vocabulary head: top-30 corpus-weighted symbols under the
    // trained merges — the shipped-artifact view of the tokenizer
    // (merge table + vocab). Golden-gated like train/encode.
    "bpe_vocab" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val merges = graft.operators.Bpe
        .trainMerges(d, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      graft.operators.Bpe.vocab(d, "text", merges)
        .orderBy(col("freq").desc, col("symbol"))
        .limit(30)
    }),

    // Multi-keyword tagging at scan speed: ONE Aho–Corasick pass per
    // document finds every blocklist/topic keyword regardless of list
    // size (the compositional k-contains form is k passes per row —
    // dead at a production 10⁴-term lexicon). Keyword list includes
    // proper prefixes/suffixes of each other and of corpus words
    // ('win'⊂'window', 'he'⊂'the'), the cases where naive automata
    // drop matches. Output joined to a string so the hash compare is
    // dtype-proof.
    "text_keywords" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          array_join(
            org.apache.spark.sql.graft.KeywordExpressions.keywordMatches(
              lower(col("text")), TagKeywords), ",").as("matched"))),

    // Corpus-level n-gram statistics: document frequency of every
    // distinct 3-gram shingle, top 20 — one explode + combiner-friendly
    // hash agg, then TakeOrderedAndProject (never a global sort of the
    // full n-gram table). The corpus-stats probe an LLM pipeline runs
    // before choosing boilerplate/df-cap thresholds.
    "ngram_topk" -> ((s, dir) => {
      import TextFunctions._
      t(s, dir, "documents")
        .select(explode(distinctShingles(col("text"), 3)).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("shingle"))
        .limit(20)
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------

  // regex literals shared with operators/Scrub.scala — lookaround-free so
  // RE2 and Java agree; DuckDB needs the explicit 'g' flag (its
  // regexp_replace is first-match by default, Spark's is global)
  private val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ip = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private val Phone = "\\+[0-9]{1,3}([- ][0-9]{2,4}){2,3}"

  private val scrubSql: String =
    s"""WITH dirty AS (
       |  SELECT doc_id, text || CASE WHEN doc_id % 3 <> 0 THEN
       |    '  Contact: user' || CAST(doc_id AS VARCHAR) ||
       |    '@mail.example.com from 10.' ||
       |    CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
       |    CAST((doc_id * 7) % 256 AS VARCHAR) ||
       |    ' or call +55 ' ||
       |    CAST(doc_id % 900 + 100 AS VARCHAR) || ' ' ||
       |    CAST(doc_id % 9000 + 1000 AS VARCHAR) || '.'
       |    ELSE '' END AS t
       |  FROM documents
       |), norm AS (
       |  SELECT doc_id, trim(regexp_replace(regexp_replace(t,
       |    '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |    '\\s+', ' ', 'g')) AS t
       |  FROM dirty
       |)
       |SELECT doc_id,
       |  md5(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$Email', '<EMAIL>', 'g'),
       |    '$Ip', '<IP>', 'g'),
       |    '$Phone', '<PHONE>', 'g')) AS clean_hash,
       |  len(regexp_extract_all(t, '$Email')) AS n_emails,
       |  len(regexp_extract_all(regexp_replace(t, '$Email', '<EMAIL>',
       |    'g'), '$Ip')) AS n_ips,
       |  len(regexp_extract_all(t, '$Phone')) AS n_phones
       |FROM norm""".stripMargin

  private val repetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS ts
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, len(ts) AS n, len(list_distinct(ts)) AS d,
      |    CASE WHEN len(ts) >= 2
      |      THEN list_transform(generate_series(1, len(ts)-1),
      |           i -> ts[i] || ' ' || ts[i+1])
      |      ELSE [] END AS bgs
      |  FROM toks
      |), mx AS (
      |  SELECT doc_id, max(cnt) AS maxcnt FROM (
      |    SELECT doc_id, b, count(*) AS cnt
      |    FROM (SELECT doc_id, unnest(bgs) AS b FROM bg)
      |    GROUP BY doc_id, b)
      |  GROUP BY doc_id
      |)
      |SELECT bg.doc_id,
      |  CASE WHEN n > 0
      |    THEN floor((1.0 - CAST(d AS DOUBLE) / n) * 10000.0 + 0.5)
      |         / 10000.0
      |    ELSE 0.0 END AS dup_token_frac,
      |  CASE WHEN n >= 2
      |    THEN floor(2.0 * maxcnt / n * 10000.0 + 0.5) / 10000.0
      |    ELSE 0.0 END AS top_bigram_frac
      |FROM bg LEFT JOIN mx ON bg.doc_id = mx.doc_id""".stripMargin

  private val decontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS ts
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, CASE WHEN len(ts) >= 5
      |    THEN list_distinct(list_transform(generate_series(1, len(ts)-4),
      |         i -> array_to_string(ts[i:i+4],' ')))
      |    ELSE [array_to_string(ts,' ')] END AS shset
      |  FROM toks
      |), corp AS (
      |  SELECT doc_id, unnest(shset) AS s FROM sh WHERE doc_id % 20 <> 0
      |), ben AS (
      |  SELECT DISTINCT unnest(shset) AS s FROM sh WHERE doc_id % 20 = 0
      |)
      |SELECT corp.doc_id, count(*) AS n_hits
      |FROM corp JOIN ben ON corp.s = ben.s
      |GROUP BY corp.doc_id""".stripMargin

  private val mixSql: String = {
    val caseW = MixWeights.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_g FROM documents GROUP BY source
       |), tot AS (SELECT sum(n_g) AS n_total FROM counts),
       |r AS (
       |  SELECT d.doc_id, d.source,
       |    least(1.0, ((CASE d.source $caseW END) * (0.5 * n_total))
       |      / n_g) AS rate
       |  FROM documents d JOIN counts USING (source) CROSS JOIN tot
       |)
       |SELECT doc_id, source FROM r
       |WHERE rate IS NOT NULL AND (rate >= 1.0 OR
       |  substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 4) <
       |  lpad(lower(to_hex(CAST(floor(rate * 65536.0) AS INT))), 4, '0'))
       |""".stripMargin
  }

  private def lex(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  /** Quality-model oracle — feature CTEs mirror TextFunctions (already
    * hash-proven in text_analysis); the linear combination and algebraic
    * sigmoid are written in the SAME evaluation order as Score.linear,
    * and both engines round with the floor form (valid for negative
    * logits, where DuckDB's round() would differ). */
  private val qualityModelSql: String = {
    import TextFunctions._
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(text,'\\s+'), x -> x <> '') AS ts
       |  FROM documents
       |), feat AS (
       |  SELECT doc_id, len(ts) AS n_tokens,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(len(list_filter(ts,
       |           t -> list_contains(${lex(StopwordsEn)}, t))) AS DOUBLE)
       |           / len(ts), 4)
       |      ELSE 0.0 END AS stop_ratio,
       |    CASE WHEN length(text) > 0
       |      THEN round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]',
       |           '', 'g')) AS DOUBLE) / length(text), 4)
       |      ELSE 0.0 END AS punct_ratio,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(list_sum(list_transform(ts, t -> length(t)))
       |           AS DOUBLE) / len(ts), 4)
       |      ELSE 0.0 END AS avg_wlen
       |  FROM toks
       |), lg AS (
       |  SELECT doc_id,
       |    -0.6 + stop_ratio * 2.5
       |         + least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.8
       |         + punct_ratio * -3.0
       |         + abs(avg_wlen - 4.5) / 10.0 * -0.5 AS logit
       |  FROM feat
       |)
       |SELECT doc_id,
       |  floor(logit * 10000.0 + 0.5) / 10000.0 AS logit,
       |  floor((0.5 + 0.5 * logit / (1.0 + abs(logit))) * 10000.0 + 0.5)
       |    / 10000.0 AS score,
       |  (logit >= 0.0) AS keep
       |FROM lg""".stripMargin
  }

  /** Stupid-backoff LM oracle — counts from the train slice (doc_id %
    * 20 <> 0), the eval slice scored with the same three-branch CASE as
    * LanguageModel.scoreStupidBackoff, floor-form rounding on the final
    * aggregates only. */
  private val lmPerplexitySql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS ts
      |  FROM documents
      |), uni AS (
      |  SELECT w, count(*) AS c1
      |  FROM (SELECT unnest(ts) AS w FROM toks WHERE doc_id % 20 <> 0)
      |  GROUP BY w
      |), tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n_total FROM uni),
      |bg AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(1, len(ts)-1),
      |      i -> ts[i] || ' ' || ts[i+1]) AS bgs
      |  FROM toks WHERE len(ts) >= 2
      |), bgc AS (
      |  SELECT b, count(*) AS c2
      |  FROM (SELECT doc_id, unnest(bgs) AS b FROM bg
      |        WHERE doc_id % 20 <> 0)
      |  GROUP BY b
      |), stream AS (
      |  SELECT doc_id, b,
      |    string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2
      |  FROM (SELECT doc_id, unnest(bgs) AS b FROM bg
      |        WHERE doc_id % 20 = 0)
      |), scored AS (
      |  SELECT s.doc_id,
      |    CASE
      |      WHEN bgc.c2 IS NOT NULL
      |        THEN ln(CAST(bgc.c2 AS DOUBLE) / u1.c1)
      |      WHEN u2.c1 IS NOT NULL
      |        THEN ln(0.4 * u2.c1 / n_total)
      |      ELSE ln(0.4 / n_total)
      |    END AS logp
      |  FROM stream s
      |  LEFT JOIN bgc ON s.b = bgc.b
      |  LEFT JOIN uni u1 ON s.w1 = u1.w
      |  LEFT JOIN uni u2 ON s.w2 = u2.w
      |  CROSS JOIN tot
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  floor(avg(logp) * 10000.0 + 0.5) / 10000.0 AS avg_logp,
      |  floor(exp(-avg(logp)) * 10000.0 + 0.5) / 10000.0 AS ppl
      |FROM scored GROUP BY doc_id""".stripMargin

  private val ngramTopkSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS ts
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, CASE WHEN len(ts) >= 3
      |    THEN list_distinct(list_transform(generate_series(1, len(ts)-2),
      |         i -> array_to_string(ts[i:i+2],' ')))
      |    ELSE [array_to_string(ts,' ')] END AS shset
      |  FROM toks
      |)
      |SELECT s AS shingle, count(*) AS doc_freq
      |FROM (SELECT doc_id, unnest(shset) AS s FROM sh)
      |GROUP BY s ORDER BY doc_freq DESC, shingle LIMIT 20""".stripMargin

  /** Epoch-replication oracle. Every operand is CAST to DOUBLE so both
    * engines run the same IEEE arithmetic in the same order — DuckDB
    * would otherwise evaluate the weight literals as DECIMAL, and
    * floor(rate) sits exactly on integer boundaries (0.15 * 500 / 25:
    * decimal says 3.0, double says 2.999…89), which would flip whole
    * domains between 2 and 3 epochs. */
  private val mixEpochsSql: String = {
    val caseW = MixWeights.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN CAST($v AS DOUBLE)" }
      .mkString(" ")
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_g FROM documents GROUP BY source
       |), tot AS (SELECT sum(n_g) AS n_total FROM counts),
       |r AS (
       |  SELECT d.doc_id, d.source,
       |    (CASE d.source $caseW END)
       |      * (1.0 * CAST(n_total AS DOUBLE)) / CAST(n_g AS DOUBLE)
       |      AS rate
       |  FROM documents d JOIN counts USING (source) CROSS JOIN tot
       |), c AS (
       |  SELECT doc_id, source,
       |    CAST(floor(rate) AS INT) +
       |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'epoch'), 1, 4)
       |      < lpad(lower(to_hex(CAST(floor((rate - floor(rate))
       |          * 65536.0) AS INT))), 4, '0')
       |    THEN 1 ELSE 0 END AS n
       |  FROM r WHERE rate IS NOT NULL
       |)
       |SELECT doc_id, source, CAST(e AS INT) AS epoch FROM (
       |  SELECT doc_id, source, unnest(generate_series(0, n - 1)) AS e
       |  FROM c WHERE n > 0)""".stripMargin
  }

  /** Temperature-mixture oracle: weights p_g ∝ sqrt(n_g) computed the
    * way Mix.temperatureSample computes them — sqrt of each domain
    * count (exactly rounded by IEEE in both engines), denominator
    * summed in SORTED-DOMAIN order (left-assoc chain == the Scala
    * foldLeft), then mixSql's rate/threshold shape with salt 'temp'.
    * Domains hardcoded to the testdata's src0..src19 (same contract as
    * MixWeights). */
  private val mixTemperatureSql: String = {
    val domains = (0 until 20).map("src" + _).sorted
    def s(d: String) =
      s"(SELECT sqrt(CAST(n_g AS DOUBLE)) FROM cnts WHERE source = '$d')"
    val den = domains.map(s).mkString(" + ")
    val caseW = domains
      .map(d => s"WHEN '$d' THEN ${s(d)} / den.d").mkString(" ")
    s"""WITH cnts AS (
       |  SELECT source, count(*) AS n_g FROM documents GROUP BY source
       |), den AS (SELECT $den AS d),
       |tot AS (SELECT sum(n_g) AS n_total FROM cnts),
       |r AS (
       |  SELECT doc.doc_id, doc.source,
       |    least(1.0, ((CASE doc.source $caseW END) * (0.5 * n_total))
       |      / n_g) AS rate
       |  FROM documents doc JOIN cnts ON doc.source = cnts.source
       |  CROSS JOIN tot CROSS JOIN den
       |)
       |SELECT doc_id, source FROM r
       |WHERE rate IS NOT NULL AND (rate >= 1.0 OR
       |  substr(md5(CAST(doc_id AS VARCHAR) || 'temp'), 1, 4) <
       |  lpad(lower(to_hex(CAST(floor(rate * 65536.0) AS INT))), 4, '0'))
       |""".stripMargin
  }

  /** Calibrated-quality oracle: the quality CTE mirrors qualityScore
    * (hash-proven in text_analysis); the threshold is the same discrete
    * k-th smallest per source. */
  private val qualityCalibratedSql: String = {
    import TextFunctions._
    s"""WITH toks AS (
       |  SELECT doc_id, source, text,
       |    list_filter(string_split_regex(text,'\\s+'), x -> x <> '') AS ts
       |  FROM documents
       |), feat AS (
       |  SELECT doc_id, source, len(ts) AS n_tokens,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(len(list_filter(ts,
       |           t -> list_contains(${lex(StopwordsEn)}, t))) AS DOUBLE)
       |           / len(ts), 4)
       |      ELSE 0.0 END AS stop_ratio,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(list_sum(list_transform(ts, t -> length(t)))
       |           AS DOUBLE) / len(ts), 4)
       |      ELSE 0.0 END AS avg_wlen
       |  FROM toks
       |), scored AS (
       |  SELECT doc_id, source,
       |    floor((least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.5 +
       |          stop_ratio * 0.3 +
       |          greatest(0.0, 1.0 - abs(avg_wlen - 4.5) / 10.0) * 0.2)
       |          * 10000.0 + 0.5) / 10000.0 AS q
       |  FROM feat
       |), thr AS (
       |  SELECT source,
       |    list_sort(list(q))[CAST(ceil(count(*) * 0.25) AS INT)] AS q25
       |  FROM scored GROUP BY source
       |)
       |SELECT doc_id, scored.source, q
       |FROM scored JOIN thr ON scored.source = thr.source
       |WHERE q >= q25""".stripMargin
  }

  /** Quantile-gate oracle: the same quality CTE, exact discrete
    * quantiles via sorted-list indexing (k-th smallest == min grid value
    * whose running count reaches k), and the GK-within-bound booleans as
    * literal TRUE — the sketch guarantee makes them deterministic, so a
    * violation on the Spark side hash-mismatches. */
  private val qualityQuantileGateSql: String = {
    import TextFunctions._
    s"""WITH toks AS (
       |  SELECT doc_id, source, text,
       |    list_filter(string_split_regex(text,'\\s+'), x -> x <> '') AS ts
       |  FROM documents
       |), feat AS (
       |  SELECT doc_id, source, len(ts) AS n_tokens,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(len(list_filter(ts,
       |           t -> list_contains(${lex(StopwordsEn)}, t))) AS DOUBLE)
       |           / len(ts), 4)
       |      ELSE 0.0 END AS stop_ratio,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(list_sum(list_transform(ts, t -> length(t)))
       |           AS DOUBLE) / len(ts), 4)
       |      ELSE 0.0 END AS avg_wlen
       |  FROM toks
       |), scored AS (
       |  SELECT source,
       |    floor((least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.5 +
       |          stop_ratio * 0.3 +
       |          greatest(0.0, 1.0 - abs(avg_wlen - 4.5) / 10.0) * 0.2)
       |          * 10000.0 + 0.5) / 10000.0 AS q
       |  FROM feat
       |)
       |SELECT source,
       |  list_sort(list(q))[CAST(ceil(count(*) * 0.25) AS INT)] AS q25,
       |  list_sort(list(q))[CAST(ceil(count(*) * 0.50) AS INT)] AS q50,
       |  list_sort(list(q))[CAST(ceil(count(*) * 0.75) AS INT)] AS q75,
       |  true AS gk25_ok, true AS gk50_ok, true AS gk75_ok
       |FROM scored GROUP BY source""".stripMargin
  }

  /** Full-pipeline oracle: every stage's already-proven SQL form,
    * composed in the same order and over the same intermediate columns
    * as the Spark composition — scrub (dirty/strip/normalize/redact),
    * quality CTE + discrete per-source p25, md5 dedup, 5-gram
    * decontamination, mixture rates, split thresholds, pack window. */
  private val pipelineFullSql: String = {
    import TextFunctions._
    val caseW = MixWeights.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
    val shingles = "CASE WHEN len(ts) >= 5 THEN list_distinct(" +
      "list_transform(generate_series(1, len(ts)-4), " +
      "i -> array_to_string(ts[i:i+4],' '))) " +
      "ELSE [array_to_string(ts,' ')] END"
    s"""WITH dirty AS (
       |  SELECT doc_id, source, text || CASE WHEN doc_id % 3 <> 0 THEN
       |    '  Contact: user' || CAST(doc_id AS VARCHAR) ||
       |    '@mail.example.com from 10.' ||
       |    CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
       |    CAST((doc_id * 7) % 256 AS VARCHAR) ||
       |    ' or call +55 ' ||
       |    CAST(doc_id % 900 + 100 AS VARCHAR) || ' ' ||
       |    CAST(doc_id % 9000 + 1000 AS VARCHAR) || '.'
       |    ELSE '' END AS t0
       |  FROM documents
       |), clean AS (
       |  SELECT doc_id, source,
       |    regexp_replace(regexp_replace(regexp_replace(
       |      trim(regexp_replace(regexp_replace(t0,
       |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |        '\\s+', ' ', 'g')),
       |      '$Email', '<EMAIL>', 'g'),
       |      '$Ip', '<IP>', 'g'),
       |      '$Phone', '<PHONE>', 'g') AS t
       |  FROM dirty
       |), toks AS (
       |  SELECT doc_id, source, t,
       |    list_filter(string_split_regex(t,'\\s+'), x -> x <> '') AS ts
       |  FROM clean
       |), feat AS (
       |  SELECT doc_id, source, t, ts, len(ts) AS n_tokens,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(len(list_filter(ts,
       |           x -> list_contains(${lex(StopwordsEn)}, x))) AS DOUBLE)
       |           / len(ts), 4)
       |      ELSE 0.0 END AS stop_ratio,
       |    CASE WHEN len(ts) > 0
       |      THEN round(CAST(list_sum(list_transform(ts, x -> length(x)))
       |           AS DOUBLE) / len(ts), 4)
       |      ELSE 0.0 END AS avg_wlen
       |  FROM toks
       |), scored AS (
       |  SELECT doc_id, source, t, ts, n_tokens,
       |    floor((least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0 * 0.5 +
       |          stop_ratio * 0.3 +
       |          greatest(0.0, 1.0 - abs(avg_wlen - 4.5) / 10.0) * 0.2)
       |          * 10000.0 + 0.5) / 10000.0 AS q
       |  FROM feat
       |), thr AS (
       |  SELECT source,
       |    list_sort(list(q))[CAST(ceil(count(*) * 0.25) AS INT)] AS q25
       |  FROM scored GROUP BY source
       |), kept AS (
       |  SELECT scored.* FROM scored JOIN thr
       |  ON scored.source = thr.source WHERE q >= q25
       |), canon AS (
       |  SELECT md5(t) AS h, min(doc_id) AS doc_id FROM kept GROUP BY md5(t)
       |), uniq AS (
       |  SELECT kept.* FROM kept JOIN canon ON kept.doc_id = canon.doc_id
       |), corp AS (
       |  SELECT * FROM uniq WHERE doc_id % 20 <> 0
       |), corpsh AS (
       |  SELECT doc_id, unnest($shingles) AS s FROM corp
       |), bensh AS (
       |  SELECT DISTINCT unnest($shingles) AS s FROM scored
       |  WHERE doc_id % 20 = 0
       |), decon AS (
       |  SELECT * FROM corp WHERE doc_id NOT IN (
       |    SELECT DISTINCT corpsh.doc_id FROM corpsh
       |    JOIN bensh ON corpsh.s = bensh.s)
       |), counts AS (
       |  SELECT source, count(*) AS n_g FROM decon GROUP BY source
       |), tot AS (SELECT sum(n_g) AS n_total FROM counts),
       |r AS (
       |  SELECT d.doc_id, d.source, d.q, d.n_tokens,
       |    least(1.0, ((CASE d.source $caseW END) * (0.5 * n_total))
       |      / n_g) AS rate
       |  FROM decon d JOIN counts USING (source) CROSS JOIN tot
       |), mixed AS (
       |  SELECT doc_id, source, q, n_tokens FROM r
       |  WHERE rate IS NOT NULL AND (rate >= 1.0 OR
       |    substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 4) <
       |    lpad(lower(to_hex(CAST(floor(rate * 65536.0) AS INT))), 4, '0'))
       |), labeled AS (
       |  SELECT *, CASE
       |    WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'cur'), 1, 4)
       |      < 'e666' THEN 'train'
       |    WHEN substr(md5(CAST(doc_id AS VARCHAR) || 'cur'), 1, 4)
       |      < 'f333' THEN 'val'
       |    ELSE 'test' END AS split
       |  FROM mixed
       |), packed AS (
       |  SELECT doc_id, source, split, q, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM labeled
       |)
       |SELECT doc_id, source, split, q, n_tokens,
       |  CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS batch_id
       |FROM packed""".stripMargin
  }

  /** Greedy BPE training UNROLLED to `rounds` DuckDB merge rounds —
    * the oracle that emptied the golden tier (round 10): the merge
    * count is FIXED (8), so the "iterative" trainer is expressible as
    * a static CTE chain. Per round: adjacent-pair counts over the
    * word-type table, top-1 by (freq desc, l, r), and the merge
    * applied EVERYWHERE by one string `replace` over a
    * separator-encoded symbol string — `replace` scans left-to-right
    * past each replacement, which IS the leftmost-nonoverlapping
    * greedy pass `Bpe.applyMerge` folds (and the same property the
    * substrCount oracles already rely on). The encoding wraps every
    * symbol in chr(31) (unit separator — outside the corpus alphabet;
    * tokens are whitespace-split so they cannot contain whitespace,
    * and the golden gate in Verify would catch a collision) with
    * DOUBLED separators between symbols, the tokenNorm trick: a
    * replaced pair always leaves a full boundary for the next match.
    * A lambda-fold formulation would be the literal mirror of
    * applyMerge, but DuckDB 1.0's vectorized list_reduce corrupts
    * batches of different-length lists — the string form is the
    * correct AND robust spelling. `s{k}` decodes the string back to a
    * symbol list for counting; every multiply-referenced CTE is
    * MATERIALIZED so the chain is linear work, not 2^rounds. */
  private def bpeRoundsCte(rounds: Int): String = {
    val sep = "chr(31)"
    val ss = s"$sep||$sep"
    val sb = new StringBuilder
    sb.append(
      "WITH w0 AS MATERIALIZED (SELECT word, count(*)::BIGINT AS wc " +
        "FROM (SELECT unnest(list_filter(string_split_regex(text, " +
        "'\\s+'), x -> x <> '')) AS word FROM documents) " +
        "GROUP BY word), " +
      s"n0 AS MATERIALIZED (SELECT word, wc, $sep || array_to_string(" +
        "list_transform(generate_series(1, length(word)), " +
        s"i -> substr(word, i::INT, 1)), $ss) " +
        s"|| $ss || '</w>' || $sep AS norm FROM w0)")
    for (k <- 0 until rounds) {
      sb.append(s", s$k AS (SELECT word, wc, list_transform(" +
        s"string_split(norm, $ss), x -> trim(x, chr(31))) AS syms " +
        s"FROM n$k)")
      sb.append(s", p$k AS MATERIALIZED (SELECT p.l AS l, p.r AS r, " +
        "sum(wc)::BIGINT AS freq FROM (SELECT wc, unnest(" +
        "list_transform(generate_series(1, len(syms) - 1), " +
        "i -> {'l': syms[i], 'r': syms[i + 1]})) AS p " +
        s"FROM s$k) GROUP BY 1, 2)")
      sb.append(s", t$k AS MATERIALIZED (SELECT l, r, freq FROM p$k " +
        "ORDER BY freq DESC, l, r LIMIT 1)")
      sb.append(s", n${k + 1} AS MATERIALIZED (SELECT word, wc, " +
        s"replace(norm, $sep||t.l||$ss||t.r||$sep, " +
        s"$sep||t.l||t.r||$sep) AS norm FROM n$k CROSS JOIN t$k t)")
    }
    sb.append(s", s$rounds AS (SELECT word, wc, list_transform(" +
      s"string_split(norm, $ss), x -> trim(x, chr(31))) AS syms " +
      s"FROM n$rounds)")
    sb.toString
  }

  /** bpe_train: the 8 (step, left, right, freq) merge rows. */
  private lazy val bpeTrainSql: String =
    bpeRoundsCte(8) + " " + (0 until 8).map(k =>
      s"""SELECT ${k + 1}::INT AS step, l AS "left", r AS "right", """ +
        s"freq::BIGINT AS freq FROM t$k").mkString(" UNION ALL ") +
      " ORDER BY step"

  /** bpe_vocab: top-30 corpus-weighted symbols under the 8 merges. */
  private lazy val bpeVocabSql: String =
    bpeRoundsCte(8) +
      " SELECT symbol, sum(wc)::BIGINT AS freq FROM " +
      "(SELECT wc, unnest(syms) AS symbol FROM s8) GROUP BY 1 " +
      "ORDER BY freq DESC, symbol LIMIT 30"

  /** bpe_encode: per-document word + subword counts under the 8
    * merges (each distinct word encoded once, joined back — the same
    * vocab-level economics as the Spark plan). */
  private lazy val bpeEncodeSql: String =
    bpeRoundsCte(8) +
      " SELECT d.doc_id, count(*)::BIGINT AS n_words, " +
      "sum(len(s.syms))::BIGINT AS n_bpe_tokens FROM " +
      "(SELECT doc_id, unnest(list_filter(string_split_regex(text, " +
      "'\\s+'), x -> x <> '')) AS word FROM documents) d " +
      "JOIN s8 s USING (word) GROUP BY d.doc_id"

  private val sampleStratifiedSql: String =
    """SELECT doc_id, source FROM documents
      |QUALIFY row_number() OVER (PARTITION BY source
      |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 4),
      |           doc_id) <= 15""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "bpe_train" -> bpeTrainSql,
    "bpe_vocab" -> bpeVocabSql,
    "bpe_encode" -> bpeEncodeSql,
    "scrub_pii" -> scrubSql,
    "sample_stratified" -> sampleStratifiedSql,
    "mix_epochs" -> mixEpochsSql,
    "quality_calibrated" -> qualityCalibratedSql,
    "pipeline_curation_full" -> pipelineFullSql,
    "quality_quantile_gate" -> qualityQuantileGateSql,
    "chunk_docs" ->
      ("""WITH toks AS (SELECT doc_id, """ +
       """list_filter(string_split_regex(text,'\s+'), x -> x <> '') """ +
       """AS ts FROM documents), """ +
       """st AS (SELECT doc_id, ts, """ +
       """unnest(generate_series(0, least(len(ts) - 1, """ +
       """greatest(0, len(ts) - 64 + 48 - 1)), 48)) AS start """ +
       """FROM toks WHERE len(ts) > 0) """ +
       """SELECT doc_id, CAST(start // 48 AS INT) AS chunk_idx, """ +
       """CAST(len(ts[start + 1 : start + 64]) AS INT) """ +
       """AS n_chunk_tokens, """ +
       """md5(array_to_string(ts[start + 1 : start + 64], ' ')) """ +
       """AS chunk_hash FROM st"""),
    "repetition_stats" -> repetitionSql,
    "decontaminate" -> decontaminateSql,
    "mix_sample" -> mixSql,
    "mix_temperature" -> mixTemperatureSql,
    // semantics = keywords.filter(contains) in list order — what the
    // one-pass automaton must reproduce exactly
    "text_keywords" -> {
      val lst = TagKeywords.map(k => s"'$k'").mkString("[", ", ", "]")
      // coalesce: DuckDB's array_to_string of an EMPTY list is NULL,
      // Spark's array_join is '' — same set, different spelling
      "SELECT doc_id, coalesce(array_to_string(list_filter(" +
        s"$lst, k -> contains(lower(text), k)), ','), '') AS matched " +
      "FROM documents WHERE text IS NOT NULL"
    },
    "quality_model" -> qualityModelSql,
    "lm_perplexity" -> lmPerplexitySql,
    "ngram_topk" -> ngramTopkSql)
}

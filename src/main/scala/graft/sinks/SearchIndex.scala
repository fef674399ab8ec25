package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE-TIME search index — the engine's analog of what Elasticsearch
  * does inside `bulk_index` (reference: src/es_connector.py:51-74): build
  * the inverted index and per-field statistics when documents are
  * WRITTEN, so every later ranked query (`multi_match` executes Lucene
  * BM25 over those postings — src/search_api.py:16-36) probes
  * precomputed, query-term-sized data instead of re-tokenizing and
  * re-aggregating the corpus per request.
  *
  * == Layout: one atomic generation pointer ==
  *
  * An index at `path/` is a SIDECAR POINTER plus immutable generations:
  *   - `_index_meta.json` — the indexed field list (order matters: the
  *     fixed-order score combine follows it), the id column, and the
  *     CURRENT GENERATION number. This one file is the only mutable
  *     object; it is replaced with a single atomic rename.
  *   - `g{N}/` — a complete, immutable generation: four parquet tables
  *     written once and never modified. Build and upsert stage the next
  *     generation `g{N+1}` fully, then flip the pointer — a reader that
  *     resolved the meta sees one internally-consistent generation, never
  *     a mix of old postings with new stats (the per-table rename swap
  *     this replaces had exactly that window). A crash mid-stage leaves
  *     an orphan directory and an untouched pointer; orphans are
  *     collected on the next successful build/upsert. On an object store
  *     the same design holds with deferred GC (readers may hold the old
  *     generation open), which is the Iceberg/Delta snapshot contract.
  *
  * Each generation's tables:
  *   - `postings/`   (idCol, fid, dl, term, tf, pos) — one row per
  *     (document, field, term): term frequency `tf`, the document's
  *     field length `dl` (the BM25 length normalizer, carried here so a
  *     probe never joins back to the corpus), and `pos` — the sorted
  *     token positions of the term in the field (what Lucene stores for
  *     `type: "phrase"`; ranked probes never read it, so columnar
  *     pruning keeps BM25 probe IO unchanged);
  *   - `doclens/`    (idCol, fid, dl) — one row per (document, field),
  *     INCLUDING null-valued fields (dl null): the document-presence
  *     registry that makes `n`/`sumdl` maintenance exact under upserts;
  *   - `termstats/`  (fid, term, df_t) — per-(field, term) document
  *     frequency;
  *   - `fieldstats/` (fid, n, sumdl) — per-field corpus size and total
  *     length. `avgdl` is NOT stored: it is derived as one double
  *     division `sumdl / n` at probe time, keeping every stored value an
  *     integer so incremental updates are EXACT (no float drift between
  *     an upserted index and a full rebuild).
  *
  * Score identity: [[ranked]] evaluates the same expression tree as
  * [[graft.serving.Search.rankedFields]] over the same integer inputs
  * (tf, dl, df, n, sumdl); [[phrase]] counts the same greedy
  * non-overlapping token-adjacent occurrences as
  * [[graft.serving.Search.phrase]]'s normalized substring scan; and
  * [[minShould]] reproduces [[graft.serving.Search.multiFieldMinShould]]
  * (token-exact counts, unweighted match predicate, boost-weighted
  * score) — so every indexed mode is hash-identical to its scan-path
  * scorer and the CORRECTNESS gate runs both against one oracle.
  *
  * Scale: a probe's plan touches `postings` with `term IN (...)` pushed
  * to the parquet scan (query-term-sized rows survive), broadcast-joins
  * the (tiny) stats, and ends in one per-doc aggregation + TakeOrdered —
  * no corpus scan, no corpus-wide shuffle, no per-request statistics
  * aggregation. At 100 TB the postings table is laid out sorted by
  * (fid, term) within files so row-group min/max statistics skip
  * non-matching groups; bucketing by term is the cluster-scale
  * refinement of the same layout.
  */
object SearchIndex {

  /** `analyzer` is the index-TIME analysis chain ("standard" |
    * "english" | "french" | "german" | "spanish" | "whitespace" |
    * "keyword") —
    * ES's mapping-level
    * `"analyzer": ...`, where documents tokenize at WRITE time
    * (english additionally stems). It is part of the index's grammar:
    * probes analyze queries with it (ES's search_analyzer defaults to
    * the index analyzer) and upserts re-tokenize with it, so a
    * generation can never mix analysis chains. Pre-round-15 metas
    * carry no key and read as "standard". */
  final case class Meta(idCol: String, fields: Seq[String], gen: Int,
                        analyzer: String = "standard",
                        custom: Option[String] = None,
                        searchAnalyzer: Option[String] = None)

  /** The index-time analyzers [[build]]/upsert accept. `whitespace`
    * splits on whitespace runs and KEEPS case/punctuation; `keyword`
    * emits the whole field value as ONE term (ES's noop chain) —
    * both exactly their query-time twins in the DSL. The language
    * chains (english/french/german) stem at write time. */
  private val IndexAnalyzers =
    Set("standard", "english", "french", "german", "spanish",
      "whitespace", "keyword", "custom")

  /** The chains `search_analyzer` may name — ES's mapping knob for
    * analyzing the QUERY with a different chain than the index
    * (the classic pairing: index through an edge_ngram custom
    * chain, search standard). A custom chain can be the INDEX side
    * only; the search side names a prebuilt chain. */
  private val SearchAnalyzers =
    Set("standard", "english", "french", "german", "spanish",
      "whitespace", "keyword")

  /** The parsed custom chain of a `custom`-mapped index. */
  private def chainOf(meta: Meta): graft.functions.CustomChain.Spec =
    graft.functions.CustomChain.parseJson(meta.custom.getOrElse(
      throw new IllegalStateException(
        "custom-mapped index meta carries no chain spec")))

  /** The chain QUERIES analyze with: the mapping's
    * `search_analyzer` when present, else the index analyzer —
    * ES's resolution order. */
  private def queryChainName(meta: Meta): String =
    meta.searchAnalyzer.getOrElse(meta.analyzer)

  private val Reserved = Set("fid", "dl", "term", "tf", "pos", "df_t", "n",
    "sumdl", "score", "input", "input_lc")

  /** Current generation's table directory. */
  /** Per-(session, generation-dir) memo of the lazily-read index
    * tables. A generation directory is IMMUTABLE once written (rebuild
    * and upsert write g(N+1) and flip the meta pointer), so the
    * memoized DataFrame is a pure plan/metadata cache: building
    * `spark.read.parquet` per request re-lists the directory and
    * re-reads footers on the DRIVER — a fixed serial cost per probe
    * table that dominated the indexed wildcard (21 tiny reads per
    * request). Execution still scans the parquet files every time; no
    * query RESULT is ever cached (r19). Superseded generations leave
    * dead plan objects behind — bounded by the rebuild count, like the
    * coverage memo. */
  private val tableMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()
  private def indexTable(spark: SparkSession, dir: String,
                         sub: String): DataFrame =
    tableMemo.computeIfAbsent((spark, s"$dir/$sub"),
      k => k._1.read.parquet(k._2))

  private def tableDir(path: String, meta: Meta): String =
    s"$path/g${meta.gen}"

  /** Query analysis under the INDEX's analyzer — ES's search_analyzer
    * defaults to the mapping's analyzer, so an english-mapped index
    * stems the query too (and both sides carry stop gaps). */
  private def queryAnalyze(meta: Meta, text: String): Seq[String] =
    queryChainName(meta) match {
      case "custom" =>
        graft.functions.CustomChain
          .analyzeWithPositions(chainOf(meta), text).map(_._1)
      case "english" =>
        graft.functions.EnglishAnalysis.analyze(text).toSeq
      case "french" =>
        graft.functions.FrenchAnalysis.analyze(text).toSeq
      case "german" =>
        graft.functions.GermanAnalysis.analyze(text).toSeq
      case "spanish" =>
        graft.functions.SpanishAnalysis.analyze(text).toSeq
      case "whitespace" =>
        text.split("\\s+").toSeq.filter(_.nonEmpty)
      case "keyword" => Seq(text).filter(_.nonEmpty)
      case _ => graft.functions.TextFunctions.analyzeText(text).toSeq
    }

  /** [[queryAnalyze]] with head-relative positions for the phrase
    * probes: english keeps stop-gap offsets (Lucene position
    * increments); standard/whitespace/keyword are dense. */
  private def queryPosTerms(meta: Meta, text: String): Seq[(String, Int)] =
    queryChainName(meta) match {
      case "custom" =>
        graft.functions.TextFunctions.rebase(graft.functions.CustomChain
          .analyzeWithPositions(chainOf(meta), text))
      case "english" => graft.functions.TextFunctions.rebase(
        graft.functions.EnglishAnalysis.analyzeWithPositions(text))
      case "french" => graft.functions.TextFunctions.rebase(
        graft.functions.FrenchAnalysis.analyzeWithPositions(text))
      case "german" => graft.functions.TextFunctions.rebase(
        graft.functions.GermanAnalysis.analyzeWithPositions(text))
      case "spanish" => graft.functions.TextFunctions.rebase(
        graft.functions.SpanishAnalysis.analyzeWithPositions(text))
      case _ => queryAnalyze(meta, text).zipWithIndex
    }

  /** One stacked pass over `docs`: every field's (dl, tokens) rides one
    * explode tagged `fid` — the same single-scan shape
    * Search.rankedFields uses, minus the query-term filter (an index
    * keeps every term). Under the standard analyzer, positions index
    * the standard-analyzed token sequence
    * ([[graft.functions.TextFunctions.analyzerTokens]]), matching
    * Search.tokenNorm's adjacency semantics. Under the index-time
    * `english` analyzer, terms are write-time STEMS and positions are
    * the original token indices with stopword positions CONSUMED —
    * Lucene's enablePositionIncrements, so phrases carry gaps where
    * stopwords stood — and `dl` counts the EMITTED stems (Lucene's
    * field length excludes stop-filtered tokens). */
  private def postingsOf(docs: DataFrame, fields: Seq[String],
                         idCol: String,
                         analyzer: String = "standard",
                         custom: Option[String] = None): DataFrame = {
    import graft.functions.TextFunctions.{analyzerTokenCount => tokenCount}
    if (analyzer == "english" || analyzer == "french" ||
        analyzer == "german" || analyzer == "spanish" ||
        analyzer == "custom") {
      def etoks(f: String) = analyzer match {
        case "english" => graft.functions.ArrayExpressions
          .englishTokens(coalesce(col(f), lit("")))
        case "french" => graft.functions.ArrayExpressions
          .frenchTokens(coalesce(col(f), lit("")))
        case "spanish" => graft.functions.ArrayExpressions
          .spanishTokens(coalesce(col(f), lit("")))
        case "custom" => graft.functions.ArrayExpressions
          .chainTokens(coalesce(col(f), lit("")), custom.get)
        case _ => graft.functions.ArrayExpressions
          .germanTokens(coalesce(col(f), lit("")))
      }
      docs.select(col(idCol), explode(array(fields.zipWithIndex.map {
          case (f, i) => struct(lit(i).as("fid"),
            size(etoks(f)).as("dl"), etoks(f).as("toks"))
        }: _*)).as("fs"))
        .select(col(idCol), col("fs.fid").as("fid"),
          col("fs.dl").as("dl"), explode(col("fs.toks")).as("t"))
        .select(col(idCol), col("fid"), col("dl"),
          col("t.term").as("term"), col("t.pos").as("pos"))
        .groupBy(col(idCol), col("fid"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("pos"))
    } else docs.select(col(idCol), explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(i).as("fid"),
          (if (analyzer == "standard") tokenCount(col(f))
           else size(plainTokens(f, analyzer))).as("dl"),
          plainTokens(f, analyzer).as("toks"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"), col("fs.dl").as("dl"),
        posexplode(col("fs.toks")).as(Seq("pos", "term")))
      .groupBy(col(idCol), col("fid"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("pos"))
  }

  /** Write-time token array of the non-stemming analyzers (dense
    * positions — the gapped chains ride their own expressions).
    * `whitespace` splits on whitespace runs, case and punctuation
    * KEPT; `keyword` emits the whole value as one term — an EMPTY
    * value emits none (the query side filters empties the same way,
    * so an "" term could never be asked for; indexing it would only
    * skew dl/avgdl). Null fields propagate to a null array (no
    * postings, null dl — the same contract as the standard chain). */
  private def plainTokens(f: String, analyzer: String): Column =
    analyzer match {
      case "whitespace" =>
        filter(split(col(f).cast("string"), "\\s+"), x => x =!= lit(""))
      case "keyword" =>
        when(col(f).isNotNull,
          filter(array(col(f).cast("string")), x => x =!= lit("")))
      case _ => graft.functions.TextFunctions.analyzerTokens(col(f))
    }

  /** Per-(field, term) document frequency. Postings are unique per
    * (id, fid, term) by construction (the groupBy in [[postingsOf]]), so
    * df is a PLAIN count — countDistinct here would add an Expand +
    * second aggregate for nothing; SearchIndexSpec pins the plan. */
  private[graft] def termstatsOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("fid"), col("term"))
      .agg(count(lit(1)).as("df_t"))

  /** (id, fid, dl) for EVERY (document, field) pair — dl null when the
    * field is null (such docs have no postings but still count in `n`,
    * exactly as the scan-path `count(*)` does). */
  private def doclensOf(docs: DataFrame, fields: Seq[String],
                        idCol: String,
                        analyzer: String = "standard",
                        custom: Option[String] = None): DataFrame = {
    import graft.functions.TextFunctions.{analyzerTokenCount => tokenCount}
    def dlOf(f: String): Column =
      if (analyzer == "english")
        size(graft.functions.ArrayExpressions
          .englishTokens(coalesce(col(f), lit(""))))
      else if (analyzer == "french")
        size(graft.functions.ArrayExpressions
          .frenchTokens(coalesce(col(f), lit(""))))
      else if (analyzer == "german")
        size(graft.functions.ArrayExpressions
          .germanTokens(coalesce(col(f), lit(""))))
      else if (analyzer == "spanish")
        size(graft.functions.ArrayExpressions
          .spanishTokens(coalesce(col(f), lit(""))))
      else if (analyzer == "custom")
        size(graft.functions.ArrayExpressions
          .chainTokens(coalesce(col(f), lit("")), custom.get))
      else if (analyzer == "standard") tokenCount(col(f))
      else size(plainTokens(f, analyzer))
    docs.select(col(idCol), explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(i).as("fid"), dlOf(f).as("dl"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"), col("fs.dl").as("dl"))
  }

  /** COMPLETION INPUTS — the index-side dictionary behind the
    * completion suggester (ES keeps every completion input in an
    * in-memory FST; this engine keeps them as a parquet table SORTED
    * by (fid, lowercased input), so a prefix probe is a pushed
    * StringStartsWith whose range skips non-matching row groups via
    * min/max statistics — the columnar analog of an FST prefix walk,
    * zero corpus scans). One row per (doc, field) with a non-null
    * value; `input_lc` precomputes the case fold so the probe
    * predicate stays pushdown-eligible. Storage cost: a copy of the
    * indexed string columns — exactly what ES's completion fields
    * cost. */
  private def inputsOf(docs: DataFrame, fields: Seq[String],
                       idCol: String): DataFrame =
    docs.select(col(idCol), explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(i).as("fid"),
          col(f).cast("string").as("input"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"),
        col("fs.input").as("input"))
      .filter(col("input").isNotNull)
      .withColumn("input_lc", lower(col("input")))

  /** Build the index for `docs` at `path` (drop-and-recreate — the same
    * destructive contract as `DocumentSink.save` Overwrite, which is
    * what ES's delete-and-bulk-reindex does). Missing `fields` columns
    * are an error; a field the docs lack entirely should not be
    * declared. Rebuild over an existing index stages the next generation
    * and flips the pointer — readers mid-request keep the old one. */
  def build(docs: DataFrame, fields: Seq[String], idCol: String,
            path: String, analyzer: String = "standard",
            customChain: Option[String] = None,
            searchAnalyzer: Option[String] = None): Unit = {
    require(fields.nonEmpty, "at least one field to index")
    require(!Reserved.contains(idCol),
      s"id column '$idCol' collides with an index-internal name")
    require(IndexAnalyzers.contains(analyzer),
      s"unsupported index analyzer '$analyzer' " +
        s"(${IndexAnalyzers.toSeq.sorted.mkString(", ")})")
    // a custom mapping NEEDS its chain; a named mapping must not
    // smuggle one — and the persisted form is the CANONICAL
    // serialization (parse, then re-emit), so the sidecar is stable
    // however the caller spelled the spec
    require((analyzer == "custom") == customChain.isDefined,
      "customChain goes with analyzer = \"custom\" (exactly then)")
    val chainCanon = customChain.map(j =>
      graft.functions.CustomChain.parseJson(j).json)
    searchAnalyzer.foreach(sa => require(SearchAnalyzers.contains(sa),
      s"unsupported search_analyzer '$sa' " +
        s"(${SearchAnalyzers.toSeq.sorted.mkString(", ")})"))
    val spark = docs.sparkSession
    val gen = if (exists(path)) readMeta(path).gen + 1 else 0
    val dir = s"$path/g$gen"
    postingsOf(docs, fields, idCol, analyzer, chainCanon)
      .sortWithinPartitions(col("fid"), col("term"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/postings")
    doclensOf(docs, fields, idCol, analyzer, chainCanon)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/doclens")
    inputsOf(docs, fields, idCol)
      .sortWithinPartitions(col("fid"), col("input_lc"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/inputs")
    // derive the stats tables from the WRITTEN postings/doclens (a
    // cheap re-read) rather than recomputing the corpus scan twice.
    // DIRECT reads, not indexTable: a retried build overwrites this
    // generation's files in place, and a memoized listing from the
    // failed attempt would go stale — the memo is for the immutable
    // query-path generations only
    termstatsOf(spark.read.parquet(s"$dir/postings"))
      .sortWithinPartitions(col("fid"), col("term"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/termstats")
    spark.read.parquet(s"$dir/doclens")
      .groupBy(col("fid"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/fieldstats")
    writeMeta(path, Meta(idCol, fields, gen, analyzer, chainCanon,
      searchAnalyzer))
    gcGenerations(path, keep = gen)
  }

  /** Probe the index: BM25 (or tf·idf) ranked retrieval over `fields`
    * (empty = every indexed field, in index order), identical in every
    * output bit to [[graft.serving.Search.bm25Fields]] /
    * [[graft.serving.Search.tfidfFields]] over the original corpus —
    * same expression tree, same fixed-order float sums, same rounding —
    * but reading only query-term-sized postings and KB-sized stats. */
  def ranked(spark: SparkSession, path: String, query: String,
             fields: Seq[String] = Nil, limit: Int = 100,
             bm25: Boolean = true, bestFields: Boolean = false,
             boosts: Map[String, Double] = Map.empty,
             after: Option[(Double, Any)] = None,
             afterInclusive: Boolean = false): DataFrame = {
    import graft.serving.Search.afterPredicate
    val meta = readMeta(path)
    rankedScoresOf(spark, meta, path, query, fields, bm25, bestFields,
        boosts)
      .filter(afterPredicate(after, col(meta.idCol), afterInclusive))
      .orderBy(col("score").desc, col(meta.idCol))
      .limit(limit)
  }

  /** EVERY branch of a wildcard index probe merged into ONE plan —
    * the r19 replacement for unioning [[ranked]] per entity: the old
    * shape built 2 broadcast exchanges + 1 aggregation exchange + 1
    * per-branch TakeOrdered PER ENTITY (a 7-entity wildcard = 14
    * broadcast builds serialized on the driver); this form unions the
    * entity-tagged postings/termstats/fieldstats probes, builds ONE
    * (table, fid, term, idf, avgdl) broadcast, aggregates once keyed
    * by (table, document_id), and takes one global top-k. Per-entity
    * scores stay bit-identical: each branch's fixed-order conditional
    * sums are selected by the constant `table` group key (foreign
    * branches' sums coalesce to exact 0.0 and are never picked), and
    * rounding happens once per group like the per-branch plan.
    * Returns (table, document_id, score) ordered by the shared 3-key
    * cursor order, limit applied. */
  def rankedAcrossIndexes(spark: SparkSession,
                          branches: Seq[(String, String)],
                          query: String, limit: Int = 100,
                          bm25: Boolean = true,
                          bestFields: Boolean = false,
                          after: Option[(Double, String, String)] = None)
      : DataFrame = {
    import graft.serving.Search.round4
    require(branches.nonEmpty, "at least one index to probe")
    val metas = branches.map { case (name, path) =>
      (name, path, readMeta(path)) }
    // each index analyzes the query with ITS OWN search analyzer —
    // the same per-branch analysis the unioned probes performed
    val termsOf = metas.map { case (name, _, meta) =>
      name -> queryAnalyze(meta, query).distinct.toArray }.toMap
    val postings = metas.map { case (name, path, meta) =>
      indexTable(spark, tableDir(path, meta), "postings")
        .filter(col("term").isin(termsOf(name).toSeq: _*))
        .select(lit(name).as("table"),
          col(meta.idCol).as("document_id"),
          col("fid"), col("term"), col("tf"), col("dl"))
    }.reduce(_.unionByName(_))
    val fieldstats = metas.map { case (name, path, meta) =>
      indexTable(spark, tableDir(path, meta), "fieldstats")
        .select(lit(name).as("table"), col("fid"), col("n"),
          (col("sumdl").cast("double") / col("n")).as("avgdl"))
    }.reduce(_.unionByName(_))
    val idf = metas.map { case (name, path, meta) =>
      indexTable(spark, tableDir(path, meta), "termstats")
        .filter(col("term").isin(termsOf(name).toSeq: _*))
        .select(lit(name).as("table"), col("fid"), col("term"),
          col("df_t"))
    }.reduce(_.unionByName(_))
      .join(broadcast(fieldstats), Seq("table", "fid"))
      .select(col("table"), col("fid"), col("term"),
        (if (bm25)
          log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
            (col("df_t") + 0.5))
        else ((col("n") + 1.0) / (col("df_t") + 1.0))).as("idf"),
        col("avgdl"))
    val perTerm: Column =
      if (bm25)
        col("idf") * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * col("idf")
    // per-entity score expression — [[rankedScoresOf]]'s fieldScore
    // verbatim with the table gate in the condition; selected by the
    // constant group key
    val scoreByEntity: Column = metas.foldLeft(
        lit(0.0): Column) { case (acc, (name, _, meta)) =>
      val terms = termsOf(name)
      val parts = meta.fields.indices.map { i =>
        terms.toSeq.map(t =>
            coalesce(sum(when(col("table") === name &&
              col("term") === t && col("fid") === i, perTerm)),
              lit(0.0)))
          .reduce(_ + _)
      }
      val combined =
        if (parts.isEmpty) lit(0.0)
        else if (parts.size == 1) parts.head
        else if (bestFields) greatest(parts: _*)
        else parts.reduce(_ + _)
      when(col("table") === name, round4(combined)).otherwise(acc)
    }
    val scored = postings.join(broadcast(idf), Seq("table", "fid", "term"))
      .groupBy(col("table"), col("document_id"))
      .agg(scoreByEntity.as("score"))
    // the shared 3-key cursor: each branch's inclusive flag folds into
    // one predicate gated by the same table key
    val afterPred = after.map { case (s, id, t) =>
      metas.foldLeft(lit(false): Column) { case (acc, (name, _, _)) =>
        when(col("table") === name,
          graft.serving.Search.afterPredicate(Some((s, id: Any)),
            col("document_id"), inclusive = name > t)).otherwise(acc)
      }
    }.getOrElse(lit(true))
    scored.filter(afterPred)
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
  }

  /** The (idCol, score) frame of [[ranked]] BEFORE pagination — one
    * row per doc matching ≥1 query term, carrying the rounded
    * combined score. The index-probe twin of
    * [[graft.serving.Search.rankedAll]]: the DSL translator joins
    * per-clause probe frames instead of running corpus scans when the
    * body's target has a write-time index (bit-identity pinned in
    * SearchIndexSpec). */
  def rankedScores(spark: SparkSession, path: String, query: String,
                   fields: Seq[String] = Nil,
                   bm25: Boolean = true, bestFields: Boolean = false,
                   boosts: Map[String, Double] = Map.empty): DataFrame =
    rankedScoresOf(spark, readMeta(path), path, query, fields, bm25,
      bestFields, boosts)

  private def rankedScoresOf(spark: SparkSession, meta: Meta,
                             path: String, query: String,
                             fields: Seq[String],
                             bm25: Boolean, bestFields: Boolean,
                             boosts: Map[String, Double]): DataFrame = {
    import graft.serving.Search.round4
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty, s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    val terms = queryAnalyze(meta, query).distinct.toArray
    // postings probe: both predicates reach the parquet scan as pushed
    // filters — the surviving rows are (query term × matching doc)-sized
    val p = indexTable(spark, dir, "postings")
      .filter(col("term").isin(terms.toSeq: _*) &&
        col("fid").isin(fids: _*))
    val stats = indexTable(spark, dir, "fieldstats")
      .filter(col("fid").isin(fids: _*))
      .select(col("fid"), col("n"),
        // exact-integer sum ÷ count — the identical double the scan
        // path's sum(tokenCount)/count(*) aggregate produces
        (col("sumdl").cast("double") / col("n")).as("avgdl"))
    // r19: avgdl RIDES the per-(fid, term) idf broadcast instead of a
    // second fieldstats scan + third broadcast joined on fid alone —
    // every (fid, term) of the postings probe has a termstats row (the
    // stats derive from the postings at build time), and avgdl is
    // constant per fid, so the single (fid, term) join attaches the
    // identical doubles. 3 scans + 2 broadcasts per branch, was 4 + 3 —
    // on a 7-entity wildcard that is 7 fewer scans and 7 fewer
    // broadcast exchanges per request.
    val idfCols =
      (if (bm25)
        log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
          (col("df_t") + 0.5)).as("idf")
      else ((col("n") + 1.0) / (col("df_t") + 1.0)).as("idf")) ::
        (if (bm25) List(col("avgdl")) else Nil)
    val idf = indexTable(spark, dir, "termstats")
      .filter(col("term").isin(terms.toSeq: _*) &&
        col("fid").isin(fids: _*))
      .join(broadcast(stats), Seq("fid"))
      .select(col("fid") :: col("term") :: idfCols: _*)
    val grouped = p
    val perTerm: Column =
      if (bm25)
        col("idf") * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * col("idf")
    // per-field score: fixed-order term sum of single-row conditionals —
    // positionally identical to Search.rankedFields.fieldScore
    def fieldScore(i: Int): Column = {
      val raw = terms.toSeq.map(t =>
          coalesce(sum(when(col("term") === t && col("fid") === fids(i),
            perTerm)), lit(0.0)))
        .reduce(_ + _)
      boosts.get(useFields(i)).map(b => raw * b).getOrElse(raw)
    }
    val parts = useFields.indices.map(fieldScore)
    val combined =
      if (parts.size == 1) parts.head
      else if (bestFields) greatest(parts: _*)
      else parts.reduce(_ + _)
    grouped.join(broadcast(idf), Seq("fid", "term"))
      .groupBy(col(idCol))
      .agg(round4(combined).as("score"))
  }

  /** PHRASE probe (ES `multi_match` `type: "phrase"` over the index):
    * the query's tokens must appear consecutively, in order, in a field;
    * scored by the greedy non-overlapping occurrence count summed across
    * `fields` — the exact count [[graft.serving.Search.phrase]]'s
    * normalized-substring `replace` scan produces, so both paths share
    * one oracle. Returns (idCol, score) — the caller fetches document
    * bodies by id, like ES fetches `_source` after scoring. `slop > 0`
    * switches to sloppy proximity (adjusted-position span `<= slop`,
    * transposed alignments included) counted by head positions —
    * [[graft.serving.Search.slopCount]]'s contract, so the sloppy
    * scan path and this probe also share one oracle.
    *
    * Plan: postings probed with `term IN (...)` pushed down, then per
    * (doc, field) the sorted position lists intersect shifted-by-slot
    * (a HOF over query-sized arrays on candidate rows only), then one
    * per-doc aggregation + TakeOrdered. No corpus scan. */
  def phrase(spark: SparkSession, path: String, phraseQuery: String,
             fields: Seq[String] = Nil, limit: Int = 100,
             boosts: Map[String, Double] = Map.empty,
             after: Option[(Double, Any)] = None,
             afterInclusive: Boolean = false,
             slop: Int = 0): DataFrame = {
    require(slop >= 0, "slop must be >= 0")
    import graft.serving.Search.afterPredicate
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty, s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    val posTerms = queryPosTerms(meta, phraseQuery)
    // an all-stopword phrase against an english index (or a blank one
    // against whitespace/keyword) analyzes to zero terms: no hits,
    // not an error (zero_terms_query "none")
    if (posTerms.isEmpty && queryChainName(meta) != "standard")
      return indexTable(spark, dir, "postings")
        .select(col(idCol), lit(0).as("score")).limit(0)
    require(posTerms.nonEmpty, "empty phrase")
    val perField =
      phraseCounts(spark, dir, idCol, fids, posTerms, slop)
    def fieldScore(i: Int): Column = {
      val raw = coalesce(sum(when(col("fid") === fids(i), col("_pf"))),
        lit(0)).cast("int")
      boosts.get(useFields(i)).map(b => raw * b).getOrElse(raw)
    }
    perField.groupBy(col(idCol))
      .agg(useFields.indices.map(fieldScore).reduce(_ + _).as("score"))
      .filter(col("score") > 0)
      .filter(afterPredicate(after, col(idCol), afterInclusive))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** Per-(document, field) phrase counts from the positional postings
    * — the ONE matcher behind [[phrase]] (count scoring) and
    * [[phraseRanked]] (phrase-frequency BM25), so the two probes can
    * never diverge. Candidates must hold every distinct term
    * (postings are term-unique per (id, fid), so the row count IS the
    * distinct-term count); match starts intersect the sorted position
    * lists — shifted adjacency at slop 0, the shared-budget sloppy
    * walk otherwise (Search.gappedSlopCount's contract: adjusted-span
    * <= slop, transposed alignments included, same overflow clamp);
    * slop-0 self-overlapping phrases ("a a" in "a a a") count greedily
    * left-to-right, the scan path's replace() semantics. Returns
    * (idCol, fid, dl, _pf). */
  /** Pruned positional postings rows for a term/field set — the ONE
    * candidate-construction read the positional probes (phrase and
    * span) share, so the layout/pruning predicate lives in a single
    * place. */
  private def prunedPostings(spark: SparkSession, dir: String,
                             idCol: String, fids: Seq[Int],
                             terms: Seq[String]): DataFrame =
    indexTable(spark, dir, "postings")
      .filter(col("term").isin(terms: _*) &&
        col("fid").isin(fids: _*))
      .select(col(idCol), col("fid"), col("dl"), col("term"), col("pos"))

  private def phraseCounts(spark: SparkSession, dir: String,
                           idCol: String, fids: Seq[Int],
                           posTerms: Seq[(String, Int)],
                           slop: Int): DataFrame = {
    val terms = posTerms.map(_._1)
    val distinctTerms = terms.distinct
    val k = terms.size
    // phrase span in positions — the greedy non-overlap stride; for a
    // dense query (offset_i == i) this is the old term count k
    val width = posTerms.last._2 + 1
    val p = prunedPostings(spark, dir, idCol, fids, distinctTerms)
    // dl is constant per (id, fid); min() is the deterministic pick
    val candidates = p.groupBy(col(idCol), col("fid"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("pos"))))
        .as("tp"), count(lit(1)).as("_nt"), min(col("dl")).as("dl"))
      .filter(col("_nt") === distinctTerms.size)
    val headPos = element_at(col("tp"), lit(terms.head))
    val starts =
      if (k == 1) headPos
      else if (slop == 0) filter(headPos, s => posTerms.drop(1).map {
        case (t, off) =>
          array_contains(element_at(col("tp"), lit(t)), s + lit(off))
      }.reduce(_ && _))
      else {
        // Search.gappedSlopCount's shared-budget walk (the adjusted
        // positions pp - offset_i must span <= slop — Lucene's
        // matchLength), order-free like Lucene's SloppyPhraseMatcher:
        // transposed alignments match when their span fits (the span
        // arithmetic alone prices any out-of-order pair >= 2, so slop
        // 0/1 stay in-order for free). Same-term slots must take
        // distinct positions (Lucene's repeating-terms rule; distinct
        // terms can't collide — one token per position).
        val sl = math.min(slop, 1 << 24)
        def rest(i: Int, taken: List[(String, Column)],
                 lo: Column, hi: Column): Column =
          if (i == k) lit(true)
          else org.apache.spark.sql.functions.exists(
            element_at(col("tp"), lit(terms(i))), pp => {
              val adj = pp - lit(posTerms(i)._2)
              taken.collect { case (t, q) if t == terms(i) =>
                pp =!= q }.foldLeft(
                adj >= hi - lit(sl) && adj <= lo + lit(sl))(_ && _) &&
                rest(i + 1, (terms(i), pp) :: taken,
                  least(lo, adj), greatest(hi, adj))
            })
        filter(headPos, s => rest(1, List((terms.head, s)), s, s))
      }
    // pf counting must mirror each route's SCAN twin exactly: every
    // gapped or sloppy twin (gappedPhraseCount / gappedSlopCount /
    // slopCount) counts DISTINCT HEAD positions — overlapping matches
    // each count — so only the dense slop-0 repeated-term case (whose
    // twin is substrCount's non-overlapping forward scan) takes the
    // greedy stride fold
    val gapless = posTerms.zipWithIndex.forall { case ((_, o), i) => o == i }
    val cnt =
      if (slop > 0 || distinctTerms.size == k || !gapless) size(starts)
      else aggregate(starts,
        struct(lit(0).as("c"), lit(-1).as("free")),
        (acc, s) => when(s >= acc.getField("free"),
            struct((acc.getField("c") + lit(1)).as("c"),
              (s + lit(width)).as("free")))
          .otherwise(acc),
        acc => acc.getField("c"))
    candidates.select(col(idCol), col("fid"), col("dl"), cnt.as("_pf"))
  }

  /** PHRASE-FREQUENCY BM25 probe — the index-side twin of the DSL's
    * `match_phrase` scoring (ES's PhraseQuery model): phrase counts
    * come from the positional postings exactly as [[phrase]] computes
    * them, `dl` rides the postings rows, N/avgdl come from
    * `fieldstats`, per-term doc frequencies from `termstats`, and the
    * idf is the PHRASE-ORDERED sum of the terms' idfs (one per
    * position, like Lucene's termStatistics collection). Fields
    * combine as a fixed-order sum with ONE final rounding (the
    * rankedFields convention); a single-field probe is bit-identical
    * to the scan path's phrase scoring — one oracle, two plans. Same
    * pruned-postings IO shape as [[phrase]]: no corpus scan. */
  def phraseRanked(spark: SparkSession, path: String, phraseQuery: String,
                   fields: Seq[String] = Nil, limit: Int = 100,
                   slop: Int = 0,
                   after: Option[(Double, Any)] = None,
                   afterInclusive: Boolean = false,
                   analyzer: String = "standard"): DataFrame = {
    require(slop >= 0, "slop must be >= 0")
    import graft.serving.Search.{afterPredicate, round4}
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty, s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    // against a STANDARD index, `analyzer` is the QUERY-side knob
    // (english stems matched as literal standard terms with
    // stop-position gaps, exactly the scan path's phraseLeg); a
    // NON-standard-mapped index analyzes the query with the FIELD's
    // chain regardless (ES's search_analyzer defaults to the
    // mapping's analyzer — both sides stem / split / keep the value
    // whole together)
    val effAnalyzer =
      if (meta.analyzer != "standard" || meta.searchAnalyzer.isDefined)
        queryChainName(meta)
      else analyzer
    val posTerms: Seq[(String, Int)] = effAnalyzer match {
      case "standard" =>
        graft.functions.TextFunctions.analyzeText(phraseQuery)
          .zipWithIndex.toSeq
      case "english" =>
        graft.functions.TextFunctions.rebase(graft.functions
          .EnglishAnalysis.analyzeWithPositions(phraseQuery))
      case "french" =>
        graft.functions.TextFunctions.rebase(graft.functions
          .FrenchAnalysis.analyzeWithPositions(phraseQuery))
      case "german" =>
        graft.functions.TextFunctions.rebase(graft.functions
          .GermanAnalysis.analyzeWithPositions(phraseQuery))
      case "spanish" =>
        graft.functions.TextFunctions.rebase(graft.functions
          .SpanishAnalysis.analyzeWithPositions(phraseQuery))
      case "custom" =>
        queryPosTerms(meta, phraseQuery)
      case "whitespace" | "keyword"
          if queryChainName(meta) == effAnalyzer =>
        // only as the mapping's own query chain — the query-side
        // whitespace/keyword rewrites against a standard index live
        // in the DSL's scan path (sentinel-gated), not here
        queryPosTerms(meta, phraseQuery)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported analyzer '$other' (query-side: standard, " +
          "english, french, german, spanish; whitespace/keyword " +
          "only as the index's own mapping chain)")
    }
    // an all-stopword english phrase (or a blank whitespace/keyword
    // one) analyzes to zero terms — the scan path's phraseLeg returns
    // None (ES zero_terms_query "none": no hits, not an error); the
    // indexed twin must mirror that, so the empty result keeps the
    // (id, score) shape without reading postings
    if (posTerms.isEmpty && effAnalyzer != "standard")
      return indexTable(spark, dir, "postings")
        .select(col(idCol), lit(0.0).as("score")).limit(0)
    require(posTerms.nonEmpty, "empty phrase")
    val terms = posTerms.map(_._1)
    val distinctTerms = terms.distinct
    val perField = phraseCounts(spark, dir, idCol, fids, posTerms, slop)
    val stats = indexTable(spark, dir, "fieldstats")
      .filter(col("fid").isin(fids: _*))
      .select(col("fid"), col("n"),
        (col("sumdl").cast("double") / col("n")).as("avgdl"))
    val dfm = indexTable(spark, dir, "termstats")
      .filter(col("term").isin(distinctTerms: _*) &&
        col("fid").isin(fids: _*))
      .groupBy(col("fid"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("df_t"))))
        .as("dfm"))
    // phrase-ordered idf sum + saturation — the exact expression the
    // scan path's Ctx.phraseBm25Score evaluates, over the identical
    // integers (pf, dl, df_t, n, sumdl)
    def dfOf(t: String): Column = element_at(col("dfm"), lit(t))
    val idfSum = terms.map(t =>
      log(lit(1.0) + (col("n") - dfOf(t) + 0.5) / (dfOf(t) + 0.5)))
      .reduce(_ + _)
    val fscore = idfSum * ((col("_pf") * 2.2) /
      (col("_pf") + lit(1.2) * (lit(0.25) +
        lit(0.75) * col("dl") / col("avgdl"))))
    val withScore = perField
      .join(broadcast(stats), Seq("fid"))
      .join(broadcast(dfm), Seq("fid"))
      .select(col(idCol), col("fid"), fscore.as("_fs"), col("_pf"))
    val parts = useFields.indices.map(i =>
      coalesce(sum(when(col("fid") === fids(i), col("_fs"))), lit(0.0)))
    // the match predicate is on the PHRASE COUNT (the scan path's
    // `cnt > 0`), never on the rounded score — a tiny-idf corpus can
    // round a real match to 0.0 and it must still be a hit
    withScore.groupBy(col(idCol))
      .agg(round4(parts.reduce(_ + _)).as("score"),
        sum(col("_pf")).as("_tpf"))
      .filter(col("_tpf") > 0).drop("_tpf")
      .filter(afterPredicate(after, col(idCol), afterInclusive))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** SPAN-NEAR probe — the index-side twin of the DSL span family's
    * scan matcher ([[graft.serving.Search.spanNearCount]] /
    * `spanPairCount`): each slot is a token SET (a `span_term` or
    * `span_or` leaf), matched over the positional postings with the
    * SAME window arithmetic (ordered: head positions admitting an
    * in-order completion with gap sum <= slop; unordered pairs:
    * |p − q| − 1 <= slop), span-frequency scored like the scan path's
    * occurrence-count convention. IO is query-term-sized postings
    * rows only — no corpus scan; bit-identical hits and scores to the
    * scan path (one oracle, two plans — [[SearchIndexSpec]] pins it). */
  def spanRanked(spark: SparkSession, path: String,
                 slots: Seq[Seq[String]], slop: Int,
                 inOrder: Boolean,
                 fields: Seq[String] = Nil,
                 limit: Int = 100): DataFrame = {
    require(slots.nonEmpty && slots.forall(_.nonEmpty),
      "empty span slots")
    require(slop >= 0, "slop must be >= 0")
    require(inOrder || slots.size <= 2,
      "unordered span supports two slots (in_order composes any number)")
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty,
      s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    val allTerms = slots.flatten.distinct.map(_.toLowerCase)
    val lowSlots = slots.map(_.map(_.toLowerCase).distinct)
    val cand = prunedPostings(spark, dir, idCol, fids, allTerms)
      .groupBy(col(idCol), col("fid"))
      .agg(map_from_entries(
        collect_list(struct(col("term"), col("pos")))).as("tp"))
    // per-slot positions: the sorted distinct union of the slot's
    // terms' position lists (a position holds ONE token, so the union
    // is exactly the scan path's posOf set)
    def posOf(i: Int): Column = array_sort(array_distinct(flatten(
      array(lowSlots(i).map(t =>
        coalesce(element_at(col("tp"), lit(t)),
          array().cast("array<int>"))): _*))))
    val present = lowSlots.indices.map(i => size(posOf(i)) > 0)
      .reduce(_ && _)
    val sl = math.min(slop, 1 << 24)
    val cnt: Column =
      if (lowSlots.size == 1) size(posOf(0))
      else if (inOrder) {
        def rest(i: Int, prev: Column, first: Column): Column =
          if (i == lowSlots.size) lit(true)
          else org.apache.spark.sql.functions.exists(posOf(i), pp =>
            pp > prev && pp <= first + lit(i + sl) &&
              rest(i + 1, pp, first))
        size(filter(posOf(0), s => rest(1, s, s)))
      } else
        size(filter(posOf(0), pp =>
          org.apache.spark.sql.functions.exists(posOf(1), qq =>
            qq =!= pp &&
              greatest(pp, qq) - least(pp, qq) - 1 <= lit(sl))))
    cand.filter(present)
      .select(col(idCol), cnt.as("_pf"))
      .groupBy(col(idCol))
      .agg(sum(col("_pf")).cast("double").as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** `minimum_should_match` / `operator: "and"` probe: at least
    * `minMatch` of the query's distinct terms must token-match in some
    * field (clamped to all-terms — AND — above the term count, like
    * [[graft.serving.Search.multiFieldMinShould]]); scored by token-
    * exact occurrence counts, boost-weighted per field, match predicate
    * unweighted. Hash-identical to the scan path over the corpus; one
    * pruned postings probe + one per-doc aggregation. Returns
    * (idCol, score). */
  def minShould(spark: SparkSession, path: String, query: String,
                fields: Seq[String] = Nil, minMatch: Int = Int.MaxValue,
                limit: Int = 100,
                boosts: Map[String, Double] = Map.empty,
                after: Option[(Double, Any)] = None,
                afterInclusive: Boolean = false): DataFrame = {
    import graft.serving.Search.afterPredicate
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty, s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    val terms = queryAnalyze(meta, query).distinct
    require(terms.nonEmpty, "empty query")
    val need = math.max(1, math.min(minMatch, terms.size))
    val p = indexTable(spark, dir, "postings")
      .filter(col("term").isin(terms: _*) && col("fid").isin(fids: _*))
      .select(col(idCol), col("fid"), col("term"), col("tf"))
    // tf per (term, field) as conditional aggregates — the index-side
    // mirror of the scan path's per-term/per-field substrCount grid,
    // summed in the identical fixed order (terms outer, fields inner)
    def raw(t: String, i: Int): Column =
      coalesce(sum(when(col("term") === t && col("fid") === fids(i),
        col("tf"))), lit(0L)).cast("int")
    val score = terms.map(t => useFields.indices.map { i =>
        val r = raw(t, i)
        boosts.get(useFields(i)).map(b => r * b).getOrElse(r)
      }.reduce(_ + _)).reduce(_ + _)
    val matched = terms.map(t =>
        when(useFields.indices.map(raw(t, _)).reduce(_ + _) > 0, 1)
          .otherwise(0))
      .reduce(_ + _)
    p.groupBy(col(idCol))
      .agg(score.as("score"), matched.as("_matched"))
      .filter(col("_matched") >= need).drop("_matched")
      .filter(afterPredicate(after, col(idCol), afterInclusive))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** TERM-SUGGESTER probe (ES suggest): candidates come from the
    * index VOCABULARY (`termstats` — per-field (term, doc-frequency)
    * rows, orders of magnitude smaller than the corpus), never from
    * re-scanning documents — Lucene's DirectSpellChecker shape.
    * Gating and ranking are [[graft.serving.EsDsl.suggestFromVocab]],
    * and termstats' df IS the scan path's doc frequency — one oracle,
    * two plans. */
  def suggest(spark: SparkSession, path: String, field: String,
              text: String, size: Int = 5, maxEdits: Int = 2,
              mode: String = "missing",
              byFrequency: Boolean = false): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2, "max_edits must be 1 or 2")
    require(size >= 1 && size <= 100, "suggest size must be 1..100")
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val fidOf = meta.fields.zipWithIndex.toMap
    require(fidOf.contains(field), s"field not in index: $field")
    val toks =
      graft.functions.TextFunctions.analyzeText(text).distinct
    require(toks.nonEmpty, "suggest text has no tokens")
    val vocab = indexTable(spark, dir, "termstats")
      .filter(col("fid") === fidOf(field))
      .select(col("term"), col("df_t").as("freq"))
    graft.serving.EsDsl.suggestFromVocab(vocab, toks, size, maxEdits,
      mode, byFrequency)
  }

  /** FUZZY probe (ES `match` `fuzziness`): each query term expands
    * against the index VOCABULARY (`termstats` — per-field distinct
    * terms, orders of magnitude smaller than the corpus) by Levenshtein
    * distance, then the expanded term set probes postings through a
    * broadcast join. This is the Spark-first shape of what Lucene's FST
    * fuzzy automaton does: candidate terms come from the dictionary,
    * never from re-scanning documents. Scored like
    * [[graft.serving.Search.multiFieldFuzzy]] (total fuzzy-matching
    * token count, OR across terms) — hash-identical, one oracle.
    * Returns (idCol, score). */
  def fuzzy(spark: SparkSession, path: String, query: String,
            fields: Seq[String] = Nil, fuzziness: String = "AUTO",
            limit: Int = 100,
            boosts: Map[String, Double] = Map.empty,
            after: Option[(Double, Any)] = None,
            afterInclusive: Boolean = false,
            prefixLength: Int = 0,
            maxExpansions: Option[Int] = None,
            transpositions: Boolean = true): DataFrame = {
    import graft.serving.Search.{afterPredicate, editDistance, fuzzyEdits}
    require(prefixLength >= 0, "prefix_length must be >= 0")
    maxExpansions.foreach(n => require(
      n > 0 && n <= graft.serving.Search.MaxExpansionsCeiling,
      s"max_expansions must be 1..${graft.serving.Search.MaxExpansionsCeiling}"))
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty, s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    val terms =
      graft.functions.TextFunctions.analyzeText(query).distinct
    require(terms.nonEmpty, "empty query")
    val edits = terms.map(t => fuzzyEdits(t, fuzziness).getOrElse(
      throw new IllegalArgumentException(
        s"invalid fuzziness '$fuzziness'")))
    // vocabulary expansion: one scan of the (tiny) termstats table per
    // query term, tagged with the query slot it expands. prefix_length
    // narrows the dictionary probe (the first `prefixLength` chars are
    // exempt from edits — Lucene's nonFuzzyPrefix); max_expansions caps
    // each slot's expansion to the first N distinct terms ordered
    // (edit distance asc, term asc) ACROSS the searched fields — the
    // same capped set Search.fuzzyExpansionSets derives from the
    // corpus, so both paths keep sharing one oracle.
    val vocab = indexTable(spark, dir, "termstats")
      .filter(col("fid").isin(fids: _*))
      .select(col("fid"), col("term"))
    val cands = terms.zipWithIndex.map { case (t, qi) =>
        val p = t.take(prefixLength)
        val pre = if (p.isEmpty) vocab
          else vocab.filter(col("term").startsWith(p))
        val v = pre.filter(
          editDistance(col("term"), t, transpositions) <= edits(qi))
        val capped = maxExpansions match {
          case None => v
          case Some(n) =>
            val e = v.select(col("term")).distinct()
              .withColumn("_d", editDistance(col("term"), t,
                transpositions))
              .orderBy(col("_d").asc, col("term").asc)
              .limit(n).select("term")
            v.join(e, Seq("term"))
        }
        capped.select(col("fid"), col("term"), lit(qi).as("qi"))
      }.reduce(_.unionByName(_))
    val p = indexTable(spark, dir, "postings")
      .filter(col("fid").isin(fids: _*))
      .select(col(idCol), col("fid"), col("term"), col("tf"))
    // same fixed summation order as the scan path: terms outer, fields
    // inner; a token within distance of TWO query terms counts in both
    // (the candidate union carries one row per (slot, term))
    def raw(qi: Int, i: Int): Column =
      coalesce(sum(when(col("qi") === qi && col("fid") === fids(i),
        col("tf"))), lit(0L)).cast("int")
    val score = terms.indices.map(qi => useFields.indices.map { i =>
        val r = raw(qi, i)
        boosts.get(useFields(i)).map(b => r * b).getOrElse(r)
      }.reduce(_ + _)).reduce(_ + _)
    p.join(broadcast(cands), Seq("fid", "term"))
      .groupBy(col(idCol))
      .agg(score.as("score"))
      .filter(col("score") > 0)
      .filter(afterPredicate(after, col(idCol), afterInclusive))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** MORE_LIKE_THIS statistics probe: (corpus doc count, per-term doc
    * frequency over `field`) for a FIXED term set — the numbers
    * [[graft.serving.EsDsl]]'s more_like_this term selection needs,
    * served from `fieldstats`/`termstats` instead of the scan path's
    * `df.count()` + filtered doc-freq aggregate (two full corpus scans
    * per request at 100 TB, for integers the index already stores).
    * Bit-identical by construction: `n` counts every document
    * (doclens keeps null-field rows), `df_t` counts one posting row
    * per (doc, term) — the exact integers the scan aggregates produce,
    * so term selection (and therefore the whole MLT query) is
    * hash-identical on both paths. Bounded driver artifact: ≤ |terms|
    * rows plus one count. */
  def docFreqs(spark: SparkSession, path: String, field: String,
               terms: Seq[String]): (Long, Map[String, Long]) = {
    val (nDf, dfDf) = docFreqFrames(spark, path, field, terms)
    val n = nDf.collect().headOption.map(_.getLong(0)).getOrElse(0L)
    val dfs = dfDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (n, dfs)
  }

  /** The two probe frames of [[docFreqs]], exposed lazily so tests can
    * pin their IO: every scan in both plans reads ONLY index tables. */
  private[graft] def docFreqFrames(spark: SparkSession, path: String,
                                   field: String, terms: Seq[String])
      : (DataFrame, DataFrame) = {
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val fidOf = meta.fields.zipWithIndex.toMap
    require(fidOf.contains(field), s"field not in index: $field")
    val fid = fidOf(field)
    (indexTable(spark, dir, "fieldstats")
       .filter(col("fid") === fid).select(col("n")),
     indexTable(spark, dir, "termstats")
       .filter(col("fid") === fid && col("term").isin(terms: _*))
       .select(col("term"), col("df_t")))
  }

  /** Incremental maintenance — the index-side twin of
    * [[DocumentSink.upsert]]'s replace-by-id semantics (REST re-sync,
    * reference: src/routes/ticket_routes.py:91-96): documents in `batch`
    * REPLACE same-id documents in the index. Statistics update by
    * integer DELTAS computed from the batch and the removed docs'
    * postings only (never by re-tokenizing the corpus):
    *   df'    = df    − removed postings rows + added rows (per term)
    *   n'     = n     − removed rows + added rows
    *   sumdl' = sumdl − removed dl   + added dl
    * All integer arithmetic, so the upserted index is bit-identical to a
    * full rebuild over the merged corpus (positions included — postings
    * rows carry them wholesale). The merged tables stage as the NEXT
    * GENERATION directory and the meta pointer flips in one atomic
    * rename; at object-store scale the same contract lands on a
    * Delta/Iceberg MERGE + snapshot commit. A batch column missing from
    * the index's field list scores as null (the allowMissingColumns
    * union shape). */
  def upsert(batch: DataFrame, path: String): Unit =
    upsert(batch, deletes = None, path)

  /** Upsert WITH DELETIONS — the full changelog shape (R3's
    * upsert/delete stream applied to the index, never to the corpus):
    * `deletes` is a single-column frame of ids to drop. Deleted docs
    * leave through the same integer-delta machinery as replaced ones
    * (their old postings subtract from df_t/fieldstats; nothing is
    * added back), so the result still equals a full rebuild of the
    * post-change corpus bit-for-bit. An id in BOTH frames is
    * DELETED — the deterministic rule for uncompacted changelogs
    * (a delete is terminal; a later upsert re-inserting the doc
    * belongs to the next batch). */
  def upsert(batch: DataFrame, deletes: Option[DataFrame],
             path: String): Unit = {
    val spark = batch.sparkSession
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val idCol = meta.idCol
    val full0 = meta.fields.foldLeft(batch)((d, f) =>
      if (d.columns.contains(f)) d
      else d.withColumn(f, lit(null).cast("string")))
    deletes.foreach(d => require(d.columns.length == 1,
      "deletes must be a single-column frame of ids"))
    // deletes win over batch rows with the same id
    val full = deletes.map(d => full0.join(
        broadcast(d.toDF(idCol)), Seq(idCol), "left_anti"))
      .getOrElse(full0)
    val keys = deletes
      .map(d => full.select(col(idCol)).unionByName(d.toDF(idCol)))
      .getOrElse(full.select(col(idCol)))
      .distinct()
    // the batch re-tokenizes with the INDEX's analysis chain — a
    // generation can never mix analysis chains
    val newPost = postingsOf(full, meta.fields, idCol, meta.analyzer,
      meta.custom)
    val newLens = doclensOf(full, meta.fields, idCol, meta.analyzer,
      meta.custom)
    val oldPost = indexTable(spark, dir, "postings")
    val oldLens = indexTable(spark, dir, "doclens")
    val remPost = oldPost.join(keys, Seq(idCol), "left_semi")
    val remLens = oldLens.join(keys, Seq(idCol), "left_semi")
    // ---- integer deltas ------------------------------------------------
    // same uniqueness argument as in build: one posting row per
    // (id, fid, term) on both the new and removed sides
    val dfDelta = newPost.groupBy(col("fid"), col("term"))
      .agg(count(lit(1)).as("d"))
      .unionByName(remPost.groupBy(col("fid"), col("term"))
        .agg((-count(lit(1))).as("d")))
      .groupBy(col("fid"), col("term")).agg(sum(col("d")).as("d"))
    val termstats2 = indexTable(spark, dir, "termstats")
      .join(dfDelta, Seq("fid", "term"), "full")
      .select(col("fid"), col("term"),
        (coalesce(col("df_t"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .cast("long").as("df_t"))
      .filter(col("df_t") > 0)
    val lenDelta = newLens.groupBy(col("fid"))
      .agg(count(lit(1)).as("dn"),
        coalesce(sum(col("dl")), lit(0L)).as("dsum"))
      .unionByName(remLens.groupBy(col("fid"))
        .agg((-count(lit(1))).as("dn"),
          (-coalesce(sum(col("dl")), lit(0L))).as("dsum")))
      .groupBy(col("fid"))
      .agg(sum(col("dn")).as("dn"), sum(col("dsum")).as("dsum"))
    val fieldstats2 = indexTable(spark, dir, "fieldstats")
      .join(lenDelta, Seq("fid"), "left")
      .select(col("fid"),
        (col("n") + coalesce(col("dn"), lit(0L))).cast("long").as("n"),
        (coalesce(col("sumdl"), lit(0L)) + coalesce(col("dsum"), lit(0L)))
          .cast("long").as("sumdl"))
    val postings2 = oldPost.join(keys, Seq(idCol), "left_anti")
      .unionByName(newPost)
    val doclens2 = oldLens.join(keys, Seq(idCol), "left_anti")
      .unionByName(newLens)
    // completion inputs ride the same replace-by-id delta; an index
    // whose current generation predates the inputs table (built
    // pre-round-15) skips it — its completion probes fall back to the
    // scan path until the next full rebuild
    val inputs2 =
      if (new java.io.File(s"$dir/inputs").isDirectory)
        Some(indexTable(spark, dir, "inputs")
          .join(keys, Seq(idCol), "left_anti")
          .unionByName(inputsOf(full, meta.fields, idCol)))
      else None
    // ---- stage the next generation, then flip the pointer --------------
    val gen2 = meta.gen + 1
    val dir2 = s"$path/g$gen2"
    postings2.sortWithinPartitions(col("fid"), col("term"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir2/postings")
    doclens2.write.mode(SaveMode.Overwrite).parquet(s"$dir2/doclens")
    inputs2.foreach(_.sortWithinPartitions(col("fid"), col("input_lc"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir2/inputs"))
    termstats2.sortWithinPartitions(col("fid"), col("term"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir2/termstats")
    fieldstats2.write.mode(SaveMode.Overwrite).parquet(s"$dir2/fieldstats")
    writeMeta(path, meta.copy(gen = gen2))
    gcGenerations(path, keep = gen2)
  }

  /** The single-row phrase-BM25 statistics frame EsDsl's phrase
    * clauses reference (`__phb_n`, `__phb_avgdl_<fi>`, `__phb_df_<ti>`
    * — fi/ti = positions in `fields`/`terms`), served from
    * fieldstats/termstats instead of a corpus aggregate. Values are
    * the SAME exact integers the scan-path aggregate computes (n and
    * sumdl are the index's maintained integer sums; df is the
    * postings row count per (fid, term), i.e. docs holding the term),
    * and avgdl is the identical long-over-long double division — so
    * phrase scores stay bit-identical. Bounded driver artifact: the
    * collects are |fields| + |terms| rows of tiny index tables. */
  def phraseStats(spark: SparkSession, path: String,
                  fields: Seq[String],
                  terms: Seq[(String, String)]): DataFrame = {
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = fields.filterNot(fidOf.contains)
    require(missing.isEmpty,
      s"fields not in index: ${missing.mkString(", ")}")
    val fids = fields.map(fidOf)
    val fsRows = indexTable(spark, dir, "fieldstats")
      .filter(col("fid").isin(fids: _*))
      .select(col("fid"), col("n"), col("sumdl"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tsRows = indexTable(spark, dir, "termstats")
      .filter(col("fid").isin(fids.distinct: _*) &&
        col("term").isin(terms.map(_._2).distinct: _*))
      .select(col("fid"), col("term"), col("df_t"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val n: Long = fids.headOption.flatMap(fsRows.get).map(_._1)
      .getOrElse(0L)
    val cols: Seq[Column] =
      lit(n).as("__phb_n") +:
      (fields.indices.map { fi =>
        val sumdl = fsRows.get(fids(fi)).map(_._2).getOrElse(0L)
        (lit(sumdl).cast("double") / lit(n)).as(s"__phb_avgdl_$fi")
      } ++
      terms.zipWithIndex.map { case ((f, t), ti) =>
        lit(tsRows.getOrElse((fidOf(f), t), 0L)).as(s"__phb_df_$ti")
      })
    spark.range(1).select(cols: _*)
  }

  /** Version history: 2 = whitespace tokens + plain Levenshtein;
    * 3 = standard-analyzer tokens + Damerau fuzzy (round 11);
    * 4 = the prebuilt french chain stems LIGHT_FRENCH (round 17 — a
    * version-3 `analyzer: "french"` index holds SNOWBALL stems, a
    * retired token grammar for that mapping ONLY, so v3 stays
    * current for every other analyzer). Bumping invalidates
    * pre-change on-disk indexes so they REBUILD instead of silently
    * serving mismatched postings against analyzer-tokenized
    * queries. */
  /** Does `path` hold a CURRENT-layout index (sidecar present, version
    * ≥ 2 = generation-pointer layout with positional postings)? Upsert
    * hooks use this to maintain an index only where one was built; a
    * sidecar from an older layout reads as absent so callers rebuild
    * rather than probe tables that moved. */
  /** Does the CURRENT generation carry the completion-inputs
    * dictionary? False for an index whose last full build predates
    * round 15 — completion probes must fall back to the scan path
    * there rather than erroring. */
  def hasInputs(path: String): Boolean =
    exists(path) && new java.io.File(
      s"${tableDir(path, readMeta(path))}/inputs").isDirectory

  /** COMPLETION-SUGGESTER probe — the index-side twin of
    * [[graft.serving.EsDsl.completionSuggest]] (the scan path is its
    * oracle): options are documents whose stored input starts with
    * the typed prefix, case-folded; weightless score 1.0; rank =
    * surface form then id; `skipDuplicates` keeps the lowest id per
    * distinct value. Bit-identical output to the scan twin because
    * `input_lc` IS `lower(input)` — but the predicate lands on the
    * precomputed column, so the plan is a pushed StringStartsWith
    * over the (fid, input_lc)-sorted dictionary: row-group min/max
    * statistics skip everything outside the prefix range, the
    * columnar analog of ES's FST walk. No corpus scan
    * (SearchIndexSpec pins plan and parity). */
  def completionRanked(spark: SparkSession, path: String,
                       prefix: String, field: String,
                       size: Int = 5,
                       skipDuplicates: Boolean = false,
                       edits: Int = 0, fuzzyPrefixLength: Int = 1,
                       transpositions: Boolean = true,
                       contexts: Seq[(String, Seq[(String, Double)])] =
                         Nil,
                       regex: Option[String] = None)
      : DataFrame = {
    require(regex.isDefined || prefix.nonEmpty,
      "empty completion prefix")
    require(size >= 1 && size <= 100, "suggest size must be 1..100")
    val meta = readMeta(path)
    val dir = tableDir(path, meta)
    val fidOf = meta.fields.zipWithIndex.toMap
    require(fidOf.contains(field), s"field not in index: $field")
    contexts.foreach { case (cf, _) => require(fidOf.contains(cf),
      s"context field not in index: $cf") }
    require(new java.io.File(s"$dir/inputs").isDirectory,
      "index carries no completion inputs (pre-round-15 build)")
    val idCol = meta.idCol
    // the fuzzy walk keeps the pushdown: the predicate's exact head
    // (first fuzzyPrefixLength chars; the WHOLE prefix at edits 0) is
    // a StartsWith the scan prunes row groups with, and the bounded
    // substring-distance disjunction filters the survivors. The REGEX
    // form pushes NO prefix head (RLIKE is not a pushdown predicate):
    // it filters the dictionary linearly — dictionary-sized, not
    // corpus-sized, the same tier as the fuzzy path (ES's own
    // regex-automaton FST intersection is likewise super-linear).
    val inputPred = regex match {
      case Some(re) => col("input_lc").rlike("^(?:" + re + ")")
      case None => graft.serving.Search.completionPrefixPredicate(
        col("input_lc"), prefix, edits, fuzzyPrefixLength,
        transpositions)
    }
    val hits0 = indexTable(spark, dir, "inputs")
      .filter(col("fid") === fidOf(field) && inputPred)
    // CATEGORY contexts — each context name is a sibling indexed
    // field: its candidate ids come from the SAME dictionary with
    // `input IN (values)` pushed down (value-list-sized rows), and
    // gate the prefix hits by join — carrying the matched entry's
    // BOOST as a column. Both sides are pruned scans; nothing
    // corpus-sized moves.
    val hits1 = contexts.zipWithIndex.foldLeft(
      hits0.select(col(idCol), col("input"))) {
      case (h, ((cf, vals), i)) =>
        val b = vals.map { case (v, bo) =>
          when(col("input") === v, lit(bo)) }
          .reduce((a, x) => greatest(a, x))
        h.join(indexTable(spark, dir, "inputs")
            .filter(col("fid") === fidOf(cf) &&
              col("input").isInCollection(vals.map(_._1)))
            .select(col(idCol), b.as(s"__b$i")),
          Seq(idCol), "inner")
    }
    // score = weightless 1.0 times the matched boost; several
    // matching contexts take the MAX (ES's multi-context scoring) —
    // identical to the scan twin's scoreCol
    val scoreCol =
      if (contexts.isEmpty) lit(1.0)
      else contexts.indices.map(i => col(s"__b$i"))
        .reduce((a, b) => greatest(a, b))
    val hits = hits1
      .select(col(idCol), col("input").as("suggestion"),
        scoreCol.cast("double").as("score"))
    val opts =
      if (!skipDuplicates) hits
      else {
        // best-scoring (then lowest-id) option per distinct value —
        // the scan twin's skip_duplicates pick
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("suggestion"))
          .orderBy(col("score").desc, col(idCol).asc)
        hits.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    opts.select(col(idCol), col("suggestion"), col("score"))
      .orderBy(col("score").desc, col("suggestion").asc, col(idCol).asc)
      .limit(size)
  }

  /** Is this meta node's (version, analyzer) pair a CURRENT token
    * grammar? v4+ always; v3 unless it is a french mapping (whose
    * stemmer changed in round 17). */
  private def currentGrammar(
      node: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    val v = node.get("version").asInt()
    val analyzer = Option(node.get("analyzer")).map(_.asText)
      .getOrElse("standard")
    v >= 4 || (v == 3 && analyzer != "french")
  }

  def exists(path: String): Boolean =
    Files.exists(Paths.get(s"$path/_index_meta.json")) &&
      (try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new String(
            Files.readAllBytes(Paths.get(s"$path/_index_meta.json")),
            StandardCharsets.UTF_8))
        node.hasNonNull("gen") && currentGrammar(node)
      } catch { case _: Exception => false })

  /** Is there a RETIRED-grammar index at `path` (sidecar present
    * and well-formed, but (version, analyzer) not current — version
    * below 3, or a version-3 french mapping)? Such an
    * index no longer [[exists]] — its postings use a retired token
    * grammar — but its meta (fields, id column) is still readable, so
    * maintenance paths can REBUILD it from the store instead of
    * silently orphaning it. */
  def staleVersion(path: String): Boolean =
    Files.exists(Paths.get(s"$path/_index_meta.json")) &&
      (try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new String(
            Files.readAllBytes(Paths.get(s"$path/_index_meta.json")),
            StandardCharsets.UTF_8))
        node.hasNonNull("gen") && !currentGrammar(node)
      } catch { case _: Exception => false })

  /** Best-effort removal of stale generation directories — crash
    * orphans and generations older than the one just replaced. The
    * JUST-REPLACED generation (`keep - 1`) is deliberately kept for one
    * more build cycle: Spark lists and opens parquet files lazily at
    * action time, so a concurrent probe that resolved the old pointer
    * may not have opened its files yet — deleting synchronously after
    * the flip would fail that probe with FileNotFoundException
    * mid-request (the "open readers keep unlinked files" unix rationale
    * only covers held-open fds, not paths still to be listed). By the
    * NEXT rebuild, requests that resolved two pointers ago are long
    * finished. An object-store deployment defers further, behind
    * reader-lease expiry. */
  private def gcGenerations(path: String, keep: Int): Unit = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.matches("g\\d+") &&
          f.getName != s"g$keep" && f.getName != s"g${keep - 1}") {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete(); ()
        }
        rm(f)
      }
    }
  }

  /** The pointer flip: write to a temp sibling, then one atomic rename.
    * Readers resolve the meta once per probe and see exactly one
    * generation — the "either old or new, never mixed" contract. */
  private def writeMeta(path: String, meta: Meta): Unit = {
    // custom_chain is the canonical Spec.json (an object, embedded
    // raw); search_analyzer a plain name — both absent on indexes
    // that predate them, so pre-round-18 metas read unchanged
    val customPart = meta.custom
      .map(c => s""""custom_chain": $c, """).getOrElse("")
    val saPart = meta.searchAnalyzer
      .map(sa => s""""search_analyzer": "$sa", """).getOrElse("")
    val json = s"""{"id_col": "${meta.idCol}", "fields": [${
      meta.fields.map(f => s""""$f"""").mkString(", ")
    }], "gen": ${meta.gen}, "analyzer": "${meta.analyzer}", ${""
    }$customPart$saPart"version": 4}"""
    val target = Paths.get(s"$path/_index_meta.json")
    Files.createDirectories(target.getParent)
    val tmp = Paths.get(s"$path/._index_meta_tmp_${
      java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readMeta(path: String): Meta = {
    val json = new String(
      Files.readAllBytes(Paths.get(s"$path/_index_meta.json")),
      StandardCharsets.UTF_8)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val fields = (0 until node.get("fields").size())
      .map(node.get("fields").get(_).asText())
    Meta(node.get("id_col").asText(), fields, node.get("gen").asInt(),
      Option(node.get("analyzer")).map(_.asText()).getOrElse("standard"),
      Option(node.get("custom_chain")).map(_.toString),
      Option(node.get("search_analyzer")).map(_.asText()))
  }
}

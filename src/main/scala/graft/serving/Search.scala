package graft.serving

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving surface — the Spark-native analog of the reference's
  * Flask + ES search API (reference: src/search_api.py:16-46,
  * data_lake_sync.py:211-243).
  *
  *  - [[multiField]] ≙ `POST /search` (ES `multi_match` over chosen
  *    fields). Parity target is the retrieval *set*; ranking is
  *    approximated by term-occurrence count (ES BM25 is not replicated —
  *    SURVEY §7.4), deterministically tie-broken.
  *  - [[sql]] ≙ `POST /search/advanced` (raw-DSL passthrough) — replaced
  *    by real SQL over the registered lake tables, strictly more
  *    expressive than the ES DSL passthrough it stands in for.
  *
  * Scale: `multiField` compiles to a predicate + projection the scanner
  * evaluates in place (codegen'd `contains`); no shuffle except the
  * final top-k, which is a TakeOrdered of `limit` rows per partition.
  */
object Search {

  /** Driver-side twin of the engine's ONE analyzer (the ES
    * `standard`-analyzer chain — `TextFunctions.analyzerTokens`), with the
    * offsets the Spark-side scan never needs but the `_analyze` /
    * `_termvectors` APIs report: (token, start_offset, end_offset,
    * position) per token, offsets into the ORIGINAL text (ES's
    * contract — the token is lowercased, the offsets are not).
    *
    * Documented edge: segmentation here runs on the ORIGINAL-case
    * text (offsets must index it), while the scan path segments the
    * lowercased text. The two differ only when lowercasing CHANGES a
    * character's token-class membership (e.g. Turkish dotted capital
    * İ lowercases to i + combining dot, a mark outside the class) —
    * for such exotic inputs the reported tokens may split differently
    * from the indexed ones; faithful offsets and faithful tokens are
    * mutually exclusive there, and ES's own offset contract picks the
    * original text too. */
  private[graft] def analyzeWithOffsets(text: String)
      : Seq[(String, Int, Int, Int)] = {
    val m = java.util.regex.Pattern
      .compile(graft.functions.TextFunctions.AnalyzerPattern)
      .matcher(text)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Int, Int)]
    while (m.find()) {
      out += ((m.group.toLowerCase, m.start, m.end, out.length))
    }
    out.toSeq
  }

  /** Occurrences of `term` in `c` (case-insensitive):
    * (len(x) - len(remove(x, term))) / len(term). */
  def occurrences(c: Column, term: String): Column = {
    val needle = term.toLowerCase
    ((length(coalesce(c, lit(""))) -
      length(replace(lower(coalesce(c, lit(""))), lit(needle), lit("")))) /
      needle.length).cast("int")
  }

  /** `search_after`-style cursor: keep only hits STRICTLY AFTER
    * `(score, id)` in the (score desc, id asc) sort every scorer ends
    * with — ES's deterministic deep-pagination cursor
    * (src/es_connector.py:85-95 pages its hits). The caller passes the
    * LAST hit of the previous page; applied before top-k, so page N+1
    * is the next `limit` hits with no overlap and no gap. */
  private[graft] def afterPredicate(after: Option[(Double, Any)],
                                      idc: Column,
                                      inclusive: Boolean = false): Column =
    after.map { case (s, id) =>
      val idCmp = if (inclusive) idc >= lit(id) else idc > lit(id)
      (col("score") < s) || (col("score") === s && idCmp)
    }.getOrElse(lit(true))

  /** Per-field count weighted by its ES `field^boost` factor (boost
    * affects SCORE only, never the match set — positive boosts are the
    * caller contract, as in ES). No boost → the raw (integer) count, so
    * unboosted scorers keep their exact int score column. */
  private def boosted(f: String, cnt: Column,
                      boosts: Map[String, Double]): Column =
    boosts.get(f).map(b => cnt * b).getOrElse(cnt)

  /** Multi-field search: rows where any selected field contains `term`
    * (case-insensitive), scored by total occurrence count, top `limit`.
    * `after` = pagination cursor ([[afterPredicate]]); `boosts` =
    * per-field ES `field^boost` score multipliers.
    */
  def multiField(df: DataFrame, term: String, fields: Seq[String],
                 limit: Int = 100,
                 after: Option[(Double, Any)] = None,
                 boosts: Map[String, Double] = Map.empty): DataFrame = {
    val score = fields.map(f => boosted(f, occurrences(col(f), term), boosts))
      .reduce(_ + _).as("score")
    val keyCols = df.columns.toSeq.map(col)
    df.select(keyCols :+ score: _*)
      .filter(col("score") > 0)
      .filter(afterPredicate(after, col(df.columns.head)))
      .orderBy(col("score").desc, col(df.columns.head))
      .limit(limit)
  }

  /** Cross-index search over the `data_lake_*`-style union document view
    * ([[graft.catalog.EntityCatalog.unionDocuments]]): multi-field
    * occurrence scoring where a field an entity lacks is NULL and scores
    * 0, ranked deterministically by (score desc, document_id, table) —
    * both tiebreak columns are non-null on every branch, so the ordering
    * is engine-stable (null-ordering defaults differ across engines).
    * Output is the hit identity (table, document_id, score); callers
    * fetch bodies from the entity's own table. */
  def acrossIndexes(lake: DataFrame, term: String, fields: Seq[String],
                    limit: Int = 100,
                    after: Option[(Double, String, String)] = None)
      : DataFrame = {
    val score = fields.map(f => occurrences(col(f), term))
      .reduce(_ + _).as("score")
    lake.select(col("table"), col("document_id"), score)
      .filter(col("score") > 0)
      .filter(afterPredicate3(after))
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
  }

  /** Wildcard-search cursor — strictly after `(score, document_id,
    * table)` in the (score desc, document_id asc, table asc) order the
    * cross-index modes share. The third key matters: `document_id`
    * values (`{id}_{runTs}`) can collide ACROSS entities. */
  private def afterPredicate3(
      after: Option[(Double, String, String)]): Column =
    after.map { case (s, id, tbl) =>
      (col("score") < s) || (col("score") === s &&
        (col("document_id") > id ||
          (col("document_id") === id && col("table") > tbl)))
    }.getOrElse(lit(true))

  /** The entity subset a comma-list target names — name-sorted specs,
    * unknown names FAIL LOUD (a silent filter would narrow the search
    * scope without anyone noticing). Empty = every catalog entity. */
  private def entitySubset(only: Seq[String])
      : Seq[graft.catalog.EntitySpec] = {
    import graft.catalog.EntityCatalog
    val specs0 = EntityCatalog.entities.values.toSeq.sortBy(_.name)
    if (only.isEmpty) specs0
    else {
      val unknown = only.filterNot(EntityCatalog.entities.contains)
      require(unknown.isEmpty,
        s"unknown entities: ${unknown.mkString(", ")}")
      specs0.filter(sp => only.contains(sp.name))
    }
  }

  /** Cross-index RANKED retrieval — the `data_lake_*` wildcard under
    * ES's real scorer: every entity index is scored with ITS OWN
    * per-index, per-field statistics (exactly what ES does when a
    * multi_match spans indexes — IDF is index-local), then hits merge
    * into one global top-k. Per-entity scoring is [[bm25Fields]] /
    * [[tfidfFields]] over that entity's string fields; a per-branch
    * top-`limit` bounds each union leg (sound: a hit outside its own
    * branch's top-k cannot enter the global top-k), so the union is
    * k·|entities| rows, never corpus-sized. */
  def acrossIndexesRanked(spark: SparkSession, srcDir: String,
                          runTs: String, query: String, limit: Int = 100,
                          bestFields: Boolean = false,
                          bm25: Boolean = true,
                          after: Option[(Double, String, String)] = None,
                          only: Seq[String] = Nil)
      : DataFrame = {
    import org.apache.spark.sql.types.StringType
    import graft.catalog.EntityCatalog
    import graft.functions.TextFunctions.{analyzerTokenCount => tokenCount}
    // ONE shared pass over the union document view — the per-entity
    // legs STACK exactly like a bool's clauses do in rankedAllMulti:
    // every (entity, field) pair is a fid whose token/dl contributions
    // are GATED on the row's `table` (shared lineage columns stay
    // index-local), per-entity n/avgdl ride one conditional stats
    // aggregate, and each entity's score is its own fixed-order
    // conditional sum — so the wildcard costs 2 passes over the union
    // view TOTAL instead of 2 scans × E entities (the round-10 shape,
    // adjudicated the remaining scale weakness). Numerically identical
    // to scoring each entity alone: a doc's group holds only its own
    // entity's fids, foreign pairs contribute exact-0.0 adds (and
    // scores are non-negative, so best_fields' greatest is unchanged),
    // stats divisions are the same exact-integer-sum ÷ count, and
    // rounding happens once — the oracle is shared verbatim.
    // `only` restricts the wildcard to a comma-list's entity subset —
    // same per-index statistics, fewer stacked branches
    val specs = entitySubset(only)
    // each entity's document pipeline is built ONCE and serves both
    // the union frame and the field-list derivation (building a
    // second throwaway pipeline per entity just to read its schema
    // doubled the driver-side analysis cost per request)
    val specDocs = specs.map(spec => spec -> EntityCatalog.pipeline(
      graft.sources.Tables(spark, srcDir, spec.name), spec, runTs))
    val union = specDocs.map(_._2)
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // entity-major (entity, field) pairs, schema order within entity —
    // the per-entity path's exact field order (ONE derivation shared
    // with the index builder and the coverage check)
    val pairs: Seq[(String, String)] = specDocs.flatMap {
      case (spec, docs) =>
        searchableDocFields(docs.schema).map(spec.name -> _)
    }
    val entityIdx = specs.map(_.name).zipWithIndex.toMap
    def gate(e: String): Column = col("table") === e
    val terms =
      graft.functions.TextFunctions.analyzeText(query).distinct.toArray
    // codegen'd contains-any prefilter (rankedAll's): a NULL foreign
    // column never passes; shared-column false positives die at the
    // gated token filter below
    val anyTerm = pairs.map(_._2).distinct.flatMap(f =>
        terms.map(t => lower(col(f)).contains(lit(t))))
      .reduceOption(_ || _).getOrElse(lit(false))
    val structs = pairs.zipWithIndex.map { case ((e, f), i) =>
      struct(lit(i).as("fid"),
        when(gate(e), if (bm25) tokenCount(col(f)) else lit(0))
          .as("dl"),
        when(gate(e),
          graft.functions.TextFunctions.analyzerTokens(col(f)))
          .as("toks"))
    }
    val stacked = union.filter(anyTerm)
      .select(col("table"), col("document_id"),
        explode(array(structs: _*)).as("fs"))
      .select(col("table"), col("document_id"),
        col("fs.fid").as("fid"), col("fs.dl").as("dl"),
        explode(col("fs.toks")).as("term"))
      .filter(col("term").isin(terms.toSeq: _*))
    // shared statistics: one aggregate computes every entity's n and
    // every pair's sumdl (exact integer sums — the identical division
    // the per-entity aggregate performed)
    val nCols = specs.map(sp =>
      sum(when(gate(sp.name), lit(1L))).as(s"n_${entityIdx(sp.name)}"))
    // r19 (de-skew): every (field, term) document frequency rides the
    // SAME shared statistics aggregate via TokenDlHits (one tokenizer
    // pass yields dl + the distinct matched term indices), gated per
    // entity like n/sumdl — replacing the count(*) OVER (PARTITION BY
    // fid, term) window that placed every matching doc of a hot term
    // in ONE partition with a sort (no AQE skew handling on window
    // exchanges). df_t = entity docs whose field token-list contains
    // the term ≡ the old tf-group row count (foreign rows are gated
    // out exactly as their gated token arrays vanished at the explode).
    // the struct is GATED (a foreign row's null struct contributes
    // nothing to sumdl — sum skips null ≡ the old when-gated
    // tokenCount's +0 — nor to df: array_contains(null, j) is null and
    // the conditional count skips) and evaluated ONCE per row in a
    // PROJECTION below the aggregate, so the k df aggs + sumdl all
    // reference an attribute — codegen subexpression elimination never
    // gets a vote on how many tokenizer passes a row pays
    val tsOf = pairs.indices.map(i => col(s"__ts_$i"))
    val pre = union.select(col("table") +:
      pairs.zipWithIndex.map { case ((e, f), i) =>
        when(gate(e), graft.functions.ArrayExpressions
          .tokenDlHits(col(f), terms.toSeq)).as(s"__ts_$i") }: _*)
    val dfAggs = for (i <- pairs.indices; j <- terms.indices) yield
      sum(when(array_contains(tsOf(i).getField("hits"), j), 1L))
        .as(s"df_${i}_$j")
    val statsAggs: Seq[Column] =
      (if (bm25) nCols ++ pairs.indices.map { i =>
        sum(tsOf(i).getField("dl")).as(s"sumdl_$i") }
      else nCols) ++ dfAggs
    val statsWide = pre.agg(statsAggs.head, statsAggs.tail: _*)
    lazy val stats = statsWide.select(explode(array((for {
        (((e, _), i)) <- pairs.zipWithIndex
        (t, j) <- terms.zipWithIndex.toSeq
      } yield {
        val n = col(s"n_${entityIdx(e)}")
        struct(lit(i).as("fid"), lit(t).as("term"), n.as("n"),
          (if (bm25) col(s"sumdl_$i").cast("double") / n
           else lit(0.0)).as("avgdl"),
          col(s"df_${i}_$j").as("df_t"))
      }): _*)).as("s"))
      .select(col("s.fid").as("fid"), col("s.term").as("term"),
        col("s.n").as("n"), col("s.avgdl").as("avgdl"),
        col("s.df_t").as("df_t"))
    // ONE pass over the matching docs (r18): a fid's group holds ONE
    // entity's rows (foreign entities' gated token arrays are null and
    // vanish at the explode), document_id is unique within an entity,
    // and dl is functionally dependent on (table, document_id, fid) —
    // the tf aggregation needs no df bookkeeping; the stats broadcast
    // carries it.
    val grouped =
      if (bm25)
        stacked.groupBy(col("table"), col("document_id"), col("fid"),
            col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
      else stacked.groupBy(col("table"), col("document_id"), col("fid"),
          col("term"))
        .agg(count(lit(1)).as("tf"))
    val withStats =
      if (terms.isEmpty)
        grouped.withColumn("df_t", lit(0L)).withColumn("n", lit(0L))
          .withColumn("avgdl", lit(0.0))
      else grouped.join(broadcast(stats), Seq("fid", "term"))
    val idf: Column =
      if (bm25)
        log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
          (col("df_t") + 0.5))
      else (col("n") + 1.0) / (col("df_t") + 1.0)
    val perTerm: Column =
      if (bm25)
        idf * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * idf
    val parts = pairs.indices.map { i =>
      terms.toSeq.map(t =>
          coalesce(sum(when(col("term") === t && col("fid") === i,
            perTerm)), lit(0.0)))
        .reduce(_ + _)
    }
    val combined =
      if (parts.size == 1) parts.head
      else if (bestFields) greatest(parts: _*)
      else parts.reduce(_ + _) // entity-major pair order; foreign
                               // pairs add exact 0.0
    withStats
      .groupBy(col("table"), col("document_id"))
      .agg(round4(combined).as("score"))
      .select(col("table"), col("document_id"), col("score"))
      .filter(afterPredicate3(after))
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
  }

  /** The SEARCHABLE fields of an entity document frame — its string
    * columns in schema order, minus the `table` discriminator and the
    * id. ONE definition shared by the index builder, the wildcard
    * scorers and the coverage check, so the field contract cannot
    * drift between what gets indexed and what gets scored. */
  private[graft] def searchableDocFields(
      schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).filterNot(Set("table", "document_id")).toSeq

  /** Per-(srcDir, entity) memo of the entity pipeline's searchable
    * field list — `srcDir` tables are an immutable snapshot (the same
    * assumption the HTTP layer's index memoization rests on; a
    * mutated srcDir requires a redeploy there too, so the memo adds
    * no NEW staleness surface), so the schema-analysis cost is paid
    * once per entity, not once per wildcard request. */
  private val coverFieldsMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
                                               Seq[String]]()

  /** Whether the per-entity write-time indexes under `root` COVER a
    * wildcard request over `only` (all entities when empty): each
    * in-scope entity's index exists at the current version and its
    * indexed field list EQUALS the field list the scan path would
    * score — same names, same order (per-field scores sum in fixed
    * field order, so order is part of the contract). Schema-only
    * driver analysis, memoized per (srcDir, entity) — no scans, no
    * per-request pipeline rebuilds. */
  def entityIndexesCover(spark: SparkSession, srcDir: String,
                         runTs: String, root: String,
                         only: Seq[String] = Nil): Boolean = {
    import graft.catalog.EntityCatalog
    entitySubset(only).forall { spec =>
      val p = s"$root/${spec.name}"
      graft.sinks.SearchIndex.exists(p) && {
        val expected = coverFieldsMemo.computeIfAbsent(
          (srcDir, spec.name), _ =>
            searchableDocFields(EntityCatalog.pipeline(
              graft.sources.Tables(spark, srcDir, spec.name), spec,
              runTs).schema))
        graft.sinks.SearchIndex.readMeta(p).fields == expected
      }
    }
  }

  /** Write-time-index twin of [[acrossIndexesRanked]]: the same
    * per-index BM25 ranking and 3-key cursor semantics, but every
    * branch PROBES its entity's materialized index
    * ([[graft.sinks.SearchIndex]], built once at sync time by
    * [[buildEntityIndexes]]) instead of re-deriving the entity
    * documents and re-aggregating corpus statistics per request — the
    * operational shape ES actually has (`bulk_index` builds postings at
    * write time, src/es_connector.py:51-74; `multi_match` reads them,
    * src/search_api.py:16-36). Bit-identical results to the scan-path
    * wildcard; per-request cost drops from 5 corpus scans + 5 stats
    * aggregates to pruned postings probes. */
  def acrossIndexesRankedIndexed(spark: SparkSession, indexRoot: String,
                                 query: String, limit: Int = 100,
                                 bestFields: Boolean = false,
                                 bm25: Boolean = true,
                                 after: Option[(Double, String, String)] = None,
                                 only: Seq[String] = Nil)
      : DataFrame =
    // r19: ONE merged probe plan instead of a per-entity union of
    // [[graft.sinks.SearchIndex.ranked]] calls — the per-branch shape
    // built 2 broadcast exchanges + 1 aggregation exchange + 1
    // TakeOrdered per entity (14 driver-serialized broadcast builds on
    // a 7-entity wildcard); the merged plan builds ONE idf broadcast
    // and aggregates once. Bit-identical per-entity scores and the
    // same 3-key cursor semantics (SearchIndexSpec pins the equality).
    graft.sinks.SearchIndex.rankedAcrossIndexes(spark,
      entitySubset(only).map(spec =>
        spec.name -> s"$indexRoot/${spec.name}"),
      query, limit, bm25, bestFields, after)

  /** Wildcard PHRASE over the entity indexes (`data_lake_*` with
    * `multi_match type=phrase`): every entity's positional postings are
    * probed independently ([[graft.sinks.SearchIndex.phrase]]), hits
    * merge into one global top-k under the shared 3-key order. Phrase
    * scores are per-branch occurrence counts — no index-local
    * statistics — so the merge is a plain top-k; the per-branch `limit`
    * bound is sound for the same reason as [[acrossIndexesRanked]]'s.
    * Scan-path twin: [[phrase]] over each entity's pipeline documents
    * (SearchIndexSpec pins the equality). */
  def acrossIndexesPhraseIndexed(spark: SparkSession, indexRoot: String,
                                 phraseQuery: String, limit: Int = 100,
                                 after: Option[(Double, String, String)] =
                                   None, slop: Int = 0,
                                  only: Seq[String] = Nil): DataFrame = {
    import graft.catalog.EntityCatalog
    val branches = entitySubset(only)
      .map { spec =>
        val branchAfter = after.map { case (s, id, _) => (s, id: Any) }
        val inclusive = after.exists { case (_, _, t) => spec.name > t }
        graft.sinks.SearchIndex.phrase(spark, s"$indexRoot/${spec.name}",
          phraseQuery, Nil, limit, Map.empty, branchAfter, inclusive, slop)
          .select(lit(spec.name).as("table"), col("document_id"),
            col("score"))
      }
    branches.reduce(_.unionByName(_))
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
  }

  /** Wildcard `operator=and` / `minimum_should_match` over the entity
    * indexes — [[graft.sinks.SearchIndex.minShould]] per branch, global
    * top-k merge, same cursor semantics as the other wildcard modes.
    * The match predicate is per-entity (every/k-of-n terms must match
    * within ONE entity's fields), exactly what ES computes when a
    * multi_match with operator=and spans indexes. */
  def acrossIndexesMinShouldIndexed(spark: SparkSession, indexRoot: String,
                                    query: String,
                                    minMatch: Int = Int.MaxValue,
                                    limit: Int = 100,
                                    after: Option[(Double, String, String)] =
                                      None,
                                  only: Seq[String] = Nil): DataFrame = {
    import graft.catalog.EntityCatalog
    val branches = entitySubset(only)
      .map { spec =>
        val branchAfter = after.map { case (s, id, _) => (s, id: Any) }
        val inclusive = after.exists { case (_, _, t) => spec.name > t }
        graft.sinks.SearchIndex.minShould(spark, s"$indexRoot/${spec.name}",
          query, Nil, minMatch, limit, Map.empty, branchAfter, inclusive)
          .select(lit(spec.name).as("table"), col("document_id"),
            col("score"))
      }
    branches.reduce(_.unionByName(_))
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
  }

  /** Wildcard `fuzziness` over the entity indexes — each entity's
    * vocabulary expands the query terms independently
    * ([[graft.sinks.SearchIndex.fuzzy]]), hits merge under the shared
    * 3-key cursor order like the other wildcard modes. */
  def acrossIndexesFuzzyIndexed(spark: SparkSession, indexRoot: String,
                                query: String, fuzziness: String = "AUTO",
                                limit: Int = 100,
                                after: Option[(Double, String, String)] =
                                  None, prefixLength: Int = 0,
                                maxExpansions: Option[Int] = None,
                                transpositions: Boolean = true,
                                  only: Seq[String] = Nil): DataFrame = {
    import graft.catalog.EntityCatalog
    val branches = entitySubset(only)
      .map { spec =>
        val branchAfter = after.map { case (s, id, _) => (s, id: Any) }
        val inclusive = after.exists { case (_, _, t) => spec.name > t }
        graft.sinks.SearchIndex.fuzzy(spark, s"$indexRoot/${spec.name}",
          query, Nil, fuzziness, limit, Map.empty, branchAfter, inclusive,
          prefixLength, maxExpansions, transpositions)
          .select(lit(spec.name).as("table"), col("document_id"),
            col("score"))
      }
    branches.reduce(_.unionByName(_))
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
  }

  /** Sync-time index build for every catalog entity — the write-time
    * moment the reference's ES builds its inverted indexes. One index
    * per entity under `root/<entity>`, over the entity's searchable
    * (string) document fields in schema order — the exact field list
    * [[acrossIndexesRanked]] scores. */
  def buildEntityIndexes(spark: SparkSession, srcDir: String, root: String,
                         runTs: String): Unit = {
    import graft.catalog.EntityCatalog
    EntityCatalog.entities.values.toSeq.sortBy(_.name).foreach { spec =>
      val docs = EntityCatalog.pipeline(
        graft.sources.Tables(spark, srcDir, spec.name), spec, runTs)
      graft.sinks.SearchIndex.build(docs, searchableDocFields(docs.schema),
        "document_id", s"$root/${spec.name}")
    }
  }

  /** Advanced search = the engine's actual query language. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** TF-IDF-weighted multi-term search over one text field — the
    * principled upgrade of [[multiField]]'s occurrence count toward ES
    * relevance (SURVEY §7.4: BM25 itself is out of scope; this is the
    * classic tf·idf retrieval model on exact token matches).
    *
    * score(doc) = Σ_t tf(t, doc) · (N+1)/(df_t+1)
    *
    * The idf weight is the *rational* inverse-document-frequency form,
    * not log((N+1)/(df+1)): ln() is not IEEE-pinned and differs in the
    * last ulp across libm implementations, which would make the DuckDB
    * oracle flaky; the rational form is exact double arithmetic with
    * identical ranking behavior (monotone in 1/df).
    *
    * Shape at scale: one explode+filter pass over the corpus (only query
    * terms survive the filter — the "inverted index probe"), a tiny
    * per-term df aggregate joined back broadcast-style, one final
    * per-doc sum + top-k. No full-corpus shuffle: everything after the
    * filter is query-term-sized.
    */
  def tfidf(df: DataFrame, query: String, textCol: String, idCol: String,
            limit: Int = 100): DataFrame =
    rankedRetrieval(df, query, textCol, idCol, limit, bm25 = false)

  /** BM25 ranked retrieval — [[tfidf]] plus the two ingredients ES's
    * actual scorer (`multi_match` executes Lucene BM25) adds on top of
    * tf·idf: term-frequency SATURATION (a term's contribution
    * asymptotes at (k1+1)·idf instead of growing linearly) and
    * DOC-LENGTH NORMALIZATION (long documents need proportionally more
    * occurrences to score the same). Retires the last documented
    * deviation from the reference's search semantics
    * (src/search_api.py:16-36; SURVEY §7.4).
    *
    * score(doc) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))   (Lucene's form)
    *
    * k1 = 1.2, b = 0.75 enter the plan as literals (Lucene defaults).
    * The ln is safe for the oracle here for the same reason as
    * LanguageModel's: both engines take ln of the identical double and
    * the final score is floor-rounded to the 1e-4 grid. Same
    * inverted-probe shape and oracle-ability as [[tfidf]]: one
    * prefiltered explode, tiny broadcast stats, top-k. The corpus
    * statistics (N, avgdl) are one extra tiny aggregate over the scan —
    * the numbers ES keeps precomputed per index. */
  def bm25(df: DataFrame, query: String, textCol: String, idCol: String,
           limit: Int = 100): DataFrame =
    rankedRetrieval(df, query, textCol, idCol, limit, bm25 = true)

  /** Multi-field BM25 — TRUE `multi_match` semantics over a fields LIST
    * (reference: src/search_api.py:22-30 passes several fields; ES
    * scores each field independently with that field's own statistics).
    * Per-field scoring is exactly [[bm25]] (per-field df, dl, avgdl);
    * field scores combine as a fixed-order SUM (ES `most_fields`) or,
    * with `bestFields = true`, the per-doc MAX (ES's default
    * `best_fields`). Optional per-field `boosts` multiply a field's
    * score before combining (ES `field^boost`).
    *
    * Shape at scale: each field contributes one prefiltered
    * inverted-probe pass (query-term-sized after the scan filter); the
    * combine is a full-outer join of HITS-sized frames — never
    * corpus-sized. Float determinism: per-field scores are the same
    * fixed-order sums as single-field, fields combine in caller order,
    * rounding happens once after the combine. */
  def bm25Fields(df: DataFrame, query: String, fields: Seq[String],
                 idCol: String, limit: Int = 100,
                 bestFields: Boolean = false,
                 boosts: Map[String, Double] = Map.empty,
                 after: Option[(Double, Any)] = None): DataFrame =
    rankedFields(df, query, fields, idCol, limit, bm25 = true,
      bestFields, boosts, after)

  /** Multi-field tf·idf — [[tfidf]] per field, combined like
    * [[bm25Fields]]. */
  def tfidfFields(df: DataFrame, query: String, fields: Seq[String],
                  idCol: String, limit: Int = 100,
                  bestFields: Boolean = false,
                  boosts: Map[String, Double] = Map.empty,
                  after: Option[(Double, Any)] = None): DataFrame =
    rankedFields(df, query, fields, idCol, limit, bm25 = false,
      bestFields, boosts, after)

  /** Round to the 1e-4 grid — the last step of every ranked scorer, so
    * the DuckDB oracle compares lattice points, not raw doubles. */
  private[graft] def round4(c: Column): Column =
    floor(c * 10000.0 + 0.5).cast("double") / 10000.0

  /** Multi-field ranked retrieval in ONE pass over the corpus: fields
    * STACK into a single explode (one scan carries every field's
    * tokens, tagged `fid`), per-(field, term) df and per-field dl/avgdl
    * ride the same shared aggregates, and the cross-field combine is
    * conditional sums inside ONE final per-doc aggregation — no
    * per-field corpus scans, no full-outer joins (the naive
    * k-independent-pipelines form costs 2k scans and a k-way join; this
    * is 2 scans and 3 shuffles regardless of k). Numerically identical
    * to scoring each field alone and combining: every per-(field, term)
    * contribution is a single row, so conditional sums add the same
    * doubles in the same fixed (field, term) order the oracle spells. */
  private def rankedFields(df: DataFrame, query: String,
                           fields: Seq[String], idCol: String, limit: Int,
                           bm25: Boolean, bestFields: Boolean,
                           boosts: Map[String, Double],
                           after: Option[(Double, Any)] = None,
                           afterInclusive: Boolean = false): DataFrame =
    rankedAll(df, query, fields, idCol, bm25, bestFields, boosts)
      .filter(afterPredicate(after, col(idCol), afterInclusive))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)

  /** The (id, score) frame of [[rankedFields]] BEFORE pagination: one
    * row per doc matching ≥1 query term as an exact token, carrying the
    * rounded combined score — no cursor, no order, no limit. The ES-DSL
    * translator ([[EsDsl]]) joins these frames back to table rows so DSL
    * `match`/`multi_match` clauses score with the exact BM25 machinery
    * `/search rank=bm25` uses — same expression tree, same fixed-order
    * float sums, same one-time rounding, so DSL and /search rankings are
    * bit-identical on the same query. */
  private[graft] def rankedAll(df: DataFrame, query: String,
                               fields: Seq[String], idCol: String,
                               bm25: Boolean, bestFields: Boolean,
                               boosts: Map[String, Double]): DataFrame = {
    import graft.functions.TextFunctions.{analyzerTokenCount => tokenCount}
    require(fields.nonEmpty, "at least one field to rank")
    val terms =
      graft.functions.TextFunctions.analyzeText(query).distinct.toArray
    val anyTerm = fields.flatMap(f =>
        terms.map(t => lower(col(f)).contains(lit(t))))
      .reduceOption(_ || _).getOrElse(lit(false))
    // one scan: stack every field's (dl, token array), then explode
    // tokens; a NULL field contributes nothing (its token array is null)
    val stacked = df.filter(anyTerm)
      .select(col(idCol), explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(i).as("fid"),
          (if (bm25) tokenCount(col(f)) else lit(0)).as("dl"),
          graft.functions.TextFunctions.analyzerTokens(col(f))
            .as("toks"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"), col("fs.dl").as("dl"),
        explode(col("fs.toks")).as("term"))
      .filter(col("term").isin(terms.toSeq: _*))
    // shared corpus statistics: ONE full-scan aggregate computes every
    // field's n/avgdl (the numbers ES precomputes per index) AND — r19
    // — every (field, term) document frequency, riding the same
    // tokenizer pass (TokenDlHits: dl + distinct matched term indices
    // in one spans walk). df_t = docs whose field token-list contains
    // the term ≡ the tf-group row count the old count(*) OVER
    // (PARTITION BY fid, term) window produced — but skew-free: the
    // window placed every matching doc of a hot term in ONE partition
    // with a sort (no AQE skew handling on window exchanges). The
    // reshaped stats broadcast is ≤ |fields| × |query terms| rows. On
    // the tf·idf path the stats pass now tokenizes to carry df (it
    // previously only counted rows — the window carried df there).
    // the struct is evaluated ONCE per row in a projection below the
    // aggregate (the df aggs + avgdl reference an attribute, so codegen
    // subexpression elimination never gets a vote on how many tokenizer
    // passes a row pays)
    val tsOf = fields.indices.map(i => col(s"__ts_$i"))
    val pre = df.select(fields.zipWithIndex.map { case (f, i) =>
      graft.functions.ArrayExpressions.tokenDlHits(col(f), terms.toSeq)
        .as(s"__ts_$i") }: _*)
    val dfAggs = for (i <- fields.indices; j <- terms.indices) yield
      sum(when(array_contains(tsOf(i).getField("hits"), j), 1L))
        .as(s"df_${i}_$j")
    val statsAggs =
      if (bm25)
        fields.indices.map(i =>
          (sum(tsOf(i).getField("dl")).cast("double") / count(lit(1)))
            .as(s"avgdl_$i")) ++ dfAggs
      else dfAggs
    val statsWide = pre.agg(count(lit(1)).as("n"), statsAggs: _*)
    // lazy: with zero analyzed terms the explode(array()) would not
    // resolve, and the empty-terms branch below never consumes it
    lazy val stats = statsWide.select(explode(array((for {
        i <- fields.indices; (t, j) <- terms.zipWithIndex.toSeq
      } yield struct(lit(i).as("fid"), lit(t).as("term"),
        col("n").as("n"),
        (if (bm25) col(s"avgdl_$i") else lit(0.0)).as("avgdl"),
        col(s"df_${i}_$j").as("df_t"))): _*)).as("s"))
      .select(col("s.fid").as("fid"), col("s.term").as("term"),
        col("s.n").as("n"), col("s.avgdl").as("avgdl"),
        col("s.df_t").as("df_t"))
    // ONE pass over the matching docs (r18): each (doc, fid[, dl],
    // term) group is one row and ids are unique within a field's
    // corpus, so the tf aggregation needs no df bookkeeping at all —
    // the stats broadcast carries it.
    val grouped =
      if (bm25)
        stacked.groupBy(col(idCol), col("fid"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
      else stacked.groupBy(col(idCol), col("fid"), col("term"))
        .agg(count(lit(1)).as("tf"))
    val withStats =
      if (terms.isEmpty)
        // no analyzed terms: grouped is empty (isin over nothing);
        // supply the schema the scorer below expects
        grouped.withColumn("df_t", lit(0L)).withColumn("n", lit(0L))
          .withColumn("avgdl", lit(0.0))
      else grouped.join(broadcast(stats), Seq("fid", "term"))
    val idf: Column =
      if (bm25)
        log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
          (col("df_t") + 0.5))
      else (col("n") + 1.0) / (col("df_t") + 1.0)
    val perTerm: Column =
      if (bm25)
        idf * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * idf
    // per-field score: fixed-order term sum of single-row conditionals
    // (each (doc, fid, term) group is one row after the tf aggregation)
    def fieldScore(i: Int): Column = {
      val raw = terms.toSeq.map(t =>
          coalesce(sum(when(col("term") === t && col("fid") === i,
            perTerm)), lit(0.0)))
        .reduce(_ + _)
      boosts.get(fields(i)).map(b => raw * b).getOrElse(raw)
    }
    val parts = fields.indices.map(fieldScore)
    val combined =
      if (parts.size == 1) parts.head
      else if (bestFields) greatest(parts: _*)
      else parts.reduce(_ + _) // fixed field order — float + isn't assoc.
    withStats
      .groupBy(col(idCol))
      .agg(round4(combined).as("score"))
  }

  /** One match-family clause of an ES-DSL body, queued by
    * [[EsDsl]] for the SHARED scoring pass ([[rankedAllMulti]]): the
    * clause's analyzed terms (ordered, distinct, lowercased — under a
    * query-time `english` analyzer these are the query's STEMS,
    * searched as literal terms like any others), its target fields as
    * (key, boost) pairs resolved against the request's interned field
    * list, and the best_fields/most_fields combine mode. */
  private[graft] final case class RankClause(terms: Seq[String],
                                             fields: Seq[(String, Double)],
                                             bestFields: Boolean)

  /** One interned (key → column expression) entry of the shared
    * scoring pass. Documents are ALWAYS standard-analyzed — exactly
    * ES against the reference's standard-analyzed mappings, where a
    * query-time analyzer rewrites only the query's terms and the
    * index-side tokens and statistics stay standard. */
  private[graft] final case class RankField(key: String, expr: Column)

  /** EVERY match-family clause of one DSL body scored in ONE pass —
    * the multi-clause generalization of [[rankedAll]]: all clauses'
    * fields stack into a single tokenize+explode scan (tagged `fid`
    * over the request's interned field list), one shared stats
    * aggregate carries every field's n/avgdl, per-(field, term) df
    * rides one aggregation of the shared stack, and each clause's
    * score is its own fixed-order conditional sum inside ONE final
    * per-doc aggregation — so a bool with K match clauses costs 2
    * corpus scans and one score join TOTAL, not 2K scans and K joins
    * (the round-9 design this replaces; the per-clause scan was the
    * one adjudicated scale weakness). Numerically identical to
    * scoring each clause alone with [[rankedAll]]: every
    * (doc, field, term) contribution is a single row after the tf
    * aggregation, each clause's conditional sums add the same doubles
    * in the same fixed (field, term) order, and rounding happens once
    * per clause — a clause the doc doesn't match sums to the same
    * 0.0 its absent join row coalesced to before.
    *
    * `fieldExprs` = (key, expression) in first-use order — a key is a
    * plain column name or a derived combined-fields concat; `clauses`
    * reference keys. Returns (idCol, __bm25_0 … __bm25_{K-1}). */
  private[graft] def rankedAllMulti(df: DataFrame, idCol: String,
                                    fieldExprs: Seq[RankField],
                                    clauses: Seq[RankClause]): DataFrame = {
    import graft.functions.TextFunctions.{analyzerTokenCount => tokenCount}
    require(clauses.nonEmpty, "at least one clause to rank")
    require(fieldExprs.nonEmpty, "at least one field to rank")
    val fidOf = fieldExprs.map(_.key).zipWithIndex.toMap
    val exprOf = fieldExprs.map(f => f.key -> f.expr).toMap
    val allTerms = clauses.flatMap(_.terms).distinct
    // codegen'd contains-any prefilter: clause order, fields outer,
    // terms inner (each clause's rankedAll shape, OR-folded across
    // clauses; duplicate (field, term) probes dropped first-wins) — a
    // doc matching NO clause's terms as substrings can't token-match
    // any clause, so it skips tokenize+explode entirely. Safe for
    // english clauses too: their terms are query-side STEMS matched
    // by token equality against standard tokens, and any token equal
    // to the stem is a substring of the raw text.
    val seen = scala.collection.mutable.Set[(String, String)]()
    val probes = for {
      c <- clauses; (f, _) <- c.fields; t <- c.terms
      if seen.add((f, t))
    } yield lower(exprOf(f)).contains(lit(t))
    val anyTerm = probes.reduceOption(_ || _).getOrElse(lit(false))
    val stacked = df.filter(anyTerm)
      .select(col(idCol), explode(array(fieldExprs.zipWithIndex.map {
        case (rf, i) => struct(lit(i).as("fid"),
          tokenCount(rf.expr).as("dl"),
          graft.functions.TextFunctions.analyzerTokens(rf.expr)
            .as("toks"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"), col("fs.dl").as("dl"),
        explode(col("fs.toks")).as("term"))
      .filter(col("term").isin(allTerms: _*))
    // ONE full-scan aggregate for every interned field's n/avgdl —
    // clause-independent (n is the corpus count; avgdl is a property
    // of the field), so clauses sharing a field share its statistics.
    // r19 (de-skew): every (field, term) document frequency rides the
    // SAME aggregate via TokenDlHits (one tokenizer pass yields dl +
    // the distinct matched term indices), replacing the count(*) OVER
    // (PARTITION BY fid, term) window that placed every matching doc
    // of a hot term in ONE partition with a sort (no AQE skew handling
    // on window exchanges). df_t = docs whose field token-list contains
    // the term ≡ the old tf-group row count; a (fid, term) group
    // requires the token in that field, which implies the prefilter
    // admitted the row — so df_t equals the per-clause value.
    // evaluated ONCE per row in a projection below the aggregate (see
    // rankedAll)
    val tsOf = fieldExprs.indices.map(i => col(s"__ts_$i"))
    val pre = df.select(fieldExprs.zipWithIndex.map { case (rf, i) =>
      graft.functions.ArrayExpressions.tokenDlHits(rf.expr, allTerms)
        .as(s"__ts_$i") }: _*)
    val dfAggs = for (i <- fieldExprs.indices; j <- allTerms.indices)
      yield sum(when(array_contains(tsOf(i).getField("hits"), j), 1L))
        .as(s"df_${i}_$j")
    val statsWide = pre.agg(count(lit(1)).as("n"),
      fieldExprs.indices.map { i =>
        (sum(tsOf(i).getField("dl")).cast("double") / count(lit(1)))
          .as(s"avgdl_$i") } ++ dfAggs: _*)
    lazy val stats = statsWide.select(explode(array((for {
        i <- fieldExprs.indices; (t, j) <- allTerms.zipWithIndex
      } yield struct(lit(i).as("fid"), lit(t).as("term"),
        col("n").as("n"), col(s"avgdl_$i").as("avgdl"),
        col(s"df_${i}_$j").as("df_t"))): _*)).as("s"))
      .select(col("s.fid").as("fid"), col("s.term").as("term"),
        col("s.n").as("n"), col("s.avgdl").as("avgdl"),
        col("s.df_t").as("df_t"))
    // ONE pass over the matching docs (r18): each (doc, fid, dl, term)
    // group is one row and ids are unique within a field's corpus —
    // the tf aggregation needs no df bookkeeping; the stats broadcast
    // carries it.
    val grouped = stacked
      .groupBy(col(idCol), col("fid"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val withStats =
      if (allTerms.isEmpty)
        grouped.withColumn("df_t", lit(0L)).withColumn("n", lit(0L))
          .withColumn("avgdl", lit(0.0))
      else grouped.join(broadcast(stats), Seq("fid", "term"))
    val idf: Column =
      log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
        (col("df_t") + 0.5))
    val perTerm: Column =
      idf * ((col("tf") * 2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) +
          lit(0.75) * col("dl") / col("avgdl"))))
    // each clause's score: its own fields in its own order, fixed-order
    // term sums of single-row conditionals — [[rankedAll]]'s fieldScore
    // verbatim, with the global fid in the condition
    val scoreCols = clauses.zipWithIndex.map { case (c, ci) =>
      val parts = c.fields.map { case (f, boost) =>
        val i = fidOf(f)
        val raw = c.terms.map(t =>
            coalesce(sum(when(col("term") === t && col("fid") === i,
              perTerm)), lit(0.0)))
          .reduce(_ + _)
        if (boost == 1.0) raw else raw * boost
      }
      val combined =
        if (parts.size == 1) parts.head
        else if (c.bestFields) greatest(parts: _*)
        else parts.reduce(_ + _) // fixed field order — float + isn't assoc.
      round4(combined).as(s"__bm25_$ci")
    }
    withStats
      .groupBy(col(idCol))
      .agg(scoreCols.head, scoreCols.tail: _*)
  }

  private def rankedRetrieval(df: DataFrame, query: String, textCol: String,
                              idCol: String, limit: Int,
                              bm25: Boolean): DataFrame =
    rankedScores(df, query, textCol, idCol, bm25)
      .select(col(idCol), round4(col("score")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)

  /** Raw (id, score) for every doc matching ≥1 query term in `textCol`
    * — single-field scoring WITHOUT rounding/top-k, so multi-field
    * combination can sum/max field scores before the one rounding. */
  private def rankedScores(df: DataFrame, query: String, textCol: String,
                           idCol: String, bm25: Boolean): DataFrame = {
    import graft.functions.TextFunctions.{analyzerTokenCount => tokenCount}
    val terms =
      graft.functions.TextFunctions.analyzeText(query).distinct.toArray
    // substring prefilter BEFORE tokenizing: a doc with no query term as
    // a substring can't have one as a token, so the (codegen'd, scan-
    // evaluated) contains-any test skips tokenize+explode for most of
    // the corpus; substring false-positives ("foobar" for "foo") still
    // die at the post-explode token filter, so results are unchanged
    val anyTerm = terms.map(t => lower(col(textCol)).contains(lit(t)))
      .reduceOption(_ || _).getOrElse(lit(false))
    // analyzerTokens is ONE native regexp_extract_all — codegen'd,
    // no HOF filter pass. BM25 additionally carries the doc length
    // (analyzed token count, matching avgdl's definition) on each
    // exploded row.
    val baseCols =
      if (bm25) Seq(col(idCol), tokenCount(col(textCol)).as("dl"))
      else Seq(col(idCol))
    val toks = df.filter(anyTerm).select(
        baseCols :+ explode(graft.functions.TextFunctions
          .analyzerTokens(col(textCol))).as("term"): _*)
      .filter(col("term").isin(terms.toSeq: _*))
    // corpus statistics: one tiny aggregate of the full scan. sum(dl) is
    // an exact integer sum, so avgdl = one double division — the same
    // value in any engine (a float avg() could differ by addition order).
    // r19 (de-skew): per-term document frequency RIDES this aggregate —
    // TokenDlHits measures dl and the distinct query-term indices
    // present in one tokenizer pass, so df_t = count of docs whose
    // token list contains the term, exactly the row count the old
    // count(*) OVER (PARTITION BY term) window produced over the tf
    // groups (≥1 occurrence ⇔ a tf row ⇔ a hits entry). The window
    // placed every matching doc of a hot term in ONE partition with a
    // sort (no AQE skew handling on window exchanges — a stopword is a
    // straggler task at corpus scale); the stats rider is skew-free and
    // joins back broadcast, ≤ |query terms| rows.
    // evaluated ONCE per row in a projection below the aggregate (see
    // rankedAll)
    val ts = col("__ts")
    val pre = df.select(graft.functions.ArrayExpressions
      .tokenDlHits(col(textCol), terms.toSeq).as("__ts"))
    val dfAggs = terms.indices.map(j =>
      sum(when(array_contains(ts.getField("hits"), j), 1L)).as(s"df_$j"))
    val statsWide =
      if (bm25)
        pre.agg(count(lit(1)).as("n"),
          (sum(ts.getField("dl")).cast("double") / count(lit(1)))
            .as("avgdl") +: dfAggs: _*)
      else pre.agg(count(lit(1)).as("n"), dfAggs: _*)
    val grouped =
      if (bm25)
        // dl is functionally dependent on the doc id — riding it in the
        // group key costs 8 bytes of shuffle width, not an extra pass
        toks.groupBy(col(idCol), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
      else toks.groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("tf"))
    val withStats =
      if (terms.isEmpty)
        // no analyzed terms: grouped is empty (isin over nothing);
        // supply the schema the scorer below expects
        grouped.withColumn("df_t", lit(0L)).withColumn("n", lit(0L))
          .withColumn("avgdl", lit(0.0))
      else {
        val stats = statsWide.select(explode(array(terms.zipWithIndex.map {
            case (t, j) => struct(lit(t).as("term"), col("n").as("n"),
              (if (bm25) col("avgdl") else lit(0.0)).as("avgdl"),
              col(s"df_$j").as("df_t"))
          }.toSeq: _*)).as("s"))
          .select(col("s.term").as("term"), col("s.n").as("n"),
            col("s.avgdl").as("avgdl"), col("s.df_t").as("df_t"))
        grouped.join(broadcast(stats), Seq("term"))
      }
    // idf inline over the same (n, df_t) longs the joined column held —
    // identical doubles, one fewer corpus scan
    val idf: Column =
      if (bm25)
        log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
          (col("df_t") + 0.5))
      else (col("n") + 1.0) / (col("df_t") + 1.0)
    // per-(doc, term) contribution; k1 = 1.2, b = 0.75 (Lucene defaults)
    // as plan literals, 1−b and k1+1 pre-reduced to exact decimal-parse
    // doubles so the oracle can spell the identical constants
    val perTerm: Column =
      if (bm25)
        idf * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * idf
    // fixed per-term addition order (query order): float addition is not
    // associative, and a free-order sum() could differ from the oracle in
    // the last ulp right at a rounding boundary
    val termScores = terms.toSeq.map(t =>
      coalesce(sum(when(col("term") === t, perTerm)), lit(0.0)))
    withStats
      .groupBy(col(idCol))
      .agg(termScores.reduce(_ + _).as("score"))
  }

  /** `" t1  t2  …  tk "` — the column's whitespace tokens joined by
    * DOUBLE spaces and single-space padded, so a substring probe for
    * `" t "` is an EXACT token match and `" t1  t2 "` exact token
    * ADJACENCY, regardless of the original whitespace run lengths.
    * Two-space separators (not one) because the counting `replace`
    * consumes the needle's boundary spaces: with single spaces,
    * back-to-back matches (`"a a a"` probed for `" a "`, or a phrase
    * repeated immediately) share one separator and the second
    * occurrence loses its leading boundary — a double separator always
    * leaves one space behind for the next match. */
  private[graft] def tokenNorm(c: Column): Column =
    graft.functions.ArrayExpressions.analyzerNorm(
      coalesce(c.cast("string"), lit("")))

  /** Non-overlapping occurrence count of `needle` in `hay` — both
    * engines' `replace` scans left-to-right past replaced text, so the
    * count is identical engine-to-engine. */
  private[graft] def substrCount(hay: Column, needle: String): Column =
    ((length(hay) - length(replace(hay, lit(needle), lit("")))) /
      needle.length).cast("int")

  /** PHRASE search (ES `multi_match` `type: "phrase"`): the query's
    * tokens must appear consecutively, in order, in a field. Scored by
    * the total (non-overlapping) phrase-occurrence count across
    * `fields`, full rows returned like [[multiField]].
    *
    * Exactness: matching runs on the normalized token string
    * ([[tokenNorm]]), so `"the  window"` (double space) still matches
    * the phrase `"the window"` — token adjacency, not raw substring. A
    * codegen'd per-term `contains` prefilter keeps the HOF
    * normalization off most of the corpus (any doc lacking some term
    * as a SUBSTRING can't contain it as a token). */
  def phrase(df: DataFrame, phraseQuery: String, fields: Seq[String],
             limit: Int = 100,
             after: Option[(Double, Any)] = None,
             boosts: Map[String, Double] = Map.empty): DataFrame = {
    val terms = graft.functions.TextFunctions.analyzeText(phraseQuery)
    require(terms.nonEmpty, "empty phrase")
    val needle = terms.mkString(" ", "  ", " ") // [[tokenNorm]] spacing
    val prefilter = fields.map(f =>
        terms.map(t => lower(coalesce(col(f), lit("")))
          .contains(lit(t))).reduce(_ && _))
      .reduce(_ || _)
    val score = fields.map(f =>
        boosted(f, substrCount(tokenNorm(col(f)), needle), boosts))
      .reduce(_ + _).as("score")
    val keyCols = df.columns.toSeq.map(col)
    df.filter(prefilter)
      .select(keyCols :+ score: _*)
      .filter(col("score") > 0)
      .filter(afterPredicate(after, col(df.columns.head)))
      .orderBy(col("score").desc, col(df.columns.head))
      .limit(limit)
  }

  /** Count of sloppy matches of a DENSE phrase (`terms(k)` expected at
    * relative offset `k`) in a text column — [[gappedSlopCount]] with
    * consecutive offsets: the number of head-term positions `p_0` from
    * which every slot `k` can be placed at some DISTINCT `p_k` whose
    * adjusted positions `p_k - k` span at most `slop` (Lucene's sloppy
    * `matchLength`, transposed alignments included). Evaluated
    * entirely with array HOFs over the token array (per-term position
    * lists are occurrence-sized) — no explode, no shuffle, no UDF. */
  private[graft] def slopCount(field: Column, terms: Seq[String],
                               slop: Int): Column =
    gappedSlopCount(field, terms.zipWithIndex, slop)

  /** Phrase-frequency matcher for a query whose analyzed terms carry
    * POSITION GAPS (a token-REMOVING query analyzer: english stop
    * positions survive as increments — Lucene's PhraseQuery over a
    * gapped term list): counts start positions `p` in the STANDARD
    * token stream with `terms(i)._1` at exactly `p + terms(i)._2` for
    * every i. Offsets are relative (`terms(0)._2 == 0`); consecutive
    * offsets reduce to plain adjacency (callers route that to the
    * cheaper normalized-substring count). Same HOF-only shape as
    * [[slopCount]]: per-slot position lists, no explode, no shuffle. */
  private[graft] def gappedPhraseCount(field: Column,
                                       terms: Seq[(String, Int)]): Column = {
    require(terms.nonEmpty && terms.head._2 == 0, "offsets are relative")
    val toks = graft.functions.TextFunctions.analyzerTokens(field)
    def posOf(t: String): Column =
      filter(transform(toks, (x, i) =>
        when(x === lit(t), i).otherwise(lit(-1))), p => p >= lit(0))
    def rest(k: Int, first: Column): Column =
      if (k == terms.size) lit(true)
      else exists(posOf(terms(k)._1), p =>
        p === first + lit(terms(k)._2) && rest(k + 1, first))
    size(filter(posOf(terms.head._1), p1 => rest(1, p1))).cast("int")
  }

  /** [[gappedPhraseCount]] with slop — sloppy matching of a
    * position-GAPPED query term list (english stop gaps): counts head
    * positions `p_0` admitting an assignment of every slot `k` to a
    * DISTINCT document position `p_k` of its term whose ADJUSTED
    * positions `adj_k = p_k - offset_k` span at most `slop`
    * (`max_k adj_k - min_k adj_k <= slop`). The span of adjusted
    * positions is exactly Lucene's sloppy-phrase `matchLength`
    * (SloppyPhraseMatcher: each PhrasePositions carries
    * `position - offset`; a match costs `end - min`), i.e. ONE SHARED
    * slop budget across the phrase — a stem one early AND a stem one
    * late together cost 2, not 1 each. The assignment is NOT
    * order-constrained: transposed (out-of-order) alignments match
    * when their span fits, exactly Lucene — ES matches "fox quick"
    * for `"quick fox"` at slop 2. No ordering case-split is needed:
    * for any slot pair placed out of query order the span arithmetic
    * alone costs `(p_j - p_k) + (offset_k - offset_j) >= 2`, so
    * `slop <= 1` walks are in-order for free and transpositions
    * surface from `slop >= 2`, like Lucene. At `slop = 0` all
    * adjusted positions must coincide — exactly [[gappedPhraseCount]];
    * a dense query (`offset_k == k`) is [[slopCount]]. One model,
    * three degenerate forms.
    *
    * Distinctness mirrors Lucene's repeating-terms rule (two phrase
    * positions never share a document position); slots of DIFFERENT
    * terms can't collide anyway (one token per position), so the
    * check compiles only between same-term slots. Same HOF-only
    * shape: per-slot position lists, no explode, no shuffle. */
  private[graft] def gappedSlopCount(field: Column,
                                     terms: Seq[(String, Int)],
                                     slop: Int): Column = {
    require(terms.nonEmpty && terms.head._2 == 0, "offsets are relative")
    // clamp BEFORE the `offset + slop` Int arithmetic: a saturated
    // caller value (simple_query_string lexes absurd ~N suffixes to
    // Int.MaxValue) would wrap negative and silently match nothing;
    // 2^24 positions exceed any tokenizable document
    val s = math.min(slop, 1 << 24)
    val toks = graft.functions.TextFunctions.analyzerTokens(field)
    def posOf(t: String): Column =
      filter(transform(toks, (x, i) =>
        when(x === lit(t), i).otherwise(lit(-1))), p => p >= lit(0))
    // thread the running [lo, hi] adjusted-position envelope and the
    // positions already taken; a slot is admissible iff its position
    // is fresh (same-term slots only) and including its adjusted
    // position keeps hi - lo <= slop
    def rest(k: Int, taken: List[(String, Column)],
             lo: Column, hi: Column): Column =
      if (k == terms.size) lit(true)
      else exists(posOf(terms(k)._1), p => {
        val adj = p - lit(terms(k)._2)
        val fresh = taken.collect { case (t, q) if t == terms(k)._1 =>
          p =!= q }.foldLeft(adj >= hi - lit(s) && adj <= lo + lit(s))(
          _ && _)
        fresh && rest(k + 1, (terms(k)._1, p) :: taken,
          least(lo, adj), greatest(hi, adj))
      })
    size(filter(posOf(terms.head._1), p1 =>
      rest(1, List((terms.head._1, p1)), p1, p1))).cast("int")
  }

  /** [[slopCount]] with the LAST slot matched by PREFIX instead of
    * equality — ES `match_phrase_prefix`: the leading terms and a
    * final slot holding any token starting with the last "term" (the
    * user's still-being-typed prefix), aligned by the same shared
    * slop budget as [[gappedSlopCount]] (adjusted-position span
    * `<= slop`, transposed alignments included — Lucene's
    * MultiPhrasePrefixQuery rides the same SloppyPhraseMatcher).
    * `lastExpansion`, when present, caps the final slot to membership
    * in that token set (ES `max_expansions` — the caller derives the
    * first-N prefix expansion; None = unbounded prefix match).
    * Distinctness is ALL-pairs here (the prefix slot can land on an
    * exact slot's token when that term matches the prefix — Lucene
    * never lets two phrase positions share a document position).
    * Single-term queries degenerate to a prefix-token count. */
  private[graft] def phrasePrefixCount(field: Column, terms: Seq[String],
                                       slop: Int,
                                       lastExpansion: Option[Seq[String]]
                                         = None): Column = {
    require(terms.nonEmpty, "empty phrase prefix")
    // same overflow clamp as slopCount (k + slop in Int arithmetic)
    val s = math.min(slop, 1 << 24)
    val toks = graft.functions.TextFunctions.analyzerTokens(field)
    def posWhere(m: Column => Column): Column =
      filter(transform(toks, (x, i) =>
        when(m(x), i).otherwise(lit(-1))), p => p >= lit(0))
    val lastMatch: Column => Column = lastExpansion match {
      case Some(set) =>
        if (set.isEmpty) (_: Column) => lit(false)
        else (x: Column) => x.isInCollection(set)
      case None => (x: Column) => x.startsWith(terms.last)
    }
    def posOf(k: Int): Column =
      if (k == terms.size - 1) posWhere(lastMatch)
      else posWhere(_ === lit(terms(k)))
    def rest(k: Int, taken: List[Column],
             lo: Column, hi: Column): Column =
      if (k == terms.size) lit(true)
      else exists(posOf(k), p => {
        val adj = p - lit(k)
        taken.map(p =!= _).foldLeft(
          adj >= hi - lit(s) && adj <= lo + lit(s))(_ && _) &&
          rest(k + 1, p :: taken, least(lo, adj), greatest(hi, adj))
      })
    size(filter(posOf(0), p1 => rest(1, List(p1), p1, p1))).cast("int")
  }

  /** [[slopCount]] generalized to arbitrary per-slot token matchers —
    * the ORDERED span/intervals matcher (Lucene `span_near`
    * `in_order:true`, intervals `ordered:true`). Counts head
    * positions `p1` matching `slots(0)` from which every later slot
    * `k` can be placed at some `p_k > p_(k-1)` with total interleave
    * `p_n - p1 - (n-1) <= slop`. Each slot is a token predicate, so
    * `span_or` sub-clauses (match any of a term set) ride the same
    * scan. Same HOF-only shape as [[slopCount]]: per-slot position
    * lists, no explode, no shuffle. */
  private[graft] def spanNearCount(field: Column,
                                   slots: Seq[Column => Column],
                                   slop: Int): Column = {
    require(slots.nonEmpty, "empty span slots")
    val s = math.min(slop, 1 << 24)
    val toks = graft.functions.TextFunctions.analyzerTokens(field)
    def posOf(k: Int): Column =
      filter(transform(toks, (x, i) =>
        when(slots(k)(x), i).otherwise(lit(-1))), p => p >= lit(0))
    def rest(k: Int, prev: Column, first: Column): Column =
      if (k == slots.size) lit(true)
      else exists(posOf(k), p =>
        p > prev && p <= first + lit(k + s) && rest(k + 1, p, first))
    size(filter(posOf(0), p1 => rest(1, p1, p1))).cast("int")
  }

  /** Lucene `span_containing` / `span_within`: spans of the BIG query
    * (an ordered multi-slot near — `slots` with total interleave
    * `slop`, or a width-1 leaf when `slots.size == 1`) related to
    * matches of the width-1 LITTLE matcher. A big span `[p1, pn]`
    * contains a little position `q` iff `p1 <= q <= pn` (width-1
    * little starts and ends at `q`, so Lucene's start/end inequalities
    * collapse to the interval test). `within = false` counts big head
    * positions that contain SOME little match (span_containing's
    * big-span frequency); `within = true` counts little positions
    * covered by SOME big span (span_within's little-span frequency).
    * Same HOF-only shape as [[spanNearCount]] — per-slot position
    * lists, the `pn >= q` requirement threads through the recursive
    * placement as the end-of-assignment check; no explode, no
    * shuffle. */
  private[graft] def spanContainCount(field: Column,
                                      slots: Seq[Column => Column],
                                      slop: Int,
                                      little: Column => Column,
                                      within: Boolean): Column = {
    require(slots.nonEmpty, "empty span slots")
    val s = math.min(slop, 1 << 24)
    val toks = graft.functions.TextFunctions.analyzerTokens(field)
    def posOf(m: Column => Column): Column =
      filter(transform(toks, (x, i) =>
        when(m(x), i).otherwise(lit(-1))), p => p >= lit(0))
    // place slots k.. after prev inside the slop window; the LAST
    // placed slot is the span end, which must reach q
    def rest(k: Int, prev: Column, first: Column, q: Column): Column =
      if (k == slots.size) prev >= q
      else exists(posOf(slots(k)), p =>
        p > prev && p <= first + lit(k + s) && rest(k + 1, p, first, q))
    if (within)
      size(filter(posOf(little), q => exists(posOf(slots.head), p1 =>
        p1 <= q && rest(1, p1, p1, q)))).cast("int")
    else
      size(filter(posOf(slots.head), p1 => exists(posOf(little), q =>
        q >= p1 && rest(1, p1, p1, q)))).cast("int")
  }

  /** UNORDERED two-slot proximity (Lucene `span_near`
    * `in_order:false`, intervals `ordered:false` with `max_gaps`):
    * counts positions `p` of the FIRST slot for which some second-slot
    * position `q != p` sits within the window (`|p − q| − 1 <= slop`
    * interleaved tokens). The head-position count is this engine's
    * documented span-frequency convention (Lucene's non-overlapping
    * enumeration differs only on pathological self-overlap). */
  /** [[spanNearCount]] with PER-SLOT source columns — Lucene's
    * `span_field_masking` composition: each slot's positions come
    * from ITS OWN field's token stream, and the slots compare in ONE
    * position space (exactly Lucene's overlay semantics for
    * analyzer-compatible multi-fields). Same HOF-only shape — per-row
    * position lists, no explode, no shuffle. */
  private[graft] def spanNearCountFields(
      slots: Seq[(Column, Column => Column)], slop: Int): Column = {
    require(slots.nonEmpty, "empty span slots")
    val s = math.min(slop, 1 << 24)
    def posOf(k: Int): Column = {
      val toks = graft.functions.TextFunctions.analyzerTokens(slots(k)._1)
      filter(transform(toks, (x, i) =>
        when(slots(k)._2(x), i).otherwise(lit(-1))), p => p >= lit(0))
    }
    def rest(k: Int, prev: Column, first: Column): Column =
      if (k == slots.size) lit(true)
      else exists(posOf(k), p =>
        p > prev && p <= first + lit(k + s) && rest(k + 1, p, first))
    size(filter(posOf(0), p1 => rest(1, p1, p1))).cast("int")
  }

  /** [[spanPairCount]] with per-slot source columns — the unordered
    * two-clause `span_near` under `span_field_masking`. With distinct
    * source fields the `q != p` self-overlap guard is kept: Lucene's
    * masked spans still collide when they occupy the same position. */
  private[graft] def spanPairCountFields(fa: Column, a: Column => Column,
                                         fb: Column, b: Column => Column,
                                         slop: Int): Column = {
    val s = math.min(slop, 1 << 24)
    def posOf(f: Column, m: Column => Column): Column = {
      val toks = graft.functions.TextFunctions.analyzerTokens(f)
      filter(transform(toks, (x, i) =>
        when(m(x), i).otherwise(lit(-1))), p => p >= lit(0))
    }
    size(filter(posOf(fa, a), p => exists(posOf(fb, b), q =>
      q =!= p && greatest(p, q) - least(p, q) - 1 <= lit(s))))
      .cast("int")
  }

  private[graft] def spanPairCount(field: Column,
                                   a: Column => Column,
                                   b: Column => Column,
                                   slop: Int): Column = {
    val s = math.min(slop, 1 << 24)
    val toks = graft.functions.TextFunctions.analyzerTokens(field)
    def posOf(m: Column => Column): Column =
      filter(transform(toks, (x, i) =>
        when(m(x), i).otherwise(lit(-1))), p => p >= lit(0))
    size(filter(posOf(a), p => exists(posOf(b), q =>
      q =!= p && greatest(p, q) - least(p, q) - 1 <= lit(s))))
      .cast("int")
  }

  /** SLOPPY phrase (ES `match_phrase` with `slop`): the query's terms
    * must appear with an adjusted-position span of at most `slop` —
    * Lucene's full sloppy matcher, transposed (out-of-order)
    * alignments included from `slop >= 2` ([[gappedSlopCount]]'s
    * model). `slop = 0` delegates to [[phrase]] (exact adjacency,
    * non-overlap-counted). Scored by the count of head positions that
    * admit a match within the budget ([[slopCount]]), summed across
    * `fields`.
    *
    * Scale: the codegen'd per-term `contains` prefilter keeps the HOF
    * position scan off every row missing some term as a substring; the
    * HOF works on occurrence-sized position lists per row — no
    * explode, no shuffle before the final top-k. */
  def slopPhrase(df: DataFrame, phraseQuery: String, fields: Seq[String],
                 slop: Int, limit: Int = 100,
                 after: Option[(Double, Any)] = None,
                 boosts: Map[String, Double] = Map.empty): DataFrame = {
    require(slop >= 0, "slop must be >= 0")
    if (slop == 0)
      return phrase(df, phraseQuery, fields, limit, after, boosts)
    val terms = graft.functions.TextFunctions.analyzeText(phraseQuery)
    require(terms.nonEmpty, "empty phrase")
    val prefilter = fields.map(f =>
        terms.map(t => lower(coalesce(col(f), lit("")))
          .contains(lit(t))).reduce(_ && _))
      .reduce(_ || _)
    val score = fields.map(f =>
        boosted(f, slopCount(col(f), terms, slop), boosts))
      .reduce(_ + _).as("score")
    val keyCols = df.columns.toSeq.map(col)
    df.filter(prefilter)
      .select(keyCols :+ score: _*)
      .filter(col("score") > 0)
      .filter(afterPredicate(after, col(df.columns.head)))
      .orderBy(col("score").desc, col(df.columns.head))
      .limit(limit)
  }

  /** `operator: "and"` search (ES `multi_match` with `operator: and`):
    * EVERY query term must appear as an exact token in at least one of
    * `fields`; scored like [[multiField]] but token-exact (so `"foo"`
    * no longer matches `"foobar"` the way the substring scorer does).
    * Same scan-side shape: per-term/per-field codegen'd counts, no
    * shuffle before the final top-k. */
  def multiFieldAnd(df: DataFrame, query: String, fields: Seq[String],
                    limit: Int = 100,
                    after: Option[(Double, Any)] = None,
                    boosts: Map[String, Double] = Map.empty): DataFrame =
    multiFieldMinShould(df, query, fields, minMatch = Int.MaxValue,
      limit, after, boosts)

  /** ES `minimum_should_match`: at least `minMatch` of the query's
    * distinct terms must token-match (in any of `fields`); scored like
    * [[multiFieldAnd]]. `minMatch` values above the term count clamp to
    * all-terms (the AND mode is exactly that clamp); `<= 1` degrades to
    * the token-exact OR. Same scan-side shape: per-term/per-field
    * codegen'd counts, one top-k, no shuffle before it. */
  def multiFieldMinShould(df: DataFrame, query: String,
                          fields: Seq[String], minMatch: Int,
                          limit: Int = 100,
                          after: Option[(Double, Any)] = None,
                          boosts: Map[String, Double] = Map.empty): DataFrame = {
    val terms =
      graft.functions.TextFunctions.analyzeText(query).distinct
    require(terms.nonEmpty, "empty query")
    val need = math.max(1, math.min(minMatch, terms.size))
    val norms = fields.zip(fields.map(f => tokenNorm(col(f))))
    def termCount(t: String): Column =
      norms.map { case (_, n) => substrCount(n, s" $t ") }.reduce(_ + _)
    // boosts weight the SCORE only; the match predicate stays unweighted
    def termScore(t: String): Column =
      norms.map { case (f, n) =>
        boosted(f, substrCount(n, s" $t "), boosts) }.reduce(_ + _)
    val matched = terms.map(t => when(termCount(t) > 0, 1).otherwise(0))
      .reduce(_ + _)
    val score = terms.map(termScore).reduce(_ + _).as("score")
    val keyCols = df.columns.toSeq.map(col)
    df.filter(matched >= need)
      .select(keyCols :+ score: _*)
      .filter(afterPredicate(after, col(df.columns.head)))
      .orderBy(col("score").desc, col(df.columns.head))
      .limit(limit)
  }

  /** ES `fuzziness` resolution: an explicit edit-distance spec ("0".."2")
    * or AUTO's length ladder (0 edits for terms under 3 chars, 1 for
    * 3–5, 2 above — ES's documented AUTO:3,6 default). Returns None for
    * anything else so callers 400 instead of guessing. */
  /** Is `fuzziness` a spec [[fuzzyEdits]] accepts? (term-independent:
    * AUTO resolves per term but is always valid). */
  private[graft] def fuzzyEditsValid(fuzziness: String): Boolean =
    fuzzyEdits("probe", fuzziness).isDefined

  /** The fuzzy metric: full Damerau–Levenshtein (adjacent
    * transpositions are ONE edit) under ES's default
    * `transpositions: true`; plain Levenshtein under explicit
    * `false`. One switch point for every fuzzy surface so the scan
    * path, the index probe, and the DuckDB oracle stay on one
    * metric. */
  private[graft] def editDistance(x: Column, t: String,
                                  transpositions: Boolean): Column =
    if (transpositions)
      graft.functions.ArrayExpressions.damerauLevenshtein(x, lit(t))
    else levenshtein(x, lit(t))

  private[graft] def fuzzyEdits(term: String,
                                fuzziness: String): Option[Int] =
    fuzziness.trim.toUpperCase match {
      case "AUTO" =>
        Some(if (term.length < 3) 0 else if (term.length <= 5) 1 else 2)
      case "0" | "1" | "2" => Some(fuzziness.trim.toInt)
      case _               => None
    }

  /** Lucene's `maxClauseCount` bound — the ceiling ES enforces on
    * `max_expansions` (a fuzzy query can't rewrite into more term
    * clauses than a BooleanQuery may hold). */
  private[graft] val MaxExpansionsCeiling = 1024

  /** Fuzzy-COMPLETION prefix predicate over a LOWERCASED input
    * column — ES's fuzzy completion model (a Levenshtein automaton
    * intersected with the FST): an input matches iff SOME PREFIX of
    * it lies within `edits` of the typed (lowercased) prefix, with
    * the first `prefixLength` characters exact (ES default 1).
    * Candidate prefix lengths are bounded to len(p) ± edits (length
    * difference alone exceeds the budget outside that band), so the
    * predicate is a fixed ≤(2·edits+1)-way disjunction of substring
    * edit distances on the ONE shared fuzzy metric ([[editDistance]]
    * — Damerau under ES's default transpositions) — codegen-friendly,
    * and the exact head still pushes down as StartsWith on the sorted
    * inputs dictionary. At `edits = 0` this IS the plain prefix
    * startsWith. */
  private[graft] def completionPrefixPredicate(inputLc: Column,
      prefix: String, edits: Int, prefixLength: Int,
      transpositions: Boolean): Column = {
    val p = prefix.toLowerCase
    if (edits == 0) inputLc.startsWith(p)
    else {
      val lo = math.max(math.max(1, prefixLength), p.length - edits)
      val hi = p.length + edits
      // prefix_length past the whole edit band (ES accepts it): the
      // exact-head constraint subsumes the budget — plain prefix.
      if (lo > hi) inputLc.startsWith(p)
      else {
        val head = p.take(prefixLength)
        val base =
          if (head.isEmpty) lit(true) else inputLc.startsWith(head)
        val anyLen = (lo to hi).map(l =>
          editDistance(substring(inputLc, 1, l), p, transpositions) <=
            edits).reduce(_ || _)
        base && anyLen
      }
    }
  }

  /** The capped fuzzy EXPANSION SET per query term (ES
    * `max_expansions`): the first `n` distinct corpus tokens within
    * the term's edit budget (and sharing its `prefixLength`-char
    * prefix), ordered (edit distance asc, token asc) — a deterministic
    * stand-in for Lucene's frequency-blended top-N selection
    * (documented deviation; Lucene's blend is itself heuristic). ONE
    * set spans the searched fields (ES expands per field; spanning is
    * deterministic and identical on the scan and index paths, which is
    * what lets both serve one oracle). The collect is a bounded driver
    * artifact: at most `n` (≤ [[MaxExpansionsCeiling]]) tokens per
    * query term — the same bounded-artifact tier as the IVF codebook
    * and BPE merge rounds. */
  private[graft] def fuzzyExpansionSets(
      df: DataFrame, fields: Seq[String], terms: Seq[String],
      edits: Seq[Int], prefixLength: Int,
      n: Int, transpositions: Boolean = true): Map[String, Seq[String]] = {
    require(n > 0 && n <= MaxExpansionsCeiling,
      s"max_expansions must be 1..$MaxExpansionsCeiling")
    val toksAll = fields.map(f =>
        graft.functions.TextFunctions.analyzerTokens(col(f)))
      .reduce((a, b) => concat(a, b))
    val vocab = df.select(explode(toksAll).as("tok")).distinct()
    terms.zip(edits).map { case (t, e) =>
      val p = t.take(prefixLength)
      val base =
        if (p.isEmpty) vocab
        else vocab.filter(col("tok").startsWith(p))
      t -> base.filter(editDistance(col("tok"), t, transpositions) <= e)
        .withColumn("_d", editDistance(col("tok"), t, transpositions))
        .orderBy(col("_d").asc, col("tok").asc)
        .limit(n)
        .select("tok").collect().map(_.getString(0)).toSeq
    }.toMap
  }

  /** The capped PREFIX expansion set (ES `match_phrase_prefix`
    * `max_expansions`): the first `n` distinct corpus tokens starting
    * with `prefix`, ordered token asc (deterministic — Lucene takes
    * dictionary order here too). Bounded driver artifact like
    * [[fuzzyExpansionSets]]. */
  private[graft] def prefixExpansionSet(df: DataFrame,
                                        fields: Seq[String],
                                        prefix: String,
                                        n: Int): Seq[String] = {
    require(n > 0 && n <= MaxExpansionsCeiling,
      s"max_expansions must be 1..$MaxExpansionsCeiling")
    val toksAll = fields.map(f =>
        graft.functions.TextFunctions.analyzerTokens(col(f)))
      .reduce((a, b) => concat(a, b))
    df.select(explode(toksAll).as("tok")).distinct()
      .filter(col("tok").startsWith(prefix))
      .orderBy(col("tok").asc).limit(n)
      .collect().map(_.getString(0)).toSeq
  }

  /** FUZZY search (ES `match` with `fuzziness`): a field token matches a
    * query term when their Levenshtein distance is within the term's
    * resolved edit budget (Damerau–Levenshtein under the default
    * `transpositions = true`, ES's default; plain Levenshtein under
    * explicit false); scored by the total count of fuzzy-matching
    * tokens across `fields` (OR across terms), full rows returned like
    * [[multiField]]. The per-token HOF distance scan is the corpus-scan
    * oracle twin of [[graft.sinks.SearchIndex.fuzzy]]'s
    * vocabulary-expansion probe.
    *
    * `prefixLength` (ES `prefix_length`): the first `prefixLength`
    * characters are exempt from edits — a token must share them with
    * the query term exactly. Levenshtein over the FULL strings equals
    * Levenshtein over the suffixes when the prefixes agree (standard DP
    * property), so this is exactly Lucene's nonFuzzyPrefix semantics.
    * `maxExpansions` (ES `max_expansions`): the match set is capped to
    * the [[fuzzyExpansionSets]] expansion per term; absent = unbounded
    * (the engine's documented fuzzy family — no vocabulary probe). */
  def multiFieldFuzzy(df: DataFrame, query: String, fields: Seq[String],
                      fuzziness: String = "AUTO", limit: Int = 100,
                      after: Option[(Double, Any)] = None,
                      boosts: Map[String, Double] = Map.empty,
                      prefixLength: Int = 0,
                      maxExpansions: Option[Int] = None,
                      transpositions: Boolean = true): DataFrame = {
    require(prefixLength >= 0, "prefix_length must be >= 0")
    val terms =
      graft.functions.TextFunctions.analyzeText(query).distinct
    require(terms.nonEmpty, "empty query")
    val edits = terms.map(t => fuzzyEdits(t, fuzziness).getOrElse(
      throw new IllegalArgumentException(
        s"invalid fuzziness '$fuzziness'")))
    val expansions = maxExpansions.map(n =>
      fuzzyExpansionSets(df, fields, terms, edits, prefixLength, n,
        transpositions))
    val toks = fields.map(f => f ->
      graft.functions.TextFunctions.analyzerTokens(col(f)))
    def cnt(t: String, e: Int): Seq[(String, Column)] = toks.map {
      case (f, ts) =>
        val c = expansions match {
          case Some(exp) =>
            val set = exp(t)
            if (set.isEmpty) lit(0)
            else size(filter(ts, x => x.isInCollection(set)))
          case None =>
            val p = t.take(prefixLength)
            val fuzzyOk =
              (x: Column) => editDistance(x, t, transpositions) <= e
            if (p.isEmpty) size(filter(ts, fuzzyOk))
            else size(filter(ts, x => x.startsWith(p) && fuzzyOk(x)))
        }
        f -> c
    }
    val score = terms.zip(edits).map { case (t, e) =>
      cnt(t, e).map { case (f, c) => boosted(f, c, boosts) }
        .reduce(_ + _)
    }.reduce(_ + _).as("score")
    val keyCols = df.columns.toSeq.map(col)
    df.select(keyCols :+ score: _*)
      .filter(col("score") > 0)
      .filter(afterPredicate(after, col(df.columns.head)))
      .orderBy(col("score").desc, col(df.columns.head))
      .limit(limit)
  }
}

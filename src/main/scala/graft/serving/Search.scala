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

  /** Occurrences of `term` in `c` (case-insensitive):
    * (len(x) - len(remove(x, term))) / len(term). */
  def occurrences(c: Column, term: String): Column = {
    val needle = term.toLowerCase
    ((length(coalesce(c, lit(""))) -
      length(replace(lower(coalesce(c, lit(""))), lit(needle), lit("")))) /
      needle.length).cast("int")
  }

  /** Multi-field search: rows where any selected field contains `term`
    * (case-insensitive), scored by total occurrence count, top `limit`.
    */
  def multiField(df: DataFrame, term: String, fields: Seq[String],
                 limit: Int = 100): DataFrame = {
    val score = fields.map(f => occurrences(col(f), term))
      .reduce(_ + _).as("score")
    val keyCols = df.columns.toSeq.map(col)
    df.select(keyCols :+ score: _*)
      .filter(col("score") > 0)
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
                    limit: Int = 100): DataFrame = {
    val score = fields.map(f => occurrences(col(f), term))
      .reduce(_ + _).as("score")
    lake.select(col("table"), col("document_id"), score)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("document_id"), col("table"))
      .limit(limit)
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

  private def rankedRetrieval(df: DataFrame, query: String, textCol: String,
                              idCol: String, limit: Int,
                              bm25: Boolean): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    // substring prefilter BEFORE tokenizing: a doc with no query term as
    // a substring can't have one as a token, so the (codegen'd, scan-
    // evaluated) contains-any test skips tokenize+explode for most of
    // the corpus; substring false-positives ("foobar" for "foo") still
    // die at the post-explode token filter, so results are unchanged
    val anyTerm = terms.map(t => lower(col(textCol)).contains(lit(t)))
      .reduceOption(_ || _).getOrElse(lit(false))
    // explode(split(...)) not TextFunctions.tokens: the HOF filter
    // inside tokens() is interpreted per element and knocks the stage
    // out of whole-stage codegen, and the isin() below already drops
    // the empty strings tokens() exists to remove. BM25 additionally
    // carries the doc length (non-empty token count, matching avgdl's
    // definition) on each exploded row.
    val baseCols =
      if (bm25) Seq(col(idCol), tokenCount(col(textCol)).as("dl"))
      else Seq(col(idCol))
    val toks = df.filter(anyTerm).select(
        baseCols :+ explode(split(lower(col(textCol)), "\\s+")).as("term"): _*)
      .filter(col("term").isin(terms.toSeq: _*))
    // corpus statistics: one tiny aggregate of the full scan. sum(dl) is
    // an exact integer sum, so avgdl = one double division — the same
    // value in any engine (a float avg() could differ by addition order)
    val stats =
      if (bm25)
        df.select(tokenCount(col(textCol)).as("dl"))
          .agg(count(lit(1)).as("n"),
            (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      else df.select(count(lit(1)).as("n"))
    val idf = toks.groupBy("term")
      .agg(countDistinct(col(idCol)).as("df_t"))
      .crossJoin(stats)
      .select(col("term"),
        if (bm25)
          log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
            (col("df_t") + 0.5)).as("idf")
        else ((col("n") + 1.0) / (col("df_t") + 1.0)).as("idf"))
    val grouped =
      if (bm25)
        // dl is functionally dependent on the doc id — riding it in the
        // group key costs 8 bytes of shuffle width, not an extra pass
        toks.groupBy(col(idCol), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .crossJoin(broadcast(stats.select(col("avgdl"))))
      else toks.groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("tf"))
    // per-(doc, term) contribution; k1 = 1.2, b = 0.75 (Lucene defaults)
    // as plan literals, 1−b and k1+1 pre-reduced to exact decimal-parse
    // doubles so the oracle can spell the identical constants
    val perTerm: Column =
      if (bm25)
        col("idf") * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * col("idf")
    // fixed per-term addition order (query order): float addition is not
    // associative, and a free-order sum() could differ from the oracle in
    // the last ulp right at a rounding boundary
    val termScores = terms.toSeq.map(t =>
      coalesce(sum(when(col("term") === t, perTerm)), lit(0.0)))
    grouped.join(broadcast(idf), Seq("term"))
      .groupBy(col(idCol))
      .agg((floor(termScores.reduce(_ + _) * 10000.0 + 0.5)
        .cast("double") / 10000.0).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }
}

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
    val keyCols = df.columns.map(col)
    df.select(keyCols :+ score: _*)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(df.columns.head))
      .limit(limit)
  }

  /** Advanced search = the engine's actual query language. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge training over the corpus — the tokenizer-
  * construction stage of an LLM data pipeline (Sennrich et al. 2016).
  * No reference analogue; first-class training-data operator.
  *
  * Classic BPE trains on the WORD-TYPE table, not the token stream:
  * (distinct word, occurrence count), each word as a symbol sequence
  * (characters + an end-of-word marker). Each round finds the most
  * frequent adjacent symbol pair (weighted by word count) and merges it
  * everywhere. That structure maps cleanly onto Spark:
  *
  *  - The word-type table is the ONLY distributed state: one row per
  *    distinct word — orders of magnitude smaller than the corpus, but
  *    still sharded (a 100 TB multilingual corpus has billions of types;
  *    nothing here assumes it fits anywhere).
  *  - Per round: one explode of adjacent pairs + one combiner-friendly
  *    sum agg on (l, r) + a top-1 TakeOrdered — then the merge is applied
  *    as a pure projection (a higher-order `aggregate` doing the
  *    leftmost-nonoverlapping single-pass merge). Driver state per round
  *    = ONE (left, right, freq) row, the same bounded-metadata contract
  *    as the IVF codebook.
  *  - Rounds persist/unpersist the word table like
  *    [[Dedup.components]] — lineage stays flat, k rounds = k jobs.
  *
  * Determinism: ties on pair frequency break by (left, right) string
  * order, so training is reproducible run to run and engine to engine —
  * which is what lets the plain-Scala golden model
  * ([[graft.oracle.GoldenModels.bpeMerges]]) pin the output exactly.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Word-type table: (word, wc) over whitespace tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Initial symbol sequence: one symbol per character, then the
    * end-of-word marker (so merges can learn suffixes). */
  private def initSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** Adjacent symbol pairs, every occurrence (overlaps included —
    * [a,a,a] contributes (a,a) twice, the classic counting). */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** One merge round applied as a single-pass leftmost-nonoverlapping
    * scan: carry (out, prev); a (prev=l, s=r) hit emits the merged
    * symbol and clears prev, so the merged token never re-pairs with
    * the next symbol within the same round. */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    val step = (acc: Column, s: Column) => {
      val out = acc.getField("out")
      val prev = acc.getField("prev")
      when(prev.isNull, struct(out.as("out"), s.as("prev")))
        .when(prev === l && s === r,
          struct(concat(out, array(lit(l + r))).as("out"),
            lit(null).cast("string").as("prev")))
        .otherwise(
          struct(concat(out, array(prev)).as("out"), s.as("prev")))
    }
    val fin = (acc: Column) =>
      when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("prev"))))
    aggregate(syms, zero, step, fin)
  }

  /** Train `numMerges` merges; returns (step, left, right, freq) rows.
    * Stops early if no adjacent pair remains (fully merged corpus).
    *
    * ONE job per round: the round's top-1 aggregation is also the action
    * that materializes the current word table's cache (one projection
    * off the previous round's cache), so the previous cache is
    * unpersisted only AFTER that action — no separate count()
    * materialization pass, and never an uncached-lineage recompute. */
  def trainMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words = wordCounts(docs, textCol)
      .select(col("wc"), initSymbols(col("word")).as("syms"))
      .persist()
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    try {
      var step = 1
      var exhausted = false
      while (step <= numMerges && !exhausted) {
        val top = words
          .select(col("wc"), explode(adjacentPairs(col("syms"))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wc")).as("freq"))
          .orderBy(col("freq").desc, col("l"), col("r"))
          .limit(1).collect()
        prev.foreach(_.unpersist()) // `words` is cached by the action above
        prev = Some(words)
        if (top.isEmpty) exhausted = true
        else {
          val Row(l: String, r: String, freq: Long) = top(0)
          merges += ((step, l, r, freq))
          words = words
            .select(col("wc"), applyMerge(col("syms"), l, r).as("syms"))
            .persist()
          step += 1
        }
      }
      merges.toSeq
    } finally {
      prev.foreach(_.unpersist())
      words.unpersist()
    }
  }

  /** [[trainMerges]] as a DataFrame (step, left, right, freq) — the
    * merge table IS the trained artifact (k rows, bounded metadata). */
  def trainMergesDf(spark: SparkSession, docs: DataFrame, textCol: String,
                    numMerges: Int): DataFrame = {
    import spark.implicits._
    trainMerges(docs, textCol, numMerges)
      .toDF("step", "left", "right", "freq")
  }

  /** Trained VOCABULARY: corpus-weighted symbol frequencies after
    * applying `merges` — the artifact a tokenizer ships next to its
    * merge table. Same vocab-level economics as [[encodeTokenCounts]]:
    * the merge chain runs over distinct words, frequencies come from
    * one weighted explode + hash agg. */
  def vocab(docs: DataFrame, textCol: String,
            merges: Seq[(String, String)]): DataFrame = {
    val syms = merges.foldLeft(initSymbols(col("word"))) {
      case (s, (l, r)) => applyMerge(s, l, r)
    }
    wordCounts(docs, textCol)
      .select(col("wc"), explode(syms).as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("wc")).as("freq"))
  }

  /** ENCODE under a trained merge list: per-document whitespace-word and
    * BPE-subword counts — the token-budget number that [[Pack]] and a
    * trainer actually consume. Merge application contract: one
    * leftmost-nonoverlapping pass per merge, in training order (the
    * same pass [[trainMerges]] applies per round).
    *
    * Cost scales with |vocabulary|, not corpus: each distinct word type
    * is encoded ONCE (the merge chain is a pure projection over the
    * distinct-word table) and the per-word subword count joins back
    * onto the token stream — at 100 TB that join is (word, small-int)
    * against an explode, both shuffled on the word key, while the
    * k-deep merge projection runs over the comparatively tiny vocab. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)]): DataFrame = {
    val encoded = merges.foldLeft(initSymbols(col("word"))) {
      case (s, (l, r)) => applyMerge(s, l, r)
    }
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .distinct()
      .select(col("word"), size(encoded).as("n_sub"))
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("word"))
      .join(vocab, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"))
  }
}

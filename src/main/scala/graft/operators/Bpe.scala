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
  *  - The PAIR-COUNT table is maintained incrementally next to it: per
  *    round a top-1 TakeOrdered over the cached pair table, a delta
  *    explode over only the words that contain the merged pair, and a
  *    conditional-merge projection of the word table (see
  *    [[trainMerges]]). Driver state per round = ONE (left, right,
  *    freq) row, the same bounded-metadata contract as the IVF
  *    codebook.
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
    * INCREMENTAL pair-count maintenance (the fastBPE/HuggingFace-trainer
    * technique, distributed): the pair-count table is persistent state
    * alongside the word table, and each round UPDATES it from the merge's
    * delta instead of recounting every pair of every word —
    *
    *  - top-1: one TakeOrdered over the cached pair table (pair-type
    *    rows, orders of magnitude smaller than the word table);
    *  - delta: only words CONTAINING the merged pair are exploded —
    *    old pairs weighted −wc, post-merge pairs +wc, one hash agg; by
    *    mid-training that is a vanishing fraction of the corpus, which
    *    is what makes per-merge cost sub-linear in the word table
    *    (the recount form re-aggregates every pair every round);
    *  - pair table ← full-outer join with the (tiny) delta, zero counts
    *    dropped; word table ← one conditional-merge projection.
    *
    * Still one action per round (the top-1 materializes the previous
    * round's lazy state), and each round's word/pair tables are cut to
    * a flat `localCheckpoint(eager = false)` plan — without the cut,
    * round k's plan nests k joins/projections and Catalyst re-analysis
    * makes late rounds quadratically slow (a 64-round nested plan
    * overflows the tree-string stack outright). Local checkpoints trade
    * executor-loss recomputability for speed; a multi-day production
    * vocabulary run should periodically swap in a reliable
    * `checkpoint()` against a configured checkpoint dir.
    * [[trainMergesRecount]] keeps the recount-every-round reference
    * form; BpeSpec pins both to the golden trainer at 64 merges. */
  def trainMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[(Int, String, String, Long)] = {
    import org.apache.spark.sql.graft.DatasetUtils.unpersistPlanRdd
    var words = wordCounts(docs, textCol)
      .select(col("wc"), initSymbols(col("word")).as("syms"))
      .localCheckpoint(false)
    var pairs = words
      .select(col("wc"), explode(adjacentPairs(col("syms"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).as("freq"))
      .localCheckpoint(false)
    // two-round history: words_{i-1} is still the physical parent of
    // words_i's (lazy) checkpoint until round i+1's action materializes
    // it, so storage is released with a one-round lag
    val live = scala.collection.mutable.Queue.empty[DataFrame]
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    try {
      var step = 1
      var exhausted = false
      while (step <= numMerges && !exhausted) {
        val top = pairs.orderBy(col("freq").desc, col("l"), col("r"))
          .limit(1).collect()
        while (live.size > 4) unpersistPlanRdd(live.dequeue())
        if (top.isEmpty) exhausted = true
        else {
          val Row(l: String, r: String, freq: Long) = top(0)
          merges += ((step, l, r, freq))
          val hasPair = exists(adjacentPairs(col("syms")),
            p => p.getField("l") === l && p.getField("r") === r)
          val oldPairs = transform(adjacentPairs(col("syms")),
            p => struct(p.getField("l").as("l"), p.getField("r").as("r"),
              lit(-1L).as("sgn")))
          val newPairs = transform(
            adjacentPairs(applyMerge(col("syms"), l, r)),
            p => struct(p.getField("l").as("l"), p.getField("r").as("r"),
              lit(1L).as("sgn")))
          val delta = words.filter(hasPair)
            .select(col("wc"), explode(concat(oldPairs, newPairs)).as("d"))
            .groupBy(col("d.l").as("l"), col("d.r").as("r"))
            .agg(sum(col("wc") * col("d.sgn")).as("dfreq"))
            .filter(col("dfreq") =!= 0L)
          live.enqueue(pairs)
          pairs = pairs.join(delta, Seq("l", "r"), "full_outer")
            .select(col("l"), col("r"),
              (coalesce(col("freq"), lit(0L)) +
                coalesce(col("dfreq"), lit(0L))).as("freq"))
            .filter(col("freq") > 0L)
            .localCheckpoint(false)
          live.enqueue(words)
          words = words.select(col("wc"),
            when(hasPair, applyMerge(col("syms"), l, r))
              .otherwise(col("syms")).as("syms"))
            .localCheckpoint(false)
          step += 1
        }
      }
      merges.toSeq
    } finally {
      live.foreach(unpersistPlanRdd)
      unpersistPlanRdd(words)
      unpersistPlanRdd(pairs)
    }
  }

  /** The recount-every-round reference trainer (the pre-incremental
    * form): per round one FULL pair explode + agg over the whole word
    * table — the property that distinguishes it from [[trainMerges]].
    * Kept as the independent cross-check the incremental form is pinned
    * against (BpeSpec) and as the simplest statement of the semantics.
    * Rounds use the same flat `localCheckpoint` lineage cut (nested
    * per-round persist chains make Spark 4's AQE re-stringify a plan
    * that embeds every earlier round's cached plan — quadratic strings,
    * stack overflow by round ~30). */
  def trainMergesRecount(docs: DataFrame, textCol: String,
                         numMerges: Int): Seq[(Int, String, String, Long)] = {
    import org.apache.spark.sql.graft.DatasetUtils.unpersistPlanRdd
    var words = wordCounts(docs, textCol)
      .select(col("wc"), initSymbols(col("word")).as("syms"))
      .localCheckpoint(false)
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
        prev.foreach(unpersistPlanRdd) // `words` materialized just above
        prev = Some(words)
        if (top.isEmpty) exhausted = true
        else {
          val Row(l: String, r: String, freq: Long) = top(0)
          merges += ((step, l, r, freq))
          words = words
            .select(col("wc"), applyMerge(col("syms"), l, r).as("syms"))
            .localCheckpoint(false)
          step += 1
        }
      }
      merges.toSeq
    } finally {
      prev.foreach(unpersistPlanRdd)
      unpersistPlanRdd(words)
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
            merges: Seq[(String, String)]): DataFrame =
    wordCounts(docs, textCol)
      .select(col("wc"), explode(encodedSymbols(col("word"), merges))
        .as("symbol"))
      .groupBy(col("symbol")).agg(sum(col("wc")).as("freq"))

  /** Symbols of a word column under a trained merge list — ONE flat
    * generated loop over the broadcast-style merge table
    * ([[org.apache.spark.sql.graft.BpeEncodeWord]]) instead of folding
    * k nested `aggregate()` HOFs (whose expression-tree depth and
    * interpreted per-element dispatch make 10k+ merge tables unusable).
    * Pinned bit-identical to the HOF fold in BpeSpec. */
  def encodedSymbols(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeExpressions
      .bpeEncodeWord(word, merges, EndOfWord)

  /** The k-nested-HOF encode (fold of [[applyMerge]]) — the reference
    * form [[encodedSymbols]] is pinned against; fine for small k. */
  private[graft] def encodedSymbolsHof(word: Column,
                                       merges: Seq[(String, String)]): Column =
    merges.foldLeft(initSymbols(word)) {
      case (s, (l, r)) => applyMerge(s, l, r)
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
    val encoded = encodedSymbols(col("word"), merges)
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

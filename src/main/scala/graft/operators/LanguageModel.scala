package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus n-gram language model: train bigram/unigram count tables over a
  * training slice, score documents by average log-probability under
  * stupid backoff (Brants et al. 2007, "Large Language Models in Machine
  * Translation" — the score large-scale pipelines use because it needs no
  * discounting pass, only raw counts). Perplexity-style scores are a
  * standard quality filter for LLM training data (a CCNet/KenLM-class
  * signal) — this is the fully-distributed, oracle-pinned analog.
  *
  * Scale design:
  *  - The LM IS a pair of distributed count tables (unigram, bigram) —
  *    plain hash aggregations with map-side partial counts; nothing is
  *    collected to the driver and nothing assumes the model fits in one
  *    executor. At 100 TB the bigram table is itself large; scoring joins
  *    it by key, so it stays sharded.
  *  - Scoring = one explode of the eval side's bigram stream + three
  *    equi-joins (bigram count, left-context count, backoff-word count)
  *    + one per-doc aggregation. All joins are on token-string keys so
  *    the DuckDB oracle can replay them exactly; a production variant
  *    would key by xxhash64(ngram) for 8-byte shuffles (same plan shape,
  *    collisions only perturb counts).
  *  - The corpus-total token count is a one-row aggregate broadcast into
  *    the plan (same pattern as [[Mix.sample]]'s per-domain rates), never
  *    a driver-side constant.
  *
  * Stupid backoff, fully specified (so the oracle can pin every branch):
  *  - seen bigram:            P = c2(w1 w2) / c1(w1)
  *  - unseen bigram, seen w2: P = alpha * c1(w2) / N
  *  - OOV w2:                 P = alpha / N        (uniform floor)
  * where counts come from the TRAIN slice only — an eval/train split is
  * what makes the backoff branches reachable at all (scoring a corpus
  * under a model of itself never backs off).
  */
object LanguageModel {

  /** floor-form 4-decimal rounding — engine-portable (see
    * [[graft.functions.TextFunctions.qualityScore]]'s rationale). */
  private def round4(x: Column): Column =
    floor(x * 10000.0 + 0.5).cast("double") / 10000.0

  /** Unigram count table (w, c1) over the train slice. */
  def unigramCounts(train: DataFrame, textCol: String): DataFrame =
    train.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))

  /** Bigram count table (b = "w1 w2", c2) over the train slice.
    * Multiplicity counts every occurrence, not per-document presence. */
  def bigramCounts(train: DataFrame, textCol: String): DataFrame =
    train.select(explode(bigrams(col(textCol))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c2"))

  /** Score `eval` docs under the LM trained on `train`: returns
    * (idCol, n_bigrams, avg_logp, ppl) per eval document with ≥ 2
    * tokens; ppl = exp(−avg_logp). */
  def scoreStupidBackoff(
      train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      alpha: Double = 0.4): DataFrame = {
    val uni = unigramCounts(train, textCol)
    val bgc = bigramCounts(train, textCol)
    val tot = uni.agg(sum(col("c1")).cast("double").as("n_total"))

    val stream = eval
      .select(col(idCol), explode(bigrams(col(textCol))).as("b"))
      .withColumn("w1", split(col("b"), " ").getItem(0))
      .withColumn("w2", split(col("b"), " ").getItem(1))

    // left joins: an unseen bigram / OOV word must reach the backoff
    // branches, not vanish from the average
    val scored = stream
      .join(bgc, Seq("b"), "left")
      .join(uni.select(col("w").as("w1"), col("c1").as("c1w1")),
        Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("logp",
        when(col("c2").isNotNull,
          log(col("c2").cast("double") / col("c1w1")))
          .when(col("c1w2").isNotNull,
            log(lit(alpha) * col("c1w2") / col("n_total")))
          .otherwise(log(lit(alpha) / col("n_total"))))

    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round4(avg(col("logp"))).as("avg_logp"),
        round4(exp(-avg(col("logp")))).as("ppl"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.distinctShingles

/** Benchmark decontamination — flag corpus documents that share word
  * n-grams with an evaluation/benchmark set, so they can be dropped
  * before training (the standard contamination guard; production
  * pipelines use 8-13-gram exact overlap).
  *
  * No reference analogue (the reference is an ETL mirror); this is a
  * first-class training-data operator the brief calls for.
  *
  * Scale shape: the benchmark side is tiny relative to the corpus
  * (MBs-GBs of eval sets vs 100 TB of corpus), so its distinct shingle
  * hashes broadcast and the whole pass is ONE corpus scan + a broadcast
  * semi-join — the corpus is never shuffled. AQE picks broadcast from
  * runtime size; if a pathological benchmark outgrows the threshold the
  * same plan degrades to a shuffled join on 8-byte keys, not documents.
  */
object Decontaminate {

  /** (id, n_hits) per corpus document sharing ≥1 word `n`-gram with
    * `bench`; n_hits = how many of the document's DISTINCT shingles are
    * contaminated. Shingles ride the joins as xxhash64 keys (8 bytes vs
    * ~40-byte strings; a collision could only add a false hit and the
    * oracle gate empirically pins none on the testdata). */
  def overlap(corpus: DataFrame, bench: DataFrame,
              idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val corpusSh = corpus
      .select(col(idCol), explode(distinctShingles(col(textCol), n)).as("s"))
      .select(col(idCol), xxhash64(col("s")).as("sh"))
    val benchSh = bench
      .select(explode(distinctShingles(col(textCol), n)).as("s"))
      .select(xxhash64(col("s")).as("sh"))
      .distinct()
    corpusSh
      .join(benchSh, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-summary statistics — the sketch layer a 100 TB corpus
  * profile needs (beyond the reference, which only ever counts rows:
  * src/es_connector.py:76-83). The point of every operator here is the
  * SCALE CONTRACT, not the number itself:
  *
  *  - sketches are fixed-size (KB) regardless of input size, so a
  *    per-partition partial aggregate + one tiny merge replaces any
  *    full-shuffle distinct;
  *  - sketches are mergeable AFTER the fact: per-day / per-source
  *    profiles roll up to corpus profiles without touching raw data
  *    again ([[rollupSketches]]) — the property that makes incremental
  *    100 TB profiling possible at all;
  *  - every approximate path has an exact ground-truth twin on the same
  *    shape (`a7_stats_profile`, `a8_heavy_hitters` oracled queries;
  *    `SketchesSpec` bounds the sketch error against the exact answer).
  *
  * Built on Spark's native sketch aggregates (Apache DataSketches HLL,
  * GK quantiles, count-min) — all codegen-friendly partial aggregates,
  * no UDFs, no driver-side loops.
  */
object Sketches {

  /** Per-group distinct-cardinality profile as a mergeable DataSketches
    * HLL sketch (+ its estimate). One combiner-friendly shuffle of
    * lgK-sized buffers — at 100 TB the shuffle moves ~4 KB per
    * (group × partition), never the values themselves. */
  def distinctProfile(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("distinct_sketch"))
      .withColumn("distinct_estimate",
        hll_sketch_estimate(col("distinct_sketch")))

  /** Merge finer-grained profiles up a hierarchy WITHOUT re-reading raw
    * data: group the sketch column and union. This is the incremental /
    * hierarchical path: per-day profiles → monthly → corpus, each level
    * a sketch-sized aggregation. */
  def rollupSketches(profiles: DataFrame,
                     groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) profiles.groupBy()
      else profiles.groupBy(groupCols.map(col): _*)
    grouped
      .agg(hll_union_agg(col("distinct_sketch")).as("distinct_sketch"))
      .withColumn("distinct_estimate",
        hll_sketch_estimate(col("distinct_sketch")))
  }

  /** Approximate quantiles via Spark's GK sketch: rank error ≤
    * n/accuracy, fixed-size state, single partial-agg pass. The exact
    * twin (`percentile`) is what the oracle pins; this is the 100 TB
    * path. */
  def quantileSketch(df: DataFrame, valueCol: String,
                     probs: Seq[Double],
                     accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(valueCol),
      array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Exact heavy hitters: two-stage hash aggregation (map-side partial
    * combine shrinks each partition to its distinct items) + TakeOrdered
    * top-k. The ground-truth tier — and for hash-aggregable keys it is
    * already the right 100 TB plan; [[cmsProbe]] is the single-pass,
    * bounded-memory alternative when even the distinct-key aggregate is
    * too large. Deterministic tiebreak on the item itself. */
  def heavyHittersExact(df: DataFrame, itemCol: Column, k: Int): DataFrame =
    df.select(itemCol.as("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("item"))
      .limit(k)

  /** Single-pass count-min frequency probe: build one (eps, confidence)
    * count-min sketch over the whole column — fixed-size state, one
    * partial-agg pass, no per-key shuffle — then answer point frequency
    * queries driver-side. Guarantees: estimate ≥ true count, and ≤ true
    * count + eps·n with probability ≥ confidence. `df.stat
    * .countMinSketch` is Spark's public sketch API (spark-sketch). */
  def cmsProbe(df: DataFrame, itemCol: String, items: Seq[String],
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): Map[String, Long] = {
    val cms = df.stat.countMinSketch(itemCol, eps, confidence, seed)
    items.map(i => i -> cms.estimateCount(i)).toMap
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sketches

/** Pins the calibrated-quality threshold agreement across the three
  * tiers:
  *
  *  1. collect_list k-th smallest — the small-scale form the registered
  *     query used to ship (per-source buffer grows with the corpus;
  *     demoted to test-only reference, the dedup_embedding playbook);
  *  2. the registered EXACT two-pass histogram form (state bounded by
  *     the 1e-4 score grid) — must equal tier 1 EXACTLY;
  *  3. GK sketch (`Sketches.quantileSketch` / percentile_approx) — the
  *     un-gridded-score path; rank error ≤ n/accuracy pins it within
  *     one grid step of the exact threshold here.
  */
class QualityThresholdSpec extends SparkSpec {

  private lazy val scored = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("source"),
      TextFunctions.qualityScore(col("text")).as("q"))
    .cache()

  private def exactCollect() = scored.groupBy(col("source")).agg(
    element_at(sort_array(collect_list(col("q"))),
      ceil(count(lit(1)) * 0.25).cast("int")).as("q25"))

  private def exactHistogram() = {
    val hist = scored.groupBy(col("source"), col("q"))
      .agg(count(lit(1)).as("c"))
    val bySrc = Window.partitionBy(col("source"))
    val cum = bySrc.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("_cum", sum(col("c")).over(cum))
      .withColumn("_k", ceil(sum(col("c")).over(bySrc) * 0.25))
      .filter(col("_cum") >= col("_k"))
      .groupBy(col("source")).agg(min(col("q")).as("q25"))
  }

  test("two-pass histogram threshold == collect_list k-th smallest, " +
    "per source") {
    val a = exactCollect().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = exactHistogram().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a.nonEmpty && a.keySet == b.keySet)
    a.foreach { case (src, q) =>
      assert(b(src) == q, s"source $src: histogram ${b(src)} != exact $q")
    }
  }

  test("GK sketch threshold within one grid step of exact (the " +
    "un-gridded-score scale path)") {
    val exact = exactHistogram().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gk = scored.groupBy(col("source"))
      .agg(percentile_approx(col("q"), lit(0.25), lit(10000)).as("q25"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gk.keySet == exact.keySet)
    exact.foreach { case (src, q) =>
      // accuracy=10000 → rank error ≤ n/10000; at sf0.001 (≤ tens of
      // docs per source) the sketch is exact, so pin to one 1e-4 grid
      // step to leave room only for float representation
      assert(math.abs(gk(src) - q) <= 1e-4 + 1e-12,
        s"source $src: gk ${gk(src)} vs exact $q")
    }
  }

  test("global quantileSketch brackets the exact global quartile") {
    val g = Sketches.quantileSketch(scored, "q", Seq(0.25))
      .collect()(0).getSeq[Double](0).head
    val n = scored.count()
    val k = math.ceil(n * 0.25).toInt
    val exact = scored.orderBy(col("q")).select(col("q"))
      .limit(k).collect().last.getDouble(0)
    assert(math.abs(g - exact) <= 1e-4 + 1e-12)
  }
}

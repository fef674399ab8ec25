package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment a
  * training-data pipeline needs (beyond the reference, which has no
  * notion of splits). The load-bearing property is REPRODUCIBILITY
  * UNDER CHANGE, which `rand()` and `row_number()` both lack:
  *
  *  - a document's split is a pure function of its key (+ salt), so it
  *    never changes when the corpus grows, shrinks, repartitions, or
  *    reorders — no train/test leakage across pipeline re-runs;
  *  - assignment is a stateless per-row projection (one md5, one
  *    substring, one comparison chain — all codegen'd): no shuffle, no
  *    global coordination, embarrassingly parallel at 100 TB;
  *  - the hash family is md5-hex (uniform per position), bucketed by
  *    the first 4 hex chars → 1/65536 weight granularity, which also
  *    makes the assignment expressible in any engine with md5 (the
  *    DuckDB oracle pins it cross-engine).
  *
  * Changing `salt` re-rolls every assignment at once — the knob for
  * drawing a fresh independent split without touching keys.
  */
object Split {

  /** Uniform bucket in [0, 65536): the first 16 bits of
    * md5(key ++ salt), decoded from hex. */
  def hashBucket(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 4),
      16, 10).cast("int")

  /** Add a `split` column assigning each row to a named fraction.
    * `weights` must sum to 1 (±1e-9); fractions are quantized to
    * 1/65536. Order matters only for which side of a quantization
    * boundary a bucket lands on — assignment is always total. */
  def assign(df: DataFrame, keyCol: String,
             weights: Seq[(String, Double)] =
               Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
             salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val bucket = hashBucket(col(keyCol), salt)
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 65536.0).toInt)
    // when(bucket < cut1, w1).when(bucket < cut2, w2)...otherwise(last)
    val chain = weights.init.zip(cuts.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(bucket < cut, name))(
          _.when(bucket < cut, name)))
      }
    val split = chain.fold(lit(weights.last._1))(
      _.otherwise(weights.last._1))
    df.withColumn("split", split)
  }
}

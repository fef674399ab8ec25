package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the "quality classifier" stage of a
  * training-data pipeline (a linear model over engine-computed text
  * features, the fasttext-classifier role) expressed as pure codegen'd
  * column arithmetic: the model IS the plan, broadcast as literals, so
  * scoring a 100 TB corpus is one scan with zero shuffles and zero
  * external model state.
  *
  * The squashing function is the algebraic sigmoid
  * `σ̃(x) = 0.5 + 0.5·x/(1+|x|)` rather than the logistic `1/(1+e^-x)`:
  * same monotone S-shape and 0.5 decision point at x=0, but built from
  * +,·,/,|·| only — bit-identical across engines (IEEE-exact), whereas
  * `exp` differs in the last ulp between libm implementations, which
  * would poison a hash-compare oracle. A production model swaps weights;
  * the plan shape is invariant. */
object Score {

  /** `logit = bias + Σ wᵢ·featureᵢ`, `score = σ̃(logit)`, keep at
    * score ≥ 0.5. Both emitted rounded to 4 decimals (the engine's
    * cross-engine float contract); `keep` is decided on the UNROUNDED
    * logit sign, so rounding never flips a decision. */
  def linear(
      df: DataFrame, features: Seq[(Column, Double)], bias: Double,
      logitCol: String = "logit", scoreCol: String = "score",
      keepCol: String = "keep"): DataFrame = {
    val logit = features.foldLeft(lit(bias): Column) {
      case (acc, (f, w)) => acc + f * lit(w)
    }
    val score = lit(0.5) + lit(0.5) * logit / (lit(1.0) + abs(logit))
    df.withColumn(logitCol, logit)
      .withColumn(scoreCol, score)
      .withColumn(keepCol, col(logitCol) >= 0.0)
      .withColumn(logitCol, Similarity.round4(col(logitCol)))
      .withColumn(scoreCol, Similarity.round4(col(scoreCol)))
  }
}

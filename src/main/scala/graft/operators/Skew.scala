package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities — the manual counterpart to AQE's
  * runtime skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on in [[graft.GraftSession]]). AQE handles skew it can *observe* in
  * shuffle statistics; explicit salting is the tool when a hot key is
  * known a priori (a null-heavy foreign key, one giant customer) or when
  * the join sits upstream of an operation AQE cannot re-plan.
  *
  * Shape: the skewed (fact) side gets a deterministic salt in
  * `[0, factor)`, the small/replicable side is exploded `factor`× — so
  * one hot key's rows spread over `factor` reducers at the cost of
  * duplicating only the compact side. Salt is `pmod(xxhash64(cols...))`,
  * not `rand()`: retries and speculative tasks must re-produce the same
  * salt or the join silently drops/duplicates rows.
  */
object Skew {

  /** Deterministic salt column from `cols` (row-identity columns of the
    * skewed side). */
  def salt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor.toLong)).cast("int")

  /** Inner/left equi-join `big ⋈ small` on `bigKey === smallKey`,
    * salted `factor` ways. Result is row-identical to the unsalted join
    * ([[graft.SkewSpec]] pins that); only the partitioning changes. */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // right/full-outer would emit each unmatched small-side row once per
    // salt replica — silent duplication; salt the other side instead
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports ${SupportedJoinTypes.mkString("/")}, " +
        s"not '$joinType' (the exploded side must not be null-extended)")
    val saltCols = big.columns.map(col).toSeq
    val b = big.withColumn("_salt", salt(factor, saltCols: _*))
    val s = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    b.join(s,
        b(bigKey) === s(smallKey) && b("_salt") === s("_salt"), joinType)
      .drop("_salt")
  }
}

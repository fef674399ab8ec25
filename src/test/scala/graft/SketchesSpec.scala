package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Error-bound specs for the sketch layer against exact answers on real
  * testdata — every approximate path is pinned to its ground-truth twin
  * with the sketch's own published guarantee. */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = spark.read.parquet(s"$dir/events.parquet")
    .filter(col("event_type").isNotNull && col("user_id").isNotNull)
  private lazy val customer = spark.read.parquet(s"$dir/customer.parquet")

  test("HLL distinct profile is within the sketch's error bound per group") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.distinctProfile(events, Seq("event_type"), "user_id")
      .collect().map(r =>
        r.getAs[String]("event_type") ->
        r.getAs[Long]("distinct_estimate").toDouble)
    assert(est.nonEmpty)
    est.foreach { case (k, e) =>
      // lgK=12 HLL: rse ~1.04/sqrt(2^12) ≈ 1.6%; allow 5 sigma + slack
      val truth = exact(k).toDouble
      assert(math.abs(e - truth) <= math.max(2.0, truth * 0.10),
        s"group $k: estimate $e vs exact $truth")
    }
  }

  test("sketch rollup (union) ≈ whole-corpus sketch — no raw re-read") {
    val perGroup = Sketches.distinctProfile(
      events, Seq("event_type"), "user_id")
    val rolled = Sketches.rollupSketches(perGroup, Nil)
      .collect().head.getAs[Long]("distinct_estimate").toDouble
    val whole = Sketches.distinctProfile(events, Nil, "user_id")
      .collect().head.getAs[Long]("distinct_estimate").toDouble
    // same sketch family + params ⇒ union of partials estimates the same
    // universe; allow small drift from merge-mode differences
    assert(math.abs(rolled - whole) <= math.max(2.0, whole * 0.05),
      s"rolled $rolled vs whole $whole")
    val exact = events.agg(countDistinct(col("user_id"))).head.getLong(0)
    assert(math.abs(rolled - exact) <= math.max(2.0, exact * 0.10))
  }

  test("count-min probe: estimate ≥ truth and ≤ truth + eps·n") {
    val terms = events.select(col("event_type").as("item"))
    val exact = terms.groupBy("item").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.001
    val est = Sketches.cmsProbe(terms, "item", exact.keys.toSeq, eps = eps)
    exact.foreach { case (k, truth) =>
      val e = est(k)
      assert(e >= truth, s"$k: CMS underestimated ($e < $truth)")
      assert(e <= truth + (eps * n).toLong + 1,
        s"$k: CMS above one-sided bound ($e > $truth + ${eps * n})")
    }
  }

  test("quantile sketch is rank-correct within n/accuracy of exact") {
    val vals = customer.select("c_acctbal")
      .collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val probs = Seq(0.1, 0.5, 0.9)
    val acc = 1000
    val approx = Sketches.quantileSketch(
        customer, "c_acctbal", probs, accuracy = acc)
      .collect().head.getSeq[Double](0)
    probs.zip(approx).foreach { case (p, q) =>
      // GK guarantee: returned value's rank within eps*n of target rank
      val rank = vals.count(_ <= q)
      val target = p * n
      val tol = n.toDouble / acc + 1
      assert(math.abs(rank - target) <= tol,
        s"p=$p: value $q has rank $rank, target $target ± $tol")
    }
  }

  test("exact heavy hitters: deterministic order, correct counts") {
    val df = spark.createDataFrame(Seq(
      ("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2), ("c", 1),
      ("d", 1))).toDF("t", "x")
    val top = Sketches.heavyHittersExact(df, col("t"), 3).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L))) // c before d: tiebreak on item
  }
}

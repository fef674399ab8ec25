package graft

import org.apache.spark.sql.functions._

import graft.operators.{Split, Temporal}

/** Specs for the deterministic split operator and the binned range
  * join — the two properties that matter are exactly the ones a naive
  * implementation loses: split stability under corpus change, and
  * range-join equivalence to the naive O(n·m) predicate join. */
class SplitSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("split is a pure function of the key: stable under corpus change") {
    val full = Split.assign(docs.select("doc_id"), "doc_id", salt = "s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // half the corpus, shuffled partitioning: every surviving key keeps
    // its assignment (rand()/row_number() both fail this)
    val half = Split.assign(
        docs.select("doc_id").filter(col("doc_id") % 2 === 0)
          .repartition(7), "doc_id", salt = "s")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.nonEmpty)
    half.foreach { case (k, v) => assert(full(k) == v, s"key $k moved") }
  }

  test("split fractions land near the requested weights") {
    val n = docs.count().toDouble
    val bys = Split.assign(docs.select("doc_id"), "doc_id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bys("train") / n - 0.9) < 0.05)
    assert(math.abs(bys.getOrElse("val", 0L) / n - 0.05) < 0.04)
    assert(math.abs(bys.getOrElse("test", 0L) / n - 0.05) < 0.04)
  }

  test("different salts draw independent splits") {
    val a = Split.assign(docs.select("doc_id"), "doc_id", salt = "a")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Split.assign(docs.select("doc_id"), "doc_id", salt = "b")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // ~0.815 expected agreement for 0.9/0.05/0.05 independent draws;
    // all-equal (salt ignored) would be 1.0
    val agree = a.keys.count(k => a(k) == b(k)).toDouble / a.size
    assert(agree < 0.95, s"salt change barely moved the split ($agree)")
  }

  test("weights must sum to 1") {
    intercept[IllegalArgumentException] {
      Split.assign(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("packByBudget: contiguous batches, sums exceed budget by ≤ 1 doc") {
    val nt = Seq((1L, 500L), (2L, 800L), (3L, 900L), (4L, 100L),
      (5L, 2500L), (6L, 300L)).toDF("doc_id", "n_tokens")
    val packed = graft.operators.Pack.packByBudget(
        nt, "n_tokens", budget = 1000L, orderCol = "doc_id",
        groupCols = Nil)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // prefix sums (excl self): 0,500,1300,2200,2300,4800
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L,
      5L -> 2L, 6L -> 4L))
    // per-batch total ≤ budget + max single doc (the streaming-pack bound)
    val sums = graft.operators.Pack.packByBudget(
        nt, "n_tokens", 1000L, "doc_id", Nil)
      .groupBy("batch_id").agg(sum("n_tokens").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.forall(_ <= 1000L + 2500L))
    // batch ids are dense-ordered by doc order (monotone non-decreasing)
    val ordered = graft.operators.Pack.packByBudget(
        nt, "n_tokens", 1000L, "doc_id", Nil)
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(ordered.sameElements(ordered.sorted))
  }

  test("binned range join == naive predicate join, including overlaps") {
    val pts = (0 until 500).map(i => (i.toLong, i * 3.7 % 100))
      .toDF("id", "v")
    val iv = Seq((1L, 0.0, 15.0), (2L, 10.0, 30.0), (3L, 25.0, 90.0),
      (4L, 95.0, 100.0), (5L, 40.0, 41.0)).toDF("iid", "lo", "hi")
    val binned = Temporal.rangeJoin(pts, "v", iv, "lo", "hi", binWidth = 10.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val naive = pts.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
    // overlap region produces multi-matches and no duplicates
    val pairs = Temporal.rangeJoin(pts, "v", iv, "lo", "hi", 10.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.toSet.size, "duplicate (point, interval) pair")
  }

  test("Mix.epochs replicates by rate: whole epochs exact, fractional " +
      "slice deterministic, unknown domains dropped") {
    import graft.operators.Mix
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i < 100) "a" else "b")).toDF("doc_id", "source")
    // N=200, n_a=n_b=100: rate_a = 0.75*2 = 1.5, rate_b = 0.25*2 = 0.5
    val out = Mix.epochs(docs, "source", "doc_id",
      Map("a" -> 0.75, "b" -> 0.25), targetFrac = 1.0)
    val byDom = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every 'a' doc appears once; ~half appear twice; 'b' ~half once
    assert(byDom("a") >= 100 && byDom("a") <= 200)
    assert(byDom("b") >= 20 && byDom("b") <= 80)
    // epoch indices are dense from 0 per doc
    val eps = out.filter(col("source") === "a")
      .groupBy("doc_id").agg(min("epoch").as("mn"), max("epoch").as("mx"),
        count(lit(1)).as("c")).collect()
    assert(eps.forall(r => r.getAs[Int]("mn") == 0 &&
      r.getAs[Long]("c") == r.getAs[Int]("mx") + 1L))
    // deterministic under re-run
    val again = Mix.epochs(docs, "source", "doc_id",
      Map("a" -> 0.75, "b" -> 0.25), targetFrac = 1.0)
      .select("doc_id", "epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == out.select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet)
    // unknown domain vanishes
    val unknown = Mix.epochs(docs, "source", "doc_id", Map("a" -> 1.0))
    assert(unknown.filter(col("source") === "b").count() == 0)
  }

  test("Mix.temperatureSample: alpha=0.5 up-weights small domains; " +
    "alpha=1 reproduces natural proportions") {
    import graft.operators.Mix
    // skewed corpus: big=800, small=50
    val docs = ((1L to 800L).map(i => (i, "big")) ++
      (1001L to 1050L).map(i => (i, "small"))).toDF("doc_id", "source")
    val t5 = Mix.temperatureSample(docs, "source", "doc_id",
      alpha = 0.5, targetFrac = 0.5)
    val by5 = t5.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sampled fraction of the small domain must exceed the big one's
    // (flattening toward uniform), and exceed its own natural share
    val fracSmall = by5.getOrElse("small", 0L).toDouble / 50.0
    val fracBig = by5.getOrElse("big", 0L).toDouble / 800.0
    assert(fracSmall > fracBig,
      s"alpha<1 should up-weight the small domain: $by5")
    // alpha=1: weights ∝ n_g, so every domain thins at the same rate
    // (targetFrac) — rates are exactly equal by construction, and the
    // realized counts land near targetFrac of each domain
    val t1 = Mix.temperatureSample(docs, "source", "doc_id",
      alpha = 1.0, targetFrac = 0.5)
    val by1 = t1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(by1("big") / 800.0 - 0.5) < 0.06, by1.toString)
    assert(math.abs(by1("small") / 50.0 - 0.5) < 0.15, by1.toString)
  }

  test("Mix.stratifiedExact caps per stratum and is re-run stable") {
    import graft.operators.Mix
    val docs = (0 until 300).map(i =>
      (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val out = Mix.stratifiedExact(docs, "source", "doc_id", cap = 10)
    val counts = out.groupBy("source").count().collect()
      .map(_.getLong(1))
    assert(counts.length == 3 && counts.forall(_ == 10L))
    val again = Mix.stratifiedExact(docs, "source", "doc_id", cap = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }
}

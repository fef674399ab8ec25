package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "spark reads parquet fast and filters early then " +
    "joins broadcast dims and aggregates partials before the shuffle"
  private def docs = Seq(
    (1L, base),
    (2L, base),                       // exact dup of 1
    (3L, base + " with one extra"),   // near dup of 1
    (4L, "completely unrelated text about gardens flowers bees honey " +
      "pollen hives queens workers drones nectar")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 3)
    val dup = out.filter(col("dup_count") === 2).collect()(0)
    assert(dup.getAs[Long]("canonical_id") == 1L)
  }

  test("minhash near-dups finds exact+near pairs, not unrelated ones") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard pairs: exact dup scores 1.0, near dup below") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Double]("jaccard"))).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) < 1.0 && out((1L, 3L)) > 0.5)
  }

  test("simhash pairs: identical docs at hamming 0") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Int]("hamming").toLong)).toMap
    assert(out((1L, 2L)) == 0L)
  }

  test("simhash: banded pairs equal the independent brute-force model " +
      "on real data") {
    // Golden pin: graft.oracle.GoldenModels reimplements murmur3 +
    // simhash + pairing from scratch (no Catalyst code shared); the
    // banded self-join is exact for hamming <= 3, so the sets must be
    // identical — including every hamming distance value.
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.simhashPairs(real, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = graft.oracle.GoldenModels.simhashPairs(
      real.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(got.nonEmpty, "no pairs at all — testdata should contain dups")
    assert(got == want,
      s"spark=${got.size} model=${want.size}; " +
        s"spark-only=${(got diff want).take(3)} " +
        s"model-only=${(want diff got).take(3)}")
  }

  test("golden hash64 matches the codegen expression byte-for-byte") {
    // the sharpest unsafe-memory check: UTF8String offsets/lengths in
    // SimHash64.hash64 vs a from-scratch byte-array murmur3
    val samples = Seq("", "a", "ab", "abc", "abcd", "abcde", "naïve",
      "日本語トークン", "mixed ascii ünicode", "x" * 100, "")
    for (s <- samples) {
      val viaExpr = org.apache.spark.sql.graft.SimHash64.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(viaExpr == graft.oracle.GoldenModels.hash64(s),
        s"hash64 divergence on ${s.take(20).toList}")
    }
  }

  test("embedding near-dups: parallel vectors found, orthogonal not") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.01f, 0.0f)),  // ~parallel to 1
      (3L, Array(0.0f, 1.0f, 0.0f))    // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding LSH near-dups: precision 1 and full recall vs the " +
      "brute-force ground truth on the planted corpus") {
    val emb = graft.queries.PipelineQueries.plantedEmbeddings(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val truth = Dedup.embeddingNearDups(emb, "vec_id", "e",
      minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupsLsh(emb, "vec_id", "e", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 50, s"expected the 50 planted pairs, got ${truth.size}")
    // exact-cosine verify ⇒ LSH can never report a non-pair (precision 1)
    assert((lsh diff truth).isEmpty, s"false positives: ${lsh diff truth}")
    // 8 bands × 8 planes at cosine ≈ 0.97 ⇒ per-pair recall ≈ 0.997;
    // on this fixed seed + corpus the banding finds every pair — pin it
    assert(lsh == truth,
      s"recall ${lsh.size}/${truth.size}, missed: ${(truth diff lsh).take(5)}")
  }

  test("incremental dedup == exact anti-join; bloom only routes") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = real.filter(col("doc_id") % 2 === 0)
    val batch = real.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .unionByName(real.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val got = Dedup.incremental(batch, corpus, "doc_id", "text",
      expectedItems = 1 << 16)
      .select("doc_id").as[Long].collect().toSet
    // plain anti-join ground truth — the bloom must never change the set
    val want = batch.withColumn("h", md5(col("text")))
      .join(corpus.select(md5(col("text")).as("h")), Seq("h"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    // every planted corpus copy was caught, every odd doc survived
    assert(!got.exists(_ >= 100000L))
    assert(got.nonEmpty)
  }

  test("incremental dedup: tiny fpp bloom still exact (confirm join " +
      "removes the extra false positives)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = real.filter(col("doc_id") % 2 === 0)
    val batch = real.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text")
    // undersized bloom (64 expected items, 50% fpp) → many batch rows
    // route through the confirm join; the RESULT must not change
    val sloppy = Dedup.incremental(batch, corpus, "doc_id", "text",
      expectedItems = 64, fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val tight = Dedup.incremental(batch, corpus, "doc_id", "text",
      expectedItems = 1 << 16, fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(sloppy == tight)
  }

  test("semantic dedup: flagged set == within-cell brute force; planted " +
      "near-dups flagged") {
    val emb = graft.queries.PipelineQueries.plantedEmbeddings(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val out = Dedup.semantic(emb, "vec_id", "e")
    val flagged = out.filter(col("is_dup"))
      .select("vec_id").as[Long].collect().toSet
    // ground truth: all-pairs near-dups restricted to co-clustered pairs
    val cells = out.select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = Dedup.embeddingNearDups(emb, "vec_id", "e", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cells(a) == cells(b) }
      .map(_._2).toSet
    assert(flagged == truth)
    // the planted copies (cosine ≈ 0.97 vs their original): 40 of 50
    // land in their original's cell and are flagged; the other 10
    // straddle a Voronoi boundary — the documented recall loss of
    // cluster-then-prune vs the banded-LSH tier (which finds all 50,
    // pinned above). Deterministic codebook ⇒ pin the exact number.
    assert(flagged.count(_ >= 10000L) == 40)
    // and nothing is flagged in a cell with no near-dup
    assert(out.count() == emb.count())
  }

  test("components: chain, triangle, and singletons-by-absence") {
    // chain 1-2-3-4-5 (diameter 4) + triangle 10-11-12 + pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("jaccard scale tier (LSH candidates + exact verify at 0.8) " +
    "matches the all-pairs ground-truth tier on testdata") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairSet(graft.operators.Dedup.jaccardPairs(
      docs, "doc_id", "text", minJaccard = 0.8))
    val scale = pairSet(graft.operators.Dedup.minhashNearDups(
      docs, "doc_id", "text", minJaccard = 0.8))
    assert(exact.nonEmpty)
    // precision is structural (candidates are re-verified with exact
    // jaccard); recall is probabilistic in general — FULL on this
    // corpus, which pins the banding parameters actually achieve it
    assert(scale == exact,
      s"missed=${(exact diff scale).take(3)} extra=${(scale diff exact).take(3)}")
  }

  test("components == union-find golden model on real minhash pairs") {
    val docsReal = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val pairDf = graft.operators.Dedup.minhashNearDups(
      docsReal, "doc_id", "text")
    val pairs = pairDf.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // independent union-find (path compression), canonical = min of set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap
    val got = graft.operators.Dedup.components(pairDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // dedup filter: exactly one kept doc per component
    val keep = got.filter { case (v, c) => v == c }
    assert(keep.keySet == got.values.toSet)
  }

  test("decontaminate flags corpus docs by distinct shingle overlap " +
    "with the benchmark, honors minHits, and broadcasts the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a quick brown fox appears"),   // shares 1: "quick brown fox"
      (2L, "the quick brown fox jumps hi"),// shares 3
      (3L, "nothing in common here at all"),
      (4L, "brown fox jumps the quick brown fox jumps") // 3 distinct
    ).toDF("doc_id", "text")
    val hits = graft.operators.Dedup.decontaminate(
        corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 2L -> 3L, 4L -> 3L), s"$hits")
    val strict = graft.operators.Dedup.decontaminate(
        corpus, bench, "doc_id", "text", minHits = 2)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(2L, 4L))
    // plan: benchmark side broadcasts; no sort-merge join of the corpus
    val plan = graft.operators.Dedup.decontaminate(
        corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side shuffle join:\n$plan")
  }

  test("substring dup stats: shared k-token spans count as repeated, " +
    "short docs fall back to one whole-text shingle") {
    val d = Seq(
      (1L, "one two three four five alpha"),    // 2 shingles, 1 shared
      (2L, "zero one two three four five"),     // 2 shingles, 1 shared
      (3L, "totally different words here now"), // exactly k -> 1 shingle
      (4L, "tiny doc")                          // < k -> whole-text
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_repeated"),
          r.getAs[Double]("dup_ratio")))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)))
    assert(out(4L) == ((1L, 0L, 0.0)))
  }
}

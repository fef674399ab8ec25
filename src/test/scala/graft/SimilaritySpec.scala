package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("brute-force topK ranks by cosine with deterministic tiebreak") {
    val out = Similarity.topK(corpus,
      corpus.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 4L, 2L))
    assert(out(0).getAs[Double]("cosine") > 0.99)
  }

  test("topK excludes self and respects k") {
    val out = Similarity.topK(corpus, corpus, "vec_id", "embedding", k = 2)
    assert(out.count() == 10) // 5 queries × k=2
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("lshTopK returns a subset of brute-force ranking, same scores") {
    // With shared buckets, any returned neighbor's cosine must equal the
    // brute-force cosine for that (query, neighbor) pair.
    val brute = Similarity.topK(corpus, corpus, "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.lshTopK(corpus, corpus, "vec_id", "embedding",
      k = 4, dim = 2).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(brute(key) == r.getAs[Double]("cosine"))
    }
  }

  test("ivfTopK scores candidates exactly; all cells probed ⇒ = brute force") {
    // nCentroids ≥ corpus and nProbe ≥ nCentroids degenerates IVF to
    // exact search — output must equal brute-force topK bit-for-bit.
    val brute = Similarity.topK(corpus, corpus, "vec_id", "embedding", 3)
      .orderBy("query_id", "rank").collect()
    val ivf = Similarity.ivfTopK(corpus, corpus, "vec_id", "embedding", 3,
      nCentroids = 5, nProbe = 5)
      .orderBy("query_id", "rank").collect()
    assert(ivf.map(_.toSeq).toSeq == brute.map(_.toSeq).toSeq)
  }

  test("ivfTopK with few probes returns a correctly-scored subset") {
    val brute = Similarity.topK(corpus, corpus, "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(corpus, corpus, "vec_id", "embedding",
      k = 4, nCentroids = 3, nProbe = 1).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(brute(key) == r.getAs[Double]("cosine"))
    }
  }

  test("lshTopK equals the independent plain-Scala model on real data") {
    // Golden pin: GoldenModels.lshTopK re-derives normalization, plane
    // projection, bucketing, candidate join, ranking, and rounding from
    // scratch over collected arrays — the whole distributed plan must
    // reproduce it exactly.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, dim = 64)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val want = graft.oracle.GoldenModels.lshTopK(
      rows, rows.filter(_._1 < 10), k = 5, dim = 64)
    assert(got.nonEmpty)
    assert(got == want,
      s"spark=${got.size} model=${want.size}; " +
        s"spark-only=${(got diff want).take(3)} " +
        s"model-only=${(want diff got).take(3)}")
  }

  test("trainCentroids: deterministic, improves cell tightness, no shuffle " +
       "in assignment") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    def tightness(cent: Seq[(Any, Seq[Double])]): Double =
      Similarity.ivfAssign(emb, "vec_id", "embedding", cent)
        .join(cent.map { case (cid, u) => (cid.asInstanceOf[Int], u) }
          .toDF("centroid_id", "cu"), Seq("centroid_id"))
        .agg(avg(Similarity.dot(col("unit"), col("cu")))).head.getDouble(0)
    val init = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 4, dim = dim, iters = 0)
    val t1 = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 4, dim = dim, iters = 3)
    val t2 = Similarity.trainCentroids(emb, "vec_id", "embedding",
      k = 4, dim = dim, iters = 3)
    assert(t1 == t2, "training is not deterministic")
    assert(t1.map(_._2).forall(u =>
      math.abs(u.map(x => x * x).sum - 1.0) < 1e-9), "centroids not unit")
    // Lloyd monotonically improves mean within-cell cosine
    assert(tightness(t1) >= tightness(init) - 1e-12,
      s"training worsened tightness: ${tightness(t1)} < ${tightness(init)}")
  }

  test("int8 quantization: bounded reconstruction error, high ANN recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Similarity.dequantized(
        Similarity.quantize(emb, "vec_id", "embedding"))
      .join(emb.select("vec_id", "embedding"), Seq("vec_id"))
    // per-component error ≤ scale/2 (half a quantization step)
    val bad = q.select(
        expr("""aggregate(zip_with(unit_approx,
          graft_l2norm(cast(embedding as array<double>)),
          (a, b) -> abs(a - b)), 0D, (acc, e) -> greatest(acc, e))""")
          .as("maxerr"),
        (col("scale") / 2 + lit(1e-12)).as("bound"))
      .filter(col("maxerr") > col("bound")).count()
    assert(bad == 0)
    // end-to-end: top-10 neighbors computed on dequantized vectors agree
    // with exact top-10 on ≥ 80% of (query, neighbor) pairs
    val queries = emb.limit(20)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approxCorpus = Similarity.dequantized(
        Similarity.quantize(emb, "vec_id", "embedding"))
      .select(col("vec_id"), col("unit_approx").as("embedding"))
    val approxQ = Similarity.dequantized(
        Similarity.quantize(queries, "vec_id", "embedding"))
      .select(col("vec_id"), col("unit_approx").as("embedding"))
    val approx = Similarity.topK(approxCorpus, approxQ,
        "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall")
  }

  test("asymmetric quantized IVF: exact scores, recall@5 vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val asym = Similarity
      .quantizedIvfTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // every reported cosine is FULL precision: any (query, neighbor)
    // the asymmetric path returns must carry the exact path's score
    val exactScore = exact.map(t => (t._1, t._2) -> t._3).toMap
    asym.foreach { case (q, n, c) =>
      exactScore.get((q, n)).foreach(e =>
        assert(c == e, s"asymmetric score $c != exact $e for ($q,$n)")) }
    // candidate recall: quantization + 4-of-16 probing keeps ≥ 60% of
    // the true top-5 pairs (same bound class as ann_ivf_topk's probing
    // loss; quantization must not collapse it further)
    val recall = (exact.map(t => (t._1, t._2)).toSet
      intersect asym.map(t => (t._1, t._2)).toSet).size.toDouble /
      exact.length
    assert(recall >= 0.6, s"asymmetric quantized IVF recall $recall")
  }

  test("zero vectors are dropped, not NaN") {
    val emb = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.normalized(emb, "vec_id", "embedding").count() == 1)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — a training-data-pipeline addition beyond the
  * reference (whose only similarity surface is delegated ES full-text
  * scoring, src/search_api.py:16-36).
  *
  * Two tiers, as a 100 TB engine needs:
  *  - [[topK]]: brute-force cosine top-k — exact, O(|queries|·|corpus|),
  *    correct whenever the query set is small enough to broadcast. The
  *    corpus is never shuffled: queries broadcast to every corpus
  *    partition, partial top-k per partition, final top-k via one tiny
  *    shuffle of k·|queries| rows (the window is over query_id, and
  *    AQE-coalesced).
  *  - [[lshTopK]]: random-hyperplane LSH — signature from `nPlanes` fixed
  *    pseudo-random planes (seeded, driver-generated literals: no
  *    nondeterminism, no model state), candidates = same bucket, exact
  *    cosine re-rank within bucket. Recall < 1 by construction; the
  *    bucket join shuffles only (id, int bucket) pairs.
  */
object Similarity {

  /** Dot product of two double-array columns — the custom codegen
    * [[graft.functions.DotProduct]] expression (a zip_with+aggregate
    * formulation is interpreted per element and measured ~10× slower on
    * the pair joins). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExpressions.dotProduct(a, b)

  /** Round-to-4-decimals for the per-pair hot loops:
    * floor(x*1e4+0.5)/1e4 is plain codegen arithmetic, whereas round()
    * allocates a BigDecimal per call — per joined *pair* here, since the
    * rounded value feeds the similarity filter. For non-negative doubles
    * this is bit-identical to DuckDB's round (std::round = half away
    * from zero on the binary value), which is what the oracle runs. */
  private[operators] def round4(x: Column): Column =
    floor(x * 10000.0 + 0.5).cast("double") / 10000.0

  /** (id, unit) with the float vector cast to double and L2-normalized;
    * cosine then reduces to a plain dot product. Zero-norm vectors are
    * dropped (undefined direction). Uses the codegen
    * [[graft.functions.ArrayExpressions.l2normalize]] expression — the
    * HOF formulation kept every similarity plan out of whole-stage
    * codegen (interpreted lambdas per element). */
  def normalized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb
      .select(col(idCol),
        graft.functions.ArrayExpressions.l2normalize(
          col(vecCol).cast("array<double>")).as("unit"))
      .filter(col("unit").isNotNull)

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self-match excluded), deterministically tie-broken
    * by neighbor id. */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = normalized(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("unit").as("uc"))
    val q = normalized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("unit").as("uq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_exact").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_exact", dot(col("uq"), col("uc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos_exact")).as("cosine"))
  }

  /** The ±1 hyperplane signs as plain doubles — the single source of
    * truth for the seeded plane family, shared by the Column builders
    * here, [[Dedup.embeddingNearDupsLsh]], AND the oracle-SQL generators
    * (which embed the same values as SQL literals), so every engine
    * evaluates the identical planes. Generation order is pinned: planes
    * outer, dims inner, one `nextBoolean` per sign. */
  def planeSigns(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(
      Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Deterministic random hyperplanes: `nPlanes` × `dim` signs from a
    * fixed seed, emitted as literal arrays (broadcast by the plan — the
    * "model" never touches an executor-side state store). */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Column] =
    planeSigns(dim, nPlanes, seed).map(p => array(p.map(lit): _*))

  /** Sign-bit bucket id from the hyperplane projections: bit i set iff
    * dot(v, plane_i) > 0. Integer bucket = candidate-join key. */
  def lshBuckets(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val ps = planes(dim, nPlanes, seed)
    val bucket = ps.zipWithIndex.map { case (p, i) =>
      when(dot(col("unit"), p) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    normalized(emb, idCol, vecCol).withColumn("bucket", bucket)
  }

  /** IVF (inverted-file) ANN top-k — the other canonical scale path
    * next to [[lshTopK]]: partition the corpus into `nCentroids` Voronoi
    * cells, search only the query's `nProbe` nearest cells.
    *
    *  - Centroids are the unit vectors of the `nCentroids` smallest ids —
    *    a deterministic, engine-reproducible stand-in for k-means (a real
    *    deployment would train centroids offline and broadcast them; the
    *    plan shape is identical and that is what this operator pins).
    *  - Assignment = a pure projection: the ≤`nCentroids` centroids are
    *    collected to the driver (bounded metadata, one tiny job) and the
    *    per-row argmax is a `greatest` over literal structs — the corpus
    *    is never shuffled OR re-grouped for assignment. (The first cut
    *    used crossJoin(broadcast)+`max_by`, which hash-shuffled every
    *    unit vector once for an argmax a projection can do.)
    *  - Probe = rank centroids per query, take `nProbe`; candidates are
    *    an equi-join on `centroid_id` (each corpus vector lives in
    *    exactly one cell, so no dedup needed); exact cosine re-rank.
    *
    * Recall < 1 by construction (a true neighbor may live in an
    * unprobed cell); raising `nProbe` trades compute for recall. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centDf = normalized(corpus, idCol, vecCol)
      .orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col("unit").as("cu"))
    // bounded metadata collect (≤ nCentroids rows) — the "model", same
    // role as an offline-trained codebook shipped to every task
    val cent = centDf.collect().toSeq
      .map(r => (r.get(0), r.getSeq[Double](1)))
    val assign = ivfAssign(corpus, idCol, vecCol, cent)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        col("unit").as("uc"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(dot(col("uq"), col("cu")).desc, col("centroid_id"))
    val probe = normalized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("unit").as("uq"))
      .crossJoin(broadcast(centDf))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("uq"), col("centroid_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_exact").desc, col("neighbor_id"))
    probe.join(assign, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_exact", dot(col("uq"), col("uc")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos_exact")).as("cosine"))
  }

  /** Voronoi-cell assignment as a PROJECTION: per row, argmax of
    * dot(unit, centroid) over the collected centroid list (ties → the
    * smallest centroid id), computed with one `greatest` over literal
    * structs. No join, no aggregation, no Exchange — the property
    * `PlanShapeSpec` pins. `cent` must be sorted by centroid id
    * ascending (as [[ivfTopK]] collects it): equal dots then resolve to
    * the smaller id via the descending `ord` field. */
  def ivfAssign(
      corpus: DataFrame, idCol: String, vecCol: String,
      cent: Seq[(Any, Seq[Double])]): DataFrame =
    ivfAssignUnits(normalized(corpus, idCol, vecCol), cent)

  /** [[ivfAssign]] over a frame that already carries its vector in a
    * `unit` column — the entry point for asymmetric search, where
    * assignment runs on DEQUANTIZED approximations rather than the
    * exact unit vectors. Same pure-projection shape (no Exchange). */
  def ivfAssignUnits(
      units: DataFrame, cent: Seq[(Any, Seq[Double])]): DataFrame = {
    require(cent.nonEmpty, "need at least one centroid")
    val n = cent.size
    val structs = cent.zipWithIndex.map { case ((cid, cu), i) =>
      struct(
        dot(col("unit"), array(cu.map(lit): _*)).as("d"),
        lit(n - 1 - i).as("ord"),
        lit(cid).as("cid"))
    }
    val best = if (n == 1) structs.head else greatest(structs: _*)
    units.withColumn("centroid_id", best.getField("cid"))
  }

  /** Int8 scalar quantization of the (normalized) embedding column —
    * the storage/shuffle compression tier of the ANN stack: a 64-dim
    * float vector is 256 B raw, 64 B quantized (+2 floats of affine
    * params), so the corpus that feeds LSH/IVF candidate joins moves 4×
    * less data through every scan and shuffle. Per-vector affine
    * mapping: q_i = round((x_i − min) / (max − min) · 255) − 128, with
    * the degenerate constant-vector case pinned to scale 0.
    *
    * Reconstruction ([[dequantized]]) is x̂_i = (q_i + 128) · scale +
    * min. The intended 100 TB pattern is asymmetric search: coarse
    * candidate generation on the quantized corpus, exact re-rank on the
    * (few) dequantized candidates — quantization error only perturbs
    * candidate RECALL, never the final scores ([[SimilaritySpec]]
    * bounds both the per-component error and end-to-end recall). */
  def quantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val u = normalized(emb, idCol, vecCol)
    val mn = array_min(col("unit"))
    val mx = array_max(col("unit"))
    val scale = (mx - mn) / 255.0
    u.select(
      col(idCol),
      scale.as("scale"),
      mn.as("zero"),
      transform(col("unit"), x =>
        (when(scale > 0,
          floor((x - mn) / scale + 0.5)).otherwise(lit(0.0)) - 128.0)
          .cast("byte")).as("qvec"))
  }

  /** Reconstruct approximate unit vectors from [[quantize]] output (the
    * re-rank side of asymmetric search). */
  def dequantized(q: DataFrame): DataFrame =
    q.withColumn("unit_approx",
      transform(col("qvec"), b =>
        (b.cast("double") + 128.0) * col("scale") + col("zero")))

  /** Asymmetric quantized ANN top-k — the actual 100 TB search shape
    * ([[quantize]]'s scaladoc made executable end-to-end): coarse
    * candidate generation runs entirely on the int8-quantized corpus
    * (4× less data through every scan and shuffle), exact re-rank
    * touches full-precision vectors only for the candidate rows.
    *
    *  - Codebook: [[dequantized]] approximations of the `nCentroids`
    *    smallest ids — bounded driver metadata, as [[ivfTopK]].
    *  - Assignment: [[ivfAssignUnits]] PROJECTION over the dequantized
    *    vectors — the corpus shuffles nothing for assignment and the
    *    scan ships qvec + 2 floats, never the raw vectors.
    *  - Probe: exact query vectors ranked against the approximate
    *    centroids, top `nProbe` cells.
    *  - Re-rank: candidates equi-join the exact unit vectors by id;
    *    `cos_exact` is full-precision, so quantization error perturbs
    *    only candidate RECALL, never a reported score ([[SimilaritySpec]]
    *    pins end-to-end recall vs the exact [[topK]]).
    */
  def quantizedIvfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fused codegen round-trip == dequantized(quantize(...)) bit for bit
    // (ExpressionPropertiesSpec) — one traversal, no interpreted lambdas
    val deq = normalized(corpus, idCol, vecCol)
      .select(col(idCol),
        graft.functions.ArrayExpressions.quantizeRoundTrip(col("unit"))
          .as("unit"))
    val centDf = deq.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col("unit").as("cu"))
    val cent = centDf.collect().toSeq
      .map(r => (r.get(0), r.getSeq[Double](1)))
    val assign = ivfAssignUnits(deq, cent)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"))
    val exact = normalized(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("unit").as("uc"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(dot(col("uq"), col("cu")).desc, col("centroid_id"))
    val probe = normalized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("unit").as("uq"))
      .crossJoin(broadcast(centDf))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("uq"), col("centroid_id"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_exact").desc, col("neighbor_id"))
    probe.join(assign, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(exact, Seq("neighbor_id"))
      .withColumn("cos_exact", dot(col("uq"), col("uc")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos_exact")).as("cosine"))
  }

  /** Deterministic spherical k-means (Lloyd) for IVF codebooks — the
    * "train centroids offline" step [[ivfTopK]]'s scaladoc assumes,
    * expressed in the same shuffle-frugal shapes as the rest of the
    * engine:
    *
    *  - init = unit vectors of the `k` smallest ids (deterministic — no
    *    seeded sampling to reproduce across engines/runs);
    *  - each iteration: assignment is the [[ivfAssign]] PROJECTION (no
    *    shuffle), then per-cell mean via ONE combiner-friendly hash agg
    *    of `dim` column sums — the shuffle moves k·dim partials per
    *    partition, never vectors;
    *  - new centroid = re-normalized cell mean (cosine/spherical
    *    k-means); empty or zero-norm cells keep their previous centroid;
    *  - k·dim driver state only (the codebook — bounded metadata).
    *
    * Cost: `iters` corpus passes. At 100 TB you train on a hash-sampled
    * slice ([[Split.hashBucket]] < threshold) — the codebook needs
    * distribution coverage, not every row. */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 3): Seq[(Any, Seq[Double])] = {
    require(k > 0 && dim > 0 && iters >= 0)
    var cent: Seq[(Any, Seq[Double])] =
      normalized(corpus, idCol, vecCol).orderBy(col(idCol)).limit(k)
        .collect().toSeq.zipWithIndex
        .map { case (r, i) => (i: Any, r.getSeq[Double](1)) }
    for (_ <- 0 until iters) {
      val assigned = ivfAssign(corpus, idCol, vecCol, cent)
      val sums = (0 until dim).map(i =>
        sum(col("unit").getItem(i)).as(s"s_$i"))
      val means = assigned.groupBy(col("centroid_id"))
        .agg(sums.head, sums.tail :+ count(lit(1)).as("n"): _*)
        .collect()
        .map { r =>
          val mean = (0 until dim).map(i => r.getDouble(i + 1))
          val norm = math.sqrt(mean.map(x => x * x).sum)
          r.getAs[Int]("centroid_id") ->
            (if (norm > 0) mean.map(_ / norm) else null)
        }.toMap
      cent = cent.map { case (cid, old) =>
        means.get(cid.asInstanceOf[Int]).flatMap(Option(_))
          .fold((cid, old))(u => (cid, u))
      }
    }
    cent
  }

  /** ANN top-k via LSH bucketing: candidates share the query's bucket,
    * exact cosine re-rank inside the bucket. Trades recall for a
    * corpus-partitionable equi-join — the 100 TB path. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = lshBuckets(corpus, idCol, vecCol, dim, nPlanes, seed)
      .select(col("bucket"), col(idCol).as("neighbor_id"), col("unit").as("uc"))
    val q = lshBuckets(queries, idCol, vecCol, dim, nPlanes, seed)
      .select(col("bucket"), col(idCol).as("query_id"), col("unit").as("uq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_exact").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_exact", dot(col("uq"), col("uc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round4(col("cos_exact")).as("cosine"))
  }
}

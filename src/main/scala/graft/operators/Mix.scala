package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — downsample each source/domain so the kept
  * corpus approximates a target mixture (the "data recipe" step of LLM
  * training: N tokens at 30% web / 25% code / ...). No reference
  * analogue; first-class training-data operator.
  *
  * Determinism contract (same as [[Split]]): membership is a pure
  * function of (id, salt) via an md5 bucket, so re-runs, retries and
  * partial re-ingests keep/drop the SAME documents — no `rand()`, which
  * would tear under task retry and make results non-reproducible.
  *
  * Scale shape: one tiny per-domain count aggregate (rows = #domains)
  * broadcast back onto the corpus, then a pure filter projection — the
  * corpus itself is scanned once and never shuffled.
  */
object Mix {

  /** 16-bit md5 bucket of (id, salt) as a 4-hex-char string — compared
    * LEXICOGRAPHICALLY against a threshold, which is identical to the
    * numeric compare (fixed-width lowercase hex) and portable to the
    * DuckDB oracle. */
  private def hexBucket(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit(salt))), 1, 4)

  /** Keep each row of domain g with probability
    * `rate_g = min(1, weight_g * targetFrac * N / n_g)` — i.e. the kept
    * set has ≈ `targetFrac * N` rows distributed by `weights` (domains
    * too small to fill their quota keep everything; real mixtures
    * up-weight by epochs, not within-snapshot duplication).
    *
    * Unknown domains (no weight entry) are dropped — a mixture is a
    * whitelist. */
  def sample(docs: DataFrame, domainCol: String, idCol: String,
             weights: Map[String, Double], targetFrac: Double = 0.5,
             salt: String = "mix"): DataFrame = {
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_g"))
    val total = counts.agg(sum(col("n_g")).as("n_total"))
    // weights as a when-chain: a handful of domains, pure projection
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (dom, wt)) => when(col(domainCol) === dom, wt).otherwise(acc)
    }
    val rate = least(lit(1.0),
      w * (lit(targetFrac) * col("n_total")) / col("n_g"))
    // 4-hex-digit threshold; rate==1 is exempted BEFORE formatting (it
    // would need 5 hex digits and break the lexicographic compare)
    val thr = lpad(lower(hex(floor(rate * 65536.0).cast("int"))), 4, "0")
    docs
      .join(broadcast(counts), Seq(domainCol))
      .crossJoin(broadcast(total))
      .withColumn("rate", rate)
      .filter(col("rate").isNotNull &&
        (col("rate") >= 1.0 || hexBucket(col(idCol), salt) < thr))
      .drop("n_g", "n_total", "rate")
  }

  /** Mixture by EPOCH REPLICATION — the up-weighting path ([[sample]]'s
    * scaladoc: "real mixtures up-weight by epochs"): each domain's rate
    * `weight_g * targetFrac * N / n_g` is allowed to EXCEED 1, and a
    * document is emitted `floor(rate)` times plus one more for the
    * deterministic `frac(rate)` md5-bucket slice — so domain g
    * contributes ≈ `weight_g * targetFrac * N` rows while every copy is
    * tagged with its `epoch` index (0-based; a trainer shuffles copies
    * into different epochs downstream).
    *
    * Pure projection + explode off the same broadcast per-domain counts
    * as [[sample]] — the corpus is scanned once, never shuffled, and
    * replication happens at the row level (no self-union per epoch,
    * which would re-scan the corpus ⌈epochs⌉ times). */
  def epochs(docs: DataFrame, domainCol: String, idCol: String,
             weights: Map[String, Double], targetFrac: Double = 1.0,
             salt: String = "epoch"): DataFrame = {
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_g"))
    val total = counts.agg(sum(col("n_g")).as("n_total"))
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (dom, wt)) => when(col(domainCol) === dom, wt).otherwise(acc)
    }
    val rate = w * (lit(targetFrac) * col("n_total")) / col("n_g")
    val full = floor(rate).cast("int")
    val frac = rate - floor(rate)
    val thr = lpad(lower(hex(floor(frac * 65536.0).cast("int"))), 4, "0")
    val extra = when(hexBucket(col(idCol), salt) < thr, 1).otherwise(0)
    val nCopies = full + extra
    docs
      .join(broadcast(counts), Seq(domainCol))
      .crossJoin(broadcast(total))
      .withColumn("_n", when(rate.isNotNull, nCopies).otherwise(lit(0)))
      .filter(col("_n") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), col("_n") - 1)))
      .drop("n_g", "n_total", "_n")
  }

  /** TEMPERATURE-scaled mixture — the multilingual/low-resource
    * up-weighting rule (sampling weight p_g ∝ n_g^alpha): alpha < 1
    * flattens the domain distribution toward uniform (small domains
    * sampled at higher rates), alpha = 1 reproduces natural
    * proportions. Weights are DERIVED from the corpus' own domain
    * counts and then thinned by the same deterministic md5-bucket rule
    * as [[sample]].
    *
    * The per-domain count table is bounded metadata (|domains| rows),
    * so the one collect here is the same contract as the IVF codebook —
    * never corpus-sized. Determinism: the weight denominator sums
    * per-domain terms in SORTED-DOMAIN order (float + is order-
    * sensitive), and alpha = 0.5 evaluates via `sqrt`, which IEEE
    * requires correctly rounded in every engine — the oracle-gated
    * query pins that alpha; other alphas go through `pow`, whose last
    * ulp is libm-dependent (spec-tested instead). */
  def temperatureSample(docs: DataFrame, domainCol: String, idCol: String,
                        alpha: Double = 0.5, targetFrac: Double = 0.5,
                        salt: String = "temp"): DataFrame = {
    def p(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else math.pow(n.toDouble, alpha)
    // NULL domains are excluded from the weight derivation (they can
    // never be sampled — [[sample]]'s weight lookup maps them to a null
    // rate) — counting them would silently deflate every real domain's
    // weight, and String.valueOf would collide with a domain literally
    // named "null"
    val counts = docs.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_g"))
      .collect()
      .map(r => (String.valueOf(r.get(0)), r.getLong(1)))
      .sortBy(_._1)
    val denom = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + p(n) }
    val weights = counts.map { case (d, n) => d -> p(n) / denom }.toMap
    sample(docs, domainCol, idCol, weights, targetFrac, salt)
  }

  /** EXACT stratified sample: at most `cap` rows per stratum, chosen by
    * ranking on a salted md5 of the id — a deterministic shuffle-order
    * (re-runs pick the same rows; growing a stratum only swaps rows at
    * the rank boundary). The complement of [[sample]]: rate-based
    * sampling hits the mixture in expectation, this hits per-stratum
    * counts exactly (eval sets, per-domain quotas, debugging slices).
    *
    * Plan shape at scale: `row_number ≤ cap` triggers Spark's
    * WindowGroupLimit — every map task pre-prunes to its local top-cap
    * PER STRATUM before the shuffle (asserted in PlanShapeSpec), so the
    * exchange carries ≤ cap·partitions rows per stratum, not the corpus;
    * stratum skew is therefore bounded by the cap, and no global sort
    * ever happens. */
  def stratifiedExact(docs: DataFrame, strataCol: String, idCol: String,
                      cap: Int, salt: String = "strat"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hexBucket(col(idCol), salt), col(idCol))
    docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }
}

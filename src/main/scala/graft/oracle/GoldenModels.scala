package graft.oracle

import java.nio.charset.StandardCharsets

/** Independent plain-Scala models backing the golden verification tier.
  * These reimplement the SEMANTICS from scratch — including Murmur3
  * x86_32 itself, byte by byte, so a bug in the custom codegen
  * expressions' unsafe-memory handling would show up as a mismatch —
  * and share no code with the Catalyst path (no Column API, no
  * UTF8String, no ArrayData).
  *
  * Since round 9, `dedup_simhash` and `ann_lsh_topk` ALSO carry full
  * DuckDB oracles (a SQL-macro murmur3 / literal hyperplane signs —
  * PipelineQueries.simhashSql / annLshSql), so those two are
  * double-gated: DuckDB row/schema/hash compare AND this model. The
  * `bpe_*` trio remains golden-only — per-round merge recursion is not
  * one SQL query.
  *
  * Used two ways: hash-compared in `DedupSpec`/`SimilaritySpec` against
  * the Spark results on real testdata, and enforced by `graft.Verify`
  * (the driver's correctness dump fails hard on divergence) — so neither
  * query relies on a rows-only check.
  *
  * Model simplifications vs the distributed plans (not the semantics):
  * simhash pairs come from brute-force O(n²) comparison — the banded
  * self-join in [[graft.operators.Dedup.simhashPairs]] is *exact* for
  * maxHamming ≤ 3 (pigeonhole over 4×16-bit bands), so the two must
  * agree on the full pair set, not just candidates.
  */
object GoldenModels {

  // --- Murmur3 x86_32, Spark's variant, from scratch ------------------
  // Spark (org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes)
  // deviates from reference murmur3 in the tail: each trailing byte past
  // the 4-byte-aligned prefix is SIGN-EXTENDED and mixed as a full block.

  private def mixK1(k: Int): Int = {
    var k1 = k * 0xcc9e2d51
    k1 = Integer.rotateLeft(k1, 15)
    k1 * 0x1b873593
  }

  private def mixH1(h: Int, k1: Int): Int = {
    var h1 = h ^ k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 * 5 + 0xe6546b64
  }

  def murmur3(bytes: Array[Byte], seed: Int): Int = {
    var h1 = seed
    val aligned = bytes.length - bytes.length % 4
    var i = 0
    while (i < aligned) {
      val k = (bytes(i) & 0xff) |
        ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) |
        ((bytes(i + 3) & 0xff) << 24) // little-endian word
      h1 = mixH1(h1, mixK1(k))
      i += 4
    }
    while (i < bytes.length) {
      h1 = mixH1(h1, mixK1(bytes(i).toInt)) // sign-extended tail byte
      i += 1
    }
    h1 ^= bytes.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^ (h1 >>> 16)
  }

  /** 64-bit token hash: two murmur3-32 halves, seeds 42 / 0x9747b28c —
    * the contract of [[org.apache.spark.sql.graft.SimHash64.hash64]]. */
  def hash64(token: String): Long = {
    val b = token.getBytes(StandardCharsets.UTF_8)
    (murmur3(b, 42).toLong << 32) | (murmur3(b, 0x9747b28c).toLong & 0xffffffffL)
  }

  // --- SimHash --------------------------------------------------------

  /** SimHash64 over distinct whitespace tokens (TextFunctions.simhash64
    * semantics: split on \s+, drop empties, distinct, ±1 bit votes). */
  def simhash64(text: String): Long = {
    val toks = text.split("\\s+", -1).filter(_.nonEmpty).distinct
    val votes = new Array[Int](64)
    for (t <- toks) {
      val h = hash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** All pairs (a < b) within `maxHamming`, brute force. */
  def simhashPairs(docs: Seq[(Long, String)],
                   maxHamming: Int = 3): Set[(Long, Long, Int)] = {
    val sigs = docs.collect { case (id, t) if t != null => (id, simhash64(t)) }
    (for {
      (ia, sa) <- sigs
      (ib, sb) <- sigs
      if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb)
      if d <= maxHamming
    } yield (ia, ib, d)).toSet
  }

  // --- LSH ANN --------------------------------------------------------

  /** L2-normalize after float→double cast; None for the zero vector
    * (L2Normalize semantics). */
  def unit(v: Seq[Float]): Option[Array[Double]] = {
    val d = v.map(_.toDouble).toArray
    var s = 0.0
    var i = 0
    while (i < d.length) { s += d(i) * d(i); i += 1 }
    if (s == 0.0) None
    else {
      val norm = math.sqrt(s)
      Some(d.map(_ / norm))
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round4(x: Double): Double =
    math.floor(x * 10000.0 + 0.5) / 10000.0

  // --- BPE ------------------------------------------------------------

  /** BPE merge training (Bpe.trainMerges semantics), from scratch on
    * plain collections: word-type counts over whitespace tokens, symbols
    * = characters + "</w>", per-round adjacent-pair counting with
    * overlaps, ties broken by (freq desc, left, right), merge applied as
    * a leftmost-nonoverlapping single pass. */
  def bpeMerges(docs: Seq[String],
                numMerges: Int): Seq[(Int, String, String, Long)] = {
    val wc = docs.filter(_ != null)
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var words: Map[Vector[String], Long] = wc.toSeq
      .map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
      .groupBy(_._1).map { case (syms, g) => syms -> g.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), freq) = pairs.minBy { case ((pl, pr), f) =>
          (-f, pl, pr)
        }
        out += ((step, l, r, freq))
        words = words.toSeq.map { case (syms, c) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> c
        }.groupBy(_._1).map { case (syms, g) => syms -> g.map(_._2).sum }
        step += 1
      }
    }
    out.toSeq
  }

  /** BPE encode (Bpe.encodeTokenCounts semantics): per document the
    * whitespace-word count and subword count after applying `merges` in
    * order, one leftmost-nonoverlapping pass each. Zero-token documents
    * produce no row (the engine's join drops them). */
  def bpeEncode(docs: Seq[(Long, String)],
                merges: Seq[(String, String)]): Set[(Long, Long, Long)] = {
    def encLen(w: String): Int = {
      var syms = w.map(_.toString).toVector :+ "</w>"
      for ((l, r) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    docs.collect { case (id, t) if t != null =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      (id, toks)
    }.filter(_._2.nonEmpty).map { case (id, toks) =>
      (id, toks.length.toLong, toks.map(encLen(_).toLong).sum)
    }.toSet
  }

  /** BPE vocabulary (Bpe.vocab + top-k semantics): corpus-weighted
    * symbol frequencies after the merges, top `k` by (freq desc,
    * symbol asc). */
  def bpeVocab(docs: Seq[String], merges: Seq[(String, String)],
               k: Int): Seq[(String, Long)] = {
    def enc(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector :+ "</w>"
      for ((l, r) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val freq = scala.collection.mutable.Map.empty[String, Long]
    docs.filter(_ != null)
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .foreach(w => enc(w).foreach(s =>
        freq(s) = freq.getOrElse(s, 0L) + 1L))
    freq.toSeq.sortBy { case (s, f) => (-f, s) }.take(k)
  }

  /** Random-hyperplane LSH top-k (Similarity.lshTopK semantics): planes
    * from the same seed-defined ±1 sequence (the "model" is the seed, so
    * plane generation is shared by definition), sign-bit bucket,
    * same-bucket candidates excluding self, exact-cosine rank with
    * neighbor-id tiebreak, cosine rounded to 4 decimals on output. */
  def lshTopK(corpus: Seq[(Long, Seq[Float])], queries: Seq[(Long, Seq[Float])],
              k: Int, dim: Int, nPlanes: Int = 8,
              seed: Long = 42L): Set[(Long, Int, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    val planes =
      Seq.fill(nPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
    def bucket(u: Array[Double]): Long =
      planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
        if (dot(u, p) > 0) acc | (1L << i) else acc
      }
    val c = corpus.flatMap { case (id, v) =>
      unit(v).map(u => (bucket(u), id, u))
    }
    queries.flatMap { case (qid, v) =>
      unit(v).toSeq.flatMap { uq =>
        val b = bucket(uq)
        c.filter(t => t._1 == b && t._2 != qid)
          .map { case (_, nid, uc) => (nid, dot(uq, uc)) }
          .sortBy { case (nid, cos) => (-cos, nid) }
          .take(k)
          .zipWithIndex
          .map { case ((nid, cos), r) => (qid, r + 1, nid, round4(cos)) }
      }
    }.toSet
  }
}

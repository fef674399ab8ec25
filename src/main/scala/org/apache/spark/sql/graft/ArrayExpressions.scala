package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot array paths of the
  * training-data pipeline. Spark's higher-order functions (`aggregate`,
  * `zip_with`, `transform`) are *interpreted* — each lambda invocation
  * walks an expression tree per element — which makes 64-dim dot products
  * and 64-bit simhash vote loops the bottleneck of the dedup/ANN
  * operators (measured: `dedup_embedding` 24.6s, `dedup_simhash` 20.8s at
  * sf0.1 on local[32]). These expressions generate tight Java loops via
  * `doGenCode` and stay inside whole-stage codegen — preference order (b)
  * of the design brief: a native Expression beats a Scala UDF.
  *
  * This file lives under `org.apache.spark.sql.graft` because
  * `AbstractDataType` (needed by `ExpectsInputTypes`) and
  * `classic.ExpressionUtils` (Expression → Column bridge on Spark 4) are
  * `private[sql]`; the user-facing API is re-exported from
  * [[graft.functions.ArrayExpressions]] and registered for SQL via
  * [[graft.GraftExtensions]] (`graft_dot(a, b)`, `graft_simhash64(toks)`).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType, containsNull = true),
      ArrayType(DoubleType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // null elements contribute 0 — same as aggregate() skipping nothing but
  // safer than toDoubleArray (which throws on nulls)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array of string tokens: per token, a 64-bit
  * hash assembled from two seeded murmur3 halves; per bit, +1/-1 votes
  * across tokens; output bit set iff votes > 0. One pass, no allocation
  * beyond the 64-int vote table. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = SimHash64.hash64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val cls = "org.apache.spark.sql.graft.SimHash64"
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $s = $a.getUTF8String($i);
         |    long $h = $cls.hash64($s);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) != 0L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** 64-bit token hash: two independently-seeded murmur3-32 halves over
    * the UTF-8 bytes. Called from both interpreted eval and generated
    * code (hence public + JVM-static-friendly). */
  def hash64(s: UTF8String): Long = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }
}

/** Distinct word `n`-gram shingles of a text column, in one generated
  * call: whitespace-tokenize (Java `\s` class, matching
  * `split(text, "\\s+")` + drop-empties), slide an n-word window joined
  * by single spaces, dedupe keeping first-occurrence order. Documents
  * shorter than n words yield their whole token list as one shingle
  * (so they can still exact-match). Equivalent to the HOF pipeline
  * `array_distinct(transform(sequence(…), i -> concat_ws(" ",
  * slice(toks, i+1, n))))` — which is interpreted per element and was
  * ~3.4 s per evaluation over 5k docs at sf0.1, evaluated up to 6× in
  * the jaccard dedup plan; this expression is one pass per row. */
case class DistinctShingles(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(text: Any, n: Any): Any =
    DistinctShingles.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = org.apache.spark.sql.graft.DistinctShingles.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DistinctShingles =
    copy(left = newLeft, right = newRight)
}

object DistinctShingles {
  // the exact Java-regex \s character class, so results are identical to
  // split(text, "\\s+") — do NOT use Character.isWhitespace (wider)
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        toks.add(s.substring(start, i))
      }
    }
    val m = toks.size
    val out = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder()
    if (m >= n && n > 0) {
      var j = 0
      while (j + n <= m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        j += 1
      }
    } else {
      var k = 0
      while (k < m) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(k))
        k += 1
      }
      out.add(UTF8String.fromString(sb.toString))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }
}

/** L2-normalize a double-array column: unit[i] = x[i]/‖x‖₂, or NULL for
  * zero-norm (undefined-direction) vectors — callers filter on
  * `isNotNull` instead of a separate norm computation. Replaces a
  * transform+aggregate+transform HOF chain that, being interpreted, kept
  * every similarity plan out of whole-stage codegen entirely (0 codegen
  * subtrees in the dedup_embedding plan; inner BroadcastNestedLoopJoin
  * does support codegen once no HOF remains). Summation order is
  * sequential, matching both the HOF formulation and the DuckDB oracle's
  * `list_sum(list_transform(...))`. */
case class L2Normalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType, containsNull = true))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override protected def nullSafeEval(input: Any): Any =
    L2Normalize.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} =
            org.apache.spark.sql.graft.L2Normalize.compute(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  /** Returns the unit vector, or null when the norm is zero. Null
    * elements contribute 0 to the norm and stay 0 in the output. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { val x = arr.getDouble(i); s += x * x }
      i += 1
    }
    if (s == 0.0) return null
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i) / norm
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Per-document MinHash signature in ONE pass over the shingle array:
  * md5 each shingle once, then for each of `numHashes` hash functions
  * (hash_i = the hex digest rotated left by 2·i chars — the family of
  * [[graft.operators.Dedup.minhashSignatures]] and its SQL oracle's
  * `min(substr(d, 2i+1) || substr(d, 1, 2i))`) keep the running
  * lexicographic minimum. This turns the signature build from
  * explode → md5 → 16 × min(string) aggregation (a full shuffle on the
  * doc id plus 16 concat/substring allocations per shingle row) into a
  * map-side PROJECTION: no shuffle, and a candidate rotation is
  * compared IN PLACE against the current min (early-exit byte compare)
  * and materialized only on improvement. Hex chars are ASCII-ordered,
  * so byte comparison == the aggregation form's UTF8String/varchar
  * lexicographic min. Empty or all-null shingle arrays yield NULL (the
  * aggregation form simply had no rows for that document). */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType, containsNull = true), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(arr: Any, n: Any): Any =
    MinHashSignature.compute(arr.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) =>
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.graft.MinHashSignature.compute($a, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  /** rotated-by-`off` view of `hex` < `cur`, byte-lexicographic,
    * without materializing the rotation (32 is a power of two, so the
    * wrap-around index is a mask). */
  private def lessRot(hex: Array[Byte], off: Int, cur: Array[Byte]): Boolean = {
    var j = 0
    while (j < 32) {
      val d = (hex((j + off) & 31) & 0xff) - (cur(j) & 0xff)
      if (d != 0) return d < 0
      j += 1
    }
    false
  }

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var mins: Array[Array[Byte]] = null
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = Hex((dig(j) >> 4) & 0xf)
          hex(2 * j + 1) = Hex(dig(j) & 0xf)
          j += 1
        }
        if (mins == null) mins = new Array[Array[Byte]](numHashes)
        var h = 0
        while (h < numHashes) {
          val off = 2 * h
          val cur = mins(h)
          if (cur == null || lessRot(hex, off, cur)) {
            val m = new Array[Byte](32)
            System.arraycopy(hex, off, m, 0, 32 - off)
            System.arraycopy(hex, 0, m, 32 - off, off)
            mins(h) = m
          }
          h += 1
        }
      }
      i += 1
    }
    if (mins == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(m => UTF8String.fromBytes(m): Any))
  }
}

/** All banded random-hyperplane LSH buckets of a unit vector in ONE
  * generated loop: `nBands` longs, bucket bit i of band b set iff
  * dot(vec, plane_{b·planesPerBand+i}) > 0. Replaces a stack of
  * nBands·planesPerBand separate [[DotProduct]] expressions + when-chains
  * (64 expressions for the default 8×8 banding — each re-walking the
  * vector through its own codegen call); here the plane matrix rides
  * into the generated code as one reference object and every projection
  * shares a single vector traversal pattern. The sign matrix is the
  * SAME seed-defined ±1 sequence as `Similarity.planeSigns`, so results
  * are bit-identical to the compositional form (pinned in
  * ExpressionPropertiesSpec) and the golden models still apply. */
case class HyperplaneBands(child: Expression, dim: Int, nBands: Int,
                           planesPerBand: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType, containsNull = true))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBands.signs(dim, nBands * planesPerBand, seed)

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneBands.compute(v.asInstanceOf[ArrayData], planes,
      nBands, planesPerBand)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.HyperplaneBands
         |  .compute($v, $ref, $nBands, $planesPerBand);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBands = copy(child = newChild)
}

object HyperplaneBands {
  /** The seed-defined ±1 matrix — same draw order as
    * `Similarity.planeSigns` (plane-major, then dimension). */
  def signs(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  def compute(vec: ArrayData, planes: Array[Array[Double]],
              nBands: Int, planesPerBand: Int): ArrayData = {
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var i = 0
      while (i < planesPerBand) {
        val p = planes(b * planesPerBand + i)
        // same traversal as DotProduct: ascending j, null elements = 0,
        // length = min(vec, plane) — keeps FP results bit-identical
        val n = math.min(vec.numElements(), p.length)
        var s = 0.0
        var j = 0
        while (j < n) {
          if (!vec.isNullAt(j)) s += vec.getDouble(j) * p(j)
          j += 1
        }
        if (s > 0) bucket |= (1L << i)
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Int8 scalar quantization ROUND-TRIP of a unit vector in one generated
  * loop — the approximate vector the asymmetric-search coarse stage
  * actually consumes (`dequantized(quantize(v))` elementwise), without
  * materializing qvec/scale/zero columns or running two interpreted
  * `transform` lambdas per element: min/max, per-element snap-to-grid
  * and reconstruction all happen in one traversal. Arithmetic is kept
  * EXACTLY the compositional form's: t = floor((x−mn)/scale + 0.5)
  * (0 when scale ≤ 0), byte-cast via (t−128).toByte, back as
  * (b+128)·scale + mn — pinned bit-identical in
  * ExpressionPropertiesSpec, so the DuckDB oracle still applies. */
case class QuantizeRoundTrip(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType, containsNull = true))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "graft_quantize_roundtrip"

  override protected def nullSafeEval(v: Any): Any =
    QuantizeRoundTrip.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} =
         |  org.apache.spark.sql.graft.QuantizeRoundTrip.compute($v);
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeRoundTrip = copy(child = newChild)
}

object QuantizeRoundTrip {
  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    // array_min/array_max semantics: nulls ignored
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var any = false
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val x = vec.getDouble(i)
        if (x < mn) mn = x
        if (x > mx) mx = x
        any = true
      }
      i += 1
    }
    val scale = if (any) (mx - mn) / 255.0 else 0.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (vec.isNullAt(i)) out(i) = null
      else {
        val x = vec.getDouble(i)
        val t = if (scale > 0) math.floor((x - mn) / scale + 0.5) else 0.0
        val b = (t - 128.0).toByte
        out(i) = (b + 128.0) * scale + mn
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Full Damerau–Levenshtein distance (Lowrance–Wagner: insertions,
  * deletions, substitutions, and TRANSPOSITIONS of adjacent characters
  * as primitive edits) between two string columns — ES's `fuzziness`
  * metric under its default `transpositions: true` (Lucene FuzzyQuery;
  * the engine's plain `levenshtein` serves the explicit `false` path).
  * Semantics are pinned to DuckDB's `damerau_levenshtein` (fuzz-tested
  * identical over random pairs), so fuzzy oracles replay exactly.
  * Generated code calls the static [[DamerauLevenshtein.compute]] —
  * one tight DP over the two strings, no allocation beyond the DP
  * table; stays inside whole-stage codegen. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.DamerauLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** Lowrance–Wagner DP over chars: one FLAT int table plus two small
    * parallel arrays for the last-occurrence map (fuzzy terms are
    * short tokens, so a linear scan over ≤len distinct chars beats a
    * boxed HashMap on the per-token hot path — no boxing, two array
    * allocations per call). */
  def compute(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    // last row each char of `a` occurred at: parallel (char, row)
    // arrays, linear probe — at most la entries
    val daChars = new Array[Char](la)
    val daRows = new Array[Int](la)
    var daN = 0
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val bc = b.charAt(j - 1)
        var k = 0
        var p = 0
        while (p < daN) {
          if (daChars(p) == bc) { k = daRows(p); p = daN } else p += 1
        }
        val l = db
        val cost = if (a.charAt(i - 1) == bc) { db = j; 0 } else 1
        var m = d(i * w + j) + cost                       // substitute
        if (d((i + 1) * w + j) + 1 < m) m = d((i + 1) * w + j) + 1 // ins
        if (d(i * w + j + 1) + 1 < m) m = d(i * w + j + 1) + 1     // del
        val tr = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)      // swap
        if (tr < m) m = tr
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      // record/refresh a's char -> current row
      val ac = a.charAt(i - 1)
      var p = 0
      var found = false
      while (p < daN && !found) {
        if (daChars(p) == ac) { daRows(p) = i; found = true }
        p += 1
      }
      if (!found) { daChars(daN) = ac; daRows(daN) = i; daN += 1 }
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}

/** ENGLISH-analyzer tokenization with positions, as one generated
  * scan — the executor-side twin of
  * [[graft.functions.EnglishAnalysis.analyzeWithPositions]] (the
  * query-side chain): standard tokenize ([[AnalyzerTokens.spans]]) →
  * possessive strip → english stop filter (the token drops, its
  * POSITION is consumed — Lucene's enablePositionIncrements, so
  * surviving stems keep their original token index and phrases carry
  * gaps where stopwords stood) → Porter stem. Returns
  * `array<struct<term string, pos int>>` — the write-time tokenizer
  * of [[graft.sinks.SearchIndex]]'s index-time `english` analyzer
  * (ES's `"analyzer": "english"` mapping, where stemming happens at
  * INDEX time rather than query time). Driver/executor parity is
  * fuzz-pinned in ExpressionPropertiesSpec. */
case class EnglishTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_english_tokens"

  override protected def nullSafeEval(input: Any): Any =
    EnglishTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.EnglishTokens.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): EnglishTokens = copy(child = newChild)
}

object EnglishTokens {
  def tokenize(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val sp = AnalyzerTokens.spans(s)
    val out = new scala.collection.mutable.ArrayBuffer[Any](sp.length)
    var k = 0
    while (k < sp.length) {
      val base = graft.functions.EnglishAnalysis
        .stripPossessive(s.substring(sp(k)._1, sp(k)._2))
      if (!graft.functions.EnglishAnalysis.isStop(base))
        out += org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(
            graft.functions.PorterStemmer.stem(base)),
          k)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(out.toArray)
  }
}

/** Write-time FRENCH analysis of one string value — the french twin
  * of [[EnglishTokens]], same (term, pos) struct-array contract:
  * standard-analyzer token spans, elision, french stop filter with
  * CONSUMED positions (Lucene's increments), light french stems
  * ([[graft.functions.FrenchLightStemmer]] — ES's prebuilt `french`
  * analyzer default). One generated call per row;
  * the whole chain is allocation-light JVM code. */
case class FrenchTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_french_tokens"

  override protected def nullSafeEval(input: Any): Any =
    FrenchTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.FrenchTokens.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FrenchTokens = copy(child = newChild)
}

object FrenchTokens {
  def tokenize(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val sp = AnalyzerTokens.spans(s)
    val out = new scala.collection.mutable.ArrayBuffer[Any](sp.length)
    var k = 0
    while (k < sp.length) {
      val base = graft.functions.FrenchAnalysis
        .elide(s.substring(sp(k)._1, sp(k)._2))
      if (base.nonEmpty && !graft.functions.FrenchAnalysis.isStop(base))
        out += org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(
            graft.functions.FrenchLightStemmer.stem(base)),
          k)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(out.toArray)
  }
}

/** Write-time GERMAN analysis of one string value — the third
  * language twin of [[EnglishTokens]]/[[FrenchTokens]], same
  * (term, pos) struct-array contract: standard-analyzer token
  * spans, german stop filter with CONSUMED positions,
  * german_normalization (ß→ss, ae/oe/ue folds), light german stems
  * ([[graft.functions.GermanLightStemmer]] — ES's prebuilt `german`
  * analyzer default). One generated call per row. */
case class GermanTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_german_tokens"

  override protected def nullSafeEval(input: Any): Any =
    GermanTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GermanTokens.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): GermanTokens = copy(child = newChild)
}

object GermanTokens {
  def tokenize(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val sp = AnalyzerTokens.spans(s)
    val out = new scala.collection.mutable.ArrayBuffer[Any](sp.length)
    var k = 0
    while (k < sp.length) {
      val base = s.substring(sp(k)._1, sp(k)._2)
      if (!graft.functions.GermanAnalysis.isStop(base))
        out += org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(graft.functions.GermanLightStemmer
            .stem(graft.functions.GermanAnalysis.normalize(base))),
          k)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(out.toArray)
  }
}

/** Write-time SPANISH analysis of one string value — the fourth
  * language twin, same (term, pos) struct-array contract:
  * standard-analyzer token spans, spanish stop filter with
  * CONSUMED positions, light spanish stems
  * ([[graft.functions.SpanishLightStemmer]] — ES's prebuilt
  * `spanish` analyzer default; the stemmer folds accents itself).
  * One generated call per row. */
case class SpanishTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_spanish_tokens"

  override protected def nullSafeEval(input: Any): Any =
    SpanishTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SpanishTokens.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SpanishTokens = copy(child = newChild)
}

/** Write-time CUSTOM-CHAIN analysis of one string value — the
  * settings-defined analyzer twin of the language token
  * expressions, same (term, pos) struct-array contract: the right
  * child is the chain's canonical JSON
  * ([[graft.functions.CustomChain.Spec.json]], always a foldable
  * literal — it comes from the index meta sidecar), parsed ONCE per
  * distinct chain through a static cache, then each row runs the
  * chain (tokenizer → filters, stop-consumed positions, edge_ngram
  * grams sharing their source token's position). Codegen'd like its
  * siblings: one static call per row, no reflection, no UDF. */
case class ChainTokens(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_chain_tokens"

  override protected def nullSafeEval(input: Any, chain: Any): Any =
    ChainTokens.tokenize(input.asInstanceOf[UTF8String],
      chain.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, j) =>
      s"org.apache.spark.sql.graft.ChainTokens.tokenize($c, $j)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChainTokens =
    copy(left = newLeft, right = newRight)
}

object ChainTokens {
  private val specCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      graft.functions.CustomChain.Spec]()

  def tokenize(input: UTF8String, chainJson: UTF8String): ArrayData = {
    val key = chainJson.toString
    var spec = specCache.get(key)
    if (spec == null) {
      spec = graft.functions.CustomChain.parseJson(key)
      specCache.putIfAbsent(key, spec)
    }
    val toks = graft.functions.CustomChain
      .analyzeWithPositions(spec, input.toString)
    val out = new Array[Any](toks.length)
    var k = 0
    while (k < toks.length) {
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(toks(k)._1), toks(k)._2)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

object SpanishTokens {
  def tokenize(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val sp = AnalyzerTokens.spans(s)
    val out = new scala.collection.mutable.ArrayBuffer[Any](sp.length)
    var k = 0
    while (k < sp.length) {
      val base = s.substring(sp(k)._1, sp(k)._2)
      if (!graft.functions.SpanishAnalysis.isStop(base))
        out += org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(
            graft.functions.SpanishLightStemmer.stem(base)),
          k)
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(out.toArray)
  }
}

/** Standard-analyzer tokenization as ONE generated char scan —
  * semantically IDENTICAL to
  * `regexp_extract_all(lower(text), TextFunctions.AnalyzerPattern)`
  * (ExpressionPropertiesSpec fuzz-pins the equivalence) but without
  * the regex engine: tokens are runs of Unicode letters/numbers/'_',
  * optionally joined by single word-internal apostrophes or dots.
  * The regex formulation measured ~2× slower across the match-family
  * scorers (java.util.regex \\p{L} classes per row); this scan is the
  * hot path of every search scan-route query. Lowercasing goes
  * through UTF8String.toLowerCase — the exact `lower()` the regex
  * path composed with. */
case class AnalyzerTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_analyzer_tokens"

  override protected def nullSafeEval(input: Any): Any =
    AnalyzerTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AnalyzerTokens.tokenize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): AnalyzerTokens = copy(child = newChild)
}

object AnalyzerTokens {
  /** Unicode \\p{L} | \\p{N} | '_' — the token-run character class. */
  @inline private def isTok(cp: Int): Boolean = {
    if (cp == '_') return true
    val t = Character.getType(cp)
    (t >= Character.UPPERCASE_LETTER && t <= Character.OTHER_LETTER) ||
      t == Character.DECIMAL_DIGIT_NUMBER ||
      t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
  }

  /** The (start, end) code-unit spans of the analyzed tokens of `s` —
    * the exact matches of [[graft.functions.TextFunctions
    * .AnalyzerPattern]]: a token-char run plus any number of
    * single-joiner ('\'' or '.') + token-char-run extensions. */
  private[graft] def spans(s: String): scala.collection.Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val n = s.length
    var i = 0
    while (i < n) {
      val cp0 = s.codePointAt(i)
      if (isTok(cp0)) {
        val start = i
        i += Character.charCount(cp0)
        var run = true
        while (run) {
          // consume the token-char run
          while (i < n && isTok(s.codePointAt(i)))
            i += Character.charCount(s.codePointAt(i))
          // one joiner followed by a token char extends the token
          if (i + 1 < n && (s.charAt(i) == '\'' || s.charAt(i) == '.') &&
              isTok(s.codePointAt(i + 1)))
            i += 1
          else run = false
        }
        out += ((start, i))
      } else i += Character.charCount(cp0)
    }
    out
  }

  def tokenize(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val sp = spans(s)
    val arr = new Array[Any](sp.length)
    var k = 0
    while (k < sp.length) {
      arr(k) = UTF8String.fromString(s.substring(sp(k)._1, sp(k)._2))
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  def count(input: UTF8String): Int =
    spans(input.toLowerCase.toString).length

  /** `" t1  t2  …  tk "` in one pass — Search.tokenNorm's padded
    * double-space-joined form without materializing the array. */
  def norm(input: UTF8String): UTF8String = {
    val s = input.toLowerCase.toString
    val sp = spans(s)
    val sb = new java.lang.StringBuilder(s.length + 2 + 2 * sp.length)
    sb.append(' ')
    var k = 0
    while (k < sp.length) {
      if (k > 0) sb.append(' ')
      sb.append(s, sp(k)._1, sp(k)._2)
      sb.append(' ')
      k += 1
    }
    if (sp.isEmpty) sb.append(' ')
    UTF8String.fromString(sb.toString)
  }
}

/** Analyzed-token COUNT without materializing the token array — the
  * BM25 document length every stats aggregate computes corpus-wide. */
case class AnalyzerTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_analyzer_token_count"
  override protected def nullSafeEval(input: Any): Any =
    AnalyzerTokens.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AnalyzerTokens.count($c)")
  override protected def withNewChildInternal(
      newChild: Expression): AnalyzerTokenCount = copy(child = newChild)
}

/** ONE tokenizer pass returning BOTH the analyzed-token count (the
  * BM25 document length) and the DISTINCT query-term indices present
  * among the tokens — `struct<dl:int, hits:array<int>>`. The stats-scan
  * rider behind the r19 de-skewed scorers: per-(field, term) document
  * frequency rides the corpus statistics aggregate as conditional
  * counts over this struct instead of `count(*) OVER (PARTITION BY
  * fid, term)` on the matched set (a window that placed every matching
  * doc of a hot term in ONE partition — no AQE skew handling applies
  * to window exchanges). `hits` holds ascending indices into `terms`,
  * each at most once — exactly "the field's token list contains
  * terms(j)", the explode + isin + tf-group row-existence predicate.
  */
case class TokenDlHits(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_token_dl_hits"

  @transient private lazy val termsArr: Array[String] = terms.toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenDlHits.compute(input.asInstanceOf[UTF8String], termsArr)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termsArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TokenDlHits.compute($c, $ref)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): TokenDlHits = copy(child = newChild)
}

object TokenDlHits {
  def compute(input: UTF8String,
              terms: Array[String]): org.apache.spark.sql.catalyst.InternalRow = {
    val s = input.toLowerCase.toString
    val sp = AnalyzerTokens.spans(s)
    val seen = new Array[Boolean](terms.length)
    var nHits = 0
    var k = 0
    while (k < sp.length) {
      val (a, b) = sp(k)
      val len = b - a
      var j = 0
      while (j < terms.length) {
        if (!seen(j)) {
          val t = terms(j)
          if (t.length == len && s.regionMatches(a, t, 0, len)) {
            seen(j) = true
            nHits += 1
          }
        }
        j += 1
      }
      k += 1
    }
    val hits = new Array[Any](nHits)
    var j = 0
    var m = 0
    while (j < terms.length) {
      if (seen(j)) { hits(m) = j; m += 1 }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(sp.length,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hits))
  }
}

/** Search.tokenNorm in one generated pass: the padded
  * double-space-joined analyzed-token string the phrase/term substring
  * probes run over. */
case class AnalyzerNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_analyzer_norm"
  override protected def nullSafeEval(input: Any): Any =
    AnalyzerTokens.norm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AnalyzerTokens.norm($c)")
  override protected def withNewChildInternal(
      newChild: Expression): AnalyzerNorm = copy(child = newChild)
}

object ArrayExpressions {
  /** Column API for [[DotProduct]] — codegen'd dot product of two
    * double-array columns. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[SimHash64]]. */
  def simhash(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  /** Column API for [[DistinctShingles]]. */
  def distinctShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(DistinctShingles(
      ExpressionUtils.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Column API for [[L2Normalize]]. */
  def l2normalize(vec: Column): Column =
    ExpressionUtils.column(L2Normalize(ExpressionUtils.expression(vec)))

  /** Column API for [[MinHashSignature]]. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(
      ExpressionUtils.expression(shingles),
      org.apache.spark.sql.catalyst.expressions.Literal(numHashes)))

  /** Column API for [[HyperplaneBands]]. */
  def hyperplaneBands(vec: Column, dim: Int, nBands: Int,
                      planesPerBand: Int, seed: Long): Column =
    ExpressionUtils.column(HyperplaneBands(
      ExpressionUtils.expression(vec), dim, nBands, planesPerBand, seed))

  /** Column API for [[QuantizeRoundTrip]]. */
  def quantizeRoundTrip(vec: Column): Column =
    ExpressionUtils.column(QuantizeRoundTrip(
      ExpressionUtils.expression(vec)))

  /** Column API for [[AnalyzerTokens]]. */
  def analyzerTokens(text: Column): Column =
    ExpressionUtils.column(AnalyzerTokens(ExpressionUtils.expression(text)))

  /** Column API for [[EnglishTokens]]. */
  def englishTokens(text: Column): Column =
    ExpressionUtils.column(EnglishTokens(ExpressionUtils.expression(text)))

  /** Column API for [[FrenchTokens]]. */
  def frenchTokens(text: Column): Column =
    ExpressionUtils.column(FrenchTokens(ExpressionUtils.expression(text)))

  /** Column API for [[GermanTokens]]. */
  def germanTokens(text: Column): Column =
    ExpressionUtils.column(GermanTokens(ExpressionUtils.expression(text)))

  /** Column API for [[SpanishTokens]]. */
  def spanishTokens(text: Column): Column =
    ExpressionUtils.column(SpanishTokens(ExpressionUtils.expression(text)))

  /** Column API for [[ChainTokens]] — `chainJson` is the canonical
    * [[graft.functions.CustomChain.Spec.json]] serialization. */
  def chainTokens(text: Column, chainJson: String): Column =
    ExpressionUtils.column(ChainTokens(ExpressionUtils.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(chainJson)))

  /** Column API for [[AnalyzerTokenCount]]. */
  def analyzerTokenCount(text: Column): Column =
    ExpressionUtils.column(
      AnalyzerTokenCount(ExpressionUtils.expression(text)))

  /** Column API for [[AnalyzerNorm]]. */
  def analyzerNorm(text: Column): Column =
    ExpressionUtils.column(AnalyzerNorm(ExpressionUtils.expression(text)))

  /** Column API for [[TokenDlHits]]. */
  def tokenDlHits(text: Column, terms: Seq[String]): Column =
    ExpressionUtils.column(
      TokenDlHits(ExpressionUtils.expression(text), terms))

  /** Column API for [[DamerauLevenshtein]]. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    ExpressionUtils.column(DamerauLevenshtein(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

}

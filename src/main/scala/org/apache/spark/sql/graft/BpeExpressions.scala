package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side BPE encoding of one word under a trained merge list.
  *
  * The compositional form folds k merges into k NESTED `aggregate()`
  * higher-order functions — correct, but the Catalyst expression tree is
  * k deep (interpreted, per-element lambda dispatch), so a production
  * tokenizer's 32k merges are unusable: tree construction alone is
  * quadratic in k and evaluation walks 32k lambda frames per word. Here
  * the merge table rides into the generated code as ONE reference object
  * (same pattern as [[HyperplaneBands]]' plane matrix) and the whole
  * merge chain is a flat Java loop: per merge, an O(1) symbol-presence
  * check skips the ~all merges that can't apply to this word, and only
  * an actual hit pays the O(|word|) rewrite pass.
  *
  * Semantics are EXACTLY the fold of `Bpe.applyMerge`: merges applied in
  * training order, each as one leftmost-nonoverlapping pass (a merged
  * symbol never re-pairs within its own round) — pinned against the HOF
  * form and the plain-Scala golden encoder in BpeSpec, so the golden
  * gates on bpe_encode/bpe_vocab still apply unchanged.
  */
case class BpeEncodeWord(child: Expression,
                         merges: Seq[(String, String)],
                         endOfWord: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  // flattened [l0, r0, l1, r1, …] so the codegen reference object is a
  // plain String[] (no scala tuples in generated code)
  @transient private lazy val flat: Array[String] =
    merges.iterator.flatMap { case (l, r) => Iterator(l, r) }.toArray

  override protected def nullSafeEval(w: Any): Any =
    BpeEncodeWord.compute(w.asInstanceOf[UTF8String], flat, endOfWord)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    val eow = ctx.addReferenceObj("bpeEow", endOfWord, "java.lang.String")
    nullSafeCodeGen(ctx, ev, w =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.BpeEncodeWord
         |  .compute($w, $ref, $eow);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeWord = copy(child = newChild)
}

object BpeEncodeWord {

  def compute(word: UTF8String, flatMerges: Array[String],
              endOfWord: String): ArrayData = {
    // initial symbols: one per code point (Spark substring semantics,
    // matching the HOF initSymbols) + the end-of-word marker
    val w = word.toString
    val init = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      init.add(w.substring(i, i + cc))
      i += cc
    }
    init.add(endOfWord)
    toArrayData(applyFlat(init.toArray(new Array[String](init.size)),
      flatMerges))
  }

  /** The flat merge loop over an EXISTING symbol array — shared by the
    * word encoder above and [[BpeApplySyms]] (the trainer's batched
    * round application). One leftmost-nonoverlapping pass per merge,
    * in list order. */
  def applyFlat(syms: Array[String],
                flatMerges: Array[String]): Array[String] = {
    var cur = syms
    // presence set: conservative superset of symbols in `cur` (entries
    // consumed by later merges are never removed — a stale hit only
    // costs one O(|word|) scan, while the set lets the loop skip the
    // overwhelming majority of a 32k-merge table in O(1) each
    val present = new java.util.HashSet[String](cur.length * 2)
    var j = 0
    while (j < cur.length) { present.add(cur(j)); j += 1 }
    var m = 0
    while (m < flatMerges.length && cur.length >= 2) {
      val l = flatMerges(m)
      val r = flatMerges(m + 1)
      if (present.contains(l) && present.contains(r)) {
        // find first hit before allocating anything
        var k = 0
        var hit = -1
        while (hit < 0 && k < cur.length - 1) {
          if (cur(k) == l && cur(k + 1) == r) hit = k
          k += 1
        }
        if (hit >= 0) {
          val out = new java.util.ArrayList[String](cur.length - 1)
          var p = 0
          while (p < hit) { out.add(cur(p)); p += 1 }
          // leftmost-nonoverlapping single pass from the first hit
          while (p < cur.length) {
            if (p < cur.length - 1 && cur(p) == l && cur(p + 1) == r) {
              out.add(l + r); p += 2
            } else { out.add(cur(p)); p += 1 }
          }
          cur = out.toArray(new Array[String](out.size))
          present.add(l + r)
        }
      }
      m += 2
    }
    cur
  }

  private def toArrayData(cur: Array[String]): ArrayData = {
    val res = new Array[Any](cur.length)
    var q = 0
    while (q < cur.length) { res(q) = UTF8String.fromString(cur(q)); q += 1 }
    new GenericArrayData(res)
  }
}

/** Apply a merge LIST to an existing symbol array in one flat generated
  * loop — the batched-round analog of [[BpeEncodeWord]]: the trainer
  * applies a whole non-interacting merge batch in ONE projection
  * instead of folding k nested `aggregate()` HOFs (k-deep interpreted
  * expression trees). Semantics: exactly the fold of `Bpe.applyMerge`
  * in list order — pinned in BpeSpec against the HOF fold. */
case class BpeApplySyms(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val flat: Array[String] =
    merges.iterator.flatMap { case (l, r) => Iterator(l, r) }.toArray

  override protected def nullSafeEval(s: Any): Any =
    BpeApplySyms.compute(s.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.BpeApplySyms
         |  .compute($s, $ref);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeApplySyms = copy(child = newChild)
}

object BpeApplySyms {
  def compute(syms: ArrayData, flatMerges: Array[String]): ArrayData = {
    val n = syms.numElements()
    val cur = new Array[String](n)
    var i = 0
    while (i < n) { cur(i) = syms.getUTF8String(i).toString; i += 1 }
    val out = BpeEncodeWord.applyFlat(cur, flatMerges)
    val res = new Array[Any](out.length)
    var q = 0
    while (q < out.length) {
      res(q) = UTF8String.fromString(out(q)); q += 1
    }
    new GenericArrayData(res)
  }
}

object BpeExpressions {
  /** Column API for [[BpeEncodeWord]] — symbols of `word` after the
    * trained merge list, computed in one generated loop. */
  def bpeEncodeWord(word: Column, merges: Seq[(String, String)],
                    endOfWord: String): Column =
    ExpressionUtils.column(BpeEncodeWord(
      ExpressionUtils.expression(word), merges, endOfWord))

  /** Column API for [[BpeApplySyms]] — a merge batch applied to an
    * existing symbol-array column in one generated loop. */
  def bpeApplySyms(syms: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeApplySyms(
      ExpressionUtils.expression(syms), merges))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over a fixed keyword list — one forward pass
  * over the text finds EVERY keyword occurrence regardless of how many
  * keywords there are. The scale story: a production blocklist/topic
  * lexicon is 10⁴–10⁵ terms, where the compositional form (one
  * `contains` per keyword, k passes over every row) stops being a
  * projection and becomes the scan bottleneck; the automaton is built
  * ONCE on the driver, ships to executors as a reference object (same
  * pattern as the BPE merge table), and matching is O(|text| + hits)
  * per row independent of k.
  *
  * Standard construction: goto trie over the keyword set, BFS failure
  * links, output lists merged through the links. Matching semantics =
  * exactly `keywords.filter(text.contains(_))` as a SET — pinned
  * against that naive form by scalacheck in KeywordSpec and by the
  * DuckDB oracle of `text_keywords`. */
final class KeywordAutomaton(val keywords: Array[String])
    extends Serializable {

  // trie as growable parallel arrays; transitions in per-state hash
  // maps (alphabet is full UTF-16, a dense table would be huge)
  private val gotoMaps =
    new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
  private val failLink = new java.util.ArrayList[Integer]()
  // per-state keyword indexes whose match ends here (own + inherited
  // through failure links, merged during BFS)
  private val outs = new java.util.ArrayList[Array[Int]]()

  locally {
    def newState(): Int = {
      gotoMaps.add(new java.util.HashMap[Character, Integer]())
      failLink.add(0)
      outs.add(Array.emptyIntArray)
      gotoMaps.size - 1
    }
    newState() // root = 0
    keywords.zipWithIndex.foreach { case (kw, ki) =>
      var s = 0
      var i = 0
      while (i < kw.length) {
        val c = kw.charAt(i)
        val next = gotoMaps.get(s).get(c)
        s = if (next != null) next.intValue()
        else {
          val n = newState()
          gotoMaps.get(s).put(c, n)
          n
        }
        i += 1
      }
      outs.set(s, outs.get(s) :+ ki)
    }
    // BFS failure links; merge output sets down the links
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps.get(0).forEach { (_, s) => failLink.set(s, 0); queue.add(s) }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      gotoMaps.get(s).forEach { (c, t) =>
        var f = failLink.get(s).intValue()
        while (f != 0 && !gotoMaps.get(f).containsKey(c))
          f = failLink.get(f).intValue()
        val ft = gotoMaps.get(f).get(c)
        val fail =
          if (ft != null && ft.intValue() != t.intValue()) ft.intValue()
          else 0
        failLink.set(t, fail)
        if (outs.get(fail).nonEmpty)
          outs.set(t, outs.get(t) ++ outs.get(fail))
        queue.add(t)
      }
    }
  }

  /** Distinct matched keyword indexes, ascending (= keyword-list
    * order). */
  def matchSet(text: String): Array[Int] = {
    val hit = new java.util.BitSet(keywords.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !gotoMaps.get(s).containsKey(c))
        s = failLink.get(s).intValue()
      val next = gotoMaps.get(s).get(c)
      s = if (next != null) next.intValue() else 0
      val o = outs.get(s)
      var j = 0
      while (j < o.length) { hit.set(o(j)); j += 1 }
      i += 1
    }
    val res = new Array[Int](hit.cardinality())
    var k = 0
    var b = hit.nextSetBit(0)
    while (b >= 0) { res(k) = b; k += 1; b = hit.nextSetBit(b + 1) }
    res
  }
}

/** `graft_keywords(text)` — array of the distinct keywords occurring in
  * `text` as substrings, in keyword-list order. */
case class KeywordMatches(child: Expression, keywords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_keywords"

  @transient private lazy val ac = new KeywordAutomaton(keywords.toArray)

  override protected def nullSafeEval(t: Any): Any =
    KeywordMatches.compute(t.asInstanceOf[UTF8String], ac)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac,
      classOf[KeywordAutomaton].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.KeywordMatches
         |  .compute($t, $ref);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): KeywordMatches = copy(child = newChild)
}

object KeywordMatches {
  def compute(text: UTF8String, ac: KeywordAutomaton): ArrayData = {
    val ids = ac.matchSet(text.toString)
    val res = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) {
      res(i) = UTF8String.fromString(ac.keywords(ids(i)))
      i += 1
    }
    new GenericArrayData(res)
  }
}

object KeywordExpressions {
  /** Column API for [[KeywordMatches]]. */
  def keywordMatches(text: Column, keywords: Seq[String]): Column =
    ExpressionUtils.column(KeywordMatches(
      ExpressionUtils.expression(text), keywords))
}

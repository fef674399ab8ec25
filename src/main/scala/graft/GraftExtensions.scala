package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DistinctShingles, DotProduct, KeywordMatches, L2Normalize, NormalizeJson, SimHash64}

/** SQL registration for the custom codegen expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`) exposes them as SQL functions
  * `graft_dot(a, b)` and `graft_simhash64(tokens)`, so `spark.sql`
  * text (the serving layer's query language, SURVEY §2.10 Q2) can reach
  * them too — the Column API in [[graft.functions.ArrayExpressions]]
  * needs no registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Arity-checked builder: wrong-arity SQL calls get a clear error, not
    * an IndexOutOfBoundsException from `children(i)`. */
  private def checked(name: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${children.length}")
      build(children)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      checked("graft_dot", 2)(c => DotProduct(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      checked("graft_simhash64", 1)(c => SimHash64(c.head))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "graft_shingles"),
      checked("graft_shingles", 2)(c => DistinctShingles(c(0), c(1)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
      checked("graft_l2norm", 1)(c => L2Normalize(c.head))))
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize_json"),
      new ExpressionInfo(classOf[NormalizeJson].getName,
        "graft_normalize_json"),
      checked("graft_normalize_json", 1)(c => NormalizeJson(c.head))))
    ext.injectFunction((
      new FunctionIdentifier("graft_keywords"),
      new ExpressionInfo(classOf[KeywordMatches].getName, "graft_keywords"),
      checked("graft_keywords", 2) { c =>
        // the keyword list builds the Aho–Corasick automaton at PLAN
        // time, so it must be a literal (foldable) array of strings
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, StringType}
        def bad() = throw new IllegalArgumentException(
          "graft_keywords expects a literal array<string> keyword list " +
            "with no null entries")
        val kws = c(1) match {
          case e if e.foldable &&
              e.dataType.isInstanceOf[ArrayType] &&
              e.dataType.asInstanceOf[ArrayType].elementType == StringType =>
            // a foldable expression can still EVALUATE to null (CAST(
            // NULL AS ARRAY<STRING>)) or carry null elements — both
            // must be the clear caller error, not an opaque NPE
            e.eval() match {
              case a: ArrayData =>
                (0 until a.numElements()).map { i =>
                  if (a.isNullAt(i)) bad()
                  a.getUTF8String(i).toString
                }
              case _ => bad()
            }
          case _ => bad()
        }
        KeywordMatches(c(0), kws)
      }))
  }
}

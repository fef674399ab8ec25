package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DistinctShingles, DotProduct, L2Normalize, NormalizeJson, SimHash64}

/** SQL registration for the custom codegen expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`) exposes them as SQL functions
  * `graft_dot(a, b)` and `graft_simhash64(tokens)`, so `spark.sql`
  * text (the serving layer's query language, SURVEY §2.10 Q2) can reach
  * them too — the Column API in [[graft.functions.ArrayExpressions]]
  * needs no registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => DistinctShingles(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2norm"),
      (children: Seq[Expression]) => L2Normalize(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize_json"),
      new ExpressionInfo(classOf[NormalizeJson].getName,
        "graft_normalize_json"),
      (children: Seq[Expression]) => NormalizeJson(children.head)))
  }
}

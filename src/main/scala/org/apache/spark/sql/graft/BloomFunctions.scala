package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column API over Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the exact pair
  * Catalyst's `InjectRuntimeFilter` plants under shuffle joins), exposed
  * for EXPLICIT use by [[graft.operators.Dedup.incremental]]: build a
  * bloom over a corpus key column once, then prefilter a new batch with
  * a codegen'd `might_contain` before any join. Values are keyed by
  * `xxhash64`, matching the injected-filter convention. Both classes are
  * `private[sql]`-adjacent internals, hence this file's packaging (see
  * [[ArrayExpressions]]'s scaladoc for the constraint). */
object BloomFunctions {

  /** Aggregate Column producing the serialized bloom filter (binary) of
    * `xxhash64(col)` over all rows. `numBits` sized via
    * [[optimalNumBits]]. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(c))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe of `xxhash64(col)` against a
    * driver-collected serialized bloom (shipped to executors as a plan
    * literal — bounded model state, same pattern as IVF codebooks). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        new XxHash64(Seq(ExpressionUtils.expression(c)))))

  /** Standard optimal bit count for an expected item count at a target
    * false-positive probability. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    BloomFilter.create(expectedItems, fpp).bitSize()
}

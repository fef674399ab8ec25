package graft.functions

import org.apache.spark.sql.Column

/** User-facing forwarders for the bloom-filter Column API (the
  * implementation lives under `org.apache.spark.sql.graft` for the
  * documented `private[sql]` packaging constraint). */
object BloomFunctions {
  /** Serialized-bloom aggregate over `xxhash64(c)`. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    org.apache.spark.sql.graft.BloomFunctions
      .bloomAgg(c, expectedItems, numBits)

  /** Codegen'd bloom membership probe of `xxhash64(c)`. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    org.apache.spark.sql.graft.BloomFunctions.mightContain(bloom, c)

  /** Optimal bloom bit count for (expectedItems, fpp). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    org.apache.spark.sql.graft.BloomFunctions
      .optimalNumBits(expectedItems, fpp)
}

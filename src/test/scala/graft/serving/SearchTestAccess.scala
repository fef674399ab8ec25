package graft.serving

import org.apache.spark.sql.Column

/** Test-only window into [[Search]]'s private[graft] helpers from the
  * graft.serving package (specs live in the graft package). */
object SearchTestAccess {
  def tokenNorm(c: Column): Column = Search.tokenNorm(c)
}

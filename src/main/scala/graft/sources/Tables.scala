package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet lake source for the driver-generated testdata star schema
  * (TESTDATA.md). Plays the role of the reference's JDBC extraction layer
  * (reference: src/db_connector.py:135-223 — per-entity `SELECT *` scans):
  * each table is one columnar scan with Catalyst predicate pushdown and
  * column pruning replacing the hand-written WHERE / column lists.
  *
  * At 100 TB these reads become partitioned parquet scans over an object
  * store; nothing here materializes on the driver — every `apply` returns a
  * lazy plan.
  */
object Tables {
  /** All tables the driver generates (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` serving queries
    * (SURVEY §2.10 Q2) can address them by name — the analog of the
    * reference registering per-entity ES indexes (src/utils.py:5-18). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

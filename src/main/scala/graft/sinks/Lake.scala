package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed lake tables — the storage-level half of the 100 TB join
  * strategy. A table bucketed (and sorted) by its join/aggregation key
  * carries its hash partitioning in the catalog, so
  * `bucketed ⋈ bucketed` on the bucket key and `groupBy(bucketKey)`
  * plan with NO shuffle exchange: the scan itself is the exchange
  * ([[graft.LakeSpec]] asserts the plan shape). This is what replaces
  * the reference's per-entity full rewrites for fact tables that are
  * repeatedly joined on the same key (orders⋈lineitem-class workloads):
  * pay one clustered write, skip the fact shuffle on every read.
  *
  * Bucket count sizing: at 100 TB aim for ~128–512 MB per bucket file
  * per partition; bucket count must match across tables meant to
  * co-join (Spark requires equal counts, or a multiple with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Lake {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

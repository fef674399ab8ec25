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

  /** Hive-style partitioned lake write — the scan-avoidance half of the
    * 100 TB story: a predicate on a partition column prunes whole
    * directories at PLANNING time (the scan's `PartitionFilters`), and a
    * join to a filtered dimension prunes them at RUNTIME via dynamic
    * partition pruning — both asserted in [[graft.ScalePruningSpec]].
    * Partition columns must be low-cardinality (dates, sources, langs):
    * one directory per value. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Z-order clustered rewrite — multi-dimensional data layout so
    * min/max file statistics prune on EITHER (or both) of two columns:
    * a table range-partitioned on one column prunes only on that
    * column; interleaving the bits of both columns' rank spaces into
    * one Morton (Z) value and range-partitioning + sorting on it keeps
    * every file's bounding box tight in BOTH dimensions (the lakehouse
    * `OPTIMIZE ZORDER BY` layout, built from public parts: min/max
    * scaling → 16-bit quantization → bit interleave →
    * `repartitionByRange` + `sortWithinPartitions`).
    *
    * Cost: one bounded stats agg (driver-side 4 doubles) + one range
    * shuffle — the same price as a plain sorted rewrite. Skipping is
    * then a property of the files; any engine reading the parquet
    * footers benefits. */
  def writeZOrdered(df: DataFrame, path: String,
                    colA: String, colB: String,
                    partitions: Int): Unit = {
    import org.apache.spark.sql.functions._
    val Array(r) = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .collect()
    val (aMin, aMax, bMin, bMax) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def q16(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi == lo) lit(0L)
      else floor((c.cast("double") - lo) / (hi - lo) * 65535.0)
        .cast("long")
    // interleave 16+16 bits: spread each value's bits to even (a) and
    // odd (b) positions — pure integer column arithmetic, codegen'd
    def spread(v: org.apache.spark.sql.Column) = {
      // classic Morton bit-spreading via shift-or-mask rounds
      val m1 = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
      m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
    }
    val z = spread(q16(col(colA), aMin, aMax))
      .bitwiseOR(shiftleft(spread(q16(col(colB), bMin, bMax)), 1))
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction — the maintenance operator every long-lived
    * 100 TB lake needs: streaming/incremental appends accumulate
    * KB-sized files whose per-file open/footer overhead eventually
    * dominates scan cost. Rewrites `path` into ~`targetFileBytes` files
    * via `coalesce` (a NARROW dependency — no shuffle; each output task
    * concatenates input splits), staged in a temp dir and swapped in
    * via [[swapIn]]. `shuffle = true` switches to round-robin
    * `repartition` when input files are so skewed that bin-packing
    * matters more than avoiding one shuffle. Returns the output file
    * count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              shuffle: Boolean = false): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(hPath).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    val df = spark.read.parquet(path)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    val tmp = new org.apache.hadoop.fs.Path(
      hPath.getParent,
      s".${hPath.getName}_compact_${java.util.UUID.randomUUID().toString.take(8)}")
    sized.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swapIn(fs, tmp, hPath)
    n
  }

  /** Crash-safe generation swap: rename the CURRENT generation aside,
    * rename the new one in, then delete the old — never
    * delete-then-rename, whose crash window leaves ZERO copies of the
    * data under any name. Here a crash between the two renames leaves
    * BOTH complete generations on disk (`<path>.old_*` and the staged
    * temp dir), and a crash after the second rename leaves the new
    * generation canonical plus a stale aside dir — every interruption
    * point is recoverable by rename alone, none loses data
    * ([[graft.ScalePruningSpec]] drives the interruption points). The
    * aside-delete failing is non-fatal by the same logic: the swap has
    * already committed. */
  def swapIn(fs: org.apache.hadoop.fs.FileSystem,
             tmp: org.apache.hadoop.fs.Path,
             dest: org.apache.hadoop.fs.Path): Unit = {
    val aside = new org.apache.hadoop.fs.Path(
      dest.getParent,
      s".${dest.getName}_old_${java.util.UUID.randomUUID().toString.take(8)}")
    if (fs.exists(dest) && !fs.rename(dest, aside))
      throw new java.io.IOException(s"rename $dest -> $aside failed")
    if (!fs.rename(tmp, dest)) {
      // roll back so the canonical path never stays vacant longer than
      // this call: the old generation returns to `dest` before we throw
      fs.rename(aside, dest)
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
    }
    try fs.delete(aside, true)
    catch { case scala.util.control.NonFatal(_) => () }
  }
}

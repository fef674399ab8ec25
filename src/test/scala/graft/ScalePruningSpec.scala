package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Lake

/** Plan-shape guards for the scan-avoidance techniques that carry the
  * 100 TB design: static partition pruning, dynamic partition pruning
  * (runtime subquery from a filtered dim), runtime bloom-filter join
  * reduction, and small-file compaction. All asserted on real plans so a
  * regression that silently re-enables full scans fails CI. */
class ScalePruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-lake").toString

  private def fact = (0 until 1000).map(i =>
    (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}", i % 97))
    .toDF("id", "dt", "k")

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      df.explain("formatted")
    }
    out.toString
  }

  test("partition-column predicate prunes at planning time") {
    val path = tmp()
    Lake.writePartitioned(fact, path, Seq("dt"))
    val pruned = spark.read.parquet(path).filter(col("dt") === "2024-01-03")
    val plan = formattedPlan(pruned)
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("2024-01-03"), plan)
    // the data predicate never reaches the row scan: PushedFilters stays
    // empty because the partition directory IS the filter
    assert(pruned.count() == 100)
    // physical proof: only the matching directory's files are touched
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    val parts = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(parts.length == 1, s"expected 1 pruned partition, got ${
      parts.length}")
  }

  test("dynamic partition pruning: a filtered dim prunes fact partitions " +
       "at runtime") {
    val root = tmp()
    Lake.writePartitioned(fact, s"$root/fact", Seq("dt"))
    // the dim must be file-backed: an in-memory Seq dim would be
    // constant-folded to a LocalRelation, erasing the selective Filter
    // node the DPP rule looks for
    Seq(("2024-01-03", "keep"), ("2024-01-04", "drop"))
      .toDF("dt", "tag").write.parquet(s"$root/dim")
    val dim = spark.read.parquet(s"$root/dim")
    val joined = spark.read.parquet(s"$root/fact")
      .join(dim.filter(col("tag") === "keep"), Seq("dt"))
    val plan = formattedPlan(joined)
    assert(plan.contains("dynamicpruning"), plan)
    assert(joined.count() == 100)
  }

  test("runtime bloom filter reduces the fact scan from a selective dim") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "0")      // tiny test data: always apply
      conf.set(keys(2), "100MB")
      // the injector only fires for shuffle joins (a broadcast join has
      // no fact shuffle for the filter to shrink) — forcing the shuffle
      // here stands in for the 100 TB case where the dim exceeds the
      // broadcast threshold but its join-key set still fits a bloom
      conf.set(keys(3), "-1")
      val root = tmp()
      // non-partition join key → partition pruning can't help; the bloom
      // filter is what stands between the join and a full fact scan
      fact.write.parquet(s"$root/fact")
      (0 until 1000).map(i => (i % 97, s"d$i")).toDF("k", "attr")
        .write.parquet(s"$root/dim")
      val dim = spark.read.parquet(s"$root/dim")
        .filter(col("attr") === "d5")
      val joined = spark.read.parquet(s"$root/fact").join(dim, Seq("k"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
             plan.contains("bloom_filter_agg"), plan)
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("z-order layout bounds per-file ranges in BOTH dimensions") {
    val root = tmp()
    // 100×100 uniform grid — the adversarial case for 1-d layouts
    val grid = (0 until 10000).map(i => (i % 100, i / 100))
      .toDF("x", "y")
    grid.repartitionByRange(16, col("x"))
      .write.parquet(s"$root/naive")
    Lake.writeZOrdered(grid, s"$root/zorder", "x", "y", partitions = 16)

    def avgRanges(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.toString)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("x")) - min(col("x")),
               max(col("y")) - min(col("y"))).collect()(0)
        (r.getInt(0).toDouble, r.getInt(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length,
       spans.map(_._2).sum / spans.length)
    }
    val (_, naiveY) = avgRanges(s"$root/naive")
    val (zX, zY) = avgRanges(s"$root/zorder")
    // 1-d range layout: tight in x but each file spans ~the FULL y range
    assert(naiveY >= 80.0, s"naive y-range $naiveY unexpectedly tight")
    // z-order: 16 files ≈ a 4×4 tile grid — both dims bounded, so a
    // min/max-skipping reader prunes on either predicate column
    assert(zX <= 40.0, s"z-order x-range $zX too wide")
    assert(zY <= 40.0, s"z-order y-range $zY too wide")
  }

  test("compact rewrites a many-small-files table into sized files") {
    val path = tmp() + "/t"
    // 64 tiny files
    fact.repartition(64).write.parquet(path)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(path) == 64)
    val n = Lake.compact(spark, path, targetFileBytes = 512L * 1024)
    assert(parts(path) == n && n < 64, s"n=$n files=${parts(path)}")
    // content unchanged, no temp dirs left behind
    val back = spark.read.parquet(path)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head.getLong(0) == 499500L)
    val strays = new java.io.File(path).getParentFile.listFiles()
      .map(_.getName).filter(_.contains("_compact_"))
    assert(strays.isEmpty, strays.mkString(", "))
  }

  test("interrupted compaction swap never has zero readable generations") {
    import org.apache.hadoop.fs.Path
    val root = tmp()
    val path = s"$root/t"
    fact.repartition(8).write.parquet(path)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

    // stage the new generation, exactly as compact() does
    val tmpGen = new Path(root, ".t_compact_test")
    spark.read.parquet(path).coalesce(2).write.parquet(tmpGen.toString)

    // crash point 1: after "rename old aside", before "rename new in" —
    // the worst instant of the swap. With delete-then-rename this is the
    // window where the data exists NOWHERE; with the two-rename swap both
    // complete generations must be present and readable.
    val aside = new Path(root, ".t_old_test")
    assert(fs.rename(new Path(path), aside))
    assert(spark.read.parquet(aside.toString).count() == 1000,
      "old generation lost after the aside rename")
    assert(spark.read.parquet(tmpGen.toString).count() == 1000,
      "staged generation unreadable mid-swap")
    // recovery from crash point 1 is a single rename (either generation);
    // completing the interrupted swap:
    assert(fs.rename(tmpGen, new Path(path)))
    assert(spark.read.parquet(path).count() == 1000)
    fs.delete(aside, true)

    // end-to-end: the real swapIn over a fresh staged generation commits
    // and leaves no aside dirs behind
    val tmp2 = new Path(root, ".t_compact_test2")
    spark.read.parquet(path).coalesce(1).write.parquet(tmp2.toString)
    Lake.swapIn(fs, tmp2, new Path(path))
    val back = spark.read.parquet(path)
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head.getLong(0) == 499500L)
    val strays = new java.io.File(root).listFiles()
      .map(_.getName).filter(n => n.contains("_old_") || n.contains("_compact_"))
    assert(strays.isEmpty, strays.mkString(", "))
  }
}

package graft

import scala.util.control.NonFatal

/** Dev utility: benchmark a NAMED SUBSET of the registered queries —
  * the iteration loop for targeted perf work (the full [[Bench]] lap
  * over all queries costs minutes; a regression hunt needs seconds).
  * Same methodology as Bench: sf0.001 warmup per query (JIT + codegen),
  * then N timed laps against SPARK_GRAFT_SF_DIR, best-of reported.
  *
  * Usage: runMain graft.BenchSome q4_union_search_bm25 q7_esdsl_bool
  * (env: SPARK_GRAFT_LAPS to override the default 3).
  */
object BenchSome {
  private val WarmupDir = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val laps = sys.env.get("SPARK_GRAFT_LAPS").map(_.toInt).getOrElse(3)
    val names = args.toSeq
    require(names.nonEmpty, "pass query names")
    val qs = names.map(n => n -> SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query '$n'")))
    val spark = GraftSession("graft-bench-some")
    qs.foreach { case (_, fn) =>
      try fn(spark, WarmupDir).count() catch { case NonFatal(_) => () }
      finally StageCache.releaseAll()
    }
    val samples = (1 to laps).map { _ =>
      qs.map { case (n, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch {
          case NonFatal(e) => System.err.println(s"[bench-some] $n: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        StageCache.releaseAll()
        n -> dt
      }.toMap
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"[bench-some] loadavg $load%.2f sf=$sfDir laps=$laps")
    names.foreach { n =>
      val xs = samples.map(_(n))
      println(f"[bench-some] $n%-34s best ${xs.min}%.2f  " +
        xs.map(x => f"$x%.2f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}

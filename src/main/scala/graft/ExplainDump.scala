package graft

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

/** Dev tooling for the optimization rounds: dump `.explain("formatted")`
  * for named queries (or all of them) to a directory, so plan shapes can
  * be diffed before/after a change without the Spark UI.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> [query names...]
  * Writes `<outDir>/<name>.txt`. Not part of the driver contract.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val names: Seq[String] =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession("graft-explain")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
          } catch {
            case NonFatal(e) =>
              System.err.println(s"[explain] $name failed: ${e.getMessage}")
          } finally StageCache.releaseAll()
      }
    }
    spark.stop()
  }
}

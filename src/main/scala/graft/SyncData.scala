package graft

/** CLI entrypoint for a full catalog sync — the reference's
  * `sync_data.py` (→ `sync_all_tables`, src/data_sync.py:923-934) as an
  * sbt/spark-submit main:
  *
  *   runMain graft.SyncData <srcDir> <outDir> [runTs]
  *
  * Runs every [[graft.catalog.EntityCatalog]] entity through
  * validate → namespace → lineage → document index write (per-entity
  * error isolation: one failing entity doesn't stop the run), prints
  * the per-entity (synced, rejected) accounting the reference logs,
  * and exits non-zero if any entity failed wholesale. */
object SyncData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SyncData <srcDir> <outDir> [runTs]")
    val Array(srcDir, outDir) = args.take(2)
    val runTs =
      if (args.length > 2) args(2)
      else java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ISO_INSTANT)
    val spark = GraftSession("graft-sync")
    val results = graft.catalog.EntityCatalog
      .syncAll(spark, srcDir, outDir, runTs)
    results.toSeq.sortBy(_._1).foreach { case (entity, (ok, bad)) =>
      if (ok < 0) println(s"[sync] $entity FAILED")
      else println(s"[sync] $entity synced=$ok rejected=$bad")
    }
    val failed = results.count(_._2._1 < 0)
    println(s"[sync] done: ${results.size - failed}/${results.size} " +
      s"entities, run_ts=$runTs")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}

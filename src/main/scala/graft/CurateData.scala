package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Chunk, Split}

/** CLI entrypoint for the training-data curation pipeline — the
  * `documents` analog of [[SyncData]]:
  *
  *   runMain graft.CurateData <srcDir> <outDir>
  *
  * Runs the standard stages end to end and writes a training-ready lake:
  *  1. score: token counts, language ID, quality (pure projections);
  *  2. gate: lang == en && quality ≥ 0.45 (the pipeline_curation gate);
  *  3. exact-dedup: canonical (min doc id) per md5(text);
  *  4. split: deterministic md5-bucket train/val/test;
  *  5. chunk: 64-token windows at stride 48;
  * then writes chunks partitioned by split (the layout a trainer reads
  * — partition pruning gives per-split scans for free) and prints one
  * JSON summary line per split. Same shuffle budget as
  * `pipeline_curation` + the zero-shuffle chunk stage.
  */
object CurateData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateData <srcDir> <outDir>")
    val spark = GraftSession("graft-curate")
    val ok = run(spark, args(0), args(1))
    spark.stop()
    if (!ok) sys.exit(1)
  }

  /** The pipeline proper — embeddable (does not own the session).
    * Returns false if the curated lake came out empty. */
  def run(spark: org.apache.spark.sql.SparkSession,
          srcDir: String, outDir: String): Boolean = {
    val scored = graft.sources.Tables(spark, srcDir, "documents").select(
      col("doc_id"), col("text"), col("source"),
      tokenCount(col("text")).as("n_tokens"),
      langId(col("text")).as("lang_id"),
      qualityScore(col("text")).as("quality"))
    val kept = scored.filter(
      col("lang_id") === "en" && col("quality") >= 0.45)
    val canon = kept.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val unique = kept.join(canon.select("doc_id"), Seq("doc_id"))
    val split = Split.assign(unique, "doc_id", salt = "cur")
    val chunks = Chunk.split(
        split.select("doc_id", "text"), "doc_id", "text",
        window = 64, stride = 48)
      .join(split.select("doc_id", "split", "source", "quality"),
        Seq("doc_id"))

    chunks.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/chunks")

    val summary = spark.read.parquet(s"$outDir/chunks")
      .groupBy(col("split"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_tokens"))
      .orderBy(col("split")).collect()
    summary.foreach { r =>
      println(s"""{"split":"${r.getString(0)}","n_docs":${r.getLong(1)},""" +
        s""""n_chunks":${r.getLong(2)},"n_tokens":${r.getLong(3)}}""")
    }
    summary.nonEmpty && summary.map(_.getLong(2)).sum > 0
  }
}

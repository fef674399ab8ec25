package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE-TIME search index — the engine's analog of what Elasticsearch
  * does inside `bulk_index` (reference: src/es_connector.py:51-74): build
  * the inverted index and per-field statistics when documents are
  * WRITTEN, so every later ranked query (`multi_match` executes Lucene
  * BM25 over those postings — src/search_api.py:16-36) probes
  * precomputed, query-term-sized data instead of re-tokenizing and
  * re-aggregating the corpus per request.
  *
  * An index at `path/` is four parquet tables plus a sidecar:
  *   - `postings/`   (idCol, fid, dl, term, tf) — one row per
  *     (document, field, term): term frequency `tf` plus the document's
  *     field length `dl` (the BM25 length normalizer, carried here so a
  *     probe never joins back to the corpus);
  *   - `doclens/`    (idCol, fid, dl) — one row per (document, field),
  *     INCLUDING null-valued fields (dl null): the document-presence
  *     registry that makes `n`/`sumdl` maintenance exact under upserts;
  *   - `termstats/`  (fid, term, df_t) — per-(field, term) document
  *     frequency;
  *   - `fieldstats/` (fid, n, sumdl) — per-field corpus size and total
  *     length. `avgdl` is NOT stored: it is derived as one double
  *     division `sumdl / n` at probe time, keeping every stored value an
  *     integer so incremental updates are EXACT (no float drift between
  *     an upserted index and a full rebuild);
  *   - `_index_meta.json` — the indexed field list (order matters: the
  *     fixed-order score combine follows it) and the id column.
  *
  * Score identity: [[ranked]] evaluates the same expression tree as
  * [[graft.serving.Search.rankedFields]] over the same integer inputs
  * (tf, dl, df, n, sumdl), so an indexed query is hash-identical to the
  * scan-path scorer — the CORRECTNESS gate runs both against one oracle.
  *
  * Scale: the probe's plan touches `postings` with `term IN (...)`
  * pushed to the parquet scan (query-term-sized rows survive),
  * broadcast-joins the (tiny) stats, and ends in one per-doc aggregation
  * + TakeOrdered — no corpus scan, no corpus-wide shuffle, no
  * per-request statistics aggregation. At 100 TB the postings table is
  * laid out sorted by (fid, term) within files so row-group min/max
  * statistics skip non-matching groups; bucketing by term is the
  * cluster-scale refinement of the same layout.
  */
object SearchIndex {

  final case class Meta(idCol: String, fields: Seq[String])

  private val Reserved = Set("fid", "dl", "term", "tf", "df_t", "n",
    "sumdl", "score")

  /** One stacked pass over `docs`: every field's (dl, tokens) rides one
    * explode tagged `fid` — the same single-scan shape
    * Search.rankedFields uses, minus the query-term filter (an index
    * keeps every term). */
  private def postingsOf(docs: DataFrame, fields: Seq[String],
                         idCol: String): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    docs.select(col(idCol), explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(i).as("fid"),
          tokenCount(col(f)).as("dl"),
          split(lower(col(f)), "\\s+").as("toks"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"), col("fs.dl").as("dl"),
        explode(col("fs.toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("fid"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** (id, fid, dl) for EVERY (document, field) pair — dl null when the
    * field is null (such docs have no postings but still count in `n`,
    * exactly as the scan-path `count(*)` does). */
  private def doclensOf(docs: DataFrame, fields: Seq[String],
                        idCol: String): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    docs.select(col(idCol), explode(array(fields.zipWithIndex.map {
        case (f, i) => struct(lit(i).as("fid"), tokenCount(col(f)).as("dl"))
      }: _*)).as("fs"))
      .select(col(idCol), col("fs.fid").as("fid"), col("fs.dl").as("dl"))
  }

  /** Build the index for `docs` at `path` (drop-and-recreate — the same
    * destructive contract as `DocumentSink.save` Overwrite, which is
    * what ES's delete-and-bulk-reindex does). Missing `fields` columns
    * are an error; a field the docs lack entirely should not be
    * declared. */
  def build(docs: DataFrame, fields: Seq[String], idCol: String,
            path: String): Unit = {
    require(fields.nonEmpty, "at least one field to index")
    require(!Reserved.contains(idCol),
      s"id column '$idCol' collides with an index-internal name")
    val spark = docs.sparkSession
    postingsOf(docs, fields, idCol)
      .sortWithinPartitions(col("fid"), col("term"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/postings")
    doclensOf(docs, fields, idCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/doclens")
    // derive the stats tables from the WRITTEN postings/doclens (a
    // cheap re-read) rather than recomputing the corpus scan twice
    // postings are unique per (id, fid, term) by construction (the
    // groupBy in postingsOf), so df is a plain count — countDistinct
    // here would add an Expand + second aggregate for nothing
    val p = spark.read.parquet(s"$path/postings")
    p.groupBy(col("fid"), col("term"))
      .agg(count(lit(1)).as("df_t"))
      .sortWithinPartitions(col("fid"), col("term"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/termstats")
    spark.read.parquet(s"$path/doclens")
      .groupBy(col("fid"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/fieldstats")
    writeMeta(path, Meta(idCol, fields))
  }

  /** Probe the index: BM25 (or tf·idf) ranked retrieval over `fields`
    * (empty = every indexed field, in index order), identical in every
    * output bit to [[graft.serving.Search.bm25Fields]] /
    * [[graft.serving.Search.tfidfFields]] over the original corpus —
    * same expression tree, same fixed-order float sums, same rounding —
    * but reading only query-term-sized postings and KB-sized stats. */
  def ranked(spark: SparkSession, path: String, query: String,
             fields: Seq[String] = Nil, limit: Int = 100,
             bm25: Boolean = true, bestFields: Boolean = false,
             boosts: Map[String, Double] = Map.empty,
             after: Option[(Double, Any)] = None,
             afterInclusive: Boolean = false): DataFrame = {
    import graft.serving.Search.{afterPredicate, round4}
    val meta = readMeta(path)
    val idCol = meta.idCol
    val useFields = if (fields.isEmpty) meta.fields else fields
    val fidOf = meta.fields.zipWithIndex.toMap
    val missing = useFields.filterNot(fidOf.contains)
    require(missing.isEmpty, s"fields not in index: ${missing.mkString(", ")}")
    val fids = useFields.map(fidOf)
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    // postings probe: both predicates reach the parquet scan as pushed
    // filters — the surviving rows are (query term × matching doc)-sized
    val p = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(terms.toSeq: _*) &&
        col("fid").isin(fids: _*))
    val stats = spark.read.parquet(s"$path/fieldstats")
      .filter(col("fid").isin(fids: _*))
      .select(col("fid"), col("n"),
        // exact-integer sum ÷ count — the identical double the scan
        // path's sum(tokenCount)/count(*) aggregate produces
        (col("sumdl").cast("double") / col("n")).as("avgdl"))
    val idf = spark.read.parquet(s"$path/termstats")
      .filter(col("term").isin(terms.toSeq: _*) &&
        col("fid").isin(fids: _*))
      .join(broadcast(stats.select(col("fid"), col("n"))), Seq("fid"))
      .select(col("fid"), col("term"),
        if (bm25)
          log(lit(1.0) + (col("n") - col("df_t") + 0.5) /
            (col("df_t") + 0.5)).as("idf")
        else ((col("n") + 1.0) / (col("df_t") + 1.0)).as("idf"))
    val grouped =
      if (bm25)
        p.join(broadcast(stats.select(col("fid"), col("avgdl"))), Seq("fid"))
      else p
    val perTerm: Column =
      if (bm25)
        col("idf") * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / col("avgdl"))))
      else col("tf") * col("idf")
    // per-field score: fixed-order term sum of single-row conditionals —
    // positionally identical to Search.rankedFields.fieldScore
    def fieldScore(i: Int): Column = {
      val raw = terms.toSeq.map(t =>
          coalesce(sum(when(col("term") === t && col("fid") === fids(i),
            perTerm)), lit(0.0)))
        .reduce(_ + _)
      boosts.get(useFields(i)).map(b => raw * b).getOrElse(raw)
    }
    val parts = useFields.indices.map(fieldScore)
    val combined =
      if (parts.size == 1) parts.head
      else if (bestFields) greatest(parts: _*)
      else parts.reduce(_ + _)
    grouped.join(broadcast(idf), Seq("fid", "term"))
      .groupBy(col(idCol))
      .agg(round4(combined).as("score"))
      .filter(afterPredicate(after, col(idCol), afterInclusive))
      .orderBy(col("score").desc, col(idCol))
      .limit(limit)
  }

  /** Incremental maintenance — the index-side twin of
    * [[DocumentSink.upsert]]'s replace-by-id semantics (REST re-sync,
    * reference: src/routes/ticket_routes.py:91-96): documents in `batch`
    * REPLACE same-id documents in the index. Statistics update by
    * integer DELTAS computed from the batch and the removed docs'
    * postings only (never by re-tokenizing the corpus):
    *   df'    = df    − distinct removed ids with term + distinct added
    *   n'     = n     − removed rows + added rows
    *   sumdl' = sumdl − removed dl   + added dl
    * All integer arithmetic, so the upserted index is bit-identical to a
    * full rebuild over the merged corpus. The rewritten tables stage in
    * sibling temp dirs and swap in with [[Lake.swapIn]]'s crash-safe
    * two-rename; at object-store scale the same contract lands on a
    * Delta/Iceberg MERGE. A batch column missing from the index's field
    * list scores as null (the allowMissingColumns union shape). */
  def upsert(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val meta = readMeta(path)
    val idCol = meta.idCol
    val full = meta.fields.foldLeft(batch)((d, f) =>
      if (d.columns.contains(f)) d
      else d.withColumn(f, lit(null).cast("string")))
    val keys = full.select(col(idCol)).distinct()
    val newPost = postingsOf(full, meta.fields, idCol)
    val newLens = doclensOf(full, meta.fields, idCol)
    val oldPost = spark.read.parquet(s"$path/postings")
    val oldLens = spark.read.parquet(s"$path/doclens")
    val remPost = oldPost.join(keys, Seq(idCol), "left_semi")
    val remLens = oldLens.join(keys, Seq(idCol), "left_semi")
    // ---- integer deltas ------------------------------------------------
    // same uniqueness argument as in build: one posting row per
    // (id, fid, term) on both the new and removed sides
    val dfDelta = newPost.groupBy(col("fid"), col("term"))
      .agg(count(lit(1)).as("d"))
      .unionByName(remPost.groupBy(col("fid"), col("term"))
        .agg((-count(lit(1))).as("d")))
      .groupBy(col("fid"), col("term")).agg(sum(col("d")).as("d"))
    val termstats2 = spark.read.parquet(s"$path/termstats")
      .join(dfDelta, Seq("fid", "term"), "full")
      .select(col("fid"), col("term"),
        (coalesce(col("df_t"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .cast("long").as("df_t"))
      .filter(col("df_t") > 0)
    val lenDelta = newLens.groupBy(col("fid"))
      .agg(count(lit(1)).as("dn"),
        coalesce(sum(col("dl")), lit(0L)).as("dsum"))
      .unionByName(remLens.groupBy(col("fid"))
        .agg((-count(lit(1))).as("dn"),
          (-coalesce(sum(col("dl")), lit(0L))).as("dsum")))
      .groupBy(col("fid"))
      .agg(sum(col("dn")).as("dn"), sum(col("dsum")).as("dsum"))
    val fieldstats2 = spark.read.parquet(s"$path/fieldstats")
      .join(lenDelta, Seq("fid"), "left")
      .select(col("fid"),
        (col("n") + coalesce(col("dn"), lit(0L))).cast("long").as("n"),
        (coalesce(col("sumdl"), lit(0L)) + coalesce(col("dsum"), lit(0L)))
          .cast("long").as("sumdl"))
    val postings2 = oldPost.join(keys, Seq(idCol), "left_anti")
      .unionByName(newPost)
    val doclens2 = oldLens.join(keys, Seq(idCol), "left_anti")
      .unionByName(newLens)
    // ---- stage everything, then swap (writes read the old files) ------
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val staged = Seq(
      "postings" -> postings2.sortWithinPartitions(col("fid"), col("term")),
      "doclens" -> doclens2,
      "termstats" -> termstats2.sortWithinPartitions(col("fid"), col("term")),
      "fieldstats" -> fieldstats2
    ).map { case (name, df) =>
      val tmp =
        s"$path/.${name}_tmp_${java.util.UUID.randomUUID().toString.take(8)}"
      df.write.mode(SaveMode.Overwrite).parquet(tmp)
      name -> tmp
    }
    staged.foreach { case (name, tmp) =>
      Lake.swapIn(fs, new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$path/$name"))
    }
  }

  /** Does `path` hold an index (sidecar present)? Upsert hooks use this
    * to maintain an index only where one was built. */
  def exists(path: String): Boolean =
    Files.exists(Paths.get(s"$path/_index_meta.json"))

  private def writeMeta(path: String, meta: Meta): Unit = {
    val json = s"""{"id_col": "${meta.idCol}", "fields": [${
      meta.fields.map(f => s""""$f"""").mkString(", ")}], "version": 1}"""
    val p = Paths.get(s"$path/_index_meta.json")
    Files.createDirectories(p.getParent)
    Files.write(p, json.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def readMeta(path: String): Meta = {
    val json = new String(
      Files.readAllBytes(Paths.get(s"$path/_index_meta.json")),
      StandardCharsets.UTF_8)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val fields = (0 until node.get("fields").size())
      .map(node.get("fields").get(_).asText())
    Meta(node.get("id_col").asText(), fields)
  }
}

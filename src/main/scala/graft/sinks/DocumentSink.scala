package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener

/** The engine's document sink — the Spark-native replacement for the
  * reference's Elasticsearch connector (reference: src/es_connector.py:
  * 21-95: index create/delete with mapping DDL, single + bulk index with
  * partial-failure tolerance, count verification).
  *
  * In this offline lake the "index" is a parquet directory plus two
  * sidecars:
  *   - `_mapping.json` — the ES-style typed mapping derived from the
  *     DataFrame schema (the moral equivalent of the reference's
  *     hand-maintained mapping dicts, src/ticket_sync.py:29-62, and its
  *     SQL-type→ES-type cascade, data_lake_sync.py:94-117 — except
  *     derived, so it can never drift),
  *   - `_meta.json` — doc count + write mode for count verification
  *     (reference: src/es_connector.py:76-83).
  *
  * Semantics preserved from the reference:
  *   - drop-and-recreate ⇒ `SaveMode.Overwrite` (src/es_connector.py:23-25
  *     deletes the index if it exists) — destructive, kept explicit;
  *   - append-only historized sync vs upsert-by-id: the *caller* chooses
  *     the id strategy ([[DocId]]); `Upsert` lands the batch as an
  *     O(request) LSM delta generation resolved latest-wins at read
  *     time and folded into the base by threshold compaction (see the
  *     log-structured-store section — at scale the same logical
  *     contract is a Delta/Iceberg MERGE);
  *   - bulk partial-failure side-channel (src/es_connector.py:62-68
  *     `raise_on_error=False`) ⇒ [[validatedWrite]] splits invalid rows
  *     to a quarantine directory instead of failing the job.
  *
  * Scale: a write is executor-parallel (one file per partition, no
  * driver materialization); row counts come from an `observe` metric on
  * the write job itself — never from re-reading what was just written
  * (which, for an Append-mode index, would re-scan every prior
  * generation: a second full-index pass per write at 100 TB). The
  * mapping/meta sidecars are driver-side metadata only. Partition count
  * = upstream partitioning — callers repartition by the sink's read
  * pattern, not here.
  */
object DocumentSink {

  /** Document-id strategies (reference: content hash
    * data_lake_sync.py:72-82; `{id}_{ts}` src/ticket_sync.py:138; bare id
    * upsert src/routes/ticket_routes.py:91-96). */
  sealed trait DocId
  case object ContentHash extends DocId
  final case class IdTimestamp(idCol: String, runTs: String) extends DocId
  final case class BareId(idCol: String) extends DocId

  /** Add the `document_id` column per strategy. Content hash covers every
    * column (same record+state ⇒ same id ⇒ idempotent re-syncs). */
  def withDocId(df: DataFrame, strategy: DocId): DataFrame = strategy match {
    case ContentHash =>
      df.withColumn("document_id",
        md5(to_json(struct(df.columns.toSeq.map(col): _*))))
    case IdTimestamp(idCol, runTs) =>
      df.withColumn("document_id", concat_ws("_", col(idCol), lit(runTs)))
    case BareId(idCol) =>
      df.withColumn("document_id", col(idCol).cast("string"))
  }

  /** Spark type → ES-style mapping type (the reference's substring
    * cascade, data_lake_sync.py:101-110, made total and typed). Spark
    * collapses the reference's varchar/text/json SQL-type distinction
    * into one StringType, so the string-column split (varchar→`keyword`,
    * text→`text`, json→`object`) is carried by per-field overrides —
    * see [[mappingJson]] and [[graft.catalog.EntityCatalog.fieldTypes]].
    * A bare string with no hint maps to `text`, the reference's own
    * fallback arm. */
  def esType(dt: DataType): String = dt match {
    case StringType => "text"
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "integer"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType | _: DecimalType => "double"
    case DateType | TimestampType | TimestampNTZType => "date"
    case BinaryType => "binary"
    case _: ArrayType | _: MapType | _: StructType => "object"
    case _ => "text"
  }

  /** Full field mapping for one column, recursing into structure the way
    * ES does (reference labels mapping, src/ticket_sync.py:44-49):
    * array-of-struct → `nested` + recursive properties, struct →
    * `object` + recursive properties, scalar array → the element type
    * (ES arrays are implicit — every field may be multi-valued). */
  def fieldMapping(dt: DataType): String = dt match {
    case ArrayType(st: StructType, _) =>
      s"""{"type": "nested", "properties": ${properties(st)}}"""
    case st: StructType =>
      s"""{"type": "object", "properties": ${properties(st)}}"""
    case ArrayType(el, _) => fieldMapping(el)
    case other => s"""{"type": "${esType(other)}"}"""
  }

  private def properties(st: StructType): String =
    st.fields.map(f => s""""${f.name}": ${fieldMapping(f.dataType)}""")
      .mkString("{", ", ", "}")

  /** ES-style mapping JSON for `schema`; `fieldTypes` overrides the
    * derived type per column name (the varchar→keyword / json→object
    * fidelity the schema alone cannot express). An override wins
    * wholesale — it names leaf-typed fields, never structured ones. */
  def mappingJson(schema: StructType,
                  fieldTypes: Map[String, String] = Map.empty): String =
    schema.fields.map(f =>
      s""""${f.name}": ${
        fieldTypes.get(f.name).map(t => s"""{"type": "$t"}""")
          .getOrElse(fieldMapping(f.dataType))}""")
      .mkString("{\"properties\": {", ", ", "}}")

  /** Rows written by THIS call, counted from the write job itself via a
    * `Dataset.observe` metric — the write's own CollectMetrics node, no
    * post-write re-scan. The listener bus is asynchronous, so the metric
    * is awaited briefly; if it never arrives the count falls back to a
    * directory read (correctness over speed, and only on that error
    * path). */
  private def writeCounted(df: DataFrame, dataPath: String,
                           mode: SaveMode,
                           partitionCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val metricName =
      "graft_rows_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val counted = new java.util.concurrent.atomic.AtomicLong(-1L)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get(metricName).foreach { row =>
          counted.set(row.getLong(0)); latch.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val w = df.observe(metricName,
          org.apache.spark.sql.functions.count(lit(1)).as("rows"))
        .write.mode(mode)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*)
       else w).parquet(dataPath)
      latch.await(10, java.util.concurrent.TimeUnit.SECONDS)
      ()
    } finally spark.listenerManager.unregister(listener)
    if (counted.get() >= 0) counted.get()
    else spark.read.parquet(dataPath).count()
  }

  /** Write `df` as an index at `path`. Overwrite = the reference's
    * drop-and-recreate; Append = historized sync runs. Returns the doc
    * count written BY THIS CALL (`bulk_index`'s success count); for the
    * whole-index total under Append use [[count]]. `fieldTypes` refines
    * the sidecar mapping per column (keyword/text/object — see
    * [[esType]]). */
  def save(df: DataFrame, path: String,
           mode: SaveMode = SaveMode.Overwrite,
           fieldTypes: Map[String, String] = Map.empty,
           bucketByDocId: Boolean = false): Long = {
    // drop-and-recreate DROPS pending API-write deltas too — that is
    // the declared semantics (the reference deletes the ES index);
    // Append (historized sync, ids unique by construction) leaves
    // them in place
    if (mode == SaveMode.Overwrite) {
      val fs = hadoopFs(df.sparkSession, path)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/data_delta"), true)
      ()
    }
    // `_bucket` is the store's internal layout column — a document
    // field by that name would be hijacked as the partition column
    // and then silently dropped from every read: reserved, like
    // _op/_seq on the delta line
    require(!df.columns.contains("_bucket"),
      "_bucket is a reserved store-layout column name")
    // the base goes BUCKETED (hive-partitioned on the id hash) when
    // an OVERWRITE opts in (API-writable stores — upsert bootstrap;
    // compaction writes the layout itself) or when APPENDING to an
    // already-bucketed base (a flat append into a partitioned
    // directory would corrupt the layout — and symmetrically, an
    // Append NEVER introduces bucketing onto a flat base: it follows
    // whatever layout exists); the batch-sync default stays flat
    val bucketed =
      (if (mode == SaveMode.Append) storeBuckets(path).isDefined
       else bucketByDocId) &&
        df.columns.contains("document_id")
    val n =
      if (!bucketed) {
        if (mode == SaveMode.Overwrite)
          java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(s"$path/_layout.json"))
        writeCounted(df, s"$path/data", mode)
      } else {
        val buckets =
          (if (mode == SaveMode.Append) storeBuckets(path) else None)
            .getOrElse(StoreBuckets)
        val c = writeCounted(
          df.withColumn("_bucket",
            pmod(hash(col("document_id")), lit(buckets))),
          s"$path/data", mode, partitionCols = Seq("_bucket"))
        writeSidecar(s"$path/_layout.json",
          s"""{"buckets": $buckets}""")
        c
      }
    writeSidecar(s"$path/_mapping.json", mappingJson(df.schema, fieldTypes))
    writeSidecar(s"$path/_meta.json",
      s"""{"doc_count": $n, "mode": "${mode.name.toLowerCase}"}""")
    // write-time search-index maintenance (ES builds its inverted index
    // inside bulk_index — src/es_connector.py:51-74): an adjacent index
    // previously built by SearchIndex.build stays in lockstep with the
    // documents — rebuilt on Overwrite (the docs were replaced), delta-
    // updated on Append (historized ids are unique, so upsert = add)
    val idx = s"$path/_search_index"
    if (SearchIndex.exists(idx)) {
      val meta = SearchIndex.readMeta(idx)
      if (mode == SaveMode.Append) SearchIndex.upsert(df, idx)
      else SearchIndex.build(df, meta.fields, meta.idCol, idx,
        meta.analyzer, meta.custom, meta.searchAnalyzer)
    }
    n
  }

  /** Bulk write with the reference's partial-failure contract: rows
    * failing `requiredCols` non-null validation go to `path/_errors`
    * instead of failing the job; returns (successCount, failedCount)
    * for THIS batch exactly like `bulk_index` (src/es_connector.py:
    * 51-74) — both counts ride the write jobs' observe metrics, neither
    * directory is re-read. An empty `requiredCols` means every row is
    * valid (fold from `lit(true)`). */
  def validatedWrite(df: DataFrame, path: String,
                     requiredCols: Seq[String],
                     mode: SaveMode = SaveMode.Overwrite,
                     fieldTypes: Map[String, String] = Map.empty): (Long, Long) = {
    val okPred = requiredCols.foldLeft(lit(true))(_ && col(_).isNotNull)
    val ok = df.filter(okPred)
    val bad = df.filter(!okPred)
    val n = save(ok, path, mode, fieldTypes)
    val nBad = writeCounted(bad, s"$path/_errors", mode)
    (n, nBad)
  }

  /** The bucket count of the store's CURRENT base layout (the
    * `_layout.json` sidecar written beside a hive-partitioned base),
    * or None for the flat layout. The sidecar — not a constant — is
    * what the probes hash against, so changing [[StoreBuckets]]
    * across versions can never mis-route a probe on an older
    * store's layout. */
  private[graft] def storeBuckets(path: String): Option[Int] = {
    val p = Paths.get(s"$path/_layout.json")
    if (!Files.exists(p)) None
    else "\"buckets\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(new String(Files.readAllBytes(p), "UTF-8"))
      .map(_.group(1).toInt)
  }

  /** Buckets the store's base by `document_id` — write once, prune
    * every point probe after. 32 suits the request-sized id lists of
    * the API write path at any store size the tests run; a 100 TB
    * deployment sizes it so one bucket is a few hundred MB (the same
    * rule as [[Lake.writeBucketed]]) — the sidecar, not this
    * constant, governs existing layouts. */
  private[graft] val StoreBuckets = 32

  // ---- the LOG-STRUCTURED store (round 17) -------------------------
  //
  // Until round 16, [[upsert]]/[[deleteByIds]] rewrote the ENTIRE
  // store per API write (left-anti + union + crash-safe swap) —
  // correct, but O(store) per request: the exact cost class the
  // `_versions` sidecar escaped in round 16. The store now rides the
  // same LSM shape: each write request stages its batch to a temp dir
  // and lands it as ONE atomically-renamed delta GENERATION under
  // `{path}/data_delta/delta-NNNNNN` (doc columns + `_op`
  // upsert|delete + `_seq`, the generation's monotonic number) —
  // O(request) written bytes. The current document line is
  //
  //   base `data`  minus  delta-touched ids  union  the latest
  //   generation's rows per id (tombstones drop the id),
  //
  // resolved by [[readOpt]]: the delta side is at most
  // [[StoreCompactThreshold]] request-sized generations, so the
  // resolve is a BROADCAST anti-join against the base scan — one
  // pass, no corpus shuffle, and the zero-delta fast path is the
  // plain base read. Once the threshold accumulates, the write folds
  // the line into a new base through [[Lake.swapIn]]'s crash-safe
  // two-rename and clears the deltas. Crash windows are benign: a
  // crash before the delta rename leaves an invisible dot-dir; after
  // the compaction swap but before the delta delete, the deltas
  // REPLAY idempotently (latest-generation-wins is unchanged when the
  // base already equals the fold). On object stores without atomic
  // rename the same logical contract lands on a Delta/Iceberg table.

  /** Delta generations folded into the base per compaction — bounds
    * both the per-request write cost (one staged rename) and the
    * read fan-in (at most this many request-sized generations beside
    * one base snapshot). */
  private[graft] val StoreCompactThreshold = 16

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession,
                       p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def deltaGens(fs: org.apache.hadoop.fs.FileSystem,
                        deltaRoot: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(deltaRoot)) Seq.empty
    else fs.listStatus(deltaRoot).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta-"))
      .map(_.getPath.getName.stripPrefix("delta-").toLong)

  /** The CURRENT document line of the store at `path` — base ∪ delta
    * generations with the latest generation winning per document_id
    * and delete tombstones dropped — or None iff nothing was ever
    * written. Zero deltas (a freshly-synced or just-compacted store)
    * is the fast path: the plain base read, no joins.
    *
    * SCHEMA semantics (decided round 18): the line is the
    * union-by-name of every live generation, so a column whose last
    * carrier was deleted SURVIVES as nulls — through compaction
    * (the fold rewrites the resolved line, nulls included) until an
    * explicit drop-and-recreate resets the store. This is
    * deliberately the ES mapping contract: an ES mapping never
    * loses a field once added, and deleting the docs that carried
    * it leaves the field in the mapping. The alternative —
    * projecting reads to the `_mapping.json` field list so departed
    * columns vanish — was considered and rejected: it would make
    * the read depend on a sidecar that is advisory metadata
    * everywhere else, and would DIVERGE from ES. Spec-pinned in
    * DocumentSinkSpec ("refresh the mapping sidecar" test). */
  def readOpt(spark: org.apache.spark.sql.SparkSession,
              path: String): Option[DataFrame] = {
    val fs = hadoopFs(spark, path)
    val bp = new org.apache.hadoop.fs.Path(s"$path/data")
    val dp = new org.apache.hadoop.fs.Path(s"$path/data_delta")
    val hasBase = fs.exists(bp)
    val hasDelta = deltaGens(fs, dp).nonEmpty
    if (!hasBase && !hasDelta) return None
    // a bucketed base carries its hash-partition column — an
    // internal layout detail, never part of the document line
    def baseDf = spark.read.parquet(bp.toString).drop("_bucket")
    if (!hasDelta) return Some(baseDf)
    // generations are request-sized and bounded by the compaction
    // threshold — everything delta-side is SMALL
    val deltas = spark.read.option("recursiveFileLookup", "true")
      .option("mergeSchema", "true").parquet(dp.toString)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("document_id"))
    val winners = deltas
      .withColumn("_wseq", max(col("_seq")).over(w))
      .filter(col("_seq") === col("_wseq") && col("_op") === "upsert")
      .drop("_op", "_seq", "_wseq")
    val touched = deltas.select("document_id").distinct()
    if (!hasBase) return Some(winners)
    Some(baseDf
      .join(broadcast(touched), Seq("document_id"), "left_anti")
      .unionByName(winners, allowMissingColumns = true))
  }

  /** [[readOpt]] for a store known to exist. */
  def read(spark: org.apache.spark.sql.SparkSession,
           path: String): DataFrame =
    readOpt(spark, path).getOrElse(
      throw new IllegalStateException(s"no document store at $path"))

  /** The store's current doc count as the LAST WRITER recorded it —
    * the arithmetic the O(request) write path maintains. A sidecar
    * written by an Append-mode batch sync records only that call's
    * rows, so it cannot seed the arithmetic — fall back to one
    * resolved count (and the next write re-records the total). */
  private def metaDocCount(spark: org.apache.spark.sql.SparkSession,
                           path: String): Long = {
    val p = Paths.get(s"$path/_meta.json")
    val parsed =
      if (!Files.exists(p)) None
      else {
        val s = new String(Files.readAllBytes(p), "UTF-8")
        if (!s.contains("\"mode\": \"overwrite\"")) None
        else "\"doc_count\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s)
          .map(_.group(1).toLong)
      }
    parsed.getOrElse(read(spark, path).count())
  }

  /** Stage `df` (already carrying `_op`/`_seq`) and land it as delta
    * generation `seq` with ONE atomic rename. Returns the row count
    * (from the staging write's own observe metric). */
  private def appendDelta(df: DataFrame, path: String,
                          seq: Long): Long = {
    val spark = df.sparkSession
    val fs = hadoopFs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/.delta_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val n = writeCounted(df, tmp.toString, SaveMode.Overwrite)
    val root = new org.apache.hadoop.fs.Path(s"$path/data_delta")
    fs.mkdirs(root)
    val dest = new org.apache.hadoop.fs.Path(root, f"delta-$seq%06d")
    // collision guard: the store is single-writer by contract (the
    // HTTP layer's write lock; batch sync is one process), but a
    // second writer racing the same seq must fail LOUD — Hadoop
    // rename onto an existing directory NESTS the source inside it
    // and returns true, which would silently lose this batch
    if (fs.exists(dest) || !fs.rename(tmp, dest) ||
        fs.exists(new org.apache.hadoop.fs.Path(dest, tmp.getName)))
      throw new IllegalStateException(
        s"delta generation collision or rename failure at $dest " +
        "(concurrent writer? the store is single-writer)")
    n
  }

  /** Fold the delta generations into a new base once the threshold
    * accumulates: resolved line → staged write → [[Lake.swapIn]] →
    * clear deltas. The fold's own count re-records the exact total
    * (healing any arithmetic lost to a crashed sidecar write). The
    * new base is written BUCKETED on the id hash (preserving — or,
    * for a pre-round-18 flat store, establishing — the layout the
    * write-path probes prune against). */
  private def compactStoreIfNeeded(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = hadoopFs(spark, path)
    val dp = new org.apache.hadoop.fs.Path(s"$path/data_delta")
    if (deltaGens(fs, dp).size < StoreCompactThreshold) return
    val line = read(spark, path)
    val buckets = storeBuckets(path).getOrElse(StoreBuckets)
    val tmp =
      s"$path/.data_tmp_${java.util.UUID.randomUUID().toString.take(8)}"
    val n = writeCounted(
      line.withColumn("_bucket",
        pmod(hash(col("document_id")), lit(buckets))),
      tmp, SaveMode.Overwrite, partitionCols = Seq("_bucket"))
    Lake.swapIn(fs, new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$path/data"))
    fs.delete(dp, true)
    writeSidecar(s"$path/_layout.json", s"""{"buckets": $buckets}""")
    writeSidecar(s"$path/_meta.json",
      s"""{"doc_count": $n, "mode": "overwrite"}""")
  }

  /** Does ANY generation of the store exist (base or delta)? The
    * cheap existence test upsert's bootstrap decision needs —
    * [[readOpt]] answers the same question but builds the whole
    * resolved-line plan to do it. */
  private def storeExists(spark: org.apache.spark.sql.SparkSession,
                          path: String): Boolean = {
    val fs = hadoopFs(spark, path)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/data")) ||
      deltaGens(fs,
        new org.apache.hadoop.fs.Path(s"$path/data_delta")).nonEmpty
  }

  /** The probe frame behind [[idsInLineCount]] — exposed for the
    * plan pin in DocumentSinkSpec: the store's document line bounded
    * to delta generations strictly below `belowSeq`, RESTRICTED to
    * `ids`. Request-bounded by construction (the id list came off a
    * landed request-sized delta); on a BUCKETED base the probe adds
    * the ids' hash-bucket partition predicate, so the scan prunes to
    * the touched buckets at PLANNING time — a point lookup, not a
    * base scan. On the flat layout the id predicate still pushes to
    * the parquet scan (row-group pruning), just without directory
    * pruning. */
  private[graft] def idsInLineFrame(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ids: Seq[String], belowSeq: Long): DataFrame = {
    val fs = hadoopFs(spark, path)
    val deltaRoot = new org.apache.hadoop.fs.Path(s"$path/data_delta")
    val gens = deltaGens(fs, deltaRoot).filter(_ < belowSeq)
    val bp = new org.apache.hadoop.fs.Path(s"$path/data")
    val idPred = col("document_id").isin(ids: _*)
    val base: Option[DataFrame] =
      if (!fs.exists(bp)) None
      else {
        val b0 = spark.read.parquet(bp.toString)
        val b1 = (b0.columns.contains("_bucket"), storeBuckets(path)) match {
          case (true, Some(n)) =>
            // the ids' buckets, hashed with the SAME expression the
            // writer used — a request-sized local job, never a guess
            val bs = spark.createDataset(ids)(
                org.apache.spark.sql.Encoders.STRING)
              .select(pmod(hash(col("value")), lit(n)).as("b"))
              .distinct().collect().map(_.getInt(0)).toSeq
            b0.filter(col("_bucket").isInCollection(bs) && idPred)
              .drop("_bucket")
          case (true, None) =>
            // layout sidecar lost: fall back to the unpruned (still
            // pushdown-filtered) scan — correct, just not pruned
            b0.filter(idPred).drop("_bucket")
          case _ => b0.filter(idPred)
        }
        Some(b1.select("document_id"))
      }
    if (gens.isEmpty)
      return base.getOrElse(
        spark.emptyDataFrame.withColumn("document_id", lit("")).limit(0))
    val deltas = spark.read.option("mergeSchema", "true")
      .parquet(gens.map(g =>
        s"$path/data_delta/" + f"delta-$g%06d"): _*)
      .filter(idPred)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("document_id"))
    val winners = deltas
      .withColumn("_wseq", max(col("_seq")).over(w))
      .filter(col("_seq") === col("_wseq") && col("_op") === "upsert")
      .select("document_id")
    val touched = deltas.select("document_id").distinct()
    base.map(_.join(broadcast(touched), Seq("document_id"), "left_anti")
        .unionByName(winners))
      .getOrElse(winners)
  }

  /** How many of `ids` exist in the store's line as of just BEFORE
    * delta generation `belowSeq` — the count upsert's `replaced` and
    * deleteByIds' `deleted` contracts need, computed AFTER the new
    * generation landed (the batch may be a lazy plan over the line,
    * so nothing can be counted before the append evaluates it) by
    * reading only the PRIOR generations plus the id-restricted base. */
  private def idsInLineCount(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ids: Seq[String], belowSeq: Long): Long =
    idsInLineFrame(spark, path, ids, belowSeq).count()

  /** Upsert by `document_id`: replace existing docs sharing an id
    * with the incoming batch (REST per-record re-sync semantics,
    * src/routes/ticket_routes.py:91-96). O(request): the batch lands
    * as ONE delta generation ([[appendDelta]] — which also EVALUATES
    * a batch that is a lazy plan over the current line, e.g.
    * update_by_query's rewrite, before anything moves). The count
    * contract (docs after merge) rides an id-list-bounded probe of
    * the pre-append line ([[idsInLineFrame]]): since round 18 the
    * base written by bootstrap/compaction is hive-BUCKETED on
    * `pmod(hash(document_id), buckets)`, so the probe's scan prunes
    * to the request ids' buckets at PLANNING time — the columnar
    * point lookup ES does internally, O(request) instead of
    * O(base-scan) per API write (plan-pinned in DocumentSinkSpec).
    * The adjacent search index delta-updates from the landed
    * generation's stable files (a crash in between leaves the index
    * one consistent snapshot behind, never ahead). */
  def upsert(batch: DataFrame, path: String): Long = {
    val spark = batch.sparkSession
    require(!batch.columns.contains("_op") &&
      !batch.columns.contains("_seq") &&
      !batch.columns.contains("_bucket"),
      "_op/_seq/_bucket are reserved store column names")
    if (!storeExists(spark, path)) {
      // bootstrap: the batch IS the store — a base write, BUCKETED
      // (this store takes API writes by definition of this call)
      return save(batch, path, bucketByDocId = true)
    }
    val fs = hadoopFs(spark, path)
    val deltaRoot = new org.apache.hadoop.fs.Path(s"$path/data_delta")
    val prevTotal = metaDocCount(spark, path)
    val seq = (deltaGens(fs, deltaRoot) :+ 0L).max + 1
    val bCount = appendDelta(
      batch.withColumn("_op", lit("upsert"))
        .withColumn("_seq", lit(seq)),
      path, seq)
    val landed = spark.read.parquet(
      s"$path/data_delta/" + f"delta-$seq%06d")
    val idList = landed.select("document_id").distinct()
      .collect().map(r => String.valueOf(r.get(0))).toSeq
    val replaced = idsInLineCount(spark, path, idList, belowSeq = seq)
    val n = prevTotal - replaced + bCount
    writeSidecar(s"$path/_mapping.json",
      mappingJson(read(spark, path).schema))
    writeSidecar(s"$path/_meta.json",
      s"""{"doc_count": $n, "mode": "overwrite"}""")
    val idxPath = s"$path/_search_index"
    if (SearchIndex.exists(idxPath))
      SearchIndex.upsert(landed.drop("_op", "_seq"), idxPath)
    else if (SearchIndex.staleVersion(idxPath)) {
      // a PRE-CURRENT-VERSION index (retired token grammar) no longer
      // `exists` — rebuild it from the current line with its own
      // field list instead of silently orphaning it
      val meta = SearchIndex.readMeta(idxPath)
      SearchIndex.build(read(spark, path), meta.fields, meta.idCol,
        idxPath, meta.analyzer, meta.custom, meta.searchAnalyzer)
    }
    compactStoreIfNeeded(spark, path)
    n
  }

  /** Delete-by-ids — `_delete_by_query`'s storage half: land the ids
    * as a TOMBSTONE delta generation (O(request), like [[upsert]])
    * and subtract them from the adjacent search index through the
    * SAME integer-delta machinery replaced docs use
    * ([[SearchIndex.upsert]] with a deletes frame). Returns the count
    * AFTER deletion. `ids` must be the single `document_id` column. */
  def deleteByIds(ids: DataFrame, path: String): Long = {
    val spark = ids.sparkSession
    val fs = hadoopFs(spark, path)
    val deltaRoot = new org.apache.hadoop.fs.Path(s"$path/data_delta")
    val prevTotal = metaDocCount(spark, path)
    val seq = (deltaGens(fs, deltaRoot) :+ 0L).max + 1
    appendDelta(
      ids.select("document_id").distinct()
        .withColumn("_op", lit("delete"))
        .withColumn("_seq", lit(seq)),
      path, seq)
    val landed = spark.read.parquet(
      s"$path/data_delta/" + f"delta-$seq%06d")
    val idList = landed.select("document_id")
      .collect().map(r => String.valueOf(r.get(0))).toSeq
    val deleted = idsInLineCount(spark, path, idList, belowSeq = seq)
    val n = prevTotal - deleted
    // the mapping sidecar tracks the RESOLVED line's schema — which,
    // per the union-by-name decision on [[readOpt]], RETAINS a
    // column whose last carrier was just deleted (ES: a mapping
    // never loses fields); the rewrite here keeps the sidecar in
    // lockstep with whatever the line answers
    writeSidecar(s"$path/_mapping.json",
      mappingJson(read(spark, path).schema))
    writeSidecar(s"$path/_meta.json",
      s"""{"doc_count": $n, "mode": "overwrite"}""")
    val idxPath = s"$path/_search_index"
    if (SearchIndex.exists(idxPath))
      SearchIndex.upsert(read(spark, path).limit(0),
        Some(landed.select("document_id")), idxPath)
    else if (SearchIndex.staleVersion(idxPath)) {
      val meta = SearchIndex.readMeta(idxPath)
      SearchIndex.build(read(spark, path), meta.fields, meta.idCol,
        idxPath, meta.analyzer, meta.custom, meta.searchAnalyzer)
    }
    compactStoreIfNeeded(spark, path)
    n
  }

  /** Count verification (reference: src/es_connector.py:76-83) —
    * counts the RESOLVED line (base ∪ deltas). */
  def count(spark: org.apache.spark.sql.SparkSession, path: String): Long =
    read(spark, path).count()

  // ---- per-document version metadata (ES `_version`/`_seq_no` wire) ----
  //
  // ES clients — including the reference's own bulk consumer
  // (src/es_connector.py:51-74 via elasticsearch.helpers.bulk) — read
  // `_version` from write-op responses for optimistic concurrency, and
  // `_seq_no`/`_primary_term` for compare-and-swap writes. Here that
  // metadata lives in a sidecar parquet table `{path}/_versions`
  // (document_id, version, seq_no) plus `{path}/_versions_meta.json`
  // holding the index's next sequence number — INDEX metadata, like
  // ES's per-doc version in Lucene, never columns of the synced store,
  // so the sync pipeline's schema and every oracle stay untouched.
  // Deleted ids keep a TOMBSTONE row (ES keeps version tombstones for
  // `index.gc_deletes`, default 60 s; here: until the next sync
  // rebuild), so a re-created id continues its version line instead of
  // restarting at 1. A doc written by the batch sync with no sidecar
  // row is version 1. Reads are request-bounded (filter by the
  // request's id list — a semi-join, never a corpus collect).
  //
  // The sidecar is LOG-STRUCTURED (ES's translog-then-merge shape):
  // each write request APPENDS one request-sized parquet file to
  // `_versions_delta` — O(request), not O(store) — and the current
  // line is base ∪ deltas with the highest seq_no winning per id
  // (seq_nos are index-monotonic, so max-seq IS latest). Once
  // [[VersionsCompactThreshold]] delta files accumulate, the write
  // folds them into the `_versions` base through the same crash-safe
  // [[Lake.swapIn]] two-rename as the store itself and clears the
  // delta dir. Crash windows are benign by construction: versions
  // write AFTER the data swap (one snapshot behind, never ahead);
  // a crash between the compaction swap and the delta delete leaves
  // deltas that REPLAY idempotently (max-seq per id is unchanged).

  /** Current versions for the given ids: id → (version, seq_no).
    * Absent key = the id has never been written through the
    * version-aware wire. */
  def readVersions(spark: org.apache.spark.sql.SparkSession, path: String,
                   ids: Seq[String]): Map[String, (Long, Long)] = {
    if (ids.isEmpty) return Map.empty
    // Missing sidecar = never versioned; any OTHER read failure
    // (corrupt parquet, transient IO) must propagate — silently
    // restarting version lines at the base would answer wrong
    // _version values instead of failing the request.
    versionLine(spark, path,
        df => df.filter(col("document_id").isin(ids: _*))) match {
      case None => Map.empty
      case Some(df) =>
        df.collect()
          .map(r => String.valueOf(r.getAs[Any]("document_id")) ->
            ((r.getAs[Long]("version"), r.getAs[Long]("seq_no")))).toMap
    }
  }

  /** Delta files folded into the base per compaction — the knob that
    * bounds both the per-request write cost (always O(request): one
    * appended file) and the read fan-in (at most this many small
    * delta files beside one base snapshot). */
  private[graft] val VersionsCompactThreshold = 16

  /** The CURRENT version line (base snapshot ∪ append-only deltas,
    * max seq_no winning per id), or None iff the store has never been
    * versioned. `pre` narrows BOTH sides BEFORE the latest-wins
    * reduce — the id-list pushdown that keeps reads request-bounded. */
  private def versionLine(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          pre: org.apache.spark.sql.DataFrame =>
                               org.apache.spark.sql.DataFrame =
                            identity): Option[
      org.apache.spark.sql.DataFrame] = {
    val conf = spark.sessionState.newHadoopConf()
    val bp = new org.apache.hadoop.fs.Path(s"$path/_versions")
    val dp = new org.apache.hadoop.fs.Path(s"$path/_versions_delta")
    val fs = bp.getFileSystem(conf)
    val sides = Seq(bp, dp).filter(fs.exists)
      .map(p => pre(spark.read.parquet(p.toString)))
    if (sides.isEmpty) None
    else Some(sides.reduce(_.unionByName(_))
      .groupBy(col("document_id"))
      .agg(max(struct(col("seq_no"), col("version"))).as("_vs"))
      .select(col("document_id"),
        col("_vs.version").as("version"),
        col("_vs.seq_no").as("seq_no")))
  }

  /** The index's next `_seq_no` (monotonic per index, like ES's
    * per-shard sequence). 0 for a never-versioned index. */
  def nextSeqNo(path: String): Long = {
    val p = Paths.get(s"$path/_versions_meta.json")
    if (!Files.exists(p)) 0L
    else "\"next_seq_no\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(new String(Files.readAllBytes(p), "UTF-8"))
      .map(_.group(1).toLong).getOrElse(0L)
  }

  /** Replace-by-id the given ids' version rows and advance the
    * sequence counter. `entries`: id → (new version, seq_no of its
    * latest op this batch). O(request) on the write path: the batch
    * APPENDS one delta file; only every [[VersionsCompactThreshold]]th
    * call pays the base fold (amortized O(store / threshold)). */
  def writeVersions(spark: org.apache.spark.sql.SparkSession, path: String,
                    entries: Map[String, (Long, Long)],
                    nextSeq: Long): Unit = {
    if (entries.nonEmpty) {
      val schema = StructType(Seq(
        StructField("document_id", StringType, nullable = false),
        StructField("version", LongType, nullable = false),
        StructField("seq_no", LongType, nullable = false)))
      val rows = entries.toSeq.map { case (id, (v, s)) =>
        org.apache.spark.sql.Row(id, v, s) }
      val batch = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      val dp = new org.apache.hadoop.fs.Path(s"$path/_versions_delta")
      batch.coalesce(1).write.mode(SaveMode.Append).parquet(dp.toString)
      compactVersionsIfNeeded(spark, path)
    }
    writeSidecar(s"$path/_versions_meta.json",
      s"""{"next_seq_no": $nextSeq}""")
  }

  /** Fold the delta log into the `_versions` base once enough delta
    * files accumulate: materialize the current line (latest seq wins
    * — a corrupt base or delta fails the fold rather than silently
    * dropping version rows), swap it in as the new base, then clear
    * the deltas. A crash after the swap leaves deltas that replay
    * idempotently against the new base. */
  private def compactVersionsIfNeeded(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dp = new org.apache.hadoop.fs.Path(s"$path/_versions_delta")
    val fs = dp.getFileSystem(conf)
    if (!fs.exists(dp)) return
    val parts = fs.listStatus(dp)
      .count(st => st.isFile && st.getPath.getName.startsWith("part-"))
    if (parts < VersionsCompactThreshold) return
    versionLine(spark, path).foreach { line =>
      val tmp = s"$path/._versions_tmp_" +
        java.util.UUID.randomUUID().toString.take(8)
      line.write.mode(SaveMode.Overwrite).parquet(tmp)
      Lake.swapIn(fs, new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$path/_versions"))
      fs.delete(dp, true)
      ()
    }
  }

  private def writeSidecar(file: String, content: String): Unit = {
    val p = Paths.get(file)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

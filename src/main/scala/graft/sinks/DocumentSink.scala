package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *     the id strategy ([[DocId]]); `Upsert` rewrites partitions
  *     containing matching ids (parquet has no point update — at scale
  *     this becomes a Delta/Iceberg MERGE, same logical contract);
  *   - bulk partial-failure side-channel (src/es_connector.py:62-68
  *     `raise_on_error=False`) ⇒ [[validatedWrite]] splits invalid rows
  *     to a quarantine directory instead of failing the job.
  *
  * Scale: a write is executor-parallel (one file per partition, no
  * driver materialization); the mapping/meta sidecars are driver-side
  * metadata only. Partition count = upstream partitioning — callers
  * repartition by the sink's read pattern, not here.
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
    * cascade, data_lake_sync.py:101-110, made total and typed). */
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

  private def mappingJson(schema: StructType): String =
    schema.fields.map(f =>
      s""""${f.name}": {"type": "${esType(f.dataType)}"}""")
      .mkString("{\"properties\": {", ", ", "}}")

  /** Write `df` as an index at `path`. Overwrite = the reference's
    * drop-and-recreate; Append = historized sync runs. Returns the doc
    * count written. */
  def save(df: DataFrame, path: String,
           mode: SaveMode = SaveMode.Overwrite): Long = {
    df.write.mode(mode).parquet(s"$path/data")
    val n = df.sparkSession.read.parquet(s"$path/data").count()
    writeSidecar(s"$path/_mapping.json", mappingJson(df.schema))
    writeSidecar(s"$path/_meta.json",
      s"""{"doc_count": $n, "mode": "${mode.name.toLowerCase}"}""")
    n
  }

  /** Bulk write with the reference's partial-failure contract: rows
    * failing `requiredCols` non-null validation go to `path/_errors`
    * instead of failing the job; returns (successCount, failedCount)
    * exactly like `bulk_index` (src/es_connector.py:51-74). */
  def validatedWrite(df: DataFrame, path: String,
                     requiredCols: Seq[String],
                     mode: SaveMode = SaveMode.Overwrite): (Long, Long) = {
    val okPred = requiredCols.map(col(_).isNotNull).reduce(_ && _)
    val ok = df.filter(okPred)
    val bad = df.filter(!okPred)
    val n = save(ok, path, mode)
    bad.write.mode(mode).parquet(s"$path/_errors")
    val nBad = df.sparkSession.read.parquet(s"$path/_errors").count()
    (n, nBad)
  }

  /** Upsert by `document_id`: replace existing docs sharing an id with
    * the incoming batch (REST per-record re-sync semantics,
    * src/routes/ticket_routes.py:91-96). Parquet-level implementation:
    * read-modify-write via anti-join; at scale the same plan lands on a
    * Delta/Iceberg MERGE INTO. */
  def upsert(batch: DataFrame, path: String): Long = {
    val spark = batch.sparkSession
    val dataPath = s"$path/data"
    val existing =
      try spark.read.parquet(dataPath)
      catch { case _: Exception => spark.emptyDataFrame }
    val merged =
      if (existing.columns.isEmpty) batch
      else existing.join(batch.select("document_id"), Seq("document_id"),
        "left_anti").unionByName(batch, allowMissingColumns = true)
    // parquet cannot overwrite a path it is reading: stage via checkpoint
    val staged = merged.localCheckpoint(eager = true)
    save(staged, path, SaveMode.Overwrite)
  }

  /** Count verification (reference: src/es_connector.py:76-83). */
  def count(spark: org.apache.spark.sql.SparkSession, path: String): Long =
    spark.read.parquet(s"$path/data").count()

  private def writeSidecar(file: String, content: String): Unit = {
    val p = Paths.get(file)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

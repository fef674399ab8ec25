package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Raw-file ingestion (JSONL / CSV) with schema enforcement and a
  * corrupt-record quarantine — the file-side analog of the reference's
  * per-item bulk error tolerance (src/es_connector.py:62-68
  * `raise_on_error=False`) and of [[graft.sinks.DocumentSink
  * .validatedWrite]]'s error side-channel: a corrupt line must never
  * fail a 100 TB ingest job NOR silently vanish.
  *
  * Mechanics: PERMISSIVE parsing with an explicit
  * `_corrupt_record` column appended to the caller's schema — malformed
  * lines parse to all-null fields plus the raw line in the corrupt
  * column, then one pass splits clean rows from quarantined raw lines.
  * Both outputs stay lazy, file-partitioned scans; the split predicate
  * is evaluated scanner-side.
  *
  * (Spark refuses a query whose ONLY referenced column is the internal
  * corrupt column — both returned frames also touch data columns, and
  * the parsed frame is cached per Spark's documented requirement for
  * corrupt-column queries — via [[graft.StageCache]] so the harness
  * releases it deterministically at the query boundary.)
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def split(parsed: DataFrame,
                    schema: StructType): (DataFrame, DataFrame) = {
    val good = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"))
    (good, bad)
  }

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(CorruptCol, StringType,
        nullable = true))

  /** JSON-lines ingest → (clean typed rows, quarantined raw lines). */
  def jsonl(spark: SparkSession, path: String,
            schema: StructType): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
    split(graft.StageCache.stage(parsed), schema)
  }

  /** CSV ingest → (clean typed rows, quarantined raw lines). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): (DataFrame, DataFrame) = {
    val parsed = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(path)
    split(graft.StageCache.stage(parsed), schema)
  }
}

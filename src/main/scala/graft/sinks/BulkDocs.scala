package graft.sinks.bulk

import java.io.{BufferedWriter, File, FileWriter}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-bulk`: a DataSourceV2 bulk-document sink — the custom physical
  * component SURVEY §4.3 calls out (the Spark-native stand-in for the
  * reference's Elasticsearch bulk connector, src/es_connector.py:51-74).
  *
  * Protocol parity with ES `_bulk`:
  *  - each partition writer streams NDJSON action/document line pairs
  *    (`{"index":{"_id":…}}` then the document) — the exact bulk wire
  *    shape, one file per partition, executor-parallel, nothing on the
  *    driver;
  *  - per-record failure tolerance (`raise_on_error=False`): a document
  *    that cannot be serialized, or misses a column named in option
  *    `requiredCols` (comma-separated), is quarantined to a sibling
  *    `_errors/` file instead of failing the task;
  *  - each task's commit message carries its (success, failed) counts;
  *    the driver-side `commit` aggregates them into `_meta.json` — the
  *    reference's `(success, failed)` return and count-verification
  *    loop (src/es_connector.py:62-83) with exactly-once semantics
  *    (task files are staged under a task-unique name and renamed on
  *    task commit, so speculative/retried tasks never double-count).
  *
  * Usage: `df.write.format("graft-bulk").option("path", dir)
  * .option("docIdCol", "document_id").mode("overwrite").save()`.
  * Overwrite maps to the TRUNCATE capability = the reference's
  * drop-and-recreate (src/es_connector.py:23-25).
  *
  * Files are written through `java.io` (this container's lake is a local
  * directory); at cluster scale the writer would open a Hadoop
  * FileSystem stream instead — the class structure (provider → table →
  * write builder → factory → per-partition writer) is the part that
  * carries over unchanged.
  */
class BulkDocsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-bulk"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema always comes from the df
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new BulkTable(schema)
}

private[bulk] class BulkTable(schema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft-bulk"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new BulkBatchWrite(info.options.asScala.toMap, info.schema(),
            doTruncate, info.queryId())
      }
    }
}

private[bulk] case class BulkCommit(taskFile: String, errFile: String,
                                    success: Long, failed: Long)
    extends WriterCommitMessage

private[bulk] class BulkBatchWrite(options: Map[String, String],
                                   schema: StructType, truncate: Boolean,
                                   queryId: String)
    extends BatchWrite {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException("graft-bulk requires option 'path'"))
  // write-unique file suffix so append jobs never clobber earlier
  // generations' part files
  private val writeId = queryId.filter(c => c.isLetterOrDigit || c == '-')

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    if (truncate && dir.exists()) {
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    new File(dir, "data").mkdirs()
    new File(dir, "_errors").mkdirs()
    // CaseInsensitiveStringMap lower-cases keys
    val docIdCol = options.getOrElse("docidcol", "document_id")
    // schema-level misconfiguration must fail the JOB here (driver,
    // before any task runs), not silently quarantine every record: an
    // explicitly-named id column that is absent is a misspelling, and a
    // non-string id would throw per row in the writer. The implicit
    // default may be absent — that is ES auto-id (`_id: null`).
    val docIdIdx = schema.fieldNames.indexOf(docIdCol)
    if (options.contains("docidcol") && docIdIdx < 0)
      throw new IllegalArgumentException(
        s"docIdCol '$docIdCol' not in schema " +
          schema.fieldNames.mkString("[", ", ", "]"))
    if (docIdIdx >= 0 && schema.fields(docIdIdx).dataType != StringType)
      throw new IllegalArgumentException(
        s"docIdCol '$docIdCol' must be StringType, found " +
          s"${schema.fields(docIdIdx).dataType.simpleString} — cast it " +
          "(e.g. DocumentSink.withDocId) before writing")
    BulkWriterFactory(path, schema, docIdCol,
      options.get("requiredcols").toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
      writeId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val cs = messages.collect { case c: BulkCommit => c }
    // append accumulates onto the prior generation's counts
    val (prevSuccess, prevFailed) =
      if (truncate) (0L, 0L)
      else {
        val metaFile = java.nio.file.Paths.get(path, "_meta.json")
        if (java.nio.file.Files.exists(metaFile)) {
          val m = java.nio.file.Files.readString(metaFile)
          def field(k: String): Long =
            s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(m)
              .map(_.group(1).toLong).getOrElse(0L)
          (field("doc_count"), field("failed"))
        } else (0L, 0L)
      }
    val success = prevSuccess + cs.map(_.success).sum
    val failed = prevFailed + cs.map(_.failed).sum
    val mapping = graft.sinks.DocumentSink.mappingJson(schema)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_mapping.json"),
      mapping.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_meta.json"),
      s"""{"doc_count": $success, "failed": $failed, "mode": "bulk"}"""
        .getBytes("UTF-8"))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case c: BulkCommit => c }.foreach { c =>
      new File(c.taskFile).delete(); new File(c.errFile).delete()
    }
}

private[bulk] case class BulkWriterFactory(
    path: String, schema: StructType, docIdCol: String,
    requiredCols: Seq[String], writeId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BulkWriter(path, schema, docIdCol, requiredCols, partitionId, taskId,
      writeId)
}

private[bulk] class BulkWriter(
    path: String, schema: StructType, docIdCol: String,
    requiredCols: Seq[String], partitionId: Int, taskId: Long,
    writeId: String)
    extends DataWriter[InternalRow] {

  private val docIdIdx = schema.fieldNames.indexOf(docIdCol)
  private val requiredIdx = requiredCols.map { c =>
    val i = schema.fieldNames.indexOf(c)
    require(i >= 0, s"requiredCols column '$c' not in schema")
    i
  }

  // staged under a task-unique name; renamed to the partition name on
  // task commit so retries/speculation never leave duplicate data
  private val stagedData =
    new File(path, s"data/.part-$partitionId-$taskId.jsonl.tmp")
  private val stagedErr =
    new File(path, s"_errors/.part-$partitionId-$taskId.jsonl.tmp")
  private lazy val out = new BufferedWriter(new FileWriter(stagedData))
  private lazy val err = new BufferedWriter(new FileWriter(stagedErr))
  private var success = 0L
  private var failed = 0L

  override def write(row: InternalRow): Unit = {
    try {
      val missing = requiredIdx.filter(row.isNullAt)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"missing required: ${missing.map(schema.fieldNames).mkString(",")}")
      val doc = BulkJson.rowToJson(row, schema)
      val id =
        if (docIdIdx >= 0 && !row.isNullAt(docIdIdx))
          BulkJson.quote(row.getString(docIdIdx))
        else "null"
      out.write(s"""{"index":{"_id":$id}}""")
      out.newLine()
      out.write(doc)
      out.newLine()
      success += 1
    } catch {
      case e: Exception =>
        // e.getMessage may be null (bare NPE/CCE) — never let the
        // quarantine path itself throw
        err.write(BulkJson.quote(
          Option(e.getMessage).getOrElse(e.getClass.getName)))
        err.newLine()
        failed += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    out.close(); err.close()
    val dataFile = new File(path, s"data/part-$partitionId-$writeId.jsonl")
    val errFile = new File(path, s"_errors/part-$partitionId-$writeId.jsonl")
    if (!stagedData.renameTo(dataFile))
      throw new java.io.IOException(s"rename failed: $stagedData")
    if (failed > 0) stagedErr.renameTo(errFile) else stagedErr.delete()
    BulkCommit(dataFile.toString, errFile.toString, success, failed)
  }

  override def abort(): Unit = {
    try { out.close(); err.close() } catch { case _: Exception => () }
    stagedData.delete(); stagedErr.delete()
    ()
  }

  override def close(): Unit = ()
}

/** Minimal InternalRow→JSON for document schemas (atomic types, string
  * arrays, timestamps as ISO-8601 UTC). Unsupported types throw — which
  * the writer converts into a per-record quarantine, not a task failure. */
private[bulk] object BulkJson {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    .withZone(java.time.ZoneOffset.UTC)

  private def valueToJson(row: InternalRow, i: Int, dt: DataType): String =
    dt match {
      case StringType => quote(row.getUTF8String(i).toString)
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case TimestampType =>
        // split micros to avoid Long overflow past year 2262
        val micros = row.getLong(i)
        quote(tsFmt.format(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)))
      case TimestampNTZType =>
        // zone-less value: no UTC offset suffix
        val micros = row.getLong(i)
        quote(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toString)
      case DateType =>
        quote(java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString)
      case ArrayType(StringType, _) =>
        val a: ArrayData = row.getArray(i)
        (0 until a.numElements()).map(j =>
          if (a.isNullAt(j)) "null" else quote(a.getUTF8String(j).toString))
          .mkString("[", ",", "]")
      case other =>
        throw new UnsupportedOperationException(
          s"graft-bulk cannot serialize $other")
    }

  def rowToJson(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val v = if (row.isNullAt(i)) "null" else valueToJson(row, i, f.dataType)
      s"${quote(f.name)}:$v"
    }.mkString("{", ",", "}")
}

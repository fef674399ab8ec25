package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-entity sync catalog — the replacement for the
  * reference's five copy-pasted ~150-line sync functions
  * (src/data_sync.py:20-921) and its two *drifting* hand-written mapping
  * dict sets (src/utils.py:127-220 vs src/ticket_sync.py:29-62). One
  * [[EntitySpec]] per entity + one generic [[pipeline]] = same behavior,
  * an order of magnitude less code, and the mapping is derived from the
  * schema so it cannot drift.
  */
final case class EntitySpec(
    name: String,
    idCol: String,
    /** Non-null columns a valid document must carry (reference:
      * `prepare_entity_data` required map, src/utils.py:82-89). */
    requiredCols: Seq[String],
    /** Free-form JSON string columns to keep as strings + expose via
      * get_json_object (SURVEY §7.4 untyped-JSON stance). */
    jsonCols: Seq[String] = Nil,
    /** Free-text (analyzed) string columns — the reference's SQL `text`
      * type. Remaining strings are varchar-like ⇒ `keyword`. */
    textCols: Seq[String] = Nil)

object EntityCatalog {

  /** The testdata star schema as an entity catalog (the analog of the
    * reference's pinned `tables_to_sync`, src/db_connector.py:15-18). */
  val entities: Map[String, EntitySpec] = Map(
    "customer" -> EntitySpec("customer", "c_custkey", Seq("c_custkey", "c_name")),
    "supplier" -> EntitySpec("supplier", "s_suppkey", Seq("s_suppkey", "s_name")),
    "part"     -> EntitySpec("part", "p_partkey", Seq("p_partkey", "p_name")),
    "orders"   -> EntitySpec("orders", "o_orderkey", Seq("o_orderkey", "o_custkey")),
    "nation"   -> EntitySpec("nation", "n_nationkey", Seq("n_nationkey", "n_name")),
    "region"   -> EntitySpec("region", "r_regionkey", Seq("r_regionkey", "r_name")),
    "events"   -> EntitySpec("events", "event_id", Seq("event_id", "user_id"),
      jsonCols = Seq("props")))

  /** P7: required-field validation predicate. */
  def validPredicate(spec: EntitySpec): Column =
    spec.requiredCols.map(col(_).isNotNull).reduce(_ && _)

  /** P4: prefix every column `<entity>_<col>` + `table` discriminator
    * (reference: data_lake_sync.py:152-164). */
  def namespaced(df: DataFrame, spec: EntitySpec): DataFrame =
    df.select(df.columns.toSeq.map(c =>
        col(c).as(s"${spec.name}_$c")): _*)
      .withColumn("table", lit(spec.name))

  /** The generic entity sync document pipeline: validate → namespace →
    * lineage (`document_id = {id}_{runTs}`, `indexed_at` — reference:
    * src/data_sync.py:93-115). Pure DataFrame transform; the caller
    * hands the result to DocumentSink. */
  def pipeline(df: DataFrame, spec: EntitySpec, runTs: String): DataFrame =
    documents(df.filter(validPredicate(spec)), spec, runTs)

  /** [[pipeline]] WITHOUT the validity filter: namespace + lineage only.
    * For sinks that do their own validation with error quarantine
    * ([[graft.sinks.DocumentSink.validatedWrite]]) — filtering here
    * would silently drop the rows the sink wants to count and keep. */
  def documents(df: DataFrame, spec: EntitySpec, runTs: String): DataFrame =
    namespaced(df, spec)
      .withColumn("document_id",
        concat_ws("_", col(s"${spec.name}_${spec.idCol}"), lit(runTs)))
      .withColumn("indexed_at", lit(runTs).cast("timestamp"))

  /** Rows failing validation — the error side-output the reference
    * accumulates per-batch (src/data_sync.py:66-171). */
  def rejects(df: DataFrame, spec: EntitySpec): DataFrame =
    df.filter(!validPredicate(spec))

  /** F11 mapping fidelity — the reference's SQL-type cascade
    * (data_lake_sync.py:101-110: json→`object`, varchar→`keyword`,
    * text→`text`) for the string columns Spark's schema collapses into
    * one StringType. Keyed by OUTPUT (namespaced) column name, over the
    * [[pipeline]] result schema: `spec.jsonCols` → object, `spec
    * .textCols` → text, every other string (ids, names, the `table`
    * discriminator the reference itself pins to keyword,
    * data_lake_sync.py:113) → keyword. Non-string columns keep the
    * schema-derived type. */
  def fieldTypes(schema: org.apache.spark.sql.types.StructType,
                 spec: EntitySpec): Map[String, String] = {
    import org.apache.spark.sql.types.StringType
    val json = spec.jsonCols.map(c => s"${spec.name}_$c").toSet
    val text = spec.textCols.map(c => s"${spec.name}_$c").toSet
    schema.fields.collect {
      case f if json.contains(f.name) => f.name -> "object"
      case f if text.contains(f.name) => f.name -> "text"
      case f if f.dataType == StringType => f.name -> "keyword"
    }.toMap
  }

  /** The reference's top-level entrypoint (`sync_all_tables`,
    * src/data_sync.py:923-934; CLI `sync_data.py`) as one call: for every
    * catalog entity, validate → namespace → lineage → write to its own
    * document index under `outDir`, with the per-entity error isolation
    * the reference gets from try/except per table (a failing entity does
    * not stop the run). Returns entity → (synced, rejected) counts —
    * the reference's per-table success/failure accounting. */
  def syncAll(spark: org.apache.spark.sql.SparkSession, srcDir: String,
              outDir: String, runTs: String): Map[String, (Long, Long)] =
    entities.map { case (name, spec) =>
      name -> (try {
        val src = graft.sources.Tables(spark, srcDir, name)
        // validation happens INSIDE validatedWrite (single pass, both
        // counts from the write jobs' observe metrics, rejects
        // quarantined to _errors) — the first cut re-scanned the source
        // a second time just to count rejects
        val docs = documents(src, spec, runTs)
        graft.sinks.DocumentSink.validatedWrite(
          docs, s"$outDir/$name",
          spec.requiredCols.map(c => s"${spec.name}_$c"),
          fieldTypes = fieldTypes(docs.schema, spec))
      } catch { case scala.util.control.NonFatal(_) => (-1L, -1L) })
    }

  /** §2.7 cross-index union view — the reference's `data_lake_*`
    * wildcard search target (src/es_connector.py:85-95 defaults
    * `index="data_lake_*"`; legacy data_lake_sync.py:228): every catalog
    * entity's validated + namespaced document table, `unionByName`'d
    * with `allowMissingColumns` so each row carries its own entity's
    * columns and NULLs elsewhere — the row shape a multi-index ES search
    * returns. Branch order is name-sorted for a deterministic schema.
    *
    * Scale: the union is a plan-level concatenation — Catalyst pushes
    * filters and column pruning into EACH branch's scan independently,
    * so "search everything" costs one pruned pass per entity table and
    * no shuffle (the serving top-k is a TakeOrdered). */
  def unionDocuments(spark: org.apache.spark.sql.SparkSession,
                     srcDir: String, runTs: String,
                     only: Seq[String] = Nil): DataFrame = {
    val specs0 = entities.values.toSeq.sortBy(_.name)
    // `only` = a comma-list target's entity subset (ES multi-index
    // search names several indexes); empty = the full data_lake_*
    // wildcard. Unknown names are the caller's error.
    val specs =
      if (only.isEmpty) specs0
      else {
        val unknown = only.filterNot(entities.contains)
        require(unknown.isEmpty,
          s"unknown entities: ${unknown.mkString(", ")}")
        specs0.filter(sp => only.contains(sp.name))
      }
    specs
      .map(spec => pipeline(
        graft.sources.Tables(spark, srcDir, spec.name), spec, runTs))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** P7/F4: API-insert defaulting — null id → `uuid()`, null audit
    * timestamps → now (reference: prepare_entity_data,
    * src/utils.py:99-111). Column expressions only, no UDF. uuid() is
    * nondeterministic by design (the reference mints a fresh uuid4), so
    * this path is spec-tested rather than oracle-hashed; oracle-checked
    * pipelines use the deterministic md5 fallback (p7_validate_default).
    */
  def defaulted(df: DataFrame, spec: EntitySpec,
                tsCols: Seq[String] = Nil): DataFrame = {
    val withId = df.withColumn(spec.idCol,
      coalesce(col(spec.idCol).cast("string"), expr("uuid()")))
    tsCols.foldLeft(withId)((d, c) =>
      d.withColumn(c, coalesce(col(c), current_timestamp())))
  }
}

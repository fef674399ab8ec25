package graft.serving

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Percolation — ES's reverse search (`percolate` query, ES 8.11 in
  * the reference's stack; reference: docker-compose.yml:5, the DSL
  * passthrough src/search_api.py:38-46): STORED queries are matched
  * against incoming documents instead of documents against a query.
  *
  * Scale shape: stored queries are human-authored configuration —
  * bounded (ES percolator indexes hold hundreds to low thousands of
  * queries; [[MaxQueries]] pins the bound fail-loud). Documents are
  * the unbounded side. So every API here compiles the K stored
  * queries ONCE into K codegen'd filter-context predicates
  * ([[EsDsl.percolatePreds]] — the countFrame predicate shape, no
  * score machinery) and evaluates them:
  *
  *   - [[tagAll]]: corpus-centric — ONE pass over a document table
  *     computes every document's matching-query list as K `when`
  *     branches inside the scan's projection. No join, no shuffle, no
  *     per-query pass: the 100 TB routing/tagging shape (alerting,
  *     saved-search fan-out, taxonomy tagging for training-data
  *     curation).
  *   - [[matches]] / [[search]]: request-centric — ES's
  *     `{"percolate": {"document(s)": ...}}`: a handful of in-flight
  *     documents (one Spark-local frame) evaluated against all K
  *     predicates in ONE aggregate returning each query's matching
  *     document slots.
  *
  * Scoring: percolate hits carry `_score` 1.0 (constant-score).
  * ES technically BM25-scores each hit against the tiny in-memory
  * document index; those scores are rarely meaningful on a 1-doc
  * corpus and callers treat percolation as a boolean route — a
  * documented deviation, matching the engine's filter-context
  * constant-score convention.
  *
  * A stored query referencing a field the document shape lacks simply
  * never matches (ES percolator semantics); an UNSUPPORTED construct
  * throws with the construct named — fail-loud, never silently wrong.
  */
object Percolate {

  private val mapper = new ObjectMapper()

  /** Stored queries are configuration, not data: the compile fan-out
    * (K codegen'd predicates in one projection) is sized for that.
    * Beyond this, the right design is sharding the query set — fail
    * loud instead of compiling an unbounded expression tree. */
  val MaxQueries = 4096

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** The per-document slot column injected before schema inference. */
  private val SlotCol = "__percolator_slot__"

  private def checkCount(n: Int): Unit =
    if (n > MaxQueries)
      bad(s"$n stored queries exceed the percolator bound $MaxQueries" +
        " — shard the query set")

  /** JSON node kind for the cross-document type-conflict check —
    * `number` covers int/long/double together (schema inference widens
    * them numerically, which preserves comparison semantics); `null`
    * is compatible with everything. */
  private def kindOf(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isBoolean) "boolean"
    else if (n.isNumber) "number"
    else "string"

  /** Structural validation of ONE request document (object shape,
    * reserved slot field) — also run by [[matches]] before its
    * empty-query early return so a malformed request 400s whether or
    * not any percolator is stored. */
  private def checkDocument(d: JsonNode, slot: Int): Unit = {
    if (d == null || !d.isObject)
      bad(s"percolate document at slot $slot must be a JSON object")
    if (d.has(SlotCol)) bad(s"document field $SlotCol is reserved")
  }

  /** The one validation pass every percolate request runs: presence,
    * per-document structure, cross-document type conflicts. */
  private def validateDocuments(documents: Seq[JsonNode]): Unit = {
    if (documents.isEmpty) bad("percolate needs at least one document")
    documents.zipWithIndex.foreach { case (d, i) => checkDocument(d, i) }
    checkTypeConflicts(documents)
  }

  /** Reject cross-document TYPE conflicts by name: schema inference
    * merges all documents into one frame, and a field numeric in one
    * document but string in another would widen to string — flipping
    * range/term comparisons to lexicographic for every document. ES
    * percolates each document in its own typed in-memory index, so
    * the merged frame is only faithful when kinds agree. Recurses
    * through nested objects; fail-loud beats silently-wrong. */
  private def checkTypeConflicts(documents: Seq[JsonNode]): Unit = {
    val seen = scala.collection.mutable.Map[String, (String, Int)]()
    def walk(path: String, n: JsonNode, slot: Int): Unit = {
      val k = kindOf(n)
      if (k != "null") {
        seen.get(path) match {
          case Some((k0, s0)) if k0 != k && s0 == slot =>
            bad(s"percolate document at slot $slot mixes types inside " +
              s"'$path' ($k0 vs $k) — a mixed-type array cannot map " +
              "to one typed column")
          case Some((k0, s0)) if k0 != k =>
            bad(s"percolate documents disagree on the type of field " +
              s"'$path' ($k0 at slot $s0 vs $k at slot $slot) — send " +
              "type-conflicting documents in separate requests")
          case _ => seen(path) = (k, slot)
        }
        if (k == "object") {
          val it = n.fieldNames()
          while (it.hasNext) {
            val name = it.next()
            val child = if (path.isEmpty) name else s"$path.$name"
            walk(child, n.get(name), slot)
          }
        } else if (k == "array") {
          // element kinds conflict the same way scalars do (a numeric
          // array in one doc vs a string array in another widens to
          // array<string> — lexicographic comparisons for both); the
          // shared "[]" path also catches MIXED types inside one array
          val it = n.elements()
          while (it.hasNext) walk(s"$path[]", it.next(), slot)
        }
      }
    }
    documents.zipWithIndex.foreach { case (d, i) => walk("", d, i) }
  }

  /** One in-memory frame for the request's documents, slot-stamped
    * (slot = position in `documents`, ES's `_percolator_document_slot`
    * identity). Schema is inferred over ALL documents together, so a
    * field present in any document resolves for every predicate;
    * cross-document type conflicts reject by name (see
    * [[checkTypeConflicts]]). */
  private def documentFrame(spark: SparkSession,
                            documents: Seq[JsonNode]): DataFrame = {
    // validation happens in [[validateDocuments]] (one site, run by
    // matches() before any early return)
    val slotted = documents.zipWithIndex.map { case (d, i) =>
      val c = d.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      c.put(SlotCol, i)
      c.toString
    }
    val ds = spark.createDataset(slotted)(Encoders.STRING)
    spark.read.json(ds)
  }

  /** Which stored queries match which documents: `(id, query)` pairs
    * against the request's documents; returns only the matching
    * queries, each with its sorted matching-slot list, in the input
    * queries' order. The whole evaluation is ONE aggregate over the
    * (tiny) document frame — K predicates as aggregate branches. */
  def matches(spark: SparkSession, queries: Seq[(String, JsonNode)],
              documents: Seq[JsonNode]): Seq[(String, Seq[Long])] = {
    checkCount(queries.size)
    // ONE validation site, before any early return: a malformed
    // document must 400 whether the store holds zero queries or a
    // thousand
    validateDocuments(documents)
    if (queries.isEmpty) return Nil
    val docs = documentFrame(spark, documents)
    val (marked, preds) = EsDsl.percolatePreds(docs, queries.map(_._2))
    val aggCols: Seq[Column] = preds.zipWithIndex.map { case (p, i) =>
      sort_array(collect_list(
        when(p.getOrElse(lit(false)), col(SlotCol)))).as(s"_q$i")
    }
    val row = marked.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    queries.zipWithIndex.flatMap { case ((id, _), i) =>
      val slots = row.getSeq[Long](i)
      if (slots.nonEmpty) Some((id, slots)) else None
    }
  }

  /** ES-shaped percolate SEARCH: the "index" is a frame of stored
    * queries (first column = id, `queryField` = the query JSON text —
    * ES's percolator-mapped field); hits are the matching stored-query
    * ROWS with `_score` 1.0 and `_percolator_document_slot`. The
    * query frame is collected (config-scale, [[MaxQueries]]-guarded);
    * the hit join back is an isin over the matched ids — one pruned
    * pass over the query frame. */
  def search(queriesDf: DataFrame, queryField: String,
             documents: Seq[JsonNode]): DataFrame = {
    val spark = queriesDf.sparkSession
    val idName = queriesDf.columns.head
    if (!queriesDf.columns.contains(queryField))
      bad(s"unknown percolator query field '$queryField'")
    val rows = queriesDf
      .select(col(idName).cast("string"), col(queryField).cast("string"))
      .limit(MaxQueries + 1).collect()
    checkCount(rows.length)
    val qs = rows.toSeq.map { r =>
      if (r.isNullAt(1)) bad(s"stored query '${r.getString(0)}' is null")
      val node = try mapper.readTree(r.getString(1)) catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          bad(s"stored query '${r.getString(0)}' is not valid JSON: " +
            e.getMessage)
      }
      (r.getString(0), node)
    }
    val hit = matches(spark, qs, documents)
    import spark.implicits._
    val slotDf = hit.toDF("__pid", "_percolator_document_slot")
    queriesDf
      .join(broadcast(slotDf),
        col(idName).cast("string") === col("__pid"))
      .drop("__pid")
      .withColumn("_score", lit(1.0))
      .orderBy(col(idName))
  }

  /** Corpus-centric percolation: tag EVERY document of a table with
    * the stored queries it matches — `matched_queries` is the
    * comma-joined id list in the stored queries' order (concat_ws
    * skips non-matching branches). One table scan, K codegen'd
    * predicates in the projection, zero joins/shuffles — the shape
    * that survives 100 TB. `keepUnmatched=false` (the default) drops
    * documents no query matches, like a percolate hit list. */
  def tagAll(docs: DataFrame, queries: Seq[(String, JsonNode)],
             keepUnmatched: Boolean = false): DataFrame = {
    checkCount(queries.size)
    if (queries.isEmpty) bad("tagAll needs at least one stored query")
    val (marked, preds) = EsDsl.percolatePreds(docs, queries.map(_._2))
    val branches = queries.zip(preds).map { case ((id, _), p) =>
      when(p.getOrElse(lit(false)), lit(id))
    }
    val tagged = marked
      .withColumn("matched_queries", concat_ws(",", branches: _*))
      .drop(EsDsl.IdColMarker)
    if (keepUnmatched) tagged
    else tagged.filter(col("matched_queries") =!= "")
  }
}

package graft.serving

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ES `scripted_metric` aggregation over the canonical SUM-FOLD family
  * (reference forwards the body verbatim to its ES 8.11 backend,
  * src/es_connector.py:85-95; the passthrough surface SURVEY §2.13
  * documents). The supported shape is the one every tutorial body and
  * the ES reference example use — per-document accumulation folded by
  * a summing reduce:
  *
  *   init_script:    state.<v> = 0            (one per accumulator)
  *   map_script:     state.<v> += <expr>      (doc['f'].value, params,
  *                                             ternary, Math.*)
  *   combine_script: return state             (or: return state.<v>)
  *   reduce_script:  double t = 0; for (a in states) { t += a.<v> }
  *                   return t                 (or `t += a` when combine
  *                                             returned the scalar)
  *
  * This family is associative, so it folds to ONE aggregate expression
  * — `sum(<expr>)` per accumulator — that rides the same hash
  * aggregation as every other metric (top-level and under any bucket
  * agg), with no per-shard state machinery: the engine computes the
  * one-logical-shard value, which for this family is exactly ES's
  * result on any shard count. Non-zero init seeds are REJECTED by
  * name: in ES they re-add per shard, making the result
  * shard-count-dependent — a value this engine should refuse to guess.
  * Anything outside the shape (list state, non-sum reduce, extra
  * statements) rejects by name at parse time, never a silently
  * different number.
  */
private[serving] object ScriptedMetric {

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"scripted_metric: $msg")

  /** The script text of a string node or `{"source": "..."}` object
    * (stored scripts / lang selectors reject by name). */
  private def sourceOf(n: JsonNode, which: String): String = {
    if (n == null) bad(s"needs \"$which\"")
    if (n.isTextual) return n.asText
    if (!n.isObject) bad(s"$which must be a string or {source}")
    val keys = { val it = n.fieldNames()
      val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next()
      b.result() }
    val unknown = keys.filterNot(_ == "source")
    if (unknown.nonEmpty)
      bad(s"unsupported $which key${if (unknown.size == 1) "" else "s"}: " +
        unknown.mkString(", "))
    Option(n.get("source")).map(_.asText)
      .getOrElse(bad(s"$which needs \"source\""))
  }

  /** Statements of a script: `;`-separated, trimmed, empties dropped. */
  private def statements(src: String): Seq[String] =
    src.split(";").map(_.trim).filter(_.nonEmpty).toSeq

  private val InitStmt = """state\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)""".r
  private val MapStmt = """state\.([A-Za-z_][A-Za-z0-9_]*)\s*\+=\s*(.+)""".r

  /** Whitespace-normalized text for the combine recognizer. */
  private def norm(s: String): String =
    s.trim.replaceAll("\\s+", " ")

  /** ALL whitespace stripped — the reduce recognizer matches the
    * compacted text (spacing styles vary; identifiers re-separate via
    * non-greedy groups + the equality checks below). */
  private def compact(s: String): String = s.replaceAll("\\s+", "")

  private val ReduceState =
    ("""(?:double|long|int)(\w+?)=0(?:\.0)?;?""" +
      """for\((\w+?)instates\)\{(\w+)\+=(\w+)\.(\w+);?\};?""" +
      """return(\w+);?""").r
  private val ReduceScalar =
    ("""(?:double|long|int)(\w+?)=0(?:\.0)?;?""" +
      """for\((\w+?)instates\)\{(\w+)\+=(\w+);?\};?""" +
      """return(\w+);?""").r

  /** Compile the body to ONE aggregate Column named `alias`.
    * `fieldRef` resolves `doc['f'].value`; `params` are the body's
    * numeric constants. */
  def compile(body: JsonNode, alias: String,
              fieldRef: String => Column): Column = {
    val keys = { val it = body.fieldNames()
      val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next()
      b.result() }
    val unknown = keys.filterNot(Set("init_script", "map_script",
      "combine_script", "reduce_script", "params"))
    if (unknown.nonEmpty)
      bad(s"unsupported key${if (unknown.size == 1) "" else "s"}: " +
        unknown.mkString(", "))

    val params: Map[String, Column] =
      Option(body.get("params")).map { p =>
        if (!p.isObject) bad("params must be an object")
        val it = p.fieldNames()
        val b = Map.newBuilder[String, Column]
        while (it.hasNext) {
          val k = it.next()
          val v = p.get(k)
          if (!v.isNumber)
            bad(s"params.$k must be numeric (the arithmetic subset)")
          b += k -> (if (v.isIntegralNumber) lit(v.asLong)
                     else lit(v.asDouble))
        }
        b.result()
      }.getOrElse(Map.empty)

    // init: every accumulator seeded with literal zero (non-zero
    // seeds re-add per shard in ES — shard-count-dependent, refuse)
    val seeds: Seq[String] =
      statements(sourceOf(body.get("init_script"), "init_script")).map {
        case InitStmt(v, value) =>
          if (norm(value) != "0" && norm(value) != "0.0")
            bad(s"init seed for state.$v must be 0 (a non-zero seed " +
              "re-adds per shard in ES — shard-count-dependent)")
          v
        case other => bad(s"unsupported init statement '$other' " +
          "(state.<v> = 0)")
      }
    if (seeds.isEmpty) bad("init_script declares no state accumulator")
    if (seeds.distinct.size != seeds.size)
      bad("init_script seeds an accumulator twice")

    // map: per-document contributions per accumulator — the arithmetic
    // subset with doc refs, params, ternary and Math.*
    val contribs: Map[String, Seq[Column]] =
      statements(sourceOf(body.get("map_script"), "map_script")).map {
        case MapStmt(v, expr) =>
          if (!seeds.contains(v))
            bad(s"map_script uses state.$v without an init seed")
          v -> (try BucketScript.compile(expr, params,
              fieldRef = Some(fieldRef)) catch {
            case e: BucketScript.ScriptError =>
              bad(s"map_script: ${e.msg}")
          })
        case other => bad(s"unsupported map statement '$other' " +
          "(state.<v> += <expr>)")
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    if (contribs.isEmpty) bad("map_script accumulates nothing")

    // combine: `return state` (reduce folds a named field) or
    // `return state.<v>` (reduce folds the scalar)
    val combine = norm(sourceOf(body.get("combine_script"),
      "combine_script")).stripSuffix(";").trim
    val combineVar: Option[String] = combine match {
      case "return state" | "state" => None
      case s if s.startsWith("return state.") =>
        Some(s.stripPrefix("return state.").stripSuffix(";").trim)
      case s if s.startsWith("state.") =>
        Some(s.stripPrefix("state.").stripSuffix(";").trim)
      case other => bad(s"unsupported combine_script '$other' " +
        "(return state / return state.<v>)")
    }
    combineVar.foreach(v => if (!seeds.contains(v))
      bad(s"combine_script returns state.$v which init never seeds"))

    // reduce: the summing fold over states, naming the accumulator;
    // the regex groups re-check that the loop is a pure fold (same
    // accumulator assigned and returned, same loop variable read)
    val reduce = compact(sourceOf(body.get("reduce_script"),
      "reduce_script"))
    val target: String = (combineVar, reduce) match {
      case (None, ReduceState(acc, lv, acc2, lv2, v, ret))
          if acc == acc2 && acc == ret && lv == lv2 =>
        if (!seeds.contains(v))
          bad(s"reduce_script folds a.$v which init never seeds")
        v
      case (Some(v), ReduceScalar(acc, lv, acc2, lv2, ret))
          if acc == acc2 && acc == ret && lv == lv2 => v
      case (None, _) => bad("unsupported reduce_script (expected: " +
        "double t = 0; for (a in states) { t += a.<v> } return t)")
      case (Some(_), _) => bad("unsupported reduce_script (expected: " +
        "double t = 0; for (a in states) { t += a } return t)")
    }
    val perDoc = contribs.getOrElse(target,
        bad(s"map_script never accumulates state.$target"))
      .map(_.cast("double")).reduce(_ + _)
    // the fold: seed 0 + Σ per-doc contributions; an empty match set
    // reduces to 0.0 exactly as ES's reduce of empty states does
    coalesce(sum(perDoc), lit(0.0)).as(alias)
  }
}

package graft.serving

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ES `scripted_metric` aggregation over the ORDER-INDEPENDENT fold
  * families (reference forwards the body verbatim to its ES 8.11
  * backend, src/es_connector.py:85-95; the passthrough surface SURVEY
  * §2.13 documents). Three folds are recognized — sum, min, max — in
  * the shapes tutorial bodies and the ES reference examples use:
  *
  *   SUM (scalar state):
  *     init_script:    state.<v> = 0
  *     map_script:     state.<v> += <expr>      (doc['f'].value,
  *                                               params, ternary, Math.*)
  *     combine_script: return state             (or: return state.<v>)
  *     reduce_script:  double t = 0; for (a in states) { t += a.<v> }
  *                     return t                 (`t += a` after a
  *                                               scalar combine)
  *
  *   MIN / MAX (scalar state; max symmetric):
  *     init_script:    state.<v> = <literal>    (Double.MAX_VALUE /
  *                                               Infinity / a number)
  *     map_script:     state.<v> = Math.min(state.<v>, <expr>)
  *     combine_script: return state             (or: return state.<v>)
  *     reduce_script:  double m = <literal>;
  *                     for (a in states) { m = Math.min(m, a.<v>) }
  *                     return m                 (`Math.min(m, a)` after
  *                                               a scalar combine)
  *
  *   COLLECT (array state) + a fold-to-scalar combine:
  *     init_script:    state.<v> = []
  *     map_script:     state.<v>.add(<expr>)
  *     combine_script: double x = <seed>;
  *                     for (t in state.<v>) { x += t } return x
  *                     (or the Math.min/Math.max fold form)
  *     reduce_script:  the matching scalar fold over states
  *
  * Every recognized form folds to ONE aggregate expression —
  * `sum`/`min`/`max` of the per-doc contribution — riding the same
  * hash aggregation as every other metric (top-level and under any
  * bucket agg), with no per-shard state machinery: the engine computes
  * the one-logical-shard value, which for these folds is exactly ES's
  * result on ANY shard count. Concretely:
  *
  *  - sum seeds must be literal 0 (a non-zero sum seed re-adds per
  *    shard in ES — shard-count-dependent, rejected by name);
  *  - min/max seeds may be ANY literal (min/max are idempotent, so a
  *    seed CLAMPS rather than re-adds: the result is
  *    min(seeds..., min(values)) on every shard count) — the seeds
  *    fold into the compiled expression as a `least`/`greatest` clamp;
  *  - the combine and reduce folds must AGREE (a min-of-per-shard-sums
  *    is shard-count-dependent — mismatched stages reject by name).
  *
  * Anything outside these shapes (non-literal seeds, mixed ops on one
  * accumulator, order-dependent list reduces, extra statements)
  * rejects by name at parse time, never a silently different number.
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
  private val MapPlus = """state\.([A-Za-z_][A-Za-z0-9_]*)\s*\+=\s*(.+)""".r
  private val MapMinMax =
    ("""state\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*Math\.(min|max)\(\s*""" +
      """state\.([A-Za-z_][A-Za-z0-9_]*)\s*,\s*(.+)\)\s*""").r
  private val MapAdd =
    """state\.([A-Za-z_][A-Za-z0-9_]*)\.add\((.+)\)\s*""".r

  /** Whitespace-normalized text for the combine recognizer. */
  private def norm(s: String): String =
    s.trim.replaceAll("\\s+", " ")

  /** ALL whitespace stripped — the fold recognizers match the
    * compacted text (spacing styles vary; identifiers re-separate via
    * non-greedy groups + the equality checks below). */
  private def compact(s: String): String = s.replaceAll("\\s+", "")

  /** A literal seed in compacted script text: a number, or the
    * Double extreme constants min/max folds seed with. */
  private val SeedPat =
    """-?(?:\d+(?:\.\d+)?(?:[eE]-?\d+)?|Double\.MAX_VALUE|Double\.POSITIVE_INFINITY|Double\.NEGATIVE_INFINITY)"""

  private def seedValue(s: String): Double = s match {
    case "Double.MAX_VALUE" => Double.MaxValue
    case "-Double.MAX_VALUE" => Double.MinValue
    case "Double.POSITIVE_INFINITY" => Double.PositiveInfinity
    case "Double.NEGATIVE_INFINITY" => Double.NegativeInfinity
    case "-Double.POSITIVE_INFINITY" => Double.NegativeInfinity
    case "-Double.NEGATIVE_INFINITY" => Double.PositiveInfinity
    case t => t.toDouble
  }

  // reduce over states (combine returned the whole state)
  private val ReduceState =
    (s"""(?:double|long|int)(\\w+?)=($SeedPat);?""" +
      """for\((\w+?)instates\)\{(\w+)\+=(\w+)\.(\w+);?\};?""" +
      """return(\w+);?""").r
  private val ReduceStateMinMax =
    (s"""(?:double|long|int)(\\w+?)=($SeedPat);?""" +
      """for\((\w+?)instates\)\{(\w+)=Math\.(min|max)\((\w+),(\w+)\.(\w+)\);?\};?""" +
      """return(\w+);?""").r
  // reduce over scalar per-shard values (combine returned a scalar)
  private val ReduceScalar =
    (s"""(?:double|long|int)(\\w+?)=($SeedPat);?""" +
      """for\((\w+?)instates\)\{(\w+)\+=(\w+);?\};?""" +
      """return(\w+);?""").r
  private val ReduceScalarMinMax =
    (s"""(?:double|long|int)(\\w+?)=($SeedPat);?""" +
      """for\((\w+?)instates\)\{(\w+)=Math\.(min|max)\((\w+),(\w+)\);?\};?""" +
      """return(\w+);?""").r
  // combine folding an ARRAY accumulator to a per-shard scalar
  private val CombineArr =
    (s"""(?:double|long|int)(\\w+?)=($SeedPat);?""" +
      """for\((\w+?)instate\.(\w+)\)\{(\w+)\+=(\w+);?\};?""" +
      """return(\w+);?""").r
  private val CombineArrMinMax =
    (s"""(?:double|long|int)(\\w+?)=($SeedPat);?""" +
      """for\((\w+?)instate\.(\w+)\)\{(\w+)=Math\.(min|max)\((\w+),(\w+)\);?\};?""" +
      """return(\w+);?""").r

  /** Per-accumulator state shape from init + map. */
  private sealed trait Acc
  /** `state.v = 0` + `state.v += e...` */
  private final case class SumAcc(exprs: Seq[Column]) extends Acc
  /** `state.v = <seed>` + `state.v = Math.min/max(state.v, e)...` */
  private final case class MinMaxAcc(op: String, seed: Double,
                                     exprs: Seq[Column]) extends Acc
  /** `state.v = []` + `state.v.add(e)...` */
  private final case class ArrAcc(exprs: Seq[Column]) extends Acc

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

    // init: literal seeds only. `[]` declares array state; a number
    // (or a Double extreme constant) declares scalar state — whether
    // the seed is LEGAL depends on the fold the map/reduce select
    // (sum: 0 only; min/max: any, folded in as a clamp).
    val seeds: Map[String, Either[Double, Unit]] =
      statements(sourceOf(body.get("init_script"), "init_script")).map {
        case InitStmt(v, value) if norm(value) == "[]" =>
          v -> Right(())
        case InitStmt(v, value) =>
          val s = try seedValue(compact(value)) catch {
            case _: NumberFormatException | _: MatchError =>
              bad(s"init seed for state.$v must be a literal " +
                "(a number, [], or a Double extreme constant)")
          }
          v -> Left(s)
        case other => bad(s"unsupported init statement '$other' " +
          "(state.<v> = <literal>)")
      }.foldLeft(Map.empty[String, Either[Double, Unit]]) {
        case (m, (v, s)) =>
          if (m.contains(v)) bad("init_script seeds an accumulator twice")
          m + (v -> s)
      }
    if (seeds.isEmpty) bad("init_script declares no state accumulator")

    def mapExpr(raw: String): Column =
      try BucketScript.compile(raw, params, fieldRef = Some(fieldRef))
      catch { case e: BucketScript.ScriptError =>
        bad(s"map_script: ${e.msg}") }

    // map: per-document contributions, one consistent op per
    // accumulator (sum / min / max / collect)
    val mapStmts =
      statements(sourceOf(body.get("map_script"), "map_script")).map {
        case MapPlus(v, expr) => (v, "sum", expr)
        case MapMinMax(v, op, v2, expr) =>
          if (v != v2)
            bad(s"map Math.$op must fold state.$v with itself")
          (v, op, expr)
        case MapAdd(v, expr) => (v, "collect", expr)
        case other => bad(s"unsupported map statement '$other' " +
          "(state.<v> += e / state.<v> = Math.min|max(state.<v>, e) / " +
          "state.<v>.add(e))")
      }
    if (mapStmts.isEmpty) bad("map_script accumulates nothing")
    val accs: Map[String, Acc] = mapStmts.groupBy(_._1).map {
      case (v, stmts) =>
        val ops = stmts.map(_._2).distinct
        if (ops.size != 1)
          bad(s"state.$v mixes ${ops.mkString("/")} map operations")
        val exprs = stmts.map(s => mapExpr(s._3))
        val acc = (ops.head, seeds.get(v)) match {
          case (_, None) =>
            bad(s"map_script uses state.$v without an init seed")
          case ("sum", Some(Left(s))) =>
            if (s != 0.0)
              bad(s"init seed for state.$v must be 0 (a non-zero sum " +
                "seed re-adds per shard in ES — shard-count-dependent)")
            SumAcc(exprs)
          case ("sum", Some(Right(_))) =>
            bad(s"state.$v += needs a numeric seed, not []")
          case (op @ ("min" | "max"), Some(Left(s))) =>
            MinMaxAcc(op, s, exprs)
          case ("min" | "max", Some(Right(_))) =>
            bad(s"Math-fold on state.$v needs a numeric seed, not []")
          case ("collect", Some(Right(_))) => ArrAcc(exprs)
          case ("collect", Some(Left(_))) =>
            bad(s"state.$v.add needs init state.$v = []")
          case (op, _) => bad(s"unsupported map op '$op'")
        }
        v -> acc
    }

    // combine: `return state` (reduce folds a named field),
    // `return state.<v>` (reduce folds the scalar), or a fold loop
    // collapsing an ARRAY accumulator to a per-shard scalar
    val combineRaw = sourceOf(body.get("combine_script"), "combine_script")
    val combineNorm = norm(combineRaw).stripSuffix(";").trim
    sealed trait Combine
    case object WholeState extends Combine
    final case class ScalarOf(v: String) extends Combine
    final case class ArrFold(v: String, op: String, seed: Double)
      extends Combine
    val combine: Combine = combineNorm match {
      case "return state" | "state" => WholeState
      case s if s.startsWith("return state.") &&
          !s.contains("{") && !s.contains("(") =>
        ScalarOf(s.stripPrefix("return state.").trim)
      case s if s.startsWith("state.") &&
          !s.contains("{") && !s.contains("(") =>
        ScalarOf(s.stripPrefix("state.").trim)
      case _ => compact(combineRaw) match {
        case CombineArr(acc, seed, lv, v, acc2, lv2, ret)
            if acc == acc2 && acc == ret && lv == lv2 =>
          if (seedValue(seed) != 0.0)
            bad("a sum-fold combine seed must be 0 (it re-adds per " +
              "shard in ES — shard-count-dependent)")
          ArrFold(v, "sum", 0.0)
        case CombineArrMinMax(acc, seed, lv, v, acc2, op, acc3, lv2, ret)
            if acc == acc2 && acc == acc3 && acc == ret && lv == lv2 =>
          ArrFold(v, op, seedValue(seed))
        case other => bad(s"unsupported combine_script '$combineNorm' " +
          "(return state / return state.<v> / a sum|min|max fold " +
          "over state.<v>)")
      }
    }
    combine match {
      case ScalarOf(v) =>
        if (!seeds.contains(v))
          bad(s"combine_script returns state.$v which init never seeds")
        if (accs.get(v).exists(_.isInstanceOf[ArrAcc]))
          bad(s"combine_script returns the LIST state.$v — fold it " +
            "to a scalar in the combine (order-independent forms only)")
      case ArrFold(v, _, _) =>
        if (!accs.get(v).exists(_.isInstanceOf[ArrAcc]))
          bad(s"combine folds state.$v which is not an array " +
            "accumulator")
      case WholeState => ()
    }

    // reduce: the fold over states. The reduce's op must AGREE with
    // the accumulator's (and the combine's) — min-of-per-shard-sums
    // and friends are shard-count-dependent, rejected below by the
    // kind match.
    val reduce = compact(sourceOf(body.get("reduce_script"),
      "reduce_script"))
    // (target accumulator, reduce op, reduce seed)
    val (target, reduceOp, reduceSeed): (String, String, Double) =
      (combine, reduce) match {
        case (WholeState, ReduceState(acc, seed, lv, acc2, lv2, v, ret))
            if acc == acc2 && acc == ret && lv == lv2 =>
          if (!seeds.contains(v))
            bad(s"reduce_script folds a.$v which init never seeds")
          if (seedValue(seed) != 0.0)
            bad("a sum-fold reduce seed must be 0")
          (v, "sum", 0.0)
        case (WholeState,
              ReduceStateMinMax(acc, seed, lv, acc2, op, acc3, lv2, v,
                ret))
            if acc == acc2 && acc == acc3 && acc == ret && lv == lv2 =>
          if (!seeds.contains(v))
            bad(s"reduce_script folds a.$v which init never seeds")
          (v, op, seedValue(seed))
        case (ScalarOf(v), ReduceScalar(acc, seed, lv, acc2, lv2, ret))
            if acc == acc2 && acc == ret && lv == lv2 =>
          if (seedValue(seed) != 0.0)
            bad("a sum-fold reduce seed must be 0")
          (v, "sum", 0.0)
        case (ScalarOf(v),
              ReduceScalarMinMax(acc, seed, lv, acc2, op, acc3, lv2, ret))
            if acc == acc2 && acc == acc3 && acc == ret && lv == lv2 =>
          (v, op, seedValue(seed))
        case (ArrFold(v, _, _),
              ReduceScalar(acc, seed, lv, acc2, lv2, ret))
            if acc == acc2 && acc == ret && lv == lv2 =>
          if (seedValue(seed) != 0.0)
            bad("a sum-fold reduce seed must be 0")
          (v, "sum", 0.0)
        case (ArrFold(v, _, _),
              ReduceScalarMinMax(acc, seed, lv, acc2, op, acc3, lv2, ret))
            if acc == acc2 && acc == acc3 && acc == ret && lv == lv2 =>
          (v, op, seedValue(seed))
        case (WholeState, _) =>
          bad("unsupported reduce_script (expected a sum or Math.min/" +
            "max fold: double t = <seed>; for (a in states) " +
            "{ t += a.<v> | t = Math.min(t, a.<v>) } return t)")
        case _ =>
          bad("unsupported reduce_script (expected the scalar fold: " +
            "double t = <seed>; for (a in states) { t += a | " +
            "t = Math.min(t, a) } return t)")
      }

    // cross-stage agreement + the compiled fold
    val acc = accs.getOrElse(target,
      bad(s"map_script never accumulates state.$target"))
    def least2(cols: Seq[Column]): Column =
      if (cols.size == 1) cols.head else least(cols: _*)
    def greatest2(cols: Seq[Column]): Column =
      if (cols.size == 1) cols.head else greatest(cols: _*)
    (acc, combine, reduceOp) match {
      case (SumAcc(exprs), (WholeState | ScalarOf(_)), "sum") =>
        val perDoc = exprs.map(_.cast("double")).reduce(_ + _)
        // seed 0 + Σ per-doc contributions; an empty match set
        // reduces to 0.0 exactly as ES's reduce of empty states does
        coalesce(sum(perDoc), lit(0.0)).as(alias)
      case (MinMaxAcc(op, initSeed, exprs), (WholeState | ScalarOf(_)),
            rop) if rop == op =>
        // min/max are idempotent: every literal seed CLAMPS instead of
        // re-adding, so the result is fold(seeds..., fold(values)) on
        // any shard count — least/greatest ignore the null an empty
        // match set aggregates to, leaving the seed clamp
        val perDoc =
          if (op == "min") least2(exprs.map(_.cast("double")))
          else greatest2(exprs.map(_.cast("double")))
        val clamp = lit(if (op == "min") math.min(initSeed, reduceSeed)
                        else math.max(initSeed, reduceSeed))
        val folded =
          if (op == "min") least(clamp, min(perDoc))
          else greatest(clamp, max(perDoc))
        folded.as(alias)
      case (ArrAcc(exprs), ArrFold(_, cop, combineSeed), rop)
          if cop == rop =>
        cop match {
          case "sum" =>
            val perDoc = exprs.map(_.cast("double")).reduce(_ + _)
            coalesce(sum(perDoc), lit(0.0)).as(alias)
          case op =>
            val perDoc =
              if (op == "min") least2(exprs.map(_.cast("double")))
              else greatest2(exprs.map(_.cast("double")))
            val clamp =
              lit(if (op == "min") math.min(combineSeed, reduceSeed)
                  else math.max(combineSeed, reduceSeed))
            if (op == "min") least(clamp, min(perDoc)).as(alias)
            else greatest(clamp, max(perDoc)).as(alias)
        }
      case (ArrAcc(_), WholeState | ScalarOf(_), _) =>
        bad(s"an array accumulator needs a fold-to-scalar " +
          "combine_script (order-independent forms only)")
      case (_, _, rop) =>
        bad(s"the map, combine and reduce folds must agree — a " +
          s"$rop-reduce over a different per-shard fold is " +
          "shard-count-dependent")
    }
  }
}

package graft.serving

/** ES `minimum_should_match` specification resolver — the full grammar
  * the reference's passthrough search body would hand to Elasticsearch
  * (reference: src/search_api.py:38-46 forwards the DSL verbatim; ES
  * resolves it per its documented rules):
  *
  *   - `3`        positive integer: that many terms required;
  *   - `-2`       negative integer: total minus that many required;
  *   - `75%`      percentage of the total, ROUNDED DOWN;
  *   - `-25%`     that percentage may be MISSING (rounded down, then
  *                subtracted from the total);
  *   - `3<90%`    conditional: totals ≤ 3 require ALL terms, larger
  *                totals apply the right-hand spec;
  *   - `2<-25% 9<-3`  multiple space-separated conditionals: the one
  *                with the largest integer bound still below the total
  *                applies (≤2 → all, 3–9 → all but 25%, >9 → all but 3).
  *
  * Resolution happens against the DISTINCT query-term count, the same
  * "optional clause" count the scorers' match predicate uses. The result
  * is returned unclamped; [[Search.multiFieldMinShould]] and
  * [[graft.sinks.SearchIndex.minShould]] apply their shared
  * max(1, min(n, total)) clamp, which is also how a ≤0 resolution
  * degrades to the token-exact OR.
  */
object MinShouldMatch {

  /** None = malformed spec (caller maps to a 400, never a silent 0). */
  def resolve(spec: String, total: Int): Option[Int] = {
    val s = spec.trim
    if (s.isEmpty) None
    else if (s.contains("<")) {
      val conds = s.split("\\s+").toSeq.map { p =>
        val i = p.indexOf('<')
        val bound = if (i > 0) p.substring(0, i) else ""
        val sub = p.substring(i + 1)
        if (!bound.matches("\\d+") || sub.contains("<")) return None
        simple(sub, total) match {
          case Some(v) => (bound.toInt, v)
          case None    => return None
        }
      }
      val applicable = conds.filter(_._1 < total)
      if (applicable.isEmpty) Some(total) // at-or-below every bound: all
      else Some(applicable.maxBy(_._1)._2)
    } else simple(s, total)
  }

  private def simple(s: String, total: Int): Option[Int] =
    if (s.matches("-?\\d+%")) {
      val pct = s.dropRight(1).toInt
      if (pct >= 0) Some(pct * total / 100)      // rounded down
      else Some(total - (-pct) * total / 100)    // missing share, floor
    } else if (s.matches("-?\\d+")) {
      val n = s.toInt
      if (n >= 0) Some(n) else Some(total + n)
    } else None
}

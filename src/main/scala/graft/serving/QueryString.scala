package graft.serving

import scala.collection.mutable.ArrayBuffer

/** Parser for the ES `query_string` syntax — the full Lucene classic
  * query language, the strict sibling of [[SimpleQueryString]] (the
  * reference's passthrough forwards both alike:
  * src/search_api.py:38-46). Unlike simple_query_string, query_string
  * is STRICT: a syntax error is the caller's error — [[ParseError]] —
  * which the HTTP layer maps to a 400 naming the defect, exactly ES's
  * contract ("Failed to parse query").
  *
  * Supported grammar (the classic QueryParser core):
  *
  *   - `field:atom`, `field:(grouped …)` field scoping; `_exists_:f`
  *     and `field:*` existence tests
  *   - `AND`/`&&`, `OR`/`||` conjunctions with Lucene's classic
  *     left-to-right occur resolution (NOT a precedence grammar:
  *     `a AND b OR c` means `+a +b c`, see [[addClause]])
  *   - `NOT`/`!`/`-` negation, `+` requirement
  *   - `"quoted phrase"~N` (slop), `term~N` fuzziness (N ∈ 0..2,
  *     Lucene's valid edit distances; bare `~` = 2), `term^B` boosts
  *     on any atom or group
  *   - `te?t` / `te*t` wildcard atoms (token-level), `pre*` prefix
  *   - `field:[a TO b]` / `{a TO b}` ranges (mixed brackets allowed,
  *     `*` = unbounded)
  *   - `(...)` grouping, `\x` escapes
  *
  * The parse result is field-annotated; compilation to Catalyst
  * columns lives in [[EsDsl]] (atoms without a field scope expand over
  * the request's default fields there).
  */
object QueryString {

  final case class ParseError(msg: String)
    extends IllegalArgumentException(s"query_string syntax: $msg")

  sealed trait Node
  final case class Term(field: Option[String], t: String) extends Node
  final case class Phrase(field: Option[String], terms: Seq[String],
                          slop: Int) extends Node
  final case class Prefix(field: Option[String], p: String) extends Node
  final case class Wild(field: Option[String], pat: String) extends Node
  final case class Fuzzy(field: Option[String], t: String,
                         edits: Int) extends Node
  final case class Range(field: String, lo: Option[String],
                         hi: Option[String], incLo: Boolean,
                         incHi: Boolean) extends Node
  final case class Exists(field: String) extends Node
  final case class Boost(x: Node, b: Double) extends Node
  /** The classic BooleanQuery: every clause carries its resolved
    * occur. `should` is optional when `must` is non-empty, else at
    * least one should clause must match — ES's combination rule. */
  final case class Bool(must: Seq[Node], should: Seq[Node],
                        mustNot: Seq[Node]) extends Node

  def parse(query: String): Node = parse(query, defaultAnd = false)

  // ------------------------------------------------------------ parser

  private sealed trait Occur
  private case object Must extends Occur
  private case object Should extends Occur
  private case object MustNot extends Occur

  private sealed trait Conj
  private case object NoConj extends Conj
  private case object ConjAnd extends Conj
  private case object ConjOr extends Conj

  private final class P(q: String) {
    private var i = 0

    private def ws(): Unit = {
      while (i < q.length && q.charAt(i).isWhitespace) i += 1
    }

    private def peek: Int = if (i < q.length) q.charAt(i) else -1

    def expectEnd(): Unit = {
      ws()
      if (i < q.length)
        throw ParseError(s"unexpected '${q.charAt(i)}' at offset $i")
    }

    /** Reads an AND/OR keyword (or &&/||) if present. */
    private def readConj(): Conj = {
      ws()
      if (q.startsWith("&&", i)) { i += 2; ConjAnd }
      else if (q.startsWith("||", i)) { i += 2; ConjOr }
      else if (keywordAt("AND")) { i += 3; ConjAnd }
      else if (keywordAt("OR")) { i += 2; ConjOr }
      else NoConj
    }

    /** `+` / `-` / `!` / `NOT` modifier ahead of a clause. */
    private def readMods(): Option[Occur] = {
      ws()
      if (peek == '+') { i += 1; Some(Must) }
      // a `-` at clause position is always the modifier (`-term`
      // negates); a mid-term `-` never reaches here because term
      // scanning consumes it as an ordinary character
      else if (peek == '-') { i += 1; Some(MustNot) }
      else if (peek == '!') { i += 1; Some(MustNot) }
      else if (keywordAt("NOT")) { i += 3; Some(MustNot) }
      else None
    }

    private def keywordAt(kw: String): Boolean =
      q.startsWith(kw, i) && {
        val j = i + kw.length
        j >= q.length || q.charAt(j).isWhitespace || q.charAt(j) == '(' ||
          q.charAt(j) == '"'
      }

    /** The classic QueryParser clause loop with Lucene's retroactive
      * occur rules (QueryParserBase.addClause): `x AND y` promotes the
      * preceding clause to MUST; with default_operator=and, `x OR y`
      * demotes the preceding clause to SHOULD. Only a prohibited
      * (`-`/NOT) neighbor is exempt from retroaction — Lucene rewrites
      * even an explicit `+`. */
    def parseQuery(fieldScope: Option[String], depth: Int): Node = {
      val clauses = ArrayBuffer[(Occur, Node)]()
      var first = true
      var done = false
      while (!done) {
        ws()
        if (i >= q.length || (depth > 0 && peek == ')')) done = true
        else {
          val conj = if (first) NoConj else readConj()
          val mods = readMods()
          ws()
          if (i >= q.length || (depth > 0 && peek == ')')) {
            if (conj != NoConj || mods.nonEmpty)
              throw ParseError("dangling operator at end of input")
            done = true
          } else {
            val node = parseClause(fieldScope)
            addClause(clauses, conj, mods, node)
            first = false
          }
        }
      }
      if (clauses.isEmpty)
        throw ParseError(if (depth > 0) "empty group" else "empty query")
      build(clauses.toSeq)
    }

    private def addClause(clauses: ArrayBuffer[(Occur, Node)],
                          conj: Conj, mods: Option[Occur],
                          node: Node): Unit = {
      // retroactive adjustment of the PREVIOUS clause — Lucene's exact
      // rules: AND always promotes a non-prohibited neighbor to MUST;
      // OR demotes one to SHOULD only under default_operator=and
      if (clauses.nonEmpty && clauses.last._1 != MustNot) {
        val (_, pNode) = clauses.last
        if (conj == ConjAnd)
          clauses(clauses.length - 1) = (Must, pNode)
        else if (conj == ConjOr && defaultAndOp)
          clauses(clauses.length - 1) = (Should, pNode)
      }
      val occur =
        if (mods.contains(MustNot)) MustNot
        else if (defaultAndOp) { if (conj == ConjOr) Should else Must }
        else if (mods.contains(Must) || conj == ConjAnd) Must
        else Should
      clauses += ((occur, node))
      ()
    }

    private def build(clauses: Seq[(Occur, Node)]): Node =
      clauses match {
        case Seq((Should, n)) => n
        case Seq((Must, n))   => n
        case cs => Bool(
          cs.collect { case (Must, n) => n },
          cs.collect { case (Should, n) => n },
          cs.collect { case (MustNot, n) => n })
      }

    // ------------------------------------------------------- clauses

    private def parseClause(fieldScope: Option[String]): Node = {
      ws()
      if (keywordAt("AND") || keywordAt("OR"))
        throw ParseError(s"misplaced operator at offset $i")
      if (peek == '(') {
        i += 1
        val inner = parseQuery(fieldScope, depth = 1)
        ws()
        if (peek != ')') throw ParseError("unclosed group")
        i += 1
        withBoost(inner)
      } else if (peek == '"') {
        withBoost(parsePhrase(fieldScope))
      } else {
        // a bare token — possibly `field:` scoping first
        fieldAhead() match {
          case Some(f) =>
            if (fieldScope.isDefined)
              throw ParseError(s"nested field scope '$f' inside " +
                s"'${fieldScope.get}:'")
            ws()
            if (f == "_exists_") {
              val target = readTermRaw()
              if (target.text.isEmpty)
                throw ParseError("_exists_: needs a field name")
              if (target.wildcard || target.fuzzy.nonEmpty)
                throw ParseError("_exists_: takes a plain field name")
              withBoost(Exists(target.text))
            }
            else if (peek == '(') {
              i += 1
              val inner = parseQuery(Some(f), depth = 1)
              ws()
              if (peek != ')') throw ParseError("unclosed group")
              i += 1
              withBoost(inner)
            }
            else if (peek == '[' || peek == '{') withBoost(parseRange(f))
            else if (peek == '"') withBoost(parsePhrase(Some(f)))
            else withBoost(parseAtom(Some(f)))
          case None =>
            withBoost(parseAtom(fieldScope))
        }
      }
    }

    /** Lookahead for `fieldname:` — identifier chars then a colon. */
    private def fieldAhead(): Option[String] = {
      var j = i
      while (j < q.length && (q.charAt(j).isLetterOrDigit ||
          q.charAt(j) == '_' || q.charAt(j) == '.')) j += 1
      if (j > i && j < q.length && q.charAt(j) == ':') {
        val f = q.substring(i, j)
        i = j + 1
        Some(f)
      } else None
    }

    private def parsePhrase(field: Option[String]): Node = {
      i += 1 // opening quote
      val sb = new StringBuilder
      var closed = false
      while (i < q.length && !closed) {
        val c = q.charAt(i)
        if (c == '\\' && i + 1 < q.length) { i += 1; sb.append(q.charAt(i)) }
        else if (c == '"') closed = true
        else sb.append(c)
        i += 1
      }
      if (!closed) throw ParseError("unclosed phrase quote")
      var slop = 0
      if (peek == '~') {
        i += 1
        slop = readIntStrict("phrase slop")
      }
      val terms = graft.functions.TextFunctions.analyzeText(sb.toString)
      if (terms.isEmpty) throw ParseError("empty phrase")
      Phrase(field, terms, slop)
    }

    private def parseRange(field: String): Node = {
      val incLo = peek == '['
      i += 1
      val lo = readRangeBound()
      ws()
      if (!keywordAt("TO")) throw ParseError("range needs 'TO'")
      i += 2
      ws()
      val hi = readRangeBound()
      ws()
      val c = peek
      if (c != ']' && c != '}') throw ParseError("unclosed range")
      val incHi = c == ']'
      i += 1
      if (lo.isEmpty && hi.isEmpty)
        throw ParseError("range needs at least one bound")
      Range(field, lo, hi, incLo, incHi)
    }

    private def readRangeBound(): Option[String] = {
      ws()
      val sb = new StringBuilder
      while (i < q.length && !q.charAt(i).isWhitespace &&
          q.charAt(i) != ']' && q.charAt(i) != '}') {
        if (q.charAt(i) == '\\' && i + 1 < q.length) i += 1
        sb.append(q.charAt(i)); i += 1
      }
      val s = sb.toString
      if (s.isEmpty) throw ParseError("empty range bound")
      if (s == "*") None else Some(s)
    }

    private final case class RawTerm(text: String, wildcard: Boolean,
                                     fuzzy: Option[Int])

    /** Characters that end a bare term. `*`/`?` stay IN the token
      * (wildcards); `+`/`-`/`!` mid-term are ordinary characters
      * (`foo-bar` is one term) — they only modify at clause start. */
    private def readTermRaw(): RawTerm = {
      val sb = new StringBuilder
      var wild = false
      var stop = false
      while (i < q.length && !stop) {
        val c = q.charAt(i)
        if (c.isWhitespace || c == '(' || c == ')' || c == '"' ||
            c == '^' || c == '~' || c == ':' || c == '[' || c == ']' ||
            c == '{' || c == '}') stop = true
        else {
          if (c == '\\' && i + 1 < q.length) {
            i += 1; sb.append(q.charAt(i))
          } else {
            if (c == '*' || c == '?') wild = true
            sb.append(c)
          }
          i += 1
        }
      }
      var fuzzy: Option[Int] = None
      if (peek == '~') {
        i += 1
        if (i < q.length && q.charAt(i).isDigit) {
          val n = readIntStrict("fuzziness")
          if (n > 2) throw ParseError(
            s"valid fuzzy edit distances are 0..2, got $n")
          fuzzy = Some(n)
        } else fuzzy = Some(2) // bare `~`: Lucene's default
      }
      RawTerm(sb.toString, wild, fuzzy)
    }

    private def parseAtom(field: Option[String]): Node = {
      val raw = readTermRaw()
      if (raw.text.isEmpty)
        throw ParseError(s"expected a term at offset $i" +
          (if (i < q.length) s" (found '${q.charAt(i)}')" else ""))
      val t = raw.text.toLowerCase
      if (raw.fuzzy.nonEmpty && raw.wildcard)
        throw ParseError("a term cannot be both fuzzy and wildcard")
      raw.fuzzy match {
        case Some(e) => Fuzzy(field, t, e)
        case None if t == "*" =>
          field match {
            case Some(f) => Exists(f)
            case None    => throw ParseError(
              "bare '*' needs a field scope (field:*)")
          }
        case None if raw.wildcard =>
          // single trailing `*`, no `?`: the classic prefix query
          if (t.endsWith("*") && t.indexOf('*') == t.length - 1 &&
              !t.contains('?'))
            Prefix(field, t.dropRight(1))
          else Wild(field, t)
        case None => Term(field, t)
      }
    }

    private def withBoost(n: Node): Node = {
      if (peek == '^') {
        i += 1
        val start = i
        while (i < q.length && (q.charAt(i).isDigit ||
            q.charAt(i) == '.')) i += 1
        if (i == start) throw ParseError("'^' needs a number")
        // "1.2.3" / "." are digit-dot runs toDouble rejects — keep the
        // strict contract's typed error, never a NumberFormatException
        val b = scala.util.Try(q.substring(start, i).toDouble)
          .getOrElse(throw ParseError(
            s"malformed boost '${q.substring(start, i)}'"))
        if (b <= 0) throw ParseError("boost must be positive")
        Boost(n, b)
      } else n
    }

    private def readIntStrict(what: String): Int = {
      val start = i
      while (i < q.length && q.charAt(i).isDigit) i += 1
      if (i == start) throw ParseError(s"'~' needs an integer ($what)")
      // Try, not a digit-count cap: "0000000010" is a valid 10 and
      // 1000000000 a valid Int; only genuine overflow is an error
      scala.util.Try(q.substring(start, i).toInt).getOrElse(
        throw ParseError(s"$what value out of range"))
    }

    // bound late so parseQuery can consult the option during the
    // clause loop; set by the companion entry point below
    var defaultAndOp: Boolean = false
  }

  /** Parse with an explicit default operator (ES `default_operator`,
    * default `or`). */
  def parse(query: String, defaultAnd: Boolean): Node = {
    val p = new P(query)
    p.defaultAndOp = defaultAnd
    val n = p.parseQuery(None, depth = 0)
    p.expectEnd()
    n
  }
}

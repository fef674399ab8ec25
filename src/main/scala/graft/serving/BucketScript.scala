package graft.serving

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the arithmetic subset of Painless that ES
  * `bucket_script` / `bucket_selector` pipeline aggregations accept
  * (reference forwards these bodies verbatim to its ES 8.11 backend,
  * `src/es_connector.py:85-95`). The grammar is the expression layer
  * every real bucket script uses — `params.<name>` references bound
  * by the agg's `buckets_path` map, numeric literals, `+ - * / %`,
  * comparisons, `&& ||`, unary `- !`, parentheses — compiled straight
  * to a Catalyst [[Column]] so the script runs inside whole-stage
  * codegen over the bucket table. Also in the grammar (round 11):
  * the ternary `?:` and the `Math.*` members real scripts lean on
  * (abs/max/min/sqrt/pow/log/log10/exp/floor/ceil — each maps to the
  * engine-identical DuckDB function, so scripted oracles replay).
  * Anything outside (other method calls, strings, assignments)
  * rejects BY NAME at parse time: a silently-misread script must
  * never yield a silently different bucket value.
  *
  * Precedence (loosest to tightest): ternary `?:`
  * (right-associative), `||`, `&&`, equality `== !=`, relational
  * `< <= > >=`, additive `+ -`, multiplicative `* / %`, unary `- !`,
  * primary. Mirrors Java/Painless, so a script means here exactly
  * what it means in ES.
  */
private[serving] object BucketScript {

  final case class ScriptError(msg: String)
    extends IllegalArgumentException(msg)

  /** Compile `script` to a Column over `params`. Numeric result —
    * [[EsDsl]] casts/validates per call site.
    *
    * `vars` binds BARE identifiers (`_score` in `script_score`);
    * `fieldRef`, when given, enables `doc['field'].value` document
    * references (the script_score/script-query surface — absent for
    * bucket pipelines, where a doc ref is meaningless and rejects by
    * name). */
  def compile(script: String, params: Map[String, Column],
              vars: Map[String, Column] = Map.empty,
              fieldRef: Option[String => Column] = None): Column =
    new Parser(script, params, vars, fieldRef).compile()

  private final class Parser(src: String, params: Map[String, Column],
                             vars: Map[String, Column],
                             fieldRef: Option[String => Column]) {
    private var pos = 0

    def compile(): Column = {
      val c = ternary()
      skipWs()
      if (pos < src.length)
        fail(s"unexpected trailing input '${src.substring(pos)}'")
      c
    }

    /** `cond ? a : b`, right-associative like Java/Painless; both
      * arms are full ternaries themselves. */
    private def ternary(): Column = {
      val c = orExpr()
      if (eat("?")) {
        val t = ternary()
        if (!eat(":")) fail("expected ':' of ternary")
        val f = ternary()
        when(c, t).otherwise(f)
      } else c
    }

    private def fail(msg: String): Nothing =
      throw ScriptError(s"bucket script: $msg (at offset $pos of " +
        s"'$src')")

    private def skipWs(): Unit =
      while (pos < src.length && src.charAt(pos).isWhitespace) pos += 1

    private def peek(tok: String): Boolean = {
      skipWs()
      src.startsWith(tok, pos)
    }

    private def eat(tok: String): Boolean = {
      if (peek(tok)) { pos += tok.length; true } else false
    }

    private def orExpr(): Column = {
      var c = andExpr()
      while (eat("||")) c = c || andExpr()
      c
    }

    private def andExpr(): Column = {
      var c = eqExpr()
      while (peek("&&")) { eat("&&"); c = c && eqExpr() }
      c
    }

    private def eqExpr(): Column = {
      var c = relExpr()
      var done = false
      while (!done) {
        if (eat("==")) c = c === relExpr()
        else if (eat("!=")) c = c =!= relExpr()
        else done = true
      }
      c
    }

    private def relExpr(): Column = {
      var c = addExpr()
      var done = false
      while (!done) {
        // two-char forms first: '<=' must not lex as '<' + '='
        if (eat("<=")) c = c <= addExpr()
        else if (eat(">=")) c = c >= addExpr()
        else if (eat("<")) c = c < addExpr()
        else if (eat(">")) c = c > addExpr()
        else done = true
      }
      c
    }

    private def addExpr(): Column = {
      var c = mulExpr()
      var done = false
      while (!done) {
        if (eat("+")) c = c + mulExpr()
        else if (peek("-") && !peek("->")) { eat("-"); c = c - mulExpr() }
        else done = true
      }
      c
    }

    private def mulExpr(): Column = {
      var c = unary()
      var done = false
      while (!done) {
        if (eat("*")) c = c * unary()
        // '/' is never a comment start here — reject '//' outright so
        // a commented script can't half-parse
        else if (peek("//")) fail("'//' is not an operator")
        else if (eat("/")) c = c / unary()
        else if (eat("%")) c = c % unary()
        else done = true
      }
      c
    }

    private def unary(): Column = {
      if (eat("-")) -unary()
      else if (eat("!")) !unary()
      else primary()
    }

    private def primary(): Column = {
      skipWs()
      if (pos >= src.length) fail("unexpected end of script")
      val ch = src.charAt(pos)
      if (ch == '(') {
        pos += 1
        val c = ternary()
        if (!eat(")")) fail("expected ')'")
        c
      } else if (ch.isDigit || (ch == '.' && pos + 1 < src.length &&
          src.charAt(pos + 1).isDigit)) {
        number()
      } else if (src.startsWith("params.", pos) ||
          src.startsWith("params[", pos)) {
        paramRef()
      } else if (src.startsWith("doc[", pos)) {
        docRef()
      } else if (src.startsWith("ctx._source.", pos)) {
        // update-by-query scripts reference fields as ctx._source.<f>
        // — same resolver as doc['<f>'].value
        val resolve = fieldRef.getOrElse(
          fail("ctx._source references are not available in this " +
            "script context"))
        pos += "ctx._source.".length
        resolve(ident())
      } else if (src.startsWith("Math.", pos)) {
        mathCall()
      } else if (ch.isLetter || ch == '_') {
        val id = ident()
        vars.getOrElse(id,
          fail(s"unsupported identifier '$id' — params.<name> " +
            (if (fieldRef.isDefined) ", doc['<field>'].value" else "") +
            (if (vars.nonEmpty)
              s", ${vars.keys.toSeq.sorted.mkString("/")}" else "") +
            " and numeric literals are supported"))
      } else fail(s"unexpected character '$ch'")
    }

    /** `Math.<member>(args)` — the Painless/Java Math members that
      * have an engine-identical DuckDB twin. Unary: abs sqrt log
      * log10 exp floor ceil; binary: max min pow. Other members
      * reject by name. */
    private def mathCall(): Column = {
      pos += "Math.".length
      val member = ident()
      skipWs()
      if (!eat("(")) fail(s"expected '(' after Math.$member")
      val args = scala.collection.mutable.ArrayBuffer(ternary())
      while (eat(",")) args += ternary()
      if (!eat(")")) fail(s"expected ')' closing Math.$member")
      def one: Column = {
        if (args.size != 1)
          fail(s"Math.$member takes exactly one argument")
        args(0)
      }
      def two: (Column, Column) = {
        if (args.size != 2)
          fail(s"Math.$member takes exactly two arguments")
        (args(0), args(1))
      }
      member match {
        case "abs"   => abs(one)
        case "sqrt"  => sqrt(one)
        case "log"   => log(one)          // natural log, like Java
        case "log10" => log10(one)
        case "exp"   => exp(one)
        case "floor" => floor(one)
        case "ceil"  => ceil(one)
        case "max"   => { val (a, b) = two; greatest(a, b) }
        case "min"   => { val (a, b) = two; least(a, b) }
        case "pow"   => { val (a, b) = two; pow(a, b) }
        case other   => fail(s"unsupported Math member '$other' " +
          "(abs/sqrt/log/log10/exp/floor/ceil/max/min/pow)")
      }
    }

    private def ident(): String = {
      val start = pos
      while (pos < src.length && (src.charAt(pos).isLetterOrDigit ||
          src.charAt(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      src.substring(start, pos)
    }

    /** `doc['field'].value` (or double-quoted) — the Painless doc-
      * values accessor every real script uses. Other accessors
      * (`.size()`, `.empty`, bare `doc['f']`) reject by name. */
    private def docRef(): Column = {
      val resolve = fieldRef.getOrElse(
        fail("doc['<field>'] references are not available in this " +
          "script context"))
      pos += "doc[".length
      skipWs()
      if (pos >= src.length) fail("unterminated doc reference")
      val q = src.charAt(pos)
      if (q != '\'' && q != '"') fail("expected quoted field name")
      pos += 1
      val end = src.indexOf(q, pos)
      if (end < 0) fail("unterminated field name")
      val name = src.substring(pos, end)
      pos = end + 1
      skipWs()
      if (!eat("]")) fail("expected ']'")
      if (!eat(".value"))
        fail(s"only doc['$name'].value is supported (not .size()/" +
          ".empty)")
      resolve(name)
    }

    private def paramRef(): Column = {
      val name =
        if (src.startsWith("params.", pos)) {
          pos += "params.".length
          ident()
        } else {
          pos += "params[".length
          skipWs()
          val q = src.charAt(pos)
          if (q != '\'' && q != '"') fail("expected quoted param name")
          pos += 1
          val end = src.indexOf(q, pos)
          if (end < 0) fail("unterminated param name")
          val n = src.substring(pos, end)
          pos = end + 1
          if (!eat("]")) fail("expected ']'")
          n
        }
      params.getOrElse(name,
        fail(s"script references params.$name but buckets_path has " +
          s"no '$name' entry"))
    }

    private def number(): Column = {
      val start = pos
      while (pos < src.length && src.charAt(pos).isDigit) pos += 1
      var isDouble = false
      if (pos < src.length && src.charAt(pos) == '.') {
        isDouble = true
        pos += 1
        while (pos < src.length && src.charAt(pos).isDigit) pos += 1
      }
      if (pos < src.length &&
          (src.charAt(pos) == 'e' || src.charAt(pos) == 'E')) {
        isDouble = true
        pos += 1
        if (pos < src.length &&
            (src.charAt(pos) == '+' || src.charAt(pos) == '-')) pos += 1
        while (pos < src.length && src.charAt(pos).isDigit) pos += 1
      }
      val text = src.substring(start, pos)
      // a malformed literal ("2e", an over-Long integer) must surface
      // as the parser's named error, not a raw NumberFormatException
      try {
        if (isDouble) lit(text.toDouble)
        else lit(text.toLong) // integral literal stays integral, like
                              // Painless — 5 / 2 over long paths is
                              // still Spark's true division (double)
      } catch {
        case _: NumberFormatException =>
          fail(s"malformed numeric literal '$text'")
      }
    }
  }
}

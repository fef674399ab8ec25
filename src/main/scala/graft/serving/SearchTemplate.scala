package graft.serving

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Search templates — ES's `_search/template` / `_render/template`
  * surface (the reference's ES 8.11 stack serves both; reference:
  * docker-compose.yml:5, the passthrough in src/search_api.py:38-46
  * forwards any search endpoint a client replays). A template is a
  * search body with mustache placeholders; rendering substitutes the
  * request's `params` and the result runs through the ordinary DSL
  * path — templates add NO execution machinery, only a text phase, so
  * every scale property of the compiled query is unchanged.
  *
  * The mustache subset implemented (ES's documented template
  * features, from-scratch recursive descent — not Mustache.java):
  *
  *   - `{{var}}` — scalar substitution, dotted paths (`user.name`).
  *     Strings insert verbatim (the template supplies its own quotes,
  *     ES convention) with JSON string escaping of the VALUE so a
  *     quote in a param cannot break out of its string literal.
  *     Numbers/booleans insert in JSON form; missing or null renders
  *     empty (mustache's default).
  *   - `{{#toJson}}path{{/toJson}}` — the param serialized as JSON
  *     (arrays/objects land syntactically whole).
  *   - `{{#join}}path{{/join}}` — array joined with `,` (ES's custom
  *     join tag; scalars render as themselves).
  *   - `{{#name}}...{{/name}}` — section: arrays iterate (each
  *     element becomes the scope, `{{.}}` is the element), objects
  *     scope, `true` renders once, `false`/null/missing/empty-array
  *     render nothing.
  *   - `{{^name}}...{{/name}}` — inverted section (renders exactly
  *     when the section would not).
  *
  * Anything else (`{{&raw}}`, partials `{{>}}`, delimiters `{{=}}`)
  * throws `IllegalArgumentException` — fail-loud like the rest of the
  * DSL surface; the HTTP layer maps it to a 400 naming the construct.
  */
object SearchTemplate {

  private val mapper = new ObjectMapper()

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  // ---------------------------------------------------------------
  // Parse: template text -> segment tree
  // ---------------------------------------------------------------

  private sealed trait Seg
  private final case class Text(s: String) extends Seg
  private final case class Var(path: String) extends Seg
  private final case class Section(name: String, inverted: Boolean,
                                   body: Vector[Seg]) extends Seg

  /** One pass over the text; sections recurse. `at` is the cursor,
    * returns (segments, cursor) — a close tag for `until` ends the
    * level. */
  private def parse(t: String, at: Int,
                    until: Option[String]): (Vector[Seg], Int) = {
    val out = ArrayBuffer[Seg]()
    var i = at
    while (i < t.length) {
      val open = t.indexOf("{{", i)
      if (open < 0) {
        out += Text(t.substring(i))
        i = t.length
      } else {
        if (open > i) out += Text(t.substring(i, open))
        val close = t.indexOf("}}", open + 2)
        if (close < 0) bad("unclosed {{ in template")
        val tag = t.substring(open + 2, close).trim
        if (tag.isEmpty) bad("empty {{}} tag in template")
        tag.charAt(0) match {
          case '#' | '^' =>
            val name = tag.substring(1).trim
            if (name.isEmpty) bad("empty section name in template")
            val (body, next) = parse(t, close + 2, Some(name))
            out += Section(name, tag.charAt(0) == '^', body)
            i = next
          case '/' =>
            val name = tag.substring(1).trim
            until match {
              case Some(u) if u == name => return (out.toVector, close + 2)
              case Some(u) => bad(s"mismatched close tag {{/$name}} " +
                s"(open section is '$u')")
              case None => bad(s"close tag {{/$name}} with no open section")
            }
          case '&' | '>' | '=' | '!' =>
            bad(s"unsupported mustache construct '{{${tag.charAt(0)}...'")
          case '{' =>
            // triple mustache {{{var}}} (unescaped interpolation):
            // reject by name like '&' — parsing it as a var named
            // "{var" would render empty and leave a stray '}' behind
            bad("unsupported mustache construct '{{{...}}}' " +
              "(unescaped triple mustache)")
          case _ =>
            out += Var(tag)
            i = close + 2
        }
      }
    }
    until match {
      case Some(u) => bad(s"unclosed section {{#$u}} in template")
      case None    => (out.toVector, i)
    }
  }

  // ---------------------------------------------------------------
  // Render: segment tree + params scope chain -> text
  // ---------------------------------------------------------------

  /** Resolve a dotted path against the scope chain (innermost first —
    * mustache's context stack). `.` is the current scope itself. */
  private def resolve(path: String, scopes: List[JsonNode])
      : Option[JsonNode] = {
    if (path == ".") return scopes.headOption
    val parts = path.split("\\.", -1)
    if (parts.exists(_.isEmpty)) bad(s"malformed path '$path'")
    // the HEAD name picks the scope (FIRST scope that has it), then
    // the rest of the path walks inside — and if the walk misses
    // there, resolution FAILS rather than falling through to an outer
    // scope that also owns the head (mustache's dotted-name rule: the
    // head is resolved against the stack, the tail only against the
    // head's owner)
    scopes.find(s => s.get(parts.head) != null).flatMap { s =>
      parts.tail.foldLeft(Option(s.get(parts.head))) {
        case (acc, p) => acc.flatMap(n => Option(n.get(p)))
      }
    }
  }

  /** JSON-escape the characters that could break out of a string
    * literal the template put the value inside. */
  private def escape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  private def scalarText(n: JsonNode): String =
    if (n.isTextual) escape(n.asText)
    else if (n.isNumber || n.isBoolean) n.toString
    else bad("a {{var}} placeholder needs a scalar param " +
      "(use {{#toJson}} for arrays and objects)")

  private def render(segs: Vector[Seg], scopes: List[JsonNode],
                     out: StringBuilder): Unit = segs.foreach {
    case Text(s) => out.append(s)
    case Var(p) => resolve(p, scopes) match {
      case Some(n) if !n.isNull => out.append(scalarText(n))
      case _                    => () // mustache: missing renders empty
    }
    case Section("toJson", false, body) =>
      val path = sectionPath("toJson", body)
      resolve(path, scopes).foreach(n => out.append(n.toString))
    case Section("join", false, body) =>
      val path = sectionPath("join", body)
      resolve(path, scopes).foreach { n =>
        if (n.isArray) {
          val it = n.elements()
          val parts = ListBuffer[String]()
          while (it.hasNext) parts += scalarText(it.next())
          out.append(parts.mkString(","))
        } else out.append(scalarText(n))
      }
    case Section(name, inverted, body) =>
      val v = resolve(name, scopes)
      val truthy = v.exists(n => !n.isNull &&
        !(n.isBoolean && !n.asBoolean) && !(n.isArray && n.size == 0))
      if (inverted) {
        if (!truthy) render(body, scopes, out)
      } else v match {
        case Some(n) if n.isArray && truthy =>
          val it = n.elements()
          while (it.hasNext) render(body, it.next() :: scopes, out)
        case Some(n) if n.isObject =>
          render(body, n :: scopes, out)
        case _ if truthy => render(body, scopes, out)
        case _           => ()
      }
  }

  /** `{{#toJson}}`/`{{#join}}` bodies must be exactly one path. */
  private def sectionPath(tag: String, body: Vector[Seg]): String =
    body match {
      case Vector(Text(s)) if s.trim.nonEmpty => s.trim
      case _ => bad(s"{{#$tag}} needs exactly one param path as its body")
    }

  // ---------------------------------------------------------------
  // Public surface
  // ---------------------------------------------------------------

  /** Compile-check only — store-time validation (ES compiles stored
    * templates at PUT time): parses the mustache structure, throws on
    * malformed tags/sections, renders nothing. */
  def validate(source: String): Unit = { parse(source, 0, None); () }

  /** Render template text with `params` (a JSON object; null = no
    * params) to the substituted text. */
  def renderText(source: String, params: JsonNode): String = {
    val scope =
      if (params == null || params.isNull) mapper.createObjectNode()
      else if (params.isObject) params
      else bad("params must be a JSON object")
    val (segs, _) = parse(source, 0, None)
    val out = new StringBuilder
    render(segs, List(scope), out)
    out.toString
  }

  /** Render to a PARSED search body: substitute, then parse the result
    * as JSON — a template whose rendering is not valid JSON is the
    * caller's error, named with the rendered text for debuggability. */
  def renderBody(source: String, params: JsonNode): JsonNode =
    try mapper.readTree(renderText(source, params))
    catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        bad(s"rendered template is not valid JSON: ${e.getMessage}")
    }

  /** The template `source` as text: a string node is the mustache
    * text; an object node (a literal body with placeholders only in
    * VALUES) serializes to its JSON text first — both ES forms. */
  def sourceText(node: JsonNode): String =
    if (node == null || node.isNull) bad("template needs \"source\"")
    else if (node.isTextual) node.asText
    else if (node.isObject) node.toString
    else bad("template source must be a string or an object")
}

package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.SearchTemplate

/** The mustache subset behind `_search/template`: substitution,
  * escaping, sections, toJson/join, and the fail-loud boundary. */
class SearchTemplateSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def p(json: String) = mapper.readTree(json)

  test("scalar substitution: strings verbatim, numbers and booleans " +
    "in JSON form, missing and null render empty, dotted paths") {
    assert(SearchTemplate.renderText("""q={{q}}""", p("""{"q": "spark"}"""))
      == "q=spark")
    assert(SearchTemplate.renderText("""n={{n}} b={{b}}""",
      p("""{"n": 3.5, "b": true}""")) == "n=3.5 b=true")
    assert(SearchTemplate.renderText("""[{{missing}}]""", p("{}")) == "[]")
    assert(SearchTemplate.renderText("""[{{x}}]""", p("""{"x": null}"""))
      == "[]")
    assert(SearchTemplate.renderText("""{{user.name}}""",
      p("""{"user": {"name": "ada"}}""")) == "ada")
  }

  test("string values are JSON-escaped: a quote in a param cannot " +
    "break out of the template's string literal") {
    val out = SearchTemplate.renderBody(
      """{"query": {"term": {"f": "{{v}}"}}}""",
      p("""{"v": "a\"b\\c\nd"}"""))
    assert(out.get("query").get("term").get("f").asText == "a\"b\\c\nd")
  }

  test("toJson inlines arrays and objects syntactically whole; join " +
    "comma-joins an array") {
    assert(SearchTemplate.renderText("""{{#toJson}}xs{{/toJson}}""",
      p("""{"xs": [1, "a", {"k": 2}]}""")) == """[1,"a",{"k":2}]""")
    assert(SearchTemplate.renderText("""{{#join}}xs{{/join}}""",
      p("""{"xs": ["a", "b", 3]}""")) == "a,b,3")
    // scalar under join renders as itself
    assert(SearchTemplate.renderText("""{{#join}}x{{/join}}""",
      p("""{"x": "solo"}""")) == "solo")
  }

  test("sections: arrays iterate with {{.}} scope, objects scope " +
    "fields, booleans gate, inverted renders on absence") {
    assert(SearchTemplate.renderText(
      """{{#xs}}[{{.}}]{{/xs}}""", p("""{"xs": ["a", "b"]}"""))
      == "[a][b]")
    assert(SearchTemplate.renderText(
      """{{#u}}{{name}}/{{outer}}{{/u}}""",
      p("""{"u": {"name": "ada"}, "outer": "o"}""")) == "ada/o")
    assert(SearchTemplate.renderText("""{{#on}}yes{{/on}}""",
      p("""{"on": true}""")) == "yes")
    assert(SearchTemplate.renderText("""{{#on}}yes{{/on}}""",
      p("""{"on": false}""")) == "")
    assert(SearchTemplate.renderText("""{{^xs}}empty{{/xs}}""",
      p("""{"xs": []}""")) == "empty")
    assert(SearchTemplate.renderText("""{{^q}}fallback{{/q}}""",
      p("{}")) == "fallback")
    // truthy string section: renders once, outer scope intact
    assert(SearchTemplate.renderText("""{{#s}}v={{s}}{{/s}}""",
      p("""{"s": "x"}""")) == "v=x")
    // dotted-name rule: the FIRST scope owning the head wins; a tail
    // miss there renders empty rather than falling through to an
    // outer scope that also owns the head (mustache/ES semantics)
    assert(SearchTemplate.renderText(
      """{{#user}}[{{address.city}}]{{/user}}""",
      p("""{"user": {"address": {}},
        |  "address": {"city": "Paris"}}""".stripMargin)) == "[]")
    assert(SearchTemplate.renderText(
      """{{#user}}[{{address.city}}]{{/user}}""",
      p("""{"user": {"x": 1},
        |  "address": {"city": "Paris"}}""".stripMargin)) == "[Paris]")
  }

  test("renderBody parses the substituted text; non-JSON rendering " +
    "and non-scalar {{var}} are named errors") {
    val body = SearchTemplate.renderBody(
      """{"size": {{n}}, "query": {"terms": {"f": {{#toJson}}v{{/toJson}}}}}""",
      p("""{"n": 5, "v": ["a", "b"]}"""))
    assert(body.get("size").asInt == 5)
    assert(body.get("query").get("terms").get("f").size == 2)
    val e1 = intercept[IllegalArgumentException] {
      SearchTemplate.renderBody("""{"a": {{x}}}""", p("{}"))
    }
    assert(e1.getMessage.contains("not valid JSON"))
    val e2 = intercept[IllegalArgumentException] {
      SearchTemplate.renderText("""{{xs}}""", p("""{"xs": [1]}"""))
    }
    assert(e2.getMessage.contains("toJson"))
  }

  test("fail-loud parsing: unclosed tags/sections, mismatched close, " +
    "unsupported constructs; validate() compiles without params") {
    for (t <- Seq("{{q", "{{#s}}x", "{{#a}}{{/b}}", "{{/x}}", "{{}}",
        "{{&raw}}", "{{>partial}}", "{{=<% %>=}}", "{{{raw}}}"))
      intercept[IllegalArgumentException] {
        SearchTemplate.renderText(t, p("{}"))
      }
    SearchTemplate.validate("""{"q": "{{a}}{{#s}}{{b}}{{/s}}"}""")
    intercept[IllegalArgumentException] {
      SearchTemplate.validate("{{#s}}never closed")
    }
  }

  test("sourceText accepts a string or an object template; params " +
    "must be an object") {
    assert(SearchTemplate.sourceText(p(""""{\"a\": 1}"""")) ==
      """{"a": 1}""")
    assert(SearchTemplate.sourceText(p("""{"a": "{{x}}"}""")) ==
      """{"a":"{{x}}"}""")
    intercept[IllegalArgumentException] {
      SearchTemplate.sourceText(p("[1]"))
    }
    intercept[IllegalArgumentException] {
      SearchTemplate.renderText("x", p("[1]"))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.JsonFunctions.normalizeJson

/** F8 recursive JSON normalization (reference: src/json_encoder.py:23-41):
  * string values parsing to objects/arrays are inlined recursively;
  * scalar-looking strings and non-JSON input stay untouched. */
class JsonFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("j").select(normalizeJson(col("j"))).as[String].head()

  test("embedded JSON-object string is inlined recursively") {
    assert(norm("""{"a": "{\"b\": \"{\\\"c\\\": 1}\"}"}""")
      === """{"a":{"b":{"c":1}}}""")
  }

  test("embedded JSON-array string is inlined") {
    assert(norm("""{"xs": "[1, 2, 3]"}""") === """{"xs":[1,2,3]}""")
  }

  test("strings parsing to scalars are NOT replaced") {
    // json.loads("42") succeeds but yields a scalar — the reference only
    // replaces dict/list results
    assert(norm("""{"n": "42", "b": "true"}""")
      === """{"n":"42","b":"true"}""")
  }

  test("non-JSON input passes through unchanged") {
    assert(norm("not json at all") === "not json at all")
  }

  test("empty / whitespace-only input passes through unchanged") {
    // Jackson returns MissingNode (not null) here — must not serialize it
    assert(norm("") === "")
    assert(norm("   ") === "   ")
  }

  test("null stays null; SQL registration works") {
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "j")
      .selectExpr("graft_normalize_json(j)").head()
    assert(r.isNullAt(0))
  }
}

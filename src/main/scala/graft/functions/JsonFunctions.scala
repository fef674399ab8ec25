package graft.functions

import org.apache.spark.sql.Column

/** JSON column functions. [[normalizeJson]] is F8 — the reference's
  * recursive JSON-string normalization (src/json_encoder.py:23-41), the
  * one scalar SURVEY §2.11 calls genuinely custom; the expression lives
  * in [[org.apache.spark.sql.graft.NormalizeJson]]. Schema-bound parsing
  * (F7) needs no custom code: `from_json` / `get_json_object` are
  * built-ins. */
object JsonFunctions {

  /** Recursively normalize a JSON string: any string value that itself
    * parses to a JSON object/array is replaced by the parsed value;
    * non-JSON input passes through unchanged. SQL: `graft_normalize_json`. */
  def normalizeJson(json: Column): Column =
    org.apache.spark.sql.graft.JsonExpressions.normalizeJson(json)
}

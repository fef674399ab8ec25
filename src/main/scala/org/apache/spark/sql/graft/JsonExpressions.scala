package org.apache.spark.sql.graft

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F8: the reference's recursive JSON-string normalization
  * (src/json_encoder.py:23-41) as a Catalyst expression — the one scalar
  * function SURVEY §2.11 flags as genuinely custom. Semantics preserved
  * exactly: walking the JSON tree, a *string sitting as an object value*
  * that itself parses to a JSON object or array is replaced by the
  * parsed (and recursively normalized) value; strings in arrays or at
  * top level, strings that parse to scalars, and all non-string leaves
  * are left alone — matching _normalize_json_fields, which re-parses
  * dict values only. Input that is not valid JSON — including a JSON
  * value followed by trailing text, which json.loads rejects — is
  * returned unchanged (the reference's try/except fallback,
  * src/json_encoder.py:26-31). Output is minified canonical JSON with
  * field order preserved — byte-identical to DuckDB's `json()`
  * normalization for inputs without embedded JSON strings, which is what
  * lets the oracle pin this.
  */
case class NormalizeJson(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_json"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeJson.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.NormalizeJson.normalize($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeJson =
    copy(child = newChild)
}

object NormalizeJson {
  // FAIL_ON_TRAILING_TOKENS: plain readTree stops at the first complete
  // value and silently DROPS trailing text ('{"a":1} tail' → {"a":1}),
  // where the reference's json.loads raises and the original string is
  // kept. With the feature on, partially-JSON input falls through to the
  // return-unchanged path — no silent truncation.
  private val mapper = new ObjectMapper()
    .enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val root =
      try mapper.readTree(str)
      catch { case _: Exception => return s }
    // Jackson returns MissingNode (not null, no exception) for
    // empty/whitespace-only input — that is "not valid JSON" too
    if (root == null || root.isMissingNode) return s
    UTF8String.fromString(
      mapper.writeValueAsString(walk(root, isObjectValue = false)))
  }

  /** Replace a TextNode that parses to an object/array with the parsed,
    * recursively-normalized node — but ONLY when the string sits as an
    * object VALUE: the reference's _normalize_json_fields applies
    * _attempt_parse_json_string to dict values alone, leaving list items
    * and the top-level value as strings. */
  private def walk(node: JsonNode, isObjectValue: Boolean): JsonNode =
    node match {
      case o: ObjectNode =>
        val it = o.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.setValue(walk(e.getValue, isObjectValue = true))
        }
        o
      case a: ArrayNode =>
        var i = 0
        while (i < a.size()) {
          a.set(i, walk(a.get(i), isObjectValue = false))
          i += 1
        }
        a
      case t: TextNode if isObjectValue =>
        val parsed =
          try mapper.readTree(t.textValue())
          catch { case _: Exception => null }
        if (parsed != null && (parsed.isObject || parsed.isArray))
          walk(parsed, isObjectValue = false)
        else t
      case other => other
    }
}

object JsonExpressions {
  /** Column API for [[NormalizeJson]]. */
  def normalizeJson(json: Column): Column =
    ExpressionUtils.column(NormalizeJson(ExpressionUtils.expression(json)))
}

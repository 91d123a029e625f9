package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.{lit, udf}

/** F8 — balanced-brace JSON extraction from script text (the one scalar
  * in the reference with no Spark built-in; `pull_new_sales_list.py:43-63`
  * finds `window.jsonModel = {...}` by scanning brace depth).
  *
  * Unlike the reference's naive depth counter, this scanner is
  * string-aware: braces inside JSON string literals (and escaped quotes)
  * don't move the depth, so `{"a": "}"}` extracts whole (FIXTURES §B4
  * requires these cases).
  *
  * Ships as a Scala UDF (SURVEY §2.11 policy: UDF first, promote to a
  * codegen Expression only if it lands on a measured hot path — scrape
  * payloads are KB-scale per row, far off the 100 TB scan path).
  */
object JsonExtract {

  /** Pure function: the balanced `{...}` JSON object following the first
    * occurrence of `marker`, or null when absent/unbalanced.
    */
  def extractBalancedJson(text: String, marker: String): String = {
    if (text == null || marker == null) return null
    val at = text.indexOf(marker)
    if (at < 0) return null
    val start = text.indexOf('{', at + marker.length)
    if (start < 0) return null
    var i = start
    var depth = 0
    var inString = false
    var escaped = false
    while (i < text.length) {
      val c = text.charAt(i)
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return text.substring(start, i + 1)
        case _ => ()
      }
      i += 1
    }
    null // unbalanced
  }

  val extractBalancedJsonUdf: UserDefinedFunction =
    udf((text: String, marker: String) => extractBalancedJson(text, marker))

  /** Column form: `balancedJson($"script_text", "window.jsonModel")` —
    * backed by the native codegen expression
    * ([[graft.plans.ExtractBalancedJsonExpr]]); the UDF form above is
    * kept for API parity/tests.
    */
  def balancedJson(c: Column, marker: String): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.ExtractBalancedJsonExpr(
      bridge.expression(c),
      bridge.expression(lit(marker))))
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions into the session function registry, so SQL users get
  * them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT graft_extract_json(html, 'window.jsonModel') ...")
  * }}}
  *
  * (Also usable via `spark.sql.extensions=graft.plans.GraftExtensions`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_extract_json"),
      new ExpressionInfo(classOf[ExtractBalancedJsonExpr].getName,
        "graft_extract_json"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_extract_json(text, marker) takes exactly 2 arguments")
        ExtractBalancedJsonExpr(args.head, args(1))
      }))
  }
}

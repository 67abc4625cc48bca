package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions entry point registering the engine's native
  * functions (brief: custom Expression via SparkSessionExtensions when
  * built-ins can't express the semantics/performance).
  *
  * Wire with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * — done by Tables.localSession, Verify and Bench, so `vec_dot` resolves
  * in SQL and via `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      DotProduct.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2) {
          throw new IllegalArgumentException(
            s"vec_dot expects exactly 2 arguments, got ${children.length}")
        }
        DotProduct(children(0), children(1))
      }))
  }
}

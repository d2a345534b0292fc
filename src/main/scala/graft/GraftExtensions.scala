package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point: injects the engine's SQL
  * function surface into every session of a cluster at build time —
  * the deployment path for a shipped library (no imperative
  * registration call in user code):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * }}}
  *
  * The injected set is exactly [[org.apache.spark.sql.graft.GraftFunctions.builders]]
  * — one list serves both this path and the session-level
  * `Engine.registerFunctions` (which additionally registers the
  * typed-Aggregator sketch UDF, a session-scoped construct).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graft.GraftFunctions.builders.foreach {
      case (name, builder) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
}

// Test bridge: SparkSessionExtensions.registerFunctions is
// private[sql] — the hook BaseSessionStateBuilder itself calls during
// session bootstrap. Exposing it to the spec from inside the package
// lets the test drive the EXACT code path a real
// `spark.sql.extensions=graft.GraftExtensions` deployment takes.
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

object ExtensionsTestBridge {
  def registerInto(ext: SparkSessionExtensions,
                   registry: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(registry)
}

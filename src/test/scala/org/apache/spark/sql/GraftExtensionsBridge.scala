package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge: SparkSessionExtensions.registerFunctions is
  * private[sql], so the spec asserting that GraftExtensions actually
  * injects its functions reaches it from this package. */
object GraftExtensionsBridge {
  def injectedNames(ext: SparkSessionExtensions): Set[String] = {
    val reg = FunctionRegistry.builtin.clone()
    val before = reg.listFunction().map(_.funcName).toSet
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName).toSet -- before
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.GraftFunctions

/**
 * [[SparkSessionExtensions]] injector — the deployment-standard way to ship
 * the engine's SQL functions to every session of a cluster:
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *
 * Injects the codegen'd kernel functions (see
 * [[graft.functions.GraftFunctions]]). For an already-created session use
 * `GraftFunctions.register(spark)` instead.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

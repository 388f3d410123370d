package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Registers a Catalyst expression builder as a SQL function on a LIVE
 * session. `SparkSessionExtensions` (the config-time path, see
 * `graft.GraftExtensions`) only applies to sessions created with
 * `spark.sql.extensions` set; for an already-running session the function
 * registry is `private[sql]`, so the registration goes through this shim in
 * an `org.apache.spark.sql` subpackage — same pattern as [[ColumnBridge]].
 */
object FunctionBridge {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

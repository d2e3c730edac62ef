package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers native function builders into a LIVE session's function
  * registry (the builder-time path is SparkSessionExtensions.injectFunction;
  * this is the escape hatch for sessions the library did not construct —
  * same shim rationale as ColumnBridge: the registry is private[sql]). */
object FunctionBridge {
  def register(spark: SparkSession,
               fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}

package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 moved the Column ↔ Expression converters behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * extension libraries shipping custom expressions expose them through
  * a small shim in the sql package — this is the entire shim.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions installer to an ALREADY-RUNNING
    * session's function registry (the builder normally does this at
    * session construction; `registerFunctions` is private[sql]). */
  def installFunctions(installer: SparkSessionExtensions => Unit,
                       session: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    installer(ext)
    ext.registerFunctions(
      session.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)
  }
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `classic.ExpressionUtils` is private[sql] in Spark 4, so the
  * conversion lives in this package — the conventional extension point for
  * libraries adding native expressions (no Spark internals are modified). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Where `name`'s data lives (or would live): the catalog's recorded
    * location when the table exists, else the path the catalog would assign
    * to it — the directory a managed table from a PREVIOUS process left
    * behind even though the current in-memory catalog has no entry for it.
    * `sessionState` is private[sql], hence this shim. */
  def tableLocation(spark: SparkSession, name: String): java.net.URI = {
    val ss = spark.asInstanceOf[classic.SparkSession].sessionState
    val id = ss.sqlParser.parseTableIdentifier(name)
    if (ss.catalog.tableExists(id)) ss.catalog.getTableMetadata(id).location
    else ss.catalog.defaultTablePath(id)
  }
}

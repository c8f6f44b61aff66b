package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. ExpressionUtils is private[sql], so
  * extension libraries expose it through a shim in the sql package
  * namespace — the standard pattern used by Spark connector/extension
  * projects.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Unwrap a `RowLevelOperationTable` (the `private[sql]` wrapper the
  * row-level rewrite rules put around a `SupportsRowLevelOperations`
  * table) to its inner table — lets the graft V1 plan swap recognize
  * rewritten row-level READS without reaching into the private class
  * from user packages. Returns None for any other table.
  */
object RowLevelBridge {
  def innerTable(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.connector.catalog.Table] = t match {
    case r: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
      Some(r.table)
    case _ => None
  }
}

/** Public face of the `private[sql]` V2TableWithV1Fallback trait, so
  * the graft catalog's table can declare the streaming-by-name V1
  * fallback (`spark.readStream.table("graft.t")` → the V1
  * versions-as-offsets source) — the same fallback Delta's
  * streaming-by-name resolution takes, exposed through the same
  * bridge-package seam as the rest of this file.
  */
trait V1FallbackTable
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ⇄ Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4's column
  * node layer). Needed to attach custom Catalyst expressions such as
  * [[graft.raster.ZonalPartial]] — which carry non-SQL-expressible
  * compiled state — to a DataFrame without a FunctionRegistry round
  * trip. Standard extension-library pattern (cf. public Spark
  * extension projects that place factories under
  * `org.apache.spark.sql` for the same reason).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

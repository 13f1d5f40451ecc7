package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * libraries adding native Catalyst expressions re-export them from
  * inside the sql namespace — the standard pattern across public Spark
  * extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Catalyst conversion ([[expression]] returns a
    * lazy `ColumnNodeExpression` wrapper in Spark 4, opaque to tree
    * matching). Function applications come back as UNRESOLVED
    * functions (`=`, `<=`, `and`, ...) — resolution normally happens
    * in the analyzer — so structural consumers match on
    * `UnresolvedFunction(name, args)` rather than the resolved
    * operator classes. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DSv2 `Predicate` → V1 `Filter` (literal values converted to
    * external Scala types) — `PredicateUtils` is `private[sql]`, so
    * the SQL catalog's SupportsDeleteV2 translation re-exports it
    * here, the same pattern as the Column converters above. */
  def predicateToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
}

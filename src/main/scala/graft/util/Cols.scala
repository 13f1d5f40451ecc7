package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared column helpers.
  *
  * Money-like aggregation follows the reference's decimal discipline
  * (reference: spark/load_warehouse.py:218-221 casts measures to
  * decimal(10,2) at the warehouse boundary): we sum in exact decimal —
  * order-independent, so partial/final aggregation and DuckDB's oracle
  * produce bit-identical results — then surface a double. A plain
  * sum(double) would drift with partition count, which both breaks
  * oracle hashing and makes results nondeterministic on a real cluster.
  */
object Cols {

  /** Exact decimal sum of a double column, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Order-independent average: exact decimal sum / non-null count. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** SQL fragments for the DuckDB oracle matching dsum/davg. */
  def dsumSql(c: String, scale: Int = 2): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,$scale))) AS DOUBLE)"

  def davgSql(c: String, scale: Int = 2): String =
    s"(${dsumSql(c, scale)} / count($c))"
}

package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType, StringType, TimestampNTZType, TimestampType}

/** Driver-side decomposition of a PREDICATE `Column` into the
  * conjuncts the open-format planners can prune files with — the
  * pushdown shape a DataSourceV2 `SupportsPushDownFilters` receives,
  * here applied inside the library so callers write ONE raw-column
  * predicate and get partition pruning, stats skipping, and hidden-
  * transform pruning for free, exactly as they would against Delta's
  * or Iceberg's own Spark connector.
  *
  * The Column arrives UNANALYZED: Spark 4's eager ColumnNode
  * conversion yields `UnresolvedFunction("and"/"="/"<="/...)` nodes
  * (the analyzer would resolve them later), so matching covers both
  * the unresolved spellings and the resolved operator classes (for
  * predicates built from analyzed plans).
  *
  * Superset contract throughout: extraction only ever uses conjuncts
  * it can PROVE prune-safe — unrecognized shapes (casts, functions,
  * disjunctions, non-literal sides) contribute nothing, and every
  * caller re-applies the FULL predicate on the scan output, so a
  * conservative extraction costs file reads, never rows.
  */
private[graft] object PruningPredicates {

  /** What a predicate yields for pruning: per-column equality
    * literals, per-column closed long ranges (from long/int
    * comparisons), and per-column closed instant ranges in epoch
    * micros (from timestamp comparisons). */
  case class Extracted(eqs: Map[String, Any],
                       longLo: Map[String, Long], longHi: Map[String, Long],
                       tsLo: Map[String, Long], tsHi: Map[String, Long]) {
    /** Closed long ranges per column, equality folded in. */
    def longRanges: Seq[(String, Long, Long)] = {
      val cols = longLo.keySet ++ longHi.keySet ++ eqs.collect {
        case (c, _: Long) => c
        case (c, _: Int) => c
      }
      cols.toSeq.sorted.map { c =>
        val eqv = eqs.get(c).collect {
          case v: Long => v
          case v: Int => v.toLong
        }
        val lo = Seq(longLo.get(c), eqv).flatten
          .reduceOption(_ max _).getOrElse(Long.MinValue)
        val hi = Seq(longHi.get(c), eqv).flatten
          .reduceOption(_ min _).getOrElse(Long.MaxValue)
        (c, lo, hi)
      }
    }
  }

  /** Type-aware equality between a STORED partition string and an
    * extracted literal, through the column's DECLARED type — Spark's
    * re-applied predicate compares after casts (`'05' = 5` is TRUE),
    * so a raw string compare would wrongly prune externally written
    * values with non-canonical spellings. None = cannot decide →
    * caller keeps the file (superset contract). A stored NULL can
    * never satisfy an equality predicate → Some(false). */
  def eqMatches(declared: org.apache.spark.sql.types.DataType,
                stored: String, literal: Any): Option[Boolean] = {
    if (stored == null) return Some(false)
    (declared, literal) match {
      case (StringType, s: String) => Some(stored == s)
      case (LongType | IntegerType | ShortType | ByteType, v) =>
        val lit: Option[Long] = v match {
          case l: Long => Some(l)
          case i: Int => Some(i.toLong)
          case _ => None
        }
        lit.flatMap(l =>
          scala.util.Try(stored.trim.toLong).toOption.map(_ == l))
      // date-partitioned tables (the 100 TB silver's usual layout).
      // PARSE the stored value rather than string-compare: a foreign
      // writer's non-canonical spelling ("2024-1-5") must read as
      // unprovable (None -> file kept), never as a mismatch — the
      // superset contract the numeric branch above keeps by parsing
      case (org.apache.spark.sql.types.DateType, d: java.sql.Date) =>
        scala.util.Try(java.time.LocalDate.parse(stored.trim))
          .toOption.map(_ == d.toLocalDate)
      case (org.apache.spark.sql.types.DateType,
            d: java.time.LocalDate) =>
        scala.util.Try(java.time.LocalDate.parse(stored.trim))
          .toOption.map(_ == d)
      case _ => None // doubles/cross-type: skip pruning
    }
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    case _ => None // casts/functions change semantics — never assume
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v, LongType) => Some(v.asInstanceOf[Long])
    case Literal(v, IntegerType) => Some(v.asInstanceOf[Int].toLong)
    case Literal(v, ShortType) => Some(v.asInstanceOf[Short].toLong)
    case Literal(v, ByteType) => Some(v.asInstanceOf[Byte].toLong)
    case _ => None
  }

  // Catalyst spells timestamp literals as epoch MICROS
  private def tsLit(e: Expression): Option[Long] = e match {
    case Literal(v, TimestampType) => Some(v.asInstanceOf[Long])
    case Literal(v, TimestampNTZType) => Some(v.asInstanceOf[Long])
    case _ => None
  }

  private def eqLit(e: Expression): Option[Any] = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
      StringType) => Some(v.toString)
    case other => longLit(other)
  }

  /** Normalize a comparison to (op, left, right) across the
    * unresolved-function and resolved-operator spellings. */
  private def comparison(e: Expression)
      : Option[(String, Expression, Expression)] = e match {
    case EqualTo(l, r) => Some(("=", l, r))
    case GreaterThanOrEqual(l, r) => Some((">=", l, r))
    case GreaterThan(l, r) => Some((">", l, r))
    case LessThanOrEqual(l, r) => Some(("<=", l, r))
    case LessThan(l, r) => Some(("<", l, r))
    case f: UnresolvedFunction if f.arguments.length == 2 =>
      f.nameParts.last match {
        case "=" | "==" => Some(("=", f.arguments(0), f.arguments(1)))
        case op @ (">=" | ">" | "<=" | "<") =>
          Some((op, f.arguments(0), f.arguments(1)))
        case _ => None
      }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case f: UnresolvedFunction
        if f.nameParts.last.equalsIgnoreCase("and") &&
          f.arguments.length == 2 =>
      conjuncts(f.arguments(0)) ++ conjuncts(f.arguments(1))
    case other => Seq(other)
  }

  /** Decompose `pred` (the exact predicate the caller will also apply
    * to the scan). Exclusive bounds are widened to inclusive — with
    * file-granular pruning the boundary file must be read anyway to
    * apply the exact predicate. */
  def extract(pred: Column): Extracted = {
    var eqs = Map.empty[String, Any]
    var lLo = Map.empty[String, Long]; var lHi = Map.empty[String, Long]
    var tLo = Map.empty[String, Long]; var tHi = Map.empty[String, Long]
    def addLo(m: Map[String, Long], c: String, v: Long) =
      m.updated(c, m.get(c).fold(v)(_ max v))
    def addHi(m: Map[String, Long], c: String, v: Long) =
      m.updated(c, m.get(c).fold(v)(_ min v))
    def lower(c: String, e: Expression): Unit = {
      longLit(e).foreach(v => lLo = addLo(lLo, c, v))
      tsLit(e).foreach(v => tLo = addLo(tLo, c, v))
    }
    def upper(c: String, e: Expression): Unit = {
      longLit(e).foreach(v => lHi = addHi(lHi, c, v))
      tsLit(e).foreach(v => tHi = addHi(tHi, c, v))
    }
    conjuncts(Bridge.catalystExpression(pred))
      .flatMap(comparison).foreach {
        case ("=", l, r) =>
          (attrName(l), attrName(r)) match {
            case (Some(c), None) =>
              eqLit(r).foreach(v => eqs += c -> v)
              tsLit(r).foreach { v =>
                tLo = addLo(tLo, c, v); tHi = addHi(tHi, c, v) }
            case (None, Some(c)) =>
              eqLit(l).foreach(v => eqs += c -> v)
              tsLit(l).foreach { v =>
                tLo = addLo(tLo, c, v); tHi = addHi(tHi, c, v) }
            case _ =>
          }
        case (">=" | ">", l, r) => // exclusive widened (superset)
          attrName(l).foreach(lower(_, r))
          attrName(r).foreach(upper(_, l))
        case ("<=" | "<", l, r) =>
          attrName(l).foreach(upper(_, r))
          attrName(r).foreach(lower(_, l))
        case _ =>
      }
    Extracted(eqs, lLo, lHi, tLo, tHi)
  }
}

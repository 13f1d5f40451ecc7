package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{col, lit, month, pmod, year}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Iceberg partition TRANSFORMS (Iceberg spec §Partition Transforms) —
  * the functions that turn a source column value into a hidden
  * partition tuple value. Hidden partitioning is the feature identity
  * tuples cannot give: the table is physically clustered by
  * `bucket(N, key)` or `month(ts)` while queries keep filtering on the
  * RAW column — the planner applies the same transform to the
  * predicate and prunes manifests, no derived column ever leaks into
  * the table schema.
  *
  * Each transform exists twice, by design:
  *  - a driver-side scalar ([[bucketLong]], [[monthOrdinal]], ...)
  *    used when PRUNING manifest tuples against predicate values, and
  *  - a Column expression ([[bucketCol]], [[monthCol]], ...) used when
  *    WRITING, to derive the partition tuple per row inside codegen.
  * Both sides share one implementation, so write-time assignment and
  * read-time pruning can never disagree — the invariant hidden
  * partitioning rests on.
  *
  * `bucket` is pinned to the spec's exact definition: murmur3_x86_32
  * (seed 0) over the value's 8-byte little-endian form, then
  * `(hash & Int.MaxValue) % N`. The spec publishes test vectors
  * (hash(34L) = 2017239379); IcebergSpec asserts them, so tables
  * written here bucket IDENTICALLY to tables written by any Iceberg
  * client — interop, not just self-consistency. Scope: long-typed
  * sources (int widens to long per the spec; string buckets need
  * Iceberg's UTF-8 murmur over non-4-byte-aligned input, which Spark's
  * hash family does not reproduce — refused loudly, never
  * approximated).
  */
object IcebergTransforms {

  // ---------------------------------------------------------------
  // murmur3_x86_32 over the 8-byte little-endian form, seed 0 — the
  // public algorithm, spelled out so the implementation is pinned to
  // the spec vectors rather than to any library's internals.
  // ---------------------------------------------------------------

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** murmur3_x86_32(littleEndianBytes(v), seed = 0). */
  def murmur3Long(v: Long): Int = {
    var h1 = 0 // seed
    // two 4-byte little-endian blocks: low word, then high word
    var k1 = v.toInt * C1
    k1 = Integer.rotateLeft(k1, 15) * C2
    h1 = Integer.rotateLeft(h1 ^ k1, 13) * 5 + 0xe6546b64
    k1 = (v >>> 32).toInt * C1
    k1 = Integer.rotateLeft(k1, 15) * C2
    h1 = Integer.rotateLeft(h1 ^ k1, 13) * 5 + 0xe6546b64
    // fmix32, total length 8 bytes
    h1 ^= 8
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Iceberg `bucket[n]` of a long value: non-negative hash mod n. */
  def bucketLong(v: Long, n: Int): Int =
    (murmur3Long(v) & Integer.MAX_VALUE) % n

  /** Iceberg `truncate[w]` of a long value: floor to a multiple of w
    * (the spec's `v - (((v % w) + w) % w)` — correct for negatives). */
  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)

  /** Iceberg `month` ordinal: months from 1970-01 (UTC calendar —
    * sessions here pin spark.sql.session.timeZone=UTC, so the Column
    * twin agrees). */
  def monthOrdinal(year: Int, month: Int): Int = (year - 1970) * 12 + month - 1

  /** Iceberg `year` ordinal: years from 1970. */
  def yearOrdinal(year: Int): Int = year - 1970

  // ordinal-of-instant twins (UTC), for mapping PREDICATE literals
  // (epoch micros, the way Catalyst spells timestamp literals) onto
  // partition tuple ordinals when pruning
  private def utc(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), 0, java.time.ZoneOffset.UTC)

  def monthOrdinalOfMicros(us: Long): Int = {
    val t = utc(us); monthOrdinal(t.getYear, t.getMonthValue)
  }
  def yearOrdinalOfMicros(us: Long): Int = utc(us).getYear - 1970
  def dayOrdinalOfMicros(us: Long): Int =
    Math.floorDiv(us, 86400L * 1000000L).toInt
  def hourOrdinalOfMicros(us: Long): Int =
    Math.floorDiv(us, 3600L * 1000000L).toInt

  /** Ordinal of an instant under a time transform — the prune-side
    * twin of [[transformCol]] for day/month/year/hour. */
  def timeOrdinalOfMicros(transform: String, us: Long): Int =
    transform match {
      case "month" => monthOrdinalOfMicros(us)
      case "year"  => yearOrdinalOfMicros(us)
      case "day"   => dayOrdinalOfMicros(us)
      case "hour"  => hourOrdinalOfMicros(us)
      case other => throw new IllegalArgumentException(
        s"'$other' is not a time transform")
    }

  // ---------------------------------------------------------------
  // Column twins (write-path derivation, inside codegen)
  // ---------------------------------------------------------------

  /** `bucket[n]` as a Column over a long source column. */
  def bucketCol(n: Int, c: Column): Column =
    Bridge.column(IcebergBucketLong(Bridge.expression(c.cast("long")), n))

  /** `truncate[w]` as a Column over a long source column. */
  def truncateCol(w: Long, c: Column): Column = {
    val l = c.cast("long")
    l - pmod(l, lit(w))
  }

  /** `month` as a Column over a timestamp/date source column. */
  def monthCol(c: Column): Column =
    (year(c) - lit(1970)) * lit(12) + month(c) - lit(1)

  /** `year` as a Column over a timestamp/date source column. */
  def yearCol(c: Column): Column = year(c) - lit(1970)

  /** `day` as a Column: days from epoch (dates only here — the
    * timestamp day transform needs the same UTC discipline). */
  def dayCol(c: Column): Column =
    org.apache.spark.sql.functions.datediff(
      org.apache.spark.sql.functions.to_date(c),
      org.apache.spark.sql.functions.to_date(lit("1970-01-01")))

  /** `hour` as a Column: hours from epoch (UTC sessions — see
    * [[monthCol]]). */
  def hourCol(c: Column): Column =
    org.apache.spark.sql.functions.floor(
      org.apache.spark.sql.functions.unix_micros(c.cast("timestamp"))
        / lit(3600L * 1000000L)).cast("int")

  /** The transform-string vocabulary, single source of truth —
    * consumers pattern-match these instead of re-declaring. */
  private[graft] val BucketRe = """bucket\[(\d+)\]""".r
  private[graft] val TruncateRe = """truncate\[(\d+)\]""".r

  /** The derived Column for a spec transform string over source
    * column `src` — the write path's single dispatch point. */
  def transformCol(transform: String, src: String): Column = transform match {
    case "identity"     => col(src)
    case BucketRe(n)    => bucketCol(n.toInt, col(src))
    case TruncateRe(w)  => truncateCol(w.toLong, col(src))
    case "month"        => monthCol(col(src))
    case "year"         => yearCol(col(src))
    case "day"          => dayCol(col(src))
    case "hour"         => hourCol(col(src))
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg partition transform '$other'")
  }

  /** The partition tuple field's type for a transform over a source
    * of type `srcType`. */
  def tupleType(transform: String, srcType: DataType): DataType =
    transform match {
      case "identity"    => srcType
      case BucketRe(_) | "month" | "year" | "day" | "hour" => IntegerType
      case TruncateRe(_) =>
        require(srcType == LongType || srcType == IntegerType,
          s"truncate over $srcType not supported (long/int only)")
        // the spec defines truncate as TYPE-PRESERVING (int source →
        // int tuple); the scalar math in [[truncateCol]] may widen to
        // long internally, but the manifest's avro partition field
        // must carry the source type or external clients deriving the
        // tuple type from spec+schema mis-read the value
        srcType
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg partition transform '$other'")
    }

  /** Tuple field NAME for a transform over `src` — Iceberg's naming
    * convention (`<col>` for identity, `<col>_bucket`, `<col>_month`,
    * ...). */
  def tupleName(transform: String, src: String): String = transform match {
    case "identity"    => src
    case BucketRe(_)   => s"${src}_bucket"
    case TruncateRe(_) => s"${src}_trunc"
    case "month"       => s"${src}_month"
    case "year"        => s"${src}_year"
    case "day"         => s"${src}_day"
    case "hour"        => s"${src}_hour"
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg partition transform '$other'")
  }

  /** Is `transform` one this engine speaks? */
  def supported(transform: String): Boolean = transform match {
    case "identity" | "month" | "year" | "day" | "hour" => true
    case BucketRe(_) | TruncateRe(_) => true
    case _ => false
  }
}

/** Native codegen'd `bucket[n]` over a long column (see
  * [[IcebergTransforms]] for the spec contract). A UDF here would
  * break whole-stage codegen in the write path's partitioning
  * projection; this compiles to two multiply-rotate rounds inline. */
case class IcebergBucketLong(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"bucket count must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(v: Any): Any =
    IcebergTransforms.bucketLong(v.asInstanceOf[Long], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IcebergTransforms.bucketLong($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

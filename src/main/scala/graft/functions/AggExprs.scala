package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as ONE aggregate — the k-generalization of the
  * `min(struct(...))` argmin pattern (q39/q56, verdict r2 item 4).
  *
  * `row_number() OVER (PARTITION BY g ORDER BY s)`+`WHERE rn <= k`
  * sorts EVERY scored row inside each window partition: the exchange
  * moves all N rows and the sort is O(N log N) per group — the
  * first-that-worked plan, not the 100 TB one. This aggregate keeps a
  * k-sized sorted buffer instead: the partial (map-side) aggregate
  * collapses each group to ≤ k candidates BEFORE the exchange, so the
  * shuffle moves `groups × partitions × k` rows regardless of fan-in,
  * and no full sort ever runs (per-row insertion into a k-bounded
  * buffer — the per-partition-heap + final-merge shape).
  *
  * Semantics: the k SMALLEST (score, id) pairs in ascending
  * lexicographic order — exactly `ORDER BY score, id LIMIT k`, with
  * the unique id as the deterministic total-order tiebreak (the same
  * contract every ranking oracle in this repo relies on). Descending
  * ranks (top-k by similarity) negate the score at the call site —
  * IEEE negation is exact, so oracle parity is unaffected. Doubles
  * compare via `java.lang.Double.compare` — identical to Spark's own
  * DoubleType sort order.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK.Buf] {

  require(k > 0, s"top_k_min requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) arguments, got " +
        s"${score.dataType.simpleString} and ${id.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_min"

  override def createAggregationBuffer(): BoundedTopK.Buf =
    new BoundedTopK.Buf(new ArrayBuffer[Double](k + 1),
      new ArrayBuffer[Long](k + 1))

  override def update(buf: BoundedTopK.Buf, input: InternalRow): BoundedTopK.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: BoundedTopK.Buf, other: BoundedTopK.Buf): BoundedTopK.Buf = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i), k)
      i += 1
    }
    buf
  }

  override def eval(buf: BoundedTopK.Buf): Any =
    new GenericArrayData((0 until buf.size).map(i =>
      InternalRow(buf.scores(i), buf.ids(i))).toArray[Any])

  override def serialize(buf: BoundedTopK.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      // pre-sorted and ≤ k by construction: append directly
      buf.scores += bb.getDouble; buf.ids += bb.getLong; i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object BoundedTopK {

  /** k-bounded buffer, kept sorted ascending by (score, id). Insertion
    * is a linear scan + shift — O(k) per row with k ≤ ~50 everywhere
    * this is used, and rows past the current k-th are rejected by one
    * compare against the tail (the common case once the buffer warms). */
  final class Buf(val scores: ArrayBuffer[Double], val ids: ArrayBuffer[Long]) {
    def size: Int = scores.length

    private def lt(s: Double, i: Long, j: Int): Boolean = {
      val c = java.lang.Double.compare(s, scores(j))
      c < 0 || (c == 0 && i < ids(j))
    }

    def insert(s: Double, i: Long, k: Int): Unit = {
      if (size == k && !lt(s, i, k - 1)) return // below the cut — reject
      var pos = size
      while (pos > 0 && lt(s, i, pos - 1)) pos -= 1
      scores.insert(pos, s)
      ids.insert(pos, i)
      if (size > k) { scores.remove(k); ids.remove(k) }
      ()
    }
  }
}

/** Per-group ROARING BITMAP of long row positions as ONE aggregate —
  * the executor-side construction step of a Delta deletion vector
  * (graft.sources.DeltaLog.deleteWhere groups matched rows by file
  * and aggregates their `_metadata.row_index` through this).
  *
  * The alternative — `collect()` the matched (file, position) rows
  * and group them on the driver — is O(deleted rows) driver memory:
  * a DELETE matching 1% of a 100 TB table collects billions of rows
  * and OOMs the driver. Here each task folds its rows into a
  * compressed bitmap (the partial aggregate), partials merge with
  * bitmap OR, and the driver receives ONE row per file whose payload
  * is the kilobytes-sized portable serialization — O(files), the
  * same metadata class as the log itself. This is where Delta's own
  * writer builds the bitmap too: inside the task that scanned the
  * file. */
case class RowPosBitmap(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[graft.sources.DeletionVectors.Bitmap64] {

  private type Bm = graft.sources.DeletionVectors.Bitmap64

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got " +
        child.dataType.simpleString)

  /** The spec's portable RoaringBitmapArray bytes. */
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "row_pos_bitmap"

  override def createAggregationBuffer(): Bm =
    new graft.sources.DeletionVectors.Bitmap64

  override def update(buf: Bm, input: InternalRow): Bm = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Bm, other: Bm): Bm = { buf.or(other); buf }

  override def eval(buf: Bm): Any = buf.serializePortable

  override def serialize(buf: Bm): Array[Byte] = buf.serializePortable

  override def deserialize(bytes: Array[Byte]): Bm =
    graft.sources.DeletionVectors.Bitmap64.fromPortable(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): RowPosBitmap =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RowPosBitmap =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Column-level API for the aggregate expressions. */
object AggExprs {

  /** The k smallest (score, id) pairs of a group, ascending — as
    * `array<struct<score double, id bigint>>`. `posexplode` the result
    * for (rank − 1, row) pairs; negate the score for descending ranks. */
  def topKMin(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      BoundedTopK(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())

  /** The group's long values as portable roaring-bitmap bytes —
    * [[RowPosBitmap]]. */
  def rowPosBitmap(pos: Column): Column =
    Bridge.column(
      RowPosBitmap(Bridge.expression(pos)).toAggregateExpression())
}

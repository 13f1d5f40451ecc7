package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.sources.DeletionVectors.Bitmap64

/** Deletion-vector probe: is (file basename, row index) recorded as
  * deleted? The bitmaps ride a BROADCAST variable — shipped once per
  * executor, O(files × compressed bitmap) memory — and the probe is a
  * per-row bitmap `contains`, so merge-on-read stays a FILTER inside
  * the scan stage instead of an anti-join whose build side
  * materializes every deleted (file, position) pair on the driver
  * (O(deleted rows) — billions for a 1% delete of a 100 TB table).
  * This is the shape Delta's own reader uses: per-file bitmap,
  * applied to `row_index` as the file is scanned.
  *
  * CodegenFallback by design: the probe is one hash lookup (cached
  * across the file-clustered rows of a task) plus one roaring
  * `contains` — the cost a codegen'd version would pay anyway — and
  * the surrounding scan/filter stage stays whole-stage-generated. */
case class DvRowDeleted(
    file: Expression, pos: Expression,
    dvs: Broadcast[Map[String, Bitmap64]])
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(file, pos)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  // rows arrive file-clustered (one parquet split per task) — cache
  // the last probed file's bitmap; per-task instance, no sharing
  @transient private var lastName: String = null
  @transient private var lastBm: Bitmap64 = null

  override def eval(input: InternalRow): Any = {
    val f = file.eval(input)
    val p = pos.eval(input)
    if (f == null || p == null) false
    else {
      val name = f.toString
      if (name != lastName) {
        lastName = name
        lastBm = dvs.value.getOrElse(name, null)
      }
      lastBm != null && lastBm.contains(p.asInstanceOf[Long])
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(file = newChildren(0), pos = newChildren(1))
}

object DvExprs {

  /** True where (file, pos) is deleted per the broadcast bitmaps. */
  def deleted(file: Column, pos: Column,
              dvs: Broadcast[Map[String, Bitmap64]]): Column =
    Bridge.column(DvRowDeleted(
      Bridge.expression(file), Bridge.expression(pos), dvs))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** 1→N generator emitting every ordered pair (a[i], a[j]), i < j, of a
  * sorted `array<long>` — the combination step of the n-gram Jaccard
  * pair expansion (q33).
  *
  * The built-in spelling — `explode(flatten(transform(ds, (x, i) =>
  * transform(slice(ds, i+2, n), y => struct(x, y)))))` — materializes a
  * nested array-of-arrays-of-structs per row through interpreted
  * lambdas before the explode even starts. This generator walks the
  * source array once and emits rows directly; no intermediate
  * collections, one allocation per output row. (Generators run via
  * GenerateExec's iterator protocol; codegen fallback here is fine —
  * the cost is in the allocation pattern, not dispatch.)
  */
case class PairCombinations(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pair_combinations requires array<bigint>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Iterator.empty
    else {
      val n = arr.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = j < n
        override def next(): InternalRow = {
          val row = InternalRow(arr.getLong(i), arr.getLong(j))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pair_combinations"
}

object GeneratorExprs {
  /** All i<j pairs of a sorted array<long> column, as columns (a, b). */
  def pairCombinations(arr: Column): Column =
    Bridge.column(PairCombinations(Bridge.expression(arr)))
}

package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, in first-occurrence
  * order — bit-identical to the declarative spelling it replaces:
  *
  * {{{
  *   when(size(split(c, "\\s+")) >= n,
  *     array_distinct(transform(sequence(lit(1), size(toks) - (n-1)),
  *       i => concat_ws(" ", slice(toks, i, n)))))
  *     .otherwise(array())
  * }}}
  *
  * and to the DuckDB oracle's `list_distinct(list_transform(range(...),
  * i -> array_to_string(toks[i:i+n-1], ' ')))`.
  *
  * Why a native expression: `transform`/`slice`/`concat_ws` lambdas are
  * HigherOrderFunctions — Spark evaluates the lambda INTERPRETED per
  * array element, allocating a slice array and a joined string through
  * virtual calls each time. Measured at sf0.1 that made the shingle
  * explode the single hottest stage of the whole bench (2.2 s warm, the
  * floor under q33/q34/q50/q57/q58). This expression makes one
  * imperative pass per row: split once, build each window with a
  * StringBuilder, dedupe with a LinkedHashSet — same output, ~10× less
  * per-row work (CodegenFallback is fine: the cost was per-ELEMENT
  * lambda dispatch, not the one virtual call per row).
  *
  * Tokenization parity notes: Spark's `split(str, regex)` is Java
  * `String.split(regex, -1)` — trailing empty tokens are KEPT (so a
  * trailing-whitespace text yields a final "" token, exactly like
  * DuckDB's `regexp_split_to_array`); this uses the same -1 limit.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val ws = Pattern.compile("\\s+")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** Distinct word n-gram shingles of `text`, first-occurrence order. */
  def shingles(text: Column, n: Int): Column =
    Bridge.column(Shingles(Bridge.expression(text), n))
}

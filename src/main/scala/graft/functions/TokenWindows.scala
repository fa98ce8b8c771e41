package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native strided token windows over a space-separated text column — the
  * `transform(sequence(0, count-1), i -> array_join(slice(split(text, ' '),
  * i*st+1, w), ' '))` HOF chain as ONE codegen call.
  *
  * The HOF form pays, per window, an interpreted lambda + a slice array
  * allocation + an array_join re-concatenation of w token strings. But a
  * window of consecutive `split(text, ' ')` tokens re-joined with single
  * spaces is EXACTLY a byte range of the original text (split consumes one
  * space per boundary, join re-inserts it — empty tokens from doubled
  * spaces round-trip too), so the kernel scans the UTF-8 bytes once for
  * space positions and emits each window as one byte-range copy. ' ' is a
  * single UTF-8 byte that never occurs inside a multi-byte sequence, so
  * byte scanning is exact for any Unicode text. TokenWindowsSpec pins
  * value-equality with the HOF chain on the real documents table.
  *
  * Two window-count conventions exist in the repo (both preserved):
  *  - `chunked = false` (passages): `greatest((n - w) div st, 0) + 1`
  *    windows — stop at the last full-ish window start.
  *  - `chunked = true` (chunking): `(n - 1) div st + 1` windows — a window
  *    starts at every stride while any token remains; trailing short.
  */
object TokenWindowsKernel {
  def windows(s: UTF8String, w: Int, st: Int, chunked: Boolean): ArrayData = {
    val nb = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // token i spans bytes [starts(i), ends(i)); boundaries at every ' '
    var starts = new Array[Int](16)
    var n = 0
    def addStart(v: Int): Unit = {
      if (n == starts.length) starts = java.util.Arrays.copyOf(starts, n * 2)
      starts(n) = v
      n += 1
    }
    addStart(0)
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20.toByte)
        addStart(i + 1)
      i += 1
    }
    def tokEnd(t: Int): Int = if (t + 1 < n) starts(t + 1) - 1 else nb
    val count =
      (if (chunked) (n - 1) / st else if (n >= w) (n - w) / st else 0) + 1
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val first = k * st
      val last = math.min(first + w - 1, n - 1)
      val from = starts(first)
      val to = tokEnd(last)
      val bytes = new Array[Byte](to - from)
      org.apache.spark.unsafe.Platform.copyMemory(
        base, off + from, bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        (to - from).toLong)
      out(k) = UTF8String.fromBytes(bytes)
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class TokenWindows(child: Expression, w: Int, st: Int, chunked: Boolean)
    extends UnaryExpression {
  require(w >= 1 && st >= 1, s"window/stride must be >= 1, got w=$w st=$st")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "token_windows"
  override protected def nullSafeEval(input: Any): Any =
    TokenWindowsKernel.windows(input.asInstanceOf[UTF8String], w, st, chunked)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenWindowsKernel.windows($c, $w, $st, $chunked)")
  override protected def withNewChildInternal(newChild: Expression): TokenWindows =
    copy(child = newChild)
}

object TokenWindows {
  /** Passage convention: `greatest((n-w) div st, 0) + 1` windows. */
  def strided(text: Column, w: Int, st: Int): Column =
    ColumnBridge.column(TokenWindows(ColumnBridge.expression(text), w, st, chunked = false))
  /** Chunking convention: `(n-1) div st + 1` windows, trailing short. */
  def chunked(text: Column, w: Int, st: Int): Column =
    ColumnBridge.column(TokenWindows(ColumnBridge.expression(text), w, st, chunked = true))
}

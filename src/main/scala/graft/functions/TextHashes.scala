package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the SQL-replayable text-hash family (Dedup.polySql and
  * the MinHash signature). The HOF formulations — `aggregate(split(s, ''),
  * …)` per CHARACTER and `transform(sequence(0, k-1), h -> array_min(
  * transform(basehashes, …)))` per (hash, shingle) — are CodegenFallback
  * chains: every lambda application allocates bound variables and interprets
  * the expression tree, which made the signature build the hottest loop of
  * the dedup bench family. These kernels compute the SAME integer sequences
  * in tight JVM loops (the FloatVecDot precedent; prompt-preferred extension
  * order: native Catalyst Expression > UDF).
  *
  * Parity: `polyHash` folds Unicode CODE POINTS exactly like
  * `aggregate(split(s, ''), 0, (acc, c) -> (acc*31 + ascii(c)) % P)` —
  * Spark's empty-pattern split advances by code point (verified empirically
  * incl. '' → [] → 0, astral chars, and Latin-1) — with an ASCII byte
  * fast path that needs no String allocation. TextHashesSpec pins
  * expression-vs-HOF equality row-by-row on the real documents table.
  */
object TextHashKernels {
  val P = 1000000007L

  /** 31-base code-point polynomial; identical to Dedup.polySql's fold. */
  def polyHash(s: UTF8String): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    val base = s.getBaseObject
    val off = s.getBaseOffset
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 0) { acc = (acc * 31 + b) % P; i += 1 }
      else return polyHashUnicode(s.toString) // rare non-ASCII: decode once
    }
    acc
  }

  private def polyHashUnicode(str: String): Long = {
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Element-wise [[polyHash]] over an array (null elements stay null) —
    * the `transform(shingles, sh -> polySql(sh))` twin. */
  def polyHashAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = polyHash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** K affine-permutation minimums over the base hashes — the
    * `transform(sequence(0, k-1), h -> array_min(transform(basehashes,
    * x -> (a_h*x + b_h) % P)))` twin: null elements are skipped exactly like
    * array_min; an empty (or all-null) input yields k null entries. */
  def minhashSig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val x = arr.getLong(i)
        var h = 0
        while (h < k) {
          val v = (a(h) * x + b(h)) % P
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k)) // k nulls, like array_min([])
    else new GenericArrayData(mins)
  }
}

/** `poly_hash(str)`: the Dedup.polySql char-polynomial as one codegen call. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `poly_hash_all(arr)`: element-wise [[PolyHash]] over array<string>. */
case class PolyHashArray(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "poly_hash_all"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.polyHashAll(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.polyHashAll($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashArray =
    copy(child = newChild)
}

/** `minhash_sig(basehashes)`: the k-permutation MinHash signature with the
  * shared affine family (Dedup.affineA/B) baked in at construction. */
case class MinHashSig(child: Expression, k: Int,
                      a: Array[Long], b: Array[Long]) extends UnaryExpression {
  require(a.length == k && b.length == k, s"affine constant arrays must have length $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.minhashSig(input.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashKernels.minhashSig($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object TextHashes {
  /** Column twin of `expr(Dedup.polySql(e))`. */
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
  /** Column twin of `expr(s"transform($arr, sh -> polySql(sh))")`. */
  def polyHashAll(c: Column): Column =
    ColumnBridge.column(PolyHashArray(ColumnBridge.expression(c)))
  /** Column twin of Dedup.minhashSignature(k) over a basehashes column. */
  def minhashSig(c: Column, k: Int, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k, a, b))
}

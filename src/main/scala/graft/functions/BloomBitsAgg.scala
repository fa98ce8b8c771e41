package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bitset-OR aggregate for the bloom sidecar build (r21, guide §2.3): folds
  * each row's k bit positions straight into an m-bit buffer, merged by OR.
  *
  * The previous shape exploded k position rows per input row and
  * collect_set-deduped them through the shuffle before folding bitsets in a
  * typed map — k× the aggregation rows and a per-group Set allocation. Here
  * the shuffle carries exactly one m/8-byte buffer per (group, map
  * partition), the theoretical minimum for a distributed bitset union, and
  * the bitset contents are identical (same positions set). */
case class BloomBitsAgg(child: Expression, mBits: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<int> positions, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val p = arr.getInt(i)
          buf(p >> 3) = (buf(p >> 3) | (1 << (p & 7))).toByte
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = newChildren.head)
}

object BloomBitsAgg {
  /** Aggregate column: OR of the k-position arrays in `positions`. */
  def bloomBits(positions: Column, mBits: Int): Column =
    ColumnBridge.column(
      BloomBitsAgg(ColumnBridge.expression(positions), mBits).toAggregateExpression())
}

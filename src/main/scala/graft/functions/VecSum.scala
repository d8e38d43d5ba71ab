package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types._

/** Mutable element-wise sum state: one long per vector component,
  * allocated lazily at the first input so the aggregate works for any
  * (consistent) dimensionality without configuration.
  */
final class VecSumBuffer {
  var sums: Array[Long] = null

  private def ensure(n: Int): Unit = {
    if (sums == null) sums = new Array[Long](n)
    else require(sums.length == n,
      s"vec_sum: mixed vector lengths (${sums.length} vs $n)")
  }

  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    ensure(n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) sums(i) += a.getLong(i)
      i += 1
    }
  }

  def mergeFrom(o: VecSumBuffer): Unit = if (o.sums != null) {
    ensure(o.sums.length)
    var i = 0
    while (i < o.sums.length) { sums(i) += o.sums(i); i += 1 }
  }
}

/** Native element-wise vector-sum aggregate over `array<long>`
  * columns — the sufficient statistic for centroids (and any other
  * linear vector reduction) over graft's int64-quantized embeddings.
  *
  * The relational formulation (posexplode → groupBy (group, dim) →
  * sum) EXPLODES the relation by the dimensionality before the
  * shuffle: at 100 TB of 64-dim vectors that is 64× the rows (and the
  * group key is carried per component). This aggregate keeps one
  * long[dim] buffer per group, participates in partial aggregation
  * (map-side combine), and merges buffers pairwise — the shuffle
  * carries |groups| · dim longs total, independent of row count.
  * Value-identical to the exploded twin because int64 addition is
  * associative and commutative (no float rounding to reorder).
  *
  * Null handling: null arrays are skipped (like sum), null elements
  * count as 0; an all-null group returns NULL.
  */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum needs array<bigint> input, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    b.mergeFrom(other)
    b
  }

  override def eval(b: VecSumBuffer): Any =
    if (b.sums == null) null else new GenericArrayData(b.sums)

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val n = if (b.sums == null) -1 else b.sums.length
    val bb = ByteBuffer.allocate(4 + 8 * math.max(n, 0))
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new VecSumBuffer
    if (n >= 0) {
      b.sums = new Array[Long](n)
      var i = 0
      while (i < n) { b.sums(i) = bb.getLong; i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumLong =
    copy(child = newChild)
}

object VecSum {
  /** Element-wise sum of an `array<long>` column per group. */
  def vecSum(c: Column): Column =
    ExpressionBridge.column(
      VecSumLong(ExpressionBridge.expression(c)).toAggregateExpression())
}

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

/** Mutable upper-triangle outer-product-sum state: one long per
  * (i ≤ j) component pair, flattened row-major, allocated at the
  * first input like [[VecSumBuffer]].
  */
final class VecOuterSumBuffer {
  var dim: Int = -1
  var sums: Array[Long] = null

  private def ensure(n: Int): Unit = {
    if (sums == null) { dim = n; sums = new Array[Long](n * (n + 1) / 2) }
    else require(dim == n,
      s"vec_outer_sum: mixed vector lengths ($dim vs $n)")
  }

  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    ensure(n)
    var i = 0
    var k = 0
    while (i < n) {
      val xi = if (a.isNullAt(i)) 0L else a.getLong(i)
      var j = i
      while (j < n) {
        val xj = if (a.isNullAt(j)) 0L else a.getLong(j)
        sums(k) += xi * xj
        k += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeFrom(o: VecOuterSumBuffer): Unit = if (o.sums != null) {
    ensure(o.dim)
    var k = 0
    while (k < sums.length) { sums(k) += o.sums(k); k += 1 }
  }
}

/** Native outer-product-sum aggregate over `array<long>` columns —
  * the sufficient statistic for a covariance / Gram matrix over
  * graft's int64-quantized embeddings (Σ xᵢxⱼ for every i ≤ j; the
  * matrix is symmetric, so only the upper triangle is kept).
  *
  * The relational formulation (posexplode × posexplode → groupBy
  * (i,j) → sum) inflates the relation d²÷2× BEFORE the shuffle — at
  * 100 TB of 64-dim vectors that is ~2080 rows per input row. This
  * aggregate keeps ONE long[d(d+1)/2] buffer per group (16 KB at
  * d=64), participates in map-side partial aggregation, and merges
  * buffers pairwise — the shuffle carries |groups|·d²/2 longs total,
  * independent of row count. Value-identical to the exploded twin
  * because int64 addition/multiplication is exact and associative
  * (no float rounding to reorder).
  *
  * Overflow headroom: |q| ≤ Scale·|x|; with Scale=1000 and |x| ≤ 4
  * each product is ≤ 1.6e7, so int64 holds ~5.7e11 rows per
  * partial — beyond that, pre-aggregate per shard and widen to
  * decimal in the final reduce.
  *
  * Null handling: null arrays are skipped (like sum), null elements
  * count as 0; an all-null group returns NULL.
  */
case class VecOuterSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecOuterSumBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_outer_sum needs array<bigint> input, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_outer_sum"

  override def createAggregationBuffer(): VecOuterSumBuffer = new VecOuterSumBuffer

  override def update(b: VecOuterSumBuffer, input: InternalRow): VecOuterSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecOuterSumBuffer, other: VecOuterSumBuffer): VecOuterSumBuffer = {
    b.mergeFrom(other)
    b
  }

  override def eval(b: VecOuterSumBuffer): Any =
    if (b.sums == null) null else new GenericArrayData(b.sums)

  override def serialize(b: VecOuterSumBuffer): Array[Byte] = {
    val n = if (b.sums == null) -1 else b.sums.length
    val bb = ByteBuffer.allocate(8 + 8 * math.max(n, 0))
    bb.putInt(b.dim)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecOuterSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val n = bb.getInt
    val b = new VecOuterSumBuffer
    if (n >= 0) {
      b.dim = d
      b.sums = new Array[Long](n)
      var i = 0
      while (i < n) { b.sums(i) = bb.getLong; i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecOuterSumLong =
    copy(child = newChild)
}

object VecOuterSum {
  /** Upper-triangle Σ xᵢxⱼ of an `array<long>` column per group,
    * flattened row-major (pair (i,j), i ≤ j, at index
    * i·d - i(i-1)/2 + (j-i)).
    */
  def vecOuterSum(c: Column): Column =
    ExpressionBridge.column(
      VecOuterSumLong(ExpressionBridge.expression(c)).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types._

/** Bounded KMV state: the k smallest DISTINCT hash values seen.
  * TreeSet gives dedup + ordered eviction in one structure; the
  * buffer never exceeds k entries (k·8 bytes), whatever the input
  * cardinality.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(h: Long): Unit = {
    if (set.size < k) set.add(h)
    else if (h < set.last) { if (set.add(h)) set.pollLast() }
  }
}

/** Native KMV aggregate: kth-smallest distinct hash per group, the
  * sufficient statistic of the K-Minimum-Values distinct-count sketch
  * (Bar-Yossef et al. 2002).
  *
  * The relational twin (distinct → per-group sort → row_number = k)
  * shuffles EVERY distinct hash and sorts each group just to read one
  * order statistic. This aggregate keeps a k-entry bounded buffer per
  * group, participates in partial aggregation (map-side combine), and
  * merges buffers pairwise — at 100 TB the shuffle carries |groups|·k
  * longs instead of the full distinct-hash relation, and nothing is
  * ever sorted beyond the k-entry TreeSet.
  *
  * Returns NULL when the group holds fewer than k distinct hashes
  * (mirroring the twin's absent rank-k row); the caller falls back to
  * the exact count it already has. Value-identical to the relational
  * form because both compute the same deterministic order statistic
  * over the same portable 60-bit hashes.
  */
case class KmvKth(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  require(k >= 1, "kmv_kth needs k >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_kth needs a LONG hash input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_kth"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) b.insert(it.next())
    b
  }

  override def eval(b: KmvBuffer): Any =
    if (b.set.size >= k) b.set.last.longValue else null

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuffer(k)
    var i = 0
    while (i < n) { b.insert(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKth =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKth =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvKth =
    copy(child = newChild)
}

object KmvSketch {
  /** kth-smallest distinct hash per group (NULL below k distinct). */
  def kmvKth(h: Column, k: Int): Column =
    ExpressionBridge.column(
      KmvKth(ExpressionBridge.expression(h), k).toAggregateExpression())
}

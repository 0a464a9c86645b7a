package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: the k lexicographically-SMALLEST (score, id)
 * long pairs per group, returned as a sorted `array<struct<score, id>>`.
 *
 * This is the aggregate Spark lacks natively (there is `min_by`, but no
 * bounded k-best): the standard per-group top-k formulations either
 * window-rank the whole group (one task sorts the group — a straggler
 * the moment one group dominates) or collect_list + slice (the full
 * group through the aggregation buffer). A `TypedImperativeAggregate`
 * instead keeps a k-bounded binary heap per group in every map task and
 * merges heaps pairwise, so partial aggregation applies: the exchange
 * carries at most k pairs per (group, map partition), never the group.
 * With k=16 and a 90%-skewed group the shuffle payload is 16 rows per
 * partition — the window formulation ships the 90%.
 *
 * Registered as SQL function `topk_pair_min(score, id, k)` (k a
 * foldable positive int) by [[GraftExtensions]]; Column API
 * [[TopKPairMin.topk]].
 */
case class TopKPairMin(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]] {

  // largest-first comparator: the heap root is the current WORST kept
  // pair, evicted when a smaller one arrives
  private def cmp: java.util.Comparator[Array[Long]] =
    new java.util.Comparator[Array[Long]] {
      override def compare(x: Array[Long], y: Array[Long]): Int = {
        val c = java.lang.Long.compare(y(0), x(0))
        if (c != 0) c else java.lang.Long.compare(y(1), x(1))
      }
    }

  lazy val k: Int = {
    require(kExpr.foldable, "topk_pair_min: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"topk_pair_min: k must be positive, got $v")
    v
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](k + 1, cmp)

  private def offer(buf: java.util.PriorityQueue[Array[Long]],
                    pair: Array[Long]): Unit = {
    if (buf.size < k) buf.offer(pair)
    else if (cmp.compare(pair, buf.peek()) > 0) { buf.poll(); buf.offer(pair) }
  }

  override def update(buf: java.util.PriorityQueue[Array[Long]],
                      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, Array(s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Array[Long]],
                     other: java.util.PriorityQueue[Array[Long]])
      : java.util.PriorityQueue[Array[Long]] = {
    other.forEach(p => offer(buf, p))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
    val arr = buf.toArray(new Array[Array[Long]](buf.size))
    java.util.Arrays.sort(arr, cmp.reversed())
    new GenericArrayData(arr.map(p =>
      new GenericInternalRow(Array[Any](p(0), p(1)))))
  }

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { p => bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def prettyName: String = "topk_pair_min"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairMin =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKPairMin {
  /** Column API: k smallest (score, id) pairs per group, sorted. */
  def topk(score: Column, id: Column, k: Int): Column =
    GraftShims.column(TopKPairMin(
      GraftShims.expression(score), GraftShims.expression(id),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
      .toAggregateExpression())
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types._

/**
 * HyperLogLog approximate distinct count over a LONG key (Flajolet/
 * Fusy/Gandouet/Meunier AofA'07) — THE 100 TB cardinality sketch: the
 * aggregation buffer is a fixed 2^p-byte register array regardless of
 * input size, merge is an element-wise max, and partial aggregation
 * applies — the exchange carries one m-byte sketch per (group, map
 * partition) where an exact `count(distinct)` re-shuffles every
 * distinct key. (Spark ships `approx_count_distinct`; this exists as a
 * first-class graft aggregate with a PINNED hash and estimator so
 * results are bit-reproducible across runs, partitionings and rounds —
 * the determinism contract every operator here carries — and its
 * registers are mergeable across shards/days for reuse.)
 *
 * Determinism: key → XXH64(hashLong, seed 42); register index = top p
 * hash bits; rank = leading zeros of the remaining 64−p bits + 1. The
 * estimate is the classic bias-corrected harmonic mean with the
 * small-range linear-counting correction, rounded half-up to a LONG.
 * Every step is integer/IEEE-deterministic, so the estimate digests
 * stably — and the driver runs a FULL DuckDB oracle: the pinned XXH64
 * replays step-for-step in HUGEINT arithmetic and the estimator folds
 * registers in index order (SparkEntry.HllSql); accuracy is pinned vs
 * exact distinct in specs.
 *
 * Registered as SQL `hll_distinct(key, p)` by [[GraftExtensions]];
 * Column API [[HllDistinct.of]].
 */
case class HllDistinct(
    child: Expression, pExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  lazy val p: Int = {
    require(pExpr.foldable, "hll_distinct: p must be a literal")
    val v = pExpr.eval().asInstanceOf[Number].intValue()
    require(v >= 4 && v <= 18, s"hll_distinct: p must be in [4, 18], got $v")
    v
  }
  private lazy val m: Int = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, pExpr)
  override def prettyName: String = "hll_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

object HllDistinct {
  /** Column API: HLL(2^p registers) distinct estimate of a LONG key. */
  def of(key: Column, p: Int): Column =
    GraftShims.column(HllDistinct(
      GraftShims.expression(key),
      org.apache.spark.sql.catalyst.expressions.Literal(p))
      .toAggregateExpression())
}

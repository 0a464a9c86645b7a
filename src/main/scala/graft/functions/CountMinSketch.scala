package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min sketch over a STRING key (Cormode/Muthukrishnan JA'05) —
 * the 100 TB frequency sketch: a fixed `depth × width` long counter
 * grid regardless of input cardinality, merge is element-wise
 * addition (commutative + associative ⇒ batching- and
 * partition-invariant), and partial aggregation applies — the
 * exchange carries one `8·d·w`-byte grid per (group, map partition)
 * where an exact per-key count shuffles every distinct key. Estimates
 * are upper bounds: `est(t) = min over rows r of cell[r][h_r(t)]
 * ≥ true count`, with overshoot bounded by the bucket collisions.
 *
 * Determinism AND oracle-expressibility: row r's bucket for token t is
 * `polyhash("r:" + t) mod width` — the same `h·31 + codepoint mod
 * 1e9+7` fold as [[StringPolyHash]], so a SQL engine can rebuild every
 * cell relationally (group token counts by bucket) and the estimates
 * carry a FULL oracle, unlike inherently non-relational sketches.
 * Every cell value is an exact integer sum ⇒ bit-reproducible across
 * runs, partitionings and engines.
 *
 * Eval returns the flattened grid `ARRAY<BIGINT>` of length d·w
 * (row-major); point estimates read `min_r grid[r·w + bucket(r, t)]`.
 * Registered as SQL `cms_sketch(key, d, w)` by [[GraftExtensions]];
 * Column API [[CountMinSketch.of]].
 */
case class CountMinSketch(
    child: Expression, dExpr: Expression, wExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private def lit(e: Expression, what: String, lo: Int, hi: Int): Int = {
    require(e.foldable, s"cms_sketch: $what must be a literal")
    val v = e.eval().asInstanceOf[Number].intValue()
    require(v >= lo && v <= hi, s"cms_sketch: $what must be in [$lo, $hi], got $v")
    v
  }
  lazy val d: Int = lit(dExpr, "depth", 1, 16)
  lazy val w: Int = lit(wExpr, "width", 16, 1 << 20)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < d) {
        buf(r * w + CountMinSketch.bucket(r, t, w)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, dExpr, wExpr)
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren(0), dExpr = newChildren(1),
      wExpr = newChildren(2))
}

object CountMinSketch {

  /** The [[StringPolyHash]] fold: h = (h·31 + codepoint) mod 1e9+7. */
  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }

  /** Row r's bucket for token t: polyhash("r:" + t) mod w (non-negative). */
  def bucket(r: Int, t: String, w: Int): Int = {
    val h = polyHash(r.toString + ":" + t) % w
    (if (h < 0) h + w else h).toInt
  }

  /** Column API: flattened d×w CMS grid of a STRING key column. */
  def of(key: Column, d: Int, w: Int): Column =
    GraftShims.column(CountMinSketch(
      GraftShims.expression(key), Literal(d), Literal(w))
      .toAggregateExpression())
}

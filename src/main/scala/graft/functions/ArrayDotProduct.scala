package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native codegen'd sequential dot product over two ARRAY<DOUBLE> columns:
 * sum_i a[i]*b[i], accumulated in index order from 0.0 — the same fold
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` computes, and bit-identical
 * to DuckDB's `list_dot_product` over DOUBLE[], so results stay
 * oracle-hash-comparable.
 *
 * Why custom: Spark's higher-order functions (`zip_with`/`aggregate`)
 * evaluate their lambda interpreted, allocate an intermediate array, and
 * break whole-stage codegen. This expression generates a tight primitive
 * loop inside the WholeStageCodegen stage — on the all-pairs embedding
 * queries (|pairs| × 64 multiplies) that is the hot path.
 *
 * Null semantics: NULL if either array is NULL; array ELEMENTS are
 * assumed non-null (embedding vectors), mirroring what the HOF fold did
 * (a null element would have made the whole sum NULL there too — here it
 * raises, which we accept for the vector contract).
 */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column API: dot(a, b); callers must supply ARRAY<DOUBLE> inputs
    * (Similarity.withNorm casts the float vectors once up front). */
  def dot(a: Column, b: Column): Column =
    GraftShims.column(
      ArrayDotProduct(GraftShims.expression(a), GraftShims.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd polynomial rolling-hash fingerprint over a string's
 * Unicode code points: h = fold(h · 31 + codepoint) mod 1e9+7, folded in
 * code-point order from 0 — exactly DuckDB's
 * `list_reduce(list_prepend(0, list_transform(string_split(text, ''),
 * c -> ord(c))), ...)`, so fingerprints stay oracle-hash-comparable.
 *
 * Why custom (same argument as [[ArrayDotProduct]]): the
 * `aggregate(transform(split(text, "")))` formulation allocates a
 * per-character string array and evaluates its lambdas interpreted,
 * breaking whole-stage codegen on the hot path. This expression is one
 * primitive loop inside the WholeStageCodegen stage — no per-character
 * allocation at all.
 */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |java.lang.String $s = $x.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringPolyHash = copy(child = newChild)
}

object StringPolyHash {
  /** Column API: fingerprint(text) for a STRING column. */
  def fingerprint(text: Column): Column =
    GraftShims.column(StringPolyHash(GraftShims.expression(text)))
}

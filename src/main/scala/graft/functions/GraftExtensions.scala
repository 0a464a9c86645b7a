package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extension registering graft's native SQL functions:
 *
 *   - `array_dot(a, b)`  — codegen'd sequential dot product
 *   - `kron_edge(scale, i)` — deterministic Graph500 edge generation
 *   - `poly_fingerprint(text)` — codegen'd rolling-hash fingerprint
 *   - `topk_pair_min(score, id, k)` — bounded-heap per-group top-k
 *   - `hll_distinct(key, p)` — pinned-hash HyperLogLog distinct estimate
 *   - `cms_sketch(key, d, w)` — oracle-expressible Count-Min grid
 *   - `winnow_fingerprints(text, k, w)` — MOSS winnowing selection
 *
 * Activate with `.config("spark.sql.extensions",
 * "graft.functions.GraftExtensions")` (comma-composable with other
 * extensions, per the public SparkSessionExtensions contract).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: naive sliding-window interval joins are
    // rewritten into the banded (Flink-interval-join) form — see
    // graft.plans.RangeJoinRewrite
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_dot takes 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kron_edge"),
      new ExpressionInfo(classOf[KronEdge].getName, "kron_edge"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "kron_edge takes 2 arguments")
        KronEdge(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_pair_min"),
      new ExpressionInfo(classOf[TopKPairMin].getName, "topk_pair_min"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "topk_pair_min takes 3 arguments")
        // raw AggregateFunction: the analyzer wraps it in an
        // AggregateExpression during function resolution
        TopKPairMin(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("poly_fingerprint"),
      new ExpressionInfo(classOf[StringPolyHash].getName, "poly_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "poly_fingerprint takes 1 argument")
        StringPolyHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllDistinct].getName, "hll_distinct"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "hll_distinct takes 2 arguments")
        HllDistinct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinSketch].getName, "cms_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "cms_sketch takes 3 arguments (key, d, w)")
        CountMinSketch(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "winnow_fingerprints takes 3 arguments (text, k, w)")
        def intLit(e: Expression, what: String): Int = {
          require(e.foldable, s"winnow_fingerprints: $what must be a literal")
          e.eval().asInstanceOf[Number].intValue()
        }
        WinnowFingerprints(children.head,
          intLit(children(1), "k"), intLit(children(2), "w"))
      }))
  }
}

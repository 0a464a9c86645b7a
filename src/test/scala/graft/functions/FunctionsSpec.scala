package graft.functions

import graft.SparkSpec
import graft.gen.Kronecker
import org.apache.spark.sql.functions.col

class FunctionsSpec extends SparkSpec {

  test("array_dot callable from SQL, sequential-fold semantics") {
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .head().getDouble(0)
    assert(r === 32.0)
    assert(spark.sql("SELECT array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .head().isNullAt(0))
  }

  test("kron_edge from SQL matches Kronecker.makeEdge") {
    val rows = spark.sql(
      "SELECT id, kron_edge(10, id) AS e FROM range(100)")
      .selectExpr("id", "e.src", "e.dst").collect()
    val (v0, v1) = Kronecker.scrambleVals(2, 3)
    rows.foreach { r =>
      val (s, d) = Kronecker.makeEdge(10, r.getLong(0), 2, 3, v0, v1)
      assert((r.getLong(1), r.getLong(2)) === (s, d))
    }
  }

  test("SQL-expressed generation matches the Dataset generator") {
    val sqlEdges = spark.sql(
      "SELECT e.src, e.dst FROM (SELECT kron_edge(8, id) AS e FROM range(4096))")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dsEdges = Kronecker.generate(spark, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sqlEdges.sorted.toSeq === dsEdges.sorted.toSeq)
  }

  test("poly_fingerprint ≡ the HOF fold it replaces; stays in codegen") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, ""), (3L, "  padded  "),
      (4L, "a"), (5L, "Zz9!?.,\n\ttab"), (6L, "héllo wörld"),
      (7L, "日本語テキスト"), (8L, "mixed 日本 ascii"))
      .toDF("doc_id", "text")
    // reference fold over code points (the DuckDB oracle's ord semantics)
    val expected = docs.collect().map { r =>
      var h = 0L
      r.getString(1).codePoints().forEach(cp => h = (h * 31L + cp) % 1000000007L)
      r.getLong(0) -> h
    }.toMap
    val got = docs.select(col("doc_id"),
        StringPolyHash.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // NULL in, NULL out; SQL registration works
    assert(spark.sql("SELECT poly_fingerprint(CAST(NULL AS STRING))")
      .head().isNullAt(0))
    // the scan+project stays one WholeStageCodegen span (no interpreted
    // HOF lambda in the plan) — checked on a parquet-backed table; a
    // LocalRelation input would be constant-folded to a LocalTableScan
    val plan = graft.ops.TextOps.fingerprint(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen stage marker in the simple string
    assert(plan.contains("*(1) Project") && plan.contains("poly_fingerprint"),
      plan)
    assert(!plan.toLowerCase.contains("lambdafunction"), plan)
  }

  test("hll_distinct: accuracy, partition-invariance, small-range exactness") {
    val s = spark; import s.implicits._
    // 10k distinct keys at p=12 (standard error 1.04/√4096 ≈ 1.6%):
    // demand 4% — duplicated rows must not move the estimate at all
    val keys = (1L to 10000L).flatMap(k => Seq(k, k))
    val est = keys.toDF("k")
      .agg(HllDistinct.of(col("k"), 12)).head().getLong(0)
    assert(math.abs(est - 10000L) <= 400, s"estimate $est")
    // partition-invariant and repeatable (pinned hash, element-max merge)
    val est13 = keys.toDF("k").repartition(13)
      .agg(HllDistinct.of(col("k"), 12)).head().getLong(0)
    assert(est13 === est)
    // linear-counting range: tiny sets land exactly (no collisions at
    // 5/4096 registers, m·ln(m/(m−5)) rounds to 5)
    val tiny = Seq(7L, 8L, 9L, 10L, 11L).toDF("k")
      .agg(HllDistinct.of(col("k"), 12)).head().getLong(0)
    assert(tiny === 5L)
    // SQL registration
    val viaSql = spark.sql(
      "SELECT hll_distinct(id, 12) FROM range(1000)").head().getLong(0)
    assert(math.abs(viaSql - 1000L) <= 60, s"sql estimate $viaSql")
  }

  test("cms_sketch: exact grid sums, upper bound, partition-invariance") {
    val s = spark; import s.implicits._
    val (d, w) = (4, 64)
    val toks = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val grid = toks.toDF("t")
      .agg(CountMinSketch.of(col("t"), d, w)).head().getSeq[Long](0)
    assert(grid.length === d * w)
    // every row of the grid holds the full token mass
    for (r <- 0 until d)
      assert(grid.slice(r * w, (r + 1) * w).sum === toks.size.toLong, s"row $r")
    // the point estimate upper-bounds every true count
    val exact = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    exact.foreach { case (t, n) =>
      val est = (0 until d)
        .map(r => grid(r * w + CountMinSketch.bucket(r, t, w))).min
      assert(est >= n, s"token $t: est $est < exact $n")
    }
    // partition-invariant (element-wise-sum merge is order-free)
    val grid17 = toks.toDF("t").repartition(17)
      .agg(CountMinSketch.of(col("t"), d, w)).head().getSeq[Long](0)
    assert(grid17 === grid)
    // SQL registration ≡ Column API
    val viaSql = toks.toDF("t").createOrReplaceTempView("cms_toks")
    val sqlGrid = spark.sql(s"SELECT cms_sketch(t, $d, $w) FROM cms_toks")
      .head().getSeq[Long](0)
    assert(sqlGrid === grid)
  }

  test("winnow_fingerprints callable from SQL ≡ Column API") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "a b c d e f"), (2L, "x y")).toDF("doc_id", "text")
    d.createOrReplaceTempView("wf_docs")
    val api = graft.ops.TextOps.winnow(d, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val sql = spark.sql(
      """SELECT doc_id, explode(winnow_fingerprints(text, 4, 4)) AS fp
        |FROM wf_docs""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sql === api)
  }
}

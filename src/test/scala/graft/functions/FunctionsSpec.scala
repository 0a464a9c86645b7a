package graft.functions

import graft.SparkSpec
import graft.gen.Kronecker

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
}

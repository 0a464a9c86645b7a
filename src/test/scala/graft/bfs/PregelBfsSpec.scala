package graft.bfs

import graft.SparkSpec
import graft.etl.EdgeOps

/** Cross-check: GraphX Pregel BFS ≡ DataFrame BFS (independent
  * implementations of Q7, SURVEY §3.2). */
class PregelBfsSpec extends SparkSpec {

  test("Pregel BFS equals DataFrame BFS on a hand graph") {
    val s = spark; import s.implicits._
    val raw = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L), (4L, 3L),
      (5L, 6L)).toDF("src", "dst")
    val clean = EdgeOps.cleanEdges(raw)
    val df = Bfs.bfsMinParent(spark, clean, 0L).tree
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val pg = PregelBfs.bfs(spark, clean, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(df === pg)
  }

  test("Pregel BFS equals DataFrame BFS on sf0.001 lineitem graph") {
    val clean = EdgeOps.cleanEdges(
      EdgeOps.edgesFromLineitem(spark, "/root/testdata/sf0.001"))
    val root = clean.agg(org.apache.spark.sql.functions.min("src"))
      .head().getLong(0)
    val df = Bfs.bfsMinParent(spark, clean, root).tree
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val pg = PregelBfs.bfs(spark, clean, root)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(df === pg)
  }
}

package graft.bench

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.bfs.Bfs
import graft.etl.EdgeOps

/** Edge-case behavior of the benchmark drivers and the hybrid BFS gate
  * (round-2 advice items): degenerate inputs must degrade gracefully,
  * and the local kernel must never change behavior vs its distributed
  * twin. */
class RobustnessSpec extends SparkSpec {

  test("finite: non-finite TEPS sanitize to 0.0 so the tail JSON stays parseable") {
    // bare NaN/Infinity literals are invalid JSON, and the compact tail
    // line is exactly what the driver parses
    assert(graft.Bench.finite(Double.NaN) === 0.0)
    assert(graft.Bench.finite(Double.PositiveInfinity) === 0.0)
    assert(graft.Bench.finite(Double.NegativeInfinity) === 0.0)
    assert(graft.Bench.finite(123.5) === 123.5)
    assert(graft.Bench.finite(0.0) === 0.0)
  }

  test("stats: single run reports stddev 0, not NaN") {
    val st = Main.stats(Seq(0.125))
    assert(!st.exists(_.isNaN))
    assert(st(6) === 0.0)
    assert(st(0) === 0.125 && st(4) === 0.125 && st(5) === 0.125)
  }

  test("SPARK_GRAFT_CONF overrides: k=v pairs applied, empty segments ok") {
    Main.applyConfOverrides(spark,
      Some("spark.graft.testKnobA=1;;spark.graft.testKnobB = x ;"))
    assert(spark.conf.get("spark.graft.testKnobA") === "1")
    assert(spark.conf.get("spark.graft.testKnobB") === "x")
    spark.conf.unset("spark.graft.testKnobA")
    spark.conf.unset("spark.graft.testKnobB")
  }

  test("SPARK_GRAFT_CONF overrides: malformed segment names itself") {
    val e = intercept[IllegalArgumentException] {
      Main.applyConfOverrides(spark, Some("spark.graft.ok=1;oops-no-equals"))
    }
    assert(e.getMessage.contains("SPARK_GRAFT_CONF"))
    assert(e.getMessage.contains("oops-no-equals"))
    spark.conf.unset("spark.graft.ok")
  }

  test("hybrid gate: root with only self-loop edges matches distributed") {
    val s = spark
    import s.implicits._
    // raw min(src) = 0, but 0's only edge is a self-loop → absent from the
    // cleaned graph
    val raw = Seq((0L, 0L), (2L, 3L), (3L, 4L), (4L, 2L)).toDF("src", "dst")
    val local = Bfs.bfsMinParentRaw(spark, raw, 0L)
    val g = Bfs.prepare(EdgeOps.cleanEdges(raw))
    try {
      val dist = Bfs.bfsMinParentDistributed(spark, g, 0L)
      assert(local.tree.exceptAll(dist.tree).isEmpty &&
        dist.tree.exceptAll(local.tree).isEmpty,
        "missing-root local tree must equal the distributed loop's")
      assert(local.levelSizes === dist.levelSizes)
    } finally g.unpersist()
  }

  test("multi-root local gate falls back when a root is missing") {
    val s = spark
    import s.implicits._
    val raw = Seq((0L, 0L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val g = Bfs.prepareRaw(raw)
    try {
      // root 0 absent from the cleaned graph → distributed fallback, which
      // reports it all-unreached; root 2 traverses normally
      val multi = Bfs.bfsMinParentMulti(spark, g, Seq(0L, 2L))
      val run0 = multi.filter(col("run") === 0L)
      assert(run0.filter(col("pred") =!= -1L).count() === 0L)
      val run1 = multi.filter(col("run") === 1L && col("depth").isNotNull)
      assert(run1.count() === 3L)
    } finally g.unpersist()
  }

  test("validate=false with non-default edgefactor reports nonzero nedge") {
    val sum = Graph500.run(spark, scale = 8, nRoots = 2, validate = false,
      edgeFactor = 8L)
    assert(sum.runs.nonEmpty)
    assert(sum.runs.forall(_.nedge > 0.0), "nedge fallback must be nonzero")
    assert(sum.harmonicMeanTeps > 0.0 && !sum.harmonicMeanTeps.isInfinite)
    assert(sum.nedgeGoldenOk) // golden check is skipped for ef != 16
  }

  test("pure resume returns checkpoint runs unchanged") {
    val tmp = java.nio.file.Files.createTempFile("g500ckpt", ".txt")
    val runs = Seq(
      Graph500.RunStat(0, 5L, 0.01, 0.02, 100.0, 0),
      Graph500.RunStat(1, 9L, 0.03, 0.04, 100.0, 0))
    Graph500.writeCheckpoint(tmp.toString, runs, scale = 8,
      edgeFactor = graft.gen.Kronecker.DefaultEdgeFactor, nRoots = 2)
    val sum = Graph500.run(spark, scale = 8, nRoots = 2,
      checkpointPath = Some(tmp.toString))
    assert(sum.runs === runs)
    java.nio.file.Files.deleteIfExists(tmp)
  }
}

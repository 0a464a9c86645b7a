package graft

import org.apache.spark.sql.functions._
import graft.bfs.Bfs
import graft.etl.EdgeOps
import graft.validate.Validator

/** Property-style invariants (SURVEY §5.2 item 2) over seeded random
  * graphs — deterministic reproduction, no framework shrinking needed:
  * every failure prints its seed. */
class PropertySpec extends SparkSpec {

  private def randomRaw(seed: Long, nVerts: Int, nEdges: Int) = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    // includes self-loops and duplicates on purpose (raw-list semantics)
    Seq.fill(nEdges)((rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
      .toDF("src", "dst")
  }

  test("cleanEdges: symmetric, loop-free, idempotent (10 seeds)") {
    for (seed <- 0L until 10L) {
      val raw = randomRaw(seed, 30, 60)
      val clean = EdgeOps.cleanEdges(raw)
      val rows = clean.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.forall { case (s, d) => s != d }, s"seed=$seed loops")
      assert(rows.forall { case (s, d) => rows.contains((d, s)) },
        s"seed=$seed asymmetric")
      val again = EdgeOps.cleanEdges(clean).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again === rows, s"seed=$seed not idempotent")
    }
  }

  test("BFS passes all five spec predicates on random graphs (10 seeds)") {
    for (seed <- 100L until 110L) {
      val raw = randomRaw(seed, 40, 80)
      val clean = EdgeOps.cleanEdges(raw)
      if (clean.count() > 0) {
        val root = clean.agg(min("src")).head().getLong(0)
        val maxV = clean.agg(max(greatest(col("src"), col("dst"))))
          .head().getLong(0)
        val tree = Bfs.bfsMinParent(spark, clean, root).tree
        val row = Validator.validate(spark, raw, tree, root, maxV + 1).head()
        val errs = (0 until row.length - 1).map(row.getLong).sum
        assert(errs === 0L, s"seed=$seed validation errors: $row")
        assert(row.getLong(row.length - 1) > 0, s"seed=$seed no edges visited")
      }
    }
  }

  test("BFS depths equal shortest-path distances (5 seeds)") {
    for (seed <- 200L until 205L) {
      val raw = randomRaw(seed, 25, 50)
      val clean = EdgeOps.cleanEdges(raw)
      if (clean.count() > 0) {
        val edges = clean.collect().map(r => (r.getLong(0), r.getLong(1)))
        val root = edges.map(_._1).min
        // driver-side reference BFS distances
        val adj: Map[Long, Seq[Long]] =
          edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSeq) }
        var d = Map(root -> 0L); var f = Set(root); var lvl = 0L
        while (f.nonEmpty) {
          lvl += 1
          val nx = f.flatMap(v => adj.getOrElse(v, Seq.empty))
            .filterNot(x => d.contains(x))
          nx.foreach(v => d += (v -> lvl))
          f = nx
        }
        val got = Bfs.bfsMinParent(spark, clean, root).tree.collect()
          .filter(!_.isNullAt(2)).map(r => (r.getLong(0), r.getLong(2))).toMap
        assert(got === d, s"seed=$seed depth mismatch")
      }
    }
  }

  test("generation is deterministic across invocations") {
    val a = graft.gen.Kronecker.generate(spark, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = graft.gen.Kronecker.generate(spark, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
  }
}

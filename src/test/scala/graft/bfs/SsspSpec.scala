package graft.bfs

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SsspSpec extends SparkSpec {

  /** Driver-side Dijkstra for cross-checking. */
  private def dijkstra(edges: Seq[(Long, Long, Long)], root: Long): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3))).toMap
    val dist = scala.collection.mutable.Map(root -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, root))(
      Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, v) = pq.dequeue()
      if (d == dist(v)) {
        adj.getOrElse(v, Seq.empty).foreach { case (u, w) =>
          if (!dist.contains(u) || d + w < dist(u)) {
            dist(u) = d + w; pq.enqueue((d + w, u))
          }
        }
      }
    }
    dist.toMap
  }

  test("sssp matches Dijkstra on random weighted graphs (5 seeds)") {
    val s = spark; import s.implicits._
    for (seed <- 0L until 5L) {
      val rnd = new scala.util.Random(seed)
      val raw = Seq.fill(60)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
        (rnd.nextInt(9) + 1).toLong)).toDF("src", "dst", "w")
      val wedges = Sssp.weightedEdges(raw)
      val edgeSeq = wedges.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      if (edgeSeq.nonEmpty) {
        val root = edgeSeq.map(_._1).min
        val expected = dijkstra(edgeSeq, root)
        val got = Sssp.sssp(spark, wedges, root).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === expected, s"seed=$seed")
      }
    }
  }

  test("local relaxation kernel equals distributed frontier loop") {
    val s = spark; import s.implicits._
    for (seed <- 20L until 24L) {
      val rnd = new scala.util.Random(seed)
      val raw = Seq.fill(90)((rnd.nextInt(35).toLong, rnd.nextInt(35).toLong,
        (rnd.nextInt(9) + 1).toLong)).toDF("src", "dst", "w")
      val wedges = Sssp.weightedEdges(raw)
      if (wedges.count() > 0) {
        val root = wedges.agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col("src"))).head().getLong(0)
        val loc = Sssp.ssspLocal(spark, wedges, root).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val dist = Sssp.ssspDistributed(spark, wedges, root).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(loc === dist, s"seed=$seed")
      }
    }
  }

  test("sssp on a hand graph prefers cheap long path over expensive hop") {
    val s = spark; import s.implicits._
    // 0-1 costs 10 direct, but 0-2-3-1 costs 3
    val raw = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = Sssp.sssp(spark, Sssp.weightedEdges(raw), 0L)
      .orderBy("vertex").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 0L, 0L), (1L, 3L, 3L), (2L, 1L, 0L),
      (3L, 2L, 2L)))
  }

  test("ssspFromMinRaw equals weightedEdges + ssspFromMin (8 seeds)") {
    val s = spark; import s.implicits._
    for (seed <- 400L until 408L) {
      val rnd = new scala.util.Random(seed)
      // raw list WITH loops and duplicate (src,dst) pairs at different
      // weights — the kernel's min-weight merge must match groupBy.min
      val raw = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
          (rnd.nextInt(9) + 1).toLong))
        .toDF("src", "dst", "w").persist()
      try {
        if (raw.filter(org.apache.spark.sql.functions.col("src") =!=
            org.apache.spark.sql.functions.col("dst")).count() > 0) {
          val viaRaw = graft.bfs.Sssp.ssspFromMinRaw(spark, raw)
            .collect().map(_.toSeq.toVector).toSet
          val viaComposed = graft.bfs.Sssp.ssspFromMin(spark,
              graft.bfs.Sssp.weightedEdges(raw))
            .collect().map(_.toSeq.toVector).toSet
          assert(viaRaw === viaComposed, s"seed=$seed")
        }
      } finally raw.unpersist()
    }
  }
}

package graft.bfs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: kernel ≡ distributed ≡ independent model, and
  * exactness invariants of the integer formulation. */
class PageRankSpec extends SparkSpec {

  /** Independent reference model (Map-based, BigInt-free: longs exact). */
  private def model(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).sorted }
    val n = adj.size
    val base = PageRank.Scale * 15L / 100L / n
    var r = adj.keys.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = adj.map { case (v, ns) =>
        v -> r(v) * PageRank.DampNum / (PageRank.DampDen * ns.size)
      }
      r = adj.map { case (v, ns) => v -> (base + ns.map(contrib).sum) }
    }
    r
  }

  test("path graph: kernel == distributed == model, higher centrality in the middle") {
    val s = spark; import s.implicits._
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val m = model(pairs, 10)
    val csr = LocalCsr.buildFromRawPairs(pairs.flatMap(p => Seq(p._1, p._2)).toArray)
    val kernel = csr.ids.zip(PageRank.pagerankCsr(csr, 10)).toMap
    assert(kernel == m)
    val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
    val dist = PageRank.pagerank(spark, clean, 10)
      .as[(Long, Long)].collect().toMap
    assert(dist == m)
    assert(m(2L) > m(0L) && m(2L) > m(4L)) // middle vertex dominates
  }

  test("broadcast and sort-merge iteration plans produce identical ranks") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
    val bcast = PageRank.pagerank(spark, clean, 10)
      .as[(Long, Long)].collect().toMap
    spark.conf.set("spark.graft.iterBroadcastVerts", "0")
    try {
      val smj = PageRank.pagerank(spark, clean, 10)
        .as[(Long, Long)].collect().toMap
      assert(bcast == smj)
    } finally spark.conf.unset("spark.graft.iterBroadcastVerts")
  }

  test("random graphs: kernel == distributed == model, ranks conserve ~Scale") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 20 + trial * 15
      val pairs = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val m = model(pairs, 10)
      val csr = LocalCsr.buildFromRawPairs(pairs.flatMap(p => Seq(p._1, p._2)).toArray)
      val kernel = csr.ids.zip(PageRank.pagerankCsr(csr, 10)).toMap
      assert(kernel == m, s"kernel trial $trial")
      val dist = PageRank.pagerank(spark,
        graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst")), 10)
        .as[(Long, Long)].collect().toMap
      assert(dist == m, s"dist trial $trial")
      // total rank = Scale minus deterministic floor losses: within
      // |V| + |E| units of Scale, never above
      val total = m.values.sum
      val slack = m.size.toLong * 11L + pairs.size.toLong * 22L
      assert(total <= PageRank.Scale && total >= PageRank.Scale - slack,
        s"mass $total trial $trial")
    }
  }

  test("empty graph yields an empty result, not a division by zero") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.pagerank(spark, empty, 10).count() === 0L)
    assert(PageRank.pagerankCsr(
      LocalCsr.buildFromRawPairs(Array.emptyLongArray), 10).isEmpty)
  }

  test("regular graph (cycle) converges to the uniform fixed point") {
    val n = 12L
    val pairs = (0L until n).map(i => (i, (i + 1) % n))
    val m = model(pairs, 10)
    // all vertices symmetric → identical rank
    assert(m.values.toSet.size == 1)
  }
}

package graft.bfs

import graft.SparkSpec

/** Fixed-round k-core peeling: kernel ≡ distributed ≡ independent
  * model, hand-checkable shapes, and convergence of the default round
  * count. */
class KCoreSpec extends SparkSpec {

  /** Independent reference model over the symmetrized simple graph. */
  private def model(pairs: Seq[(Long, Long)], k: Int,
                    rounds: Int): Map[Long, Long] = {
    var adj = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var deg: Map[Long, Long] = Map.empty
    for (_ <- 1 to rounds) {
      deg = adj.map { case (v, ns) => v -> ns.count(adj.contains).toLong }
      val keep = deg.filter(_._2 >= k).keySet
      adj = adj.view.filterKeys(keep).toMap
    }
    deg.filter(_._2 >= k)
  }

  private def allWays(pairs: Seq[(Long, Long)], k: Int, rounds: Int)
      : (Map[Long, Long], Map[Long, Long], Map[Long, Long]) = {
    val s = spark; import s.implicits._
    val csr = LocalCsr.buildFromRawPairs(
      pairs.flatMap(p => Seq(p._1, p._2)).toArray)
    val (ids, degs) = KCore.kcoreCsr(csr, k, rounds)
    val kernel = ids.zip(degs).toMap
    val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
    val dist = KCore.kcore(spark, clean, k, rounds)
      .as[(Long, Long)].collect().toMap
    (kernel, dist, model(pairs, k, rounds))
  }

  test("triangle with a pendant: pendant and its stub peel out of the 2-core") {
    // triangle 0-1-2 plus pendant path 2-3
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
    val (kernel, dist, m) = allWays(pairs, 2, 3)
    assert(kernel == m && dist == m)
    assert(m == Map(0L -> 2L, 1L -> 2L, 2L -> 2L)) // 3 peeled, core degrees 2
  }

  test("cascading peel: a chain hanging off a clique unravels round by round") {
    // K4 on 0-3 plus chain 3-4-5-6; the 2-core is K4 alone, but the
    // chain only unravels one vertex per round (6 → 5 → 4)
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val pairs = k4 ++ Seq((3L, 4L), (4L, 5L), (5L, 6L))
    val (kernel, dist, m) = allWays(pairs, 2, 5)
    assert(kernel == m && dist == m)
    assert(m.keySet == Set(0L, 1L, 2L, 3L) && m.values.forall(_ == 3L))
    // one round is NOT enough for the cascade — fixed rounds matter
    val oneRound = model(pairs, 2, 1)
    assert(oneRound.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("random graphs: kernel == distributed == model; 5 rounds converged") {
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      val nV = 30 + rnd.nextInt(40)
      val pairs = Seq.fill(3 * nV)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val (kernel, dist, m) = allWays(pairs, 3, 5)
      assert(kernel == m, s"seed=$seed kernel")
      assert(dist == m, s"seed=$seed distributed")
      assert(model(pairs, 3, 8) == m, s"seed=$seed not converged at 5 rounds")
    }
  }

  test("survivor-set and checkpoint paths produce identical cores") {
    val s = spark; import s.implicits._
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(100 + seed)
      val nV = 40 + rnd.nextInt(40)
      val pairs = Seq.fill(3 * nV)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
      val survivor = KCore.kcore(spark, clean, 3, 5)
        .as[(Long, Long)].collect().toMap
      spark.conf.set("spark.graft.iterBroadcastVerts", "0")
      try {
        val checkpointed = KCore.kcore(spark, clean, 3, 5)
          .as[(Long, Long)].collect().toMap
        assert(survivor == checkpointed, s"seed=$seed")
      } finally spark.conf.unset("spark.graft.iterBroadcastVerts")
    }
  }

  test("empty graph and k above max degree yield empty results") {
    val s = spark; import s.implicits._
    val clean = graft.etl.EdgeOps.cleanEdges(
      Seq((0L, 1L)).toDF("src", "dst"))
    assert(KCore.kcore(spark, clean, 5, 3).count() == 0L)
    val csr = LocalCsr.buildFromRawPairs(Array(0L, 1L))
    assert(KCore.kcoreCsr(csr, 5, 3)._1.isEmpty)
  }
}

package graft.bfs

import graft.SparkSpec

/** Synchronous fixed-round LPA: kernel ≡ distributed ≡ independent
  * model, deterministic tie-breaks, and community recovery on a
  * two-cluster graph. */
class LabelPropagationSpec extends SparkSpec {

  /** Independent model over the symmetrized simple graph. */
  private def model(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var labels = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (v, ns) =>
        val counts = ns.groupBy(labels).map { case (l, xs) => l -> xs.size }
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def allWays(pairs: Seq[(Long, Long)], rounds: Int)
      : (Map[Long, Long], Map[Long, Long], Map[Long, Long]) = {
    val s = spark; import s.implicits._
    val csr = LocalCsr.buildFromRawPairs(
      pairs.flatMap(p => Seq(p._1, p._2)).toArray)
    val kernel = csr.ids.zip(LabelPropagation.lpaCsr(csr, rounds)).toMap
    val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
    val dist = LabelPropagation.lpa(spark, clean, rounds)
      .as[(Long, Long)].collect().toMap
    (kernel, dist, model(pairs, rounds))
  }

  test("two cliques with one bridge: each clique converges to its min id") {
    val c1 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val pairs = c1 ++ c2 ++ Seq((3L, 10L))
    val (kernel, dist, m) = allWays(pairs, 4)
    assert(kernel == m && dist == m)
    // clique members agree on a community label from their own clique
    assert(Seq(0L, 1L, 2L).map(m).distinct.size == 1 && m(0L) < 10L)
    assert(Seq(11L, 12L, 13L).map(m).distinct.size == 1)
  }

  test("random graphs: kernel == distributed == model (4 seeds)") {
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      val nV = 20 + rnd.nextInt(30)
      val pairs = Seq.fill(3 * nV)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter(p => p._1 != p._2)
      val (kernel, dist, m) = allWays(pairs, 4)
      assert(kernel == m, s"seed=$seed kernel")
      assert(dist == m, s"seed=$seed distributed")
    }
  }

  test("tie-break is the smallest label") {
    // star: center 5 with leaves 1,2 — round 1: center sees labels
    // {1,2} each once → min tie-break picks 1
    val pairs = Seq((5L, 1L), (5L, 2L))
    val (kernel, dist, m) = allWays(pairs, 1)
    assert(kernel == m && dist == m)
    assert(m(5L) == 1L)
    assert(m(1L) == 5L && m(2L) == 5L) // leaves adopt the center's label
  }

  test("modularityTop: kernel ≡ distributed ≡ hand model") {
    val s = spark; import s.implicits._
    // two 4-cliques + a bridge: LPA(4) recovers the cliques
    val c1 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val pairs = c1 ++ c2 ++ Seq((3L, 10L))
    val csr = LocalCsr.buildFromRawPairs(
      pairs.flatMap(p => Seq(p._1, p._2)).toArray)
    val labels = LabelPropagation.lpaCsr(csr, 4)
    val kernel = LabelPropagation.modularityTopCsr(spark, csr, labels, 20)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
    val dist = LabelPropagation.modularityTop(clean,
        LabelPropagation.lpa(spark, clean, 4), 20)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(kernel === dist)
    // hand model from the known partition {0-3}, {10-13}:
    // 2m = 26 directed edges; community A: k=13 (12 internal + bridge),
    // in=12; community B symmetric
    val byC = kernel.map(r => r._1 -> r).toMap
    assert(kernel.map(_._2).sum === 8L)
    byC.values.foreach { case (_, members, kc, inc, q) =>
      assert(members === 4L)
      assert(kc === 13L && inc === 12L)
      assert(q === graft.ops.LocalDedup.round6(12.0 / 26 - (13.0 / 26) * (13.0 / 26)))
    }
  }

  test("conductanceTop: two cliques with one bridge, hand-checked φ") {
    val s = spark; import s.implicits._
    // cliques {0,1,2} and {10,11,12}, bridge 2–10
    val raw = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L),
      (11L, 12L), (2L, 10L)).toDF("src", "dst")
    val clean = graft.etl.EdgeOps.cleanEdges(raw)
    val out = LabelPropagation.conductanceTop(clean,
        LabelPropagation.lpa(spark, clean, 4), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // each community: vol = 2·3 + 1 = 7, cut = 1 → φ = 1/7
    assert(out.length === 2)
    out.foreach { case (_, m, kc, cut, phi) =>
      assert(m === 3L && kc === 7L && cut === 1L)
      assert(phi === graft.ops.LocalDedup.round6(1.0 / 7))
    }
  }

  test("conductanceTop: random graphs kernel ≡ distributed; φ in [0,1]") {
    val s = spark; import s.implicits._
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(300 + seed)
      val nV = 18 + rnd.nextInt(20)
      val pairs = Seq.fill(3 * nV)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter(p => p._1 != p._2)
      val csr = LocalCsr.buildFromRawPairs(
        pairs.flatMap(p => Seq(p._1, p._2)).toArray)
      val labels = LabelPropagation.lpaCsr(csr, 4)
      val kernel = LabelPropagation.conductanceTopCsr(spark, csr, labels, 5)
        .collect().map(_.toSeq.toVector).toSeq
      val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
      val dist = LabelPropagation.conductanceTop(clean,
          LabelPropagation.lpa(spark, clean, 4), 5)
        .collect().map(_.toSeq.toVector).toSeq
      assert(kernel === dist, s"seed=$seed")
      kernel.foreach { r =>
        if (r(4) != null) {
          val phi = r(4).asInstanceOf[Double]
          assert(phi >= 0.0 && phi <= 1.0, s"seed=$seed phi=$phi")
        }
      }
    }
  }

  test("modularityTop: random graphs kernel ≡ distributed, k truncates") {
    val s = spark; import s.implicits._
    for (seed <- 0 until 3) {
      val rnd = new scala.util.Random(100 + seed)
      val nV = 18 + rnd.nextInt(20)
      val pairs = Seq.fill(3 * nV)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter(p => p._1 != p._2)
      val csr = LocalCsr.buildFromRawPairs(
        pairs.flatMap(p => Seq(p._1, p._2)).toArray)
      val labels = LabelPropagation.lpaCsr(csr, 4)
      val k = 5
      val kernel = LabelPropagation.modularityTopCsr(spark, csr, labels, k)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val clean = graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
      val dist = LabelPropagation.modularityTop(clean,
          LabelPropagation.lpa(spark, clean, 4), k)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(kernel === dist, s"seed=$seed")
      assert(kernel.length <= k, s"seed=$seed")
    }
  }
}

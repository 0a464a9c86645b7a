package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Equality specs for the hybrid ANN executor: the driver-local
  * [[LocalSimilarity]] kernels must produce exactly the distributed
  * pipelines' rows — scoring, rounding, and (cosine desc, id asc)
  * tie-breaks included. */
class LocalSimilaritySpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  private def bothWays(q: => DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    spark.conf.unset("spark.graft.localAnnMaxVecs")
    val local = sorted(q)
    spark.conf.set("spark.graft.localAnnMaxVecs", "0")
    val dist = try sorted(q)
    finally spark.conf.unset("spark.graft.localAnnMaxVecs")
    (local, dist)
  }

  /** Random corpus with exact-duplicate vectors (cosine ties → id
    * tie-break must match). */
  private def corpus(n: Int, dims: Int, seed: Long): DataFrame = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    val base = Seq.fill(n)(Array.fill(dims)(rnd.nextFloat() * 2f - 1f))
    val rows = base.zipWithIndex.map { case (v, i) =>
      // every 4th vector duplicates its predecessor → guaranteed ties
      (i.toLong, if (i % 4 == 3) base(i - 1) else v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK: kernel ≡ distributed (ties included)") {
    for (seed <- 1L to 3L) {
      val (l, d) = bothWays(Similarity.bruteForceTopK(corpus(60, 8, seed), 5, 10))
      assert(l === d, s"seed=$seed")
      assert(l.size === 50)
    }
  }

  test("ivfTopK: kernel ≡ distributed (assignment + probe ordering)") {
    for (seed <- 1L to 3L) {
      val (l, d) = bothWays(Similarity.ivfTopK(corpus(60, 8, seed), 5, 10, 16, 4))
      assert(l === d, s"seed=$seed")
      assert(l.nonEmpty)
    }
  }

  test("pqTopK: kernel ≡ distributed (codes, LUT folds, ties)") {
    for (seed <- 1L to 3L) {
      val (l, d) = bothWays(Similarity.pqTopK(corpus(60, 8, seed), 4, 8, 5, 10))
      assert(l === d, s"seed=$seed")
      assert(l.size === 50)
    }
  }

  test("pqTopK: exact-duplicate vectors take identical codes; recall sane") {
    val s = spark; import s.implicits._
    val c = corpus(80, 16, 11L)
    val pq = Similarity.pqTopK(c, 4, 8, 5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(c, 5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // duplicate pairs (i%4==3 duplicates i-1): identical vectors get the
    // same codes, so each ranks as its twin's top ADC hit
    val dupPairs = (0 until 80).filter(_ % 4 == 3)
      .map(i => (i.toLong, i.toLong - 1))
    val top1 = Similarity.pqTopK(c, 4, 8, 5, 10).collect()
      .filter(_.getLong(2) == 1L).map(r => (r.getLong(0), r.getLong(1))).toMap
    dupPairs.filter(_._1 < 10).foreach { case (a, b) =>
      assert(top1(a) === b, s"dup $a should retrieve twin $b first") }
    // ADC is approximate: still demand meaningful overlap with exact
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall $recall implausibly low")
  }

  test("pqTopKTrained: kernel ≡ distributed; trained recall ≥ floor") {
    val c = corpus(80, 16, 21L)
    val (l, d) = bothWays(Similarity.pqTopKTrained(c, 4, 8, 5, 10, 3))
    assert(l === d)
    assert(l.size === 50)
    val exact = Similarity.bruteForceTopK(c, 5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = Similarity.pqTopKTrained(c, 4, 8, 5, 10, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (trained intersect exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"trained PQ recall $recall implausibly low")
  }

  test("knnGraph: kernel ≡ distributed block path (ties included)") {
    for (seed <- 1L to 3L) {
      val (l, d) = bothWays(Similarity.knnGraph(corpus(60, 8, seed), 3))
      assert(l === d, s"seed=$seed")
      assert(l.size === 180) // every vector gets exactly k neighbors
    }
  }

  test("knnGraph LSH path: subset of exact ranks, duplicate recall 1") {
    val c = corpus(80, 8, 7L)
    // exact graph via the kernel path
    spark.conf.unset("spark.graft.localAnnMaxVecs")
    val exact = Similarity.knnGraph(c, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // force the banded-LSH strategy AND the distributed plan
    spark.conf.set("spark.graft.localAnnMaxVecs", "0")
    spark.conf.set("spark.graft.embeddingBlockMaxVecs", "0")
    val lsh = try Similarity.knnGraph(c, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    finally {
      spark.conf.unset("spark.graft.localAnnMaxVecs")
      spark.conf.unset("spark.graft.embeddingBlockMaxVecs")
    }
    // every exact duplicate (cosine 1 — identical band keys by
    // construction) is recovered as the top neighbor of its twin;
    // random far-apart vectors may legitimately land in no shared
    // bucket (the documented LSH recall tradeoff), so only the
    // guaranteed edges are pinned
    for (i <- 0 until 80 if i % 4 == 3) {
      assert(lsh.exists(h => h._1 == i.toLong && h._2 == (i - 1).toLong
        && h._3 == 1L), s"dup pair ($i, ${i - 1}) missed")
    }
    // sanity of the emitted graph: no self edges, ranks within k,
    // and a non-trivial share of the exact graph present
    // (deterministic: fixed seed + RNG-free banding)
    assert(lsh.forall(h => h._1 != h._2))
    assert(lsh.forall(h => h._3 >= 1L && h._3 <= 3L))
    val lshSet = lsh.map(h => (h._1, h._2)).toSet
    assert((exact.count(lshSet): Double) / exact.size >= 0.10)
  }

  test("recallAtK: per-query hit counts, zero-hit queries kept") {
    val s = spark; import s.implicits._
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L))
      .toDF("query_id", "neighbor_id")
    val exact = Seq((1L, 10L), (1L, 12L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out === Array(
      (1L, 1L, 2L, 0.5), (2L, 0L, 1L, 0.0), (3L, 0L, 1L, 0.0)))
  }

  test("sim_recall wiring: IVF recall vs brute is sane on a random corpus") {
    val c = corpus(60, 8, 5L)
    val r = Similarity.recallAtK(
        Similarity.ivfTopK(c, 5, 10, 16, 4),
        Similarity.bruteForceTopK(c, 5, 10))
      .collect().map(x => (x.getLong(0), x.getDouble(3)))
    assert(r.length === 10)
    // probing 4 of 16 stand-in cells must beat random cell coverage
    assert(r.map(_._2).sum / r.length >= 0.25)
    assert(r.forall(x => x._2 >= 0.0 && x._2 <= 1.0))
  }

  test("embeddingDedup: kernel ≡ distributed block path (ties included)") {
    for (seed <- 1L to 3L) {
      val (l, d) = bothWays(Dedup.embeddingDedup(corpus(60, 8, seed), 0.3))
      assert(l === d, s"seed=$seed")
      assert(l.nonEmpty) // duplicated vectors → cosine-1 pairs exist
    }
  }

  test("ivfTopK trained (k-means): kernel ≡ distributed") {
    for (seed <- 1L to 3L) {
      val (l, d) = bothWays(
        Similarity.ivfTopK(corpus(60, 8, seed), 5, 10, 16, 4, nIter = 3))
      assert(l === d, s"seed=$seed")
      assert(l.nonEmpty)
    }
  }

  /** Trained-centroid quality at sf0.1. Recall-vs-stand-in is not a fair
    * bar on this workload: the driver queries (vec_id < 10) ARE stand-in
    * centroids (vec_id < 16), so each query probes its own perfectly
    * centered cell — an artifact a real query set doesn't have. The
    * durable k-means benefits asserted instead: a recall floor against
    * brute force, and better cell BALANCE (max cell fraction bounds the
    * worst probe cost — the quantity that matters when a cell is a
    * shuffle partition at corpus scale). */
  test("trained IVF: recall floor + better cell balance than stand-in (sf0.1)") {
    val t = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .persist()
    try {
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Similarity.bruteForceTopK(t, 5, 10))
      val trained = pairs(Similarity.ivfTopK(t, 5, 10, 16, 4, nIter = 3))
      val rTrained = (trained & exact).size.toDouble / exact.size
      info(f"trained recall@4probes $rTrained%.3f")
      assert(rTrained >= 0.9, f"trained recall $rTrained%.3f < 0.9")

      // cell balance: assign the full corpus to each centroid set
      val rows = t.select("vec_id", "embedding").collect()
        .sortBy(_.getLong(0))
      val ids = rows.map(_.getLong(0))
      val vecs = rows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
      val c = new LocalSimilarity.Corpus(ids, vecs)
      def maxCellFrac(cents: Array[Array[Double]]): Double = {
        val cnrm = cents.map(v => math.sqrt(LocalSimilarity.dot(v, v)))
        val counts = new Array[Long](cents.length)
        var i = 0
        while (i < c.size) {
          var best = 0
          var bestCos = Double.NegativeInfinity
          var ci = 0
          while (ci < cents.length) {
            val cos = LocalSimilarity.dot(c.vecs(i), cents(ci)) /
              (c.nrm(i) * cnrm(ci))
            if (cos > bestCos) { bestCos = cos; best = ci }
            ci += 1
          }
          counts(best) += 1
          i += 1
        }
        counts.max.toDouble / c.size
      }
      val standCents = vecs.take(16)
      val trainedCents = Similarity.trainCentroids(t, 16, 3)
      val fStand = maxCellFrac(standCents)
      val fTrained = maxCellFrac(trainedCents)
      info(f"max cell fraction stand-in $fStand%.3f trained $fTrained%.3f")
      assert(fTrained <= fStand,
        f"trained max cell $fTrained%.3f worse than stand-in $fStand%.3f")
    } finally t.unpersist()
  }

  test("embeddingDedup above the block limit: hyperplane-LSH, no cartesian") {
    val t = corpus(120, 8, 5L)
    // exact reference from the block path (local kernels off)
    spark.conf.set("spark.graft.localAnnMaxVecs", "0")
    try {
      val exact = sorted(Dedup.embeddingDedup(t, 0.9))
      // force the LSH path: block limit 0
      spark.conf.set("spark.graft.embeddingBlockMaxVecs", "0")
      val lsh = Dedup.embeddingDedup(t, 0.9)
      val plan = lsh.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = sorted(lsh)
      // LSH finds a subset of the exact pairs; every found pair carries
      // the bit-identical exact cosine
      val exactSet = exact.map(_.mkString("|")).toSet
      assert(got.forall(r => exactSet(r.mkString("|"))))
      // the every-4th-duplicate pairs sit at cosine 1.0: identical vectors
      // share every band signature, so LSH recall on them is exactly 1
      val dupPairs = exact.filter(_.last == 1.0)
      val gotSet = got.map(_.mkString("|")).toSet
      assert(dupPairs.nonEmpty && dupPairs.forall(r => gotSet(r.mkString("|"))))
      // overall recall stays high at this threshold (deterministic: fixed
      // corpus, fixed hyperplanes)
      assert(got.size >= (exact.size * 0.8).toInt,
        s"recall ${got.size}/${exact.size}")
    } finally {
      spark.conf.unset("spark.graft.embeddingBlockMaxVecs")
      spark.conf.unset("spark.graft.localAnnMaxVecs")
    }
  }

  test("kernel ≡ distributed on sf0.001 embeddings") {
    val t = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (lb, db) = bothWays(Similarity.bruteForceTopK(t, 5, 10))
    assert(lb === db)
    val (li, di) = bothWays(Similarity.ivfTopK(t, 5, 10, 16, 4))
    assert(li === di)
  }

  test("topKForQueryStream ≡ bruteForceTopK on the same queries (batch)") {
    val t = corpus(60, 8, 9L)
    val queries = t.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val viaStreamOp = sorted(Similarity.topKForQueryStream(queries, t, 5))
    val viaBrute = sorted(Similarity.bruteForceTopK(t, 5, 10))
    assert(viaStreamOp === viaBrute)
  }

  test("topKForQueryStream above the block limit: LSH join plan, no " +
      "corpus collect, guaranteed pairs exact") {
    val c = corpus(80, 8, 12L)
    val queries = c.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    // below the limit: the broadcast path — no join anywhere in the plan
    val below = Similarity.topKForQueryStream(queries, c, 3)
    assert(!below.queryExecution.executedPlan.toString.contains("Join"),
      "below-limit path should broadcast, not join")
    // above the limit: band-key equi-join candidates; the corpus is
    // never collected (the plan carries the corpus scan + a Join)
    spark.conf.set("spark.graft.embeddingBlockMaxVecs", "1")
    try {
      val lshDf = Similarity.topKForQueryStream(queries, c, 3)
      val plan = lshDf.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), plan)
      val lsh = lshDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      // identical band keys by construction: every query's exact
      // duplicate twin (i%4==3 duplicates i-1) is recovered at rank 1
      for (i <- 0 until 10 if i % 4 == 3)
        assert(lsh.exists(h => h._1 == i.toLong && h._2 == (i - 1).toLong
          && h._3 == 1L && h._4 == 1.0), s"dup pair ($i, ${i - 1}) missed")
      assert(lsh.forall(h => h._1 != h._2))
      assert(lsh.forall(h => h._3 >= 1L && h._3 <= 3L))
      // per-query ranks are dense from 1 with no duplicate neighbors
      lsh.groupBy(_._1).foreach { case (q, hits) =>
        assert(hits.map(_._2).distinct.length == hits.length, s"q=$q dup")
        assert(hits.map(_._3).sorted.toSeq ==
          (1L to hits.length.toLong).toSeq, s"q=$q ranks")
      }
    } finally spark.conf.unset("spark.graft.embeddingBlockMaxVecs")
  }

  test("topKForQueryStream above the block limit runs append-mode " +
      "Structured Streaming (stream-static LSH join, stateless top-k)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val staticCorpus = corpus(30, 8, 10L).persist()
    spark.conf.set("spark.graft.embeddingBlockMaxVecs", "1")
    try {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val qdf = mem.toDF().toDF("vec_id", "embedding")
      val q = Similarity.topKForQueryStream(qdf, staticCorpus, 3)
        .writeStream.format("memory").queryName("annlsh").outputMode("append")
        .start()
      try {
        val qvec = staticCorpus.filter($"vec_id" === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        mem.addData((1000L, qvec))
        q.processAllAvailable()
        val hits = spark.sql("SELECT * FROM annlsh ORDER BY rank").collect()
        // the query duplicates corpus vector 0: identical band keys
        // guarantee the candidate join surfaces it — top hit at cosine 1
        assert(hits.nonEmpty)
        assert(hits(0).getLong(1) === 0L && hits(0).getDouble(3) === 1.0)
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.graft.embeddingBlockMaxVecs")
      staticCorpus.unpersist()
    }
  }

  test("topKForQueryStream scores queries under Structured Streaming") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val staticCorpus = corpus(30, 8, 10L).persist()
    try {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val qdf = mem.toDF().toDF("vec_id", "embedding")
      val q = Similarity.topKForQueryStream(qdf, staticCorpus, 3)
        .writeStream.format("memory").queryName("annhits").outputMode("append")
        .start()
      try {
        val qvec = staticCorpus.filter($"vec_id" === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        mem.addData((1000L, qvec))
        q.processAllAvailable()
        val hits = spark.sql("SELECT * FROM annhits ORDER BY rank").collect()
        assert(hits.length === 3)
        // the query duplicates corpus vector 0 → its top hit is vec 0 at
        // cosine 1 (and its duplicate partner from the every-4th rule)
        assert(hits(0).getLong(1) === 0L && hits(0).getDouble(3) === 1.0)
      } finally q.stop()
    } finally staticCorpus.unpersist()
  }
}

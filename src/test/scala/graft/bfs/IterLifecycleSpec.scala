package graft.bfs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resource lifecycle of the iterative loops: the explicitly persisted
  * edge/outdeg caches must be released on EVERY exit path — success,
  * both strategies, and a body that throws mid-evaluation (cancelled
  * job, bad input) — so a long-lived session serving many graphs never
  * accumulates dead caches. (localCheckpoint blocks are reclaimed by
  * the ContextCleaner on GC and are not asserted here; the leak class
  * this spec pins is the STRONG-referenced `persist` registration.) */
class IterLifecycleSpec extends SparkSpec {

  /** Ids of RDDs registered as persistent EXCLUDING localCheckpoint
    * blocks: checkpoints are reclaimed by the ContextCleaner once
    * unreferenced (weakly held), so they are not the leak class this
    * spec pins — the STRONG persist() registrations are. */
  private def strongPersistedIds: Set[Int] = {
    // isLocallyCheckpointed is private[spark] — package-private in Scala
    // is public bytecode, so reflection reads it (test-only probe)
    def isLocalCk(r: org.apache.spark.rdd.RDD[_]): Boolean =
      r.getClass.getMethod("isLocallyCheckpointed")
        .invoke(r).asInstanceOf[Boolean]
    spark.sparkContext.getPersistentRDDs
      .filterNot(kv => isLocalCk(kv._2)).keySet.toSet
  }

  /** Run `body`, then assert it released every plain persist() it took
    * out. The operators use unpersist(blocking = false): removal from
    * the persistent-RDD registry is synchronous (only block deletion is
    * async), so new strong ids must be gone right after the run — a
    * short poll covers CacheManager bookkeeping only. */
  private def assertNoNewPersists[A](label: String)(body: => A): A = {
    val before = strongPersistedIds
    val out = body
    val deadline = System.nanoTime() + 5000000000L
    var extra = strongPersistedIds -- before
    while (extra.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      extra = strongPersistedIds -- before
    }
    assert(extra.isEmpty, s"$label leaked persistent RDDs: $extra")
    out
  }

  private def cleanGraph = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val pairs = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    graft.etl.EdgeOps.cleanEdges(pairs.toDF("src", "dst"))
  }

  /** A relation whose evaluation throws — exercises the mid-loop
    * exception path without any special hooks in the operators. */
  private def explodingEdges = {
    val s = spark; import s.implicits._
    val boom = udf { (x: Long) =>
      if (x >= 0) throw new IllegalStateException("boom"); x
    }
    Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
      .select(boom(col("src")).as("src"), col("dst"))
  }

  test("pagerank releases its caches on success (both strategies)") {
    val g = cleanGraph.localCheckpoint(true)
    assertNoNewPersists("pagerank driver-state") {
      PageRank.pagerank(spark, g, 5).collect()
    }
    spark.conf.set("spark.graft.iterBroadcastVerts", "0")
    try assertNoNewPersists("pagerank shuffle") {
      PageRank.pagerank(spark, g, 5).collect()
    } finally spark.conf.unset("spark.graft.iterBroadcastVerts")
  }

  test("kcore releases its caches on success (both strategies)") {
    val g = cleanGraph.localCheckpoint(true)
    assertNoNewPersists("kcore survivor-set") {
      KCore.kcore(spark, g, 2, 3).collect()
    }
    spark.conf.set("spark.graft.iterBroadcastVerts", "0")
    try assertNoNewPersists("kcore checkpoint") {
      KCore.kcore(spark, g, 2, 3).collect()
    } finally spark.conf.unset("spark.graft.iterBroadcastVerts")
  }

  test("a body that throws mid-run still releases the caches") {
    val bad = explodingEdges
    assertNoNewPersists("pagerank thrown") {
      intercept[Exception](PageRank.pagerank(spark, bad, 5).collect())
    }
    assertNoNewPersists("kcore thrown") {
      intercept[Exception](KCore.kcore(spark, bad, 2, 3).collect())
    }
  }

  test("repeat pagerank invocations do not accumulate driver-state broadcasts") {
    // the |V|-bounded bcIdx/bcDegs pair is destroyed per invocation —
    // observable as: many invocations still work and leave no
    // persistent-RDD growth (broadcast ids are not enumerable from the
    // public API; destroyed broadcasts failing a re-read would surface
    // as SparkException here if the finally destroyed a live one)
    val g = cleanGraph.localCheckpoint(true)
    val expect = PageRank.pagerank(spark, g, 3).collect().sortBy(_.getLong(0))
    assertNoNewPersists("pagerank x5") {
      for (_ <- 1 to 5) {
        val got = PageRank.pagerank(spark, g, 3).collect().sortBy(_.getLong(0))
        assert(got.map(_.toString).toSeq == expect.map(_.toString).toSeq)
      }
    }
  }

  /** Live broadcast BLOCKS in the block manager (reflection: the
    * BlockManagerMaster query is private[spark] = public bytecode).
    * Includes Spark's own taskBinary broadcasts, which linger until the
    * ContextCleaner sees them GC'd — callers must gc+poll and compare
    * against a baseline rather than expect an absolute zero. */
  private def broadcastBlockCount: Int = {
    val bm = org.apache.spark.SparkEnv.get.blockManager
    val master = bm.getClass.getMethod("master").invoke(bm)
    val m = master.getClass.getMethods
      .find(_.getName == "getMatchingBlockIds").get
    val filter: org.apache.spark.storage.BlockId => Boolean = _.isBroadcast
    m.invoke(master, filter, java.lang.Boolean.TRUE)
      .asInstanceOf[Seq[_]].size
  }

  test("repeat pagerank invocations leave zero lingering broadcast blocks") {
    val g = cleanGraph.localCheckpoint(true)
    PageRank.pagerank(spark, g, 3).collect() // warm the code paths
    System.gc()
    Thread.sleep(500)
    val baseline = broadcastBlockCount
    for (_ <- 1 to 5) PageRank.pagerank(spark, g, 4).collect()
    // per-iteration bcC and per-invocation bcIds/bcIdx/bcDegs are
    // destroy()ed eagerly; taskBinary broadcasts drain via gc +
    // ContextCleaner — poll back down to the pre-run baseline
    val deadline = System.nanoTime() + 30000000000L
    var n = broadcastBlockCount
    while (n > baseline && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(300)
      n = broadcastBlockCount
    }
    assert(n <= baseline,
      s"broadcast blocks lingered after 5 pagerank runs: $n > baseline $baseline")
  }

  test("asymmetric input: driver-state matches the shuffle path's sink handling") {
    val s = spark; import s.implicits._
    // dst=99 never appears as src — outside pagerank's documented
    // symmetric contract; both strategies must OMIT it (not NPE)
    val asym = Seq((1L, 2L), (2L, 1L), (1L, 99L)).toDF("src", "dst")
      .localCheckpoint(true)
    val ds = PageRank.pagerank(spark, asym, 3).as[(Long, Long)].collect().toMap
    spark.conf.set("spark.graft.iterBroadcastVerts", "0")
    val sh = try PageRank.pagerank(spark, asym, 3).as[(Long, Long)].collect().toMap
      finally spark.conf.unset("spark.graft.iterBroadcastVerts")
    assert(!ds.contains(99L) && !sh.contains(99L))
    assert(ds == sh)
  }

  test("auto-sized iter cap: floor, scaling band, and hard ceiling") {
    // 2 GB driver: floor
    assert(PageRank.autoIterBroadcastVerts(2L << 30) ==
      PageRank.IterBroadcastVertsFloor)
    // 64 GiB: heap/32/128B = 16.7M — inside the band
    assert(PageRank.autoIterBroadcastVerts(64L << 30) == (64L << 30) / 32 / 128)
    // 1 TiB: ceiling wins
    assert(PageRank.autoIterBroadcastVerts(1L << 40) ==
      PageRank.IterBroadcastVertsCeil)
    // monotone in heap
    val caps = Seq(1L << 30, 8L << 30, 32L << 30, 128L << 30, 1L << 41)
      .map(PageRank.autoIterBroadcastVerts)
    assert(caps == caps.sorted)
  }

  test("auto-sized validation cap: floor, executor-memory sizing, 8GB clamp") {
    import graft.validate.Validator
    // small heap: floor
    assert(Validator.autoBroadcastVerts(4L << 30) == Validator.BroadcastVertsFloor)
    // 64 GiB: 64Gi/16/32 = 128M — under the clamp
    assert(Validator.autoBroadcastVerts(64L << 30) == (64L << 30) / 16 / 32)
    // 1 TiB heap: clamped so the hashed relation stays under 8 GB
    val clamped = Validator.autoBroadcastVerts(1L << 40)
    assert(clamped == Validator.BroadcastRelationByteCeil /
      Validator.BroadcastBytesPerVertex)
    assert(clamped * Validator.BroadcastBytesPerVertex < (8L << 30))
    // with no confs set, the live derivation sizes from this JVM's heap
    assert(Validator.broadcastVerts(spark) ==
      Validator.autoBroadcastVerts(Runtime.getRuntime.maxMemory))
    // an explicit conf override is trusted as-is (no clamp)
    spark.conf.set("spark.graft.validateBroadcastVerts", "999999999999")
    try assert(Validator.broadcastVerts(spark) == 999999999999L)
    finally spark.conf.unset("spark.graft.validateBroadcastVerts")
  }
}

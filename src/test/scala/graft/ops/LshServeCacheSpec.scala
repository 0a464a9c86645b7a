package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The LSH serving path's banded-corpus persist must be memoized per
  * corpus, not re-registered per call: Dataset.persist pins the plan in
  * the session CacheManager until an explicit unpersist (the
  * ContextCleaner never reclaims it), so a per-call persist would leak
  * one cached exploded relation per invocation for the session
  * lifetime. */
class LshServeCacheSpec extends SparkSpec {

  private def mkCorpus(n: Int, seed: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.sin(seed + i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("repeat serves of one corpus reuse one cached banded relation") {
    val corpus = mkCorpus(40, 1)
    val queries = mkCorpus(5, 1)
    spark.conf.set("spark.graft.embeddingBlockMaxVecs", "0") // force LSH
    try {
      Similarity.topKForQueryStream(queries, corpus, k = 3).count()
      val after1 = spark.sparkContext.getPersistentRDDs.size
      val r2 = Similarity.topKForQueryStream(queries, corpus, k = 3)
      r2.count()
      val after2 = spark.sparkContext.getPersistentRDDs.size
      assert(after2 === after1,
        s"second serve registered ${after2 - after1} new cached relations " +
          "— the banded corpus must be memoized, not re-persisted per call")
      // and the memoized path still answers: deterministic plan, same rows
      val r3 = Similarity.topKForQueryStream(queries, corpus, k = 3)
      assert(r3.exceptAll(r2).isEmpty && r2.exceptAll(r3).isEmpty)
    } finally spark.conf.unset("spark.graft.embeddingBlockMaxVecs")
  }
}

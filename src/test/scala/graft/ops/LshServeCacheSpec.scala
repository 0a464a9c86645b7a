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
    val bandKeys = org.apache.spark.sql.functions.udf(
      (v: Seq[Double]) => Dedup.hyperplaneBandKeys(v).toSeq)
    // memoization is by (session, canonicalized corpus plan): repeat
    // lookups — including via a content-identical but distinct corpus
    // DataFrame instance — must return the SAME persisted relation
    // (object identity, so no global cache-count race with concurrently
    // running suites)
    val b1 = Similarity.bandedCorpus(corpus, bandKeys)
    val b2 = Similarity.bandedCorpus(corpus, bandKeys)
    val b3 = Similarity.bandedCorpus(mkCorpus(40, 1), bandKeys)
    assert(b1 eq b2, "same corpus instance must hit the cache")
    assert(b1 eq b3, "semantically-equal corpus plan must hit the cache")
    // and the serving path over the memoized relation still answers
    spark.conf.set("spark.graft.embeddingBlockMaxVecs", "0") // force LSH
    try {
      val r2 = Similarity.topKForQueryStream(queries, corpus, k = 3)
      r2.count()
      val r3 = Similarity.topKForQueryStream(queries, corpus, k = 3)
      assert(r3.exceptAll(r2).isEmpty && r2.exceptAll(r3).isEmpty)
    } finally spark.conf.unset("spark.graft.embeddingBlockMaxVecs")
  }
}

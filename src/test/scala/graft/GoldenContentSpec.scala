package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Golden CONTENT pins for driver queries whose oracles arrived late or
 * whose failure mode is subtle. Every query here now ALSO carries a
 * full DuckDB oracle (the generator family via GenOracleSql, which
 * re-derives the MRG + descent + scramble in SQL) — these digests stay
 * as an in-build second witness: a wrong-but-right-cardinality
 * regression in the MRG stream, the Kronecker descent, or the scramble
 * fails the build locally without a driver round-trip. The reference
 * pins the same surface with golden numbers (mpi/utils.hpp:3663-3708);
 * values here were computed once from the MRG implementation whose
 * bit-exactness is itself pinned by MrgSpec and the pf_nedge goldens
 * (Graph500GoldenSpec).
 */
class GoldenContentSpec extends SparkSpec {

  /** Order-independent content digest: (row count, sum of per-row
    * xxhash64 mod p). Integral columns only — no float instability. */
  private def digest(df: DataFrame): (Long, Long) = {
    val cols = df.columns.map(col)
    val r = df.select(count(lit(1)),
      sum(pmod(xxhash64(cols: _*), lit(1000000007L)))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def query(name: String, dir: String = "/root/testdata/sf0.001") =
    SparkEntry.queries(name)(spark, dir)

  test("q1_generate content digest (scale 10)") {
    assert(digest(query("q1_generate")) === (16384L, 8137369954916L))
  }

  test("s4_tree_edges content digest (scale 10)") {
    assert(digest(query("s4_tree_edges")) === (1023L, 505141096336L))
  }

  test("s4_ham_edges content digest (scale 10)") {
    assert(digest(query("s4_ham_edges")) === (1024L, 521509468287L))
  }

  test("s5_uniform content digest (scale 10)") {
    assert(digest(query("s5_uniform")) === (16384L, 8212394726712L))
  }

  test("s7_weighted content digest (scale 10)") {
    assert(digest(query("s7_weighted")) === (16384L, 8241580007641L))
  }

  test("sim_ivf_kmeans content digest (sf0.001)") {
    // full oracle since round 6 (trained centroids replay as VALUES CTEs
    // in the driver SQL); kernel ≡ distributed is pinned in
    // LocalSimilaritySpec, and this digest pins the content itself —
    // centroid-training drift (sample, init, iteration count) fails here.
    assert(digest(query("sim_ivf_kmeans")) === (50L, 24916634366L))
  }

  test("sim_pq_kmeans content digest (sf0.001)") {
    // full oracle since round 6 (trained codebooks replay as VALUES CTEs
    // in the driver SQL); codebook drift (sample, init, iterations) or
    // ADC scoring drift fails here.
    assert(digest(query("sim_pq_kmeans")) === (50L, 25361379442L))
  }

  test("ev_hll content digest + accuracy vs exact (sf0.001)") {
    // full oracle since round 6 (XXH64 replays in HUGEINT arithmetic in
    // the driver SQL); the digest pins register/hash/estimator drift,
    // and each estimate must sit within 5% of the exact per-type
    // distinct (p=12 ⇒ σ ≈ 1.6%)
    assert(digest(query("ev_hll")) === (5L, 2541620046L))
    val est = query("ev_hll").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ex = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ex.foreach { case (t, n) =>
      assert(math.abs(est(t) - n) <= math.max(2L, (n * 0.05).toLong),
        s"type $t est ${est(t)} exact $n")
    }
  }

  test("st_hll streaming final state ≡ batch ev_hll (sf0.001)") {
    // the sketch's element-max merge is batching-invariant, so the
    // update-mode replay must land the EXACT batch rows
    val batch = query("ev_hll").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val stream = query("st_hll").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(stream === batch)
  }

  test("tx_bpe content digest (sf0.001)") {
    // full oracle since round 6 (the merge rounds replay as unrolled
    // CTEs in the driver SQL); kernel ≡ distributed is pinned in
    // BpeSpec, and this digest pins the learned merge table itself —
    // selection-order or tie-break drift fails here.
    assert(digest(query("tx_bpe")) === (10L, 4569893822L))
  }

  test("q6_roots exact roots (sf0.001)") {
    val got = query("q6_roots").orderBy("idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val roots = Seq(628L, 369L, 2830L, 1158L, 27L, 1364L, 2276L, 1008L,
      62L, 692L, 2636L, 1290L, 2362L, 2086L, 341L, 2032L)
    assert(got === roots.zipWithIndex.map { case (r, i) => (i.toLong, r) })
  }
}

package graft.gen

import graft.SparkSpec

class KroneckerSpec extends SparkSpec {

  test("scramble is a permutation of [0, 2^scale)") {
    val scale = 10
    val (v0, v1) = Kronecker.scrambleVals(2, 3)
    val imgs = (0L until (1L << scale)).map(Kronecker.scramble(_, scale, v0, v1))
    assert(imgs.forall(v => v >= 0 && v < (1L << scale)))
    assert(imgs.toSet.size === (1 << scale))
  }

  test("generate: edge count, endpoint range, determinism") {
    val df = Kronecker.generate(spark, 10).cache()
    assert(df.count() === 16L * 1024)
    import org.apache.spark.sql.functions._
    val bad = df.filter(col("src") < 0 || col("src") >= 1024 ||
      col("dst") < 0 || col("dst") >= 1024).count()
    assert(bad === 0)
    // Same (scale, seeds) → identical multiset of edges.
    val h1 = df.selectExpr("sum(hash(src, dst))").head().getLong(0)
    val h2 = Kronecker.generate(spark, 10).selectExpr("sum(hash(src, dst))")
      .head().getLong(0)
    assert(h1 === h2)
    df.unpersist()
  }

  test("edge generation is index-addressable (partitioning-independent)") {
    val (v0, v1) = Kronecker.scrambleVals(2, 3)
    val e5a = Kronecker.makeEdge(10, 5L, 2, 3, v0, v1)
    val e5b = Kronecker.makeEdge(10, 5L, 2, 3, v0, v1)
    assert(e5a === e5b)
    val edges = Kronecker.generate(spark, 10).collect()
    // Row i of the range-partitioned scan is edge i.
    assert((edges(5).getLong(0), edges(5).getLong(1)) === e5a)
  }

  test("root sampling: deterministic, rejects non-edge vertices, no dups") {
    val has: Long => Boolean = v => v % 3 != 0
    val r1 = Kronecker.sampleRoots(16, 1024, has)
    val r2 = Kronecker.sampleRoots(16, 1024, has)
    assert(r1.sameElements(r2))
    assert(r1.length === 16)
    assert(r1.forall(has))
    assert(r1.toSet.size === 16)
  }

  test("distributed root sampling ≡ exact-set sampling, no vertex collect") {
    import spark.implicits._
    // sparse vertex universe (non-multiples of 3 under 4096, with dups as
    // a symmetrized src column would have)
    val verts = (0L until 4096L).filter(_ % 3 != 0)
    val vertDf = (verts ++ verts.reverse).toDF("v")
    val exactSet = verts.toSet
    val exact = Kronecker.sampleRoots(16, 4096, exactSet)
    val dist = Kronecker.sampleRootsDistributed(vertDf, "v", 16, 4096)
    assert(dist.sameElements(exact))
    // degenerate: universe smaller than requested roots → counter cap
    val tiny = Seq(1L, 2L, 4L).toDF("v")
    val dTiny = Kronecker.sampleRootsDistributed(tiny, "v", 16, 8)
    val eTiny = Kronecker.sampleRoots(16, 8, Set(1L, 2L, 4L))
    assert(dTiny.sameElements(eTiny))
  }
}

package graft.gen

import graft.SparkSpec
import graft.bench.Graph500

/** Specs for the auxiliary generators (S4/S5/S7), the packed pred view
  * (P5), and benchmark checkpointing (S8). */
class GeneratorsSpec extends SparkSpec {

  test("binary tree edges: n-1 edges, deterministic, in-range") {
    val d = Kronecker.binaryTreeEdges(spark, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(d.length === 255)
    assert(d.forall { case (s, t) => s >= 0 && s < 256 && t >= 0 && t < 256 })
    val d2 = Kronecker.binaryTreeEdges(spark, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(d.toSeq === d2.toSeq)
  }

  test("hamiltonian cycle: n edges forming a closed 2-regular graph") {
    val d = Kronecker.hamiltonianCycleEdges(spark, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(d.length === 64)
    // the n-1 path edges have distinct scrambled sources (scramble is a
    // permutation of [0, n)); the closing edge uses the reference's
    // out-of-range scramble(n), which may collide
    assert(d.take(63).map(_._1).distinct.length === 63)
  }

  test("uniform generator: deterministic, endpoints in range") {
    val d = Kronecker.generateUniform(spark, 6, edgeFactor = 4).collect()
    assert(d.length === 256)
    assert(d.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64 &&
      r.getLong(1) >= 0 && r.getLong(1) < 64))
  }

  test("weighted generation: weights in [1, maxWeight], edges match unweighted") {
    val w = Kronecker.generateWeighted(spark, 6, maxWeight = 7).collect()
      .sortBy(_.getLong(0))
    assert(w.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 7))
    val plain = Kronecker.generate(spark, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(w.map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
      === plain.toSeq)
  }

  test("packedPred packs depth<<48|parent, -1 for unreached") {
    val s = spark; import s.implicits._
    val tree = Seq((0L, 0L, Some(0L)), (1L, 0L, Some(1L)), (9L, -1L, None))
      .toDF("vertex", "pred", "depth")
    val p = graft.bfs.Bfs.packedPred(tree).orderBy("vertex").collect()
      .map(_.getLong(1))
    assert(p.toSeq === Seq(0L, (1L << 48) | 0L, -1L))
  }

  test("checkpoint roundtrip and resume") {
    val path = java.nio.file.Files.createTempFile("g500ck", ".txt").toString
    val runs = Seq(
      Graph500.RunStat(0, 5, 1.5, 0.5, 100.0, 0),
      Graph500.RunStat(1, 7, 2.5, 0.25, 100.0, 0))
    Graph500.writeCheckpoint(path, runs, scale = 8,
      edgeFactor = Kronecker.DefaultEdgeFactor, nRoots = 4)
    assert(Graph500.readCheckpoint(path, 8,
      Kronecker.DefaultEdgeFactor, 4) === runs)
    assert(Graph500.readCheckpointAny(path) === runs)
    assert(Graph500.readCheckpoint("/nonexistent/ck", 8,
      Kronecker.DefaultEdgeFactor, 4) === Seq.empty)
    // parameter mismatch must fail loudly, never merge stale runs
    // (reference read_log_file aborts, mpi/benchmark_helper.hpp:530-544)
    for ((sc, ef, nr) <- Seq((9, 16L, 4), (8, 8L, 4), (8, 16L, 2)))
      intercept[IllegalStateException](
        Graph500.readCheckpoint(path, sc, ef, nr))
    // headerless pre-format file: provenance unknown, fail loudly too
    val legacy = java.nio.file.Files.createTempFile("g500legacy", ".txt")
    java.nio.file.Files.write(legacy, "0,5,1.5,0.5,100.0,0\n".getBytes)
    intercept[IllegalStateException](
      Graph500.readCheckpoint(legacy.toString, 8,
        Kronecker.DefaultEdgeFactor, 4))
    java.nio.file.Files.deleteIfExists(legacy)
    // resume: a scale-8 benchmark with 2 of 4 runs checkpointed reuses them
    val s = Graph500.run(spark, 8, nRoots = 4, validate = true,
      checkpointPath = Some(path))
    assert(s.runs.take(2) === runs)
    assert(s.runs.length === 4)
    assert(s.runs.drop(2).forall(_.errors === 0))
    // logreader-equivalent pretty-printer (reference mpi/logreader.cc)
    val text = graft.bench.LogReader.format(s.runs)
    assert(text.contains("harmonic_mean_TEPS"))
    assert(s.runs.forall(r => text.contains(r.root.toString)))
  }
}

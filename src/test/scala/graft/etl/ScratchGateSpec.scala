package graft.etl

import graft.SparkSpec

/** Pre-flight scratch gate: the pure verdict at every boundary, the
  * conf off-switch, and that normal small-scale construction never
  * trips it. */
class ScratchGateSpec extends SparkSpec {

  test("verdict: small needs, unknown counts, and probe failures pass") {
    assert(ScratchGate.verdict(0L, 100L).isEmpty)
    assert(ScratchGate.verdict(-1L, 100L).isEmpty)
    // 1M edges x 234 B = 234 MB < the 4 GB floor: skipped even with 0 free
    assert(ScratchGate.verdict(1000000L, 0L).isEmpty)
    // freeBytes < 0 = could not stat: proceed, never block on the probe
    assert(ScratchGate.verdict(1L << 33, -1L).isEmpty)
  }

  test("verdict: fails exactly when need exceeds free, message carries both") {
    val nRaw = 1L << 30 // SCALE-26-ish: 1.07B edges -> ~258 GB need
    val need = ScratchGate.required(nRaw)
    assert(ScratchGate.verdict(nRaw, need).isEmpty)      // exactly enough
    val msg = ScratchGate.verdict(nRaw, need - 1)        // one byte short
    assert(msg.nonEmpty)
    assert(msg.get.contains("spark.graft.scratchCheck=0"))
    assert(msg.get.contains(nRaw.toString))
  }

  test("the r8 SCALE-26 configuration passes (the gate must not reject a run that fit)") {
    // 2^30 raw edges peaked at 249.5 GB on a volume with ~256 GB free
    // to root — the derived need (251.2 GB) must stay inside that
    assert(ScratchGate.verdict(1L << 30, 256L << 30).isEmpty)
  }

  test("check: conf off-switch bypasses a guaranteed failure") {
    // a need no disk satisfies (2^61 B); must throw, then pass with conf=0
    val huge = 1L << 53
    intercept[IllegalStateException](ScratchGate.check(spark, huge))
    spark.conf.set("spark.graft.scratchCheck", "0")
    try ScratchGate.check(spark, huge)
    finally spark.conf.unset("spark.graft.scratchCheck")
  }

  test("scratch dirs resolve and stat on this box") {
    assert(ScratchGate.scratchDirs(spark).nonEmpty)
    assert(ScratchGate.freeScratchBytes(spark) > 0)
  }

  test("small-scale protocol construction never trips the gate") {
    // SCALE 10 through the real path (prepareRaw -> check with the known
    // count): need is far under the floor
    val s = graft.bench.Graph500.run(spark, 10, nRoots = 1, validate = false)
    assert(s.nedgeGoldenOk)
  }
}

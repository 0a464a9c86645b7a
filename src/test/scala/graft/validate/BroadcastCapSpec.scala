package graft.validate

import graft.SparkSpec

/** The validation broadcast cap is auto-sized from the JVM heap (floored
  * at 20M vertices) so SCALE 25+ runs need no hand-set conf; the conf
  * remains an override. */
class BroadcastCapSpec extends SparkSpec {

  test("auto-sized cap: at least the floor, scales with heap") {
    val cap = Validator.broadcastVerts(spark)
    assert(cap >= Validator.BroadcastVertsFloor)
    val expected = math.max(Validator.BroadcastVertsFloor,
      Runtime.getRuntime.maxMemory / 16 / Validator.BroadcastBytesPerVertex)
    assert(cap === expected)
  }

  test("conf override wins over the derived default") {
    spark.conf.set("spark.graft.validateBroadcastVerts", "12345")
    try assert(Validator.broadcastVerts(spark) === 12345L)
    finally spark.conf.unset("spark.graft.validateBroadcastVerts")
  }
}

package graft.stats

import graft.SparkSpec

class TepsSpec extends SparkSpec {

  test("stat block matches hand-computed values incl. harmonic-mean TEPS") {
    val implicits = spark.implicits
    import implicits._
    // times 1,2,3,4 ; nedge constant 100
    val rs = Seq(
      (1L, 1.0, 0.0, 100.0), (2L, 2.0, 0.0, 100.0),
      (3L, 3.0, 0.0, 100.0), (4L, 4.0, 0.0, 100.0)
    ).toDF("run", "bfs_time", "validate_time", "nedge")
    val r = Teps.statBlock(rs).head()
    assert(r.getAs[Double]("time_min") === 1.0)
    assert(r.getAs[Double]("time_q1") === 1.75)
    assert(r.getAs[Double]("time_median") === 2.5)
    assert(r.getAs[Double]("time_q3") === 3.25)
    assert(r.getAs[Double]("time_max") === 4.0)
    assert(r.getAs[Double]("time_mean") === 2.5)
    assert(r.getAs[Double]("time_stddev") === 1.290994) // sqrt(5/3) @ 6dp
    // harmonic mean TEPS = 1 / mean(t_i / 100) = 100 / 2.5 = 40
    assert(r.getAs[Double]("harmonic_mean_teps") === 40.0)
    assert(r.getAs[Double]("nedge_mean") === 100.0)
  }
}

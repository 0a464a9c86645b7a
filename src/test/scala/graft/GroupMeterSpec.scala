package graft

import org.apache.spark.sql.functions._

/** Per-query work attribution (Bench.GroupMeter): tasks run under a job
  * group land on that group's accumulator; ungrouped work lands nowhere;
  * the metrics carry real task/CPU time. This is the channel BENCH_FULL's
  * queries_work map rides — a mis-attribution here silently corrupts
  * every round-over-round per-query comparison. */
class GroupMeterSpec extends SparkSpec {

  test("attributes tasks to the active job group and only to it") {
    val meter = new Bench.GroupMeter(spark.sparkContext)
    def grouped[A](tag: String)(body: => A): A = {
      spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
      try body finally spark.sparkContext.clearJobGroup()
    }
    // two grouped workloads of very different size + one ungrouped
    grouped("g:small") {
      spark.range(1000).agg(sum(col("id"))).collect()
    }
    grouped("g:big") {
      spark.range(4000000).select((col("id") % 97).as("k"))
        .groupBy("k").agg(count(lit(1))).collect()
    }
    spark.range(1000).count() // ungrouped — must not land on any group

    val w = meter.read()
    assert(w.keySet == Set("g:small", "g:big"),
      s"unexpected groups: ${w.keySet}")
    assert(w("g:small").tasks > 0 && w("g:big").tasks > 0)
    // deterministic size signal (task counts coalesce under AQE): the
    // 97-group shuffle writes strictly more shuffle bytes than the
    // single-row global sum
    assert(w("g:big").shufWrite > w("g:small").shufWrite)
  }

  test("two meters on one context account independently but identically") {
    val m1 = new Bench.GroupMeter(spark.sparkContext)
    val m2 = new Bench.GroupMeter(spark.sparkContext)
    spark.sparkContext.setJobGroup("dup", "dup", interruptOnCancel = false)
    try spark.range(100000).select((col("id") % 7).as("k"))
      .groupBy("k").agg(count(lit(1))).collect()
    finally spark.sparkContext.clearJobGroup()
    val (a, b) = (m1.read()("dup"), m2.read()("dup"))
    assert(a.tasks == b.tasks && a.taskMs == b.taskMs)
  }
}

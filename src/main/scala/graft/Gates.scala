package graft

/** The hybrid executor's size gates, in one place so Bench/Verify/Explain
  * force-distributed runs zero EVERY gate (a gate missing from one list
  * silently leaves its driver-local kernel active in a "whole-suite
  * distributed" run — the recorded numbers then never exercise that
  * distributed path). Each `spark.graft.<name>` conf: 0 = always take the
  * distributed plan. */
object Gates {
  val all: Seq[String] = Seq(
    "localBfsMaxEdges",
    "localSsspMaxEdges",
    "localDedupMaxDocs",
    "localAnnMaxVecs",
    "localEventsMaxRows",
    "localMixMaxRows",
    "localBpeMaxTypes")

  /** Zero every hybrid gate on `spark` — the force-distributed switch. */
  def forceDistributed(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach(g => spark.conf.set(s"spark.graft.$g", "0"))
}

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
    "localBpeMaxTypes",
    // Not a driver-kernel gate but the embedding family's strategy
    // switch (exact broadcast block vs hyperplane-LSH): 0 forces the
    // LSH plans — the corpus-scale path — and SparkEntry.oracleSql
    // swaps in the LSH-replay oracles (LshOracleSql) for the four
    // affected queries, keyed on this same conf.
    "embeddingBlockMaxVecs")

  /** Zero every hybrid gate on `spark` — the force-distributed switch. */
  def forceDistributed(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach(g => spark.conf.set(s"spark.graft.$g", "0"))
}

package graft.bfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Connected components by min-label propagation with pointer jumping:
 * every vertex starts labeled with its own id; each round a vertex takes
 * the min of (its label, its neighbors' labels, its label's label).
 * Fixpoint = component id = min vertex id in the component.
 *
 * The neighbor step alone needs O(component diameter) rounds — a long
 * path graph of length d takes d rounds, each a full pass over the edge
 * table. The pointer-jumping step (label ← label[label], the classic
 * Shiloach–Vishkin shortcut) halves label-chain lengths every round, so
 * convergence drops to O(log d) rounds: labels race to the component
 * minimum exponentially. At 100 TB the edge table dominates each round,
 * so cutting round COUNT (not per-round cost) is the scale lever — the
 * jump join touches only the |V|-sized label table.
 *
 * Execution profile per round: edges (partitioned once by src, cached)
 * ⋈ labels → groupBy-min proposals; then two |V|-table joins for the
 * jump. Labels are localCheckpoint()ed per round to cut lineage.
 * (GraphX's `connectedComponents` is the Pregel-shaped alternative,
 * cross-checked in ConnectedComponentsSpec; this is the Catalyst-native
 * path.)
 */
object ConnectedComponents {

  /** (vertex, component) for every vertex in `clean` (symmetric edges). */
  def components(spark: SparkSession, clean: DataFrame): DataFrame = {
    val edges = clean.repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = edges.select(col("src").as("vertex"))
      .distinct()
      .withColumn("component", col("vertex"))
      .localCheckpoint(eager = true)
    var changedCount = 1L

    while (changedCount > 0) {
      // 1. neighbor-min: smallest label seen across each vertex's edges.
      // Labels always hold vertex ids from the same component, so taking
      // mins never crosses components.
      val proposals = edges
        .join(labels, edges("src") === labels("vertex"))
        .select(edges("dst").as("vertex"), col("component"))
        .groupBy("vertex").agg(min("component").as("nmin"))
      val stepped = labels
        .join(proposals, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("mid"),
          col("component").as("old"))
      // 2. pointer jump: follow the label one hop (mid's own current
      // label) — label chains halve, rounds become O(log d).
      val byId = labels.select(col("vertex").as("cv"), col("component").as("cc"))
      val updated = stepped
        .join(byId, col("mid") === col("cv"), "left_outer")
        .select(col("vertex"),
          least(col("mid"), coalesce(col("cc"), col("mid"))).as("component"),
          col("old"))
        .localCheckpoint(eager = true)
      changedCount = updated.filter(col("component") =!= col("old")).count()
      labels = updated.select("vertex", "component")
    }
    edges.unpersist(blocking = false)
    labels
  }
}

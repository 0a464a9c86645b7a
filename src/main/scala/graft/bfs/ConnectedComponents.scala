package graft.bfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Connected components by iterative min-label propagation: every vertex
 * starts labeled with its own id; each round every vertex takes the min
 * of its label and its neighbors' labels; fixpoint = component id =
 * min vertex id in the component.
 *
 * Same execution profile as the BFS/SSSP loops: edge table partitioned
 * once by src, per-round join against the (shrinking) set of vertices
 * whose label changed, labels updated via groupBy-min. Rounds =
 * O(component diameter). (GraphX's `connectedComponents` is the
 * Pregel-shaped alternative; this is the Catalyst-native path.)
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
    // changed = vertices whose label improved last round (initially all)
    var changed = labels
    var changedCount = changed.count()

    while (changedCount > 0) {
      // neighbors of changed vertices see the new (smaller) labels
      val proposals = edges
        .join(changed, edges("src") === changed("vertex"))
        .select(edges("dst").as("vertex"), col("component"))
        .groupBy("vertex").agg(min("component").as("proposal"))
      val updated = labels
        .join(proposals, Seq("vertex"), "left_outer")
        .select(col("vertex"),
          least(col("component"),
            coalesce(col("proposal"), col("component"))).as("component"),
          (col("proposal") < col("component")).as("improved"))
        .localCheckpoint(eager = true)
      changed = updated.filter(col("improved"))
        .select("vertex", "component")
      changedCount = changed.count()
      labels = updated.select("vertex", "component")
    }
    edges.unpersist(blocking = false)
    labels
  }
}

package graft.bfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Single-source shortest paths over weighted symmetric edges
 * (src, dst, w) — the query the reference's SSSP machinery was built
 * for but never finished (empty `prepare_sssp/run_sssp/end_sssp`,
 * mpi/bfs.hpp:2569-2571, weighted generator graph_generator.hpp:479-506).
 *
 * Frontier-based relaxation (Bellman-Ford with a delta frontier): each
 * iteration relaxes only edges out of vertices whose distance improved
 * in the previous iteration — the weighted generalization of the BFS
 * level loop, with the same shuffle profile: the big edge table is
 * partitioned once (by src) and joined per iteration against a small
 * frontier; the distance table updates via groupBy-min. Iteration count
 * = hop length of the longest optimal path, not |V|.
 *
 * Distances are exact shortest paths; the pred tree is deterministic
 * (per-round candidates merge by min (dist, pred) struct; rounds are
 * deterministic; first-settled wins on later ties). Unreached vertices
 * are absent from the result (join with the vertex table for dense
 * output).
 */
object Sssp {

  /** Symmetrized min-weight edge set from a directed weighted list. */
  def weightedEdges(raw: DataFrame): DataFrame = {
    val noLoops = raw.filter(col("src") =!= col("dst"))
    noLoops
      .union(noLoops.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .groupBy("src", "dst").agg(min("w").as("w"))
  }

  /** (vertex, dist, pred) for every vertex reachable from `root`. */
  def sssp(spark: SparkSession, wedges: DataFrame, root: Long): DataFrame = {
    import spark.implicits._
    val edges = wedges.repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count()

    var dist = Seq((root, 0L, root)).toDF("vertex", "dist", "pred")
      .localCheckpoint(eager = true)
    var frontier = dist
    var improvedCount = 1L

    while (improvedCount > 0) {
      val cand = edges
        .join(frontier, edges("src") === frontier("vertex"))
        .select(edges("dst").as("vertex"),
          (col("dist") + col("w")).as("dist"),
          edges("src").as("pred"))
      // best candidate per vertex this round, then keep only improvements
      val best = cand.groupBy("vertex")
        .agg(min(struct(col("dist"), col("pred"))).as("s"))
        .select(col("vertex"), col("s.dist").as("dist"),
          col("s.pred").as("pred"))
      val improved = best
        .join(dist.select(col("vertex"), col("dist").as("old")),
          Seq("vertex"), "left_outer")
        .filter(col("old").isNull || col("dist") < col("old"))
        .select("vertex", "dist", "pred")
        .localCheckpoint(eager = true)
      improvedCount = improved.count()
      if (improvedCount > 0) {
        dist = dist.join(improved.select(col("vertex").as("iv")),
            col("vertex") === col("iv"), "left_anti")
          .union(improved)
          .localCheckpoint(eager = true)
        frontier = improved
      }
    }
    edges.unpersist(blocking = false)
    dist
  }

  /** Deterministic weighted subgraph from lineitem (first `limit` lines
    * by (orderkey, linenumber)); w = min l_quantity per undirected edge. */
  def weightedEdgesFromLineitem(spark: SparkSession, sfDir: String,
                                limit: Int = 2000): DataFrame = {
    val sub = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .orderBy("l_orderkey", "l_linenumber").limit(limit)
    weightedEdges(sub.select(
      (col("l_orderkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst"),
      col("l_quantity").cast("long").as("w")))
  }
}

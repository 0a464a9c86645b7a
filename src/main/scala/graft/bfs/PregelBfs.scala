package graft.bfs

import org.apache.spark.graphx.{Edge, EdgeTriplet, Graph, PartitionStrategy, Pregel, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * GraphX/Pregel BFS — the vertex-centric cross-check implementation of
 * Q7 (SURVEY §3.2 option (a)). Same min-parent contract as
 * [[Bfs.bfsMinParent]]: state (pred, depth) per vertex, messages are
 * (candidateParent, depth) pairs merged by min parent.
 *
 * The graph is partitioned with `EdgePartition2D` — literally the
 * reference's 2D process-grid edge partitioning (√P × √P owner grid,
 * mpi/graph_constructor.hpp:18-22) expressed as a GraphX
 * PartitionStrategy.
 *
 * The DataFrame loop ([[Bfs]]) remains the primary engine path: it gets
 * Catalyst/AQE/broadcast optimization per level, while Pregel runs a
 * fixed join-RDD schedule. This implementation exists as an independent
 * semantic oracle and for users who want a `Graph`-shaped API.
 */
object PregelBfs {

  /** BFS over cleaned symmetric edges; returns (vertex, pred, depth) with
    * the same schema/conventions as Bfs.bfsMinParent (unreached:
    * pred = -1, depth NULL). */
  def bfs(spark: SparkSession, clean: DataFrame, root: Long): DataFrame = {
    import spark.implicits._
    val edgeRdd = clean.select("src", "dst").as[(Long, Long)].rdd
      .map { case (s, d) => Edge(s, d, ()) }
    val graph = Graph.fromEdges(edgeRdd, defaultValue = (),
        edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
        vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
      .partitionBy(PartitionStrategy.EdgePartition2D)

    // state: (pred, depth); unreached = (-1, Int.MaxValue)
    val init = graph.mapVertices { (id, _) =>
      if (id == root) (root, 0) else (-1L, Int.MaxValue)
    }

    val result = Pregel(
      init,
      initialMsg = (-1L, Int.MaxValue),
      activeDirection = org.apache.spark.graphx.EdgeDirection.Out)(
      vprog = (id: VertexId, state: (Long, Int), msg: (Long, Int)) =>
        if (msg._2 < state._2) msg else state,
      sendMsg = (t: EdgeTriplet[(Long, Int), Unit]) =>
        if (t.srcAttr._2 != Int.MaxValue &&
            t.dstAttr._2 > t.srcAttr._2 + 1)
          Iterator((t.dstId, (t.srcId, t.srcAttr._2 + 1)))
        else Iterator.empty,
      mergeMsg = (a: (Long, Int), b: (Long, Int)) =>
        if (a._2 < b._2 || (a._2 == b._2 && a._1 < b._1)) a else b)

    result.vertices
      .map { case (id, (pred, depth)) =>
        (id, pred, if (depth == Int.MaxValue) None else Some(depth.toLong))
      }
      .toDF("vertex", "pred", "depth")
  }
}

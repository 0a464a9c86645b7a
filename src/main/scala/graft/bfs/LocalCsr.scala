package graft.bfs

import org.apache.spark.sql.DataFrame

/**
 * In-memory CSR + direction-optimizing BFS kernel — the small-graph fast
 * path of the hybrid BFS executor (see [[Bfs]] for the gate).
 *
 * This is the same physical design as the reference's compressed graph +
 * level loop (Graph2DCSR, mpi/graph_constructor.hpp:24-143; top-down /
 * bottom-up kernels, mpi/bfs.hpp:962-1137, 1839-1967) reduced to one
 * node: a sorted-id CSR with sorted adjacency rows, a Beamer direction
 * switch, and a predecessor/depth array per run. Rationale: a BFS level
 * on a graph this small is microseconds of work, while ANY distributed
 * level costs a fixed multi-job scheduling overhead; the reference's
 * single-node numbers are only matchable by doing what the reference
 * does when the data fits — run the kernel where the data is. The
 * distributed DataFrame loop ([[Bfs.bfsMinParentDistributed]]) is the
 * general path and takes over past [[Bfs]]'s size gate.
 *
 * Determinism contract (shared with the distributed loop): ids sorted,
 * adjacency rows sorted, top-down processes the frontier in ascending id
 * order (first writer = min parent), bottom-up scans each row ascending
 * and stops at the first frontier neighbor (= min parent). Both
 * directions therefore produce the same canonical min-parent tree.
 */
final class LocalCsr(val ids: Array[Long], val rowStarts: Array[Int],
                     val nbrs: Array[Int]) {

  def nVerts: Int = ids.length

  /** Min-parent BFS from `root` (original vertex id). Returns dense
    * (pred, depth) arrays (−1 = unset/unreached) + per-level sizes. */
  def bfs(root: Long): (Array[Int], Array[Int], Seq[(Int, Long)]) = {
    val v0 = java.util.Arrays.binarySearch(ids, root)
    require(v0 >= 0, s"root $root has no edges in this graph")
    val nV = ids.length
    val pred = Array.fill(nV)(-1)
    val depth = Array.fill(nV)(-1)
    pred(v0) = v0
    depth(v0) = 0
    var frontier = Array(v0)
    var level = 0
    var visited = 1L
    val sizes = scala.collection.mutable.ArrayBuffer((0, 1L))

    while (frontier.nonEmpty) {
      level += 1
      val next = new scala.collection.mutable.ArrayBuilder.ofInt
      val bottomUp = frontier.length.toLong * Bfs.Beta > (nV - visited)
      if (bottomUp) {
        // scan unvisited rows; first (= min) neighbor on the previous
        // level adopts the vertex (reference bottom-up, bfs.hpp:1839-1967)
        var v = 0
        while (v < nV) {
          if (depth(v) < 0) {
            var k = rowStarts(v)
            val end = rowStarts(v + 1)
            var hit = false
            while (k < end && !hit) {
              val u = nbrs(k)
              if (depth(u) == level - 1) {
                pred(v) = u; depth(v) = level; next += v; hit = true
              }
              k += 1
            }
          }
          v += 1
        }
      } else {
        // expand the (ascending) frontier; first writer wins = min parent
        // (reference top-down, bfs.hpp:962-1137)
        var fi = 0
        while (fi < frontier.length) {
          val u = frontier(fi)
          var k = rowStarts(u)
          val end = rowStarts(u + 1)
          while (k < end) {
            val v = nbrs(k)
            if (depth(v) < 0) { pred(v) = u; depth(v) = level; next += v }
            k += 1
          }
          fi += 1
        }
      }
      frontier = next.result()
      java.util.Arrays.sort(frontier)
      if (frontier.nonEmpty) {
        sizes += ((level, frontier.length.toLong))
        visited += frontier.length
      }
    }
    (pred, depth, sizes.toSeq)
  }
}

object LocalCsr {

  /** Build from a cleaned (symmetric, deduped, loop-free) edge DataFrame.
    * One collect of the edge pairs; dense ids assigned by sorted original
    * id; adjacency rows end up sorted because the packed (src,dst) array
    * is sorted before the CSR fill — the reference's per-row sort +
    * compaction (graph_constructor.hpp:1363-1412) in one pass. */
  def build(clean: DataFrame): LocalCsr = {
    // Collect edges as ONE primitive long array per partition
    // ([src,dst,src,dst,...]) — primitive arrays serialize compactly, no
    // driver-side deserialization of millions of boxed tuples.
    val chunks: Array[Array[Long]] = clean.select(col("src"), col("dst"))
      .rdd.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator.single(b.result())
      }.collect()
    val nE = chunks.iterator.map(_.length).sum / 2
    val flat = new Array[Long](nE * 2)
    var off = 0
    chunks.foreach { c => System.arraycopy(c, 0, flat, off, c.length); off += c.length }

    // distinct sorted vertex ids via primitive sort + in-place dedup
    // (symmetric graph ⇒ srcs cover every vertex)
    val srcs = new Array[Long](nE)
    var i = 0
    while (i < nE) { srcs(i) = flat(2 * i); i += 1 }
    java.util.Arrays.sort(srcs)
    var nV0 = 0
    i = 0
    while (i < nE) {
      if (nV0 == 0 || srcs(nV0 - 1) != srcs(i)) { srcs(nV0) = srcs(i); nV0 += 1 }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(srcs, nV0)

    val enc = new Array[Long](nE)
    i = 0
    while (i < nE) {
      val s = java.util.Arrays.binarySearch(ids, flat(2 * i))
      val d = java.util.Arrays.binarySearch(ids, flat(2 * i + 1))
      enc(i) = (s.toLong << 32) | (d.toLong & 0xffffffffL)
      i += 1
    }
    java.util.Arrays.sort(enc)

    val nV = ids.length
    val rowStarts = new Array[Int](nV + 1)
    val nbrs = new Array[Int](nE)
    i = 0
    while (i < nE) {
      nbrs(i) = (enc(i) & 0xffffffffL).toInt
      rowStarts((enc(i) >>> 32).toInt + 1) += 1
      i += 1
    }
    var v = 0
    while (v < nV) { rowStarts(v + 1) += rowStarts(v); v += 1 }
    new LocalCsr(ids, rowStarts, nbrs)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}

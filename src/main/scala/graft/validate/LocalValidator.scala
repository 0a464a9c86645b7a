package graft.validate

import org.apache.spark.sql.DataFrame

/**
 * In-memory validation kernel — the hybrid fast path of [[Validator]]
 * for benchmark loops whose graphs fit under the local-kernel gate
 * (graft.bfs.Bfs.localBfsMaxEdges).
 *
 * The reference validates each BFS run with five checks over the RAW
 * edge list (mpi/validate.hpp:507-802); at benchmark scales that list
 * lives in memory, and a DataFrame validation pass costs ~1.5 s of
 * fixed job overhead per run. This kernel collects the raw list ONCE
 * (primitive chunks), precomputes each edge's dense endpoints against
 * the graph's sorted vertex ids, and then validates a run's dense
 * (pred, depth) arrays in one tight pass — identical counters to
 * [[Validator.validate]] (LocalValidatorSpec proves equality, including
 * the SQL null-propagation corner cases).
 *
 * Counter semantics replicated exactly from the DataFrame queries:
 *  - root_errors:   error iff (pred ≠ root) OR (depth set AND ≠ 0) —
 *                   a NULL depth makes the OR's right side NULL, which
 *                   `when` treats as no-count.
 *  - depth_chain:   for reached non-root v: error iff parent depth NULL,
 *                   or v's depth set and ≠ parent depth + 1.
 *  - edge checks:   per raw edge WITH multiplicity (self-loops included);
 *                   endpoint depth is NULL if the vertex is isolated
 *                   (absent from the cleaned graph) or unreached.
 */
final class LocalValidator(clean_ids: Array[Long], rawPairs: Array[Long]) {

  /** Collects the raw list itself (primitive chunks). Prefer the primary
    * constructor when the flat pair array already exists (e.g. from the
    * construction stage) — the list then ships from the executors ONCE. */
  def this(clean_ids: Array[Long], rawEdges: DataFrame) =
    this(clean_ids, graft.bfs.LocalCsr.collectPairs(rawEdges))

  // dense endpoint per raw edge; -1 = endpoint not in the cleaned graph
  private val (edgeU, edgeV) = {
    val nE = rawPairs.length / 2
    val u = new Array[Int](nE)
    val v = new Array[Int](nE)
    // dense-map in parallel stripes (two binary searches per edge
    // dominate construction otherwise)
    val nStripes = Runtime.getRuntime.availableProcessors() * 4
    java.util.stream.IntStream.range(0, nStripes).parallel().forEach { st =>
      val from = (nE.toLong * st / nStripes).toInt
      val to = (nE.toLong * (st + 1) / nStripes).toInt
      var i = from
      while (i < to) {
        val s = java.util.Arrays.binarySearch(clean_ids, rawPairs(2 * i))
        val d = java.util.Arrays.binarySearch(clean_ids, rawPairs(2 * i + 1))
        u(i) = if (s < 0) -1 else s
        v(i) = if (d < 0) -1 else d
        i += 1
      }
    }
    (u, v)
  }

  /** Sorted packed (loDense,hiDense) distinct undirected raw edges
    * (loops dropped) — membership oracle for the pred-edge check. */
  private val undirectedPacked: Array[Long] = {
    val b = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < edgeU.length) {
      val a = edgeU(i); val c = edgeV(i)
      if (a >= 0 && c >= 0 && a != c) {
        val lo = math.min(a, c).toLong
        val hi = math.max(a, c).toLong
        b += (lo << 32) | hi
      }
      i += 1
    }
    val arr = b.result()
    java.util.Arrays.sort(arr)
    // in-place dedup
    var n = 0
    var j = 0
    while (j < arr.length) {
      if (n == 0 || arr(n - 1) != arr(j)) { arr(n) = arr(j); n += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(arr, n)
  }

  def nRawEdges: Int = edgeU.length

  /** Error counters + traversed-edge count for one run's dense kernel
    * output — same order as [[Validator.validate]]'s output row:
    * (range, root, self_parent, depth_presence, depth_chain,
    *  pred_edge_missing, edge_depth, edge_visit_count). */
  def validate(pred: Array[Int], depth: Array[Int], rootDense: Int,
               nGlobalVerts: Long): Array[Long] = {
    val nV = clean_ids.length
    var range = 0L; var rootE = 0L; var selfPar = 0L; var presence = 0L
    var chain = 0L; var missing = 0L
    var v = 0
    while (v < nV) {
      val p = pred(v)
      val pOrig = if (p < 0) -1L else clean_ids(p)
      if (pOrig < -1 || pOrig >= nGlobalVerts) range += 1
      if (v == rootDense &&
        (p != rootDense || (depth(v) != -1 && depth(v) != 0))) rootE += 1
      if (v != rootDense && p == v) selfPar += 1
      if ((p < 0) != (depth(v) == -1)) presence += 1
      if (p >= 0 && v != rootDense) {
        val pd = depth(p)
        if (pd == -1 || (depth(v) != -1 && depth(v) != pd + 1)) chain += 1
        val lo = math.min(v, p).toLong
        val hi = math.max(v, p).toLong
        if (java.util.Arrays.binarySearch(undirectedPacked,
          (lo << 32) | hi) < 0) missing += 1
      }
      v += 1
    }
    var edgeDepth = 0L; var visits = 0L
    var i = 0
    while (i < edgeU.length) {
      val a = edgeU(i); val c = edgeV(i)
      val da = if (a < 0) -1 else depth(a)
      val dc = if (c < 0) -1 else depth(c)
      if (da != -1 && dc != -1) {
        if (math.abs(da - dc) > 1) edgeDepth += 1 else visits += 1
      } else if ((da == -1) != (dc == -1)) edgeDepth += 1
      i += 1
    }
    Array(range, rootE, selfPar, presence, chain, missing, edgeDepth, visits)
  }
}

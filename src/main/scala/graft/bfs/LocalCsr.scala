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

  /** The cleaned symmetric edge set (original ids, both directions, no
    * loops or duplicates — exactly EdgeOps.cleanEdges' relation) as a
    * distributed DataFrame: broadcast arrays + range lookup, so no
    * distinct() shuffle and no boxed LocalRelation re-serialization on
    * downstream scans. */
  def toCleanDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val srcDense = new Array[Int](nbrs.length)
    var v = 0
    while (v < nVerts) {
      var k = rowStarts(v)
      while (k < rowStarts(v + 1)) { srcDense(k) = v; k += 1 }
      v += 1
    }
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcSrc = spark.sparkContext.broadcast(srcDense)
    val bcDst = spark.sparkContext.broadcast(nbrs)
    import org.apache.spark.sql.functions.{col, udf}
    val srcOf = udf((i: Long) => bcIds.value(bcSrc.value(i.toInt)))
    val dstOf = udf((i: Long) => bcIds.value(bcDst.value(i.toInt)))
    spark.range(nbrs.length.toLong)
      .select(srcOf(col("id")).as("src"), dstOf(col("id")).as("dst"))
  }

  /** (vertex, degree) ≡ EdgeOps.degrees over the cleaned relation — the
    * degree is a rowStarts difference, no groupBy shuffle. */
  def degreesDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val bcIds = spark.sparkContext.broadcast(ids)
    val bcRs = spark.sparkContext.broadcast(rowStarts)
    import org.apache.spark.sql.functions.{col, udf}
    val idOf = udf((i: Long) => bcIds.value(i.toInt))
    val degOf = udf { (i: Long) =>
      val rs = bcRs.value; (rs(i.toInt + 1) - rs(i.toInt)).toLong
    }
    spark.range(nVerts.toLong)
      .select(idOf(col("id")).as("vertex"), degOf(col("id")).as("degree"))
  }

  /** (vertex, new_id) ≡ EdgeOps.reorderMap(clean, mode): 0/1 = vertex-id
    * order (every CSR vertex has an edge, so isolated-last ≡ identity),
    * 2 = degree descending, ties by vertex id. The permutation is
    * computed in one driver-side packed sort; rows materialize
    * distributed. */
  def reorderDf(spark: org.apache.spark.sql.SparkSession,
                mode: Int): DataFrame = {
    require(mode >= 0 && mode <= 2, s"reorder mode $mode")
    val bcIds = spark.sparkContext.broadcast(ids)
    import org.apache.spark.sql.functions.{col, udf}
    val idOf = udf((i: Long) => bcIds.value(i.toInt))
    if (mode == 2) {
      // pack (degree desc, dense id asc) into one sortable long:
      // ids are sorted, so dense order == vertex-id order for ties
      val packed = new Array[Long](nVerts)
      var v = 0
      while (v < nVerts) {
        val deg = rowStarts(v + 1) - rowStarts(v)
        packed(v) = ((Int.MaxValue - deg).toLong << 32) | v.toLong
        v += 1
      }
      java.util.Arrays.parallelSort(packed)
      val newId = new Array[Long](nVerts)
      var k = 0
      while (k < nVerts) { newId((packed(k) & 0xffffffffL).toInt) = k; k += 1 }
      val bcNew = spark.sparkContext.broadcast(newId)
      val newOf = udf((i: Long) => bcNew.value(i.toInt))
      spark.range(nVerts.toLong)
        .select(idOf(col("id")).as("vertex"), newOf(col("id")).as("new_id"))
    } else
      spark.range(nVerts.toLong)
        .select(idOf(col("id")).as("vertex"), col("id").as("new_id"))
  }

  /** (vertex, new_id) over the FULL universe 0..nVertices-1, isolated
    * last ≡ EdgeOps.reorderMapIsolatedLast. The permutation is closed
    * form from the sorted CSR id array — members map to their dense
    * index, gaps to nVerts + (id − members-below-id) — so the kernel
    * needs no sort at all, just a binary search per row. */
  def reorderIsolatedLastDf(spark: org.apache.spark.sql.SparkSession,
                            nVertices: Long): DataFrame = {
    val bcIds = spark.sparkContext.broadcast(ids)
    import org.apache.spark.sql.functions.{col, udf}
    val newOf = udf { (v: Long) =>
      val a = bcIds.value
      val idx = java.util.Arrays.binarySearch(a, v)
      if (idx >= 0) idx.toLong
      else {
        val below = -idx - 1 // members with id < v
        a.length.toLong + (v - below)
      }
    }
    spark.range(nVertices)
      .select(col("id").as("vertex"), newOf(col("id")).as("new_id"))
  }

  /** Single-row graph summary ≡ EdgeOps.graphCounts. */
  def graphCountsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq((nVerts.toLong, ids.last, nbrs.length.toLong / 2))
      .toDF("non_isolated_vertices", "max_used_vertex", "undirected_edge_count")
  }

  /** Exact 2-hop reach of the top-k hubs ≡ EdgeOps.twoHopReach(clean, k):
    * one |V|-bit set per hub over DENSE ids — each wedge costs a single
    * bit-set instead of a hashed (hub, vertex) row, and the distinct IS
    * the bitset, so the union+distinct multiset never materializes.
    * Hubs run in parallel on the common pool (k independent bitsets,
    * k·|V| bits total — 20 hubs × 32M verts = 80 MB worst case under
    * the kernel gate). Ties at the k-th degree break to the smaller
    * original id, matching the distributed orderBy(degree desc, src). */
  def twoHopReachDf(spark: org.apache.spark.sql.SparkSession,
                    k: Int): DataFrame = {
    import spark.implicits._
    val nV = nVerts
    val kk = math.min(k, nV)
    // Dense index order IS ascending original-id order, so scanning v
    // upward and replacing only on STRICTLY greater degree realizes the
    // (degree desc, id asc) tie-break with a k-slot insertion list.
    val hub = new Array[Int](kk)
    var filled = 0
    var v = 0
    while (v < nV) {
      val d = rowStarts(v + 1) - rowStarts(v)
      if (filled < kk) {
        var i = filled
        while (i > 0 && (rowStarts(hub(i - 1) + 1) - rowStarts(hub(i - 1))) < d) {
          hub(i) = hub(i - 1); i -= 1
        }
        hub(i) = v; filled += 1
      } else if (d > rowStarts(hub(kk - 1) + 1) - rowStarts(hub(kk - 1))) {
        var i = kk - 1
        while (i > 0 && (rowStarts(hub(i - 1) + 1) - rowStarts(hub(i - 1))) < d) {
          hub(i) = hub(i - 1); i -= 1
        }
        hub(i) = v
      }
      v += 1
    }
    val rows = new Array[(Long, Long, Long)](filled)
    java.util.stream.IntStream.range(0, filled).parallel().forEach { i =>
      val h = hub(i)
      val seen = new java.util.BitSet(nV)
      var p = rowStarts(h)
      val pe = rowStarts(h + 1)
      while (p < pe) {
        val u = nbrs(p)
        seen.set(u)
        var q = rowStarts(u)
        val qe = rowStarts(u + 1)
        while (q < qe) { seen.set(nbrs(q)); q += 1 }
        p += 1
      }
      seen.clear(h)
      rows(i) = (ids(h), (pe - rowStarts(h)).toLong, seen.cardinality().toLong)
    }
    rows.toSeq.toDF("vertex", "degree", "reach_2hop")
  }

  /** Degree-assortativity moments ≡ EdgeOps.assortativityMoments: exact
    * long sums (n, Σdeg(src), Σdeg(src)², Σdeg(src)·deg(dst)) over every
    * directed adjacency entry — one pass over the CSR neighbor array,
    * chunked across the common pool; long addition is associative so the
    * chunked fold is bit-identical to the sequential sum. */
  def assortMomentsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val nV = nVerts
    val nChunks = math.min(LocalCsr.Threads * 4, math.max(1, nV))
    val acc = new Array[Array[Long]](nChunks)
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
      val from = (nV.toLong * c / nChunks).toInt
      val to = (nV.toLong * (c + 1) / nChunks).toInt
      var sd = 0L; var sd2 = 0L; var sxy = 0L
      var u = from
      while (u < to) {
        val du = (rowStarts(u + 1) - rowStarts(u)).toLong
        sd += du * du // u appears deg(u) times as src, deg(u) each
        sd2 += du * du * du
        var p = rowStarts(u)
        val pe = rowStarts(u + 1)
        while (p < pe) {
          val w = nbrs(p)
          sxy += du * (rowStarts(w + 1) - rowStarts(w))
          p += 1
        }
        u += 1
      }
      acc(c) = Array(sd, sd2, sxy)
    }
    var sd = 0L; var sd2 = 0L; var sxy = 0L
    var c = 0
    while (c < nChunks) {
      sd += acc(c)(0); sd2 += acc(c)(1); sxy += acc(c)(2); c += 1
    }
    Seq((nbrs.length.toLong, sd, sd2, sxy))
      .toDF("n_edges", "sum_d", "sum_d2", "sum_dxdy")
  }

  /** Work (frontier out-edges / unvisited rows) above which a level runs
    * on the common ForkJoin pool instead of one thread. Fork/join +
    * CAS overhead beats the speedup below ~1M edge-work per level
    * (measured at SCALE 18). Test-visible so specs can force the
    * parallel kernels on tiny graphs. */
  private[bfs] var parallelWork = 1L << 20

  /** Min-parent BFS from `root` (original vertex id). Returns dense
    * (pred, depth) arrays (−1 = unset/unreached) + per-level sizes.
    *
    * Big levels run PARALLEL across the common pool (the reference's
    * OpenMP sections, bfs.hpp:977,2225): top-down claims vertices with a
    * depth CAS and folds parents with a CAS-min (min commutes ⇒ the
    * parallel tree equals the sequential min-parent tree); bottom-up
    * partitions the unvisited range, each vertex written by exactly one
    * thread. Small levels stay sequential — no fork/join overhead.
    */
  def bfs(root: Long): (Array[Int], Array[Int], Seq[(Int, Long)]) = {
    val nV = ids.length
    bfsInto(root, new Array[Int](nV), new Array[Int](nV))
  }

  /** [[bfs]] into caller-provided work arrays (benchmark loops reuse
    * them across runs — per-run array churn otherwise lands a GC pause
    * in one run's time, which the harmonic mean amplifies). */
  def bfsInto(root: Long, pred: Array[Int],
              depth: Array[Int]): (Array[Int], Array[Int], Seq[(Int, Long)]) = {
    val v0 = java.util.Arrays.binarySearch(ids, root)
    require(v0 >= 0, s"root $root has no edges in this graph")
    val nV = ids.length
    java.util.Arrays.fill(pred, -1)
    java.util.Arrays.fill(depth, -1)
    pred(v0) = v0
    depth(v0) = 0
    var frontier = Array(v0)
    var level = 0
    var visited = 1L
    val sizes = scala.collection.mutable.ArrayBuffer((0, 1L))

    while (frontier.nonEmpty) {
      level += 1
      val bottomUp = frontier.length.toLong * Bfs.Beta > (nV - visited)
      val next: Array[Int] =
        if (bottomUp) {
          val unvisited = nV - visited
          if (unvisited > parallelWork)
            bottomUpParallel(pred, depth, level)
          else bottomUpSeq(pred, depth, level)
        } else {
          var work = 0L
          var fi = 0
          while (fi < frontier.length) {
            val u = frontier(fi)
            work += rowStarts(u + 1) - rowStarts(u)
            fi += 1
          }
          if (work > parallelWork) topDownParallel(frontier, pred, depth, level)
          else topDownSeq(frontier, pred, depth, level)
        }
      java.util.Arrays.sort(next)
      frontier = next
      if (frontier.nonEmpty) {
        sizes += ((level, frontier.length.toLong))
        visited += frontier.length
      }
    }
    (pred, depth, sizes.toSeq)
  }

  /** Sequential top-down: frontier ascending ⇒ first writer = min parent
    * (reference top-down, bfs.hpp:962-1137). */
  private def topDownSeq(frontier: Array[Int], pred: Array[Int],
                         depth: Array[Int], level: Int): Array[Int] = {
    val next = new scala.collection.mutable.ArrayBuilder.ofInt
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
    next.result()
  }

  /** Sequential bottom-up: scan unvisited rows ascending; first (= min,
    * rows sorted) previous-level neighbor adopts the vertex (reference
    * bottom-up, bfs.hpp:1839-1967). */
  private def bottomUpSeq(pred: Array[Int], depth: Array[Int],
                          level: Int): Array[Int] = {
    val next = new scala.collection.mutable.ArrayBuilder.ofInt
    val nV = ids.length
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
    next.result()
  }

  private def topDownParallel(frontier: Array[Int], pred: Array[Int],
                              depth: Array[Int], level: Int): Array[Int] = {
    val h = LocalCsr.IntArr
    val nChunks = math.min(LocalCsr.Threads * 4, frontier.length)
    val buffers = new Array[Array[Int]](nChunks)
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
      val b = new scala.collection.mutable.ArrayBuilder.ofInt
      val from = (frontier.length.toLong * c / nChunks).toInt
      val to = (frontier.length.toLong * (c + 1) / nChunks).toInt
      var fi = from
      while (fi < to) {
        val u = frontier(fi)
        var k = rowStarts(u)
        val end = rowStarts(u + 1)
        while (k < end) {
          val v = nbrs(k)
          // depth is monotonic (written once), so a plain read of a SET
          // value is definitive; only the −1 case needs the CAS. Claim
          // with a depth CAS (one winner buffers v), then CAS-min the
          // parent: min commutes, so the result equals the sequential
          // first-writer-ascending tree.
          var dv = depth(v)
          if (dv == -1) {
            if (h.compareAndSet(depth, v, -1, level)) b += v
            dv = h.getVolatile(depth, v).asInstanceOf[Int]
          }
          if (dv == level) {
            var cur = h.getVolatile(pred, v).asInstanceOf[Int]
            while ((cur == -1 || u < cur) &&
              !h.compareAndSet(pred, v, cur, u)) {
              cur = h.getVolatile(pred, v).asInstanceOf[Int]
            }
          }
          k += 1
        }
        fi += 1
      }
      buffers(c) = b.result()
    }
    concat(buffers)
  }

  private def bottomUpParallel(pred: Array[Int], depth: Array[Int],
                               level: Int): Array[Int] = {
    val nV = ids.length
    val nChunks = LocalCsr.Threads * 4
    val buffers = new Array[Array[Int]](nChunks)
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
      val b = new scala.collection.mutable.ArrayBuilder.ofInt
      val from = (nV.toLong * c / nChunks).toInt
      val to = (nV.toLong * (c + 1) / nChunks).toInt
      var v = from
      while (v < to) {
        // each v is written by exactly this thread; concurrent writes to
        // OTHER vertices flip −1→level, never to level−1, so the frontier
        // test is race-free
        if (depth(v) < 0) {
          var k = rowStarts(v)
          val end = rowStarts(v + 1)
          var hit = false
          while (k < end && !hit) {
            val u = nbrs(k)
            if (depth(u) == level - 1) {
              pred(v) = u; depth(v) = level; b += v; hit = true
            }
            k += 1
          }
        }
        v += 1
      }
      buffers(c) = b.result()
    }
    concat(buffers)
  }

  private def concat(buffers: Array[Array[Int]]): Array[Int] = {
    var n = 0
    buffers.foreach(b => n += (if (b == null) 0 else b.length))
    val out = new Array[Int](n)
    var off = 0
    buffers.foreach { b =>
      if (b != null) { System.arraycopy(b, 0, out, off, b.length); off += b.length }
    }
    out
  }
}

object LocalCsr {

  private[bfs] val Threads: Int =
    math.max(2, Runtime.getRuntime.availableProcessors())

  /** VarHandle over Array[Int] elements for the parallel kernels' CAS. */
  private[bfs] val IntArr: java.lang.invoke.VarHandle =
    java.lang.invoke.MethodHandles.arrayElementVarHandle(classOf[Array[Int]])

  /** Build from a symmetric loop-free edge DataFrame. One collect of the
    * edge pairs; dense ids assigned by sorted original id; adjacency rows
    * end up sorted because the packed (src,dst) array is sorted before
    * the CSR fill — the reference's per-row sort + compaction
    * (graph_constructor.hpp:1363-1412) in one pass.
    *
    * `dedupAdjacent = true` additionally merges duplicate edges after the
    * sort (the reference's duplicate merge, graph_constructor.hpp:
    * 1390-1408), so the input may carry parallel edges — a DataFrame
    * `distinct()` (a full shuffle) becomes unnecessary when the CSR is
    * the execution target anyway. */
  def build(clean: DataFrame, dedupAdjacent: Boolean = false): LocalCsr =
    fromPairs(collectPairs(clean), symmetrize = false, dedup = dedupAdjacent)

  /** Build straight from a RAW flat pair array: drop self-loops,
    * symmetrize, and merge duplicates in-kernel — the raw list is
    * collected ONCE (vs collecting a DataFrame union that scans the
    * source twice and ships both directions over the wire). */
  def buildFromRawPairs(flat: Array[Long]): LocalCsr =
    fromPairs(flat, symmetrize = true, dedup = true)

  /** Collect (src, dst) pairs as ONE primitive long array
    * ([src,dst,src,dst,...]) — primitive chunks serialize compactly, no
    * driver-side deserialization of millions of boxed tuples; reading
    * InternalRow (queryExecution.toRdd) skips the Row conversion layer. */
  def collectPairs(df: DataFrame): Array[Long] = {
    val chunks: Array[Array[Long]] = df.select(col("src"), col("dst"))
      .queryExecution.toRdd.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator.single(b.result())
      }.collect()
    val flat = new Array[Long](chunks.iterator.map(_.length).sum)
    var off = 0
    chunks.foreach { c => System.arraycopy(c, 0, flat, off, c.length); off += c.length }
    flat
  }

  /** Shared CSR core. `symmetrize = false` expects a symmetric loop-free
    * input whose srcs cover every vertex (a cleaned relation);
    * `symmetrize = true` takes a raw list, drops loops, and emits both
    * directions. */
  private def fromPairs(flat: Array[Long], symmetrize: Boolean,
                        dedup: Boolean): LocalCsr = {
    val nIn = flat.length / 2
    val nStripes = Threads * 4
    def stripe(st: Int): (Int, Int) =
      ((nIn.toLong * st / nStripes).toInt, (nIn.toLong * (st + 1) / nStripes).toInt)

    // distinct sorted vertex ids via primitive parallel sort + in-place
    // dedup: srcs cover everything for symmetric input; for raw input,
    // both endpoints of every non-loop edge
    val endpoints =
      if (!symmetrize) {
        val a = new Array[Long](nIn)
        var i = 0
        while (i < nIn) { a(i) = flat(2 * i); i += 1 }
        a
      } else {
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        b.sizeHint(nIn * 2)
        var i = 0
        while (i < nIn) {
          val s = flat(2 * i); val d = flat(2 * i + 1)
          if (s != d) { b += s; b += d }
          i += 1
        }
        b.result()
      }
    java.util.Arrays.parallelSort(endpoints)
    var nV0 = 0
    var i = 0
    while (i < endpoints.length) {
      if (nV0 == 0 || endpoints(nV0 - 1) != endpoints(i)) {
        endpoints(nV0) = endpoints(i); nV0 += 1
      }
      i += 1
    }
    val ids = java.util.Arrays.copyOf(endpoints, nV0)

    // open-addressed id→dense table for the mapping passes: a binary
    // search costs log2(nV) dependent cache misses PER LOOKUP (20+ at
    // SCALE 20) and the passes do two lookups per edge — linear probing
    // at 50% load does ~1-2. Sequential fill (|V| inserts, ~ms), shared
    // read-only by the parallel stripes.
    // ≤50% load: ~1.5 probes per hit, 12 B/slot (24 MB at SCALE 20's
    // 645k vertices; bounded by 2× the CSR's own id array at the gate)
    val cap = java.lang.Integer.highestOneBit(math.max(2, nV0) * 2 - 1) << 1
    val mask = cap - 1
    val tKeys = new Array[Long](cap)
    val tVals = new Array[Int](cap)
    java.util.Arrays.fill(tVals, -1)
    i = 0
    while (i < nV0) {
      var h = ((ids(i) * 0x9E3779B97F4A7C15L) >>> 40).toInt & mask
      while (tVals(h) >= 0) h = (h + 1) & mask
      tKeys(h) = ids(i); tVals(h) = i
      i += 1
    }
    def dense(x: Long): Int = {
      var h = ((x * 0x9E3779B97F4A7C15L) >>> 40).toInt & mask
      while (tKeys(h) != x || tVals(h) < 0) h = (h + 1) & mask
      tVals(h)
    }

    // dense-map in parallel; raw input additionally emits the reverse
    // direction per kept edge
    val enc =
      if (!symmetrize) {
        val a = new Array[Long](nIn)
        java.util.stream.IntStream.range(0, nStripes).parallel().forEach { st =>
          val (from, to) = stripe(st)
          var j = from
          while (j < to) {
            val s = dense(flat(2 * j))
            val d = dense(flat(2 * j + 1))
            a(j) = (s.toLong << 32) | (d.toLong & 0xffffffffL)
            j += 1
          }
        }
        a
      } else {
        // per-stripe non-loop counts → offsets → parallel fill
        val counts = new Array[Int](nStripes)
        java.util.stream.IntStream.range(0, nStripes).parallel().forEach { st =>
          val (from, to) = stripe(st)
          var c = 0
          var j = from
          while (j < to) { if (flat(2 * j) != flat(2 * j + 1)) c += 1; j += 1 }
          counts(st) = c
        }
        val offs = new Array[Int](nStripes + 1)
        var st = 0
        while (st < nStripes) { offs(st + 1) = offs(st) + 2 * counts(st); st += 1 }
        val a = new Array[Long](offs(nStripes))
        java.util.stream.IntStream.range(0, nStripes).parallel().forEach { st =>
          val (from, to) = stripe(st)
          var w = offs(st)
          var j = from
          while (j < to) {
            val s0 = flat(2 * j); val d0 = flat(2 * j + 1)
            if (s0 != d0) {
              val s = dense(s0)
              val d = dense(d0)
              a(w) = (s.toLong << 32) | (d.toLong & 0xffffffffL)
              a(w + 1) = (d.toLong << 32) | (s.toLong & 0xffffffffL)
              w += 2
            }
            j += 1
          }
        }
        a
      }
    java.util.Arrays.parallelSort(enc)
    val nE = enc.length
    val nKeep =
      if (!dedup) nE
      else {
        var n = 0
        i = 0
        while (i < nE) {
          if (n == 0 || enc(n - 1) != enc(i)) { enc(n) = enc(i); n += 1 }
          i += 1
        }
        n
      }

    val nV = ids.length
    val rowStarts = new Array[Int](nV + 1)
    val nbrs = new Array[Int](nKeep)
    i = 0
    while (i < nKeep) {
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

package graft.bfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Triangle counting over an undirected graph via degree-ordered edge
 * orientation — the standard skew-proof formulation (Latapy's
 * compact-forward / "oriented wedge + closing-edge check").
 *
 * The reference engine's analytics surface stops at BFS/SSSP stubs
 * (mpi/bfs.hpp:2569-2571); triangle counting is the next query a graph
 * user runs, and its naive form (join every wedge) is the canonical
 * skew disaster on power-law graphs: a hub of degree d contributes
 * O(d²) wedges. Orienting every edge from its (degree, id)-smaller
 * endpoint to its larger one bounds the oriented out-degree by
 * O(sqrt(m)), so the wedge join touches O(m^1.5) rows worst-case
 * instead of Σd² — this is the difference between "finishes at 100 TB"
 * and "one straggler task owns the hub".
 *
 * Physical shape (distributed path): two shuffles on vertex keys for
 * the degree join, one self-join on the wedge apex (the exchange is
 * shared by both sides), and one left join against the oriented edge
 * set for the closing-edge check — every join an equi-join, no
 * cartesian anywhere. The one-row output (n_wedges, n_triangles)
 * aggregates with a partial-agg map side.
 *
 * Under the BFS size gate the count runs in-kernel on a [[LocalCsr]]:
 * sorted adjacency rows make the closing-edge check a merge
 * intersection of two oriented rows.
 */
object Triangles {

  /** One-row (n_wedges, n_triangles) over a cleaned symmetric loop-free
    * edge DataFrame (both directions present). */
  def countDistributed(clean: DataFrame): DataFrame = {
    val deg = clean.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    val ori = clean
      .join(deg.select(col("v").as("src"), col("d").as("sd")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dd")), "dst")
      .where(col("sd") < col("dd") ||
        (col("sd") === col("dd") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b"), col("dd").as("bd"))
    // wedge (a; b, c) with rank(b) < rank(c): each triangle x<y<z (rank
    // order) appears exactly once, as the wedge at apex x closed by the
    // oriented edge y -> z
    val wedges = ori.as("e1")
      .join(ori.select(col("a"), col("b").as("c"), col("bd").as("cd")).as("e2"), "a")
      .where(col("bd") < col("cd") ||
        (col("bd") === col("cd") && col("b") < col("c")))
      .select(col("b"), col("c"))
    wedges
      .join(ori.select(col("a").as("b"), col("b").as("c"), lit(1).as("m")),
        Seq("b", "c"), "left")
      .agg(count(lit(1)).as("n_wedges"), count(col("m")).as("n_triangles"))
  }

  /** In-kernel count on a symmetric CSR (sorted ids, sorted rows). The
    * graph is relabeled into rank space — rank = position in the
    * (degree, id) sort — so orientation is "smaller rank -> larger
    * rank" and the closing-edge check is a merge intersection of two
    * rank-sorted oriented rows. Each triangle with ranks x < y < z is
    * counted exactly once, at oriented edge (x, y): z ∈ out(x) ∩ out(y). */
  def countCsr(csr: LocalCsr): (Long, Long) = {
    val nV = csr.nVerts
    val rs = csr.rowStarts
    val nbrs = csr.nbrs
    // rank permutation: sort (deg, dense id) packed into one long —
    // dense ids are id-sorted, so the packed sort realizes rankLt
    val packed = new Array[Long](nV)
    var v = 0
    while (v < nV) {
      packed(v) = ((rs(v + 1) - rs(v)).toLong << 32) | v.toLong
      v += 1
    }
    java.util.Arrays.parallelSort(packed)
    val rankOf = new Array[Int](nV)
    var r = 0
    while (r < nV) { rankOf((packed(r) & 0xffffffffL).toInt) = r; r += 1 }

    // oriented adjacency in rank space, per-row sorted
    val oriStarts = new Array[Int](nV + 1)
    v = 0
    while (v < nV) {
      var k = rs(v)
      var c = 0
      while (k < rs(v + 1)) {
        if (rankOf(v) < rankOf(nbrs(k))) c += 1
        k += 1
      }
      oriStarts(rankOf(v) + 1) = c
      v += 1
    }
    var i = 0
    while (i < nV) { oriStarts(i + 1) += oriStarts(i); i += 1 }
    val ori = new Array[Int](oriStarts(nV))
    val fill = new Array[Int](nV)
    v = 0
    while (v < nV) {
      val ru = rankOf(v)
      var k = rs(v)
      while (k < rs(v + 1)) {
        val rw = rankOf(nbrs(k))
        if (ru < rw) { ori(oriStarts(ru) + fill(ru)) = rw; fill(ru) += 1 }
        k += 1
      }
      v += 1
    }
    r = 0
    while (r < nV) {
      java.util.Arrays.sort(ori, oriStarts(r), oriStarts(r + 1))
      r += 1
    }

    var wedges = 0L
    var triangles = 0L
    r = 0
    while (r < nV) {
      val od = (oriStarts(r + 1) - oriStarts(r)).toLong
      wedges += od * (od - 1) / 2
      var k = oriStarts(r)
      while (k < oriStarts(r + 1)) {
        val w = ori(k)
        var i2 = oriStarts(r)
        var j2 = oriStarts(w)
        while (i2 < oriStarts(r + 1) && j2 < oriStarts(w + 1)) {
          val x = ori(i2); val y = ori(j2)
          if (x == y) { triangles += 1; i2 += 1; j2 += 1 }
          else if (x < y) i2 += 1
          else j2 += 1
        }
        k += 1
      }
      r += 1
    }
    (wedges, triangles)
  }

  /** Gate-dispatched entry: in-kernel under `spark.graft.localBfsMaxEdges`
    * (the CSR build collects the pairs it would count), distributed
    * above. `edges` is a RAW undirected pair list (one direction per
    * unordered pair is fine; loops and duplicates tolerated). */
  def run(spark: SparkSession, edges: DataFrame): DataFrame = {
    val gate = spark.conf.get("spark.graft.localBfsMaxEdges",
      (64L << 20).toString).toLong
    val flat =
      if (gate <= 0) null
      else {
        val cnt = edges.select(col("src")).limit((gate + 1).toInt).count()
        if (cnt > gate) null else LocalCsr.collectPairs(edges)
      }
    if (flat != null) {
      val (w, t) = countCsr(LocalCsr.buildFromRawPairs(flat))
      import spark.implicits._
      Seq((w, t)).toDF("n_wedges", "n_triangles")
    } else {
      val clean = graft.etl.EdgeOps.cleanEdges(edges)
      countDistributed(clean)
    }
  }
}

package graft.bfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Synchronous label propagation (community detection), fixed rounds:
 * every vertex starts labeled with its own id; each round it adopts
 * the most frequent label among its NEIGHBORS' previous-round labels,
 * ties broken by the smallest label. Synchronous updates + the min
 * tie-break make the result deterministic and engine-independent, so
 * the DuckDB oracle unrolls the same rounds (the fixed-iteration
 * contract `gr_pagerank`/`gr_kcore` use — no fixpoint claim; sync LPA
 * can 2-cycle, notably on bipartite graphs, and an even round count
 * reads out the stable side).
 *
 * Output: (vertex, label) after `rounds` rounds.
 */
object LabelPropagation {

  /** Distributed loop. Scale shape: the edge table shuffles to `dst`
    * once and every round joins the (|V|-sized) label table to it,
    * partial-aggregates (vertex, label) counts, and ranks inside a
    * per-vertex window — millions of small hash-distributed groups.
    * Lineage is cut mid-loop with an eager checkpoint of the small
    * label table. */
  def lpa(spark: SparkSession, clean: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds > 0, s"lpa: rounds must be positive, got $rounds")
    val edges = clean.select("src", "dst")
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    val w = Window.partitionBy("v").orderBy(col("cnt").desc, col("label"))
    var r = 1
    while (r <= rounds) {
      val counts = edges
        .join(labels.select(col("v").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("v"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labels = counts
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select("v", "label")
      if (r % 2 == 0 && r < rounds)
        labels = labels.localCheckpoint(eager = true)
      r += 1
    }
    val out = labels.select(col("v").as("vertex"), col("label"))
      .localCheckpoint(eager = true)
    edges.unpersist(blocking = false)
    out
  }

  /** CSR kernel ≡ [[lpa]]: per round, each vertex counts neighbor
    * labels in a small hash map and takes (max count, min label). */
  def lpaCsr(csr: LocalCsr, rounds: Int = 4): Array[Long] = {
    val n = csr.nVerts
    val rs = csr.rowStarts
    val nbrs = csr.nbrs
    var labels = new Array[Long](n)
    var i = 0
    while (i < n) { labels(i) = csr.ids(i); i += 1 }
    var r = 1
    while (r <= rounds) {
      val prev = labels
      val next = new Array[Long](n)
      java.util.stream.IntStream.range(0, n).parallel().forEach { v =>
        val m = new java.util.HashMap[java.lang.Long, Array[Int]]()
        var k = rs(v)
        while (k < rs(v + 1)) {
          m.computeIfAbsent(prev(nbrs(k)), _ => new Array[Int](1))(0) += 1
          k += 1
        }
        var bestLabel = Long.MaxValue
        var bestCnt = -1
        m.forEach { (l, c) =>
          if (c(0) > bestCnt || (c(0) == bestCnt && l < bestLabel)) {
            bestCnt = c(0); bestLabel = l
          }
        }
        next(v) = if (bestCnt < 0) prev(v) else bestLabel
      }
      labels = next
      r += 1
    }
    labels
  }

  /** Kernel result as a DataFrame (vertex, label) via broadcast ship. */
  def lpaCsrDf(spark: SparkSession, csr: LocalCsr, rounds: Int = 4): DataFrame =
    graft.functions.Ship.df(spark,
      "vertex" -> csr.ids, "label" -> lpaCsr(csr, rounds))

  /** Community quality profile over an LPA partition — the modularity
    * decomposition a community-detection run is judged by. Per
    * community: member count, total degree `k_c` (directed edge
    * endpoints inside c — exact integer), internal directed edge count
    * `in_c` (each undirected internal edge counted twice), and the
    * 6-dp modularity contribution q_c = in_c/2m − (k_c/2m)²; Q = Σ q_c.
    * Top-k communities by (members desc, label asc).
    *
    * Scale shape: two label joins against the (|V|-sized) label table,
    * ONE partially-aggregated groupBy(community), a one-row total
    * crossed in as a broadcast, and TakeOrdered for the k result rows —
    * no window over the edge set anywhere. */
  def modularityTop(clean: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    val lab = labels.select(col("vertex"), col("label"))
    val e = clean.select("src", "dst")
      .join(lab.select(col("vertex").as("src"), col("label").as("ls")), "src")
      .join(lab.select(col("vertex").as("dst"), col("label").as("ld")), "dst")
    val per = e.groupBy(col("ls").as("community"))
      .agg(count(lit(1)).as("k_c"),
        sum(when(col("ls") === col("ld"), 1L).otherwise(0L)).as("in_c"))
    val members = lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"))
    val tot = clean.agg(count(lit(1)).as("m2"))
    val kd = col("k_c").cast("double") / col("m2").cast("double")
    members.join(per, Seq("community"))
      .crossJoin(broadcast(tot))
      .select(col("community"), col("n_members"), col("k_c"), col("in_c"),
        round(col("in_c").cast("double") / col("m2").cast("double") -
          kd * kd, 6).as("q_c"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(k)
  }

  private final class CommAcc {
    var members = 0L
    var kC = 0L
    var inC = 0L
  }

  /** One adjacency sweep accumulating per-community (members, k_c,
    * in_c) — shared by the modularity and conductance kernels. */
  private def communityAggCsr(csr: LocalCsr, labels: Array[Long])
      : Seq[(Long, Long, Long, Long)] = {
    val n = csr.nVerts
    val rs = csr.rowStarts
    val nbrs = csr.nbrs
    val byC = new java.util.TreeMap[Long, CommAcc]()
    var v = 0
    while (v < n) {
      val l = labels(v)
      var a = byC.get(l)
      if (a == null) { a = new CommAcc; byC.put(l, a) }
      a.members += 1
      a.kC += rs(v + 1) - rs(v)
      var p = rs(v)
      while (p < rs(v + 1)) {
        if (labels(nbrs(p)) == l) a.inC += 1
        p += 1
      }
      v += 1
    }
    import scala.jdk.CollectionConverters._
    byC.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue.members, e.getValue.kC, e.getValue.inC))
  }

  /** Kernel twin of [[modularityTop]] on CSR arrays + an LPA label
    * array (dense-indexed): one sweep over the adjacency accumulating
    * per-community (members, k_c, in_c), same rounded double contract. */
  def modularityTopCsr(spark: SparkSession, csr: LocalCsr,
                       labels: Array[Long], k: Int): DataFrame = {
    val m2 = csr.rowStarts(csr.nVerts).toDouble
    val rows = communityAggCsr(csr, labels)
      .sortBy { case (c, m, _, _) => (-m, c) }
      .take(k)
      .map { case (c, m, kC, inC) =>
        val kd = kC.toDouble / m2
        (c, m, kC, inC,
          graft.ops.LocalDedup.round6(inC.toDouble / m2 - kd * kd))
      }
    import spark.implicits._
    rows.toDF("community", "n_members", "k_c", "in_c", "q_c")
  }

  /** Per-community conductance φ(C) = cut(C) / min(vol(C), 2m − vol(C))
    * over a (vertex, label) partition — the OTHER community-quality
    * metric next to modularity: low φ = few escaping edges relative to
    * the community's degree mass. `cut` and `vol` are exact integers
    * from the same symmetric edge labelling as [[modularityTop]]
    * (cut = k_c − in_c); φ is a 6-dp rendering, NULL for a community
    * holding all edge mass (denominator 0). Top-k by size.
    *
    * Scale shape: identical to modularity — two vertex-keyed label
    * joins, one partial-agg'd groupBy per side, one-row broadcast
    * total, TakeOrdered. */
  def conductanceTop(clean: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    val lab = labels.select(col("vertex"), col("label"))
    val e = clean.select("src", "dst")
      .join(lab.select(col("vertex").as("src"), col("label").as("ls")), "src")
      .join(lab.select(col("vertex").as("dst"), col("label").as("ld")), "dst")
    val per = e.groupBy(col("ls").as("community"))
      .agg(count(lit(1)).as("k_c"),
        sum(when(col("ls") =!= col("ld"), 1L).otherwise(0L)).as("cut_c"))
    val members = lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"))
    val tot = clean.agg(count(lit(1)).as("m2"))
    val denom = least(col("k_c"), col("m2") - col("k_c"))
    members.join(per, Seq("community"))
      .crossJoin(broadcast(tot))
      .select(col("community"), col("n_members"), col("k_c"), col("cut_c"),
        when(denom > 0,
          round(col("cut_c").cast("double") / denom.cast("double"), 6))
          .as("phi"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(k)
  }

  /** Kernel twin of [[conductanceTop]] — same sweep as the modularity
    * kernel, conductance rendering. */
  def conductanceTopCsr(spark: SparkSession, csr: LocalCsr,
                        labels: Array[Long], k: Int): DataFrame = {
    val m2 = csr.rowStarts(csr.nVerts)
    val rows = communityAggCsr(csr, labels)
      .sortBy { case (c, m, _, _) => (-m, c) }
      .take(k)
      .map { case (c, m, kC, inC) =>
        val cut = kC - inC
        val denom = math.min(kC, m2 - kC)
        (c, m, kC, cut,
          if (denom > 0)
            Some(graft.ops.LocalDedup.round6(cut.toDouble / denom))
          else None)
      }
    import spark.implicits._
    rows.toDF("community", "n_members", "k_c", "cut_c", "phi")
  }
}

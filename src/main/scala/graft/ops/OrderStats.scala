package graft.ops

import scala.reflect.ClassTag
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.RangePartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/**
 * Distributed exact per-key order statistics — the scale-safe
 * formulation shared by the gap-stats median and the quality-score
 * quartiles (reference analogue: the run-statistics quartiles over the
 * 64-entry result table, mpi/logfile.h:32-43 — tiny there, unbounded
 * here).
 *
 * A `row_number` window partitioned by a LOW-cardinality key sorts
 * every row of a key in ONE task — the canonical window bottleneck.
 * Instead: one RANGE-partitioned global sort on (key, value) — large
 * keys span many partitions — plus the two-phase prefix-scan pattern
 * (`Mix.pack`, `EdgeOps.reorderMap`):
 *
 *   pass 1  stream each sorted partition once, counting its per-key
 *           contiguous runs → O(partitions + keys) subtotals collect;
 *   driver  exclusive-scan the subtotals in partition order → the
 *           global start rank of every (partition, key) run, and each
 *           key's total count → its requested target ranks;
 *   pass 2  re-stream the SAME persisted partitions, emitting ONLY the
 *           rows whose global rank is a target — ≤ Σ|targets| rows
 *           ever leave the executors.
 *
 * Both passes bind partition ids with `mapPartitionsWithIndex` at plan
 * time (a downstream `coalesce` cannot rebind them — see Mix.pack).
 */
object OrderStats {

  /** Per-key scalar moments computed for free during pass 1 (the runs
    * are value-sorted, so a run's min is its first element and its max
    * its last; only the sum needs per-row work). */
  final case class KeyStats(n: Long, min: Long, max: Long, sum: Long)

  /** For each key, the values at `targets(n)` (0-based ranks into the
    * key's ascending value sort, n = the key's row count; duplicate
    * ranks emit duplicate rows). Returns (key, rnk, value), eagerly
    * materialized (`localCheckpoint`) so the sorted intermediate is
    * unpersisted before return — callers never hold a corpus-sized
    * lineage. */
  def selectRanks[V: Ordering : ClassTag : TypeTag](
      spark: SparkSession,
      rows: RDD[(String, V)],
      targets: Long => Seq[Long]): DataFrame =
    core[V](spark, rows, targets, withStats = false,
      toLong = null)._1

  /** [[selectRanks]] for Long values, additionally returning each key's
    * exact (n, min, max, sum) — accumulated inside pass 1, which was
    * already streaming every row to count runs. Callers that used to
    * run a SEPARATE reduceByKey pass over the same data for these
    * scalars (gap stats, quality quartiles' stratum counts) get them
    * here at zero extra passes and zero extra shuffles. */
  def selectRanksWithStats(
      spark: SparkSession,
      rows: RDD[(String, Long)],
      targets: Long => Seq[Long]): (DataFrame, Map[String, KeyStats]) =
    core[Long](spark, rows, targets, withStats = true, toLong = identity)

  private def core[V: Ordering : ClassTag : TypeTag](
      spark: SparkSession,
      rows: RDD[(String, V)],
      targets: Long => Seq[Long],
      withStats: Boolean,
      toLong: V => Long): (DataFrame, Map[String, KeyStats]) = {
    import spark.implicits._
    implicit val keyOrd: Ordering[(String, V)] =
      Ordering.Tuple2(Ordering.String, implicitly[Ordering[V]])
    val keyed = rows.map(kv => (kv, ()))
    val numParts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = keyed
      .repartitionAndSortWithinPartitions(new RangePartitioner(numParts, keyed))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-(partition, key) run lengths (+ min/max/sum moments
    // when requested — the run is value-sorted, so min/max are its
    // first/last element)
    val counts: Array[(Int, String, Long, Long, Long, Long)] =
      sorted.mapPartitionsWithIndex { (pid, it) =>
        val runs = scala.collection.mutable
          .ArrayBuffer.empty[(Int, String, Long, Long, Long, Long)]
        var cur: String = null
        var n = 0L
        var mn = 0L; var mx = 0L; var sm = 0L
        it.foreach { case ((k, v), _) =>
          if (k != cur) {
            if (cur != null) runs += ((pid, cur, n, mn, mx, sm))
            cur = k; n = 0L; sm = 0L
            if (withStats) { mn = toLong(v) }
          }
          n += 1L
          if (withStats) { val lv = toLong(v); mx = lv; sm += lv }
        }
        if (cur != null) runs += ((pid, cur, n, mn, mx, sm))
        runs.iterator
      }.collect()
    // driver: exclusive scan in partition order → start ranks + totals
    // (+ cross-partition moment merge)
    val baseB = Map.newBuilder[(Int, String), Long]
    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    val moments =
      scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]
    counts.sortBy(_._1).foreach { case (pid, k, n, mn, mx, sm) =>
      baseB += ((pid, k) -> totals.getOrElse(k, 0L))
      totals(k) = totals.getOrElse(k, 0L) + n
      if (withStats) moments.get(k) match {
        case Some((pmn, pmx, psm)) =>
          moments(k) = (math.min(pmn, mn), math.max(pmx, mx), psm + sm)
        case None => moments(k) = (mn, mx, sm)
      }
    }
    val targetsByKey: Map[String, Array[Long]] =
      totals.iterator.map { case (k, n) =>
        k -> targets(n).sorted.toArray
      }.toMap
    val bcBase = spark.sparkContext.broadcast(baseB.result())
    val bcTargets = spark.sparkContext.broadcast(targetsByKey)
    // pass 2: same persisted partitions; emit only target-rank rows
    val out = sorted.mapPartitionsWithIndex { (pid, it) =>
        var cur: String = null
        var rank = 0L
        var tg: Array[Long] = null
        var ti = 0
        it.flatMap { case ((k, v), _) =>
          if (k != cur) {
            cur = k; rank = bcBase.value((pid, k))
            tg = bcTargets.value(k)
            // first target index not below this run's start rank
            ti = {
              var i = java.util.Arrays.binarySearch(tg, rank)
              if (i < 0) -i - 1
              else { while (i > 0 && tg(i - 1) == rank) i -= 1; i }
            }
          }
          val r = rank; rank += 1L
          var hits = 0
          while (ti < tg.length && tg(ti) == r) { hits += 1; ti += 1 }
          if (hits == 0) Iterator.empty
          else Iterator.fill(hits)((k, r, v))
        }
      }.toDF("key", "rnk", "value")
      .localCheckpoint(true) // ≤ Σ|targets| rows; frees the sort
    sorted.unpersist(blocking = false)
    val stats =
      if (!withStats) Map.empty[String, KeyStats]
      else totals.iterator.map { case (k, n) =>
        val (mn, mx, sm) = moments(k)
        k -> KeyStats(n, mn, mx, sm)
      }.toMap
    (out, stats)
  }
}

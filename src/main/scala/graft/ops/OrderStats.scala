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

  /** For each key, the values at `targets(n)` (0-based ranks into the
    * key's ascending value sort, n = the key's row count; duplicate
    * ranks emit duplicate rows). Returns (key, rnk, value), eagerly
    * materialized (`localCheckpoint`) so the sorted intermediate is
    * unpersisted before return — callers never hold a corpus-sized
    * lineage. */
  def selectRanks[V: Ordering : ClassTag : TypeTag](
      spark: SparkSession,
      rows: RDD[(String, V)],
      targets: Long => Seq[Long]): DataFrame = {
    import spark.implicits._
    implicit val keyOrd: Ordering[(String, V)] =
      Ordering.Tuple2(Ordering.String, implicitly[Ordering[V]])
    val keyed = rows.map(kv => (kv, ()))
    val numParts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = keyed
      .repartitionAndSortWithinPartitions(new RangePartitioner(numParts, keyed))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-(partition, key) run lengths
    val counts: Array[(Int, String, Long)] =
      sorted.mapPartitionsWithIndex { (pid, it) =>
        val runs =
          scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
        var cur: String = null
        var n = 0L
        it.foreach { case ((k, _), _) =>
          if (k != cur) {
            if (cur != null) runs += ((pid, cur, n))
            cur = k; n = 0L
          }
          n += 1L
        }
        if (cur != null) runs += ((pid, cur, n))
        runs.iterator
      }.collect()
    // driver: exclusive scan in partition order → start ranks + totals
    val baseB = Map.newBuilder[(Int, String), Long]
    val totals = scala.collection.mutable.HashMap.empty[String, Long]
    counts.sortBy(_._1).foreach { case (pid, k, n) =>
      baseB += ((pid, k) -> totals.getOrElse(k, 0L))
      totals(k) = totals.getOrElse(k, 0L) + n
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
    out
  }
}

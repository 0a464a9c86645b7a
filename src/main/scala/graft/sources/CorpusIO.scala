package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Corpus storage: hive-partitioned parquet layout for documents-shaped
 * tables. At 100 TB a training corpus is laid out by its coarse
 * selectors (source, language, crawl date) so that mixture queries
 * ("the English slice of source X") PRUNE whole directories instead of
 * scanning and filtering — the storage-side complement of
 * [[EdgeIO.writeBucketed]]'s shuffle-free joins. The pruning is
 * verified in `CorpusIOSpec` by asserting the scan's PartitionFilters
 * and that the pruned read touches a subset of files.
 *
 * Partition columns should be low-cardinality (each value is a
 * directory): source/lang yes, doc_id no.
 */
object CorpusIO {

  /** Write hive-partitioned by `cols` (directory per distinct value). */
  def writePartitioned(docs: DataFrame, path: String,
                       cols: Seq[String] = Seq("lang")): Unit =
    docs.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Read back; partition-column predicates prune at planning time. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

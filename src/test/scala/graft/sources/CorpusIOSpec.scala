package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusIOSpec extends SparkSpec {

  test("partitioned corpus: pruned read plans PartitionFilters and " +
      "touches only the matching directory") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "the cat", "en", "src0"), (1L, "el gato", "es", "src0"),
      (2L, "a dog", "en", "src1"), (3L, "le chien", "fr", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("corpus_io").toString
    try {
      CorpusIO.writePartitioned(docs, dir, Seq("lang"))
      // directory-per-value layout
      val langDirs = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(langDirs.toSeq == Seq("lang=en", "lang=es", "lang=fr"))

      val en = CorpusIO.read(s, dir).where(col("lang") === "en")
      // the predicate must land in PartitionFilters (planning-time prune),
      // NOT as a post-scan filter over all files
      val scan = en.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PartitionFilters") &&
        "\\(lang#\\d+ = en\\)".r.findFirstIn(scan).nonEmpty,
        s"expected partition pruning in scan:\n$scan")
      assert(en.select("doc_id").as[Long].collect().sorted.toSeq ==
        Seq(0L, 2L))

      // pruned scan reads strictly fewer files than the full scan
      def nFiles(df: org.apache.spark.sql.DataFrame): Long = {
        val fsr = df.queryExecution.executedPlan.collectLeaves()
          .collectFirst {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
                .map(_.files.size.toLong).sum
          }
        fsr.getOrElse(-1L)
      }
      val full = CorpusIO.read(s, dir)
      assert(nFiles(en) > 0 && nFiles(en) < nFiles(full),
        s"pruned=${nFiles(en)} full=${nFiles(full)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}

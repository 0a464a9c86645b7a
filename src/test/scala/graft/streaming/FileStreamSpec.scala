package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The production streaming I/O path the memory-sink twins don't
  * exercise: a file SOURCE discovered incrementally, and a parquet
  * SINK with a checkpoint that survives a stop/restart with
  * exactly-once output. Both are the deployment shape — `readStream`
  * over an arriving directory, `writeStream` + checkpointLocation —
  * driven here with local dirs and micro-batch barriers.
  */
class FileStreamSpec extends SparkSpec {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("file source: incrementally arriving parquet ≡ batch aggregate") {
    val s = spark; import s.implicits._
    val srcDir = tmp("fsrc")
    val rows = (1L to 100L).map(i => (i, s"u${i % 7}", i % 5))
    // first drop: one file present BEFORE the stream starts
    rows.take(40).toDF("event_id", "user_id", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema("event_id LONG, user_id STRING, value LONG")
      .parquet(srcDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val q = stream.writeStream.format("memory").queryName("fsrc_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // second drop: discovered by a later micro-batch
      rows.drop(40).toDF("event_id", "user_id", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("fsrc_sink")
      .select("user_id", "n", "sv").as[(String, Long, Long)]
      .collect().sorted
    val batch = rows.toDF("event_id", "user_id", "value")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .as[(String, Long, Long)].collect().sorted
    assert(streamed === batch)
  }

  test("parquet sink: checkpointed stop/restart is exactly-once") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = tmp("fout")
    val ckpt = tmp("fckpt")
    val mem = MemoryStream[(Long, String)]
    def transform =
      mem.toDF().toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          length(col("text")).cast("long").as("n_chars"))
    def start() = transform.writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val batches: Seq[Seq[(Long, String)]] =
      (0 until 4).map(b => (0 until 25).map(i =>
        (b * 25L + i, s"doc ${b}_$i body")))

    val q1 = start()
    try {
      batches.take(2).foreach { b => mem.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    // restart from the same checkpoint + the same source; the two
    // remaining batches must land exactly once — no replays of the
    // committed offsets, no gaps.
    val q2 = start()
    try {
      batches.drop(2).foreach { b => mem.addData(b); q2.processAllAvailable() }
    } finally q2.stop()

    val out = spark.read.parquet(outDir)
      .as[(Long, String, Long)].collect().sorted
    val expect = batches.flatten
      .map { case (id, t) => (id, t, t.length.toLong) }.sorted
    assert(out === expect)
  }
}

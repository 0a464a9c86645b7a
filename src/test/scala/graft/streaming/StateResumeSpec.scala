package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Stateful-query recovery: a `flatMapGroupsWithState` sessionization
  * stopped mid-stream and restarted from its checkpoint must restore
  * per-key state from the state store — sessions spanning the restart
  * keep counting instead of starting over. The sink is `foreachBatch`
  * (the memory sink refuses checkpoint recovery; foreachBatch is the
  * production recoverable sink for update-mode stateful queries),
  * collected into a batchId-keyed map so a replayed batch after
  * restart overwrites rather than duplicates. */
object StateResumeSpec {
  val sink: TrieMap[Long, Seq[(Long, Long, Long, Long)]] = TrieMap.empty
}

class StateResumeSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("flatMapGroupsWithState session state survives a checkpointed restart") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("stateckpt").toFile.getAbsolutePath
    StateResumeSpec.sink.clear()
    val mem = MemoryStream[Ev]
    def start() =
      Events.sessionizeStream(spark, mem.toDF())
        .writeStream
        .foreachBatch { (batch: Dataset[Events.SessionUpdate], id: Long) =>
          StateResumeSpec.sink.put(id, batch.collect().toSeq
            .map(u => (u.user_id, u.session_idx, u.n_events, u.last_us)))
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

    // run 1: user 1 opens session 1 with two events
    val q1 = start()
    try {
      mem.addData(Ev(0, ts(0), 1, "a", 1.0), Ev(1, ts(5), 1, "a", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRun1 = StateResumeSpec.sink.values.flatten.toSeq
    assert(afterRun1.exists(r => r._1 == 1L && r._2 == 1L && r._3 == 2L))

    // run 2 (same checkpoint + same source): a close event must EXTEND
    // session 1 to 3 events (state restored), then a 40-min gap opens
    // session 2
    val q2 = start()
    try {
      mem.addData(Ev(2, ts(10), 1, "a", 1.0))
      q2.processAllAvailable()
      val latest = StateResumeSpec.sink.toSeq.maxBy(_._1)._2
      assert(latest.contains((1L, 1L, 3L, ts(10).getTime * 1000L)),
        s"state continued across restart: $latest")
      mem.addData(Ev(3, ts(55), 1, "a", 1.0))
      q2.processAllAvailable()
      val last2 = StateResumeSpec.sink.toSeq.maxBy(_._1)._2
      assert(last2.contains((1L, 2L, 1L, ts(55).getTime * 1000L)),
        s"gap after restart opens the next session: $last2")
    } finally q2.stop()
  }
}

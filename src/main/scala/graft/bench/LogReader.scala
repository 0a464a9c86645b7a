package graft.bench

/**
 * Benchmark-checkpoint pretty-printer — the reference ships a standalone
 * `logreader` that decodes its binary LogFileFormat and prints per-run
 * times and the aggregate stat block (mpi/logreader.cc:100-123,
 * mpi/logfile.h:109-124). Same role here over [[Graph500]]'s text
 * checkpoint: per-run rows + the Graph500 stat summary.
 *
 * Usage: runMain graft.bench.LogReader <checkpoint-file>
 */
object LogReader {

  def format(runs: Seq[Graph500.RunStat]): String = {
    val sb = new StringBuilder
    sb.append(f"${"run"}%4s ${"root"}%12s ${"bfs_time"}%12s ")
    sb.append(f"${"validate"}%12s ${"nedge"}%14s ${"errors"}%7s\n")
    runs.foreach { r =>
      sb.append(f"${r.run}%4d ${r.root}%12d ${r.bfs_time}%12.6f ")
      sb.append(f"${r.validate_time}%12.6f ${r.nedge.toLong}%14d ${r.errors}%7d\n")
    }
    if (runs.nonEmpty) {
      val hm = runs.map(r => r.bfs_time / r.nedge).sum match {
        case s if s > 0 => runs.size / s
        case _ => 0.0
      }
      sb.append(f"\nruns: ${runs.size}  harmonic_mean_TEPS: $hm%.1f  ")
      sb.append(f"total_bfs: ${runs.map(_.bfs_time).sum}%.3f s  ")
      sb.append(f"total_validate: ${runs.map(_.validate_time).sum}%.3f s\n")
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: LogReader <checkpoint-file>")
    val runs = Graph500.readCheckpointAny(args(0))
    if (runs.isEmpty) println(s"no runs recorded in ${args(0)}")
    else print(format(runs))
  }
}

package graft.etl

import org.apache.spark.sql.SparkSession

/** Pre-flight scratch-volume gate for the construction sort.
  *
  * The sort+window dedup that builds the clean edge list (EdgeOps
  * .cleanEdges — the reference's sort-based duplicate merge,
  * mpi/graph_constructor.hpp) externally sorts the full raw edge
  * exchange; its TRANSIENT spill is released per-stage, so a run can
  * need far more scratch than it nets. Measured at SCALE 26 (2^26·16 =
  * 1,073,741,824 raw directed edges): peak 99% of a 252 GB volume
  * ≈ 233 B per raw edge (BASELINE.md, round 8). A run that exceeds the
  * volume dies mid-sort with an opaque disk-full IOException after
  * minutes of work — this gate fails FAST, before the exchange, with
  * the measured requirement in the message. */
object ScratchGate {

  /** Peak transient scratch per raw directed edge: measured 232.4 B at
    * SCALE 26 (peak 99% of a 252 GB volume for 2^30 raw edges) plus a
    * small margin. The margin must stay within the measured headroom —
    * a fatter constant would have REJECTED the r8 SCALE-26 run that in
    * fact completed with ~1 GB to spare. */
  val BytesPerRawEdge = 234L

  /** Estimated needs below this skip the probe entirely — test scales
    * and kernel-path runs never touch it. */
  val MinCheckedBytes = 4L << 30

  /** Peak transient scratch the construction sort needs for `nRawEdges`
    * raw directed edges. */
  def required(nRawEdges: Long): Long = nRawEdges * BytesPerRawEdge

  /** Pure core (spec'd directly): None = proceed, Some(msg) = fail with
    * msg. `freeBytes` < 0 means "could not stat the volume" — proceed
    * (never block a run on a probe failure). */
  private[graft] def verdict(nRawEdges: Long, freeBytes: Long): Option[String] = {
    val need = required(nRawEdges)
    if (nRawEdges <= 0 || need < MinCheckedBytes || freeBytes < 0) None
    else if (freeBytes >= need) None
    else Some(
      f"construction sort needs ~${need / 1e9}%.0f GB of scratch " +
        f"(${nRawEdges} raw edges x $BytesPerRawEdge B/edge, measured at " +
        f"SCALE 26) but the scratch volume has ${freeBytes / 1e9}%.0f GB " +
        "free - the external sort would fill the disk mid-stage. Free " +
        "space or point spark.local.dir at a larger volume " +
        "(set spark.graft.scratchCheck=0 to run anyway).")
  }

  /** The configured scratch roots: SPARK_LOCAL_DIRS env, else
    * spark.local.dir, else java.io.tmpdir — the same precedence Spark's
    * DiskBlockManager uses in local mode. */
  private[graft] def scratchDirs(spark: SparkSession): Seq[java.io.File] = {
    val raw = sys.env.get("SPARK_LOCAL_DIRS")
      .orElse(Option(spark.sparkContext.getConf.get("spark.local.dir", null)))
      .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
    raw.split(",").toSeq.map(_.trim).filter(_.nonEmpty).distinct
      .map(new java.io.File(_))
  }

  /** Free bytes on the scratch volume(s). A root process can write into
    * the filesystem's reserved blocks, so for root the honest capacity
    * is getFreeSpace (f_bfree) — getUsableSpace (f_bavail) excludes the
    * reservation and on a heavily-reserved volume under-reports by
    * 100+ GB (this box: 256 GB free vs 85 GB "available" to non-root).
    * Distinct dirs may share one filesystem, so space is deduplicated by
    * DEVICE identity (`unix:dev`, falling back to the FileStore's
    * name:type) — a size fingerprint would collapse two distinct
    * same-sized volumes with equal free bytes, or double-count one
    * device whose free bytes moved between stats. Dirs Spark has not
    * created yet stat their nearest existing ancestor (same volume);
    * -1 if nothing could be stat'd. */
  private[graft] def freeScratchBytes(spark: SparkSession): Long = {
    val isRoot = System.getProperty("user.name") == "root"
    @annotation.tailrec
    def existing(f: java.io.File): java.io.File =
      if (f.exists() || f.getParentFile == null) f else existing(f.getParentFile)
    val stats = scratchDirs(spark)
      .flatMap { d =>
        try {
          val f = existing(d.getAbsoluteFile)
          val key: AnyRef =
            try java.nio.file.Files.getAttribute(f.toPath, "unix:dev")
            catch {
              case _: Exception =>
                val fs = java.nio.file.Files.getFileStore(f.toPath)
                s"${fs.name}:${fs.`type`}"
            }
          val free = if (isRoot) f.getFreeSpace else f.getUsableSpace
          if (free >= 0) Some(key -> free) else None
        } catch { case _: Exception => None }
      }
    if (stats.isEmpty) -1L
    else stats.groupBy(_._1).values.map(_.head._2).sum
  }

  /** Fail fast (IllegalStateException with the measured requirement) if
    * the scratch volume cannot hold the construction sort's transient
    * spill for `nRawEdges` raw edges. No-ops on small needs, unknown
    * counts (< 0), probe failures, or `spark.graft.scratchCheck=0`. */
  def check(spark: SparkSession, nRawEdges: Long): Unit = {
    if (nRawEdges <= 0) return
    if (spark.conf.getOption("spark.graft.scratchCheck").contains("0")) return
    if (required(nRawEdges) < MinCheckedBytes) return
    verdict(nRawEdges, freeScratchBytes(spark))
      .foreach(msg => throw new IllegalStateException(msg))
  }
}

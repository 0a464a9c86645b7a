package graft.validate

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.bfs.Bfs
import graft.etl.EdgeOps

/** The local validation kernel must produce the exact counters of the
  * DataFrame validator — on valid kernel trees AND on corrupted ones
  * (null-propagation corner cases included). */
class LocalValidatorSpec extends SparkSpec {

  private def denseTreeDf(ids: Array[Long], pred: Array[Int],
                          depth: Array[Int]) = {
    val s = spark; import s.implicits._
    ids.indices.map { i =>
      (ids(i), if (pred(i) < 0) -1L else ids(pred(i)),
        if (depth(i) < 0) None else Some(depth(i).toLong))
    }.toDF("vertex", "pred", "depth")
  }

  test("local validator equals DataFrame validator on kernel trees and corruptions") {
    val s = spark; import s.implicits._
    for (seed <- 30L until 34L) {
      val rnd = new scala.util.Random(seed)
      // raw list WITH self-loops and duplicates, as the benchmark uses it
      val raw = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .toDF("src", "dst")
        .persist()
      val clean = EdgeOps.cleanEdges(raw)
      if (clean.count() > 0) {
        val g = Bfs.prepare(clean)
        try {
          val csr = g.csr
          val root = csr.ids(0)
          val (pred, depth, _) = csr.bfs(root)
          val lv = new LocalValidator(csr.ids, raw)
          val maxV = raw.agg(max(greatest(col("src"), col("dst"))))
            .head().getLong(0)

          def compare(p: Array[Int], d: Array[Int], label: String): Unit = {
            val local = lv.validate(p, d, 0, maxV + 1)
            // force the relational plan — Validator.validate itself now
            // routes small inputs to this kernel, which would make the
            // comparison vacuous
            spark.conf.set("spark.graft.localBfsMaxEdges", "0")
            val row = try Validator.validate(spark, raw,
              denseTreeDf(csr.ids, p, d), root, maxV + 1).head()
            finally spark.conf.unset("spark.graft.localBfsMaxEdges")
            val df = (0 until row.length).map(row.getLong)
            assert(local.toSeq === df, s"seed=$seed $label: $local vs $df")
            // and the gated entry point must agree with both, whichever
            // path it picks (kernel for dense-mappable trees, relational
            // fallback for corrupted ones)
            val gatedRow = Validator.validate(spark, raw,
              denseTreeDf(csr.ids, p, d), root, maxV + 1).head()
            val gated = (0 until gatedRow.length).map(gatedRow.getLong)
            assert(gated === df, s"seed=$seed $label gated: $gated vs $df")
          }

          compare(pred, depth, "valid tree")

          // corruption 1: wrong depth on a reached non-root vertex
          if (csr.nVerts > 2 && depth(1) >= 0) {
            val d2 = depth.clone(); d2(1) = d2(1) + 5
            compare(pred, d2, "wrong depth")
          }
          // corruption 2: self-parent + presence mismatch
          if (csr.nVerts > 3) {
            val p2 = pred.clone(); p2(2) = 2
            val d3 = depth.clone(); d3(3) = -1
            compare(p2, depth, "self parent")
            compare(pred, d3, "presence mismatch")
          }
          // corruption 3: pred edge that does not exist in raw
          if (csr.nVerts > 4 && pred(4) >= 0) {
            val p3 = pred.clone()
            // point 4 at a non-neighbor (itself+? use vertex 0 unless adjacent)
            val nonNbr = (0 until csr.nVerts).find { c =>
              c != 4 && !(csr.rowStarts(4) until csr.rowStarts(5))
                .exists(k => csr.nbrs(k) == c)
            }
            nonNbr.foreach { c => p3(4) = c; compare(p3, depth, "missing pred edge") }
          }
        } finally g.unpersist()
      }
      raw.unpersist()
    }
  }

  test("gated validate falls back for preds outside the vertex universe") {
    val s = spark; import s.implicits._
    val raw = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    // pred(2) = 99 is in [−1, nGlobalVerts) numerically impossible to
    // dense-map — the kernel must decline and the relational plan count it
    val tree = Seq((0L, 0L, Some(0L)), (1L, 0L, Some(1L)), (2L, 99L, Some(1L)))
      .toDF("vertex", "pred", "depth")
    val gated = Validator.validate(spark, raw, tree, 0L, 100L).head()
    spark.conf.set("spark.graft.localBfsMaxEdges", "0")
    val dist = try Validator.validate(spark, raw, tree, 0L, 100L).head()
    finally spark.conf.unset("spark.graft.localBfsMaxEdges")
    assert((0 until gated.length).map(gated.getLong) ===
      (0 until dist.length).map(dist.getLong))
    // the bogus pred shows up as chain + missing-edge errors either way
    assert(gated.getLong(4) === 1L && gated.getLong(5) === 1L)
  }
}

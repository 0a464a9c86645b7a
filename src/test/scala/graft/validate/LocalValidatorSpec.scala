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
            val row = Validator.validate(spark, raw, denseTreeDf(csr.ids, p, d),
              root, maxV + 1).head()
            val df = (0 until row.length).map(row.getLong)
            assert(local.toSeq === df, s"seed=$seed $label: $local vs $df")
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
}

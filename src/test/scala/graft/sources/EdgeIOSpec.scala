package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.etl.EdgeOps

class EdgeIOSpec extends SparkSpec {

  test("parquet and csv roundtrip") {
    val clean = EdgeOps.cleanEdges(
      graft.gen.Kronecker.generate(spark, 8))
    val dir = java.nio.file.Files.createTempDirectory("edgeio").toString
    EdgeIO.writeParquet(clean, s"$dir/p")
    assert(EdgeIO.readParquet(spark, s"$dir/p").count() === clean.count())
    EdgeIO.writeCsv(clean, s"$dir/c")
    val csv = EdgeIO.readCsv(spark, s"$dir/c")
    assert(csv.count() === clean.count())
    assert(csv.agg(sum("src")).head().getLong(0) ===
      clean.agg(sum("src")).head().getLong(0))
  }

  test("orc and json roundtrip") {
    val clean = EdgeOps.cleanEdges(graft.gen.Kronecker.generate(spark, 8))
    val dir = java.nio.file.Files.createTempDirectory("edgeio2").toString
    EdgeIO.writeOrc(clean, s"$dir/o")
    assert(EdgeIO.readOrc(spark, s"$dir/o").count() === clean.count())
    EdgeIO.writeJson(clean, s"$dir/j")
    val json = EdgeIO.readJson(spark, s"$dir/j")
    assert(json.count() === clean.count())
    assert(json.agg(sum("dst")).head().getLong(0) ===
      clean.agg(sum("dst")).head().getLong(0))
  }

  test("bucketed table: aggregation on src runs without a shuffle") {
    val clean = EdgeOps.cleanEdges(graft.gen.Kronecker.generate(spark, 8))
    EdgeIO.writeBucketed(clean, "edges_bucketed_spec", nBuckets = 4)
    try {
      val reloaded = EdgeIO.readBucketed(spark, "edges_bucketed_spec")
      assert(reloaded.count() === clean.count())
      val agg = reloaded.groupBy("src").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation should be shuffle-free:\n$plan")
      // and the values match the unbucketed computation
      val a = agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val b = clean.groupBy("src").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(a === b)
    } finally spark.sql("DROP TABLE IF EXISTS edges_bucketed_spec")
  }
}

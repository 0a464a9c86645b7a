package graft

/** The driver contract itself: `entry` smoke-checks, every oracle key
  * names a real query, and every query runs end-to-end on the smallest
  * test tier. Value-level correctness is the DuckDB oracle's job
  * (graft.Verify + tools/check.py); this spec guards the WIRING the
  * driver depends on. */
class ContractSpec extends SparkSpec {

  test("entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key names a query") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(q)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every query runs on sf0.001 and keeps stable column names") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name) // executes the full plan
    }
  }
}

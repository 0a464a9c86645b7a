package graft.ops

import graft.SparkSpec

class OrderStatsSpec extends SparkSpec {

  test("selectRanks matches a local per-key sort, duplicates included") {
    val rnd = new scala.util.Random(42)
    val data = Seq.tabulate(500)(_ =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(50).toLong))
    val rdd = spark.sparkContext.parallelize(data, 7)
    // n/2 == (n-1)/2 for odd n: the duplicated rank must emit twice
    val targets: Long => Seq[Long] =
      n => Seq(0L, (n - 1) / 2, n / 2, n - 1)
    val got = OrderStats.selectRanks[Long](spark, rdd, targets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val exp = data.groupBy(_._1).toSeq.flatMap { case (k, vs) =>
      val sortedVs = vs.map(_._2).sorted
      targets(sortedVs.length.toLong)
        .map(r => (k, r, sortedVs(r.toInt)))
    }.sorted
    assert(got == exp)
  }

  test("selectRanks on a single-key input spans partitions, stays exact") {
    val data = (0L until 1000L).reverse.map(v => ("only", v))
    val rdd = spark.sparkContext.parallelize(data, 13)
    val got = OrderStats.selectRanks[Long](spark, rdd,
        n => Seq(0L, n / 4, n / 2, n - 1))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((0L, 0L), (250L, 250L), (500L, 500L), (999L, 999L)))
  }

  test("selectRanks handles empty input") {
    val rdd = spark.sparkContext
      .parallelize(Seq.empty[(String, Long)], 2)
    assert(OrderStats.selectRanks[Long](spark, rdd, n => Seq(0L))
      .collect().isEmpty)
  }
}

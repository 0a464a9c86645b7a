package graft.bench

import org.apache.spark.sql.SparkSession
import graft.bfs.{Bfs, LocalCsr}
import graft.gen.Kronecker

/** Throwaway construction profiler (dev tool). */
object Profile {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  /** `runMain graft.bench.Profile queries <sfDir> <q1,q2,...>`: run each
    * named SparkEntry query 3× and print per-iteration times —
    * steady-state vs first-touch attribution. */
  def profileQueries(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = if (args.length > 2) args(2).split(",").toSeq
      else Seq("ev_sessions", "ev_window", "ev_topusers", "cc_components",
        "dd_ngram", "dd_minhash", "dd_simhash", "q10_level_sizes")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_FORCE_DISTRIBUTED", "0") == "1")
      graft.Gates.forceDistributed(spark)
    for (n <- names; i <- 1 to 3)
      t(s"$n#$i")(graft.SparkEntry.queries(n)(spark, sfDir).count())
    spark.stop()
  }

  /** `runMain graft.bench.Profile triangles <sfDir>`: stage breakdown of
    * the co-purchase triangle count (join+collect vs CSR build vs
    * kernel). */
  def profileTriangles(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_FORCE_DISTRIBUTED", "0") == "1")
      graft.Gates.forceDistributed(spark)
    import org.apache.spark.sql.functions.col
    for (i <- 1 to 3) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      val flat = t(s"#$i join+collectPairs")(LocalCsr.collectPairs(pairs))
      println(s"    pairs = ${flat.length / 2}")
      val csr = t(s"#$i buildFromRawPairs")(LocalCsr.buildFromRawPairs(flat))
      val (w, tr) = t(s"#$i countCsr")(graft.bfs.Triangles.countCsr(csr))
      println(s"    wedges=$w triangles=$tr")
    }
    spark.stop()
  }

  /** `runMain graft.bench.Profile relscale [sfDir] [K]`: the heaviest
    * relational plans on a K×-replicated lineitem (key-shifted copies,
    * so group/join cardinalities scale with the data) — scale-smoke
    * evidence that the shapes hold past the provided tiers, not a
    * correctness tier (oracles stay at sf0.01). */
  def profileRelScale(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val k = if (args.length > 2) args(2).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val maxOk = li0.agg(max(col("l_orderkey"))).head().getLong(0) + 1
    val li = li0
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOk)
      .drop("rep")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t(s"materialize ${k}x lineitem")(li.count())
    println(s"    rows = $n")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    // orders replicated the same way so the fact-fact joins scale too
    val maxOk2 = maxOk
    val ordK = ord.crossJoin(spark.range(k).select(col("id").as("rep")))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOk2)
      .drop("rep")
    for (i <- 1 to 2) {
      t(s"#$i rel_pricing")(graft.ops.Relational
        .pricingSummary(li, "1998-09-02").count())
      t(s"#$i rel_toporders")(graft.ops.Relational
        .topOrdersPerSegment(li, ordK, cust, 10).count())
      t(s"#$i rel_latesupplier")(graft.ops.Relational
        .lateSuppliers(li, ordK, supp, "F", 100).count())
      t(s"#$i rel_colprofile")(graft.ops.Relational
        .columnProfile(li,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .count())
      t(s"#$i rel_smallqty")(graft.ops.Relational
        .smallQuantityRevenue(li, part, "Brand#3", 1, 5).count())
    }
    li.unpersist()
    spark.stop()
  }

  /** `runMain graft.bench.Profile batched [scale]`: per-run times inside
    * the batched kernel loop vs the sequential protocol's interleaved
    * bfs/validate pattern — attributes the batched-throughput gap. */
  def profileBatched(args: Array[String]): Unit = {
    val scale = if (args.length > 1) args(1).toInt else 18
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Kronecker.generate(spark, scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRaw = raw.count()
    val g = Bfs.prepareRaw(raw, knownCount = nRaw)
    val csr = g.csr
    val roots = Kronecker.sampleRoots(16, csr.ids.last + 1,
      v => java.util.Arrays.binarySearch(csr.ids, v) >= 0)
    // warm-up (PRE_EXEC)
    val w0 = System.nanoTime()
    var wi = 0
    while (wi < 8 && System.nanoTime() - w0 < 1000000000L) {
      csr.bfs(roots.head); wi += 1
    }
    System.gc()
    for (round <- 1 to 3) {
      println(s"== round $round ==")
      // batched shape: back-to-back, hold all outputs
      val b0 = System.nanoTime()
      val times = roots.map { r =>
        val t0 = System.nanoTime()
        val out = csr.bfs(r)
        ((System.nanoTime() - t0) / 1e6, out)
      }
      val bw = (System.nanoTime() - b0) / 1e9
      println(f"  batched wall $bw%.3f s; per-run ms: " +
        times.map(t => f"${t._1}%.1f").mkString(" "))
      // sequential-protocol shape: drop output each run, System.gc between
      val s0 = System.nanoTime()
      val times2 = roots.map { r =>
        val t0 = System.nanoTime()
        csr.bfs(r)
        (System.nanoTime() - t0) / 1e6
      }
      val sw = (System.nanoTime() - s0) / 1e9
      println(f"  drop-out  wall $sw%.3f s; per-run ms: " +
        times2.map(t => f"$t%.1f").mkString(" "))
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("queries")) { profileQueries(args); return }
    if (args.headOption.contains("triangles")) { profileTriangles(args); return }
    if (args.headOption.contains("batched")) { profileBatched(args); return }
    if (args.headOption.contains("relscale")) { profileRelScale(args); return }
    val scale = if (args.nonEmpty) args(0).toInt else 18
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_FORCE_DISTRIBUTED", "0") == "1")
      graft.Gates.forceDistributed(spark)

    // ---- graph500 construction at SCALE ----
    for (round <- 1 to 3) {
      println(s"== scale $scale round $round ==")
      val raw = t("generate+persist+count") {
        val r = Kronecker.generate(spark, scale)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.count()
        r
      }
      val nRaw = t("count-cached")(raw.count())
      val flat = t("collectPairs")(LocalCsr.collectPairs(raw))
      println(s"  nRaw=$nRaw flatLen=${flat.length}")
      val csr = t("buildFromRawPairs")(LocalCsr.buildFromRawPairs(flat))
      println(s"  nV=${csr.nVerts} nE=${csr.nbrs.length}")
      val g = t("prepareRaw-total")(Bfs.prepareRaw(raw))
      t("first-bfs")(g.csr.bfs(csr.ids(0)))
      raw.unpersist(blocking = true)
      g.unpersist()
    }

    // ---- sf0.1 handle build ----
    for (round <- 1 to 3) {
      println(s"== sf0.1 handle round $round ==")
      val raw2 = t("rawEdges(sf0.1)") {
        graft.etl.EdgeOps.edgesFromLineitem(spark, "/root/testdata/sf0.1")
      }
      val n2 = t("raw.count")(raw2.count())
      println(s"  nRaw=$n2")
      val flat2 = t("collectPairs")(LocalCsr.collectPairs(raw2))
      val csr2 = t("buildFromRawPairs")(LocalCsr.buildFromRawPairs(flat2))
      val (g2, root) = t("prepareRawWithRoot")(Bfs.prepareRawWithRoot(raw2))
      t("bfsMinParentWithArrays")(Bfs.bfsMinParentWithArrays(spark, g2, root))
      println(s"  nV=${csr2.nVerts}")
      g2.unpersist()
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: per-step timing of a query's pipeline. Not part of the
  * library surface. */
object Prof {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm at sf0.001
    SparkEntry.queries("q8_validate")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("q10_level_sizes")(spark, "/root/testdata/sf0.001").count()
    val raw = graft.etl.EdgeOps.edgesFromLineitem(spark, dir)
    t("raw count")(raw.count())
    t("raw count again")(raw.count())
    val root = t("rootOf")(raw.agg(min(col("src"))).head().getLong(0))
    val clean = t("cleanEdges+ckpt")(graft.etl.EdgeOps.cleanEdges(raw).localCheckpoint(true))
    val maxV = t("maxV agg")(clean.agg(max(greatest(col("src"), col("dst")))).head().getLong(0))
    val noLoops = raw.filter(col("src") =!= col("dst"))
    val sym = noLoops.union(noLoops.select(col("dst").as("src"), col("src").as("dst")))
    def collectChunks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("src"), col("dst")).queryExecution.toRdd.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator.single(b.result())
      }.collect()
    t("collect sym #1")(collectChunks(sym))
    t("collect sym #2")(collectChunks(sym))
    t("collect raw #1")(collectChunks(raw))
    val csr0 = t("LocalCsr.build(sym)")(graft.bfs.LocalCsr.build(sym, dedupAdjacent = true))
    val csr1 = t("LocalCsr.build(sym) #2")(graft.bfs.LocalCsr.build(sym, dedupAdjacent = true))
    t("csr.bfs")(csr0.bfs(root))
    val g = t("prepareRaw")(graft.bfs.Bfs.prepareRaw(raw))
    val r0 = t("bfsMinParent over g")(graft.bfs.Bfs.bfsMinParent(spark, g, root))
    val tree = t("tree ckpt")(r0.tree.localCheckpoint(true))
    t("clean count (g.edges)")(g.unpersist())
    t("levelSizes")(graft.bfs.Bfs.levelSizes(tree).count())
    t("validate gated")(graft.validate.Validator.validate(spark, raw, tree, root, maxV + 1).count())
    t("validate gated 2nd")(graft.validate.Validator.validate(spark, raw, tree, root, maxV + 1).count())
    t("tree collect")(tree.collect())
    t("q6 distinct collect")(clean.select("src").distinct().collect())
    // dd kernels
    val docsDf = spark.read.parquet(dir + "/documents.parquet")
    t("docs count probe")(docsDf.select("doc_id").count())
    val rows0 = t("docs collect")(docsDf.select(col("doc_id"), col("text")).collect())
    val ids = rows0.map(_.getLong(0)); val texts = rows0.map(_.getString(1))
    t("simhashSigs")(graft.ops.LocalDedup.simhashSigs(ids, texts))
    t("simhashSigs #2")(graft.ops.LocalDedup.simhashSigs(ids, texts))
    val sp = t("simhashPairs")(graft.ops.LocalDedup.simhashPairs(ids, texts, 3))
    println(s"[prof]   simhash pairs = ${sp.size}")
    locally { import spark.implicits._
      t("simhash toDF count")(sp.toDF("doc_a","doc_b","hamming").count()) }
    t("shingleIndex #1")(graft.ops.LocalDedup.buildIndex(texts))
    val six = t("shingleIndex #2")(graft.ops.LocalDedup.buildIndex(texts))
    println(s"[prof]   nShingles=" + six.nShingles)
    t("ngramPairs #0")(graft.ops.LocalDedup.ngramJaccardPairs(ids, texts, 0.5))
    val np = t("ngramPairs")(graft.ops.LocalDedup.ngramJaccardPairs(ids, texts, 0.5))
    println(s"[prof]   ngram pairs = ${np.size}")
    val mp = t("minhashPairs")(graft.ops.LocalDedup.minhashPairs(ids, texts, 0.5))
    println(s"[prof]   minhash pairs = ${mp.size}")
    t("full dd_simhash query")(graft.ops.Dedup.simhashDedup(docsDf, 3).count())
    t("full dd_ngram query")(graft.ops.Dedup.ngramJaccardDedup(docsDf, 0.5).count())
    spark.stop()
  }
}

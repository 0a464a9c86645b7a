package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Seeded-random fuzz of the hybrid kernels against their distributed
  * twins on ADVERSARIAL text/event corpora — unicode, CJK, NBSP, tabs,
  * newlines, zero-width joiners, empty and whitespace-only documents,
  * exact duplicates. The fixed-fixture equality specs prove the happy
  * paths; this one hunts tokenization/hashing/rounding divergence.
  * Every failure prints its seed. */
class KernelFuzzSpec extends SparkSpec {

  private val alphabets = Array(
    "the quick brown fox and dog cat runs over lazy".split(" ").toSeq,
    Seq("el", "la", "de", "que", "los", "perro", "gato"),
    Seq("汉字", "测试", "数据", "引擎"),
    Seq("a", "b", " ", "‍", "µ", "✓", "word-with-dash", "x1"),
    Seq("")) // empty token source → whitespace-only runs

  private val seps = Array(" ", "  ", "\t", "\n", " \t ", "")

  private def randomDoc(rnd: scala.util.Random): String = {
    val alpha = alphabets(rnd.nextInt(alphabets.length))
    val n = rnd.nextInt(12)
    val body = Seq.fill(n)(alpha(rnd.nextInt(alpha.size)))
      .mkString(seps(rnd.nextInt(seps.length)))
    // random leading/trailing junk: spaces trim, tabs must NOT
    (if (rnd.nextBoolean()) "  " else "\t") + body +
      (if (rnd.nextBoolean()) " " else "\n")
  }

  private def corpus(seed: Long, nDocs: Int): DataFrame = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    val base = Seq.tabulate(nDocs)(i => (i.toLong, randomDoc(rnd)))
    // force exact duplicates so LSH buckets and hamming-0 pairs exist
    val rows = base.map { case (i, t) =>
      if (i % 5 == 4) (i, base((i - 1).toInt)._2) else (i, t)
    }
    rows.toDF("doc_id", "text")
  }

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  private def bothWays(gateConf: String)(q: => DataFrame)
      : (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    spark.conf.unset(gateConf)
    val local = sorted(q)
    spark.conf.set(gateConf, "0")
    val dist = try sorted(q)
    finally spark.conf.unset(gateConf)
    (local, dist)
  }

  test("dedup kernels ≡ distributed on adversarial corpora (8 seeds)") {
    for (seed <- 0L until 8L) {
      val docs = corpus(seed, 40).persist()
      try {
        for ((name, q) <- Seq[(String, () => DataFrame)](
          ("minhash", () => Dedup.minhashDedup(docs, 0.4)),
          ("ngram", () => Dedup.ngramJaccardDedup(docs, 0.4)),
          ("simhash_sig", () => Dedup.simhash(docs)),
          ("simhash", () => Dedup.simhashDedup(docs, 5)))) {
          val (l, d) = bothWays("spark.graft.localDedupMaxDocs")(q())
          assert(l === d, s"seed=$seed $name")
        }
      } finally docs.unpersist()
    }
  }

  test("tokens/shingles primitives ≡ column expressions on raw strings") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7L)
    val strings = Seq.fill(200)(randomDoc(rnd)) ++
      Seq("", " ", "\t", " ", "a b", " x ", "\na\n")
    val df = strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").persist()
    try {
      val sparkTokens = TextOps.tokenized(df).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
      strings.zipWithIndex.foreach { case (t, i) =>
        assert(LocalDedup.tokens(t).toList === sparkTokens(i.toLong),
          s"tokens #$i ${t.map(_.toInt)}")
      }
      val sparkShingles = TextOps.shingles(df, 3).collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      strings.zipWithIndex.foreach { case (t, i) =>
        val local = LocalDedup.shingleStrings(LocalDedup.tokens(t)).toSet
        assert(local === sparkShingles.getOrElse(i.toLong, Set.empty),
          s"shingles #$i ${t.map(_.toInt)}")
      }
    } finally df.unpersist()
  }

  test("events kernels ≡ distributed on random streams (8 seeds)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- 0L until 8L) {
      val rnd = new scala.util.Random(seed)
      val ev = Seq.tabulate(300) { i =>
        (i.toLong,
          rnd.nextLong(6L * 3600 * 1000000), // µs within 6 hours
          (rnd.nextInt(5) + 1).toLong,
          Seq("click", "view", "buy")(rnd.nextInt(3)),
          math.round(rnd.nextDouble() * 10000) / 100.0)
      }.toDF("event_id", "us", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
        .persist()
      try {
        for ((name, q) <- Seq[(String, () => DataFrame)](
          ("window", () => graft.streaming.Events.windowedCounts(ev)),
          ("sessions", () => graft.streaming.Events.sessionize(ev)),
          ("topusers", () => graft.streaming.Events.topUsers(ev, 3)))) {
          val (l, d) = bothWays("spark.graft.localEventsMaxRows")(q())
          assert(l === d, s"seed=$seed $name")
        }
      } finally ev.unpersist()
    }
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/**
 * Similarity search over an embedding column (`ARRAY<FLOAT>`).
 *
 * Two paths, same result contract `(query_id, neighbor_id, rank, cosine)`:
 *
 *  - [[bruteForceTopK]]: exact baseline. The (small) query set is
 *    broadcast; the corpus streams through map-side scoring — the only
 *    shuffle is the final per-query top-k, whose input is already
 *    O(queries × corpus) scored rows, never materialized vectors.
 *  - [[ivfTopK]]: the scale path. Corpus vectors are bucketed to their
 *    nearest centroid (IVF cell); a query probes only `nProbe` cells, so
 *    exact scoring touches ~nProbe/nCells of the corpus. Centroids here
 *    are a deterministic stand-in (first `nCentroids` vectors) for a
 *    k-means "training" step — the bucketing/probing plumbing is the
 *    real, tested part.
 *
 * All dot products are sequential index-order folds over doubles
 * (`zip_with` + `aggregate`), bit-identical to DuckDB's
 * `list_dot_product` over `DOUBLE[]` — so cosine scores are
 * hash-comparable against the SQL oracle.
 */
object Similarity {

  /** Sequential-fold dot product of two ARRAY<DOUBLE> columns — native
    * codegen'd expression (graft.functions.ArrayDotProduct); identical
    * result bits to the `aggregate(zip_with(...))` fold it replaces. */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayDotProduct.dot(a, b)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** (vec_id, v ARRAY<DOUBLE>, nrm) from an embeddings-shaped table. */
  def withNorm(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", l2norm(col("v")))

  private def cosine(av: Column, an: Column, bv: Column, bn: Column): Column =
    round(dot(av, bv) / (an * bn), 6)

  /** Hybrid-executor gate: corpora at or under this many vectors run on
    * the driver-local [[LocalSimilarity]] kernels (identical output —
    * LocalSimilaritySpec); larger corpora take the distributed pipelines.
    * Override with `spark.graft.localAnnMaxVecs` (0 = always
    * distributed). */
  val LocalAnnDefaultMaxVecs = 100000L

  /** Collected corpora keyed weakly on the DataFrame instance — the ANN
    * and embedding-dedup kernels share the per-dir cached embeddings
    * table; identity hits skip the count probe and collect (immutable
    * DataFrames ⇒ never stale; gate re-checked against the cached size). */
  private val corpusCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, LocalSimilarity.Corpus]())

  private[ops] def localCorpus(embeddings: DataFrame): Option[LocalSimilarity.Corpus] = {
    if (embeddings.isStreaming) return None
    val spark = embeddings.sparkSession
    val gate = spark.conf.getOption("spark.graft.localAnnMaxVecs")
      .map(_.toLong).getOrElse(LocalAnnDefaultMaxVecs)
    if (gate <= 0) return None
    val cached = corpusCache.get(embeddings)
    if (cached != null)
      return if (cached.size <= gate) Some(cached) else None
    if (embeddings.select("vec_id").count() > gate) None
    else {
      val rows = embeddings.select(col("vec_id"), col("embedding")).collect()
      val ids = rows.map(_.getLong(0))
      // float→double per element, exactly the transform(...cast) column
      val vecs = rows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
      val c = new LocalSimilarity.Corpus(ids, vecs)
      corpusCache.put(embeddings, c)
      Some(c)
    }
  }

  private def shipTopK(spark: org.apache.spark.sql.SparkSession,
                       rows: Seq[(Long, Long, Long, Double)]): DataFrame =
    graft.functions.Ship.df(spark,
      "query_id" -> rows.map(_._1).toArray,
      "neighbor_id" -> rows.map(_._2).toArray,
      "rank" -> rows.map(_._3).toArray,
      "cosine" -> rows.map(_._4).toArray)

  /** Exact cosine top-k: queries = vectors with vec_id < nQueries. */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5,
                     nQueries: Int = 10): DataFrame = localCorpus(embeddings) match {
    case Some(c) => shipTopK(embeddings.sparkSession,
      LocalSimilarity.bruteForceTopK(c, k, nQueries))
    case None =>
    val n = withNorm(embeddings)
    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = n
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
    topK(scored, k)
  }

  /** k-NN graph: the top-k cosine neighbors of EVERY corpus vector —
    * the adjacency list SemDeDup, label propagation over embeddings,
    * and kNN-classifier features all start from.
    *
    * Strategy (the [[graft.ops.Dedup.EmbeddingBlockLimit]] convention —
    * two DISTRIBUTED strategies, not a driver-kernel gate): corpora at
    * or under `spark.graft.embeddingBlockMaxVecs` take the exact
    * broadcast-block path — the corpus ships once as a broadcast of
    * primitive vectors and every partition scores its rows against it
    * in a narrow map with a per-row bounded heap (zero shuffles; the
    * same arithmetic as the kernel, so exact). Larger corpora take the
    * hyperplane-LSH path: banded sign-bit candidates (an equi-join on
    * the band key, never all-pairs), exact scoring of candidates only,
    * then the bounded-heap [[topK]] — approximate for genuinely
    * far-apart "neighbors" (exact all-pairs kNN is O(n²) by
    * definition; at retrieval scale you accept LSH/IVF recall, the
    * documented tradeoff of every ANN engine). Under the hybrid gate
    * the driver kernel computes the identical exact graph. */
  def knnGraph(embeddings: DataFrame, k: Int = 3): DataFrame =
    localCorpus(embeddings) match {
      case Some(c) => shipTopK(embeddings.sparkSession,
        LocalSimilarity.knnGraph(c, k))
      case None =>
        val spark = embeddings.sparkSession
        val blockLimit = spark.conf
          .getOption("spark.graft.embeddingBlockMaxVecs")
          .map(_.toLong).getOrElse(Dedup.EmbeddingBlockLimit)
        if (blockLimit > 0 &&
          embeddings.select("vec_id").count() <= blockLimit)
          topKBroadcastBlock(embeddings, embeddings, k)
        else knnGraphLsh(embeddings, k)
    }

  /** The above-block-limit kNN path: hyperplane-LSH band keys →
    * band-key equi-join candidates (both directions — every vector
    * collects its own neighbor list) → exact cosine on candidates only
    * → bounded-heap top-k. */
  private def knnGraphLsh(embeddings: DataFrame, k: Int): DataFrame = {
    val bandKeys = udf((v: Seq[Double]) =>
      Dedup.hyperplaneBandKeys(v).toSeq)
    val keyed = withNorm(embeddings)
      .select(col("vec_id"), col("v"), col("nrm"),
        explode(bandKeys(col("v"))).as("bk"))
    val a = keyed.select(col("bk"), col("vec_id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn"))
    val b = keyed.select(col("bk"), col("vec_id").as("neighbor_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val scored = a.join(b, Seq("bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
      .distinct()
    topK(scored, k)
  }

  /** IVF(-flat) approximate top-k. Probing is by query-to-centroid
    * cosine; candidates are scored exactly within probed cells.
    *
    * `nIter = 0` (the oracle-checked default) uses the deterministic
    * stand-in centroids — the first `nCentroids` corpus vectors by id.
    * `nIter > 0` trains centroids with [[trainCentroids]] (sampled
    * spherical k-means, deterministic) and probes against them; output
    * contract is identical, recall is measured against
    * [[bruteForceTopK]] in LocalSimilaritySpec. */
  def ivfTopK(embeddings: DataFrame, k: Int = 5, nQueries: Int = 10,
              nCentroids: Int = 16, nProbe: Int = 4,
              nIter: Int = 0): DataFrame = {
    if (nIter > 0)
      return ivfTopKWithTrained(embeddings,
        trainCentroids(embeddings, nCentroids, nIter), k, nQueries, nProbe)
    localCorpus(embeddings) match {
      case Some(c) => shipTopK(embeddings.sparkSession,
        LocalSimilarity.ivfTopK(c, k, nQueries, nCentroids, nProbe))
      case None =>
        val n = withNorm(embeddings)
        val cent = broadcast(
          n.filter(col("vec_id") < nCentroids)
            .select(col("vec_id").as("centroid_id"), col("v").as("cv"),
              col("nrm").as("cn")))
        ivfTopKDistributed(n, cent, k, nQueries, nProbe)
    }
  }

  /** The IVF pipeline against an explicit trained centroid set (what
    * [[ivfTopK]] with `nIter > 0` dispatches to). Public so a caller
    * can train once ([[trainCentroids]] is deterministic), keep the
    * centroids — e.g. to hand them to an external oracle as a side
    * table — and serve against them. */
  def ivfTopKWithTrained(embeddings: DataFrame, cents: Array[Array[Double]],
                         k: Int = 5, nQueries: Int = 10,
                         nProbe: Int = 4): DataFrame =
    localCorpus(embeddings) match {
      case Some(c) => shipTopK(embeddings.sparkSession,
        LocalSimilarity.ivfTopKWithCentroids(c, cents, k, nQueries, nProbe))
      case None =>
        val spark = embeddings.sparkSession
        import spark.implicits._
        // tiny (nCentroids rows): a LocalRelation is fine, it is
        // broadcast into every consumer anyway
        val centDf = cents.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toSeq
          .toDF("centroid_id", "cv")
          .select(col("centroid_id"), col("cv"), l2norm(col("cv")).as("cn"))
        ivfTopKDistributed(withNorm(embeddings), broadcast(centDf),
          k, nQueries, nProbe)
    }

  /** ANN recall evaluation — the metric every approximate index is
    * judged by before it replaces an exact scan: per query, how many of
    * the exact top-k neighbors the approximate result recovered.
    * `approx`/`exact` are any two (query_id, neighbor_id, …) top-k
    * tables (e.g. [[ivfTopK]] vs [[bruteForceTopK]]).
    *
    * Scale shape: a (query, neighbor)-keyed left-semi probe of the
    * exact table against the approximate one, then one partial-agg'd
    * groupBy per side — every join/agg keyed on query_id, exchanges
    * carry O(k) rows per query. Output: (query_id, n_hit, n_exact,
    * recall 6-dp). */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select("query_id", "neighbor_id")
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_exact"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact"), 6).as("recall"))
  }

  /** Deterministic sampled spherical k-means: Lloyd's iterations on the
    * first `sampleSize` corpus vectors by id (a distributed top-S — the
    * corpus itself is never collected), initialized from the stand-in
    * (first `nCentroids` sample vectors), assignment by (cosine desc,
    * centroid index asc), update = element-wise mean (empty cells keep
    * their previous centroid). No RNG at all, so results are
    * reproducible across partitionings and runs — the determinism
    * contract every operator here carries. Returns centroid vectors
    * indexed 0..nCentroids-1. */
  def trainCentroids(embeddings: DataFrame, nCentroids: Int, nIter: Int,
                     sampleSize: Int = 4096): Array[Array[Double]] = {
    val sample = withNorm(embeddings)
      .orderBy(col("vec_id")).limit(sampleSize)
      .select(col("v"), col("nrm"))
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    if (sample.isEmpty) return Array.empty
    var cents = sample.take(nCentroids).map(_._1.clone())
    var it = 0
    while (it < nIter) {
      val cnrm = cents.map(v => math.sqrt(LocalSimilarity.dot(v, v)))
      val dims = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dims))
      val counts = new Array[Long](cents.length)
      sample.foreach { case (v, nrm) =>
        var best = 0
        var bestCos = Double.NegativeInfinity
        var ci = 0
        while (ci < cents.length) {
          val cos = LocalSimilarity.dot(v, cents(ci)) / (nrm * cnrm(ci))
          if (cos > bestCos) { bestCos = cos; best = ci }
          ci += 1
        }
        val s = sums(best)
        var d = 0
        while (d < dims) { s(d) += v(d); d += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map { ci =>
        if (counts(ci) == 0) cents(ci)
        else sums(ci).map(_ / counts(ci))
      }.toArray
      it += 1
    }
    cents
  }

  /** The IVF assignment/probe/score pipeline against an explicit (tiny,
    * broadcast) centroid table (centroid_id, cv, cn). */
  private def ivfTopKDistributed(n: DataFrame, cent: DataFrame, k: Int,
                                 nQueries: Int, nProbe: Int): DataFrame = {
    // cell assignment: nearest centroid per corpus vector (map-side vs
    // broadcast centroids; rank-1 window keyed by vec_id — at scale this
    // is argmax via a partial-aggregable max_by, kept as window here for
    // oracle-identical tie-breaking).
    val assign = n.crossJoin(cent)
      .select(col("vec_id"), col("centroid_id"),
        cosine(col("v"), col("nrm"), col("cv"), col("cn")).as("cc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cc").desc, col("centroid_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))

    // query probes: nProbe nearest cells per query
    val probes = n.filter(col("vec_id") < nQueries).crossJoin(cent)
      .select(col("vec_id").as("query_id"), col("centroid_id"),
        cosine(col("v"), col("nrm"), col("cv"), col("cn")).as("cc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cc").desc, col("centroid_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("centroid_id"))

    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = n
      .select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
        col("nrm").as("nn"))
      .join(assign.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(broadcast(probes), "centroid_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("qn"), col("nv"), col("nn")).as("cosine"))
    topK(scored, k)
  }

  /** STREAMING-safe ANN serving: score each incoming query row against
    * a static corpus and emit its top-k. Two paths behind the
    * [[graft.ops.Dedup.EmbeddingBlockLimit]] strategy switch (the
    * `spark.graft.embeddingBlockMaxVecs` convention — two DISTRIBUTED
    * strategies, not a driver-kernel gate):
    *
    *  - corpora at or under the limit take [[topKBroadcastBlock]]: the
    *    corpus ships once as a broadcast of primitive vectors and every
    *    query row scores against it map-side — stateless, shuffle-free,
    *    EXACT, output ≡ [[bruteForceTopK]] restricted to the same
    *    query rows;
    *  - larger corpora NEVER collect to the driver (the retrieval-scale
    *    path): candidates come from a hyperplane-LSH band-key equi-join
    *    of the query stream against the banded corpus, exact cosine
    *    scoring touches candidates only, and the per-query top-k runs
    *    in bounded per-partition heaps after one query-keyed
    *    repartition — every step stateless, so the whole plan is legal
    *    under append-mode Structured Streaming (a stream-static join +
    *    narrow maps; no window rank, no stateful agg). Approximate for
    *    genuinely far-apart "neighbors", the documented LSH/IVF
    *    tradeoff of every ANN engine ([[knnGraph]]'s contract);
    *    [[recallAtK]] is the measuring stick.
    *
    * Output contract either way: (query_id, neighbor_id, rank, cosine),
    * rank by (rounded cosine desc, neighbor_id asc), self-matches
    * excluded.
    *
    * The LSH path treats the corpus as a FROZEN snapshot: its banded
    * relation is persisted and memoized by canonicalized plan for the
    * session (LRU, see [[bandedCorpus]]), so a corpus whose backing
    * files are rewritten keeps serving the old vectors until
    * [[invalidateBandedCorpusCache]] is called — the refresh hook for
    * serving over a corpus that actually changed. */
  def topKForQueryStream(queries: DataFrame, corpus: DataFrame,
                         k: Int = 5): DataFrame = {
    require(!corpus.isStreaming, "corpus must be a static table")
    val spark = corpus.sparkSession
    val blockLimit = spark.conf
      .getOption("spark.graft.embeddingBlockMaxVecs")
      .map(_.toLong).getOrElse(Dedup.EmbeddingBlockLimit)
    if (blockLimit > 0 && corpus.select("vec_id").count() <= blockLimit)
      topKBroadcastBlock(queries, corpus, k)
    else topKForQueryStreamLsh(queries, corpus, k)
  }

  /** The under-limit serving path: broadcast corpus, map-side exact
    * scoring with a per-row bounded heap (see [[topKForQueryStream]]).
    * Callers must have verified the corpus is at or under the block
    * limit — this is the only corpus collect in the file, and it is
    * bounded by that check. */
  private def topKBroadcastBlock(queries: DataFrame, corpus: DataFrame,
                                 k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.select(col("vec_id"), col("embedding")).collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val c = new LocalSimilarity.Corpus(ids, vecs)
    val bc = spark.sparkContext.broadcast(c)
    val scoreOne = udf { (queryId: Long, emb: Seq[Float]) =>
      LocalSimilarity.topKForVector(bc.value, queryId,
        emb.toArray.map(_.toDouble), k)
        .map { case (_, nid, rank, cos) => (nid, rank, cos) }
    }
    queries
      .select(col("vec_id").as("query_id"),
        explode(scoreOne(col("vec_id"), col("embedding"))).as("hit"))
      .select(col("query_id"), col("hit._1").as("neighbor_id"),
        col("hit._2").as("rank"), col("hit._3").as("cosine"))
  }

  /** The above-limit serving path (see [[topKForQueryStream]]): band-key
    * stream-static equi-join candidates → exact cosine on candidates
    * only → one repartition on query_id → per-partition dedup +
    * bounded-heap top-k + rank, all inside a single stateless
    * mapPartitions. A (query, neighbor) pair surfaces once per shared
    * band; the in-heap kept-set dedups it (duplicates carry the same
    * deterministic rounded cosine, so a re-offer of an evicted
    * candidate loses again — the set only guards double-keeping).
    * Memory per task: O(live queries in the partition × k). */
  /** Persisted banded-corpus relations for the LSH serving path, one per
    * distinct (session, canonicalized corpus plan) — the banding pass
    * (HyperplaneBands·HyperplaneBandBits hyperplane dot products per
    * vector) is the dominant corpus-side cost under Structured Streaming,
    * where the static side of a stream-static join re-executes every
    * micro-batch; pay it once per corpus, not once per batch or per call.
    * Dataset.persist registers the plan with the session CacheManager,
    * which holds a STRONG reference until an explicit unpersist — the
    * ContextCleaner never reclaims it — so a per-call persist would leak
    * one cached exploded relation per invocation for the session
    * lifetime. Bounded LRU instead: a repeat serve of the same corpus
    * reuses its cached relation, and the eldest entry past the cap is
    * explicitly unpersisted on eviction. */
  private val BandedCorpusCacheCap = 4
  private val bandedCorpusCache = new java.util.LinkedHashMap[
      (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      DataFrame](8, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[
          (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
          DataFrame]): Boolean =
      if (size > BandedCorpusCacheCap) {
        // a stopped session makes unpersist throw; the entry is dead anyway
        try e.getValue.unpersist(blocking = false)
        catch { case _: Throwable => () }
        true
      } else false
  }

  /** FROZEN-CORPUS SEMANTICS: the cache key is the CANONICALIZED PLAN,
    * not the data — a corpus re-read from the same source path after the
    * underlying files change canonicalizes to the same plan and keeps
    * serving the previously banded (persisted) vectors until LRU
    * eviction. That is the deliberate contract of the serving path (a
    * serving corpus is an immutable snapshot; re-banding per call is the
    * cost this cache exists to avoid). On a corpus REFRESH, call
    * [[invalidateBandedCorpusCache]] to drop the stale relations
    * explicitly. */
  def invalidateBandedCorpusCache(session: org.apache.spark.sql.SparkSession): Unit =
    bandedCorpusCache.synchronized {
      val it = bandedCorpusCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 eq session) {
          try e.getValue.unpersist(blocking = false)
          catch { case _: Throwable => () }
          it.remove()
        }
      }
    }

  private[ops] def bandedCorpus(corpus: DataFrame,
                           bandKeys: org.apache.spark.sql.expressions
                             .UserDefinedFunction): DataFrame = {
    val key = (corpus.sparkSession,
      corpus.queryExecution.analyzed.canonicalized)
    bandedCorpusCache.synchronized {
      val hit = bandedCorpusCache.get(key)
      if (hit != null) hit
      else {
        val built = withNorm(corpus)
          .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
            col("nrm").as("cn"))
          .withColumn("bk", explode(bandKeys(col("cv"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        bandedCorpusCache.put(key, built)
        built
      }
    }
  }

  private def topKForQueryStreamLsh(queries: DataFrame, corpus: DataFrame,
                                    k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bandKeys = udf((v: Seq[Double]) => Dedup.hyperplaneBandKeys(v).toSeq)
    val cn = bandedCorpus(corpus, bandKeys)
    val qn = queries
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .withColumn("bk", explode(bandKeys(col("qv"))))
    val scored = qn.join(cn, Seq("bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("qn"), col("cv"), col("cn")).as("cosine"))
      .as[(Long, Long, Double)]
    scored
      .repartition(col("query_id"))
      .mapPartitions { it =>
        // weakest kept first: cosine asc, neighbor_id desc (topK's order)
        val weakestFirst = new java.util.Comparator[(Long, Double)] {
          def compare(x: (Long, Double), y: (Long, Double)): Int = {
            val byCos = java.lang.Double.compare(x._2, y._2)
            if (byCos != 0) byCos else java.lang.Long.compare(y._1, x._1)
          }
        }
        final class Q {
          val heap = new java.util.PriorityQueue[(Long, Double)](
            k + 1, weakestFirst)
          val kept = new java.util.HashSet[Long]()
        }
        val state = new java.util.HashMap[Long, Q]()
        it.foreach { case (q, nid, c) =>
          var s = state.get(q)
          if (s == null) { s = new Q; state.put(q, s) }
          if (!s.kept.contains(nid)) {
            if (s.heap.size < k) { s.heap.offer((nid, c)); s.kept.add(nid) }
            else if (weakestFirst.compare((nid, c), s.heap.peek()) > 0) {
              s.kept.remove(s.heap.poll()._1)
              s.heap.offer((nid, c)); s.kept.add(nid)
            }
          }
        }
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
        state.forEach { (q, s) =>
          val arr = s.heap.toArray(new Array[(Long, Double)](s.heap.size))
          // rank order: cosine desc, neighbor_id asc
          java.util.Arrays.sort(arr, weakestFirst.reversed())
          var r = 0
          while (r < arr.length) {
            out += ((q, arr(r)._1, (r + 1).toLong, arr(r)._2))
            r += 1
          }
        }
        out.iterator
      }
      .toDF("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Deterministic per-query top-k: rank by (cosine desc, neighbor_id).
    *
    * Map-side partial top-k first: each scan partition keeps at most k
    * candidates per query in a bounded heap, so the per-query exchange
    * receives O(k · queries · partitions) rows — NOT the full scored
    * corpus — and no single task ever sorts a corpus-sized partition
    * (with 10 queries the naive window shuffles ALL scored rows into 10
    * tasks). The final window ranks only the tiny merged survivor set;
    * top-k of the union of per-partition top-k is exactly the global
    * top-k under the same total order, so results are unchanged. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val partial = scored
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // head = weakest kept candidate: cosine asc, neighbor_id desc
        val weakestFirst = new java.util.Comparator[(Long, Double)] {
          def compare(x: (Long, Double), y: (Long, Double)): Int = {
            val byCos = java.lang.Double.compare(x._2, y._2)
            if (byCos != 0) byCos else java.lang.Long.compare(y._1, x._1)
          }
        }
        val heaps = new java.util.HashMap[
          Long, java.util.PriorityQueue[(Long, Double)]]()
        it.foreach { case (q, nid, c) =>
          var h = heaps.get(q)
          if (h == null) {
            h = new java.util.PriorityQueue[(Long, Double)](k + 1, weakestFirst)
            heaps.put(q, h)
          }
          if (h.size < k) h.offer((nid, c))
          else if (weakestFirst.compare((nid, c), h.peek()) > 0) {
            h.poll(); h.offer((nid, c))
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        heaps.forEach { (q, h) =>
          h.forEach { case (nid, c) => out += ((q, nid, c)) }
        }
        out.iterator
      }
      .toDF("query_id", "neighbor_id", "cosine")
    partial.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cosine"))
  }

  /** Product-quantization ADC top-k — the memory-bound ANN scale path
    * (Jégou/Douze/Schmid PAMI'11): each vector is compressed to `nSub`
    * small codes against per-subspace codebooks, a query builds one
    * `nSub × kCodes` dot-product lookup table, and scoring a neighbor
    * is `nSub` table reads instead of a d-dim dot product — at serving
    * scale the corpus working set shrinks ~d·4/nSub ×.
    *
    * Codebooks are the stand-in sub-vectors of the first `kCodes`
    * corpus vectors by id (the [[ivfTopK]] convention): deterministic
    * AND SQL-expressible, so the WHOLE pipeline — encode, LUT, ADC
    * score, rank — carries a full DuckDB oracle (a trained-codebook
    * variant would slot in exactly like `sim_ivf_kmeans`).
    *
    * Determinism contract: per subspace the code maximizes
    * round6(dot(sub, cw) − cwn2/2) (the ‖b‖²−2ab L2 argmin in dot
    * form) with first-max-wins ties (= `array_position` of the max);
    * the ADC dot and the approximate norm are SEQUENTIAL m-order folds
    * (`aggregate`), never a shuffle-order `sum` over doubles — so
    * kernel ≡ distributed ≡ oracle bit-for-bit.
    *
    * Scale shape: the codebook is a bounded collect (kCodes vectors by
    * construction) shipped as an in-plan literal; encode + norm are a
    * narrow map over the corpus (no shuffle); queries ride in as a
    * broadcast with their LUT arrays; the only exchange is [[topK]]'s
    * bounded per-partition heaps. */
  def pqTopK(embeddings: DataFrame, nSub: Int = 8, kCodes: Int = 16,
             k: Int = 5, nQueries: Int = 10): DataFrame =
    localCorpus(embeddings) match {
      case Some(c) => shipTopK(embeddings.sparkSession,
        LocalSimilarity.pqTopK(c, nSub, kCodes, k, nQueries))
      case None =>
        val n = withNorm(embeddings)
        // bounded by construction: kCodes stand-in vectors
        val cbRows = n.filter(col("vec_id") < kCodes)
          .orderBy("vec_id").select("v").collect()
          .map(_.getSeq[Double](0).toArray)
        require(cbRows.nonEmpty, "pqTopK: empty codebook")
        val d = cbRows(0).length
        val sub = d / nSub
        require(sub > 0, s"pqTopK: $d dims cannot split into $nSub subspaces")
        val kk = cbRows.length
        // flat (m, j) layout, m-major — element_at index = m·kk + j (1-based j)
        val cwSeq: Seq[Seq[Double]] =
          for (m <- 0 until nSub; j <- 0 until kk)
            yield cbRows(j).slice(m * sub, m * sub + sub).toSeq
        pqTopKDistributed(n, nSub, cwSeq, k, nQueries)
    }

  /** PQ with TRAINED per-subspace codebooks: deterministic sampled L2
    * k-means per subspace (init = first kCodes sample sub-vectors,
    * assignment by (squared distance asc, codeword asc), update = mean,
    * empty cells keep their centroid — no RNG anywhere, the
    * [[trainCentroids]] determinism contract). Output contract is
    * identical to [[pqTopK]]; the training argmin is not
    * SQL-expressible, but the trained codebooks are a deterministic
    * value — the query records them and the encode/LUT/ADC/rank
    * pipeline gets a FULL DuckDB oracle with the codebooks as a VALUES
    * side table (the `sim_ivf_kmeans` convention); content digest +
    * recall floor additionally pinned in specs. */
  def pqTopKTrained(embeddings: DataFrame, nSub: Int = 8, kCodes: Int = 16,
                    k: Int = 5, nQueries: Int = 10, nIter: Int = 3,
                    sampleSize: Int = 4096): DataFrame =
    pqTopKWithTrainedCodebooks(embeddings, nSub,
      trainPqCodebooks(embeddings, nSub, kCodes, nIter, sampleSize),
      k, nQueries)

  /** The ADC pipeline against explicit trained codebooks (what
    * [[pqTopKTrained]] dispatches to) — public for the same
    * train-once / external-oracle reason as [[ivfTopKWithTrained]]. */
  def pqTopKWithTrainedCodebooks(embeddings: DataFrame, nSub: Int,
                                 cw: Array[Array[Double]], k: Int = 5,
                                 nQueries: Int = 10): DataFrame =
    localCorpus(embeddings) match {
      case Some(c) => shipTopK(embeddings.sparkSession,
        LocalSimilarity.pqTopKWithCodebooks(c, nSub, cw, k, nQueries))
      case None =>
        pqTopKDistributed(withNorm(embeddings), nSub,
          cw.map(_.toSeq).toSeq, k, nQueries)
    }

  /** Deterministic sampled per-subspace L2 k-means — flat m-major
    * codebooks (size nSub·kCodes). The sample is the first
    * `sampleSize` vectors by id (a distributed top-S, the corpus is
    * never collected). */
  def trainPqCodebooks(embeddings: DataFrame, nSub: Int, kCodes: Int,
                       nIter: Int, sampleSize: Int = 4096)
      : Array[Array[Double]] = {
    val sample = withNorm(embeddings)
      .orderBy(col("vec_id")).limit(sampleSize)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    if (sample.isEmpty) return Array.empty
    val d = sample(0).length
    val sub = d / nSub
    require(sub > 0, s"trainPqCodebooks: $d dims / $nSub subspaces")
    val out = new Array[Array[Double]](nSub * kCodes)
    var m = 0
    while (m < nSub) {
      val pts = sample.map(v =>
        java.util.Arrays.copyOfRange(v, m * sub, m * sub + sub))
      var cents = pts.take(kCodes).map(_.clone())
      var it = 0
      while (it < nIter) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        pts.foreach { p =>
          var best = 0
          var bestD = Double.PositiveInfinity
          var ci = 0
          while (ci < cents.length) {
            var dist = 0.0
            var t = 0
            while (t < sub) {
              val diff = p(t) - cents(ci)(t)
              dist += diff * diff
              t += 1
            }
            if (dist < bestD) { bestD = dist; best = ci }
            ci += 1
          }
          val s = sums(best)
          var t = 0
          while (t < sub) { s(t) += p(t); t += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map { ci =>
          if (counts(ci) == 0) cents(ci)
          else sums(ci).map(_ / counts(ci))
        }.toArray
        it += 1
      }
      var j = 0
      while (j < cents.length) { out(m * kCodes + j) = cents(j); j += 1 }
      m += 1
    }
    out
  }

  /** The ADC pipeline against explicit flat (m-major) codebooks shipped
    * as in-plan literals — encode + norm as a narrow map, broadcast
    * query LUTs, bounded-heap top-k. */
  private def pqTopKDistributed(n: DataFrame, nSub: Int,
                                cwSeq: Seq[Seq[Double]], k: Int,
                                nQueries: Int): DataFrame = {
    require(cwSeq.nonEmpty, "pqTopKDistributed: empty codebook")
    val kk = cwSeq.length / nSub
    val sub = cwSeq.head.length
    val cbLit = typedLit(cwSeq)
        val cwn2Lit = typedLit(
          cwSeq.map(w => LocalSimilarity.dot(w.toArray, w.toArray)))
        val scores = transform(sequence(lit(0), lit(nSub - 1)), m =>
          transform(sequence(lit(1), lit(kk)), j =>
            round(dot(slice(col("v"), m * sub + 1, lit(sub)),
                element_at(cbLit, m * kk + j)) -
              lit(0.5) * element_at(cwn2Lit, m * kk + j), 6)))
        val corpusCodes = n
          .select(col("vec_id").as("neighbor_id"), col("v"))
          .withColumn("ss", scores)
          .select(col("neighbor_id"),
            transform(col("ss"), a => array_position(a, array_max(a)))
              .as("codes"))
          .withColumn("na", sqrt(aggregate(
            sequence(lit(0), lit(nSub - 1)), lit(0.0), (acc, m) =>
              acc + element_at(cwn2Lit,
                (m * kk + element_at(col("codes"), m + 1)).cast("int")))))
        val lut = flatten(transform(sequence(lit(0), lit(nSub - 1)), m =>
          transform(sequence(lit(1), lit(kk)), j =>
            dot(slice(col("v"), m * sub + 1, lit(sub)),
              element_at(cbLit, m * kk + j)))))
        val q = n.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), lut.as("lut"),
            col("nrm").as("qn"))
        val scored = corpusCodes.crossJoin(broadcast(q))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(aggregate(
              sequence(lit(0), lit(nSub - 1)), lit(0.0), (acc, m) =>
                acc + element_at(col("lut"),
                  (m * kk + element_at(col("codes"), m + 1)).cast("int"))) /
              (col("qn") * col("na")), 6).as("cosine"))
        topK(scored, k)
    }

  /** Per-label embedding centroids in LONG form — (label, dim, n_vecs,
    * centroid) — the mean-pool aggregation behind class prototypes /
    * centroid-classifier evaluation over an embedding column.
    *
    * Shape: `posexplode` fans each vector into (label, dim, value)
    * rows — a narrow map — and ONE groupBy(label, dim) with partial
    * (map-side) aggregation reduces them; the exchange carries
    * O(labels × dims) partial sums per partition, never the vectors.
    * Long form keeps the result relational (no |dims|-wide row), which
    * is also what a downstream join against per-dim statistics wants. */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("v").cast("double")), 6).as("centroid"))

  /** Embedding-space outlier scoring against each vector's own label
    * centroid — the mislabel / noisy-sample detector run before
    * training on labeled embeddings. Each vector's cosine to its
    * label's mean vector is computed in EXACT integer arithmetic:
    * the 6-dp centroid and the vector both quantize to micro-units,
    * the dot product and both norms are order-free long sums inside a
    * row (never a float reduction), and only the final
    * `dot / (√n_v·√n_c)` runs in (deterministic, IEEE) doubles,
    * rendered at 6 dp.
    *
    * Scale shape: the centroid table is O(labels × dims) — built by
    * ONE partially-aggregated groupBy and broadcast back; scoring is
    * then a narrow per-row map (zip_with + aggregate HOFs). Output:
    * (vec_id, label, cos_to_centroid, is_outlier). */
  def centroidOutliers(embeddings: DataFrame,
                       threshold: Double = 0.1): DataFrame = {
    val cents = labelCentroids(embeddings)
      .select(col("label"),
        struct(col("dim"),
          round(col("centroid") * lit(1000000d), 0).cast("long").as("qc"))
          .as("p"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(col("p"))),
        x => x.getField("qc")).as("c"))
    val qv = transform(col("embedding"),
      x => round(x.cast("double") * lit(1000000d), 0).cast("long"))
    embeddings
      .select(col("vec_id"), col("label"), qv.as("qv"))
      .join(broadcast(cents), "label")
      .select(col("vec_id"), col("label"),
        aggregate(zip_with(col("qv"), col("c"), (a, b) => a * b),
          lit(0L), _ + _).as("dot"),
        aggregate(transform(col("qv"), a => a * a), lit(0L), _ + _)
          .as("nv"),
        aggregate(transform(col("c"), a => a * a), lit(0L), _ + _)
          .as("nc"))
      .select(col("vec_id"), col("label"),
        // a zero vector (or zero centroid) has no direction: NULL
        // cosine, never flagged — and never an ANSI divide-by-zero
        when(col("nv") === 0L || col("nc") === 0L, lit(null))
          .otherwise(round(col("dot").cast("double") /
            (sqrt(col("nv").cast("double")) *
              sqrt(col("nc").cast("double"))), 6))
          .as("cos_to_centroid"))
      .withColumn("is_outlier",
        when(col("cos_to_centroid") < threshold, 1L).otherwise(0L))
  }

  /** Exact second-moment (covariance) accumulation over the embedding
    * matrix — the single-pass statistic behind PCA whitening, feature
    * decorrelation and Mahalanobis scoring. Emits, for every
    * upper-triangle dim pair (i ≤ j, 1-based): the vector count `n`,
    * the per-dim sums `s_x`, `s_y` and the cross-product sum `s_xy` —
    * the moments from which mean/covariance are one driver-side
    * division (kept un-divided so the output is EXACT and mergeable
    * across shards, like the reference's statistics blocks that ship
    * raw sums, mpi/logfile.h:32-43).
    *
    * Exactness: elements are quantized ONCE to micro-units
    * (q = round(x·10⁶), ties away from zero — the one rounding rule
    * double `round` shares across engines; a direct double→decimal
    * cast does NOT, its 12th-digit ties resolve differently) and every
    * moment then runs in exact integer/decimal arithmetic, so reducer
    * order can't perturb a bit and the result matches any
    * exact-arithmetic oracle. The final DOUBLE columns divide equal
    * decimals by the scale constants — equal in, equal out.
    *
    * Shape: codegen-free-but-narrow HOF `transform` expands each row to
    * its d(d+1)/2 products (no self-join — the row never meets another
    * row), and ONE partial-agg'd groupBy(i, j) reduces them: the
    * exchange carries O(d²) partial sums per map partition, never the
    * n·d² product rows. Per-dim sums reduce the same way (O(d) groups)
    * and join back by broadcast — both join sides are dimension-sized. */
  def covarianceMoments(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    val dec = DecimalType(38, 0)
    val v = transform(col("embedding"),
      x => round(x.cast("double") * lit(1000000.0), 0).cast("long"))
    // Map side: per-partition Gram accumulation into primitive long
    // triangles (the classic distributed second-moment kernel — compare
    // MLlib's Gramian treeAggregate). Each partition emits at most
    // d(d+1)/2 + d partial rows, so the ONE shuffle carries
    // O(partitions × d²) — never the n·d²/2 product rows the previous
    // explode-based plan materialized map-side (measured 2.7 s → the
    // explode dominated the query at sf0.1; at 100 TB it would dominate
    // the job). Long accumulators spill to BigInteger on (rare)
    // overflow, so the moments stay EXACT — same micro-unit
    // quantization, same bit-reproducible sums as before.
    val quantized = {
      import spark.implicits._
      embeddings.select(v.as("v")).as[Array[Long]]
    }
    val partialRows = quantized.rdd.mapPartitions { it =>
      // triangular layout k(i,j) = j(j+1)/2 + i (0-based, i ≤ j):
      // independent of the eventual max dimension, so ragged inputs
      // only ever APPEND cells.
      var dMax = 0
      var acc: Array[Long] = new Array[Long](0)
      var spill: Array[java.math.BigInteger] = new Array(0)
      var dimAcc: Array[Long] = new Array[Long](0)
      var dimSpill: Array[java.math.BigInteger] = new Array(0)
      var lenCnt: Array[Long] = new Array[Long](0)
      def grow(d: Int): Unit = if (d > dMax) {
        acc = java.util.Arrays.copyOf(acc, d * (d + 1) / 2)
        spill = java.util.Arrays.copyOf(spill, d * (d + 1) / 2)
        dimAcc = java.util.Arrays.copyOf(dimAcc, d)
        dimSpill = java.util.Arrays.copyOf(dimSpill, d)
        lenCnt = java.util.Arrays.copyOf(lenCnt, d + 1)
        dMax = d
      }
      @inline def flushPair(k: Int): Unit = {
        val b = if (spill(k) == null) java.math.BigInteger.ZERO else spill(k)
        spill(k) = b.add(java.math.BigInteger.valueOf(acc(k))); acc(k) = 0L
      }
      @inline def flushDim(j: Int): Unit = {
        val b = if (dimSpill(j) == null) java.math.BigInteger.ZERO
                else dimSpill(j)
        dimSpill(j) = b.add(java.math.BigInteger.valueOf(dimAcc(j)))
        dimAcc(j) = 0L
      }
      val sqrtMax = 3037000499L // floor(sqrt(Long.MaxValue))
      while (it.hasNext) {
        val row = it.next()
        if (row != null && row.length > 0) {
          val len = row.length
          grow(len)
          lenCnt(len) += 1
          // q·q can only overflow when an element exceeds √Long.Max —
          // |x| > ~3e3 at micro-quantization; route such rows through
          // exact BigInteger arithmetic instead of the fast loop.
          var safe = true
          var t = 0
          while (t < len) {
            val a = if (row(t) < 0) -row(t) else row(t)
            if (a > sqrtMax) safe = false
            t += 1
          }
          var j = 0
          while (j < len) {
            val qj = row(j)
            val base = j * (j + 1) / 2
            if (safe) {
              var i = 0
              while (i <= j) {
                val p = row(i) * qj
                val k = base + i
                val s = acc(k) + p
                // signed-overflow test: overflow iff operands share sign
                // and the sum's sign differs
                if (((acc(k) ^ s) & (p ^ s)) < 0) { flushPair(k); acc(k) = p }
                else acc(k) = s
                i += 1
              }
            } else {
              var i = 0
              while (i <= j) {
                val k = base + i
                flushPair(k)
                spill(k) = spill(k).add(
                  java.math.BigInteger.valueOf(row(i))
                    .multiply(java.math.BigInteger.valueOf(qj)))
                i += 1
              }
            }
            val sd = dimAcc(j) + qj
            if (((dimAcc(j) ^ sd) & (qj ^ sd)) < 0) { flushDim(j); dimAcc(j) = qj }
            else dimAcc(j) = sd
            j += 1
          }
        }
      }
      if (dMax == 0) Iterator.empty
      else {
        // cntGE(j) = rows long enough to contain 0-based dim j — the
        // exact per-pair n for ragged inputs (a pair (i,j), i ≤ j, is
        // present in a row iff the row has dim j).
        val cntGE = new Array[Long](dMax)
        var g = dMax - 1
        var run = 0L
        while (g >= 0) { run += lenCnt(g + 1); cntGE(g) = run; g -= 1 }
        def big(l: Long, b: java.math.BigInteger): java.math.BigDecimal =
          new java.math.BigDecimal(
            (if (b == null) java.math.BigInteger.ZERO else b)
              .add(java.math.BigInteger.valueOf(l)))
        val out = Iterator.range(0, dMax).flatMap { j =>
          Iterator.range(0, j + 1).map { i =>
            org.apache.spark.sql.Row(
              (i + 1).toLong, (j + 1).toLong,
              big(acc(j * (j + 1) / 2 + i), spill(j * (j + 1) / 2 + i)),
              cntGE(j))
          }
        } ++ Iterator.range(0, dMax).map { dd =>
          org.apache.spark.sql.Row(
            (dd + 1).toLong, 0L, big(dimAcc(dd), dimSpill(dd)), cntGE(dd))
        }
        out
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("p", dec, nullable = true),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val partials = spark.createDataFrame(partialRows, schema)
    val reduced = partials.groupBy("i", "j")
      .agg(sum("p").as("sxy"), sum("n").as("n"))
    val pairSums = reduced.filter(col("j") > 0)
      .select(col("i"), col("j"), col("sxy"), col("n"))
    val dimSums = reduced.filter(col("j") === 0)
      .select(col("i").as("d"), col("sxy").as("s"))
    pairSums
      .join(broadcast(dimSums.select(col("d").as("i"), col("s").as("si"))),
        "i")
      .join(broadcast(dimSums.select(col("d").as("j"), col("s").as("sj"))),
        "j")
      .select(col("i"), col("j"), col("n"),
        (col("si").cast("double") / lit(1e6)).as("s_x"),
        (col("sj").cast("double") / lit(1e6)).as("s_y"),
        (col("sxy").cast("double") / lit(1e12)).as("s_xy"))
  }

  /** Symmetric per-vector int8 quantization — the 4× storage/bandwidth
    * reduction step an embedding store applies before ANN serving:
    * scale = max|v| / 127, q_i = round(v_i / scale) ∈ [-127, 127]
    * (an all-zero vector quantizes to zeros with scale 0).
    *
    * Pure narrow map built from codegen'd column expressions (HOF
    * `transform` for the |v| max, `posexplode` for the long-form
    * output) — no shuffle, no UDF; at 100 TB this runs at scan speed
    * and the long form joins directly against per-dim statistics.
    * Output: (vec_id, dim, q, scale) with q exactly reconstructible
    * as q·scale. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    embeddings
      .select(col("vec_id"), v.as("v"), mx.as("mx"))
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")),
        col("mx"))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(col("mx") === 0d, 0L)
          .otherwise(round(col("x") / (col("mx") / lit(127.0)), 0)
            .cast("long")).as("q"),
        round(col("mx") / lit(127.0), 6).as("scale"))
  }
}

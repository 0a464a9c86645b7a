package graft.ops

/**
 * Driver-local similarity kernels — the small-corpus path of the hybrid
 * executor for [[Similarity]], mirroring the column pipelines exactly:
 * float→double element casts, sequential index-order dot-product folds,
 * HALF_UP 6dp cosine rounding, and (cosine desc, id asc) rank ordering.
 * Equality specs: LocalSimilaritySpec.
 *
 * Each distributed ANN query is a broadcast join + window rank (plus a
 * corpus-wide assignment pass for IVF); below ~10⁵ vectors the corpus is
 * one executor's working set and per-stage scheduling dominates. The
 * distributed pipelines remain the corpus-scale path.
 */
object LocalSimilarity {

  /** (ids, double vectors, norms) — the collected `withNorm` relation.
    * Serializable: topKForQueryStream broadcasts it to executors. */
  final class Corpus(val ids: Array[Long], val vecs: Array[Array[Double]])
      extends Serializable {
    val nrm: Array[Double] = vecs.map(v => math.sqrt(dot(v, v)))
    def size: Int = ids.length
  }

  /** Sequential index-order fold — bit-identical to ArrayDotProduct /
    * DuckDB list_dot_product. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round6(x: Double): Double = LocalDedup.round6(x)

  private def cosine(c: Corpus, a: Int, b: Int): Double =
    round6(dot(c.vecs(a), c.vecs(b)) / (c.nrm(a) * c.nrm(b)))

  /** Per-query top-k among candidate indices, ranked by
    * (cosine desc, neighbor_id asc): (query_id, neighbor_id, rank,
    * cosine) rows. */
  private def topK(c: Corpus, query: Int, cands: Iterator[Int], k: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val scored = cands.filter(_ != query)
      .map(n => (c.ids(n), cosine(c, query, n))).toArray
    java.util.Arrays.sort(scored, new java.util.Comparator[(Long, Double)] {
      def compare(x: (Long, Double), y: (Long, Double)): Int = {
        val byCos = java.lang.Double.compare(y._2, x._2)
        if (byCos != 0) byCos else java.lang.Long.compare(x._1, y._1)
      }
    })
    scored.take(k).zipWithIndex.map { case ((nid, cos), r) =>
      (c.ids(query), nid, (r + 1).toLong, cos)
    }.toSeq
  }

  /** Top-k for ONE external vector against the corpus — the map-side
    * unit of Similarity.topKForQueryStream. Same scoring/ordering as
    * [[topK]]; a corpus member with the query's id is excluded (self). */
  def topKForVector(c: Corpus, queryId: Long, v: Array[Double],
                    k: Int): Seq[(Long, Long, Long, Double)] = {
    val nrm = math.sqrt(dot(v, v))
    val scored = c.ids.indices.iterator.filter(c.ids(_) != queryId)
      .map(n => (c.ids(n), round6(dot(v, c.vecs(n)) / (nrm * c.nrm(n)))))
      .toArray
    java.util.Arrays.sort(scored, new java.util.Comparator[(Long, Double)] {
      def compare(x: (Long, Double), y: (Long, Double)): Int = {
        val byCos = java.lang.Double.compare(y._2, x._2)
        if (byCos != 0) byCos else java.lang.Long.compare(x._1, y._1)
      }
    })
    scored.take(k).zipWithIndex.map { case ((nid, cos), r) =>
      (queryId, nid, (r + 1).toLong, cos)
    }.toSeq
  }

  /** ≡ Similarity.bruteForceTopK: exact cosine top-k for queries
    * vec_id < nQueries over the whole corpus. */
  def bruteForceTopK(c: Corpus, k: Int, nQueries: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val queries = c.ids.indices.filter(i => c.ids(i) < nQueries)
    val out = new Array[Seq[(Long, Long, Long, Double)]](queries.size)
    java.util.stream.IntStream.range(0, queries.size).parallel().forEach { qi =>
      out(qi) = topK(c, queries(qi), c.ids.indices.iterator, k)
    }
    out.toSeq.flatten
  }

  /** ≡ Similarity.knnGraph (exact path): top-k neighbors of EVERY
    * corpus vector — bruteForceTopK with the whole corpus as queries. */
  def knnGraph(c: Corpus, k: Int): Seq[(Long, Long, Long, Double)] = {
    val out = new Array[Seq[(Long, Long, Long, Double)]](c.size)
    java.util.stream.IntStream.range(0, c.size).parallel().forEach { qi =>
      out(qi) = topK(c, qi, c.ids.indices.iterator, k)
    }
    out.toSeq.flatten
  }

  /** ≡ Dedup.embeddingDedup: all pairs (vec_id_a < vec_id_b) with
    * rounded cosine ≥ threshold. */
  def embeddingPairs(c: Corpus, threshold: Double): Seq[(Long, Long, Double)] = {
    val order = c.ids.indices.sortBy(c.ids(_)).toArray
    val out = new Array[Seq[(Long, Long, Double)]](order.length)
    // ε-margin pre-filter on the raw cosine: round6 (BigDecimal) per pair
    // would dominate the O(n²) scan; rounding moves a value ≤ 5e-7, so no
    // pair that rounds past the threshold is lost.
    val eps = 1e-6
    java.util.stream.IntStream.range(0, order.length).parallel().forEach { oi =>
      val a = order(oi)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var oj = oi + 1
      while (oj < order.length) {
        val b = order(oj)
        if (c.ids(a) != c.ids(b)) {
          val raw = dot(c.vecs(a), c.vecs(b)) / (c.nrm(a) * c.nrm(b))
          if (raw >= threshold - eps) {
            val cos = round6(raw)
            if (cos >= threshold) buf += ((c.ids(a), c.ids(b), cos))
          }
        }
        oj += 1
      }
      out(oi) = buf.toSeq
    }
    out.toSeq.flatten
  }

  /** ≡ Similarity.ivfTopK: centroids = vec_id < nCentroids; corpus
    * assigned to nearest centroid by (rounded cosine desc, centroid_id
    * asc); queries probe nProbe nearest cells; exact scoring within
    * probed cells only. Delegates to [[ivfTopKWithCentroids]] with the
    * stand-in centroid vectors in id order (index ties ≡ id ties). */
  def ivfTopK(c: Corpus, k: Int, nQueries: Int, nCentroids: Int,
              nProbe: Int): Seq[(Long, Long, Long, Double)] = {
    val centIdx = c.ids.indices.filter(i => c.ids(i) < nCentroids)
      .sortBy(c.ids(_)).toArray
    ivfTopKWithCentroids(c, centIdx.map(c.vecs(_)), k, nQueries, nProbe)
  }

  /** IVF probe/score against EXPLICIT centroid vectors (centroid_id =
    * array index — trained centroids, or the stand-in's vectors in id
    * order). Assignment/probe by (rounded cosine desc, centroid_id asc),
    * exact scoring within probed cells — mirrors the distributed
    * pipeline 1:1. */
  def ivfTopKWithCentroids(c: Corpus, cents: Array[Array[Double]], k: Int,
                           nQueries: Int, nProbe: Int)
      : Seq[(Long, Long, Long, Double)] = {
    if (cents.isEmpty) return Seq.empty
    val cnrm = cents.map(v => math.sqrt(dot(v, v)))
    // rank centroids for one vector: (rounded cosine desc, centroid_id asc)
    def rankedCentroids(v: Int): Array[Int] =
      cents.indices.map(ci =>
          (ci, round6(dot(c.vecs(v), cents(ci)) / (c.nrm(v) * cnrm(ci)))))
        .sortBy { case (ci, cc) => (-cc, ci) }
        .map(_._1).toArray
    // cell assignment (parallel over the corpus)
    val assign = new Array[Int](c.size)
    java.util.stream.IntStream.range(0, c.size).parallel().forEach { v =>
      assign(v) = rankedCentroids(v)(0)
    }
    // per-cell member lists
    val cells = new java.util.HashMap[Int, java.util.ArrayList[Integer]]()
    var v = 0
    while (v < c.size) {
      var lst = cells.get(assign(v))
      if (lst == null) { lst = new java.util.ArrayList(); cells.put(assign(v), lst) }
      lst.add(v)
      v += 1
    }
    val queries = c.ids.indices.filter(i => c.ids(i) < nQueries)
    val out = new Array[Seq[(Long, Long, Long, Double)]](queries.size)
    java.util.stream.IntStream.range(0, queries.size).parallel().forEach { qi =>
      val q = queries(qi)
      val probed = rankedCentroids(q).take(nProbe)
      val cands = probed.iterator.flatMap { ci =>
        val lst = cells.get(ci)
        if (lst == null) Iterator.empty
        else Iterator.range(0, lst.size()).map(lst.get(_).intValue())
      }
      out(qi) = topK(c, q, cands, k)
    }
    out.toSeq.flatten
  }

  /** Product-quantization ADC top-k (the memory-bound ANN scale path:
    * vectors compressed to `nSub` byte codes, queries scored against a
    * per-query lookup table — Jégou/Douze/Schmid PAMI'11). Codebooks
    * are the stand-in sub-vectors of the first `kCodes` corpus vectors
    * by id (the ivfTopK convention — deterministic AND SQL-expressible,
    * so the full pipeline carries a DuckDB oracle). Per subspace m a
    * vector takes the code maximizing round6(dot(sub, cw) − cwn2/2)
    * (the ‖b‖²−2ab L2 argmin in dot form), first max on ties; the
    * approximate cosine is Σ_m lut[m][code] folded in m order over the
    * query's table, divided by qn·√(Σ_m cwn2[code]) and rounded —
    * every fold sequential, so kernel ≡ distributed ≡ oracle
    * bit-for-bit. Ranking: (cosine desc, neighbor_id asc), self
    * excluded. */
  def pqTopK(c: Corpus, nSub: Int, kCodes: Int, k: Int, nQueries: Int)
      : Seq[(Long, Long, Long, Double)] = {
    if (c.size == 0) return Seq.empty
    val d = c.vecs(0).length
    val sub = d / nSub
    val cbIdx = c.ids.indices.filter(i => c.ids(i) < kCodes)
      .sortBy(c.ids(_)).toArray
    if (cbIdx.isEmpty) return Seq.empty
    val kk = cbIdx.length
    // cw flat-indexed m*kk + (j-1), j 1-based (the oracle's layout)
    val cw = Array.tabulate(nSub * kk)(i =>
      java.util.Arrays.copyOfRange(c.vecs(cbIdx(i % kk)),
        (i / kk) * sub, (i / kk) * sub + sub))
    pqTopKWithCodebooks(c, nSub, cw, k, nQueries)
  }

  /** ADC scoring against EXPLICIT flat (m-major) codebooks — the shared
    * back half of stand-in and trained PQ. */
  def pqTopKWithCodebooks(c: Corpus, nSub: Int, cw: Array[Array[Double]],
                          k: Int, nQueries: Int)
      : Seq[(Long, Long, Long, Double)] = {
    if (c.size == 0 || cw.isEmpty) return Seq.empty
    val kk = cw.length / nSub
    val sub = cw(0).length
    def subvec(v: Array[Double], m: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, m * sub, m * sub + sub)
    val cwn2 = cw.map(w => dot(w, w))
    // per-vector codes (1-based) + approximate norms
    val codes = Array.ofDim[Int](c.size, nSub)
    val nA = new Array[Double](c.size)
    java.util.stream.IntStream.range(0, c.size).parallel().forEach { v =>
      var norm2 = 0.0
      var m = 0
      while (m < nSub) {
        val sv = subvec(c.vecs(v), m)
        var best = 0
        var bestScore = Double.NegativeInfinity
        var j = 0
        while (j < kk) {
          val s = round6(dot(sv, cw(m * kk + j)) - 0.5 * cwn2(m * kk + j))
          if (s > bestScore) { bestScore = s; best = j }
          j += 1
        }
        codes(v)(m) = best + 1
        norm2 += cwn2(m * kk + best)
        m += 1
      }
      nA(v) = math.sqrt(norm2)
    }
    val queries = c.ids.indices.filter(i => c.ids(i) < nQueries).toArray
    val out = new Array[Seq[(Long, Long, Long, Double)]](queries.length)
    java.util.stream.IntStream.range(0, queries.length).parallel().forEach { qi =>
      val q = queries(qi)
      // per-query LUT in the same flat layout
      val lut = Array.tabulate(nSub * kk)(i =>
        dot(subvec(c.vecs(q), i / kk), cw(i)))
      val scored = c.ids.indices.iterator.filter(_ != q).map { v =>
        var adot = 0.0
        var m = 0
        while (m < nSub) { adot += lut(m * kk + codes(v)(m) - 1); m += 1 }
        (c.ids(v), round6(adot / (c.nrm(q) * nA(v))))
      }.toArray
      java.util.Arrays.sort(scored, new java.util.Comparator[(Long, Double)] {
        def compare(x: (Long, Double), y: (Long, Double)): Int = {
          val byCos = java.lang.Double.compare(y._2, x._2)
          if (byCos != 0) byCos else java.lang.Long.compare(x._1, y._1)
        }
      })
      out(qi) = scored.take(k).zipWithIndex.map { case ((nid, cos), r) =>
        (c.ids(q), nid, (r + 1).toLong, cos)
      }.toSeq
    }
    out.toSeq.flatten
  }
}

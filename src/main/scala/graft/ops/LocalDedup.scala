package graft.ops

import java.util.concurrent.ConcurrentHashMap

/**
 * Driver-local dedup kernels — the small-corpus path of the hybrid
 * executor, exactly mirroring the distributed [[Dedup]] column pipelines
 * (same tokenization, md5-prefix hashing, banding, HALF_UP rounding), the
 * way [[graft.bfs.LocalCsr]] mirrors the distributed BFS loop.
 *
 * Rationale: each distributed dedup query is 5-15 shuffle stages; below
 * ~10⁵ documents the corpus is a single executor's working set and the
 * per-stage scheduling floor dominates end-to-end latency. Above the gate
 * (`spark.graft.localDedupMaxDocs`) the shuffle pipelines are the ONLY
 * shape that survives corpus scale — the kernels never replace them, they
 * short-circuit the regime where the reference's single-node engine
 * operates. Equality specs (`LocalDedupSpec`) pin kernel ≡ DataFrame
 * output on every path.
 *
 * All semantics deliberately match the column expressions 1:1:
 *  - tokens: trim SPACES only (Spark StringTrim), split on `\s+`, drop
 *    empties — NOT String.trim (which strips all control chars ≤ 0x20)
 *  - shingles: `max(nTok − 2, 1)` clamped 3-slices, so a 0/1/2-token doc
 *    yields exactly one (possibly empty) shingle, as
 *    `sequence(1, greatest(size(tk)-2, 1))` does
 *  - hash64: first 15 hex chars of md5 as a 60-bit Long
 *  - round: BigDecimal HALF_UP at 6dp (Spark's Round on DoubleType)
 *  - shingle identity is the STRING (interned to dense ints), never the
 *    hash — common-shingle counts are join-on-string semantics
 */
object LocalDedup {

  private val Threads = Runtime.getRuntime.availableProcessors()

  /** Mirror of TextOps.tokens: trim 0x20 only, split `\s+`, drop empties. */
  def tokens(text: String): Array[String] = {
    var from = 0
    var to = text.length
    while (from < to && text.charAt(from) == ' ') from += 1
    while (to > from && text.charAt(to - 1) == ' ') to -= 1
    val trimmed = text.substring(from, to)
    trimmed.split("\\s+", -1).filter(_.nonEmpty)
  }

  /** Mirror of TextOps.shingles: distinct word-3-gram strings. */
  def shingleStrings(tk: Array[String], n: Int = 3): Array[String] = {
    val count = math.max(tk.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < count) {
      seen.add(tk.slice(i, math.min(i + n, tk.length)).mkString(" "))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Mirror of Dedup.hash64: first 15 hex chars of md5 as a Long. */
  def hash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes, big-endian
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Mirror of Spark Round(double, 6): HALF_UP decimal rounding. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-document interned shingle ids (sorted) + global id → hash table.
    * Interning keys on the shingle STRING, so downstream set operations
    * have exactly the distributed join-on-shingle semantics. */
  private final class ShingleIndex(texts: Array[String]) {
    val nDocs: Int = texts.length
    private val interner = new ConcurrentHashMap[String, Integer]()
    // per-doc distinct shingle strings, computed in parallel
    private val perDoc = new Array[Array[String]](nDocs)
    java.util.stream.IntStream.range(0, nDocs).parallel().forEach { d =>
      perDoc(d) = shingleStrings(tokens(texts(d)))
    }
    // sequential interning pass (dense ids), then parallel hash of the
    // distinct-shingle table
    val docShingles: Array[Array[Int]] = {
      val out = new Array[Array[Int]](nDocs)
      var d = 0
      while (d < nDocs) {
        val ss = perDoc(d)
        val ids = new Array[Int](ss.length)
        var i = 0
        while (i < ss.length) {
          var id = interner.get(ss(i))
          if (id == null) { id = interner.size(); interner.put(ss(i), id) }
          ids(i) = id
          i += 1
        }
        java.util.Arrays.sort(ids)
        out(d) = ids
        d += 1
      }
      out
    }
    val nShingles: Int = interner.size()
    /** hash64 of every distinct shingle, indexed by interned id. */
    val hashById: Array[Long] = {
      val a = new Array[Long](nShingles)
      val entries = new java.util.ArrayList(interner.entrySet())
      java.util.stream.IntStream.range(0, entries.size()).parallel().forEach { i =>
        val e = entries.get(i)
        a(e.getValue.intValue()) = hash64(e.getKey)
      }
      a
    }
  }

  /** Sorted-array intersection size. */
  private def intersectionSize(a: Array[Int], b: Array[Int]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  private def jaccardOf(idx: ShingleIndex, a: Int, b: Int): Double = {
    val sa = idx.docShingles(a)
    val sb = idx.docShingles(b)
    val c = intersectionSize(sa, sb)
    round6(c.toDouble / (sa.length + sb.length - c))
  }

  /** MinHash+LSH near-dup pairs ≡ Dedup.minhashDedup(docs, threshold):
    * (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold,
    * restricted to banded-LSH candidates. */
  def minhashPairs(ids: Array[Long], texts: Array[String], threshold: Double,
                   k: Int = Dedup.MinhashK,
                   bandRows: Int = Dedup.BandRows): Seq[(Long, Long, Double)] = {
    val idx = new ShingleIndex(texts)
    val mod = Dedup.HashMod
    val nBands = k / bandRows
    // per-doc band signature strings (parallel)
    val bandSigs = new Array[Array[String]](idx.nDocs)
    java.util.stream.IntStream.range(0, idx.nDocs).parallel().forEach { d =>
      val sh = idx.docShingles(d)
      val m = new Array[Long](k)
      var i = 0
      while (i < k) {
        var best = Long.MaxValue
        var s = 0
        while (s < sh.length) {
          val xv = idx.hashById(sh(s)) % mod
          val v = (xv * (2 * i + 1) + i * 104729L) % mod
          if (v < best) best = v
          s += 1
        }
        m(i) = best
        i += 1
      }
      bandSigs(d) = Array.tabulate(nBands) { b =>
        val sb = new java.lang.StringBuilder()
        var r = 0
        while (r < bandRows) {
          if (r > 0) sb.append(',')
          sb.append(m(b * bandRows + r))
          r += 1
        }
        sb.toString
      }
    }
    // bucket join: same (band, sig) → candidate pair
    val buckets = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
    var d = 0
    while (d < idx.nDocs) {
      var b = 0
      while (b < nBands) {
        val key = b.toString + "|" + bandSigs(d)(b)
        var lst = buckets.get(key)
        if (lst == null) { lst = new java.util.ArrayList(); buckets.put(key, lst) }
        lst.add(d)
        b += 1
      }
      d += 1
    }
    // budget check BEFORE enumerating (like ngram/simhash): a heavily
    // duplicated corpus under the doc gate can still explode pairwise —
    // Overflow routes it to the distributed pipeline instead of OOMing.
    // The per-band sum overcounts distinct pairs (a pair sharing all
    // bands counts nBands×) — intentionally conservative: the HashSet
    // holds distinct pairs but the enumeration WORK is per-band, and a
    // corpus within a factor nBands of the budget is already a
    // multi-GB driver set better served by the distributed path.
    var nPairs = 0L
    buckets.values().forEach { lst =>
      val k = lst.size().toLong
      nPairs += k * (k - 1) / 2
    }
    checkEnumerable(nPairs)
    val cands = new java.util.HashSet[Long]()
    buckets.values().forEach { lst =>
      var i = 0
      while (i < lst.size()) {
        var j = i + 1
        while (j < lst.size()) {
          val da = lst.get(i).intValue(); val db = lst.get(j).intValue()
          if (ids(da) != ids(db)) {
            val (x, y) = if (ids(da) < ids(db)) (da, db) else (db, da)
            cands.add(x.toLong << 32 | y.toLong)
          }
          j += 1
        }
        i += 1
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    cands.forEach { enc =>
      val a = (enc >>> 32).toInt; val b = (enc & 0xffffffffL).toInt
      val jac = jaccardOf(idx, a, b)
      if (jac >= threshold) out += ((ids(a), ids(b), jac))
    }
    out.toSeq
  }

  /** Exact all-co-shingle-pairs Jaccard ≡ Dedup.ngramJaccardDedup:
    * (doc_a, doc_b, jaccard ≥ threshold) over every pair sharing ≥1
    * shingle, via the in-memory inverted index. */
  def ngramJaccardPairs(ids: Array[Long], texts: Array[String],
                        threshold: Double): Seq[(Long, Long, Double)] = {
    val idx = new ShingleIndex(texts)
    // inverted index: shingle id → doc indices containing it (counted
    // first so postings are primitive arrays, not boxed lists)
    val plen = new Array[Int](idx.nShingles)
    var d = 0
    while (d < idx.nDocs) {
      val sh = idx.docShingles(d)
      var i = 0
      while (i < sh.length) { plen(sh(i)) += 1; i += 1 }
      d += 1
    }
    val postings = new Array[Array[Int]](idx.nShingles)
    var s = 0
    while (s < idx.nShingles) { postings(s) = new Array[Int](plen(s)); s += 1 }
    java.util.Arrays.fill(plen, 0)
    d = 0
    while (d < idx.nDocs) {
      val sh = idx.docShingles(d)
      var i = 0
      while (i < sh.length) {
        val sid = sh(i)
        postings(sid)(plen(sid)) = d
        plen(sid) += 1
        i += 1
      }
      d += 1
    }
    // Enumerate one encoded (a, b) key per (shared shingle, pair) in
    // parallel stripes, then sort and run-length count: the run length IS
    // the common-shingle count (exactly the distributed join + groupBy
    // count), so no per-pair set intersection ever runs.
    val nStripes = Threads * 4
    val perStripe = new Array[Array[Long]](nStripes)
    java.util.stream.IntStream.range(0, nStripes).parallel().forEach { st =>
      var n = 0L
      var s = st
      while (s < idx.nShingles) {
        val k = postings(s).length.toLong
        n += k * (k - 1) / 2
        s += nStripes
      }
      checkEnumerable(n)
      val buf = new Array[Long](n.toInt)
      var w = 0
      s = st
      while (s < idx.nShingles) {
        val lst = postings(s)
        var i = 0
        while (i < lst.length) {
          var j = i + 1
          while (j < lst.length) {
            val da = lst(i); val db = lst(j)
            if (ids(da) != ids(db)) {
              val (x, y) = if (ids(da) < ids(db)) (da, db) else (db, da)
              buf(w) = x.toLong << 32 | y.toLong
              w += 1
            }
            j += 1
          }
          i += 1
        }
        s += nStripes
      }
      perStripe(st) = if (w == buf.length) buf else java.util.Arrays.copyOf(buf, w)
    }
    var total = 0L
    perStripe.foreach(a => total += a.length)
    checkEnumerable(total)
    val all = new Array[Long](total.toInt)
    var off = 0
    perStripe.foreach { a =>
      System.arraycopy(a, 0, all, off, a.length); off += a.length
    }
    java.util.Arrays.parallelSort(all)
    scoreRuns(idx, ids, all, threshold)
  }

  /** Run-length scoring over a sorted pair-key array: each run of equal
    * keys is one co-shingling pair, its length the common count. */
  private def scoreRuns(idx: ShingleIndex, ids: Array[Long], all: Array[Long],
                        threshold: Double): Seq[(Long, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    // ε-margin pre-filter: round6 (BigDecimal) costs ~0.5 µs and there
    // can be millions of candidate runs for a handful of survivors;
    // rounding moves a value by at most 5e-7, so no pair that rounds
    // past the threshold is lost.
    val eps = 1e-6
    var i = 0
    while (i < all.length) {
      val key = all(i)
      var j = i + 1
      while (j < all.length && all(j) == key) j += 1
      val common = j - i
      val a = (key >>> 32).toInt
      val b = (key & 0xffffffffL).toInt
      val na = idx.docShingles(a).length
      val nb = idx.docShingles(b).length
      val raw = common.toDouble / (na + nb - common)
      if (raw >= threshold - eps) {
        val jac = round6(raw)
        if (jac >= threshold) out += ((ids(a), ids(b), jac))
      }
      i = j
    }
    out.toSeq
  }

  /** 60-bit SimHash of ONE document; None for zero-token docs (the
    * explode semantics of the column pipeline). */
  def simhashOf(text: String): Option[Long] = {
    val tk = tokens(text)
    if (tk.isEmpty) return None
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < tk.length) { distinct.add(tk(i)); i += 1 }
    val counts = new Array[Int](60)
    distinct.forEach { t =>
      val h = hash64(t)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    Some(sig)
  }

  /** 60-bit SimHash signatures ≡ Dedup.simhash: (doc_id, simhash); docs
    * with zero tokens produce NO row (explode semantics). */
  def simhashSigs(ids: Array[Long], texts: Array[String]): Seq[(Long, Long)] = {
    val n = ids.length
    val sigs = new Array[Long](n)
    val present = new Array[Boolean](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { d =>
      simhashOf(texts(d)).foreach { sig =>
        sigs(d) = sig
        present(d) = true
      }
    }
    (0 until n).collect { case d if present(d) => (ids(d), sigs(d)) }
  }

  /** SimHash banded near-dup pairs ≡ Dedup.simhashDedup:
    * (doc_a, doc_b, hamming ≤ maxHamming) for pairs agreeing on any
    * 15-bit chunk. */
  def simhashPairs(ids: Array[Long], texts: Array[String],
                   maxHamming: Int): Seq[(Long, Long, Long)] = {
    val sigs = simhashSigs(ids, texts).toArray
    val buckets = new java.util.HashMap[Long, java.util.ArrayList[Integer]]()
    var i = 0
    while (i < sigs.length) {
      var c = 0
      while (c < 4) {
        val chunk = (sigs(i)._2 >>> (c * 15)) % (1L << 15)
        val key = c.toLong << 32 | chunk
        var lst = buckets.get(key)
        if (lst == null) { lst = new java.util.ArrayList(); buckets.put(key, lst) }
        lst.add(i)
        c += 1
      }
      i += 1
    }
    // Enumerate encoded ordered INDEX pairs per bucket in parallel (doc
    // ids may exceed 32 bits; indices cannot), then sort + unique — the
    // distributed distinct() — and score each unique pair once.
    val lists = new java.util.ArrayList(buckets.values())
    val perBucket = new Array[Array[Long]](lists.size())
    java.util.stream.IntStream.range(0, lists.size()).parallel().forEach { bi =>
      val lst = lists.get(bi)
      val n = lst.size().toLong * (lst.size() - 1) / 2
      checkEnumerable(n)
      val buf = new Array[Long](n.toInt)
      var w = 0
      var i = 0
      while (i < lst.size()) {
        var j = i + 1
        while (j < lst.size()) {
          val ii = lst.get(i).intValue(); val jj = lst.get(j).intValue()
          if (sigs(ii)._1 != sigs(jj)._1) {
            val (a, b) =
              if (sigs(ii)._1 < sigs(jj)._1) (ii, jj) else (jj, ii)
            buf(w) = a.toLong << 32 | b
            w += 1
          }
          j += 1
        }
        i += 1
      }
      perBucket(bi) = if (w == buf.length) buf else java.util.Arrays.copyOf(buf, w)
    }
    var total = 0L
    perBucket.foreach(a => total += a.length)
    checkEnumerable(total)
    val all = new Array[Long](total.toInt)
    var off = 0
    perBucket.foreach { a =>
      System.arraycopy(a, 0, all, off, a.length); off += a.length
    }
    java.util.Arrays.parallelSort(all)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var p = 0
    while (p < all.length) {
      val key = all(p)
      var q = p + 1
      while (q < all.length && all(q) == key) q += 1
      val a = (key >>> 32).toInt
      val b = (key & 0xffffffffL).toInt
      val ham = java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2).toLong
      if (ham <= maxHamming) out += ((sigs(a)._1, sigs(b)._1, ham))
      p = q
    }
    out.toSeq
  }

  /** Top-k tf-idf terms per document ≡ TextOps.tfidf(docs, k): rows
    * (doc_id, token, tf, df, score, rk), score = round6(tf·ln(N/df)),
    * ranked by (score desc, tf desc, df asc, token asc). The token
    * tie-break compares UTF-8 BYTES — Spark's UTF8String binary order —
    * because Java String.compareTo is UTF-16 code-unit order, which
    * diverges on supplementary characters. */
  def tfidfRows(ids: Array[Long], texts: Array[String], k: Int)
      : Seq[(Long, String, Long, Long, Double, Long)] = {
    // Duplicate doc_ids are ONE logical document — the distributed twin
    // aggregates term counts by (doc_id, token) — so merge their rows'
    // counts up front; counting rows independently would double-count
    // df and emit two rank lists for the same id.
    val rowsOf = new java.util.LinkedHashMap[java.lang.Long,
      java.util.ArrayList[Integer]]()
    var ri = 0
    while (ri < ids.length) {
      rowsOf.computeIfAbsent(ids(ri),
        _ => new java.util.ArrayList[Integer]()).add(ri)
      ri += 1
    }
    val n = rowsOf.size
    val uids = new Array[Long](n)
    val groups = new Array[java.util.ArrayList[Integer]](n)
    var u = 0
    rowsOf.forEach { (id, g) => uids(u) = id; groups(u) = g; u += 1 }
    val nCorpus = n.toDouble
    val tfs = new Array[java.util.HashMap[String, java.lang.Long]](n)
    val dfm = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.LongAdder]()
    java.util.stream.IntStream.range(0, n).parallel().forEach { d =>
      val m = new java.util.HashMap[String, java.lang.Long]()
      groups(d).forEach(r =>
        tokens(texts(r)).foreach(t =>
          m.merge(t, java.lang.Long.valueOf(1L), (a, b) => a + b)))
      tfs(d) = m
      m.keySet().forEach(t =>
        dfm.computeIfAbsent(t,
          _ => new java.util.concurrent.atomic.LongAdder()).increment())
    }
    def utf8Cmp(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val perDoc = new Array[Seq[(Long, String, Long, Long, Double, Long)]](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { d =>
      val entries = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Double)]
      tfs(d).forEach { (t, tf) =>
        val df = dfm.get(t).sum()
        entries += ((t, tf.longValue(), df,
          round6(tf.longValue() * math.log(nCorpus / df))))
      }
      val ranked = entries.sortWith { (x, y) =>
        if (x._4 != y._4) x._4 > y._4
        else if (x._2 != y._2) x._2 > y._2
        else if (x._3 != y._3) x._3 < y._3
        else utf8Cmp(x._1, y._1) < 0
      }.take(k)
      perDoc(d) = ranked.zipWithIndex.map { case ((t, tf, df, sc), i) =>
        (uids(d), t, tf, df, sc, i + 1L)
      }.toSeq
    }
    perDoc.toSeq.flatten
  }

  /** Winnowing overlap pairs ≡ the distributed `Dedup.winnowDedup`:
    * per-document [[graft.functions.WinnowFingerprints]] selection
    * (parallel), hot fingerprints (df > maxDf) leave the index, shared
    * counts over postings keyed by the (min, max) doc-id pair, kept at
    * n_shared ≥ minShared. */
  def winnowPairs(ids: Array[Long], texts: Array[String], k: Int, w: Int,
                  minShared: Long, maxDf: Long): Seq[(Long, Long, Long)] = {
    val n = ids.length
    val fps = new Array[Array[Long]](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { d =>
      fps(d) = graft.functions.WinnowFingerprints.compute(texts(d), k, w)
    }
    val df = new java.util.HashMap[java.lang.Long, Array[Int]]()
    var d = 0
    while (d < n) {
      fps(d).foreach(f =>
        df.computeIfAbsent(f, _ => new Array[Int](1))(0) += 1)
      d += 1
    }
    val postings =
      new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
    d = 0
    while (d < n) {
      fps(d).foreach { f =>
        if (df.get(f)(0) <= maxDf)
          postings.computeIfAbsent(f,
            _ => new java.util.ArrayList[Integer]()).add(d)
      }
      d += 1
    }
    var pairBudget = 0L
    val cnt = new java.util.HashMap[(Long, Long), Array[Long]]()
    postings.values.forEach { lst =>
      pairBudget += lst.size().toLong * (lst.size() - 1) / 2
      checkEnumerable(pairBudget)
      var i = 0
      while (i < lst.size()) {
        var j = i + 1
        while (j < lst.size()) {
          val a = ids(lst.get(i).intValue())
          val b = ids(lst.get(j).intValue())
          if (a != b) {
            val key = if (a < b) (a, b) else (b, a)
            cnt.computeIfAbsent(key, _ => new Array[Long](1))(0) += 1
          }
          j += 1
        }
        i += 1
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    cnt.forEach { (p, c) => if (c(0) >= minShared) out += ((p._1, p._2, c(0))) }
    out.sortBy(p => (p._1, p._2)).toSeq
  }

  /** Thrown when a kernel's candidate-pair enumeration would exceed the
    * in-memory budget; callers fall back to the distributed pipeline. */
  final class Overflow extends RuntimeException(
    "local dedup pair enumeration too large; use the distributed path")

  private def checkEnumerable(n: Long): Unit =
    if (n > (1L << 30)) throw new Overflow
}

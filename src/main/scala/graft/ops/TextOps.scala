package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, word-shingling, language ID (marker-ngram heuristic),
 * quality scoring, token counting, and document fingerprinting.
 *
 * Everything is built from codegen'd `org.apache.spark.sql.functions`
 * column expressions — no UDFs — so the whole pipeline stays inside
 * whole-stage codegen and scales linearly with executors (narrow maps;
 * the only shuffles are the explicit groupBys in consumers).
 */
object TextOps {

  /** Whitespace tokens, empties dropped (trim + split). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** (doc_id, tk ARRAY<STRING>) from a `documents`-shaped table. */
  def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))

  /** Distinct word n-gram shingles per document: (doc_id, shingle).
    * Per-document dedup happens MAP-SIDE (`array_distinct` on the
    * generated shingle array) — at zero shuffles; every consumer
    * (minhash, n-gram Jaccard, winnowing, decontamination) starts one
    * exchange shallower.
    *
    * PRECONDITION: `doc_id` must be unique per input row (one row per
    * document, the `documents` table contract). Only then is map-side
    * `array_distinct` equivalent to a global (doc_id, shingle)
    * `distinct()`; a caller passing duplicated doc_id rows (e.g. the
    * output of a join) would get duplicate (doc_id, shingle) pairs and
    * skew every count-based consumer. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    tokenized(docs)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(size(col("tk")) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(col("tk"), i, lit(n)))))).as("shingle"))

  /** Language-marker scores. The heuristic is deterministic and mirrored
    * 1:1 in the DuckDB oracle: per-language stopword hit counts + a CJK
    * codepoint count, argmax with a fixed priority chain. */
  private val Markers = Seq(
    "en" -> "\\b(the|and|of|to|is)\\b",
    "es" -> "\\b(el|la|de|que|los)\\b",
    "fr" -> "\\b(le|les|des|et|une)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b")

  /** (doc_id, s_en, s_es, s_fr, s_de, s_zh, lang_pred) */
  def langId(docs: DataFrame): DataFrame = {
    val scored = Markers.foldLeft(docs.select(col("doc_id"), col("text"))) {
      case (df, (lang, re)) =>
        df.withColumn(s"s_$lang",
          size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long"))
    }.withColumn("s_zh",
      size(regexp_extract_all(col("text"), lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
        .cast("long"))
    scored.withColumn("lang_pred",
      when(col("s_zh") > 0, "zh")
        .when(col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_de")), "en")
        .when(col("s_es") >= greatest(col("s_fr"), col("s_de")), "es")
        .when(col("s_fr") >= col("s_de"), "fr")
        .otherwise("de"))
      .drop("text")
  }

  /** Quality signals: char/token counts, mean token length, punctuation and
    * stopword ratios, and a composite score — the usual cheap pre-filter
    * stage of a data pipeline. All ratios rounded to 6dp for stable
    * comparison. */
  def quality(docs: DataFrame): DataFrame = {
    val tk = tokens(col("text"))
    val nTok = size(tk).cast("long")
    val nChars = length(col("text")).cast("long")
    val nPunct = size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
      .cast("long")
    val nStop = size(regexp_extract_all(col("text"),
      lit("\\b(the|a|and|of|to|in|is|it)\\b"), lit(0))).cast("long")
    // Σ length(token) == length of the separator-free concatenation —
    // a pure codegen expression; the equivalent aggregate() HOF fold
    // runs an interpreted lambda per token (same reasoning that moved
    // the fingerprint to a native expression)
    val avgTokLen = round(
      length(concat_ws("", tk)).cast("double") /
        greatest(nTok, lit(1L)), 6)
    val punctRatio = round(nPunct.cast("double") / greatest(nChars, lit(1L)), 6)
    val stopRatio = round(nStop.cast("double") / greatest(nTok, lit(1L)), 6)
    docs.select(
      col("doc_id"), nChars.as("n_chars"), nTok.as("n_tokens"),
      avgTokLen.as("avg_token_len"), punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      // composite: reward stopword density, penalize punctuation noise,
      // gate on minimal length
      round(when(nTok >= 10, stopRatio * 2.0 - punctRatio).otherwise(-1.0), 6)
        .as("quality_score"))
  }

  /** Token counts: whitespace words + BPE-ish subword pieces (letter runs,
    * digit runs, single punctuation marks — the classic pre-tokenizer
    * regex). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
        .as("bpe_ish_tokens"))

  // PII patterns — kept RE2-compatible (no backreferences/lookaround) so
  // the DuckDB oracle runs the exact same regexes.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub: count and redact emails, North-American-style phone
    * numbers, and IPv4 literals. Counts are taken on the original text;
    * redaction applies email → IP → phone so a pattern never matches
    * inside an earlier placeholder. Pure codegen `regexp_replace` /
    * `regexp_extract_all` — a narrow map at any scale. */
  def piiScrub(docs: DataFrame): DataFrame = {
    def n(re: String) =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
    docs.select(
      col("doc_id"),
      n(EmailRe).as("n_emails"),
      n(PhoneRe).as("n_phones"),
      n(Ipv4Re).as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"))
  }

  /** Within-document repetition signals (the Gopher/C4-style repetition
    * filters): distinct-token and distinct-bigram fractions. Entirely
    * within-row array expressions — no explode, no shuffle; the 100 TB
    * plan is a narrow map however wide the corpus is. */
  def repetition(docs: DataFrame): DataFrame = {
    val tk = tokens(col("text"))
    val nTok = size(tk).cast("long")
    val bigrams = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val nBi = size(bigrams).cast("long")
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      size(array_distinct(tk)).cast("long").as("distinct_tokens"),
      nBi.as("n_bigrams"),
      size(array_distinct(bigrams)).cast("long").as("distinct_bigrams"),
      round(lit(1.0) - size(array_distinct(tk)).cast("double") /
        greatest(nTok, lit(1L)), 6).as("token_rep_ratio"),
      round(lit(1.0) - size(array_distinct(bigrams)).cast("double") /
        greatest(nBi, lit(1L)), 6).as("bigram_rep_ratio"))
  }

  /** Benchmark decontamination — the train/eval overlap check every
    * training-data pipeline runs before shipping a corpus: flag corpus
    * documents that share any word n-gram with a benchmark document.
    *
    * `isBenchmark` partitions the input (deterministically, so the
    * oracle can re-derive it). Shingling reuses [[shingles]] (distinct
    * n-grams; documents shorter than n contribute their full text as
    * one shingle, so short eval prompts still match verbatim copies).
    *
    * 100 TB shape: the benchmark shingle set is small by construction
    * (eval suites are MBs, corpora are TBs) → Spark broadcasts it and
    * the overlap join is a map-side hash semi-join over the corpus
    * shingles; one groupBy(doc_id) shuffle aggregates hit counts. No
    * part of the corpus is ever on the build side. */
  def decontaminate(docs: DataFrame, isBenchmark: Column,
                    n: Int = 8): DataFrame = {
    val corpus = docs.where(!isBenchmark)
    val bench = docs.where(isBenchmark)
    val benchSh = shingles(bench, n).select(col("shingle")).distinct()
    // single pass over the corpus shingles: mark benchmark membership
    // with a broadcast left join, then count total + hits in ONE
    // groupBy — the shingle explode (the expensive part at corpus
    // scale) runs once, not once per aggregate
    shingles(corpus, n)
      .join(broadcast(benchSh.withColumn("m", lit(1))), Seq("shingle"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        count(col("m")).as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        when(col("n_overlap") > 0, 1L).otherwise(0L).as("contaminated"))
  }

  /** Exact quality-score quartiles per stratum (the distribution
    * check behind per-language / per-source filter thresholds):
    * (stratum, n_docs, q25, q50, q75). `strata` carries
    * (doc_id, stratum).
    *
    * NOT Spark's `percentile` aggregate: that buffers every value of a
    * stratum in one aggregation buffer (a single enormous stratum OOMs
    * one task), and its interpolation arithmetic differs from other
    * engines' `quantile_cont` in the last ulp — `round` then amplifies
    * the ulp to a visible digit whenever the interpolated value lands
    * on a rounding boundary (quartile fractions {.25,.5,.75} of
    * 6-decimal scores do, often).
    *
    * Instead, engine-exact linear interpolation from integer order
    * statistics: scores become exact micro-units (round6 × 1e6 — a
    * lossless long), `OrderStats.selectRanks` ships the two bracketing
    * order statistics per quartile (range-partitioned sort + two-phase
    * prefix scan — no per-stratum buffering anywhere), and the quartile
    * is ((4−r)·v_lo + r·v_hi) / 4e6 with h = k·(n−1), lo = h div 4,
    * r = h mod 4 — all-integer until one final division that every
    * engine evaluates identically. */
  def qualityPercentiles(docs: DataFrame, strata: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = quality(docs).select(col("doc_id"), col("quality_score"))
      .join(strata, "doc_id")
      .select(col("stratum"),
        round(col("quality_score") * lit(1000000d), 0).cast("long").as("qm"))
    // the regex-heavy scoring pipeline would otherwise run twice (the
    // range-partitioner sample, the selection sort) — persist its
    // projection once; the per-stratum counts ride along inside
    // selectRanks' pass 1 (selectRanksWithStats), so the separate
    // count-reduce pass an earlier version paid is gone. Consumers are
    // eager, so the cache drops before return
    val qRdd = q.as[(String, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (sel, stats) = try {
      val (s0, keyStats) = OrderStats.selectRanksWithStats(spark, qRdd,
        n => (1 to 3).flatMap { k =>
          val h = k * (n - 1)
          Seq(h / 4, h / 4 + (if (h % 4 == 0) 0L else 1L))
        }.distinct)
      val c0 = keyStats.toSeq.map { case (k, s) => (k, s.n) }
        .toDF("stratum", "n_docs")
      (s0, c0)
    } finally qRdd.unpersist(blocking = false)
    def lo(k: Int) = expr(s"($k * (n_docs - 1)) div 4")
    def r(k: Int) = expr(s"($k * (n_docs - 1)) % 4")
    def hi(k: Int) =
      lo(k) + when(r(k) > 0, 1L).otherwise(0L)
    val picked = sel.join(stats, col("key") === col("stratum"))
      .groupBy(col("stratum"), col("n_docs"))
      .agg(
        max(when(col("rnk") === lo(1), col("value"))).as("v1lo"),
        max(when(col("rnk") === hi(1), col("value"))).as("v1hi"),
        max(when(col("rnk") === lo(2), col("value"))).as("v2lo"),
        max(when(col("rnk") === hi(2), col("value"))).as("v2hi"),
        max(when(col("rnk") === lo(3), col("value"))).as("v3lo"),
        max(when(col("rnk") === hi(3), col("value"))).as("v3hi"))
    def quart(k: Int, vlo: String, vhi: String) =
      (((lit(4L) - r(k)) * col(vlo) + r(k) * col(vhi)) / lit(4000000d))
    picked.select(col("stratum"), col("n_docs"),
      quart(1, "v1lo", "v1hi").as("q25"),
      quart(2, "v2lo", "v2hi").as("q50"),
      quart(3, "v3lo", "v3hi").as("q75"))
  }

  /** Top-k corpus vocabulary: (rank, token, n_docs, n_occurrences),
    * rank by (occurrences desc, token asc) — the vocab-building /
    * min-df analysis step ahead of tokenizer training.
    *
    * The top-k is `orderBy(...).limit(k)` = Spark's TakeOrdered: every
    * partition keeps its own k best and the driver merges k·partitions
    * rows — no global sort, no single-task vocab-sized partition, so a
    * billion-type vocabulary at 100 TB still ranks in one pass. The
    * only caveat is `countDistinct(doc_id)` (document frequency), which
    * costs the standard expand-shuffle; it rides the same groupBy key. */
  /** Per-document bigram cross-entropy under the corpus's own bigram
    * LM — the CCNet-style statistical-LM quality signal: documents
    * whose word transitions are improbable under the corpus
    * distribution (gibberish, boilerplate soup) score high and get
    * filtered; perplexity is `exp(cross_entropy_nats)`. Scoring
    * in-corpus keeps every bigram count ≥ 1, so no smoothing is needed
    * and the score is a pure function of exact integer counts (the
    * `ln` + round-6 rendering follows the [[entropy]] precedent —
    * engines agree bit-for-bit).
    *
    * Scale shape: ONE bigram explode feeds the model counts (two
    * partially-aggregated groupBys — bigram types and context types on
    * the exchange, never occurrences) and the scoring join — keyed on
    * (w1, w2) / (w1); the context table is vocabulary-sized (often
    * broadcastable), hot stopword contexts are AQE-skew-join fodder;
    * the final per-doc rollup partially aggregates. */
  def bigramCrossEntropy(docs: DataFrame): DataFrame = {
    val toks = tokenized(docs).where(size(col("tk")) >= 2)
    val bg = toks.select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => struct(element_at(col("tk"), i).as("w1"),
          element_at(col("tk"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // the context count is a MARGINAL of the bigram count — cc(w1) =
    // Σ_w2 cb(w1, w2), every w1 occurrence heads exactly one bigram —
    // so it aggregates the TYPE table (≪ occurrences), not a second
    // full tokenize + explode + occurrence-keyed exchange of the
    // corpus (guide §2.3: aggregate the aggregate). Attaching cc to cb
    // first also makes the occurrence probe ONE join instead of two.
    val cbcc = cb
      .withColumn("cc", sum(col("cb"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("w1")))
    bg.join(cbcc, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log(col("cb").cast("double") / col("cc"))) /
          count(lit(1)), 6).as("cross_entropy_nats"))
  }

  /** N-gram inventory statistics for n = 1..maxN: distinct type count,
    * total occurrences, and hapax count (types seen exactly once) — the
    * Heaps'-law / novelty profile an LM-data curator reads to judge a
    * corpus's lexical richness and near-duplication (a duplicated
    * corpus collapses types while occurrences double; a rich corpus
    * grows hapaxes).
    *
    * Scale shape: one tokenize pass feeds maxN inline window-slice
    * generators (narrow explode, no shingle fallback); the only
    * shuffles are the per-(n, gram) partial-aggregated count and the
    * O(maxN)-group rollup — `count(DISTINCT gram)` as a naive agg
    * would re-shuffle every occurrence; the two-level groupBy ships
    * one row per type. */
  def ngramStats(docs: DataFrame, maxN: Int = 3): DataFrame = {
    val toks = tokenized(docs)
    val perN = (1 to maxN).map { n =>
      // sequence(1, 0) would run DESCENDING — guard short docs to an
      // empty gram array (explode then emits no rows)
      val grams = when(size(col("tk")) >= n,
        transform(sequence(lit(1), size(col("tk")) - (n - 1)),
          i => concat_ws(" ", slice(col("tk"), i, lit(n)))))
        .otherwise(array())
      toks.select(explode(grams).as("gram"))
        .select(lit(n.toLong).as("n"), col("gram"))
    }
    perN.reduce(_.unionAll(_))
      .groupBy("n", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_types"),
        sum(col("cnt")).as("n_occurrences"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
  }

  /** Count-Min estimated vs exact occurrence counts for the top-k
    * vocabulary tokens — the sketch-accuracy audit a frequency-sketch
    * deployment runs before trusting estimates at corpora too large
    * for exact per-token counts.
    *
    * Scale shape: the corpus makes ONE pass through the
    * [[graft.functions.CountMinSketch]] aggregate — a fixed
    * `8·depth·width`-byte grid per map partition on the exchange
    * (element-wise-sum merge), never a per-token shuffle; the exact
    * side is the [[vocabulary]] top-k (TakeOrdered). The k survivors
    * cross a ONE-ROW broadcast of the grid and read their `depth`
    * cells with the codegen'd polyhash — `cms_n ≥ exact_n` always (the
    * CMS upper-bound guarantee, pinned in specs). At audit time exact
    * counts exist only for the k probed tokens; the sketch serves
    * everything else. */
  def cmsTokenCounts(docs: DataFrame, k: Int = 20, depth: Int = 4,
                     width: Int = 512): DataFrame = {
    val occ = tokenized(docs).select(explode(col("tk")).as("token"))
    val sketch = occ.agg(
      graft.functions.CountMinSketch.of(col("token"), depth, width)
        .as("grid"))
    cmsEstimates(vocabulary(docs, k)
        .select(col("rank"), col("token"),
          col("n_occurrences").as("exact_n")),
      sketch, depth, width)
  }

  /** The point-estimate half of [[cmsTokenCounts]]: probe a one-row
    * `grid` table (any provenance — one batch pass, a streaming state
    * snapshot, or day-shards merged by element-wise sum) for each
    * vocab row's depth cells. */
  def cmsEstimates(vocab: DataFrame, sketch: DataFrame, depth: Int,
                   width: Int): DataFrame = {
    val est = (0 until depth).map { r =>
      element_at(col("grid"),
        (lit(r * width) + pmod(graft.functions.StringPolyHash.fingerprint(
          concat(lit(s"$r:"), col("token"))), lit(width.toLong)) + 1L)
          .cast("int"))
    }.reduce(least(_, _))
    vocab.crossJoin(broadcast(sketch))
      .select(col("rank"), col("token"), col("exact_n"), est.as("cms_n"))
  }

  def vocabulary(docs: DataFrame, k: Int = 100): DataFrame = {
    val agg = tokenized(docs)
      .select(col("doc_id"), explode(col("tk")).as("token"))
      .groupBy("token").agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token")).limit(k)
    // rank materializes over the k collected survivors only
    agg.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_occurrences").desc, col("token"))).cast("long"))
      .select("rank", "token", "n_docs", "n_occurrences")
  }

  /** Per-document token (Shannon) entropy in nats:
    * H = ln(n) − Σ c·ln(c) / n over in-document term counts c — the
    * lexical-diversity signal low-quality/boilerplate filters threshold
    * on (degenerate repetition → H near 0). Token-less documents emit
    * no row.
    *
    * One explode + two partial-aggregated groupBys, no window, no UDF.
    * Output: (doc_id, n_tokens, n_types, entropy). */
  def tokenEntropy(docs: DataFrame): DataFrame =
    tokenized(docs)
      .select(col("doc_id"), explode(col("tk")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        round(log(sum(col("c"))) -
          sum(col("c") * log(col("c"))) / sum(col("c")), 6).as("entropy"))

  /** Top-k characteristic terms per document by tf-idf:
    * score = tf · ln(N / df) with tf the in-document term count, df the
    * number of documents containing the term, N the corpus size — the
    * keyword-extraction step behind topic tagging and near-dup triage.
    *
    * Two groupBys (term frequency, document frequency) + one join on
    * `token`; N is a one-row aggregate broadcast into the scorer. The
    * final top-k ranks inside a `partitionBy(doc_id)` window — millions
    * of small hash-distributed groups, not a global sort, so the rank
    * stage stays balanced at corpus scale. Rank order is the ROUNDED
    * score (then tf desc, df asc, token asc), so the ordering the
    * oracle sees is exactly the ordering we rank by.
    *
    * The tf table feeds BOTH the document-frequency aggregate and the
    * scorer's probe side, and Catalyst does not reuse the exchange
    * across the two references, so the corpus is tokenized and
    * partially aggregated twice. MEASURED, not guessed: materializing
    * tf instead (persist + eager result checkpoint) ran 5× SLOWER at
    * sf0.1 (columnar cache build of the fat intermediate dwarfs the
    * recompute) and a lazy `localCheckpoint` was time-neutral while
    * losing lineage — on a 1000-executor job an executor loss would
    * abort the query instead of recomputing. Two lineage-safe corpus
    * scans is the plan you actually want.
    *
    * Output: (doc_id, token, tf, df, score, rk), rk = 1..k.
    *
    * Hybrid: under the dedup corpus gate (the input is the same
    * collected (ids, texts) arrays the dedup kernels share), the
    * driver-local [[LocalDedup.tfidfRows]] kernel computes the same
    * rows and ships them back broadcast ([[graft.functions.Ship]]);
    * equality against the distributed twin is spec'd. */
  def tfidf(docs: DataFrame, k: Int = 3): DataFrame =
    Dedup.localDocs(docs).map { case (ids, texts) =>
      val r = LocalDedup.tfidfRows(ids, texts, k)
      graft.functions.Ship.df(docs.sparkSession,
        "doc_id" -> r.map(_._1).toArray, "token" -> r.map(_._2).toArray,
        "tf" -> r.map(_._3).toArray, "df" -> r.map(_._4).toArray,
        "score" -> r.map(_._5).toArray, "rk" -> r.map(_._6).toArray)
    }.getOrElse(tfidfDistributed(docs, k))

  private def tfidfDistributed(docs: DataFrame, k: Int): DataFrame = {
    val tf = tokenized(docs)
      .select(col("doc_id"), explode(col("tk")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_corpus"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_corpus").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tf").desc, col("df"), col("token"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("rk"))
  }

  /** Bigram conditional probabilities P(w2 | w1) = c(w1 w2) / c(w1 ·)
    * over the corpus, for bigrams seen at least `minCount` times — the
    * count table behind statistical LM quality filters.
    *
    * One explode + one groupBy(w1, w2); the conditional denominator is
    * a window sum over the w1 partition of the ALREADY-AGGREGATED
    * bigram table (|distinct bigrams| rows, not |corpus tokens|), so
    * the second exchange is small; minCount prunes the long tail before
    * output. */
  def bigramConditional(docs: DataFrame, minCount: Long = 5L): DataFrame = {
    val tk = tokens(col("text"))
    val bigrams = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val counts = docs
      .select(explode(bigrams).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val w1Tot = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    counts
      .withColumn("c1", sum(col("c12")).over(w1Tot))
      .where(col("c12") >= minCount)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        round(col("c12").cast("double") / col("c1"), 6).as("p_cond"))
  }

  /** Top-k collocations by pointwise mutual information over the
    * bigram event space — `pmi(w1,w2) = ln(c12·N / (c1·c2))` where
    * `c1`/`c2`/`N` are the left/right/total marginals of the
    * adjacent-bigram counts, reported for pairs with `c12 ≥ minCount`.
    * PMI is the standard phrase-mining signal (BPE-style merges rank
    * by raw frequency; PMI surfaces pairs that co-occur far above
    * chance even when rare).
    *
    * Scale shape: the corpus is scanned ONCE — the bigram-count table
    * is materialized (bounded by bigram TYPES, not occurrences) and
    * feeds all four consumers: both marginal groupBys (vocabulary-
    * keyed partial aggs), the one-row broadcast total, and the scored
    * join. Marginal joins stay key-partitioned equi-joins (a 100 TB
    * corpus has a fact-sized vocabulary); the global top-k is a
    * TakeOrderedAndProject on the 6-dp score with a total (w1, w2)
    * tie-break. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
                      k: Int = 100): DataFrame = {
    val tk = tokens(col("text"))
    val bigrams = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    // persist, not localCheckpoint: the bigram-TYPE table is
    // vocabulary² -sized (unlike the tiny capped tables checkpointed
    // elsewhere) — an eager local checkpoint would pin unreplicated,
    // lineage-TRUNCATED blocks that an executor loss could never
    // recompute at scale. Lazy MEMORY_AND_DISK keeps the one-scan
    // sharing across the four consumers, full lineage recovery, and
    // ContextCleaner-driven release once the plan is unreachable.
    val bc = docs
      .select(explode(bigrams).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m1 = bc.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val m2 = bc.groupBy("w2").agg(sum(col("c12")).as("c2"))
    val nTotal = bc.agg(sum(col("c12")).as("n_bigrams"))
    bc
      .where(col("c12") >= minCount)
      .join(m1, "w1")
      .join(m2, "w2")
      .crossJoin(broadcast(nTotal))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(log(col("c12").cast("double") * col("n_bigrams") /
          (col("c1").cast("double") * col("c2"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Fixed-size overlapping token chunking — the step that slices
    * documents into embedding/context-window pieces. Chunk i of a
    * document covers tokens [i·stride + 1, i·stride + chunkSize]
    * (1-based), the final chunk keeping whatever tail remains; chunks
    * overlap by (chunkSize − stride) tokens. Token-less documents
    * produce no chunks.
    *
    * Pure narrow map: tokenize → explode a chunk-index sequence →
    * per-chunk slice/join, all codegen'd column expressions. No
    * shuffle; output size is ~|corpus tokens| / stride rows, linear in
    * input — at 100 TB this is a scan-speed map feeding the embedding
    * stage. Output: (doc_id, chunk_idx, start_tok, n_chunk_tokens,
    * chunk_text). */
  def chunks(docs: DataFrame, chunkSize: Int = 64,
             stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"chunks: need 0 < stride <= chunkSize, got ($chunkSize, $stride)")
    val lastIdx = ((greatest(col("n_tok") - chunkSize, lit(0))
      + (stride - 1)) / stride).cast("long")
    val start = col("chunk_idx") * stride + 1
    val len = least(lit(chunkSize.toLong),
      col("n_tok") - col("chunk_idx") * stride)
    docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .where(col("n_tok") > 0)
      .select(col("doc_id"), col("tk"), col("n_tok"),
        explode(sequence(lit(0L), lastIdx)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        start.as("start_tok"), len.as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("tk"), start.cast("int"), len.cast("int")))
          .as("chunk_text"))
  }

  /** Streaming twin of [[decontaminate]]: score a document stream
    * against a STATIC benchmark table. The benchmark shingle set is
    * collected once (small by construction — eval suites, not corpora)
    * and broadcast; each streamed document computes its in-row distinct
    * shingle array and counts membership map-side. Completely
    * stateless — no watermark, no state store, no shuffle — so it runs
    * at ingest rate on any number of executors. Output contract matches
    * the batch operator row-for-row for the same documents. */
  def decontaminateStream(stream: DataFrame, bench: DataFrame,
                          n: Int = 8): DataFrame = {
    val spark = bench.sparkSession
    require(!bench.isStreaming, "benchmark must be a static table")
    val benchSet = shingles(bench, n).select("shingle")
      .distinct().collect().map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(benchSet)
    val hits = udf { (sh: Seq[String]) => sh.count(bc.value.contains).toLong }
    val shArr = array_distinct(transform(
      sequence(lit(1), greatest(size(col("tk")) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(col("tk"), i, lit(n)))))
    stream.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), shArr.as("sh"))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_grams"),
        hits(col("sh")).as("n_overlap"))
      .withColumn("contaminated",
        when(col("n_overlap") > 0, 1L).otherwise(0L))
  }

  /** Polynomial rolling-hash fingerprint over the document's code points:
    * h = fold(h * 31 + codepoint) mod 1e9+7 — cheap, order-sensitive,
    * SQL-mirrorable. Native codegen expression
    * ([[graft.functions.StringPolyHash]]) — the HOF formulation it
    * replaces allocated a per-character array and ran interpreted. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.StringPolyHash.fingerprint(col("text"))
        .as("fingerprint"))

  /** EXACT corpus heavy hitters: every token whose global occurrence
    * count is ≥ θ·N for θ = thetaNum/thetaDen (N = total token
    * occurrences), with its exact count and corpus share — the
    * stopword/boilerplate-discovery scan ahead of vocabulary pruning
    * and contamination triage. θ is a RATIONAL and the threshold test
    * is the integer cross-multiplication n·thetaDen ≥ thetaNum·N: a
    * double `ceil(θ·N)` rounds 0.002·55000 up to 111 in binary
    * floating point while a decimal engine gets 110 — the integer
    * form is exact in every engine (valid while N·thetaDen < 2^63,
    * i.e. beyond 10^16 tokens at the default θ).
    *
    * The naive plan — `groupBy(token).count()` then filter — partially
    * aggregates map-side, but the exchange still carries one row per
    * (partition, distinct token): for a heavy-tailed 100 TB corpus
    * that is billions of hapax types shuffled only to be discarded by
    * the HAVING. Two passes keep the shuffle candidate-sized instead:
    *
    *  1. CANDIDATES — each input partition streams its tokens through
    *     a Misra-Gries summary of capacity ⌈2/θ⌉. MG guarantees any
    *     item with partition-local count > n_p/cap survives the
    *     partition, and averaging guarantees a globally θ-heavy token
    *     is locally θ-heavy in at least one partition (if count_p <
    *     θ·n_p for all p, summing contradicts count ≥ θ·N); with
    *     cap ≥ 2/θ the local survival bound n_p/cap ≤ θ·n_p/2 sits
    *     strictly under that, so the union of per-partition summaries
    *     is a SUPERSET of the true heavy hitters — ≤ cap tokens per
    *     partition, regardless of vocabulary size.
    *  2. EXACT — rescan, map every non-candidate token to NULL via a
    *     broadcast join against the candidate set, and count groups:
    *     partial aggregation folds the entire long tail into one NULL
    *     row per partition, so the exchange carries ≤ cap·partitions
    *     + partitions rows total. The NULL group also completes N
    *     (= Σ all group counts) without a third corpus scan; the tiny
    *     grouped table is eagerly checkpointed so the total and the
    *     final filter don't re-run the pass.
    *
    * The sketch pass is heuristic but the OUTPUT is exact and
    * deterministic: candidates only ever over-approximate, and the
    * final threshold filter uses true counts. Output: (token,
    * n_occurrences, share), share rounded to 6dp. */
  def heavyHitters(docs: DataFrame, thetaNum: Long = 1L,
                   thetaDen: Long = 500L): DataFrame = {
    require(thetaNum > 0 && thetaDen >= thetaNum,
      s"theta = $thetaNum/$thetaDen must be in (0,1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = math.max(8, (2L * thetaDen / thetaNum).toInt)
    val toks = tokenized(docs).select(explode(col("tk")).as("token"))
    val candidates = toks.as[String].mapPartitions { it =>
      val m = new java.util.HashMap[String, java.lang.Long](cap * 2)
      while (it.hasNext) {
        val t = it.next()
        val cur = m.get(t)
        if (cur != null) m.put(t, cur + 1L)
        else if (m.size < cap) m.put(t, 1L)
        else {
          // Misra-Gries decrement: all counters down one, zeros evicted
          val entries = m.entrySet().iterator()
          while (entries.hasNext) {
            val e = entries.next()
            if (e.getValue == 1L) entries.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      scala.jdk.CollectionConverters.SetHasAsScala(m.keySet()).asScala.iterator
    }.toDF("token").distinct()
    val grouped = toks
      .join(broadcast(candidates.withColumn("cand", lit(1))),
        Seq("token"), "left")
      .select(when(col("cand").isNotNull, col("token")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_occurrences"))
      .localCheckpoint(true) // ≤ cap·partitions + 1 rows
    val total = grouped.agg(sum(col("n_occurrences")).as("n_total"))
    grouped
      .where(col("t").isNotNull)
      .crossJoin(broadcast(total))
      .where(col("n_occurrences") * lit(thetaDen) >=
        lit(thetaNum) * col("n_total"))
      .select(col("t").as("token"), col("n_occurrences"),
        round(col("n_occurrences") / col("n_total"), 6).as("share"))
  }

  /** Corpus composition profile per (source, lang): doc/char/token
    * counts, mean quality score, and each stratum's share of corpus
    * tokens — the table a data-mix designer reads before setting
    * sampling weights.
    *
    * One groupBy over codegen'd per-doc signals. The mean is computed
    * in exact integer micro-units (round6 × 1e6 per doc, summed as
    * long, ONE final double division) so it is bit-identical across
    * engines — a double `avg` accumulates in partition order and can
    * flip the 6th decimal. Token share divides two exact longs; the
    * grouped table (≤ |sources|·|langs| rows) is eagerly checkpointed
    * so the corpus-total crossJoin doesn't rescan the corpus. */
  def corpusStats(docs: DataFrame, meta: DataFrame): DataFrame = {
    val perDoc = quality(docs)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        round(col("quality_score") * lit(1000000d), 0).cast("long").as("qm"))
      .join(meta.select(col("doc_id"), col("source"), col("lang")), "doc_id")
    val grouped = perDoc.groupBy("source", "lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("qm")).as("sum_qm"))
      .localCheckpoint(true) // ≤ |sources|·|langs| rows
    val total = grouped.agg(sum(col("n_tokens")).as("corpus_tokens"))
    grouped.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
        col("n_tokens"),
        round(col("sum_qm") / (col("n_docs") * lit(1000000d)), 6)
          .as("mean_quality"),
        round(col("n_tokens") / col("corpus_tokens"), 6).as("token_share"))
  }

  /** Token-length histogram in power-of-two buckets: bucket k holds
    * docs with n_tokens in [2^k, 2^(k+1)) — the sequence-length
    * distribution a packing planner sizes context windows against.
    * The bucket index is the INTEGER bit length (digits of the base-2
    * rendering, minus one), not ⌊log₂⌋ of a double — `log2(2^k)` can
    * land on 8.999… and misbucket exact powers, and it can't differ
    * between engines if no engine computes a logarithm. One narrow map
    * + one tiny groupBy (≤ 64 buckets). */
  def tokenHistogram(docs: DataFrame): DataFrame =
    tokenized(docs)
      .select((length(conv(size(col("tk")).cast("long").cast("string"),
          10, 2)) - 1).cast("long").as("bucket"),
        size(col("tk")).cast("long").as("n"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        min(col("n")).as("min_tokens"),
        max(col("n")).as("max_tokens"))

  /** Winnowing fingerprint selection (the MOSS scheme, Schleimer/
    * Wilkerson/Aiken SIGMOD'03 §4, 0-gram robustness variant with
    * plain window minima): k-token shingles are hashed with the
    * [[graft.functions.StringPolyHash]] polynomial (oracle-identical),
    * every window of `w` consecutive shingle hashes keeps its MINIMUM,
    * and the per-document fingerprint set is the distinct selected
    * hashes. Guarantee: two documents sharing any run of ≥ w+k−1
    * tokens share at least one fingerprint, while only ~2/(w+1) of
    * shingle hashes are retained — the index stays small at corpus
    * scale.
    *
    * Scale shape: everything up to the final explode is a within-row
    * array expression — a narrow, shuffle-free map over the corpus; no
    * join, no aggregation, no window function. Documents shorter than
    * k tokens hash their whole token list (the `shingles` convention);
    * shingle lists shorter than w keep their single global minimum, so
    * every document emits ≥ 1 fingerprint. */
  def winnow(docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.WinnowFingerprints.of(col("text"), k, w))
        .as("fingerprint"))

  /** The composed-column winnow formulation the native expression
    * replaced — kept as the equality reference for its property spec
    * (it IS the oracle's computation, lambda for lambda). */
  private[graft] def winnowComposed(docs: DataFrame, k: Int,
                                    w: Int): DataFrame = {
    val tk = tokens(col("text"))
    val hashes = transform(
      sequence(lit(1), greatest(size(tk) - (k - 1), lit(1))),
      i => graft.functions.StringPolyHash.fingerprint(
        concat_ws(" ", slice(tk, i, lit(k)))))
    docs
      .select(col("doc_id"), hashes.as("hs"))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
          j => array_min(slice(col("hs"), j, lit(w)))))).as("fingerprint"))
  }

  /** Out-of-vocabulary rate per document against the corpus top-`vocabSize`
    * vocabulary (count-desc, token-asc ranked — the `tx_vocab` order).
    * The vocabulary build is the standard explode + partial-agg'd count
    * with a bounded top-k collect (`vocabSize` rows cross the driver by
    * construction — a top-k result, not a gated spill); the per-document
    * probe is then a narrow membership filter against the in-plan
    * vocabulary literal — no per-token join, no second shuffle over the
    * corpus. */
  def oovRate(docs: DataFrame, vocabSize: Int = 100): DataFrame = {
    val vocab = tokenized(docs)
      .select(explode(col("tk")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .select("token").collect().map(_.getString(0)).toSeq
    val tk = tokens(col("text"))
    val vlit = typedLit(vocab)
    docs
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(filter(col("tk"), t => !array_contains(vlit, t)))
          .cast("long").as("n_oov"))
      .withColumn("oov_ratio",
        round(col("n_oov").cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Equality specs for the hybrid dedup executor: the driver-local
  * [[LocalDedup]] kernels must produce EXACTLY the distributed column
  * pipelines' output (same hashing, banding, rounding, edge cases) on
  * every gated entry point. Mirrors LocalCsrSpec's kernel ≡ DataFrame
  * contract. */
class LocalDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Messy corpus: near-dups, exact dups, empty/whitespace/short docs,
    * tabs inside text (regex-split but NOT trimmed by StringTrim). */
  private def messy: DataFrame = docs(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, ""),
    (4L, "   "),
    (5L, "\tthe quick brown fox jumps over the lazy dog\t"),
    (6L, "one"),
    (7L, "one two"),
    (8L, "completely different words here nothing shared at all"),
    (9L, "the quick brown fox leaps over the lazy dog"),
    (10L, "punctuation, heavy! text; with: marks? everywhere."),
    (11L, "punctuation, heavy! text; with: marks? everywhere."))

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  /** Run `q` twice — kernel path (default gate) vs distributed path
    * (gate 0) — and require identical rows. */
  private def bothWays(q: => DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    spark.conf.unset("spark.graft.localDedupMaxDocs")
    val local = sorted(q)
    spark.conf.set("spark.graft.localDedupMaxDocs", "0")
    val dist = try sorted(q)
    finally spark.conf.unset("spark.graft.localDedupMaxDocs")
    (local, dist)
  }

  test("kernel primitives mirror the column expressions") {
    // trim: spaces only — tabs survive into the split
    assert(LocalDedup.tokens("  a b  ").toSeq === Seq("a", "b"))
    assert(LocalDedup.tokens("\ta\tb\t").toSeq === Seq("a", "b"))
    assert(LocalDedup.tokens("").toSeq === Seq.empty)
    assert(LocalDedup.tokens("   ").toSeq === Seq.empty)
    // shingles: clamp to one (possibly short/empty) shingle
    assert(LocalDedup.shingleStrings(Array[String]()).toSeq === Seq(""))
    assert(LocalDedup.shingleStrings(Array("x")).toSeq === Seq("x"))
    assert(LocalDedup.shingleStrings(Array("x", "y")).toSeq === Seq("x y"))
    assert(LocalDedup.shingleStrings(Array("a", "b", "c", "d")).toSeq ===
      Seq("a b c", "b c d"))
    // hash64 ≡ conv(substring(md5(s),1,15),16,10)
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    for (str <- Seq("", "a", "the quick", "µ unicode ✓")) {
      val expected = Seq(str).toDF("x")
        .select(Dedup.hash64(col("x"))).head().getLong(0)
      assert(LocalDedup.hash64(str) === expected, s"hash64($str)")
    }
  }

  test("minhashDedup: kernel ≡ distributed") {
    val (l, d) = bothWays(Dedup.minhashDedup(messy, 0.5))
    assert(l === d)
    assert(l.nonEmpty) // exact dups + near-dups must surface
  }

  test("ngramJaccardDedup: kernel ≡ distributed") {
    val (l, d) = bothWays(Dedup.ngramJaccardDedup(messy, 0.3))
    assert(l === d)
    assert(l.nonEmpty)
  }

  test("simhash signatures: kernel ≡ distributed (incl. empty-doc drop)") {
    val (l, d) = bothWays(Dedup.simhash(messy))
    assert(l === d)
    // docs 3 and 4 tokenize to nothing → no signature row
    assert(l.size === 10)
  }

  test("simhashDedup: kernel ≡ distributed") {
    val (l, d) = bothWays(Dedup.simhashDedup(messy, 10))
    assert(l === d)
    assert(l.nonEmpty)
  }

  test("kernel ≡ distributed on sf0.001 documents") {
    val t = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((name, q) <- Seq[(String, () => DataFrame)](
      ("minhash", () => Dedup.minhashDedup(t, 0.5)),
      ("ngram", () => Dedup.ngramJaccardDedup(t, 0.5)),
      ("simhash_sig", () => Dedup.simhash(t)),
      ("simhash", () => Dedup.simhashDedup(t, 3)))) {
      val (l, d) = bothWays(q())
      assert(l === d, name)
    }
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** BPE merge training: hand-checked selection order, greedy merge
  * semantics, and kernel ≡ distributed equality. */
class BpeSpec extends SparkSpec {

  test("learnLocal: hand-checked merge order and counts") {
    // "aaab"×3: pairs (a,a)=6, (a,b)=3; "ab"×2 adds (a,b)=2
    val m = Bpe.learnLocal(Array(("aaab", 3L), ("ab", 2L)), 5)
    // r1: (a,a)=6 wins; r2: (a,b)=5 beats (aa,a)=3; r3: (aa,ab)=3;
    // r4: no pairs left → stops early
    assert(m.toSeq === Seq(("a", "a", 6L), ("a", "b", 5L), ("aa", "ab", 3L)))
  }

  test("mergePair: greedy left-to-right, overlaps do not chain") {
    assert(Bpe.mergePair(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.mergePair(Seq("a", "a", "a", "a"), "a", "a")
      === Seq("aa", "aa"))
    assert(Bpe.mergePair(Seq("x"), "a", "a") === Seq("x"))
  }

  test("count ties break by (left, right) ascending") {
    // "ba"×2 and "ab"×2: (b,a)=2 ties (a,b)=2 → (a,b) first
    val m = Bpe.learnLocal(Array(("ba", 2L), ("ab", 2L)), 1)
    assert(m.toSeq === Seq(("a", "b", 2L)))
  }

  private def fuzzDocs(seed: Long): DataFrame = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(seed)
    val alphabet = "abcde é世"
    (0L until 80L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
  }

  test("encode: hand-checked token accounting under learned merges") {
    val s = spark; import s.implicits._
    // merges on this corpus: (a,a) then (a,b) then (aa,ab) — see the
    // learnLocal test; encoding "aaab" → [aa, ab] → [aaab] = 1 token,
    // "ab" → [ab] = 1 token (rank-2 merge).
    val d = Seq((1L, "aaab aaab aaab ab"), (2L, "ab")).toDF("doc_id", "text")
    val got = Bpe.encode(d, 5).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: 4 words, 4+4+4+2 = 14 code points → 1+1+1+1 = 4 tokens
    // doc 2: 1 word, 2 code points → 1 token
    assert(got.toSeq === Seq((1L, 4L, 14L, 4L), (2L, 1L, 2L, 1L)))
  }

  test("encode: multi-code-point symbols count once; totals bound tokens") {
    val s = spark; import s.implicits._
    val d = Seq((1L, "é世é é世é zz"), (2L, "zz é世é")).toDF("doc_id", "text")
    val got = Bpe.encode(d, 3).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n_syms counts code points (é世é = 3), and with 3 merge rounds
    // é世é collapses to one token, zz to one.
    assert(got.toSeq === Seq((1L, 3L, 8L, 3L), (2L, 2L, 5L, 2L)))
  }

  test("tie-break is code-point order (supplementary-plane symbols), " +
    "kernel ≡ distributed") {
    // U+1F600 (😀, code point 128512) vs U+E000 (57344): UTF-16
    // code-UNIT order sorts the surrogate pair 0xD83D.. BELOW 0xE000,
    // but code-point order (≡ UTF-8 bytes ≡ Spark UTF8String ≡ DuckDB)
    // sorts U+E000 first — the tie must go to U+E000 on both paths.
    val s = spark; import s.implicits._
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    val d = Seq((1L, s"${emoji}x ${pua}x")).toDF("doc_id", "text")
    spark.conf.unset("spark.graft.localBpeMaxTypes")
    val local = Bpe.learnMerges(d, 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    spark.conf.set("spark.graft.localBpeMaxTypes", "0")
    val dist = try Bpe.learnMerges(d, 1).collect()
      .map(r => (r.getString(1), r.getString(2)))
    finally spark.conf.unset("spark.graft.localBpeMaxTypes")
    assert(local.toSeq === Seq((pua, "x")))
    assert(dist.toSeq === local.toSeq)
  }

  test("learnMerges: kernel ≡ distributed (3 seeds)") {
    for (seed <- 1L to 3L) {
      val d = fuzzDocs(seed)
      spark.conf.unset("spark.graft.localBpeMaxTypes")
      val local = Bpe.learnMerges(d, 6).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      spark.conf.set("spark.graft.localBpeMaxTypes", "0")
      val dist = try Bpe.learnMerges(d, 6).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      finally spark.conf.unset("spark.graft.localBpeMaxTypes")
      assert(local.toSeq === dist.toSeq, s"seed=$seed")
      assert(local.nonEmpty, s"seed=$seed")
    }
  }
}

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

package graft

import graft.gen.Kronecker
import graft.rng.Mrg

/**
 * DuckDB oracle SQL for the MRG-driven generator family (q1_generate,
 * s4_*, s5_uniform, s7_weighted, q6_roots) — the full PRNG, R-MAT
 * descent, and vertex scramble re-derived INSIDE the oracle so DuckDB
 * independently recomputes every edge (reference semantics:
 * generator/graph_generator.hpp:602-705, generator/splittable_mrg.c).
 *
 * Three observations make this tractable in pure SQL:
 *
 * 1. Per-edge MRG state is `A^(i·2^64) · seed` (A = the order-5 MRG
 *    companion matrix over GF(2^31−1)). Decomposing i = b0 + 256·b1
 *    turns 16384 sequential skips into TWO 256-step recursive CTEs —
 *    a 25-column matrix recursion for `A^(b0·2^64)` and a 5-column
 *    vector recursion for `A^(b1·2^72) · seed` — joined per edge.
 *    The handful of matrix constants (A^(2^64), A^(2^72), …) are
 *    derived at class-load from the published L'Ecuyer recurrence by
 *    the same modular exponentiation `rng.Mrg` uses, then inlined as
 *    SQL literals.
 * 2. Draw k of an edge's descent is `row0(A^k) · state` — a closed-form
 *    5-term linear combination, no per-draw recursion. Twelve draws
 *    cover ten descent levels plus two rejection re-draws
 *    (`u < 0xFFFFFFFF mod 10000`, p ≈ 3.4e-6 each; the fixed
 *    seed-(2,3) stream at scale 10 contains zero rejections, so two
 *    spares are margin, and `list_filter` keeps semantics exact for
 *    any ≤2 rejections per edge).
 * 3. The scramble's bit-reverse-then-shift keeps only the low `scale`
 *    bits of each stage, so at scale 10 the whole uint64 hash collapses
 *    to arithmetic mod 1024: a 1024-row lookup CTE computed in SQL from
 *    three small constants (the seed-derived multipliers mod 1024).
 *
 * Scale note: these are CORRECTNESS oracles for the driver's DuckDB
 * gate at a fixed test scale — the distributed generators themselves
 * (gen/Kronecker.scala) stay pure narrow scans with no such bound.
 */
private[graft] object GenOracleSql {
  private val ModL = 2147483647L
  private val M = "2147483647"
  private type Mat = Array[Array[Long]]

  private val A: Mat = Array(
    Array(Mrg.X, 0L, 0L, 0L, Mrg.Y),
    Array(1L, 0L, 0L, 0L, 0L),
    Array(0L, 1L, 0L, 0L, 0L),
    Array(0L, 0L, 1L, 0L, 0L),
    Array(0L, 0L, 0L, 1L, 0L))

  private def matMul(a: Mat, b: Mat): Mat =
    Array.tabulate(5, 5) { (i, j) =>
      var acc = 0L
      var k = 0
      while (k < 5) { acc += a(i)(k) * b(k)(j) % ModL; k += 1 }
      acc % ModL
    }

  private def matPow(m: Mat, e: BigInt): Mat = {
    var r = Array.tabulate(5, 5)((i, j) => if (i == j) 1L else 0L)
    var base = m
    var ex = e
    while (ex > 0) {
      if (ex.testBit(0)) r = matMul(r, base)
      base = matMul(base, base)
      ex >>= 1
    }
    r
  }

  private def matVec(m: Mat, v: Array[Long]): Array[Long] =
    Array.tabulate(5)(i => (0 until 5).map(k => m(i)(k) * v(k) % ModL).sum % ModL)

  private val Seed: Array[Long] = {
    val st = Mrg.makeSeed(Kronecker.DefaultSeed1, Kronecker.DefaultSeed2)
    Array(st.z1, st.z2, st.z3, st.z4, st.z5)
  }

  private val M64 = matPow(A, BigInt(1) << 64)   // per-edge stride
  private val M72 = matPow(A, BigInt(1) << 72)   // 256-edge stride
  private val A256 = matPow(A, 256)
  // weight stream base: offset 30·2^128 + 46·2^64 (Kronecker.scala:184)
  private val WBase =
    matVec(matPow(A, (BigInt(30) << 128) + (BigInt(46) << 64)), Seed)
  // root-sample double stream base: offset 2·2^128 (Mrg.scala:158)
  private val RBase = matVec(matPow(A, BigInt(2) << 128), Seed)
  // draw k ∈ [1,12] of a descent = row0(A^k) · state, closed form
  private val DK: Array[Array[Long]] =
    Array.tabulate(12)(k => matPow(A, k + 1)(0))

  /** Scramble constants mod 1024 (only the low 10 bits ever survive the
    * bit-reverse-shift at scale 10); uint64 wraparound ≡ the same low
    * bits, so plain Long masking is exact. */
  private val (scrAdd, scrMulA, scrMulB) = {
    val (v0, v1) = Kronecker.scrambleVals(
      Kronecker.DefaultSeed1, Kronecker.DefaultSeed2)
    ((v0 + v1) & 1023L,
      (v0 | 0x4519840211493211L) & 1023L,
      (v1 | 0x3050852102C843A5L) & 1023L)
  }

  /** Mod-safe linear combination `coeffs · vars` over GF(2^31−1),
    * grouped 3+2 so every intermediate stays under 2^63. */
  private def combo(coeffs: Seq[Long], vars: Seq[String]): String = {
    val t = coeffs.zip(vars).collect { case (c, v) if c != 0 => s"($c*$v)%$M" }
    if (t.isEmpty) "0"
    else if (t.size <= 3) s"(${t.mkString(" + ")})%$M"
    else s"((${t.take(3).mkString(" + ")})%$M + (${t.drop(3).mkString(" + ")})%$M)%$M"
  }

  /** 10-bit reversal of column expression `c` (values in [0,1024)). */
  private def rev10(c: String): String =
    (0 until 10).map { k =>
      val out = 512 >> k
      if (k == 0) s"(($c)%2)*512"
      else if (k == 9) s"(($c)//512)%2"
      else s"(($c)//${1 << k}%2)*$out"
    }.mkString(" + ")

  /** 1024-row scramble lookup `scr(v, sv)`, computed in SQL. */
  private val ScrCte =
    s"""scr AS (SELECT v, CAST(${rev10("t2")} AS BIGINT) AS sv FROM (
       |  SELECT v, (${rev10("t1")})*$scrMulB % 1024 AS t2 FROM (
       |    SELECT unnest(generate_series(0, 1023)) AS v,
       |           ((v + $scrAdd) * $scrMulA) % 1024 AS t1)))""".stripMargin

  private val Vars = Seq("w1", "w2", "w3", "w4", "w5")

  /** 25-column recursion `name(b, m00..m44)`: M_0 = I, M_{b+1} = step·M_b
    * (powers of one matrix commute, so left-multiplying is exact). */
  private def matCte(name: String, step: Mat, n: Int = 255): String = {
    val cols = (for (r <- 0 until 5; k <- 0 until 5) yield s"m$r$k").mkString(", ")
    val base = (for (r <- 0 until 5; k <- 0 until 5)
      yield s"CAST(${if (r == k) 1 else 0} AS BIGINT)").mkString(", ")
    val rec = (for (r <- 0 until 5; j <- 0 until 5)
      yield combo(step(r).toSeq, (0 until 5).map(k => s"m$k$j"))).mkString(", ")
    s"""$name(b, $cols) AS (
       |  SELECT 0, $base
       |  UNION ALL
       |  SELECT b+1, $rec FROM $name WHERE b < $n)""".stripMargin
  }

  /** 5-column vector recursion `name(b, w1..w5)`: v_{b+1} = step·v_b. */
  private def vecCte(name: String, step: Mat, init: Array[Long],
                     n: Int = 255): String = {
    val base = init.map(x => s"CAST($x AS BIGINT)").mkString(", ")
    val rec = (0 until 5).map(r => combo(step(r).toSeq, Vars)).mkString(", ")
    s"""$name(b, w1, w2, w3, w4, w5) AS (
       |  SELECT 0, $base
       |  UNION ALL
       |  SELECT b+1, $rec FROM $name WHERE b < $n)""".stripMargin
  }

  /** Per-edge state join: `out(i, z1..z5) = mat[i mod 256] · vec[i div 256]`. */
  private def stateJoin(out: String, nEdges: Long, mat: String,
                        vec: String): String = {
    val zs = (0 until 5).map { r =>
      combo(Seq(1L, 1L, 1L, 1L, 1L),
        (0 until 5).map(k => s"m$r$k*w${k + 1}")) + s" AS z${r + 1}"
    }.mkString(",\n    ")
    s"""$out AS (
       |  SELECT e.i, $zs
       |  FROM (SELECT unnest(generate_series(0, ${nEdges - 1})) AS i) e
       |  JOIN $mat m ON m.b = e.i % 256
       |  JOIN $vec v ON v.b = e.i // 256)""".stripMargin
  }

  /** Twelve closed-form draws, rejection-filtered to the ten the descent
    * consumes (reference generate_4way_bernoulli's modulo-bias rejection,
    * graph_generator.hpp:651-677). */
  private val DrawsCte = {
    val us = DK.map(row => combo(row.toSeq, Seq("z1", "z2", "z3", "z4", "z5")))
      .mkString(", ")
    s"draws AS (SELECT i, list_filter([$us], u -> u >= 7295)[1:10] AS ks FROM states)"
  }

  private val QuadExpr =
    "list_transform(ks, u -> CASE WHEN u%10000 < 1900 THEN 1 " +
      "WHEN u%10000 < 3800 THEN 2 WHEN u%10000 < 9500 THEN 0 ELSE 3 END)"

  /** Ten unrolled clip-and-flip descent levels (scale 10). */
  private def descentCtes(scale: Int = 10): Seq[String] = {
    val l0 = s"l0 AS (SELECT i, $QuadExpr AS q, 0 AS bs, 0 AS bt FROM draws)"
    l0 +: (1 to scale).map { l =>
      val half = 1L << (scale - l)
      s"""l$l AS (SELECT i, q,
         |  bs + $half * (CASE WHEN bs = bt AND q[$l] = 2 THEN 0 ELSE q[$l]//2 END) AS bs,
         |  bt + $half * (CASE WHEN bs = bt AND q[$l] = 2 THEN 1 ELSE q[$l]%2 END) AS bt
         |  FROM l${l - 1})""".stripMargin
    }
  }

  private val KronCtes: Seq[String] =
    Seq(matCte("km", M64), vecCte("kv", M72, Seed),
      stateJoin("states", 16384, "km", "kv"), DrawsCte) ++ descentCtes()

  val q1: String =
    "WITH RECURSIVE\n" + (KronCtes :+ ScrCte).mkString(",\n") +
      """
        |SELECT CAST(sa.sv AS BIGINT) AS src, CAST(sb.sv AS BIGINT) AS dst
        |FROM l10 JOIN scr sa ON sa.v = bs JOIN scr sb ON sb.v = bt""".stripMargin

  val s4Tree: String =
    "WITH " + ScrCte +
      """,
        |e AS (SELECT unnest(generate_series(1, 1023)) AS i)
        |SELECT CAST(sa.sv AS BIGINT) AS src, CAST(sb.sv AS BIGINT) AS dst
        |FROM e JOIN scr sa ON sa.v = e.i JOIN scr sb ON sb.v = e.i // 2""".stripMargin

  /** Closing edge is (scramble(n), scramble(0)) — scramble(1024) ≡
    * scramble(0) mod 1024, bug-compatible with the reference's
    * out-of-range last edge (Kronecker.scala:139-142). */
  val s4Ham: String =
    "WITH " + ScrCte +
      """,
        |e AS (SELECT unnest(generate_series(0, 1023)) AS i)
        |SELECT CAST(sa.sv AS BIGINT) AS src, CAST(sb.sv AS BIGINT) AS dst
        |FROM e JOIN scr sa ON sa.v = (CASE WHEN e.i = 1023 THEN 0 ELSE e.i END)
        |JOIN scr sb ON sb.v = (CASE WHEN e.i = 1023 THEN 0 ELSE e.i + 1 END)""".stripMargin

  val s5: String = {
    val u1 = combo(DK(0).toSeq, Seq("z1", "z2", "z3", "z4", "z5"))
    val u2 = combo(DK(1).toSeq, Seq("z1", "z2", "z3", "z4", "z5"))
    "WITH RECURSIVE\n" +
      Seq(matCte("km", M64), vecCte("kv", M72, Seed),
        stateJoin("states", 16384, "km", "kv"), ScrCte).mkString(",\n") +
      s"""
         |SELECT CAST(sa.sv AS BIGINT) AS src, CAST(sb.sv AS BIGINT) AS dst
         |FROM (SELECT i, ($u1) % 1024 AS a, ($u2) % 1024 AS c FROM states) s
         |JOIN scr sa ON sa.v = s.a JOIN scr sb ON sb.v = s.c""".stripMargin
  }

  val s7: String = {
    val wdraw = combo(A(0).toSeq, Seq("z1", "z2", "z3", "z4", "z5"))
    val ctes = KronCtes ++ Seq(
      matCte("wm", A), vecCte("wv", A256, WBase),
      stateJoin("wstates", 16384, "wm", "wv"),
      s"wgt AS (SELECT i, CAST(($wdraw) % 255 + 1 AS INTEGER) AS weight FROM wstates)",
      ScrCte)
    "WITH RECURSIVE\n" + ctes.mkString(",\n") +
      """
        |SELECT CAST(sa.sv AS BIGINT) AS src, CAST(sb.sv AS BIGINT) AS dst, w.weight
        |FROM l10 JOIN scr sa ON sa.v = bs JOIN scr sb ON sb.v = bt
        |JOIN wgt w ON w.i = l10.i""".stripMargin
  }

  /** Root sampling with rejection (reference benchmark_helper.hpp:475-508)
    * over the lineitem-derived graph: candidate c draws two doubles
    * (four uints at stride A^4 from the 2·2^128 stream base), maps to
    * ⌊(d0+d1)·n⌋ mod n, and a sequential accept recursion rejects
    * duplicates and isolated vertices until 16 roots. 256 candidates is
    * 16× the observed consumption at the driver's scale. */
  val q6: String = {
    val graph =
      """raw AS (SELECT 2*l_orderkey AS src, 2*l_partkey+1 AS dst FROM lineitem),
        |clean AS (SELECT DISTINCT src, dst FROM (
        |  SELECT src, dst FROM raw WHERE src <> dst
        |  UNION ALL SELECT dst, src FROM raw WHERE src <> dst)),
        |verts AS (SELECT DISTINCT src AS vertex FROM clean),
        |nv AS (SELECT max(greatest(src, dst)) + 1 AS n FROM clean)""".stripMargin
    val us = (0 until 4).map(k => combo(DK(k).toSeq, Vars))
    // Parenthesized to the kernel's pairing — two nextDouble() values
    // summed as (d0 + d1), NOT a flat left-associative 4-term sum: the
    // different rounding sequence can drift 1 ulp and flip
    // trunc((d0+d1)*n) at an integer boundary.
    val d = s"(((${us(0)})*4.65661287524579692e-10 + (${us(1)})*2.168404346990492787e-19)" +
      s"\n    + ((${us(2)})*4.65661287524579692e-10 + (${us(3)})*2.168404346990492787e-19))"
    "WITH RECURSIVE\n" + Seq(
      graph,
      vecCte("cs", matPow(A, 4), RBase),
      s"""cand AS (SELECT cs.b AS c,
         |  CAST(trunc($d * nv.n) AS BIGINT) % nv.n AS root
         |  FROM cs, nv)""".stripMargin,
      """ok AS (SELECT c, cand.root, v.vertex IS NOT NULL AS has_edge
        |  FROM cand LEFT JOIN verts v ON v.vertex = cand.root)""".stripMargin,
      """acc(c, taken) AS (
        |  SELECT -1, CAST([] AS BIGINT[])
        |  UNION ALL
        |  SELECT a.c + 1, CASE WHEN k.has_edge AND NOT list_contains(a.taken, k.root)
        |    THEN list_append(a.taken, k.root) ELSE a.taken END
        |  FROM acc a JOIN ok k ON k.c = a.c + 1 WHERE len(a.taken) < 16)""".stripMargin
    ).mkString(",\n") +
      """
        |SELECT CAST(u.i - 1 AS BIGINT) AS idx, taken[u.i] AS root
        |FROM (SELECT taken FROM acc WHERE len(taken) = 16),
        |unnest(generate_series(1, 16)) AS u(i)""".stripMargin
  }
}

package graft.rng

import org.scalatest.funsuite.AnyFunSuite

class MrgSpec extends AnyFunSuite {

  test("skip(0,0,n) equals n sequential steps") {
    for (n <- Seq(1L, 2L, 7L, 255L, 256L, 1000L, 65537L)) {
      val a = Mrg.makeSeed(2, 3)
      val b = Mrg.makeSeed(2, 3)
      a.skip(0, 0, n)
      var i = 0L
      while (i < n) { b.nextUint(); i += 1 }
      assert((a.z1, a.z2, a.z3, a.z4, a.z5) === (b.z1, b.z2, b.z3, b.z4, b.z5),
        s"n=$n")
    }
  }

  test("skip is additive: skip(a) then skip(b) == skip(a+b)") {
    val a = Mrg.makeSeed(42, 7)
    a.skip(0, 0, 123456789L)
    a.skip(0, 0, 987654321L)
    val b = Mrg.makeSeed(42, 7)
    b.skip(0, 0, 123456789L + 987654321L)
    assert((a.z1, a.z2, a.z3, a.z4, a.z5) === (b.z1, b.z2, b.z3, b.z4, b.z5))
  }

  test("mid-word skip consistent with low-word squaring: 2^32 + 2^32 spans bytes") {
    // skip(0,1,0) = 2^64 steps must equal four skips of 2^62.
    val a = Mrg.makeSeed(5, 11)
    a.skip(0, 1, 0)
    val b = Mrg.makeSeed(5, 11)
    val q = 1L << 62
    b.skip(0, 0, q); b.skip(0, 0, q); b.skip(0, 0, q); b.skip(0, 0, q)
    assert((a.z1, a.z2, a.z3, a.z4, a.z5) === (b.z1, b.z2, b.z3, b.z4, b.z5))
  }

  test("state words stay in [0, 2^31-1) and stream is deterministic") {
    val st = Mrg.makeSeed(2, 3)
    val vals = Array.fill(10000)(st.nextUint())
    assert(vals.forall(v => v >= 0 && v < Mrg.Mod))
    val st2 = Mrg.makeSeed(2, 3)
    val vals2 = Array.fill(10000)(st2.nextUint())
    assert(vals.sameElements(vals2))
  }

  test("nextDouble in [0,1); makeRandomNumbers position-addressable") {
    val d = Mrg.makeRandomNumbers(100, 2, 3, 0)
    assert(d.forall(x => x >= 0.0 && x < 1.0))
    // Position p slice must equal the tail of the position-0 stream.
    val shifted = Mrg.makeRandomNumbers(10, 2, 3, 17)
    assert(Mrg.makeRandomNumbers(27, 2, 3, 0).drop(17).sameElements(shifted))
  }
}

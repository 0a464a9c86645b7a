package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native winnowing fingerprint selection (the MOSS scheme): tokenize on
 * whitespace, hash every k-token shingle with the
 * [[StringPolyHash]] polynomial, keep the minimum of every window of w
 * consecutive shingle hashes, return the distinct selected hashes.
 *
 * Semantics are EXACTLY the composed column formulation it replaces
 * (`transform(sequence, i -> poly_fingerprint(concat_ws(" ",
 * slice(tokens, i, k))))` → window `array_min` → `array_distinct`),
 * which is also what the DuckDB oracle computes; the replay property
 * spec pins expression ≡ composition bit-for-bit on randomized input.
 * Documents shorter than k tokens hash their whole token list; shingle
 * lists shorter than w keep their single global minimum; an empty
 * token list hashes the empty string (fingerprint 0).
 *
 * Why custom: the HOF pipeline re-materializes every shingle as a new
 * string and folds its code points through THREE interpreted lambda
 * layers — O(k·|text|) character work plus boxing per shingle (the
 * slowest query on the bench at 4 s/sf0.1). This expression does ONE
 * O(|text|) pass: prefix polynomial hashes over the canonical
 * space-joined token stream give each shingle hash in O(1)
 * (h = P[e] − P[s]·31^(e−s) mod p), and a monotonic deque yields each
 * window minimum in amortized O(1). Codegen emits a single static
 * call, so the expression stays inside the WholeStageCodegen stage.
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.compute(input.asInstanceOf[UTF8String].toString, k, w))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowFingerprints.compute($x.toString(), $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {

  private final val P = 1000000007L

  /** Distinct window-min shingle hashes, first-occurrence order (the
    * `array_distinct` order of the composed formulation). */
  def compute(text: String, k: Int, w: Int): Array[Long] = {
    // tokens: split on \s+ runs, empties dropped — identical to
    // filter(split(trim(text), "\\s+"), _ != "") for any input (trim
    // only ever removed the leading-empty artifact the filter drops).
    // \s is the ASCII class [ \t\n\x0B\f\r] in BOTH Java regex and
    // DuckDB's RE2 — Character.isWhitespace would wrongly split on
    // Unicode space separators.
    @inline def isWs(ch: Char): Boolean =
      ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
        ch == '\f' || ch == '\r'
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens.add(text.substring(start, i))
    }
    val t = tokens.size
    // canonical space-joined stream as code points, with per-token
    // code-point offsets (off(j) = cp index where token j starts)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < t) {
      if (j > 0) sb.append(' ')
      sb.append(tokens.get(j))
      j += 1
    }
    val joined = sb.toString
    val cps = joined.codePoints().toArray
    val off = new Array[Int](t + 1)
    var tok = 0
    var ci = 0
    // walk code points, recording token starts (tokens are separated by
    // exactly one space in the joined stream)
    while (ci < cps.length) {
      if (cps(ci) == ' ') { tok += 1; off(tok) = ci + 1 }
      ci += 1
    }
    // prefix hashes P[i] over cps[0..i), and powers of 31 mod p
    val pre = new Array[Long](cps.length + 1)
    val pow = new Array[Long](cps.length + 1)
    pow(0) = 1L
    var c = 0
    while (c < cps.length) {
      pre(c + 1) = (pre(c) * 31L + cps(c)) % P
      pow(c + 1) = (pow(c) * 31L) % P
      c += 1
    }
    @inline def rangeHash(s: Int, e: Int): Long = {
      val h = (pre(e) - (pre(s) * pow(e - s)) % P) % P
      if (h < 0) h + P else h
    }
    // shingle hashes: m = max(t - k + 1, 1); shingle i spans tokens
    // [i, min(i+k, t)) = cps [off(i), end), end = start of token
    // min(i+k, t) minus the separating space (or stream end)
    val m = math.max(t - k + 1, 1)
    val hs = new Array[Long](m)
    var si = 0
    while (si < m) {
      val lastTok = math.min(si + k, t)
      val e = if (lastTok >= t) cps.length else off(lastTok) - 1
      val s = if (t == 0) 0 else off(si)
      hs(si) = rangeHash(s, e)
      si += 1
    }
    // window minima via monotonic deque; distinct, insertion order
    val mw = math.max(m - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    var hi = 0
    var lo = 0
    while (lo < mw) {
      val windowEnd = math.min(lo + w, m)
      while (hi < windowEnd) {
        while (!deque.isEmpty && hs(deque.peekLast()) >= hs(hi))
          deque.pollLast()
        deque.addLast(hi)
        hi += 1
      }
      while (deque.peekFirst() < lo) deque.pollFirst()
      seen.add(hs(deque.peekFirst()))
      lo += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var oi = 0
    while (it.hasNext) { out(oi) = it.next(); oi += 1 }
    out
  }

  /** Column API: winnow_fingerprints(text, k, w) for a STRING column. */
  def of(text: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowFingerprints(GraftShims.expression(text), k, w))
}

package graft.plans

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM implementations of the portable hash arithmetic
  * (graft.functions.Portable / SURVEY.md §5). Called from generated code by
  * the expressions in [[graft.plans]] — one static call per row keeps the
  * surrounding plan inside whole-stage codegen while the inner loops run as
  * tight JVM code instead of per-element expression evaluation.
  *
  * Formula parity with the DuckDB oracle SQL and the Portable column
  * functions is asserted in PortableParitySpec.
  */
object HashOps {
  val M: Long = 2147483647L

  def aK(k: Int): Long = ((k + 1).toLong * 2654435761L) % M
  def bK(k: Int): Long = ((k + 1).toLong * 40503L) % M

  /** poly rolling hash over UTF-16 code units (== code points for BMP,
    * == `unicode()` in DuckDB for the ASCII/BMP corpus). */
  def polyHashStr(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31 + s.charAt(i)) % M; i += 1 }
    acc
  }

  def polyHash(s: UTF8String): Long = polyHashStr(s.toString)

  private def tokensOf(s: String): Array[String] =
    s.split(" ", -1).filter(_.nonEmpty)

  /** Hashes of word-n-shingles; the whole text is the lone shingle when
    * there are fewer than n tokens. */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val w = tokensOf(s)
    if (w.length < n) Array(polyHashStr(s))
    else {
      val out = new Array[Long](w.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder(w(i))
        var j = 1
        while (j < n) { sb.append(' ').append(w(i + j)); j += 1 }
        out(i) = polyHashStr(sb.toString)
        i += 1
      }
      out
    }
  }

  /** MinHash signature: k affine minima over the word-n-shingle hashes. */
  def minhashSig(s: UTF8String, k: Int, shingleN: Int): ArrayData = {
    val hs = shingleHashes(s.toString, shingleN)
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = aK(j); val b = bK(j)
      var mn = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (hs(i) * a + b) % M
        if (v < mn) mn = v
        i += 1
      }
      sig(j) = mn
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 32-bit SimHash over whitespace-token hashes. */
  def simhash32(s: UTF8String): Long = {
    val w = tokensOf(s.toString)
    val hs = new Array[Long](w.length)
    var i = 0
    while (i < w.length) { hs(i) = polyHashStr(w(i)); i += 1 }
    var out = 0L
    var j = 0
    while (j < 32) {
      var sum = 0L
      i = 0
      while (i < hs.length) {
        sum += (if (((hs(i) >> j) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (sum > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Minimum poly-hash over the character n-grams (winnowing-lite
    * fingerprint); the whole-text hash when shorter than n. */
  def minCharNgramHash(s: UTF8String, n: Int): Long = {
    val str = s.toString
    if (str.length < n) polyHashStr(str)
    else {
      var mn = Long.MaxValue
      var i = 0
      while (i + n <= str.length) {
        var acc = 0L
        var j = i
        while (j < i + n) { acc = (acc * 31 + str.charAt(j)) % M; j += 1 }
        if (acc < mn) mn = acc
        i += 1
      }
      mn
    }
  }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass expressions for the t4 winnowing fingerprint.
  *
  * The declarative form
  * `array_min(transform(sequence(1, greatest(length(t)-7, 1)), i -> md5(substring(t, i, 8))))`
  * pays, PER WINDOW: a `substring` UTF8String allocation, a
  * UTF8String→byte[] copy, a fresh MD5 MessageDigest (Spark's `Md5`
  * goes through commons-codec `DigestUtils.md5Hex`, which constructs a
  * new digest per call), a 32-char hex string allocation, and a
  * GenericArrayData slot — then `array_min` walks the boxed array. At
  * ~n_chars windows per document that allocation storm made
  * t4_fingerprint the 5th most expensive query of the 185 (8.7 s at
  * sf0.1 under the v2 harness; round-15 verdict "What's wrong" #2).
  *
  * These two expressions compute the identical results in one pass over
  * the document's UTF-8 bytes with zero per-window allocation beyond
  * the dedup set entries:
  *
  *  - window = 8 CHARACTERS (not bytes), exactly `substring(t, i, 8)`:
  *    codepoint start offsets are computed once per row, each window is
  *    a (start, end) byte slice of the row's backing array;
  *  - [[Gram8MinMd5]] deduplicates windows BEFORE hashing (duplicates
  *    cannot change a min) via no-copy `UTF8String.fromBytes` wrappers
  *    in a HashSet, reuses ONE MessageDigest, compares raw 16-byte
  *    digests unsigned-lexicographically — equivalent to comparing
  *    their lowercase-hex renderings, because byte → two-hex-digit is
  *    strictly monotone and '0'..'9' < 'a'..'f' in ASCII — and renders
  *    hex once, for the single winning digest;
  *  - [[Gram8DistinctCount]] is the same window walk feeding only the
  *    dedup set: `size(array_distinct(transform(...substring...)))`.
  *
  * Both are CodegenFallback: the per-row work (an MD5 per distinct
  * window) dwarfs the row-iteration virtual call, and the surrounding
  * projection stays trivially parallel. Oracle parity is byte-exact —
  * t4 is one of the 127 DuckDB hash-compared queries and is re-verified
  * after this change (OPTIMIZATION_r16.md).
  */
private[graft] object Gram8 {
  /** Byte offsets of each codepoint start, plus the terminal length —
    * offs(i) is where character i begins in `bytes[0, len)`. */
  def charOffsets(bytes: Array[Byte], off: Int, len: Int): Array[Int] = {
    // worst case 1 byte per char
    val offs = new Array[Int](len + 1)
    var n = 0
    var p = 0
    while (p < len) {
      offs(n) = p
      n += 1
      p += UTF8String.numBytesForFirstByte(bytes(off + p))
    }
    offs(n) = len
    java.util.Arrays.copyOf(offs, n + 1)
  }

  def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Walks the ≤8-char windows of `t` (1 window when numChars ≤ 8,
    * numChars−7 otherwise), calling `f(bytes, start, end)` for each
    * FIRST occurrence (dedup'd), and returns the distinct-window count. */
  def walkDistinctWindows(t: UTF8String)(f: (Array[Byte], Int, Int) => Unit): Int = {
    val bytes = t.getBytes
    val offs = charOffsets(bytes, 0, bytes.length)
    val nChars = offs.length - 1
    val nWin = math.max(nChars - 7, 1)
    val seen = new java.util.HashSet[UTF8String](math.max(16, nWin * 2))
    var i = 0
    while (i < nWin) {
      val s = offs(i)
      val e = offs(math.min(i + 8, nChars))
      val w = UTF8String.fromBytes(bytes, s, e - s) // wrapper, no copy
      if (seen.add(w)) f(bytes, s, e)
      i += 1
    }
    seen.size
  }
}

/** min(md5(substring(t, i, 8))) over every 8-char window — see [[Gram8]]. */
case class Gram8MinMd5(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "gram8_min_md5"

  override def nullSafeEval(a: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var minD: Array[Byte] = null
    Gram8.walkDistinctWindows(a.asInstanceOf[UTF8String]) { (bytes, s, e) =>
      md.reset()
      md.update(bytes, s, e - s)
      val dg = md.digest()
      if (minD == null || Gram8.lessUnsigned(dg, minD)) minD = dg
    }
    Gram8.hex(minD)
  }

  override protected def withNewChildInternal(newChild: Expression): Gram8MinMd5 =
    copy(child = newChild)
}

/** size(array_distinct(transform(..., i -> substring(t, i, 8)))) — the
  * distinct 8-char-window count; see [[Gram8]]. */
case class Gram8DistinctCount(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "gram8_distinct_count"

  override def nullSafeEval(a: Any): Any =
    Gram8.walkDistinctWindows(a.asInstanceOf[UTF8String])((_, _, _) => ())

  override protected def withNewChildInternal(newChild: Expression): Gram8DistinctCount =
    copy(child = newChild)
}

/** All k-token window MD5 digests of a token array in one pass —
  * replaces x30's interpreted
  * `transform(sequence(0, size(w) - k), i -> unhex(md5(array_join(slice(w, i + 1, k), ' '))))`,
  * which paid, PER WINDOW: a k-element slice array, an interpreted
  * lambda chain, a joined string, a fresh MessageDigest, a 32-char hex
  * render and an unhex parse back to the 16 bytes. Here the digest is
  * fed the window's token bytes + single-space separators directly
  * (byte-identical to md5 of the joined string: UTF-8 of a ' '-join is
  * the concatenation of the tokens' UTF-8 with 0x20 between), one
  * reused MessageDigest, no intermediate strings. Yields one 16-byte
  * binary per window, i = 0 .. size(w) − k; fewer than k tokens yield
  * an empty array (callers filter `size(w) >= k` upstream, matching
  * the sequence() form which would error on a negative range). */
case class WordGramMd5(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(k >= 1)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.BinaryType, containsNull = false)
  override def prettyName: String = "word_gram_md5"

  override def nullSafeEval(a: Any): Any = {
    val w = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = w.numElements()
    val nWin = n - k + 1
    if (nWin <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    // token bytes materialized once per row, reused across windows
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = w.getUTF8String(i).getBytes; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = Array[Byte](' ')
    val out = new Array[Any](nWin)
    i = 0
    while (i < nWin) {
      md.reset()
      var j = i
      while (j < i + k) {
        md.update(toks(j))
        if (j < i + k - 1) md.update(space)
        j += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramMd5 =
    copy(child = newChild)
}

object TextFunctions {
  def gram8MinMd5(t: Column): Column =
    ExpressionUtils.column(Gram8MinMd5(ExpressionUtils.expression(t)))
  def gram8DistinctCount(t: Column): Column =
    ExpressionUtils.column(Gram8DistinctCount(ExpressionUtils.expression(t)))
  def wordGramMd5(w: Column, k: Int): Column =
    ExpressionUtils.column(WordGramMd5(ExpressionUtils.expression(w), k))
}

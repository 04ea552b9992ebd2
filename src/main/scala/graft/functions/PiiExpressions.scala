package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled scanners for the three PII patterns T12 redacts:
  *
  *   email  `[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}`
  *   phone  `\b\d{3}-\d{3}-\d{4}\b`
  *   ip     `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`
  *
  * `java.util.regex` walks every start position through the full
  * Matcher machinery — six passes (3 counts + 3 replaces) dominated
  * the 100× probe at 44 s. These kernels reproduce the EXACT
  * leftmost-first greedy-with-backtracking semantics by construction:
  *
  *  - email: `@` is not in the local-part class and `.`/letters ARE
  *    in the domain class, so the local part can only be the maximal
  *    class run ending at `@`, and `B+\.[a-z]{2,}` resolves inside
  *    the maximal domain run by trying dot positions right-to-left
  *    (greedy `B+` backtracks longest-first) with ≥2 letters after —
  *    the first hit is Java's match, tail letters taken maximally.
  *  - phone: fixed-width, no backtracking. `\b` reproduces Java's
  *    exact (and famously inconsistent) default: the BOUNDARY's
  *    word-char test is `Character.isLetterOrDigit(codepoint) ||
  *    '_'` (OpenJDK Pattern.Bound) — NOT the ASCII `\w` class — so
  *    a Unicode letter adjacent to a digit run suppresses the match.
  *    The fuzzer caught this on "1.0.0.1ĸ"; boundary checks decode
  *    the adjacent UTF-8 codepoint rather than testing the byte.
  *  - ip: each `\d{1,3}` must consume its ENTIRE maximal digit run
  *    (a leftover digit fails the following `\.`/`\b` and every
  *    shorter backtrack too), so runs of length 0 or >3 fail the
  *    whole attempt.
  *
  * All pattern chars are ASCII and UTF-8 continuation bytes are
  * ≥0x80 (never word chars, never class members), so byte-level
  * scanning equals Java's char-level scanning on any input.
  * TextKernelPropSpec fuzzes all three against `replaceAll` /
  * `Matcher.find` on adversarial inputs.
  */
object PiiKernels {
  private def isLocal(b: Int): Boolean = // [a-z0-9._%+-]
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  private def isDomain(b: Int): Boolean = // [a-z0-9.-]
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '-'
  private def isLower(b: Int): Boolean = b >= 'a' && b <= 'z'
  private def isDigit(b: Int): Boolean = b >= '0' && b <= '9'
  /** Codepoint starting at byte p (input is valid UTF-8). */
  private def codePointAt(bytes: Array[Byte], p: Int, n: Int): Int = {
    val b0 = bytes(p) & 0xff
    if (b0 < 0x80) b0
    else if (b0 < 0xe0 && p + 1 < n)
      ((b0 & 0x1f) << 6) | (bytes(p + 1) & 0x3f)
    else if (b0 < 0xf0 && p + 2 < n)
      ((b0 & 0x0f) << 12) | ((bytes(p + 1) & 0x3f) << 6) |
        (bytes(p + 2) & 0x3f)
    else if (p + 3 < n)
      ((b0 & 0x07) << 18) | ((bytes(p + 1) & 0x3f) << 12) |
        ((bytes(p + 2) & 0x3f) << 6) | (bytes(p + 3) & 0x3f)
    else 0xfffd
  }

  /** Java `\b` word-char test for the codepoint STARTING at p. */
  private def isWordAt(bytes: Array[Byte], p: Int, n: Int): Boolean = {
    val b = bytes(p) & 0xff
    if (b < 0x80)
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == '_'
    else Character.isLetterOrDigit(codePointAt(bytes, p, n))
  }

  /** Java `\b` word-char test for the codepoint ENDING at p-1. */
  private def isWordBefore(bytes: Array[Byte], p: Int, n: Int): Boolean = {
    var s = p - 1
    while (s > 0 && (bytes(s) & 0xc0) == 0x80) s -= 1 // continuation bytes
    isWordAt(bytes, s, n)
  }

  /** Match end if the email pattern matches starting at p, else -1. */
  def emailEnd(bytes: Array[Byte], p: Int, n: Int): Int = {
    if (!isLocal(bytes(p) & 0xff)) return -1
    var q = p
    while (q < n && isLocal(bytes(q) & 0xff)) q += 1
    if (q >= n || bytes(q) != '@') return -1
    val s = q + 1
    var e = s
    while (e < n && isDomain(bytes(e) & 0xff)) e += 1
    var l = e - s - 1 // dot candidate s+l, longest B+ first
    while (l >= 1) {
      if (bytes(s + l) == '.') {
        var m = s + l + 1
        while (m < e && isLower(bytes(m) & 0xff)) m += 1
        if (m - (s + l + 1) >= 2) return m
      }
      l -= 1
    }
    -1
  }

  /** Match end if the phone pattern matches starting at p, else -1. */
  def phoneEnd(bytes: Array[Byte], p: Int, n: Int): Int = {
    if (p + 12 > n) return -1
    if (p > 0 && isWordBefore(bytes, p, n)) return -1
    var i = p
    while (i < p + 3) { if (!isDigit(bytes(i) & 0xff)) return -1; i += 1 }
    if (bytes(i) != '-') return -1
    i += 1
    while (i < p + 7) { if (!isDigit(bytes(i) & 0xff)) return -1; i += 1 }
    if (bytes(i) != '-') return -1
    i += 1
    while (i < p + 12) { if (!isDigit(bytes(i) & 0xff)) return -1; i += 1 }
    if (i < n && isWordAt(bytes, i, n)) return -1
    i
  }

  /** Match end if the IPv4 pattern matches starting at p, else -1. */
  def ipEnd(bytes: Array[Byte], p: Int, n: Int): Int = {
    if (p > 0 && isWordBefore(bytes, p, n)) return -1
    var cur = p
    var k = 0
    while (k < 4) {
      var d = cur
      while (d < n && isDigit(bytes(d) & 0xff)) d += 1
      val len = d - cur
      if (len < 1 || len > 3) return -1
      if (k < 3) {
        if (d >= n || bytes(d) != '.') return -1
        cur = d + 1
      } else {
        if (d < n && isWordAt(bytes, d, n)) return -1
        return d
      }
      k += 1
    }
    -1
  }

  private def matchEnd(which: Int, bytes: Array[Byte], p: Int,
      n: Int): Int =
    if (which == 0) emailEnd(bytes, p, n)
    else if (which == 1) phoneEnd(bytes, p, n)
    else ipEnd(bytes, p, n)

  private def countOf(bytes: Array[Byte], which: Int): Int = {
    val n = bytes.length
    var p = 0
    var c = 0
    while (p < n) {
      val e = matchEnd(which, bytes, p, n)
      if (e > p) { c += 1; p = e } else p += 1
    }
    c
  }

  /** (emails, phones, ips) match counts — three count-only scans of
    * the ORIGINAL text, matching the three independent
    * `regexp_count(text, …)` columns exactly (a phone inside an
    * email is counted by both, as the column formulation does).
    */
  def piiCounts(s: UTF8String): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.piiCountEvals.increment()
    val bytes = s.getBytes
    new GenericArrayData(Array(countOf(bytes, 0), countOf(bytes, 1),
      countOf(bytes, 2)))
  }

  private def replaceOne(bytes: Array[Byte], which: Int,
      repl: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    var spans = new Array[Int](8) // (start, end) pairs
    var ns = 0
    var matchedLen = 0
    var p = 0
    while (p < n) {
      val e = matchEnd(which, bytes, p, n)
      if (e > p) {
        if (ns + 2 > spans.length)
          spans = java.util.Arrays.copyOf(spans, spans.length * 2)
        spans(ns) = p; spans(ns + 1) = e; ns += 2
        matchedLen += e - p
        p = e
      } else p += 1
    }
    if (ns == 0) return bytes
    val out = new Array[Byte](n - matchedLen + (ns / 2) * repl.length)
    var src = 0
    var dst = 0
    var i = 0
    while (i < ns) {
      val st = spans(i); val en = spans(i + 1)
      System.arraycopy(bytes, src, out, dst, st - src); dst += st - src
      System.arraycopy(repl, 0, out, dst, repl.length); dst += repl.length
      src = en
      i += 2
    }
    System.arraycopy(bytes, src, out, dst, n - src)
    out
  }

  private val EMAIL_R = "<EMAIL>".getBytes("UTF-8")
  private val PHONE_R = "<PHONE>".getBytes("UTF-8")
  private val IP_R = "<IP>".getBytes("UTF-8")

  /** The redaction cascade email → phone → ip, each pass over the
    * previous pass's output — byte-identical to the chained
    * `regexp_replace` formulation.
    */
  def piiScrub(s: UTF8String): UTF8String = {
    if (KernelMetrics.enabled) KernelMetrics.piiScrubEvals.increment()
    var bytes = s.getBytes
    bytes = replaceOne(bytes, 0, EMAIL_R)
    bytes = replaceOne(bytes, 1, PHONE_R)
    bytes = replaceOne(bytes, 2, IP_R)
    UTF8String.fromBytes(bytes)
  }
}

/** pii_counts(text) → array<int> — (emails, phones, ips). */
case class PiiCounts(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PiiKernels.piiCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiKernels.piiCounts($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pii_scrub_text(text) → string — the redaction cascade. */
case class PiiScrubText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    PiiKernels.piiScrub(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiKernels.piiScrub($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PiiFunctions {
  def pii_counts(text: Column): Column =
    ColumnBridge.column(PiiCounts(ColumnBridge.expression(text)))
  def pii_scrub_text(text: Column): Column =
    ColumnBridge.column(PiiScrubText(ColumnBridge.expression(text)))
}

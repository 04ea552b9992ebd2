package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the sketch expressions. Kept as plain JVM
  * methods so the generated code (doGenCode below) calls straight
  * into them — one virtual-free call per row inside
  * WholeStageCodegen, no boxing of the array elements beyond what
  * ArrayData already does.
  *
  * Hash family: h_j(x) = (a_j * x + b_j) mod p over a 61-bit Mersenne
  * prime, with x = a 64-bit FNV-1a of the shingle bytes — standard
  * tabulation-free MinHash (Broder '97), deterministic across
  * executors, no RNG state.
  */
object HashKernels {
  final val P: Long = (1L << 61) - 1

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def mulmodP(a: Long, b: Long): Long = {
    // 61-bit Mersenne modular multiply via 128-bit split
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1
    var r = (lo & P) + ((lo >>> 61) | (hi << 3)) // hi*2^64 mod p folds
    if (r >= P) r -= P
    r
  }

  /** a_j, b_j derived from splitmix64 of the permutation index —
    * deterministic, well-mixed.
    */
  def coeff(j: Long): Long = {
    var z = j + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val r = (z ^ (z >>> 31)) % P
    if (r < 0) r + P else r
  }

  /** MinHash signature: k minima of (a_j*x + b_j) mod p. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      hashes(i) = if (s == null) 0L else {
        val h = fnv1a(s) % P
        if (h < 0) h + P else h
      }
      i += 1
    }
    var j = 0
    while (j < k) {
      val a = coeff(2L * j) | 1L // odd a, non-zero
      val b = coeff(2L * j + 1)
      var m = Long.MaxValue
      var i2 = 0
      while (i2 < n) {
        var v = mulmodP(a, hashes(i2)) + b
        if (v >= P) v -= P
        if (v < m) m = v
        i2 += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** MinHash over PRE-HASHED shingle keys (shingle_keys output): same
    * permutation family as [[minhash]], x = the 64-bit key folded
    * into [0, P). Skips the per-shingle string hashing — paired with
    * shingle_keys it removes shingle strings from the minhash path
    * entirely.
    */
  def minhashFromKeys(keys: ArrayData, k: Int): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.minhashEvals.increment()
    val xs = keys.toLongArray()
    val n = xs.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = xs(i) % P
      xs(i) = if (h < 0) h + P else h
      i += 1
    }
    var j = 0
    while (j < k) {
      val a = coeff(2L * j) | 1L // odd a, non-zero
      val b = coeff(2L * j + 1)
      var m = Long.MaxValue
      var i2 = 0
      while (i2 < n) {
        var v = mulmodP(a, xs(i2)) + b
        if (v >= P) v -= P
        if (v < m) m = v
        i2 += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Intersection size of two SORTED distinct long arrays (the
    * shingle_keys contract) — one merge pass, no per-row hash set,
    * unlike array_intersect.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray(); val y = b.toLongArray()
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { c += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    c
  }

  // per-spec parsed stop lists for gopherStats (the termTables idiom)
  private val gopherStopTables =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Byte]]]()

  /** One-pass Gopher rule statistics (Rae et al. 2021, §A1.1) —
    * the ten integer counts the document-level quality rules
    * threshold: [n_words, word_chars, n_alpha_words, n_lines,
    * n_distinct_lines, n_ellipsis_lines, n_symbols, stop_hits,
    * line_chars, dup_line_chars] — the last two carry the
    * CHAR-WEIGHTED duplicate-line fraction (every copy of a repeated
    * line counts, the paper's character form; code points).
    *
    * Tokenization mirrors [[wsTokenCount]]'s DuckDB parity EXACTLY
    * (trim strips 0x20 only; empty input yields the one empty
    * element; leading/trailing whitespace inside the trimmed region
    * contributes empty elements) so every count is hash-checkable
    * against `regexp_split_to_array(trim(text), '\s+')`. word_chars
    * counts CODE POINTS of non-whitespace runs (DuckDB `length` is
    * characters); alpha presence is ASCII [A-Za-z]; stop_hits is
    * DISTINCT presence of the Gopher 8-word stop list over
    * lowercased tokens. Lines split the RAW text on 0x0a (trailing
    * empty line included, the string_split contract); an ellipsis
    * line ends with "..." after stripping trailing 0x20; n_symbols
    * = '#' occurrences + non-overlapping left-to-right "..."
    * occurrences (the string_split counting). `stops` is the
    * space-separated stop list (≤ 64 words), parsed once per spec
    * (the termCounts memo).
    */
  def gopherStats(text: UTF8String, stops: String): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.gopherStatsEvals.increment()
    val stopWords = gopherStopTables.computeIfAbsent(stops, { sp =>
      val arr = sp.split(" ").filter(_.nonEmpty).map(_.getBytes("UTF-8"))
      // the stop-hit accumulator is a 64-bit presence mask (1L << w):
      // a longer list would silently alias words at w mod 64. Checked
      // HERE so direct kernel/expression users fail as loudly as the
      // TextOps.qualityGopherDocs entry point.
      require(arr.length <= 64,
        s"gopher stop list has ${arr.length} words; the presence " +
          "bitmask supports at most 64")
      arr
    })
    val bytes = text.getBytes
    // ---- token pass (trimmed region) ----
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Int): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    var nWords = 0L; var wordChars = 0L; var alphaWords = 0L
    var stopMask = 0L
    if (lo == hi) nWords = 1 // [''] — the regexp_split of empty
    else {
      if (isWs(bytes(lo) & 0xff)) nWords += 1
      if (isWs(bytes(hi - 1) & 0xff)) nWords += 1
      var i = lo
      while (i < hi) {
        if (!isWs(bytes(i) & 0xff)) {
          val s = i
          var hasAlpha = false
          while (i < hi && !isWs(bytes(i) & 0xff)) {
            val b = bytes(i) & 0xff
            if ((b & 0xc0) != 0x80) wordChars += 1 // code point start
            if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z'))
              hasAlpha = true
            i += 1
          }
          nWords += 1
          if (hasAlpha) alphaWords += 1
          val len = i - s
          var w = 0
          while (w < stopWords.length) {
            val sw = stopWords(w)
            if (sw.length == len) {
              var j = 0; var ok = true
              while (ok && j < len) {
                var c = bytes(s + j) & 0xff
                if (c >= 'A' && c <= 'Z') c += 32
                if (c != sw(j)) ok = false
                j += 1
              }
              if (ok) stopMask |= 1L << w
            }
            w += 1
          }
        } else i += 1
      }
    }
    // ---- line pass (raw text, split on 0x0a) ----
    // two sub-passes so the char-weighted duplicate fraction counts
    // EVERY copy of a repeated line (the paper's character form):
    // first count line occurrences, then weigh
    val lineCounts = new java.util.HashMap[String, Array[Long]]()
    val lineList = new scala.collection.mutable.ArrayBuffer[String]()
    var nLines = 0L; var ellipsisLines = 0L
    var lineChars = 0L; var dupLineChars = 0L
    var s = 0
    var p = 0
    val n = bytes.length
    while (p <= n) {
      if (p == n || bytes(p) == 0x0a) {
        nLines += 1
        val line = new String(bytes, s, p - s, "UTF-8")
        lineList += line
        val e0 = lineCounts.get(line)
        if (e0 == null) lineCounts.put(line, Array(1L))
        else e0(0) += 1
        var e = p
        while (e > s && bytes(e - 1) == 0x20) e -= 1
        if (e - s >= 3 && bytes(e - 1) == '.' && bytes(e - 2) == '.' &&
          bytes(e - 3) == '.') ellipsisLines += 1
        s = p + 1
      }
      p += 1
    }
    val distinctLines = lineCounts.size().toLong
    lineList.foreach { line =>
      val chars = line.codePointCount(0, line.length).toLong
      lineChars += chars
      if (lineCounts.get(line)(0) >= 2) dupLineChars += chars
    }
    // ---- symbol pass (raw text) ----
    var symbols = 0L
    var q = 0
    while (q < n) {
      if (bytes(q) == '#') { symbols += 1; q += 1 }
      else if (q + 2 < n && bytes(q) == '.' && bytes(q + 1) == '.' &&
        bytes(q + 2) == '.') { symbols += 1; q += 3 }
      else q += 1
    }
    new GenericArrayData(Array(nWords, wordChars, alphaWords, nLines,
      distinctLines, ellipsisLines, symbols,
      java.lang.Long.bitCount(stopMask).toLong, lineChars,
      dupLineChars))
  }

  // per-spec parsed badword lists for c4Stats (the termTables idiom):
  // ASCII-lowered words bucketed by byte length, each bucket sorted
  // unsigned — membership is one binary search per token instead of a
  // scan over every same-length list word, so the published
  // ~1,600-entry blocklist costs O(log n) compares per token. Lowering
  // the STORED side too makes the match case-insensitive on both
  // sides (a list entry with capitals previously could never match).
  private val c4BadwordTables = new java.util.concurrent
    .ConcurrentHashMap[String, Map[Int, Array[Array[Byte]]]]()

  private def c4ParseBadwords(sp: String): Map[Int, Array[Array[Byte]]] =
    sp.split(" ").filter(_.nonEmpty)
      .map(_.getBytes("UTF-8").map(b =>
        if (b >= 'A' && b <= 'Z') (b + 32).toByte else b))
      .groupBy(_.length)
      .map { case (len, ws) =>
        len -> ws.distinct.sortWith(
          (a, b) => java.util.Arrays.compareUnsigned(a, b) < 0)
      }

  /** Is the ASCII-lowered form of `bytes[s, s+len)` present in the
    * length-`len` bucket? Binary search, unsigned byte order.
    */
  private def c4BadwordHit(bytes: Array[Byte], s: Int, len: Int,
      bucket: Array[Array[Byte]]): Boolean = {
    var lo = 0
    var hi = bucket.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val bw = bucket(mid)
      var j = 0
      var cmp = 0
      while (cmp == 0 && j < len) {
        var c = bytes(s + j) & 0xff
        if (c >= 'A' && c <= 'Z') c += 32
        cmp = Integer.compare(c, bw(j) & 0xff)
        j += 1
      }
      if (cmp == 0) return true
      else if (cmp < 0) hi = mid - 1
      else lo = mid + 1
    }
    false
  }

  /** The C4 policy-line substrings (Raffel et al. 2020 §2.2 as
    * released in the TFDS c4 cleaning code): a line carrying any of
    * these is dropped.
    */
  private val c4PolicyBytes: Array[Array[Byte]] = Array(
    "terms of use", "privacy policy", "cookie policy", "uses cookies",
    "use of cookies", "use cookies").map(_.getBytes("UTF-8"))

  /** ASCII-lowered containment scan: does `hay[from, to)` contain
    * `needle` (already lowercase ASCII)? Lowering maps only A–Z; the
    * oracle's `contains(lower(..))` agrees on any input where matches
    * are formed from ASCII letters (all published C4 patterns are).
    */
  private def containsLowered(hay: Array[Byte], from: Int, to: Int,
      needle: Array[Byte]): Boolean = {
    val m = needle.length
    if (m == 0) return true
    var i = from
    val last = to - m
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        var c = hay(i + j) & 0xff
        if (c >= 'A' && c <= 'Z') c += 32
        if (c != needle(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** One-pass C4 cleaning statistics (Raffel et al. 2020 §2.2, with
    * the TFDS-released constants: ≥ 5 words per line, ≥ 3 sentences
    * per page) — eleven integer counts per document, each
    * hash-checkable against its DuckDB mirror:
    * [n_lines, n_kept_lines, n_sentences, kept_chars, n_noterm_lines,
    * n_short_lines, n_js_lines, n_policy_lines, has_lorem, has_brace,
    * has_badword].
    *
    * Line rules, applied in attribution order to each 0x0a-split RAW
    * line (trailing empty line included, the string_split contract):
    *   1. after right-trimming 0x20, must end in a terminal mark
    *      ('.', '?', '!', '"') and must NOT end in "..." → else
    *      n_noterm_lines;
    *   2. whitespace word count (the [[gopherStats]] trim/split
    *      convention — trim strips 0x20 only, interior runs split on
    *      [0x09–0x0d, 0x20]) must be ≥ `minWords` → else
    *      n_short_lines;
    *   3. lowered line must not contain "javascript" → else
    *      n_js_lines;
    *   4. lowered line must not contain any [[c4PolicyBytes]] policy
    *      substring → else n_policy_lines.
    * Kept lines contribute kept_chars (code points of the raw line)
    * and n_sentences (count of '.', '!', '?' bytes — the
    * SQL-stateable stand-in for a sentence tokenizer; multibyte
    * continuation bytes can never alias the ASCII marks).
    *
    * Page flags, over the RAW full text: has_lorem = lowered text
    * contains "lorem ipsum"; has_brace = any 0x7b byte; has_badword =
    * any whitespace token equals (ASCII-lowered) a word of the
    * space-separated `badwords` list (empty list → never). The keep
    * decision itself is taken in TextOps.qualityC4Docs by integer
    * comparison so every threshold is hash-exact.
    */
  @inline private def c4IsWs(b: Int): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Per-line C4 classification over raw bytes [s, p): 0 = kept,
    * 1 = noterm (no terminal mark, or "..."-ended), 2 = short,
    * 3 = javascript, 4 = policy — THE shared rule order of
    * [[c4Stats]] and [[c4CleanPage]] (one definition, both faces).
    */
  private def c4ClassifyLine(bytes: Array[Byte], s: Int, p: Int,
      minWords: Int): Int = {
    // right-trim 0x20 for the end-mark test
    var e = p
    while (e > s && bytes(e - 1) == 0x20) e -= 1
    val lastB = if (e > s) bytes(e - 1) & 0xff else 0
    val isTerm = lastB == '.' || lastB == '?' || lastB == '!' ||
      lastB == '"'
    val isEllipsis = e - s >= 3 && bytes(e - 1) == '.' &&
      bytes(e - 2) == '.' && bytes(e - 3) == '.'
    if (!isTerm || isEllipsis) return 1
    // word count with the gopherStats trim/split convention
    var lo = s; var hi = p
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    var words = 0
    if (lo == hi) words = 1
    else {
      if (c4IsWs(bytes(lo) & 0xff)) words += 1
      if (c4IsWs(bytes(hi - 1) & 0xff)) words += 1
      var i = lo
      while (i < hi) {
        if (!c4IsWs(bytes(i) & 0xff)) {
          while (i < hi && !c4IsWs(bytes(i) & 0xff)) i += 1
          words += 1
        } else i += 1
      }
    }
    if (words < minWords) return 2
    if (containsLowered(bytes, s, p, c4JsBytes)) return 3
    var pi = 0
    while (pi < c4PolicyBytes.length) {
      if (containsLowered(bytes, s, p, c4PolicyBytes(pi))) return 4
      pi += 1
    }
    0
  }

  private val c4JsBytes = "javascript".getBytes("UTF-8")
  private val c4LoremBytes = "lorem ipsum".getBytes("UTF-8")

  /** The page-level C4 stop flags over the raw text: bit 1 =
    * "lorem ipsum" (ASCII-lowered containment), bit 2 = curly brace,
    * bit 4 = badword token hit (whole-token, ASCII-lowered).
    */
  private def c4PageFlags(bytes: Array[Byte],
      bad: Map[Int, Array[Array[Byte]]]): Int = {
    val n = bytes.length
    var flags = 0
    if (containsLowered(bytes, 0, n, c4LoremBytes)) flags |= 1
    var q = 0
    while ((flags & 2) == 0 && q < n) {
      if (bytes(q) == '{') flags |= 2
      q += 1
    }
    if (bad.nonEmpty) {
      var i = 0
      while ((flags & 4) == 0 && i < n) {
        if (!c4IsWs(bytes(i) & 0xff)) {
          val ts = i
          while (i < n && !c4IsWs(bytes(i) & 0xff)) i += 1
          val len = i - ts
          bad.get(len) match {
            case Some(bucket) =>
              if (c4BadwordHit(bytes, ts, len, bucket)) flags |= 4
            case None => ()
          }
        } else i += 1
      }
    }
    flags
  }

  // per-thread Deflater for deflateSize: construction is the
  // expensive part; reset() reuses the native zlib stream
  private val deflaters =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** DEFLATE (zlib default level, raw stream) compressed byte length
    * of the UTF-8 text — the compressibility quality signal
    * (MADLAD-400-style): templated/repetitive text compresses far
    * below natural prose, near-random or binary-ish text refuses to
    * compress. Only the LENGTH is returned, computed through a fixed
    * 8 KiB scratch buffer — the compressed bytes are never
    * materialized. Deterministic within a JVM/zlib build (rows-only
    * downstream: compressed length is not an SQL-stateable quantity).
    */
  def deflateSize(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def c4Stats(text: UTF8String, badwords: String, minWords: Int): ArrayData = {
    val bad = c4BadwordTables.computeIfAbsent(badwords, c4ParseBadwords)
    val bytes = text.getBytes
    val n = bytes.length

    var nLines = 0L; var kept = 0L; var sentences = 0L; var keptChars = 0L
    var noTerm = 0L; var short = 0L; var jsLines = 0L; var policyLines = 0L

    var s = 0
    var p = 0
    while (p <= n) {
      if (p == n || bytes(p) == 0x0a) {
        nLines += 1
        c4ClassifyLine(bytes, s, p, minWords) match {
          case 1 => noTerm += 1
          case 2 => short += 1
          case 3 => jsLines += 1
          case 4 => policyLines += 1
          case _ =>
            kept += 1
            var i = s
            while (i < p) {
              val b = bytes(i) & 0xff
              if (b == '.' || b == '!' || b == '?') sentences += 1
              if ((b & 0xc0) != 0x80) keptChars += 1 // code points
              i += 1
            }
        }
        s = p + 1
      }
      p += 1
    }

    val flags = c4PageFlags(bytes, bad)
    new GenericArrayData(Array(nLines, kept, sentences, keptChars,
      noTerm, short, jsLines, policyLines,
      (flags & 1).toLong, ((flags >> 1) & 1).toLong,
      ((flags >> 2) & 1).toLong))
  }

  /** The C4 APPLY form: the CLEANED page — kept lines rejoined with
    * '\n' — or null when a page rule (lorem / brace / badword / under
    * `minSentences` sentence marks in kept lines) drops the page.
    * One pass, rule-for-rule identical to [[c4Stats]] (shared
    * [[c4ClassifyLine]] / [[c4PageFlags]]); String-based because its
    * caller is the typed flatMap of TextOps.c4Apply (the lineDedup
    * rebuild convention — dropped pages must drop ROWS, which a
    * projection kernel cannot).
    */
  def c4CleanPage(text: String, badwords: String, minWords: Int,
      minSentences: Int): String = {
    // null text = the page does not exist: same verdict as a page
    // every rule drops (null return ⇒ caller emits no row). Without
    // this, ONE null crawl record NPE'd the whole C4 job — the typed
    // flatMap face has no nullSafeEval wrapper to hide behind
    // (PipelineSpec's null-text pin).
    if (text == null) return null
    val bad = c4BadwordTables.computeIfAbsent(badwords, c4ParseBadwords)
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length
    if (c4PageFlags(bytes, bad) != 0) return null
    val sb = new java.lang.StringBuilder
    var kept = 0
    var sentences = 0L
    var s = 0
    var p = 0
    while (p <= n) {
      if (p == n || bytes(p) == 0x0a) {
        if (c4ClassifyLine(bytes, s, p, minWords) == 0) {
          if (kept > 0) sb.append('\n')
          sb.append(new String(bytes, s, p - s, "UTF-8"))
          kept += 1
          var i = s
          while (i < p) {
            val b = bytes(i) & 0xff
            if (b == '.' || b == '!' || b == '?') sentences += 1
            i += 1
          }
        }
        s = p + 1
      }
      p += 1
    }
    // kept == 0 must DROP the page even at minSentences = 0: an empty
    // rebuilt string would otherwise count as one kept line downstream
    // (c4Apply derives n_kept_lines from '\n'+1). Unreachable at the
    // TFDS defaults (sentences = 0 < 3 already drops), but the public
    // minSentences parameter exposes the edge.
    if (kept == 0 || sentences < minSentences) null else sb.toString
  }

  /** FUSED page statistics for the T38 one-scan signals table:
    * [[gopherStats]]' ten integers followed by [[c4Stats]]' eleven —
    * a 21-long array BIT-IDENTICAL to the two kernels' concatenation
    * (pinned by a differential spec), from ONE UTF8String byte copy,
    * ONE line pass and ONE token pass instead of two of each.
    *
    * Fusion points (semantics unchanged, only walk sharing):
    *   - the token pass computes the Gopher word/char/alpha/stop
    *     counts AND the C4 badword page flag — [[c4PageFlags]] walks
    *     the raw range while Gopher walks the 0x20-trimmed range, but
    *     0x20 is whitespace under both conventions, so the non-ws
    *     token runs are identical;
    *   - the line pass applies [[c4ClassifyLine]] (the SHARED rule
    *     chain of c4Stats/c4CleanPage) and accumulates kept-line
    *     sentence marks / code points alongside the Gopher
    *     distinct-line map, ellipsis test and char weights;
    *   - the symbol scan picks up the C4 curly-brace flag (a '{' is
    *     never inside a consumed "..." triple);
    *   - "lorem ipsum" containment stays its own substring scan.
    */
  def pageStats(text: UTF8String, stops: String, badwords: String,
      minWords: Int): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.pageStatsEvals.increment()
    val stopWords = gopherStopTables.computeIfAbsent(stops, { sp =>
      val arr = sp.split(" ").filter(_.nonEmpty).map(_.getBytes("UTF-8"))
      require(arr.length <= 64,
        s"gopher stop list has ${arr.length} words; the presence " +
          "bitmask supports at most 64")
      arr
    })
    val bad = c4BadwordTables.computeIfAbsent(badwords, c4ParseBadwords)
    val bytes = text.getBytes
    val n = bytes.length
    // ---- fused token pass (trimmed region; same token runs as raw) ----
    var lo = 0; var hi = n
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Int): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    var nWords = 0L; var wordChars = 0L; var alphaWords = 0L
    var stopMask = 0L; var badHit = false
    if (lo == hi) nWords = 1 // [''] — the regexp_split of empty
    else {
      if (isWs(bytes(lo) & 0xff)) nWords += 1
      if (isWs(bytes(hi - 1) & 0xff)) nWords += 1
      var i = lo
      while (i < hi) {
        if (!isWs(bytes(i) & 0xff)) {
          val s = i
          var hasAlpha = false
          while (i < hi && !isWs(bytes(i) & 0xff)) {
            val b = bytes(i) & 0xff
            if ((b & 0xc0) != 0x80) wordChars += 1 // code point start
            if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z'))
              hasAlpha = true
            i += 1
          }
          nWords += 1
          if (hasAlpha) alphaWords += 1
          val len = i - s
          var w = 0
          while (w < stopWords.length) {
            val sw = stopWords(w)
            if (sw.length == len) {
              var j = 0; var ok = true
              while (ok && j < len) {
                var c = bytes(s + j) & 0xff
                if (c >= 'A' && c <= 'Z') c += 32
                if (c != sw(j)) ok = false
                j += 1
              }
              if (ok) stopMask |= 1L << w
            }
            w += 1
          }
          if (!badHit && bad.nonEmpty) bad.get(len) match {
            case Some(bucket) =>
              if (c4BadwordHit(bytes, s, len, bucket)) badHit = true
            case None => ()
          }
        } else i += 1
      }
    }
    // ---- fused line pass (raw text, split on 0x0a) ----
    val lineCounts = new java.util.HashMap[String, Array[Long]]()
    val lineList = new scala.collection.mutable.ArrayBuffer[String]()
    var nLines = 0L; var ellipsisLines = 0L
    var lineChars = 0L; var dupLineChars = 0L
    var kept = 0L; var sentences = 0L; var keptChars = 0L
    var noTerm = 0L; var short = 0L; var jsLines = 0L; var policyLines = 0L
    var s = 0
    var p = 0
    while (p <= n) {
      if (p == n || bytes(p) == 0x0a) {
        nLines += 1
        val line = new String(bytes, s, p - s, "UTF-8")
        lineList += line
        val e0 = lineCounts.get(line)
        if (e0 == null) lineCounts.put(line, Array(1L))
        else e0(0) += 1
        var e = p
        while (e > s && bytes(e - 1) == 0x20) e -= 1
        if (e - s >= 3 && bytes(e - 1) == '.' && bytes(e - 2) == '.' &&
          bytes(e - 3) == '.') ellipsisLines += 1
        c4ClassifyLine(bytes, s, p, minWords) match {
          case 1 => noTerm += 1
          case 2 => short += 1
          case 3 => jsLines += 1
          case 4 => policyLines += 1
          case _ =>
            kept += 1
            var i = s
            while (i < p) {
              val b = bytes(i) & 0xff
              if (b == '.' || b == '!' || b == '?') sentences += 1
              if ((b & 0xc0) != 0x80) keptChars += 1 // code points
              i += 1
            }
        }
        s = p + 1
      }
      p += 1
    }
    val distinctLines = lineCounts.size().toLong
    lineList.foreach { line =>
      val chars = line.codePointCount(0, line.length).toLong
      lineChars += chars
      if (lineCounts.get(line)(0) >= 2) dupLineChars += chars
    }
    // ---- fused symbol/brace pass (raw text) ----
    var symbols = 0L
    var brace = false
    var q = 0
    while (q < n) {
      if (bytes(q) == '{') brace = true
      if (bytes(q) == '#') { symbols += 1; q += 1 }
      else if (q + 2 < n && bytes(q) == '.' && bytes(q + 1) == '.' &&
        bytes(q + 2) == '.') { symbols += 1; q += 3 }
      else q += 1
    }
    val lorem = containsLowered(bytes, 0, n, c4LoremBytes)
    new GenericArrayData(Array(
      // gopherStats' ten
      nWords, wordChars, alphaWords, nLines, distinctLines,
      ellipsisLines, symbols,
      java.lang.Long.bitCount(stopMask).toLong, lineChars, dupLineChars,
      // c4Stats' eleven
      nLines, kept, sentences, keptChars, noTerm, short, jsLines,
      policyLines, if (lorem) 1L else 0L, if (brace) 1L else 0L,
      if (badHit) 1L else 0L))
  }

  /** One-pass Gopher REPETITION statistics (Rae et al. 2021 §A1.1,
    * the n-gram half of the rule table): 10 integer values
    * [word_chars, top2, top3, top4, dup5, dup6, dup7, dup8, dup9,
    * dup10] where topN = the maximum over word-N-grams of
    * occurrences × gram characters (the deterministic tie-free form
    * of "fraction of characters in the most frequent n-gram") and
    * dupN = characters of tokens covered by ANY N-gram occurring ≥ 2
    * times, overlapping positions counted ONCE (the paper's
    * duplicate-n-gram character fraction). All masses are integer
    * character counts over the same token stream as [[gopherStats]]
    * (the TOKS artifact contract), so thresholds apply by integer
    * cross-multiplication against word_chars downstream.
    */
  def gopherRepetition(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    @inline def isWs(b: Int): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    // token list with the regexp_split artifacts (leading/trailing
    // empty elements), as Strings for exact gram equality
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    if (lo == hi) toks += ""
    else {
      if (isWs(bytes(lo) & 0xff)) toks += ""
      var i = lo
      while (i < hi) {
        if (!isWs(bytes(i) & 0xff)) {
          val s = i
          while (i < hi && !isWs(bytes(i) & 0xff)) i += 1
          toks += new String(bytes, s, i - s, "UTF-8")
        } else i += 1
      }
      if (isWs(bytes(hi - 1) & 0xff)) toks += ""
    }
    val T = toks.length
    val lens = new Array[Long](T)
    var wordChars = 0L
    var ti = 0
    while (ti < T) {
      lens(ti) = toks(ti).codePointCount(0, toks(ti).length).toLong
      wordChars += lens(ti)
      ti += 1
    }
    // intern tokens to dense ids — the shared identity stream every
    // n reuses (exact equality, no token-text copying per gram)
    val ids = new Array[Int](T)
    locally {
      val intern = new java.util.HashMap[String, Integer](T * 2)
      var q = 0
      while (q < T) {
        val nid = Integer.valueOf(intern.size())
        val prev = intern.putIfAbsent(toks(q), nid)
        ids(q) = if (prev == null) nid.intValue() else prev.intValue()
        q += 1
      }
    }
    // prefix char sums: any gram's char mass is one subtraction
    val prefix = new Array[Long](T + 1)
    locally {
      var q = 0
      while (q < T) { prefix(q + 1) = prefix(q) + lens(q); q += 1 }
    }
    val out = new Array[Long](10)
    out(0) = wordChars
    // Incremental pair interning: gram_n(i) ≡ (gram_{n-1}(i),
    // ids(i+n-1)) — interning the PAIR to a dense id makes each
    // gram's identity O(1), so every n is ONE pass over the shared
    // id stream instead of packing an O(n) key per position (the
    // r13 profile: key packing + string hashing was ~20 s of the
    // 100× signals-table scan). Exact by induction: two positions
    // get the same dense id iff their token-id sequences match.
    var prevG: Array[Int] = ids // length-1 gram ids
    var slot = 1
    var n = 2
    while (n <= 10) { // top mass for n=2..4, dup mass for n=5..10
      if (T >= n) {
        val m = T - n + 1
        val cur = new Array[Int](m)
        val pairs = new LongToIntMap(m)
        var distinct = 0
        var i = 0
        while (i < m) {
          val key = (prevG(i).toLong << 32) |
            (ids(i + n - 1).toLong & 0xffffffffL)
          val id = pairs.getOrInsert(key, distinct)
          if (id == distinct) distinct += 1
          cur(i) = id
          i += 1
        }
        val counts = new Array[Int](distinct)
        i = 0
        while (i < m) { counts(cur(i)) += 1; i += 1 }
        if (n <= 4) {
          var best = 0L
          i = 0
          while (i < m) {
            // same gram id => same tokens => same char mass
            val mass = counts(cur(i)).toLong * (prefix(i + n) - prefix(i))
            if (mass > best) best = mass
            i += 1
          }
          out(slot) = best
        } else {
          // union of covered [i, i+n) intervals left to right:
          // positions below covEnd are already counted (counts
          // overlapping occurrences once, the paper's form)
          var mass = 0L
          var covEnd = 0
          i = 0
          while (i < m) {
            if (counts(cur(i)) >= 2) {
              val from = if (i > covEnd) i else covEnd
              if (from < i + n) {
                mass += prefix(i + n) - prefix(from)
                covEnd = i + n
              }
            }
            i += 1
          }
          out(slot) = mass
        }
        prevG = cur
      }
      slot += 1
      n += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass statistics behind the T15 model score: [n_tokens,
    * stop_hits_en, punct_count, top_token_count, n_distinct_bigrams]
    * — the five integers [[graft.operators.TextOps.modelQualityScore]]
    * previously drew from five standalone kernels (five
    * UTF8String.getBytes copies + five text walks per row; the
    * shingle path also materialized + sorted the bigram hash array
    * just to take its size). ONE byte copy, one token-boundary scan
    * shared by four statistics, one separate punct byte scan.
    *
    * Each integer is BIT-IDENTICAL to its standalone kernel (pinned
    * by a differential spec): tokens are the space-trimmed
    * wsTokenCount convention INCLUDING the leading/trailing empty
    * artifacts (which never match a stopword and count toward the
    * top-token multiplicity exactly as topTokenCount's `empties`);
    * bigram identity is the shingleKeys FNV with empty source, so
    * the distinct count equals size(shingle_keys(text, '', 2)).
    */
  def modelStats(text: UTF8String): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.modelStatsEvals.increment()
    val bytes = text.getBytes
    // punct: whole-byte scan (spaces are not punctuation, so the
    // trim below cannot change it)
    var punct = 0L
    locally {
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        if ((b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
          (b >= '[' && b <= '`') || (b >= '{' && b <= '~')) punct += 1
        i += 1
      }
    }
    // token boundaries: THE shared tokenBounds scan (artifact
    // empties included) — one definition with shingleKeys
    val (starts, ends, nTok) = tokenBounds(bytes)
    // stop hits + per-token FNV (reused for top count and bigrams)
    val en = stopwordTable("en")
    val tokHash = new Array[Long](nTok)
    var stopHits = 0L
    var empties = 0
    locally {
      var t = 0
      while (t < nTok) {
        val st = starts(t); val e = ends(t)
        if (st == e) empties += 1
        else {
          var w = 0
          while (w < en.length) {
            if (tokenEquals(bytes, st, e, en(w))) {
              stopHits += 1; w = en.length
            } else w += 1
          }
        }
        var h = 0xcbf29ce484222325L
        var j = st
        while (j < e) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
        tokHash(t) = h
        t += 1
      }
    }
    // top multiplicity over NON-empty tokens — hash AND content
    // equal, the topTokenCount contract (hash-only identity could
    // merge FNV-colliding tokens); empties compete as their own token
    var top = 0L
    locally {
      var cap = Integer.highestOneBit(Math.max(16, nTok * 2)) << 1
      val hashes = new Array[Long](cap)
      val tokIdx = new Array[Int](cap)
      val counts = new Array[Int](cap)
      var t = 0
      while (t < nTok) {
        if (starts(t) != ends(t)) {
          val h = tokHash(t)
          var slot = (h & (cap - 1)).toInt
          var done = false
          while (!done) {
            if (counts(slot) == 0) {
              hashes(slot) = h; tokIdx(slot) = t; counts(slot) = 1
              if (top == 0L) top = 1L
              done = true
            } else if (hashes(slot) == h && {
              val o = tokIdx(slot)
              ends(o) - starts(o) == ends(t) - starts(t) &&
                regionEquals(bytes, starts(o), starts(t),
                  ends(t) - starts(t))
            }) {
              counts(slot) += 1
              if (counts(slot) > top) top = counts(slot)
              done = true
            } else slot = (slot + 1) & (cap - 1)
          }
        }
        t += 1
      }
      if (nTok == 1 && starts(0) == ends(0)) top = 1L // "" → [""]
      if (empties > top) top = empties
    }
    // distinct bigram FNV keys (shingleKeys source='' formula)
    var nBigrams = 0L
    if (nTok >= 2) {
      var hSrc = 0xcbf29ce484222325L
      hSrc *= 0x100000001b3L // empty-source separator fold
      val set = new LongToIntMap(nTok)
      var distinct = 0
      var s = 0
      while (s <= nTok - 2) {
        var h = hSrc
        var b = starts(s)
        while (b < ends(s)) {
          h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1
        }
        h ^= 0x20L; h *= 0x100000001b3L
        b = starts(s + 1)
        while (b < ends(s + 1)) {
          h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1
        }
        val id = set.getOrInsert(h, distinct)
        if (id == distinct) distinct += 1
        s += 1
      }
      nBigrams = distinct
    }
    new GenericArrayData(Array(nTok.toLong, stopHits, punct, top,
      nBigrams))
  }

  /** Spark `least(a, b)` for doubles, exactly: the comparison is
    * java.lang.Double.compare (NaN greatest, -0.0 < 0.0), NOT
    * math.min — least(NaN, 1.0) must be 1.0 where math.min gives NaN
    * (empty docs produce NaN ratios and the historical Column tree
    * clamps them through Least).
    */
  @inline private def leastD(a: Double, b: Double): Double =
    if (java.lang.Double.compare(b, a) < 0) b else a

  /** The T15 model score in ONE call — the [[modelStats]] pass plus
    * the rational clamp arithmetic, every double operation in the
    * SAME order as the historical Column tree
    * ([[graft.operators.TextOps.modelQualityScoreTree]], retained as
    * the executable spec), so the score is bit-identical
    * (ModelStatsSpec's differential battery + the ScalaCheck property
    * vs the interpreted tree).
    *
    * Why a fused kernel and not the tree: `FilterExec` does NO
    * subexpression elimination (only Project/Aggregate do), so a
    * quality-gate predicate built from the tree re-evaluates
    * `model_stats` once per element_at reference — measured 10× per
    * corpus row in the P1/P2 gates. One static call makes the score
    * an indivisible unit in any predicate, and drops ~40 expression
    * nodes from every fused projection that carries it.
    *
    * Division semantics are IEEE (the DuckDB oracle's), not ANSI's
    * divide-by-zero error: the only zero divisor is `numChars == 0`
    * — the empty string, which no corpus row produces — and there
    * the NaN ratio clamps through Least to a defined score exactly
    * as the tree does under `spark.sql.ansi.enabled = false`.
    */
  def modelScore(text: UTF8String): Double = {
    val ms = modelStats(text)
    val ntI = ms.getLong(0)
    val nt = ntI.toDouble
    val lenF = leastD(nt, 400.0) / 400.0
    val swF = leastD(ms.getLong(1).toDouble / nt * 4.0, 1.0)
    val punctR = ms.getLong(2).toDouble / text.numChars().toDouble
    val topR = ms.getLong(3).toDouble / nt
    val dupFrac =
      if (ntI <= 1L) 0.0
      else (ntI - 1L - ms.getLong(4)).toDouble / (ntI - 1L).toDouble
    lenF * 0.35 +
      swF * 0.25 +
      (1.0 - leastD(punctR * 5.0, 1.0)) * 0.15 +
      (1.0 - topR) * 0.15 +
      (1.0 - dupFrac) * 0.10
  }

  /** Minimal open-addressed long→int map for gram-pair interning:
    * fixed capacity (no resizing — the caller knows the gram count
    * bound), linear probing, no deletes.
    */
  private final class LongToIntMap(expected: Int) {
    private val cap = {
      var c = 4
      while (c < expected * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val vals = new Array[Int](cap)
    private val used = new Array[Boolean](cap)

    /** Existing value for `key`, else insert `newVal` and return it. */
    def getOrInsert(key: Long, newVal: Int): Int = {
      val x = key * -0x61c8864680b583ebL // fibonacci mix
      var h = ((x >>> 32) ^ x).toInt & mask
      while (true) {
        if (!used(h)) {
          used(h) = true; keys(h) = key; vals(h) = newVal
          return newVal
        }
        if (keys(h) == key) return vals(h)
        h = (h + 1) & mask
      }
      -1 // unreachable
    }
  }

  /** Positional agreement of two equal-length long arrays — the
    * MinHash signature-agreement count (est jaccard = agree / k).
    * Unequal lengths compare the common prefix (callers pin k).
    */
  def positionalAgreeCount(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray(); val y = b.toLongArray()
    val n = math.min(x.length, y.length)
    var i = 0; var c = 0
    while (i < n) {
      if (x(i) == y(i)) c += 1
      i += 1
    }
    c
  }

  /** 64-bit SimHash over token hashes (Charikar '02): per-bit vote of
    * every token's FNV hash, sign → bit.
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      if (s != null) {
        val h = fnv1a(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** SimHash straight from text: tokenizes the UTF-8 bytes with the
    * same split(trim, \s+) rules as [[shingleKeys]] and votes each
    * token's FNV-1a — identical output to simhash(split tokens)
    * (pinned by TextKernelPropSpec) without materializing the token
    * string array.
    */
  def simhashText(text: UTF8String): Long = {
    val bytes = text.getBytes
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    val votes = new Array[Int](64)
    def vote(s: Int, e: Int): Unit = {
      var h = 0xcbf29ce484222325L
      var i = s
      while (i < e) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var i = lo; var tokStart = lo
    while (i < hi) {
      if (isWsByte(bytes(i) & 0xff)) {
        vote(tokStart, i)
        while (i < hi && isWsByte(bytes(i) & 0xff)) i += 1
        tokStart = i
      } else i += 1
    }
    vote(tokStart, hi) // final token (empty under trailing ws — same
    // as the split(limit=-1) token list the array form hashes)
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Canonical-form MD5 fingerprint in one pass: ASCII-space trim,
    * every `\s+` run (Java \s set) collapsed to a single 0x20, MD5
    * over the canonical UTF-8 bytes, lowercase hex — BIT-IDENTICAL to
    * md5(regexp_replace(trim(text), '\s+', ' ')) in both Spark and
    * DuckDB (the oracle states exactly that), without materializing
    * the regex-rewritten string (pinned by TextKernelPropSpec).
    */
  def canonicalMd5(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    val canon = new Array[Byte](hi - lo)
    var n = 0
    var i = lo
    while (i < hi) {
      if (isWsByte(bytes(i) & 0xff)) {
        canon(n) = 0x20; n += 1
        while (i < hi && isWsByte(bytes(i) & 0xff)) i += 1
      } else {
        canon(n) = bytes(i); n += 1; i += 1
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(canon, 0, n)
    val digest = md.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((digest(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = HexDigits(digest(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** Winnowing sketch (Schleimer/Wilkerson/Aiken '03): Karp-Rabin
    * hashes of all `k`-char grams; within every window of `win`
    * consecutive gram hashes keep the minimum (rightmost on ties).
    * Guarantees: any shared substring of length ≥ win+k-1 yields a
    * shared fingerprint. Returns the distinct selected minima,
    * sorted — the document's plagiarism/near-dup sketch.
    */
  def winnow(text: UTF8String, k: Int, win: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val B = 257L
    var powK = 1L
    var i = 0
    while (i < k - 1) { powK = mulmodP(powK, B); i += 1 }
    val grams = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) {
      h = mulmodP(h, B) + (bytes(i) & 0xffL); if (h >= P) h -= P; i += 1
    }
    grams(0) = h
    i = 1
    while (i < n) {
      val out = mulmodP(bytes(i - 1) & 0xffL, powK)
      h = h - out; if (h < 0) h += P
      h = mulmodP(h, B) + (bytes(i + k - 1) & 0xffL); if (h >= P) h -= P
      grams(i) = h
      i += 1
    }
    // windowed minima via monotonic deque — O(n) total, rightmost on
    // ties (pop-back on >=), collected into a primitive array and
    // sort+deduped at the end. The previous O(n·win) rescan with a
    // boxed TreeSet add per window dominated the 100× probe (500M
    // boxed inserts corpus-wide).
    val w = math.min(win, n)
    val deque = new Array[Int](n) // indices, increasing gram values
    var head = 0; var tail = 0 // [head, tail)
    val sel = new Array[Long](math.max(n - w + 1, 1))
    var nSel = 0
    var j = 0
    while (j < n) {
      while (tail > head && grams(deque(tail - 1)) >= grams(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) {
        val m = grams(deque(head))
        // adjacent-window dup skip; full dedupe after the sort below
        if (nSel == 0 || sel(nSel - 1) != m) { sel(nSel) = m; nSel += 1 }
      }
      j += 1
    }
    val trimmed = java.util.Arrays.copyOf(sel, nSel)
    java.util.Arrays.sort(trimmed)
    var wIdx = 0; var r = 0
    while (r < trimmed.length) {
      if (r == 0 || trimmed(r) != trimmed(r - 1)) {
        trimmed(wIdx) = trimmed(r); wIdx += 1
      }
      r += 1
    }
    new GenericArrayData(
      if (wIdx == trimmed.length) trimmed
      else java.util.Arrays.copyOf(trimmed, wIdx))
  }

  /** Multi-minima winnowing: the `t` SMALLEST gram hashes per window
    * instead of one — a denser sketch that also surfaces shared runs
    * shorter than the win+k-1 single-min guarantee. t=1 delegates to
    * [[winnow]] (bit-identical); per-window partial selection is
    * O(win·t) with win small by construction.
    */
  def winnowMulti(text: UTF8String, k: Int, win: Int, t: Int): ArrayData = {
    if (t <= 1) return winnow(text, k, win)
    val bytes = text.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val B = 257L
    var powK = 1L
    var i = 0
    while (i < k - 1) { powK = mulmodP(powK, B); i += 1 }
    val grams = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) {
      h = mulmodP(h, B) + (bytes(i) & 0xffL); if (h >= P) h -= P; i += 1
    }
    grams(0) = h
    i = 1
    while (i < n) {
      val out = mulmodP(bytes(i - 1) & 0xffL, powK)
      h = h - out; if (h < 0) h += P
      h = mulmodP(h, B) + (bytes(i + k - 1) & 0xffL); if (h >= P) h -= P
      grams(i) = h
      i += 1
    }
    val w = math.min(win, n)
    val tt = math.min(t, w)
    val sel = new Array[Long]((n - w + 1).toLong.toInt * tt)
    var nSel = 0
    val best = new Array[Long](tt)
    var s = 0
    while (s + w <= n) {
      var filled = 0
      var j = s
      while (j < s + w) {
        val v = grams(j)
        // insertion into the tiny sorted buffer of current minima
        if (filled < tt) {
          var p = filled
          while (p > 0 && best(p - 1) > v) { best(p) = best(p - 1); p -= 1 }
          best(p) = v; filled += 1
        } else if (v < best(tt - 1)) {
          var p = tt - 1
          while (p > 0 && best(p - 1) > v) { best(p) = best(p - 1); p -= 1 }
          best(p) = v
        }
        j += 1
      }
      var b = 0
      while (b < filled) { sel(nSel) = best(b); nSel += 1; b += 1 }
      s += 1
    }
    val trimmed = java.util.Arrays.copyOf(sel, nSel)
    java.util.Arrays.sort(trimmed)
    var wIdx = 0; var r = 0
    while (r < trimmed.length) {
      if (r == 0 || trimmed(r) != trimmed(r - 1)) {
        trimmed(wIdx) = trimmed(r); wIdx += 1
      }
      r += 1
    }
    new GenericArrayData(
      if (wIdx == trimmed.length) trimmed
      else java.util.Arrays.copyOf(trimmed, wIdx))
  }

  /** Karp-Rabin rolling-hash document fingerprint: minimum polynomial
    * hash over all `w`-char windows (winnowing's global minimum —
    * robust to edits outside the minimal window).
    */
  def rollingFingerprint(text: UTF8String, w: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val win = math.min(w, n)
    val B = 257L
    var powW = 1L // B^(win-1) mod P
    var i = 0
    while (i < win - 1) { powW = mulmodP(powW, B); i += 1 }
    var h = 0L
    i = 0
    while (i < win) {
      h = mulmodP(h, B) + (bytes(i) & 0xffL)
      if (h >= P) h -= P
      i += 1
    }
    var min = h
    i = win
    while (i < n) {
      val out = mulmodP(bytes(i - win) & 0xffL, powW)
      h = h - out
      if (h < 0) h += P
      h = mulmodP(h, B) + (bytes(i) & 0xffL)
      if (h >= P) h -= P
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Single-pass count of `[a-z]+|[0-9]+|[^a-z0-9\\s]` matches — the
    * BPE-ish pre-tokenizer count — without materializing the match
    * array the way regexp_extract_all does (the dominant text-op cost
    * at the 100x probe). Byte-level UTF-8 walk: continuation bytes
    * belong to a preceding non-ASCII code point, which (like every
    * other non-letter/digit/space char) counts as one single-char
    * match; letter/digit runs count once. Matches Java regex and RE2
    * semantics for the oracle (ASCII \\s set is identical in both).
    */
  /** Distinct word-n-gram shingle keys in ONE pass over the UTF-8
    * bytes — the jaccardPairs posting generator. Replaces
    * tokens() + wordShinglesFrom() + array_distinct() + per-shingle
    * string hashing: no token array, no shingle strings, no string
    * comparisons. Semantics pinned to the expression chain it
    * replaces (ShingleKeysPropSpec):
    *   - trim ASCII spaces only (Spark `trim`), then tokenize on
    *     Java `\s+` runs with split-limit -1 empties (leading ws run
    *     → empty first token, trailing run → empty last token)
    *   - shingle i = tokens i..i+n-1 joined by a single 0x20, hashed
    *     FNV-1a from a seed of fnv1a(source)·prime — the block key
    *     folded into the posting key so the source string never
    *     shuffles
    *   - output sorted + deduplicated (set semantics)
    */
  /** Space-trimmed whitespace token boundaries with the regexp_split
    * artifact convention (leading/trailing EMPTY elements when the
    * trimmed text starts/ends with non-space whitespace; the single
    * empty token for all-space text) — THE tokenizer definition
    * shared by [[shingleKeys]] and [[modelStats]], so the
    * bit-identical contract between them rests on one scan, not on
    * keeping copies in sync. Returns (starts, ends, nTok).
    */
  private def tokenBounds(
      bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    var lo = 0; var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    var nTok = 0
    var starts = new Array[Int](16); var ends = new Array[Int](16)
    def push(s: Int, e: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = s; ends(nTok) = e; nTok += 1
    }
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWsByte(bytes(i) & 0xff)) {
        push(tokStart, i)
        while (i < hi && isWsByte(bytes(i) & 0xff)) i += 1
        tokStart = i
      } else i += 1
    }
    push(tokStart, hi)
    (starts, ends, nTok)
  }

  def shingleKeys(text: UTF8String, source: UTF8String, n: Int): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.shingleEvals.increment()
    val bytes = text.getBytes
    val (starts, ends, nTok) = tokenBounds(bytes)
    if (nTok < n) return new GenericArrayData(Array.empty[Long])

    var hSrc = 0xcbf29ce484222325L
    val src = source.getBytes
    var j = 0
    while (j < src.length) {
      hSrc ^= (src(j) & 0xffL); hSrc *= 0x100000001b3L; j += 1
    }
    hSrc *= 0x100000001b3L // separator fold: source|shingle unambiguous

    val out = new Array[Long](nTok - n + 1)
    var s = 0
    while (s <= nTok - n) {
      var h = hSrc
      var k = s
      while (k < s + n) {
        if (k > s) { h ^= 0x20L; h *= 0x100000001b3L }
        var b = starts(k)
        while (b < ends(k)) {
          h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1
        }
        k += 1
      }
      out(s) = h
      s += 1
    }
    java.util.Arrays.sort(out)
    var w = 0; var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  def bpeTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var count = 0
    var prev = -1 // 0=a-z run, 1=digit run, 2=space, 3=other
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if ((b & 0xc0) == 0x80) {
        // UTF-8 continuation: same code point as its lead byte
      } else {
        val cls =
          if (b >= 'a' && b <= 'z') 0
          else if (b >= '0' && b <= '9') 1
          else if (b == 0x20 || (b >= 0x09 && b <= 0x0d)) 2
          else 3
        if (cls == 3) count += 1
        else if (cls != 2 && cls != prev) count += 1
        prev = cls
      }
      i += 1
    }
    count
  }

  /** Single-pass `size(split(trim(text), "\\s+"))` — whitespace
    * token count without materializing the token array. Matches
    * Spark's split exactly (Java split with limit -1): trim strips
    * 0x20 only; a leading or trailing \\s separator the trim left
    * behind (tab etc.) yields an empty element on that side; an
    * empty input yields one (empty) element.
    */
  def wsTokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (lo == hi) return 1
    def isWs(b: Int): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    var count = 0
    if (isWs(bytes(lo) & 0xff)) count += 1 // leading empty element
    if (isWs(bytes(hi - 1) & 0xff)) count += 1 // trailing empty element
    var inRun = false
    var i = lo
    while (i < hi) {
      val ws = isWs(bytes(i) & 0xff)
      if (!ws && !inRun) count += 1
      inRun = !ws
      i += 1
    }
    count
  }

  /** Single-pass ASCII punctuation count (`[!-/:-@\\[-`{-~]`) — the
    * two-regexp_replace length-difference idiom walks the text twice
    * and allocates a rewritten copy; this counts in place. Punct
    * chars are single-byte ASCII, so bytes == code points here.
    */
  def punctCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var count = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if ((b >= '!' && b <= '/') || (b >= ':' && b <= '@') ||
        (b >= '[' && b <= '`') || (b >= '{' && b <= '~')) count += 1
      i += 1
    }
    count
  }

  /** Stopword tables for the single-pass text kernels (mirrors
    * TextFunctions.stopwords; UTF-8 byte forms, all ASCII).
    */
  private val stopwordTable: Map[String, Array[Array[Byte]]] = Map(
    "en" -> Array("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Array("der", "die", "das", "und", "ist", "ein"),
    "es" -> Array("el", "la", "de", "los", "y", "es", "un"),
    "fr" -> Array("le", "la", "les", "et", "des", "est", "un"))
    .map { case (k, v) => k -> v.map(_.getBytes("UTF-8")) }

  // per-spec parsed term tables for termCounts (space-separated spec
  // string → UTF-8 byte forms), memoized so the per-row kernel never
  // re-parses; specs come from query literals — a handful ever exist
  private val termTables =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Byte]]]()

  /** Single-pass per-term token-match counts: for each term in the
    * space-separated `spec`, how many whitespace tokens of `s` equal
    * it — `q` instances of `size(filter(split(...), _ = term))` in ONE
    * walk with no token array. The BM25 tf kernel.
    */
  def termCounts(s: UTF8String, spec: String): ArrayData = {
    if (KernelMetrics.enabled) KernelMetrics.termEvals.increment()
    val terms = termTables.computeIfAbsent(spec,
      sp => sp.split(" ").map(_.getBytes("UTF-8")))
    val counts = new Array[Int](terms.length)
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWsByte(bytes(i) & 0xff)) i += 1
      val start = i
      while (i < n && !isWsByte(bytes(i) & 0xff)) i += 1
      if (i > start) {
        var w = 0
        while (w < terms.length) {
          if (tokenEquals(bytes, start, i, terms(w))) counts(w) += 1
          w += 1
        }
      }
    }
    new GenericArrayData(counts)
  }

  private def tokenEquals(bytes: Array[Byte], from: Int, to: Int,
      w: Array[Byte]): Boolean = {
    if (to - from != w.length) return false
    var i = 0
    while (i < w.length) {
      if (bytes(from + i) != w(i)) return false
      i += 1
    }
    true
  }

  private def isWsByte(b: Int): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Single-pass `size(filter(split-tokens, t -> t IN stopwords))` —
    * stopword occurrence count without the token array or the
    * per-element lambda. Token = maximal non-\\s run (empty tokens
    * from split never match a stopword, so they are skippable).
    */
  def stopwordHits(s: UTF8String, lang: String): Int = {
    val words = stopwordTable(lang)
    val bytes = s.getBytes
    var count = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWsByte(bytes(i) & 0xff)) i += 1
      val start = i
      while (i < n && !isWsByte(bytes(i) & 0xff)) i += 1
      if (i > start) {
        var w = 0
        while (w < words.length) {
          if (tokenEquals(bytes, start, i, words(w))) {
            count += 1; w = words.length
          } else w += 1
        }
      }
    }
    count
  }

  private val langs = Array("en", "de", "es", "fr")

  /** Single-pass language ID: distinct stopword TYPES per language
    * (bitmask per lang) over one token walk, argmax with fixed tie
    * order en > de > es > fr, zero hits → "und" — exactly the
    * argmax-of-array_intersect formulation the oracle states.
    */
  def langId(s: UTF8String): UTF8String = {
    val tables = langs.map(stopwordTable)
    val masks = new Array[Int](langs.length)
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWsByte(bytes(i) & 0xff)) i += 1
      val start = i
      while (i < n && !isWsByte(bytes(i) & 0xff)) i += 1
      if (i > start) {
        var l = 0
        while (l < tables.length) {
          val words = tables(l)
          var w = 0
          while (w < words.length) {
            if ((masks(l) & (1 << w)) == 0 &&
              tokenEquals(bytes, start, i, words(w)))
              masks(l) |= 1 << w
            w += 1
          }
          l += 1
        }
      }
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < masks.length) {
      val score = Integer.bitCount(masks(l))
      if (score > best) { best = score; bestIdx = l } // strict > keeps tie order
      l += 1
    }
    UTF8String.fromString(if (bestIdx < 0) "und" else langs(bestIdx))
  }

  private def regionEquals(bytes: Array[Byte], a: Int, b: Int,
      len: Int): Boolean = {
    var i = 0
    while (i < len) {
      if (bytes(a + i) != bytes(b + i)) return false
      i += 1
    }
    true
  }

  /** Single-pass MAX TOKEN FREQUENCY — the `top_c` of the Gopher
    * top-token repetition signal without explode → token-row
    * shuffle → re-join: one open-addressing count table per row
    * keyed by (FNV-1a, first-occurrence span), byte-verified on
    * every probe hit so hash-equal but distinct tokens never merge.
    * Split semantics match the oracle's
    * `regexp_split_to_array(trim(text), '\s+')` exactly: space-only
    * trim, ASCII `\s` runs as separators, and the leading/trailing
    * empty token a `\s`-initial or `\s`-final trimmed string yields
    * (both are the same "" value, so they merge — max 2 of them).
    */
  def topTokenCount(s: UTF8String): Long = {
    if (KernelMetrics.enabled) KernelMetrics.topTokenEvals.increment()
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (lo == hi) return 1L // "" splits to the single empty token
    var empties = 0
    if (isWsByte(bytes(lo) & 0xff)) empties += 1
    if (isWsByte(bytes(hi - 1) & 0xff)) empties += 1
    var cap = Integer.highestOneBit(Math.max(16, (hi - lo) / 4 + 8)) << 1
    var hashes = new Array[Long](cap)
    var starts = new Array[Int](cap)
    var lens = new Array[Int](cap)
    var counts = new Array[Int](cap) // 0 = empty slot
    var used = 0
    var best = 0
    var i = lo
    while (i < hi) {
      while (i < hi && isWsByte(bytes(i) & 0xff)) i += 1
      val st = i
      while (i < hi && !isWsByte(bytes(i) & 0xff)) i += 1
      if (i > st) {
        var h = 0xcbf29ce484222325L
        var j = st
        while (j < i) {
          h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1
        }
        var slot = (h & (cap - 1)).toInt
        var done = false
        while (!done) {
          if (counts(slot) == 0) {
            hashes(slot) = h; starts(slot) = st; lens(slot) = i - st
            counts(slot) = 1
            used += 1
            if (best == 0) best = 1
            done = true
          } else if (hashes(slot) == h && lens(slot) == i - st &&
              regionEquals(bytes, starts(slot), st, i - st)) {
            counts(slot) += 1
            if (counts(slot) > best) best = counts(slot)
            done = true
          } else slot = (slot + 1) & (cap - 1)
        }
        if (used * 4 > cap * 3) { // load 0.75 → double + rehash
          val ncap = cap << 1
          val nh = new Array[Long](ncap)
          val ns = new Array[Int](ncap)
          val nl = new Array[Int](ncap)
          val nc = new Array[Int](ncap)
          var k = 0
          while (k < cap) {
            if (counts(k) != 0) {
              var sl = (hashes(k) & (ncap - 1)).toInt
              while (nc(sl) != 0) sl = (sl + 1) & (ncap - 1)
              nh(sl) = hashes(k); ns(sl) = starts(k)
              nl(sl) = lens(k); nc(sl) = counts(k)
            }
            k += 1
          }
          hashes = nh; starts = ns; lens = nl; counts = nc; cap = ncap
        }
      }
    }
    Math.max(best, empties).toLong
  }

  // ------------------------------------------------------------------
  // T45 HTML→text extraction kernel.
  //
  // Semantics contract: EXACTLY the historical regexp_replace chain
  // (TextOps.htmlTextRegex, which also generates the DuckDB oracle):
  //   1. (?is)<script[^>]*>.*?</script>  → " "
  //   2. (?is)<style[^>]*>.*?</style>    → " "
  //   3. (?s)<!--.*?-->                  → " "
  //   4. (?i)</?(?:p|br|li|ul|ol|div|h[1-6]|tr|table|blockquote)\b[^>]*> → "\n"
  //   5. <[^>]*>                         → " "
  //   6. &nbsp; &lt; &gt; &quot; &#39; &amp; → sequential literal decode
  //   7. [ \t\r]+ → " ";  8. " ?\n[ \n]*" → "\n";  9. trim ^\s+|\s+$
  //
  // Each rule stays its own scan (rule-per-scan, not one fused
  // automaton) because the chain's passes interact through their
  // REPLACEMENTS: e.g. removing a script span can join `<style` +
  // `foo>` into a pass-2 start tag, and pass-4's "\n" can join
  // `<a` + `b>` into a pass-5 tag. A fused single pass would decide
  // those cases differently; sequential scans reproduce the chain
  // bit-for-bit (differential-spec'd). Each scan is indexOf-driven
  // (JIT-intrinsified substring search) and allocates only when it
  // actually rewrites, which is what buys the severalfold win over
  // ten java.util.regex passes — not pass fusion.
  //
  // Case-insensitivity is ASCII-only, matching java.util.regex
  // CASE_INSENSITIVE without UNICODE_CASE (String.regionMatches'
  // Unicode folding would wrongly match e.g. U+017F LONG S against
  // "script"). \b however is NOT ASCII in java.util.regex: without
  // UNICODE_CHARACTER_CLASS, Bound.isWord(ch) is
  // `ch == '_' || Character.isLetterOrDigit(ch)` — Unicode letters
  // and digits count (the well-known \b/\w asymmetry), so `<divé>`
  // is NOT a block tag (é continues the word) while `<div€>` is.
  // The boundary check below mirrors that codepoint-exactly
  // (property-tested against the java.util.regex chain).
  // ------------------------------------------------------------------

  private def asciiRegionIC(s: String, at: Int, lower: String): Boolean = {
    if (at < 0 || at + lower.length > s.length) return false
    var i = 0
    while (i < lower.length) {
      val a = s.charAt(at + i)
      val b = lower.charAt(i)
      if (a != b && !(a >= 'A' && a <= 'Z' && (a + 32) == b)) return false
      i += 1
    }
    true
  }

  /** java.util.regex Bound.isWord without UNICODE_CHARACTER_CLASS:
    * '_' or a Unicode letter/digit, codepoint-aware.
    */
  private def isJavaWord(s: String, i: Int): Boolean =
    i < s.length && {
      val cp = s.codePointAt(i)
      cp == '_' || Character.isLetterOrDigit(cp)
    }

  /** Rule 1/2: `(?is)<name[^>]*>.*?</name>` → " ". Leftmost start,
    * start tag ends at the FIRST '>' (the char class cannot cross
    * one), lazy body ends at the FIRST literal `</name>`; a start
    * with no closing pair fails and the search resumes at the next
    * '<' — all exactly the regex engine's moves.
    */
  private def stripElement(s: String, name: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    var sb: java.lang.StringBuilder = null
    var last = 0
    val nlen = name.length
    while (i >= 0) {
      var next = -1
      if (asciiRegionIC(s, i + 1, name)) {
        val gt = s.indexOf('>', i + 1 + nlen)
        if (gt >= 0) {
          // first case-insensitive </name> strictly after the start tag
          var j = s.indexOf('<', gt + 1)
          var end = -1
          while (end < 0 && j >= 0 && j + nlen + 3 <= s.length) {
            if (s.charAt(j + 1) == '/' && asciiRegionIC(s, j + 2, name) &&
                s.charAt(j + 2 + nlen) == '>') end = j + nlen + 3
            else j = s.indexOf('<', j + 1)
          }
          if (end >= 0) {
            if (sb == null) sb = new java.lang.StringBuilder(s.length)
            sb.append(s, last, i).append(' ')
            last = end
            next = s.indexOf('<', end)
          }
        }
      }
      i = if (next >= 0 || last > i) next else s.indexOf('<', i + 1)
    }
    if (sb == null) s
    else { sb.append(s, last, s.length); sb.toString }
  }

  /** Rule 3: `(?s)<!--.*?-->` → " ". */
  private def stripComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (i >= 0) {
      val end = s.indexOf("-->", i + 4)
      if (end < 0) i = -1 // no terminator left: no later start can match
      else {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, last, i).append(' ')
        last = end + 3
        i = s.indexOf("<!--", last)
      }
    }
    if (sb == null) s
    else { sb.append(s, last, s.length); sb.toString }
  }

  /** Index just past a block-level tag name matched at `at` with an
    * ASCII \b after it, or -1. The alternation set is prefix-free so
    * regex trial order is immaterial.
    */
  private def blockNameEnd(s: String, at: Int): Int = {
    if (at >= s.length) return -1
    def ok(n: String): Boolean =
      asciiRegionIC(s, at, n) && !isJavaWord(s, at + n.length)
    (s.charAt(at) | 0x20).toChar match {
      case 'p' => if (ok("p")) at + 1 else -1
      case 'b' =>
        if (ok("br")) at + 2 else if (ok("blockquote")) at + 10 else -1
      case 'l' => if (ok("li")) at + 2 else -1
      case 'u' => if (ok("ul")) at + 2 else -1
      case 'o' => if (ok("ol")) at + 2 else -1
      case 'd' => if (ok("div")) at + 3 else -1
      case 't' =>
        if (ok("tr")) at + 2 else if (ok("table")) at + 5 else -1
      case 'h' =>
        if (at + 1 < s.length) {
          val d = s.charAt(at + 1)
          if (d >= '1' && d <= '6' && !isJavaWord(s, at + 2)) at + 2
          else -1
        } else -1
      case _ => -1
    }
  }

  /** Rule 4: block tags → "\n". `[^>]*` may swallow '<' (the
    * malformed-attribute case: `<div class="oops</body>` is ONE
    * match), exactly as the regex.
    */
  private def replaceBlockTags(s: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (i >= 0) {
      var next = -1
      val off = if (i + 1 < s.length && s.charAt(i + 1) == '/') 2 else 1
      val ne = blockNameEnd(s, i + off)
      if (ne > 0) {
        val gt = s.indexOf('>', ne)
        if (gt >= 0) {
          if (sb == null) sb = new java.lang.StringBuilder(s.length)
          sb.append(s, last, i).append('\n')
          last = gt + 1
          next = s.indexOf('<', gt + 1)
        }
      }
      i = if (last > i) next else s.indexOf('<', i + 1)
    }
    if (sb == null) s
    else { sb.append(s, last, s.length); sb.toString }
  }

  /** Rule 5: `<[^>]*>` → " ". A '<' with no '>' anywhere after it
    * ends the pass (nothing later can match either).
    */
  private def stripAllTags(s: String): String = {
    var i = s.indexOf('<')
    if (i < 0) return s
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (i >= 0) {
      val gt = s.indexOf('>', i + 1)
      if (gt < 0) i = -1
      else {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, last, i).append(' ')
        last = gt + 1
        i = s.indexOf('<', gt + 1)
      }
    }
    if (sb == null) s
    else { sb.append(s, last, s.length); sb.toString }
  }

  /** Rule 6: one sequential literal pass (search resumes after each
    * replacement, so `&amp;amp;` decodes to `&amp;` — double-escaped
    * text stays escaped, the chain's contract).
    */
  private def entityPass(s: String, target: String, repl: Char): String = {
    var i = s.indexOf(target)
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0) {
      sb.append(s, last, i).append(repl)
      last = i + target.length
      i = s.indexOf(target, last)
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Rules 7–9 fused. After rule 7 no two spaces are adjacent and no
    * \t/\r remain, so rules 7+8 together map every maximal run of
    * [ \t\r\n] to "\n" if it contains a newline else " " —
    * and \f are NOT in rule 7/8's classes and pass through, breaking
    * runs, but ARE \s and so trim at the ends (rule 9).
    */
  private def collapseWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
        var hasNl = c == '\n'
        var j = i + 1
        var run = true
        while (j < n && run) {
          val d = s.charAt(j)
          if (d == '\n') { hasNl = true; j += 1 }
          else if (d == ' ' || d == '\t' || d == '\r') j += 1
          else run = false
        }
        sb.append(if (hasNl) '\n' else ' ')
        i = j
      } else { sb.append(c); i += 1 }
    }
    var a = 0
    var b = sb.length
    def ws(ch: Char): Boolean = ch == ' ' || ch == '\t' || ch == '\n' ||
      ch == '\u000B' || ch == '\f' || ch == '\r'
    while (a < b && ws(sb.charAt(a))) a += 1
    while (b > a && ws(sb.charAt(b - 1))) b -= 1
    sb.substring(a, b)
  }

  /** html_text(html) → the extracted page text (see the contract
    * comment above; differential-spec'd ≡ TextOps.htmlTextRegex).
    */
  def htmlText(html: UTF8String): UTF8String = {
    var s = html.toString
    s = stripElement(s, "script")
    s = stripElement(s, "style")
    s = stripComments(s)
    s = replaceBlockTags(s)
    s = stripAllTags(s)
    s = entityPass(s, "&nbsp;", ' ')
    s = entityPass(s, "&lt;", '<')
    s = entityPass(s, "&gt;", '>')
    s = entityPass(s, "&quot;", '"')
    s = entityPass(s, "&#39;", '\'')
    s = entityPass(s, "&amp;", '&')
    UTF8String.fromString(collapseWs(s))
  }
}

/** model_stats(text) → array<bigint> — the five T15 feature integers
  * in one pass (see HashKernels.modelStats). One evaluation serves
  * all five element_at consumers via whole-stage subexpression
  * elimination (the TermCounts convention, pinned by
  * KernelEvalAuditSpec).
  */
case class ModelStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.modelStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.modelStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** model_score(text) → double — the T15 score as ONE kernel call
  * (see HashKernels.modelScore): Filter-safe where the Column tree
  * was not — FilterExec does no subexpression elimination, so the
  * tree form re-ran model_stats ~10× per row inside quality-gate
  * predicates. Bit-identical to the tree by the ModelStatsSpec
  * differential battery + the TextKernelPropSpec property.
  */
case class ModelScore(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    HashKernels.modelScore(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.modelScore($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** minhash_signature(shingles, k) → array<bigint> */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash64(tokens) → bigint */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** rolling_fingerprint(text, window) → bigint */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.rollingFingerprint(input.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.rollingFingerprint($c, $window)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** winnow_sketch(text, k, window) → array<bigint> (sorted distinct). */
case class WinnowSketch(child: Expression, k: Int, window: Int,
    minima: Int = 1)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.winnowMulti(input.asInstanceOf[UTF8String], k, window, minima)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.winnowMulti($c, $k, $window, $minima)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bpe_token_count(text) → int — codegen'd single-pass counter. */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HashKernels.bpeTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.bpeTokenCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ws_token_count(text) → int — codegen'd split-free token count. */
case class WsTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HashKernels.wsTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.wsTokenCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** punct_count(text) → int — codegen'd in-place punctuation count. */
case class PunctCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HashKernels.punctCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.punctCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** stopword_hits(text, lang) → int — codegen'd array-free counter. */
case class StopwordHits(child: Expression, lang: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    HashKernels.stopwordHits(input.asInstanceOf[UTF8String], lang)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference object, not a spliced string literal (same reasoning
    // as TermCounts: a quote/control char in lang must not yield
    // uncompilable generated code)
    val langRef = ctx.addReferenceObj("stopwordLang", lang, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.stopwordHits($c, $langRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** term_counts(text, spec) → array<int> — codegen'd one-pass per-term
  * token-match counts (spec = space-separated terms). One evaluation
  * serves every per-term consumer via whole-stage subexpression
  * elimination (pinned by KernelEvalAuditSpec).
  */
case class TermCounts(child: Expression, spec: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.termCounts(input.asInstanceOf[UTF8String], spec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the spec rides as a REFERENCE OBJECT, never spliced into the
    // generated Java as a quoted literal: a spec containing a quote,
    // backslash, or control char (term_counts(text, 'a\nb') from SQL)
    // would otherwise produce uncompilable source and silently fall
    // back to interpreted execution
    val specRef = ctx.addReferenceObj("termSpec", spec, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.termCounts($c, $specRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** lang_id(text) → string — codegen'd one-pass language ID. */
case class LangId(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashKernels.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.langId($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** shingle_keys(text, source, n) → array<bigint> — sorted distinct
  * FNV-1a keys of word n-gram shingles with the block key folded in
  * (the jaccardPairs posting generator; see HashKernels.shingleKeys).
  */
case class ShingleKeys(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, s: Any): Any =
    HashKernels.shingleKeys(t.asInstanceOf[UTF8String],
      s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.HashKernels.shingleKeys($t, $s, $n)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** minhash_keys(keys, k) → array<bigint> — MinHash over pre-hashed
  * shingle keys (see HashKernels.minhashFromKeys).
  */
case class MinHashKeys(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashFromKeys(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.minhashFromKeys($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** canonical_md5(text) → string — whitespace-canonical MD5 hex. */
case class CanonicalMd5(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashKernels.canonicalMd5(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.canonicalMd5($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash_text(text) → bigint — SimHash without the token array. */
case class SimHashText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhashText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhashText($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** top_token_count(text) → bigint — max whitespace-token frequency
  * in one pass (see HashKernels.topTokenCount).
  */
case class TopTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.topTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.topTokenCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sorted_intersect_count(a, b) → int — merge-count of two sorted
  * distinct long arrays.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedIntersectCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** One-pass Gopher rule statistics (codegen'd): eight integer counts
  * per document, each hash-checkable against its DuckDB mirror.
  */
case class GopherStats(child: Expression, stops: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(t: Any): Any =
    HashKernels.gopherStats(t.asInstanceOf[UTF8String], stops)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference object, never a spliced literal (the TermCounts rule)
    val stopsRef = ctx.addReferenceObj("gopherStops", stops,
      "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.gopherStats($c, $stopsRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass C4 cleaning statistics (codegen'd): eleven integer counts
  * per document, each hash-checkable against its DuckDB mirror (see
  * HashKernels.c4Stats).
  */
case class C4Stats(child: Expression, badwords: String, minWords: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(t: Any): Any =
    HashKernels.c4Stats(t.asInstanceOf[UTF8String], badwords, minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference object, never a spliced literal (the TermCounts rule)
    val badRef = ctx.addReferenceObj("c4Badwords", badwords,
      "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.c4Stats($c, $badRef, $minWords)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused page statistics (codegen'd): gopherStats' ten integers ++
  * c4Stats' eleven from one byte copy / line pass / token pass — the
  * T38 signals-table kernel (see HashKernels.pageStats).
  */
case class PageStats(child: Expression, stops: String,
    badwords: String, minWords: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(t: Any): Any =
    HashKernels.pageStats(t.asInstanceOf[UTF8String], stops, badwords,
      minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference objects, never spliced literals (the TermCounts rule)
    val stopsRef = ctx.addReferenceObj("gopherStops", stops,
      "java.lang.String")
    val badRef = ctx.addReferenceObj("c4Badwords", badwords,
      "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.pageStats($c, $stopsRef, $badRef, $minWords)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** deflate_size(text) → long — the DEFLATE (zlib level 6, raw)
  * compressed byte length of the UTF-8 text (see
  * HashKernels.deflateSize).
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    HashKernels.deflateSize(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.deflateSize($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass Gopher repetition statistics (codegen'd). */
case class GopherRepetition(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def nullSafeEval(t: Any): Any =
    HashKernels.gopherRepetition(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.gopherRepetition($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Positional signature agreement (codegen'd): the column-space
  * MinHash estimate kernel for the streaming incremental screen,
  * where a typed flatMap would strip the watermark.
  */
case class PositionalAgreeCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.positionalAgreeCount(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashKernels.positionalAgreeCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** html_text(html) → string — the T45 extraction kernel (see
  * HashKernels.htmlText): the historical regexp_replace chain's
  * semantics, one indexOf-driven scan per rule instead of ten
  * java.util.regex passes. Codegen'd; stays a pure projection.
  */
case class HtmlText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any): Any =
    HashKernels.htmlText(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.htmlText($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HashFunctions {
  def html_text(html: Column): Column =
    ColumnBridge.column(HtmlText(ColumnBridge.expression(html)))
  def shingle_keys(text: Column, source: Column, n: Int): Column =
    ColumnBridge.column(ShingleKeys(ColumnBridge.expression(text),
      ColumnBridge.expression(source), n))
  def minhash_keys(keys: Column, k: Int): Column =
    ColumnBridge.column(MinHashKeys(ColumnBridge.expression(keys), k))
  def simhash_text(text: Column): Column =
    ColumnBridge.column(SimHashText(ColumnBridge.expression(text)))
  def canonical_md5(text: Column): Column =
    ColumnBridge.column(CanonicalMd5(ColumnBridge.expression(text)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  def positional_agree_count(a: Column, b: Column): Column =
    ColumnBridge.column(PositionalAgreeCount(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  def gopher_stats(text: Column, stops: String): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text), stops))
  def gopher_repetition(text: Column): Column =
    ColumnBridge.column(GopherRepetition(ColumnBridge.expression(text)))
  def c4_stats(text: Column, badwords: String, minWords: Int): Column =
    ColumnBridge.column(
      C4Stats(ColumnBridge.expression(text), badwords, minWords))
  def page_stats(text: Column, stops: String, badwords: String,
      minWords: Int): Column =
    ColumnBridge.column(
      PageStats(ColumnBridge.expression(text), stops, badwords, minWords))
  def deflate_size(text: Column): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(text)))
  def minhash_signature(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), k))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def rolling_fingerprint(text: Column, window: Int): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(text), window))
  def winnow_sketch(text: Column, k: Int, window: Int,
      minima: Int = 1): Column =
    ColumnBridge.column(
      WinnowSketch(ColumnBridge.expression(text), k, window, minima))
  def bpe_token_count(text: Column): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text)))
  def ws_token_count(text: Column): Column =
    ColumnBridge.column(WsTokenCount(ColumnBridge.expression(text)))
  def punct_count(text: Column): Column =
    ColumnBridge.column(PunctCount(ColumnBridge.expression(text)))
  def stopword_hits(text: Column, lang: String): Column =
    ColumnBridge.column(StopwordHits(ColumnBridge.expression(text), lang))
  def term_counts(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(
      TermCounts(ColumnBridge.expression(text), terms.mkString(" ")))
  def lang_id(text: Column): Column =
    ColumnBridge.column(LangId(ColumnBridge.expression(text)))
  def top_token_count(text: Column): Column =
    ColumnBridge.column(TopTokenCount(ColumnBridge.expression(text)))
  def model_stats(text: Column): Column =
    ColumnBridge.column(ModelStats(ColumnBridge.expression(text)))

  def model_score(text: Column): Column =
    ColumnBridge.column(ModelScore(ColumnBridge.expression(text)))
}

package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HashKernels

/** Property tests pinning the single-pass text kernels to the regex
  * formulations they replaced (which are also what the DuckDB oracle
  * states) — any divergence is a parity bug before it reaches the
  * driver's compare.
  */
object TextKernelPropSpec extends Properties("TextKernels") {

  private val texty: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaLowerChar,
    2 -> Gen.numChar,
    2 -> Gen.const(' '),
    1 -> Gen.oneOf('\t', '\n', '\r', '\u000b', '\f'),
    2 -> Gen.oneOf("!?.,;:()[]{}#@$%^&*-_=+`~/\\|'\"<>".toSeq),
    1 -> Gen.alphaUpperChar,
    1 -> Gen.oneOf('é', 'ß', '中', '€'))).map(_.mkString)

  private def u(s: String) = UTF8String.fromString(s)

  property("ws_token_count == size(split(trim-spaces, \\s+))") =
    forAll(texty) { s =>
      val trimmed = {
        var lo = 0; var hi = s.length
        while (lo < hi && s.charAt(lo) == ' ') lo += 1
        while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
        s.substring(lo, hi)
      }
      // Spark's split(str, regex) is Java split with limit -1:
      // trailing empty elements are KEPT
      val ref = trimmed.split("\\s+", -1).length
      HashKernels.wsTokenCount(u(s)) == ref
    }

  // long repeated-vocab docs force the count-table rehash path
  private val vocabDoc: Gen[String] = for {
    n <- Gen.choose(0, 2000)
    toks <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.oneOf("the", "a", "of", "to", "x1", "?!", ""),
      3 -> Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString),
      1 -> Gen.oneOf("中文", "tök", "10.0.0.1")))
  } yield toks.mkString(" ")

  property("top_token_count == max frequency over split(trim-spaces, \\s+)") =
    forAll(Gen.oneOf(texty, vocabDoc)) { s =>
      val trimmed = {
        var lo = 0; var hi = s.length
        while (lo < hi && s.charAt(lo) == ' ') lo += 1
        while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
        s.substring(lo, hi)
      }
      val toks = trimmed.split("\\s+", -1)
      val ref = toks.groupBy(identity).values.map(_.size).max.toLong
      HashKernels.topTokenCount(u(s)) == ref
    }

  // adversarial PII soup: truncated/overlong/adjacent pattern
  // fragments concatenated WITHOUT separators so boundary (`\b`),
  // backtracking (`B+\.[a-z]{2,}`) and run-length (`\d{1,3}`) edges
  // all fire; multi-byte chars check byte-vs-char \b equivalence
  private val piity: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.oneOf("a@b.co", "u1@ex.com", "x@y", "@", "a@@b.cc",
      "a.b@c.d.ee", "a@b.c", "ab@cd.", ".cc", "a@-.-cc",
      "555-123-4567", "55-123-4567", "5555-123-4567", "555-123-45678",
      "10.0.0.1", "1.2.3.4567", "999.999.999.999", "1.2.3", "1..2",
      "..", "-", ".", "%", "+", "_", "<", ">", " ", "AB", "1", "12",
      "123", "1234"),
    3 -> Gen.listOf(Gen.frequency(
      5 -> Gen.alphaLowerChar, 3 -> Gen.numChar,
      2 -> Gen.oneOf('.', '-', '@', '_', '%', '+', ' '),
      1 -> Gen.oneOf('A', 'Z', '<', '>', 'é', '中'))).map(_.mkString)))
    .map(_.mkString(""))

  private val EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PHONE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  property("pii_counts == per-pattern regexp_count (java.util.regex)") =
    forAll(piity) { s =>
      import graft.functions.PiiKernels
      def cnt(p: String) = p.r.findAllIn(s).size
      val got = PiiKernels.piiCounts(u(s))
      got.getInt(0) == cnt(EMAIL) && got.getInt(1) == cnt(PHONE) &&
        got.getInt(2) == cnt(IP)
    }

  property("pii_scrub == chained replaceAll (java.util.regex)") =
    forAll(piity) { s =>
      import graft.functions.PiiKernels
      val ref = s.replaceAll(EMAIL, "<EMAIL>")
        .replaceAll(PHONE, "<PHONE>").replaceAll(IP, "<IP>")
      PiiKernels.piiScrub(u(s)).toString == ref
    }

  property("shingle_keys == distinct fnv of wordShingles(split(trim, \\s+))") =
    forAll(texty, Gen.oneOf("web", "books", "académie", "")) { (s, src) =>
      val trimmed = {
        var lo = 0; var hi = s.length
        while (lo < hi && s.charAt(lo) == ' ') lo += 1
        while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
        s.substring(lo, hi)
      }
      def fnvFrom(seed: Long, bytes: Array[Byte]): Long = {
        var h = seed; var i = 0
        while (i < bytes.length) {
          h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
        }
        h
      }
      val hSrc =
        fnvFrom(0xcbf29ce484222325L, src.getBytes("UTF-8")) * 0x100000001b3L
      val toks = trimmed.split("\\s+", -1)
      val ref =
        if (toks.length < 3) Seq.empty[Long]
        else (0 to toks.length - 3)
          .map(i => toks.slice(i, i + 3).mkString(" "))
          .distinct
          .map(sh => fnvFrom(hSrc, sh.getBytes("UTF-8")))
          .distinct.sorted
      val got = HashKernels.shingleKeys(u(s), u(src), 3).toLongArray().toSeq
      got == ref
    }

  property("simhash_text == simhash64 over split(trim, \\s+) tokens") =
    forAll(texty) { s =>
      val trimmed = {
        var lo = 0; var hi = s.length
        while (lo < hi && s.charAt(lo) == ' ') lo += 1
        while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
        s.substring(lo, hi)
      }
      val toks = trimmed.split("\\s+", -1)
      val ref = HashKernels.simhash(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(t => UTF8String.fromString(t)).toArray[Any]))
      HashKernels.simhashText(u(s)) == ref
    }

  property("canonical_md5 == md5(regexp_replace(trim(text), \\s+, ' '))") =
    forAll(texty) { s =>
      val trimmed = {
        var lo = 0; var hi = s.length
        while (lo < hi && s.charAt(lo) == ' ') lo += 1
        while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
        s.substring(lo, hi)
      }
      val canon = trimmed.replaceAll("\\s+", " ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val ref = md.digest(canon.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      HashKernels.canonicalMd5(u(s)).toString == ref
    }

  property("punct_count == length - length(regexp_replace punct)") =
    forAll(texty) { s =>
      val ref = s.length - s.replaceAll("[!-/:-@\\[-`{-~]", "").length
      HashKernels.punctCount(u(s)) == ref
    }

  // stopword-heavy generator so the stopword/langid properties hit
  // real matches, not just empty scores
  private val wordy: Gen[String] = Gen.listOf(Gen.frequency(
    3 -> Gen.oneOf("the", "a", "of", "and", "der", "die", "el", "la",
      "le", "les", "est", "un", "y", "foo", "bar", "xyzzy"),
    1 -> Gen.listOf(Gen.alphaLowerChar).map(_.mkString),
    1 -> Gen.const("\t"))).map(_.mkString(" "))

  private val langTables = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un"))

  private def refTokens(s: String): Array[String] = {
    var lo = 0; var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    s.substring(lo, hi).split("\\s+", -1)
  }

  property("stopword_hits == size(filter(tokens, in stopwords))") =
    forAll(wordy) { s =>
      val ref = refTokens(s).count(langTables("en").contains)
      HashKernels.stopwordHits(u(s), "en") == ref
    }

  property("lang_id == argmax of distinct stopword types (tie order en>de>es>fr)") =
    forAll(wordy) { s =>
      val toks = refTokens(s).toSet
      val scores = Seq("en", "de", "es", "fr")
        .map(l => l -> (toks intersect langTables(l).toSet).size)
      val best = scores.map(_._2).max
      val ref = if (best == 0) "und" else scores.find(_._2 == best).get._1
      HashKernels.langId(u(s)).toString == ref
    }

  private val bpePattern =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  property("bpe_token_count == len(regexp_extract_all runs pattern)") =
    forAll(texty) { s =>
      val m = bpePattern.matcher(s)
      var ref = 0
      while (m.find()) ref += 1
      HashKernels.bpeTokenCount(u(s)) == ref
    }

  // ---- T45 html kernel ≡ the nine-pass regex chain, in-JVM ----
  // the same pattern strings the Spark htmlTextRegex Column and the
  // DuckDB oracle state; markup-dense generator so tag/entity/ws
  // rules all fire constantly, plus raw fragments that seed
  // unterminated structures
  private val htmlish: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> texty.map(_.take(12)),
    2 -> Gen.oneOf("<p>", "</p>", "<div class='x'>", "</div>", "<br>",
      "<li>", "<ul>", "<td>", "<tr>", "<h1>", "<h3>", "</h1>", "<em>",
      "</em>", "<span a=b>", "<H2>", "<DIV>", "<blockquote>"),
    2 -> Gen.oneOf("<script>", "</script>", "<style>", "</style>",
      "<SCRIPT a='b'>", "</STYLE>", "<scripts>", "<!--", "-->",
      "<!-- c -->", "<script>var a=1<2;</script>"),
    2 -> Gen.oneOf("&nbsp;", "&lt;", "&gt;", "&quot;", "&#39;",
      "&amp;", "&amp;lt;", "&", ";", "&nb", "sp;"),
    1 -> Gen.oneOf("<", ">", "</", "<div", "class=\"un", "\n\n",
      " \t ", "\r\n", "", "\f"))).map(_.mkString)

  private def chainRef(s: String): String = {
    def rr(t: String, p: String, r: String): String =
      java.util.regex.Pattern.compile(p).matcher(t).replaceAll(
        java.util.regex.Matcher.quoteReplacement(r))
    var t = s
    t = rr(t, "(?is)<script[^>]*>.*?</script>", " ")
    t = rr(t, "(?is)<style[^>]*>.*?</style>", " ")
    t = rr(t, "(?s)<!--.*?-->", " ")
    t = rr(t,
      "(?i)</?(?:p|br|li|ul|ol|div|h[1-6]|tr|table|blockquote)\\b[^>]*>",
      "\n")
    t = rr(t, "<[^>]*>", " ")
    for ((e, r) <- Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"))
      t = t.replace(e, r)
    t = rr(t, "[ \\t\\r]+", " ")
    t = rr(t, " ?\\n[ \\n]*", "\n")
    rr(t, "^\\s+|\\s+$", "")
  }

  property("html_text kernel == nine-pass regex chain") =
    forAll(htmlish) { s =>
      HashKernels.htmlText(u(s)).toString == chainRef(s)
    }

  // the model_score kernel vs the LITERAL historical Column tree,
  // evaluated by Spark's own interpreted expression machinery (Least
  // NaN ordering, long→double casts, CaseWhen) — the T45 lesson: pin
  // the kernel against the real thing, not a mental model of it.
  // Bit-compare via doubleToLongBits so a NaN ≡ NaN and -0.0 ≠ 0.0.
  private lazy val treeEval: String => Double = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    import org.apache.spark.sql.catalyst.plans.logical.Project
    // resolve the Column tree ONCE through the analyzer (Spark 4
    // Columns are unresolved ColumnNodes until analysis), then bind
    // and eval interpreted per sample — Spark's own Least/Cast/
    // CaseWhen semantics, not a re-implementation of them. ANSI off
    // for the REFERENCE only: under ANSI the tree's punct division
    // throws on the empty string (the one zero-divisor input, which
    // no corpus row produces), where the kernel — like the DuckDB
    // oracle — uses IEEE semantics: NaN, clamped by Least to a
    // defined score
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    val analyzed = try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      Seq("seed").toDF("text")
        .select(graft.operators.TextOps.modelQualityScoreTree(
          org.apache.spark.sql.functions.col("text")).as("q"))
        .queryExecution.analyzed.asInstanceOf[Project]
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    val bound = BindReferences.bindReference(
      analyzed.projectList.head, analyzed.child.output)
    s => bound.eval(org.apache.spark.sql.catalyst.InternalRow(u(s)))
      .asInstanceOf[Double]
  }

  // token-ish docs: stopwords, repeats, punct runs, unicode, empties —
  // every branch of the score (length clamp, stop ratio, punct clamp,
  // top-token, bigram dup) plus the NaN edges (0 tokens, 0 chars)
  private val scoreDoc: Gen[String] = for {
    n <- Gen.choose(0, 600)
    toks <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.oneOf("the", "a", "of", "and", "to", "in"),
      4 -> Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString),
      2 -> Gen.oneOf("x", "!!", "...", "a,b", "", " ", "中文", "töké"),
      1 -> Gen.oneOf("(y)", "[z]", "#tag", "100%")))
  } yield toks.mkString(" ")

  property("model_score kernel == interpreted historical tree") =
    forAll(Gen.oneOf(texty, scoreDoc)) { s =>
      java.lang.Double.doubleToLongBits(HashKernels.modelScore(u(s))) ==
        java.lang.Double.doubleToLongBits(treeEval(s))
    }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Clusters, TextOps}

/** T11 repetition signals, T12 PII scrubbing and D9 dedup-apply
  * against exact in-driver recomputations (Java-regex / hash-map
  * references, independent of the Spark expression pipeline).
  */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("gopherStats kernel: hand-pinned counts on crafted documents") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val gopherList = TextOps.GopherStopList.mkString(" ")
    def stats(t: String): Seq[Long] =
      graft.functions.HashKernels.gopherStats(u8(t), gopherList)
        .toLongArray().toSeq
    // [n_words, word_chars, n_alpha_words, n_lines, n_distinct_lines,
    //  n_ellipsis_lines, n_symbols, stop_hits, line_chars,
    //  dup_line_chars]
    // tokenizer quirks mirror the DuckDB regexp_split contract
    assert(stats("  a bb\tccc ") == Seq(3, 6, 3, 1, 1, 0, 0, 0, 11, 0))
    assert(stats("") == Seq(1, 0, 0, 1, 1, 0, 0, 0, 0, 0))
    assert(stats("\t") == Seq(2, 0, 0, 1, 1, 0, 0, 0, 1, 0)) // ['','']
    // distinct stop-list presence, case-folded ('and' counts once)
    assert(stats("The and AND of") == Seq(4, 11, 4, 1, 1, 0, 0, 3, 14, 0))
    // lines: dup pair (BOTH copies weigh into dup_line_chars — the
    // paper's char form), one ellipsis line, trailing empty line
    assert(stats("dup\ndup\nuniq...  \n") ==
      Seq(4, 13, 3, 4, 3, 1, 1, 0, 15, 6))
    // symbols: two '#' plus ONE non-overlapping '....' occurrence
    assert(stats("#a#b....x") == Seq(1, 9, 1, 1, 1, 0, 3, 0, 9, 0))
    // word_chars counts code points, not bytes
    assert(stats("héllo") == Seq(1, 5, 1, 1, 1, 0, 0, 0, 5, 0))
  }

  test("c4Stats kernel: hand-pinned counts on crafted documents") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    def stats(t: String, bad: String = ""): Seq[Long] =
      graft.functions.HashKernels.c4Stats(u8(t), bad, 5)
        .toLongArray().toSeq
    // [n_lines, n_kept_lines, n_sentences, kept_chars, n_noterm,
    //  n_short, n_js, n_policy, has_lorem, has_brace, has_badword]
    // one kept line: 5 words, terminal '.', 1 sentence mark
    assert(stats("one two three four five.") ==
      Seq(1, 1, 1, 24, 0, 0, 0, 0, 0, 0, 0))
    // attribution order: noterm beats short ('hi' has no end mark)
    assert(stats("hi") == Seq(1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0))
    // short: terminal mark but < 5 words
    assert(stats("too short line.") == Seq(1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0))
    // ellipsis-ended lines are noterm even though they end in '.'
    assert(stats("one two three four five...") ==
      Seq(1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0))
    // trailing spaces are stripped before the end-mark test
    assert(stats("one two three four five.   ") ==
      Seq(1, 1, 1, 27, 0, 0, 0, 0, 0, 0, 0))
    // quote-terminated line is kept; the interior '.' is its sentence
    assert(stats("he said \"five words end here.\"") ==
      Seq(1, 1, 1, 30, 0, 0, 0, 0, 0, 0, 0))
    // javascript (case-insensitive substring) beats policy
    assert(stats("this JavaScript privacy policy line ends.") ==
      Seq(1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0))
    // policy substring drops the line
    assert(stats("we accept the privacy policy today.") ==
      Seq(1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0))
    // page flags fire on raw text even inside dropped lines
    assert(stats("Lorem Ipsum { x") == Seq(1, 0, 0, 0, 1, 0, 0, 0, 1, 1, 0))
    // badword matching is whole-token, ASCII-lowered
    assert(stats("BadWord one two three four.", "badword") ==
      Seq(1, 1, 1, 27, 0, 0, 0, 0, 0, 0, 1))
    assert(stats("badwords one two three four.", "badword") ==
      Seq(1, 1, 1, 28, 0, 0, 0, 0, 0, 0, 0)) // 'badwords' != 'badword'
    // multi-line with the string_split trailing-empty convention:
    // kept + short + trailing '' (noterm); two sentences in kept line
    assert(stats("a! b? c d e f.\nshort one.\n") ==
      Seq(3, 1, 3, 14, 1, 1, 0, 0, 0, 0, 0))
    // kept_chars counts code points, not bytes
    assert(stats("héllo wörld one two three.") ==
      Seq(1, 1, 1, 26, 0, 0, 0, 0, 0, 0, 0))
  }

  test("compressibility: deterministic, orders repetition below prose, gates") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    def z(t: String): Long = graft.functions.HashKernels.deflateSize(u8(t))
    val rep = "boiler " * 300
    val soup = (0 until 300).map(i => s"w${i * 2654435761L % 9973}")
      .mkString(" ")
    // deterministic within the JVM
    assert(z(rep) == z(rep) && z(soup) == z(soup))
    // repeated text compresses far below the varied soup
    assert(z(rep) * 5 < z(soup),
      s"rep=${z(rep)} soup=${z(soup)}")
    // the gate: repeated text drops at the lower bound, soup keeps
    import spark.implicits._
    val docs = Seq((1L, soup), (2L, rep)).toDF("doc_id", "text")
    val got = TextOps.compressionStatsDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == Map(1L -> 1, 2L -> 0))
    // registered query: the planted docs (and only substantial ones)
    // trip the gate at sf
    val q = TextOps.compressionRatioQuery(spark, sf).collect()
    val dropped = q.filter(_.getInt(3) == 0).map(_.getLong(0))
    assert(dropped.nonEmpty && dropped.forall(_ % 13 == 7))
    assert(q.count(_.getInt(3) == 1) > 0)
  }

  test("c4 badword lookup: case-insensitive both sides, crowded buckets exact") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    def hasBad(t: String, list: String): Long =
      graft.functions.HashKernels.c4Stats(u8(t), list, 5)
        .toLongArray()(10)
    // the LIST side lowers too: a capitalized entry still matches
    assert(hasBad("some badword here", "BadWord") == 1L)
    assert(hasBad("some BADWORD here", "badword") == 1L)
    // crowded same-length bucket: binary search stays exact around
    // lexicographic neighbors
    val bucket = (0 until 50).map(i => f"bad$i%02dxx").mkString(" ")
    assert(hasBad("x bad27xx y", bucket) == 1L)
    assert(hasBad("x bad99xx y", bucket) == 0L) // absent neighbor
    assert(hasBad("x bad27x y", bucket) == 0L)  // shorter token
    assert(hasBad("x bad27xxz y", bucket) == 0L) // longer token
    // whole-token only: substring containment must not fire
    assert(hasBad("xbad27xxy", bucket) == 0L)
  }

  test("pageStats fused kernel == gopherStats ++ c4Stats, bit-for-bit") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val stops = TextOps.GopherStopList.mkString(" ")
    val bad = "badword evil"
    def fused(t: String): Seq[Long] =
      graft.functions.HashKernels.pageStats(u8(t), stops, bad, 5)
        .toLongArray().toSeq
    def ref(t: String): Seq[Long] =
      graft.functions.HashKernels.gopherStats(u8(t), stops)
        .toLongArray().toSeq ++
        graft.functions.HashKernels.c4Stats(u8(t), bad, 5)
          .toLongArray().toSeq
    // edges: empty, ws-only, split artifacts, multibyte, page flags,
    // dup/ellipsis lines, badword casing, trailing newline
    val edges = Seq("", " ", "\t", "  a bb\tccc ", "héllo wörld.",
      "dup\ndup\nuniq...  \n", "#a#b....x { y", "Lorem Ipsum here",
      "one two three four five.\nshort.\nBADWORD x y z w.",
      "a! b? c d e f.\nshort one.\n", "evil one two three four.",
      "we accept the privacy policy today.\nJavaScript rules here ok.")
    edges.foreach(t => assert(fused(t) == ref(t), s"edge: ${t.take(40)}"))
    // randomized sweep over a mixed alphabet incl. newlines/flags
    val rnd = new scala.util.Random(20260815L)
    val pieces = Seq("the", "a", "word", "badword", "W" * 11, "héllo",
      "...", "#", "{", "five.", "x?", "\n", " ", "  ", "\t",
      "lorem", "ipsum", "javascript", "privacy", "policy", "\"")
    for (it <- 1 to 200) {
      val t = Seq.fill(1 + rnd.nextInt(60))(
        pieces(rnd.nextInt(pieces.length))).mkString(" ")
      assert(fused(t) == ref(t), s"iter $it: ${t.take(80)}")
    }
    // the real corpus at sf, through the Spark expression path
    import graft.functions.HashFunctions.{page_stats, gopher_stats, c4_stats}
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        page_stats(col("text"), stops, bad, 5).as("f"),
        concat(gopher_stats(col("text"), stops),
          c4_stats(col("text"), bad, 5)).as("r"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)} fused != standalone concat")
    }
  }

  test("qualityC4Docs: keep decision over planted page-rule fixtures") {
    import spark.implicits._
    val docs = Seq(
      // 3 sentences, no flags -> keep
      (1L, "one two three four five.\nsix seven eight nine ten!\na b c d e?"),
      // only 2 sentences -> drop
      (2L, "one two three four five.\nsix seven eight nine ten!"),
      // lorem ipsum anywhere -> drop
      (3L, "one two three four five.\nsix seven eight nine ten!\na b c d e?\nlorem ipsum x"),
      // curly brace -> drop
      (4L, "one { two three four five.\nsix seven eight nine ten!\na b c d e?"),
      // badword token -> drop
      (5L, "evil one two three four.\nsix seven eight nine ten!\na b c d e?")
    ).toDF("doc_id", "text")
    val got = TextOps.qualityC4Docs(docs, badWords = Seq("evil"))
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 1), (2L, 0), (3L, 0), (4L, 0), (5L, 0)))
  }

  test("c4Apply rebuilds kept lines and drops failing pages") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five.\nshort x.\nsix seven eight nine ten!\na b c d e?"),
      (2L, "one two three four five.\nsix seven eight nine ten!"), // 2 sentences
      (3L, "one { two three four five.\nsix seven eight nine ten!\na b c d e?")
    ).toDF("doc_id", "text")
    val got = TextOps.c4Apply(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L,
      "one two three four five.\nsix seven eight nine ten!\na b c d e?",
      3L)), s"got $got")
    // the apply face and the stats face must agree on the keep set
    val fixture = TextOps.c4PlantedDocs(spark, sf)
    val applyIds = TextOps.c4Apply(fixture, badWords = Seq("badword"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepIds = TextOps.qualityC4Docs(fixture, badWords = Seq("badword"))
      .filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(applyIds == keepIds && applyIds.nonEmpty)
  }

  test("qualitySignals columns equal the standalone gates on one fixture") {
    val fixture = TextOps.c4PlantedDocs(spark, sf)
    def m(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col("doc_id"), col(c)).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sig = TextOps.qualitySignals(fixture,
      stopWords = Seq("the", "a"), badWords = Seq("badword"))
    assert(m(sig, "keep_gopher") ==
      m(TextOps.qualityGopherDocs(fixture, Seq("the", "a")), "keep"))
    assert(m(sig, "keep_rep") ==
      m(TextOps.gopherRepetitionDocs(fixture), "keep_rep"))
    assert(m(sig, "keep_c4") ==
      m(TextOps.qualityC4Docs(fixture, Seq("badword")), "keep"))
    assert(m(sig, "keep_compress") ==
      m(TextOps.compressionStatsDocs(fixture), "keep_compress"))
    // keep_model == the T15 decision; q_score equals bit-for-bit
    val score = fixture
      .select(col("doc_id"),
        TextOps.modelQualityScore(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sig.select("doc_id", "q_score", "keep_model", "keep_all",
        "keep_gopher", "keep_rep", "keep_c4", "keep_compress")
      .collect().foreach { r =>
        assert(r.getDouble(1) == score(r.getLong(0)))
        assert(r.getInt(2) == (if (r.getDouble(1) >= 0.5) 1 else 0))
        assert(r.getInt(3) == (if ((4 to 7).forall(r.getInt(_) == 1) &&
          r.getInt(2) == 1) 1 else 0))
      }
    // every gate decides both ways somewhere on the fixture
    for (c <- Seq("keep_gopher", "keep_c4"))
      assert(m(sig, c).values.toSet == Set(0, 1), s"$c degenerate")
  }

  test("quality_signals_core == the signals projection; keep_core non-degenerate") {
    val sig = TextOps.qualitySignalsQuery(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("q_score"), r.getAs[Long]("n_bytes"),
          r.getAs[Int]("keep_gopher"), r.getAs[Int]("keep_rep"),
          r.getAs[Int]("keep_c4"), r.getAs[Int]("keep_model"))).toMap
    val core = TextOps.qualitySignalsCoreQuery(spark, sf).collect()
    assert(core.length == sig.size)
    core.foreach { r =>
      val (qs, nb, kg, kr, kc, km) = sig(r.getAs[Long]("doc_id"))
      assert(r.getAs[Double]("q_score") == qs)
      assert(r.getAs[Long]("n_bytes") == nb)
      assert((r.getAs[Int]("keep_gopher"), r.getAs[Int]("keep_rep"),
        r.getAs[Int]("keep_c4"), r.getAs[Int]("keep_model")) ==
        ((kg, kr, kc, km)))
      assert(r.getAs[Int]("keep_core") ==
        (if (kg == 1 && kr == 1 && kc == 1 && km == 1) 1 else 0))
    }
    assert(core.map(_.getAs[Int]("keep_core")).toSet == Set(0, 1))
  }

  test("signalsAblation cells partition the corpus; sweep curve is monotone") {
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val cells = TextOps.signalsAblationQuery(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)),
        (r.getLong(4), r.getLong(5))))
    // every doc lands in exactly one combination cell
    assert(cells.map(_._2._1).sum == nDocs)
    assert(cells.map(_._1).distinct.length == cells.length)
    assert(cells.length > 1, "one-cell ablation — all gates agree?")
    // the ablation agrees with the core signals row-for-row
    val core = TextOps.qualitySignalsCoreQuery(spark, sf).collect()
      .map(r => (r.getAs[Int]("keep_gopher"), r.getAs[Int]("keep_rep"),
        r.getAs[Int]("keep_c4"), r.getAs[Int]("keep_model")))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(cells.map(c => c._1 -> c._2._1).toMap == core)
    // threshold sweep: kept counts/bytes never increase with the
    // threshold; 0% keeps everything with a non-negative score
    val sweep = TextOps.modelThresholdSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(sweep.map(_._1).toSeq == (0 to 100 by 5).toSeq)
    sweep.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"non-monotone: $a -> $b")
    }
    assert(sweep.head._2 == nDocs, "0% threshold must keep every doc")
    assert(sweep.last._2 < nDocs, "100% threshold keeps everything?")
    // the sweep's 50% point == the registered classifier's keep count
    val kept50 = TextOps.qualityClassify(spark, sf).collect()
      .count(_.getBoolean(2)).toLong
    assert(sweep.find(_._1 == 50).get._2 == kept50)
  }

  test("quality_c4 registered query is non-degenerate at sf") {
    val df = graft.operators.TextOps.qualityC4Query(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val keeps = rows.map(_.getAs[Int]("keep")).toSet
    assert(keeps == Set(0, 1), "both keep outcomes must occur")
    // every drop-attribution column fires somewhere in the fixture
    for (c <- Seq("n_noterm_lines", "n_short_lines", "n_js_lines",
        "n_policy_lines", "has_lorem", "has_brace", "has_badword"))
      assert(rows.map(_.getAs[Long](c)).sum > 0, s"$c is vacuous")
  }

  test("gopherRepetition kernel: hand-pinned masses on crafted documents") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    def rep(t: String): Seq[Long] =
      graft.functions.HashKernels.gopherRepetition(u8(t))
        .toLongArray().toSeq
    // [word_chars, top2, top3, top4, dup5..dup10]
    // 'a b' x3 (2 chars) = 6; 'a b a' x2 (3 chars) = 6;
    // 'a b a b' x2 (4 chars) = 8; no 5-gram repeats
    assert(rep("a b a b a b") ==
      Seq(6, 6, 6, 8, 0, 0, 0, 0, 0, 0))
    // repeated 5-gram covers its tokens once each; 'q' uncovered
    assert(rep("x1 x2 x3 x4 x5 q x1 x2 x3 x4 x5").take(5) ==
      Seq(21, 8, 12, 16, 20))
    // overlapping occurrences of the same 5-gram count positions ONCE
    val allR = rep("r r r r r r")
    assert(allR(0) == 6 && allR(4) == 6,
      s"overlap must not double-count: $allR")
    // short doc: no grams of any size
    assert(rep("solo") == Seq(4, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("gopherRepetition pair-interned kernel == brute-force reference on random docs") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    // brute force straight off the token list (gram identity = the
    // token subsequence; boolean coverage array) — the docs are
    // single-space joins of nonempty tokens, so tokenization is
    // trivially the list itself (the split-artifact edges have their
    // own hand-pinned test above)
    def ref(toks: IndexedSeq[String]): Seq[Long] = {
      val lens = toks.map(t => t.codePointCount(0, t.length).toLong)
      val out = Array.fill(10)(0L)
      out(0) = lens.sum
      for (n <- 2 to 10; if toks.length >= n) {
        val grams = toks.sliding(n).map(_.toList).toVector
        val counts = grams.groupBy(identity).map {
          case (g, o) => g -> o.size
        }
        if (n <= 4)
          out(n - 1) = grams.zipWithIndex.map { case (g, i) =>
            counts(g).toLong * lens.slice(i, i + n).sum
          }.max
        else {
          val covered = Array.fill(toks.length)(false)
          for (i <- grams.indices; if counts(grams(i)) >= 2;
              p <- i until i + n) covered(p) = true
          out(n - 1) = covered.zipWithIndex.collect {
            case (true, p) => lens(p)
          }.sum
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(20260814L)
    val alphabets = Seq(
      Seq("a", "bb", "ccc"), // tiny alphabet → dense repeats
      Seq("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8"),
      (1 to 40).map(i => s"tok$i")) // sparse → mostly unique grams
    for (it <- 1 to 150) {
      val ab = alphabets(it % alphabets.length)
      val len = 1 + rnd.nextInt(40)
      val toks = IndexedSeq.fill(len)(ab(rnd.nextInt(ab.length)))
      val got = graft.functions.HashKernels
        .gopherRepetition(u8(toks.mkString(" "))).toLongArray().toSeq
      assert(got == ref(toks), s"iter $it toks=$toks")
    }
  }

  test("gopherRepetition keep_rep on planted clean vs template documents") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"w$i").mkString(" ")
    val loopy = ("spam ham " * 30).trim // top2 mass >> 20% of chars
    val df = Seq((1L, clean), (2L, loopy)).toDF("doc_id", "text")
    val got = TextOps.gopherRepetitionDocs(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep_rep")).toMap
    assert(got == Map(1L -> 1, 2L -> 0), s"$got")
  }

  test("qualityGopher keep decision on planted pass/fail documents") {
    import spark.implicits._
    val pass = "the and " + Array.fill(58)("word").mkString(" ")
    val tooShort = "the and word"
    val noStops = Array.fill(60)("word").mkString(" ")
    val longWords = "the and " +
      Array.fill(58)("w" * 11).mkString(" ") // mean word len > 10
    val dupLines = ("the and " + Array.fill(28)("word").mkString(" ") +
      "\n") * 10 // 10 identical lines: dup fraction 9/10 > 0.3
    val df = Seq((1L, pass), (2L, tooShort), (3L, noStops),
      (4L, longWords), (5L, dupLines)).toDF("doc_id", "text")
    val got = TextOps.qualityGopherDocs(df).collect()  // Gopher default list
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0), s"$got")
  }

  test("qualityGopher at sf: every count consistent, keeps mixed") {
    // the registered corpus-fitting stop list (the sf vocabulary has
    // only 'the' of Gopher's 8 English words — the default list is
    // exercised by the planted-document tests above)
    val rows = TextOps
      .qualityGopher(spark, sf, stopWords = Seq("the", "a")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_lines") <= r.getAs[Long]("n_lines"))
      assert(r.getAs[Long]("n_alpha_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("stop_hits") <= 8)
    }
    val keeps = rows.map(_.getAs[Int]("keep")).toSet
    assert(keeps == Set(0, 1), s"keep decision degenerate: $keeps")
  }

  test("textRepetition matches an exact in-driver computation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val tk = t.trim.split("\\s+").toSeq
      val n = tk.length
      val top = tk.groupBy(identity).values.map(_.size).max
      val g2 = tk.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      val dup =
        if (n <= 1) 0.0
        else (g2.length - g2.distinct.length).toDouble / (n - 1)
      (id, (n.toLong, top.toDouble / n, dup))
    }.toMap
    val got = TextOps.textRepetition(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expected)
    // the corpus genuinely exercises the signal: some doc repeats
    assert(got.values.exists(_._2 > 0.05), "no repetition in corpus?")
  }

  test("htmlTextOf extracts hand-pinned pages byte-identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script/style/comment content drops; block tags break lines
      ("<html><head><style>a{x}</style></head><body>" +
        "<h1>Title</h1><p>one two</p><script>var a = 1 < 2;</script>" +
        "<p>three</p></body></html>",
        "Title\none two\nthree"),
      // entities decode, &amp; last (double-escaped stays escaped)
      ("<p>a &lt;tag&gt; &quot;q&#39; &amp;amp; b&nbsp;c</p>",
        "a <tag> \"q' &amp; b c"),
      // unclosed attribute quote: the tag eats through the next '>'
      ("<p>keep</p><div class=\"oops</body></html>", "keep"),
      // whitespace collapse: runs of blanks/newlines fold
      ("<p>a   b</p>\n\n\n<p>c\t d</p>", "a b\nc d"),
      // no markup at all passes through trimmed
      ("  plain text  ", "plain text"))
    val got = cases.map(_._1).toDF("html")
      .select(graft.operators.TextOps.htmlTextOf(col("html")))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2),
      got.zip(cases).filter { case (g, (_, e)) => g != e }.toString)
  }

  test("htmlExtract matches a Java-regex in-driver reference on the " +
      "planted pages, every fixture rule firing") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def extract(html: String): String = html
      .replaceAll("(?is)<script[^>]*>.*?</script>", " ")
      .replaceAll("(?is)<style[^>]*>.*?</style>", " ")
      .replaceAll("(?s)<!--.*?-->", " ")
      .replaceAll(
        "(?i)</?(?:p|br|li|ul|ol|div|h[1-6]|tr|table|blockquote)\\b[^>]*>",
        "\n")
      .replaceAll("<[^>]*>", " ")
      .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
      .replaceAll("[ \t\r]+", " ")
      .replaceAll(" ?\n[ \n]*", "\n")
      .replaceAll("^\\s+|\\s+$", "")
    val expected = docs.map { case (id, t) =>
      val html = s"<html><!-- gen -->\n<head><title>Doc $id" +
        "</title><style media=\"all\">body { color: #000; }</style>" +
        s"</head><body><h1>Doc $id</h1>" +
        (if (id % 3 == 0)
          "<script type=\"text/javascript\">var x = 1 < 2 && y > 0;</script>"
        else "") +
        (if (id % 2 == 0) "<ul><li>alpha</li><li>beta</li></ul>" else "") +
        s"<p>$t" +
        (if (id % 5 == 0)
          " Fish &amp; Chips &lt;b&gt;bold&#39;s&quot; end&nbsp;here"
        else "") +
        "</p>" +
        (if (id % 7 == 3) "<div class=\"unterminated" else "") +
        "</body></html>"
      val x = extract(html)
      (id, (x, x.count(_ == '\n').toLong + 1L))
    }.toMap
    val got = graft.operators.TextOps.htmlExtract(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(got == expected)
    // non-vacuity: the fixture rules all fire on real rows
    val byId = got.map { case (id, (x, _)) => id -> x }
    assert(byId.exists { case (id, x) =>
      id % 5 == 0 && x.contains("Fish & Chips <b>bold's\" end here") },
      "entity rows missing")
    assert(byId.forall { case (_, x) => !x.contains("var x = 1") },
      "script content leaked")
    assert(byId.forall { case (_, x) => !x.contains("color: #000") },
      "style content leaked")
    assert(byId.exists { case (id, x) =>
      id % 2 == 0 && x.contains("alpha\nbeta") }, "list rows missing")
    assert(byId.forall { case (_, x) => !x.contains("unterminated") },
      "malformed tag leaked")
  }

  test("tokenFertility sums partition the corpus and ratios are the exact divisions") {
    val rows = graft.operators.TextOps.tokenFertility(spark, sf)
      .collect()
    val langs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang").collect().map(_.getString(0))
    // one row per language, docs partition the corpus exactly
    assert(rows.map(_.getString(0)).toSet == langs.toSet)
    assert(rows.map(_.getLong(1)).sum == langs.length.toLong)
    rows.foreach { r =>
      val (nb, nbpe, nch, nt) = (r.getLong(4), r.getLong(3),
        r.getLong(5), r.getLong(2))
      // the ratio columns are EXACTLY one IEEE division over the
      // integer sums (the oracle's statement) — not re-aggregated
      assert(r.getDouble(6) == nb.toDouble / nbpe.toDouble)
      assert(r.getDouble(7) == nch.toDouble / nt.toDouble)
      assert(nt > 0 && nbpe > 0 && nb >= nch,
        "degenerate language row")
    }
    // the per-language masses genuinely differ (skewed lang mix)
    assert(rows.map(_.getLong(2)).distinct.length > 1)
  }

  test("piiScrub redacts planted PII byte-identically to a Java-regex reference") {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val planted = t +
        (if (id % 3 == 0) s" mail u$id@ex.com" else "") +
        (if (id % 4 == 0) " ip 10.0.0.1" else "") +
        (if (id % 5 == 0) " tel 555-123-4567" else "")
      val scrubbed = planted
        .replaceAll(email, "<EMAIL>")
        .replaceAll(phone, "<PHONE>")
        .replaceAll(ip, "<IP>")
      (id, (email.r.findAllIn(planted).size,
        phone.r.findAllIn(planted).size,
        ip.r.findAllIn(planted).size,
        md5hex(scrubbed)))
    }.toMap
    val got = TextOps.piiScrub(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got == expected)
    // planting actually fires each category
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._2 > 0) &&
      got.values.exists(_._3 > 0))
  }

  test("qualityClassify matches the exact linear-model reference, both classes present") {
    val en = Set("the", "a", "of", "and", "to", "in", "is")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val trimmed = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = trimmed.split("\\s+", -1)
      val n = toks.length
      val sw = toks.count(en)
      val pc = t.length - t.replaceAll("[!-/:-@\\[-`{-~]", "").length
      val nChars = t.codePointCount(0, t.length)
      val topC = toks.groupBy(identity).values.map(_.size).max
      val d2 = toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq.distinct.length
      val dupFrac =
        if (n <= 1) 0.0 else (n - 1 - d2).toDouble / (n - 1)
      val score =
        math.min(n.toDouble, 400.0) / 400.0 * 0.35 +
          math.min(sw.toDouble / n.toDouble * 4.0, 1.0) * 0.25 +
          (1.0 - math.min(pc.toDouble / nChars.toDouble * 5.0, 1.0)) * 0.15 +
          (1.0 - topC.toDouble / n.toDouble) * 0.15 +
          (1.0 - dupFrac) * 0.10
      (id, (score, score >= 0.5))
    }.toMap
    val got = TextOps.qualityClassify(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got == expected)
    val keeps = got.values.count(_._2)
    assert(keeps > 0 && keeps < got.size,
      s"one-sided classifier ($keeps/${got.size} kept) — vacuous filter")
  }

  test("dedupApply keeps exactly the unclustered docs plus each cluster's representative") {
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clusters = Clusters.nearDupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val losers = clusters.collect {
      case (doc, cl) if doc != cl => doc
    }.toSet
    assert(losers.nonEmpty, "corpus has no near-dup to drop?")
    val got = Clusters.dedupApply(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == all -- losers)
    // the removal join is id-only and broadcastable — the text column
    // must not ride through the anti-join's shuffle side
    val plan = Clusters.dedupApply(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti-join:\n$plan")
  }

  test("dedupApplyBest keeps each cluster's argmax-quality member (ties to min id)") {
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clusters = Clusters.nearDupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty, "no clusters — vacuous test")
    val scores = TextOps.qualityClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val keepers = clusters.groupBy(_._2).values.map { members =>
      members.map(_._1).minBy(id => (-scores(id), id))
    }.toSet
    val losers = clusters.map(_._1).toSet -- keepers
    val got = Clusters.dedupApplyBest(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == all -- losers)
    // non-vacuous refinement: at least one keeper must differ from
    // the min-id rule, or this test degenerates into dedupApply's
    val minIdKeepers = clusters.groupBy(_._2).values
      .map(_.map(_._1).min).toSet
    assert(keepers != minIdKeepers,
      "argmax-quality picked exactly the min ids — widen the fixture")
    val plan = Clusters.dedupApplyBest(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti-join:\n$plan")
    assert(!plan.contains("Window"), s"keeper argmax must be an agg:\n$plan")
  }

  test("screenApply keeps exactly the corpus minus the flagged doc side") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = Dedup.screenDocs(docs).collect()
      .map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "corpus screens nothing — vacuous test")
    val kept = Dedup.screenApply(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(kept == all -- flagged)
    // reference members themselves survive unless they match ANOTHER ref
    val refsKept = (all -- flagged).filter(_ % 7 == 0)
    assert(refsKept.subsetOf(kept))
    val plan = Dedup.screenApply(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti-join:\n$plan")
  }

  test("corpusStats equals per-doc kernel outputs aggregated in the driver") {
    import scala.math.BigDecimal.RoundingMode
    val toks = TextOps.textTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val qual = TextOps.textQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val lang = TextOps.textLangId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val fp = TextOps.textFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val ids = ds.map(_._1)
      val qsum = ids.map(i => BigDecimal(
          java.math.BigDecimal.valueOf(qual(i)))
        .setScale(4, RoundingMode.HALF_UP)).sum
        .setScale(2, RoundingMode.HALF_UP)
      (src, (ids.length.toLong,
        ids.map(toks).sum,
        ds.map(_._3.length.toLong).sum,
        ids.map(fp).distinct.length.toLong,
        qsum.toDouble / ids.length,
        ids.count(i => lang(i) == "en").toLong))
    }
    val got = graft.operators.CorpusOps.corpusStats(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(got == expected)
    assert(got.size > 1, "single-source corpus — vacuous grouping")
  }

  test("dedupApplyFromPairs/FromClusters == standalone dedupApply, set-exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val standalone = Clusters.dedupApply(spark, sf).collect()
      .map(_.getLong(0)).toSet
    // the shared-derivation chain: one pair materialization feeds
    // both the cluster resolution and the corpus filter
    val pairs = graft.operators.Dedup.jaccardPairs(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))
      .localCheckpoint(true)
    val fromPairs = Clusters.dedupApplyFromPairs(docs, pairs).collect()
      .map(_.getLong(0)).toSet
    val fromClusters = Clusters.dedupApplyFromClusters(docs,
      Clusters.clusterPairs(pairs)).collect().map(_.getLong(0)).toSet
    assert(fromPairs == standalone)
    assert(fromClusters == standalone)
  }
}

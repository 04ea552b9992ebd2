package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents` (SURVEY §2.5) plus the
  * reference's WordCount pipeline (§2.1 C9) as batch queries.
  */
object TextOps {

  /** T1 — token counting: whitespace tokens + BPE-ish pre-tokenizer
    * runs. Pure projection → trivially parallel, scan-bound at scale.
    */
  def textTokens(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** T2 — quality scoring: length band + stopword ratio + punctuation
    * sanity. Tokenizes once per row (toks column reused by every
    * derived metric).
    */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        stopwordHits(col("text"), "en").as("sw_hits"),
        punctCount(col("text")).as("punct_cnt"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** T30 — the GOPHER document-level quality rules (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1) as ONE hash-checked projection: the
    * published filter suite a production crawl actually runs — word
    * count in [50, 100k], mean word length in [3, 10], symbol-to-word
    * ratio ('#' + '…') ≤ 0.1, ellipsis-ended lines ≤ 30%, words with
    * an alphabetic character ≥ 80%, ≥ 2 of the 8-word stop list,
    * duplicate-line fraction ≤ 30%.
    *
    * Every statistic is an exact integer from the one-pass
    * `gopher_stats` kernel, and every threshold is applied by INTEGER
    * CROSS-MULTIPLICATION (`3·n_words ≤ word_chars`, never a float
    * ratio), so the keep decision is bit-reproducible and the whole
    * row hash-checks against the DuckDB mirror. The kernel array is
    * materialized as an attribute before the eight element_at
    * consumers (the TextFunctions attribute rule). Scale shape: pure
    * scan-bound projection, no shuffle but the output sort.
    */
  /** Gopher's published English stop list (§A1.1). */
  val GopherStopList: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def qualityGopher(spark: SparkSession, sfDir: String,
      stopWords: Seq[String] = GopherStopList): DataFrame =
    qualityGopherDocs(documents(spark, sfDir), stopWords)

  /** [[qualityGopher]] over any (doc_id, text) frame. `stopWords`
    * defaults to Gopher's English list; a deployment on another
    * language (or the synthetic sf vocabulary — see TextRegistry)
    * swaps the list, the thresholds stay.
    */
  def qualityGopherDocs(docs: DataFrame,
      stopWords: Seq[String] = GopherStopList): DataFrame =
    qualityGopherDocsOf(docs, stopWords).orderBy(col("doc_id"))

  /** The gopher projection without the batch face's output sort —
    * for composition (P3 fences this frame; fencing the sorted face
    * would execute the sort Catalyst otherwise prunes under a join).
    */
  private[graft] def qualityGopherDocsOf(docs: DataFrame,
      stopWords: Seq[String] = GopherStopList): DataFrame = {
    import graft.functions.HashFunctions.gopher_stats
    require(stopWords.nonEmpty && stopWords.size <= 64,
      s"stop list must have 1..64 words: ${stopWords.size}")
    val g = (i: Int) => element_at(col("gs"), i)
    docs
      .select(col("doc_id"),
        gopher_stats(col("text"), stopWords.mkString(" ")).as("gs"))
      .select(col("doc_id"),
        g(1).as("n_words"), g(2).as("word_chars"),
        g(3).as("n_alpha_words"), g(4).as("n_lines"),
        g(5).as("n_distinct_lines"), g(6).as("n_ellipsis_lines"),
        g(7).as("n_symbols"), g(8).as("stop_hits"),
        g(9).as("line_chars"), g(10).as("dup_line_chars"))
      .withColumn("keep", gopherKeepOf(col(_)).cast("int"))
  }

  /** The Gopher document-rule keep decision over named stat columns
    * — ONE definition shared by [[qualityGopherDocs]] and the
    * one-scan [[qualitySignals]] table.
    */
  private[graft] def gopherKeepOf(c: String => Column): Column =
    c("n_words") >= 50 && c("n_words") <= 100000 &&
      c("n_words") * 3 <= c("word_chars") &&
      c("word_chars") <= c("n_words") * 10 &&
      c("n_symbols") * 10 <= c("n_words") &&
      c("n_ellipsis_lines") * 10 <= c("n_lines") * 3 &&
      c("n_alpha_words") * 5 >= c("n_words") * 4 &&
      c("stop_hits") >= 2 &&
      (c("n_lines") - c("n_distinct_lines")) * 10 <=
        c("n_lines") * 3 &&
      // the paper's char-weighted form: dup-line chars <= 20%
      c("dup_line_chars") * 5 <= c("line_chars")

  /** T33 — the C4 cleaning rule suite (Raffel et al. 2020,
    * arXiv:1910.10683 §2.2, with the constants of the released TFDS
    * implementation: ≥ 5 words per retained line, ≥ 3 sentences per
    * retained page): line-level — keep only lines ending in a
    * terminal punctuation mark ('.', '?', '!', '"') and not in
    * "...", with ≥ 5 words, without "javascript", without a policy
    * substring ("terms of use", "privacy policy", "cookie policy",
    * "uses cookies", "use of cookies", "use cookies"); page-level —
    * drop pages containing "lorem ipsum", a curly brace, or any
    * badword token, and pages whose kept lines carry < 3 sentence
    * marks. Sentences are counted as '.', '!', '?' occurrences in
    * kept lines (the SQL-stateable stand-in for the reference's
    * sentence tokenizer — documented deviation).
    *
    * Every statistic is an exact integer from the one-pass `c4_stats`
    * kernel and every decision an integer comparison, so the whole
    * row INCLUDING the keep bit hash-checks against the DuckDB
    * mirror. Scale shape: pure scan-bound projection, no shuffle but
    * the output sort (the T30 recipe).
    *
    * `badWords` parameterizes the paper's blocklist page rule (the
    * published list is a 1,600-entry external artifact — deployments
    * supply their own; empty disables the rule). `minLineWords` /
    * `minSentences` default to the TFDS constants.
    */
  def qualityC4(spark: SparkSession, sfDir: String,
      badWords: Seq[String] = Nil): DataFrame =
    qualityC4Docs(documents(spark, sfDir), badWords)

  def qualityC4Docs(docs: DataFrame, badWords: Seq[String] = Nil,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    import graft.functions.HashFunctions.c4_stats
    require(badWords.forall(w => w.nonEmpty && !w.exists(_.isWhitespace)),
      "badwords must be non-empty, whitespace-free tokens")
    val g = (i: Int) => element_at(col("cs"), i)
    docs
      .select(col("doc_id"),
        c4_stats(col("text"), badWords.mkString(" "), minLineWords)
          .as("cs"))
      .select(col("doc_id"),
        g(1).as("n_lines"), g(2).as("n_kept_lines"),
        g(3).as("n_sentences"), g(4).as("kept_chars"),
        g(5).as("n_noterm_lines"), g(6).as("n_short_lines"),
        g(7).as("n_js_lines"), g(8).as("n_policy_lines"),
        g(9).as("has_lorem"), g(10).as("has_brace"),
        g(11).as("has_badword"))
      .withColumn("keep", c4KeepOf(col(_), minSentences).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** The C4 page-keep decision over named stat columns — shared by
    * [[qualityC4Docs]] and [[qualitySignals]].
    */
  private[graft] def c4KeepOf(c: String => Column,
      minSentences: Int): Column =
    c("has_lorem") === 0 && c("has_brace") === 0 &&
      c("has_badword") === 0 && c("n_sentences") >= minSentences

  /** The planted C4 fixture shared by `quality_c4` and `c4_apply`:
    * the sf corpus is single-line word soup with no punctuation,
    * braces or newlines, so every C4 rule would be vacuous on the raw
    * table — the fixture appends a deterministic doc_id-derived
    * multi-line tail (stated identically in the oracle SQL; the
    * pii_scrub non-vacuity convention): a terminal-punct first line
    * (the original text + '.'), an always-dropped short line, a
    * no-terminal-mark line, an ellipsis-ended line, and conditional
    * javascript / policy / lorem-ipsum / curly-brace / badword /
    * quoted lines on coprime doc_id moduli, closing with a kept
    * '!'-line. Even doc_ids gain a third sentence (the quoted line),
    * so the ≥ 3-sentence page rule decides both ways.
    */
  private[graft] def c4PlantedDocs(spark: SparkSession,
      sfDir: String): DataFrame =
    c4PlantedDocsWith(spark, sfDir, lit(""))

  /** [[c4PlantedDocs]] with an extra per-doc tail appended AFTER the
    * closing good line — `pipeline_c4` plants its shared
    * three-sentence passage through this hook, stated identically in
    * its oracle SQL.
    */
  private[graft] def c4PlantedDocsWith(spark: SparkSession,
      sfDir: String, extra: Column): DataFrame =
    documents(spark, sfDir).select(col("doc_id"), concat(
      col("text"), lit("."),
      lit("\nshort line."),
      lit("\nthis line lacks terminal punctuation"),
      lit("\nthis one trails off into an ellipsis..."),
      when(col("doc_id") % 3 === 0,
        lit("\nthis javascript line has six words.")).otherwise(lit("")),
      when(col("doc_id") % 4 === 1,
        lit("\nwe accept the privacy policy today.")).otherwise(lit("")),
      when(col("doc_id") % 5 === 2,
        lit("\nlorem ipsum dolor sit amet now.")).otherwise(lit("")),
      when(col("doc_id") % 6 === 3,
        lit("\ncurly { brace appears on this page.")).otherwise(lit("")),
      when(col("doc_id") % 7 === 4,
        lit("\nbadword one appears right here now.")).otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        lit("\nhe said \"a quoted line ends well.\"")).otherwise(lit("")),
      lit("\nanother good line with five words!"), extra).as("text"))

  /** Registered `quality_c4` (see [[c4PlantedDocs]]). */
  def qualityC4Query(spark: SparkSession, sfDir: String): DataFrame =
    qualityC4Docs(c4PlantedDocs(spark, sfDir), badWords = Seq("badword"))

  /** T33b — the C4 APPLY form: the CLEANED corpus itself — what the
    * released pipeline actually emits: kept lines rejoined with
    * '\n', pages failing any page rule (lorem / brace / badword /
    * < minSentences sentence marks) DROPPED from the output, not
    * flagged. One typed flatMap through the shared
    * `HashKernels.c4CleanPage` (rule-for-rule identical to the T33
    * stats kernel — one classifier definition, both faces; the
    * lineDedup rebuild convention, since dropping PAGES needs row
    * elimination a projection kernel cannot do). Pure scan → flatMap,
    * zero shuffles but the output sort; fully hash-checkable
    * (strings + ints).
    */
  def c4Apply(docs: DataFrame, badWords: Seq[String] = Nil,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    require(badWords.forall(w => w.nonEmpty && !w.exists(_.isWhitespace)),
      "badwords must be non-empty, whitespace-free tokens")
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = badWords.mkString(" ")
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val cleaned = graft.functions.HashKernels
          .c4CleanPage(t, bw, minLineWords, minSentences)
        if (cleaned == null) None
        else Some((id, cleaned,
          (cleaned.count(_ == '\n') + 1).toLong))
      }
      .toDF("doc_id", "clean_text", "n_kept_lines")
      .orderBy(col("doc_id"))
  }

  /** Registered `c4_apply` (the [[c4PlantedDocs]] fixture). */
  def c4ApplyQuery(spark: SparkSession, sfDir: String): DataFrame =
    c4Apply(c4PlantedDocs(spark, sfDir), badWords = Seq("badword"))

  /** T31 — the GOPHER REPETITION rules (the n-gram half of Rae et
    * al. 2021 §A1.1, completing T30): per-doc character masses of
    * repeated word n-grams — `topN` (n = 2, 3, 4) = max over n-grams
    * of occurrences × gram characters; `dupN` (n = 5..10) =
    * characters covered by any n-gram occurring ≥ 2 times,
    * overlapping positions counted once. `keep_rep` applies the
    * paper's nine thresholds (0.20/0.18/0.16 and 0.15 down to 0.10)
    * by integer cross-multiplication against word_chars — exact,
    * hash-checkable end to end. One codegen'd kernel pass per doc;
    * scan-bound projection like T30.
    */
  def gopherRepetition(spark: SparkSession, sfDir: String): DataFrame =
    gopherRepetitionDocs(documents(spark, sfDir))

  private[graft] val RepStatNames = Seq("word_chars", "top2", "top3",
    "top4", "dup5", "dup6", "dup7", "dup8", "dup9", "dup10")

  /** The Gopher repetition-rule keep decision over named mass columns
    * — shared by [[gopherRepetitionDocs]] and [[qualitySignals]].
    * Thresholds as exact rationals: mass/word_chars ≤ num/den ⇔
    * mass·den ≤ word_chars·num.
    */
  private[graft] def repKeepOf(c: String => Column): Column =
    Seq( // (column index in RepStatNames, num, den)
      (1, 1L, 5L), (2, 9L, 50L), (3, 4L, 25L), // top2/3/4
      (4, 3L, 20L), (5, 7L, 50L), (6, 13L, 100L), // dup5/6/7
      (7, 3L, 25L), (8, 11L, 100L), (9, 1L, 10L)) // dup8/9/10
      .map { case (idx, num, den) =>
        c(RepStatNames(idx)) * den <= c("word_chars") * num
      }
      .reduce(_ && _)

  def gopherRepetitionDocs(docs: DataFrame): DataFrame = {
    import graft.functions.HashFunctions.gopher_repetition
    val g = (i: Int) => element_at(col("gr"), i)
    docs
      .select(col("doc_id"), gopher_repetition(col("text")).as("gr"))
      .select(col("doc_id") +:
        RepStatNames.zipWithIndex.map { case (nm, i) => g(i + 1).as(nm) }: _*)
      .withColumn("keep_rep", repKeepOf(col(_)).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** T37 — COMPRESSIBILITY quality gate (the MADLAD-400-style
    * compressibility filter; RedPajama-v2 ships the same family of
    * signals): per-doc DEFLATE length vs raw UTF-8 length.
    * Templated/repeated text compresses far below natural prose
    * (spam, boilerplate, token-loops); bytes that refuse to compress
    * at all are binary-ish or near-random. `keep_compress` applies
    * both bounds by INTEGER CROSS-MULTIPLICATION
    * (`z·loDen ≥ n·loNum` and `z ≤ n`): defaults keep ratios in
    * [0.25, 1.0]. Pure scan-bound projection (the deflate kernel
    * returns only the LENGTH through a fixed scratch buffer);
    * rows-only downstream — a zlib length is not SQL-stateable —
    * with determinism + ordering specs in QualityOpsSpec.
    */
  def compressionStats(spark: SparkSession, sfDir: String): DataFrame =
    compressionStatsDocs(documents(spark, sfDir))

  def compressionStatsDocs(docs: DataFrame,
      loNum: Int = 1, loDen: Int = 4): DataFrame = {
    import graft.functions.HashFunctions.deflate_size
    require(loNum > 0 && loDen > 0 && loNum <= loDen,
      s"lower ratio bound must be in (0, 1]: $loNum/$loDen")
    docs
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        deflate_size(col("text")).as("z_bytes"))
      .withColumn("keep_compress",
        (col("z_bytes") * loDen >= col("n_bytes") * loNum &&
          col("z_bytes") <= col("n_bytes")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Registered `compression_ratio`: the sf word soup sits safely
    * inside the keep band, so the query PLANTS a 200× repeated token
    * onto doc_id ≡ 7 (mod 13) — those docs compress under the lower
    * bound and are dropped, making the gate non-vacuous (rows-only,
    * so the planting needs no oracle mirror).
    */
  def compressionRatioQuery(spark: SparkSession,
      sfDir: String): DataFrame =
    compressionStatsDocs(documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 7,
          concat(col("text"), repeat(lit(" boiler"), 200)))
          .otherwise(col("text")).as("text")))

  /** T3 — heuristic language ID. */
  def textLangId(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), col("lang").as("lang_label"),
        langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** T4 — canonical md5 fingerprint per document. */
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** T5 — word-trigram shingling stats (the dedup unit). */
  def textShingles(spark: SparkSession, sfDir: String): DataFrame = {
    // counts only — no shingle strings needed: ws_token_count gives
    // the shingle count, shingle_keys the distinct count (both
    // one-pass byte kernels, prop-pinned to the split/transform chain
    // they replace; was the slowest 100× probe row at 91 s as a
    // string-materializing projection, 9 s as kernels)
    import graft.functions.HashFunctions.shingle_keys
    val nTok = graft.functions.HashFunctions.ws_token_count(col("text"))
    documents(spark, sfDir)
      .select(col("doc_id"),
        when(nTok < 3, lit(0)).otherwise(nTok - 2).as("n_shingles"),
        size(shingle_keys(col("text"), lit(""), 3))
          .as("n_distinct_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Composed cleaning pipeline — the operators above chained the way
    * a training-data run would: quality gate → exact dedup (keep the
    * lowest doc_id per fingerprint) → language selection. One scan,
    * one window shuffle; every stage oracle-stated in SQL.
    */
  def pipelineClean(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFp = Window.partitionBy(col("fp"))
    // fence between the kernel projection and the gate (the
    // releaseCapped rationale): pushed down, the quality predicate
    // re-ran the ws_token_count kernel once per substituted
    // reference (×5/row — the r17 Filter lint's finding)
    graft.plans.Fence.stageBarrier(documents(spark, sfDir)
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"),
        fingerprintMd5(col("text")).as("fp")))
      .filter(col("quality") >= 0.5 && col("lang_pred") === "en")
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(byFp))
      .filter(col("keep"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** T7 — text normalization: lowercase, strip ASCII punctuation,
    * collapse whitespace — the canonical form feeding fingerprints
    * and dedup (explicit char classes keep Java regex and RE2
    * byte-identical).
    */
  def textNormalize(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(trim(lower(col("text"))),
          "[!-/:-@\\[-`{-~]", ""), "\\s+", " ").as("norm_text"))
      .select(col("doc_id"), length(col("norm_text")).as("norm_len"),
        md5(col("norm_text")).as("norm_fp"))
      .orderBy(col("doc_id"))

  /** T8 — deterministic stratified sampling: N docs per language,
    * selected by md5 order — reproducible across runs/backfills (no
    * RNG), evenly spread by the hash. The shape is one window shuffle
    * on the stratum key.
    */
  def sampleStratified(spark: SparkSession, sfDir: String,
      perLang: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("text")), col("doc_id"))
    documents(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perLang)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** T11 — within-document REPETITION signals (the Gopher-style
    * quality filters a pretraining pipeline cuts boilerplate with):
    * `top_token_frac` (share of the document occupied by its most
    * frequent token) and `dup_2gram_frac` (share of word-bigram
    * occurrences that are repeats). High values flag auto-generated
    * or template text that per-document dedup cannot catch.
    *
    * Shape: a PURE PROJECTION — both signals come from one-pass
    * kernels (`shingle_keys` n=2 for the distinct-bigram count,
    * `top_token_count` for the max token frequency via a per-row
    * byte-verified count table), so the whole query is scan-bound
    * with zero shuffles at any corpus size. The explode → two-level
    * agg → join formulation this replaces shuffled one row per
    * TOKEN (~150 M rows at the 100× probe) to compute a per-DOC
    * statistic.
    */
  def textRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.HashFunctions.{shingle_keys, top_token_count, ws_token_count}
    val docs = documents(spark, sfDir)
    val nt = ws_token_count(col("text")).cast("long")
    docs.select(col("doc_id"), nt.as("n_tokens"),
        (top_token_count(col("text")).cast("double") / nt)
          .as("top_token_frac"),
        when(nt <= 1, lit(0.0)).otherwise(
          (nt - 1 - size(shingle_keys(col("text"), lit(""), 2)))
            .cast("double") / (nt - 1)).as("dup_2gram_frac"))
      .orderBy(col("doc_id"))
  }

  /** T12 — PII SCRUBBING: redact emails, US-style phone numbers and
    * IPv4 addresses to typed placeholders, with per-doc match counts
    * for audit. The patterns use only constructs Java regex and RE2
    * treat identically (char classes, `\b`, bounded repeats — no
    * lookaround) so the oracle is byte-exact. Pure projection via the
    * [[graft.functions.PiiKernels]] scanners — semantics identical to
    * the 6-pass `regexp_replace`/`regexp_count` formulation the
    * oracle states (fuzz-pinned), minus the per-position Matcher
    * machinery that dominated the 100× probe. Zero shuffles,
    * scan-bound at 100 TB.
    *
    * The synthetic corpus carries no PII, so the query PLANTS
    * deterministic doc_id-derived PII first (same expression stated
    * in the oracle SQL) — the redaction path is exercised on every
    * third/fourth/fifth row, not vacuously green.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.PiiFunctions.{pii_counts, pii_scrub_text}
    val planted = documents(spark, sfDir)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" mail u"), col("doc_id").cast("string"),
            lit("@ex.com"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(" ip 10.0.0.1"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" tel 555-123-4567"))
          .otherwise(lit(""))).as("text"))
    // counts are over the original text (independent per pattern);
    // redaction cascades email → phone → ip so a phone-like digit
    // run inside an address is redacted as part of the address
    val cnt = pii_counts(col("text"))
    planted.select(col("doc_id"),
      element_at(cnt, 1).as("n_emails"),
      element_at(cnt, 2).as("n_phones"),
      element_at(cnt, 3).as("n_ips"),
      md5(pii_scrub_text(col("text"))).as("scrub_fp"))
      .orderBy(col("doc_id"))
  }

  /** T15 — MODEL-SCORED QUALITY FILTER: the classifier stage a
    * pretraining pipeline runs after per-feature heuristics
    * (CCNet / LLaMA-style linear scoring): a fixed-weight linear
    * model over five kernel features — length, stopword density,
    * punctuation density, top-token share, duplicate-bigram share —
    * with a keep/drop decision at the 0.5 threshold. RATIONAL
    * arithmetic only (min/max, ×, ÷, −; no exp/ln), evaluation order
    * mirrored term-for-term in the oracle SQL, so the score is
    * bit-reproducible in DuckDB — the filter decision is
    * oracle-checked, not approximately checked. Pure projection:
    * every feature is a one-pass kernel, zero shuffles at 100 TB.
    */
  def qualityClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val score = modelQualityScore(col("text"))
    documents(spark, sfDir)
      .select(col("doc_id"), score.as("q_score"),
        (score >= lit(0.5)).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** The T15 linear model as a COLUMN — a stateless projection, so it
    * composes unchanged into batch scans and `readStream` pipelines
    * alike (StreamingSpec drives it through a MemoryStream query).
    * ONE fused `model_score` kernel call since r17: the historical
    * arithmetic tree ([[modelQualityScoreTree]], retained below as
    * the executable spec) re-evaluated `model_stats` once per
    * element_at reference — ~10× per row, measured — whenever the
    * score landed in a Filter predicate, because FilterExec does no
    * subexpression elimination. The kernel reproduces the tree's
    * double arithmetic operation-for-operation, so the score — and
    * every hash-checked consumer — is bit-identical (ModelStatsSpec
    * battery + TextKernelPropSpec property vs the interpreted tree).
    */
  def modelQualityScore(text: Column): Column =
    graft.functions.HashFunctions.model_score(text)

  /** The historical T15 Column tree — THE executable spec of
    * [[modelQualityScore]]'s kernel (the htmlTextRegex precedent):
    * term order is load-bearing, the oracle SQL and the kernel both
    * mirror it. Not used on any hot path.
    */
  private[graft] def modelQualityScoreTree(text: Column): Column = {
    import graft.functions.HashFunctions.model_stats
    val ms = model_stats(text)
    val ntI = element_at(ms, 1)
    val nt = ntI.cast("double")
    val lenF = least(nt, lit(400.0)) / lit(400.0)
    val swF = least(
      element_at(ms, 2).cast("double") / nt * lit(4.0),
      lit(1.0))
    val punctR = element_at(ms, 3).cast("double") /
      length(text).cast("double")
    val topR = element_at(ms, 4).cast("double") / nt
    val dupFrac = when(ntI <= 1, lit(0.0)).otherwise(
      (ntI - 1 - element_at(ms, 5))
        .cast("double") / (ntI - 1))
    lenF * lit(0.35) +
      swF * lit(0.25) +
      (lit(1.0) - least(punctR * lit(5.0), lit(1.0))) * lit(0.15) +
      (lit(1.0) - topR) * lit(0.15) +
      (lit(1.0) - dupFrac) * lit(0.10)
  }

  /** T38 — ONE-SCAN QUALITY-SIGNALS TABLE (the RedPajama-v2 release
    * shape: materialize every gate's statistics and decision ONCE,
    * then tune thresholds and ablate filter combinations offline
    * without ever re-scanning the corpus): per document, the Gopher
    * document-rule keep (T30), the Gopher repetition keep (T31), the
    * C4 page keep (T33), the model-scored keep (T15) and the
    * compressibility keep (T37), plus `keep_all` = their AND — five
    * kernels in ONE projection over ONE corpus scan. Every keep
    * expression is THE SAME definition the standalone operators
    * apply (`gopherKeepOf` / `repKeepOf` / `c4KeepOf` / the T15
    * score / the T37 band — shared functions, not copies), spec'd
    * column-for-column equal to the standalone queries. r15: the
    * Gopher document stats and the C4 page stats come from ONE fused
    * `page_stats` kernel (one byte copy / line pass / token pass —
    * HashKernels.pageStats, bit-identical to the standalone kernels'
    * concatenation by differential spec). Scan-bound,
    * zero shuffles but the output sort; rows-only downstream (the
    * z_bytes column — everything else is oracle-checked through its
    * standalone query).
    */
  def qualitySignals(docs: DataFrame,
      stopWords: Seq[String] = GopherStopList,
      badWords: Seq[String] = Nil,
      minLineWords: Int = 5, minSentences: Int = 3,
      loNum: Int = 1, loDen: Int = 4): DataFrame =
    qualitySignalsOf(docs, stopWords, badWords, minLineWords,
      minSentences, loNum, loDen)
      .orderBy(col("doc_id"))

  /** The T38 signals PROJECTION without the batch face's output sort
    * — THE shared definition of the batch table and the X25 streaming
    * face (one definition, both faces — the X19/X23 convention).
    * Stateless column-space kernels only, so a streaming caller's
    * watermark survives; `carry` names input columns (e.g. the event
    * time) to keep alongside the signal columns.
    */
  def qualitySignalsOf(docs: DataFrame,
      stopWords: Seq[String] = GopherStopList,
      badWords: Seq[String] = Nil,
      minLineWords: Int = 5, minSentences: Int = 3,
      loNum: Int = 1, loDen: Int = 4,
      carry: Seq[String] = Nil): DataFrame = {
    import graft.functions.HashFunctions.{page_stats,
      gopher_repetition, deflate_size}
    require(stopWords.nonEmpty && stopWords.size <= 64,
      s"stop list must have 1..64 words: ${stopWords.size}")
    // page_stats = gopherStats(10) ++ c4Stats(11) fused (r15: one
    // byte copy + one line pass + one token pass; each integer
    // bit-identical to the standalone kernels — QualityOpsSpec's
    // differential test), so the gopher slots keep their 1-based
    // indices and the c4 slots shift by 10
    val gsIdx = Map("n_words" -> 1, "word_chars" -> 2,
      "n_alpha_words" -> 3, "n_lines" -> 4, "n_distinct_lines" -> 5,
      "n_ellipsis_lines" -> 6, "n_symbols" -> 7, "stop_hits" -> 8,
      "line_chars" -> 9, "dup_line_chars" -> 10)
    val grIdx = RepStatNames.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap
    val csIdx = Map("n_sentences" -> 13, "has_lorem" -> 19,
      "has_brace" -> 20, "has_badword" -> 21)
    val keeps = Seq(
      gopherKeepOf(n => element_at(col("ps"), gsIdx(n)))
        .cast("int").as("keep_gopher"),
      repKeepOf(n => element_at(col("gr"), grIdx(n)))
        .cast("int").as("keep_rep"),
      c4KeepOf(n => element_at(col("ps"), csIdx(n)), minSentences)
        .cast("int").as("keep_c4"),
      (col("q_score") >= lit(0.5)).cast("int").as("keep_model"),
      (col("z_bytes") * loDen >= col("n_bytes") * loNum &&
        col("z_bytes") <= col("n_bytes")).cast("int")
        .as("keep_compress"))
    val carried = carry.map(col)
    docs
      .select(Seq(col("doc_id")) ++ carried ++ Seq(
        page_stats(col("text"), stopWords.mkString(" "),
          badWords.mkString(" "), minLineWords).as("ps"),
        gopher_repetition(col("text")).as("gr"),
        modelQualityScore(col("text")).as("q_score"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        deflate_size(col("text")).as("z_bytes")): _*)
      .select(Seq(col("doc_id")) ++ carried ++ Seq(col("q_score"),
        col("n_bytes"), col("z_bytes")) ++ keeps: _*)
      .withColumn("keep_all",
        (col("keep_gopher") === 1 && col("keep_rep") === 1 &&
          col("keep_c4") === 1 && col("keep_model") === 1 &&
          col("keep_compress") === 1).cast("int"))
  }

  /** Registered `quality_signals`: the [[c4PlantedDocs]] fixture
    * (its planted lines give the line/page rules real structure) with
    * the corpus-fitting stop list and badword — rows-only (z_bytes);
    * QualityOpsSpec pins every keep column equal to its standalone
    * operator on the same fixture.
    */
  def qualitySignalsQuery(spark: SparkSession,
      sfDir: String): DataFrame =
    qualitySignals(c4PlantedDocs(spark, sfDir),
      stopWords = Seq("the", "a"), badWords = Seq("badword"))

  /** Registered `quality_signals_core` (hash-checked): T38 minus the
    * zlib column — the same one-scan projection with the
    * compressibility kernel PRUNED by Catalyst (the deflate column is
    * unused, so the scan's projection drops it), and `keep_core` =
    * the AND of the four SQL-stateable gates. This gives the signals
    * table itself a green hash row; the full table keeps its
    * rows-only registration for z_bytes.
    */
  def qualitySignalsCoreQuery(spark: SparkSession,
      sfDir: String): DataFrame =
    qualitySignalsQuery(spark, sfDir)
      .select(col("doc_id"), col("q_score"), col("n_bytes"),
        col("keep_gopher"), col("keep_rep"), col("keep_c4"),
        col("keep_model"))
      .withColumn("keep_core",
        (col("keep_gopher") === 1 && col("keep_rep") === 1 &&
          col("keep_c4") === 1 && col("keep_model") === 1).cast("int"))
      .orderBy(col("doc_id"))

  /** T43 — GATE-COMBINATION ABLATION over the T38 signals table: the
    * filter-ablation query a release pipeline actually runs against
    * the materialized signals (per 4-bit gate combination, document
    * count and byte mass), answering "what does each filter uniquely
    * remove, and how much survives every combination?" without
    * re-scanning the corpus per experiment. Shares the T38 projection
    * ([[qualitySignalsOf]] — one definition) restricted to the four
    * SQL-stateable gates; the aggregation collapses to ≤16 cells via
    * map-side partial agg, so the shuffle carries 16 rows per
    * partition regardless of corpus size.
    */
  def signalsAblationQuery(spark: SparkSession, sfDir: String): DataFrame =
    qualitySignalsOf(c4PlantedDocs(spark, sfDir),
        stopWords = Seq("the", "a"), badWords = Seq("badword"))
      .groupBy(col("keep_gopher"), col("keep_rep"), col("keep_c4"),
        col("keep_model"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("sum_bytes"))
      .orderBy(col("keep_gopher"), col("keep_rep"), col("keep_c4"),
        col("keep_model"))

  /** T43 — MODEL-THRESHOLD SWEEP: the kept-docs / kept-bytes curve of
    * the T15 model gate over a 21-point threshold grid (0.00, 0.05,
    * …, 1.00) — the offline tuning artifact that picks a quality
    * cutoff by corpus survival rather than by eyeballing scores. ONE
    * corpus scan computes (q_score, n_bytes); the text column is
    * pruned before the broadcast grid multiply, so the 21× row
    * fan-out carries 16-byte scalar rows into a 21-group partial
    * agg — scan-bound at any corpus size. Thresholds compare as
    * `q_score >= pct/100.0` (both engines compute the same IEEE
    * division), never via float bucketing, so the curve is
    * hash-exact.
    */
  def modelThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    // fenced (r17): whole-stage codegen evaluates a deferred
    // single-call projection AT ITS USE SITE — inside the broadcast
    // grid join's loop, so the fused model_score kernel ran 21× per
    // row (the old arithmetic tree was saved by accident: its
    // repeated subtrees triggered subexpression elimination, whose
    // functions evaluate EAGERLY before the loop). The fence
    // materializes (q_score, n_bytes) rows, making the fan-out read
    // a column, not re-run a kernel — KernelEvalAuditSpec pins
    // 1 eval/row through the sweep
    val scores = graft.plans.Fence.stageBarrier(
      documents(spark, sfDir).select(
        modelQualityScore(col("text")).as("q_score"),
        octet_length(col("text")).cast("long").as("n_bytes")))
    val grid = spark.range(0, 21)
      .select((col("id") * 5).cast("int").as("threshold_pct"))
    val kept = col("q_score") >= col("threshold_pct") / lit(100.0)
    scores.crossJoin(broadcast(grid))
      .groupBy(col("threshold_pct"))
      .agg(sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(when(kept, col("n_bytes")).otherwise(0L)).as("kept_bytes"))
      .orderBy(col("threshold_pct"))
  }

  /** T45 — HTML→TEXT EXTRACTION: the stage-ZERO of every published
    * web-curation pipeline (C4 extracts from WET, RefinedWeb/FineWeb
    * run trafilatura over WARC — arXiv:2306.01116 §3.1 "text
    * extraction"; everything downstream of it in this library
    * assumes extracted text). Rule set, applied in order:
    * script/style elements dropped WITH their content, comments
    * dropped, block-level tags become newlines (the paragraph
    * structure C4's line rules need), remaining tags become spaces,
    * the five ubiquitous character entities + nbsp decode
    * (&amp; LAST, so double-escaped text stays escaped), whitespace
    * runs collapse, newline runs collapse to one.
    *
    * Spark-first: ONE codegen'd projection over the
    * [[graft.functions.HashKernels.htmlText]] kernel — an
    * indexOf-driven scan per rule instead of ten java.util.regex
    * passes (measured severalfold cut per page at 100×); at 100 TB
    * it is scan-bound and pipelines into whatever gate follows (X28
    * applies the IDENTICAL Column to a streaming frame). The
    * kernel's contract is the historical regexp_replace chain kept
    * below as [[htmlTextRegex]]: its patterns stay within the regex
    * subset java.util.regex and RE2 agree on, the SAME pattern
    * strings drive the DuckDB oracle, and HtmlKernelSpec pins
    * kernel ≡ chain on the planted fixtures plus an adversarial
    * malformed-markup battery — so the extraction stays hash-checked
    * end to end.
    */
  def htmlTextOf(html: Column): Column =
    graft.functions.HashFunctions.html_text(html)

  /** The T45 rule chain as built-in `regexp_replace`/`replace` calls
    * — the kernel's executable specification (HtmlKernelSpec pins
    * `htmlTextOf` ≡ this on fixtures + adversarial pages) and the
    * shape the DuckDB oracle CTE mirrors pattern-for-pattern.
    */
  private[graft] def htmlTextRegex(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</?(?:p|br|li|ul|ol|div|h[1-6]|tr|table|blockquote)\\b[^>]*>",
      "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        replace(c, lit(e), lit(r)) }
    val sp = regexp_replace(ent, "[ \\t\\r]+", " ")
    val nl = regexp_replace(sp, " ?\\n[ \\n]*", "\n")
    regexp_replace(nl, "^\\s+|\\s+$", "")
  }

  /** The planted HTML page for the registered T45 face: the corpora
    * carry extracted text, not markup, so the fixture WRAPS each
    * doc's text in a deterministic page (the pii_scrub / T39
    * planted-column precedent) — head with title + style, an h1, the
    * text in a p, plus per-residue extras so EVERY rule fires on
    * real rows: a script with `<`/`&&` inside (doc_id%3=0), a list
    * (doc_id%2=0), the six entities (doc_id%5=0), an UNCLOSED
    * attribute quote (doc_id%7=3 — the malformed-markup case both
    * engines must cut identically). The oracle CTE plants the
    * identical page.
    */
  private[graft] def plantHtml(docs: DataFrame): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val script = when(col("doc_id") % 3 === 0,
      lit("<script type=\"text/javascript\">var x = 1 < 2 && y > 0;</script>"))
      .otherwise(lit(""))
    val list = when(col("doc_id") % 2 === 0,
      lit("<ul><li>alpha</li><li>beta</li></ul>")).otherwise(lit(""))
    val entities = when(col("doc_id") % 5 === 0,
      lit(" Fish &amp; Chips &lt;b&gt;bold&#39;s&quot; end&nbsp;here"))
      .otherwise(lit(""))
    val malformed = when(col("doc_id") % 7 === 3,
      lit("<div class=\"unterminated")).otherwise(lit(""))
    docs.select(col("doc_id"), concat(
      lit("<html><!-- gen -->\n<head><title>Doc "), idStr,
      lit("</title><style media=\"all\">body { color: #000; }</style></head><body><h1>Doc "),
      idStr, lit("</h1>"), script, list, lit("<p>"), col("text"),
      entities, lit("</p>"), malformed,
      lit("</body></html>")).as("html"))
  }

  /** Wrap a `(doc_id, text, …)` frame as RAW CRAWL PAGES whose T45
    * extraction recovers `text` EXACTLY: every text line becomes a
    * `<p>` block (block tags come back as newlines), under a head
    * with an empty title, a style block, a comment and a script the
    * extraction must strip. Exactness needs line-structured text
    * with no blank lines, no blank runs and no `&<>` — which every
    * planted fixture in this library satisfies. This is the P7
    * fixture: raw page in, the P6 fixture text back out, so the
    * web pipeline is spec'd EQUAL to the release pipeline.
    */
  private[graft] def plantWebPage(docs: DataFrame): DataFrame =
    docs.withColumn("html", concat(
        lit("<html><!-- crawl fixture --><head><title></title>" +
          "<style media=\"all\">body { margin: 0; }</style></head>" +
          "<body><script>var t = 1 < 2 && true;</script><p>"),
        replace(col("text"), lit("\n"), lit("</p><p>")),
        lit("</p></body></html>")))
      .drop("text")

  /** Registered `html_extract` (hash-checked): extraction over the
    * planted page — doc_id, the extracted text, its line count.
    */
  def htmlExtract(spark: SparkSession, sfDir: String): DataFrame =
    plantHtml(documents(spark, sfDir))
      .select(col("doc_id"), htmlTextOf(col("html")).as("page_text"))
      .withColumn("n_lines",
        (length(col("page_text"))
          - length(regexp_replace(col("page_text"), "\\n", "")) + 1)
          .cast("long"))
      .orderBy(col("doc_id"))

  /** T46 — TOKENIZER FERTILITY BY LANGUAGE: per-language corpus mass
    * in every unit a budget is stated in (docs, whitespace tokens,
    * BPE-ish tokens, bytes, chars) plus the two ratios multilingual
    * curation decides with — bytes per BPE token ("fertility", the
    * mT5/BLOOM-lineage statistic: how many bytes one token buys per
    * language, i.e. how a byte budget converts to a token budget)
    * and chars per whitespace token. One scan, one partial-agged
    * groupBy to #langs rows; the ratios are each ONE IEEE division
    * over exact integer sums, stated identically in the oracle, so
    * the whole row hash-checks.
    */
  def tokenFertility(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(bpeTokenCount(col("text")).cast("long"))
          .as("n_bpe_tokens"),
        sum(octet_length(col("text")).cast("long")).as("n_bytes"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .withColumn("bytes_per_bpe_token",
        col("n_bytes").cast("double") /
          col("n_bpe_tokens").cast("double"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("lang"))

  /** C9 — the reference WordCount (examples/wordcount/WordCount.java:17):
    * flatMap to words → keyBy → count, as explode + hash aggregation
    * (map-side partial agg replaces Flink's keyed state).
    */
  def wordcount(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
}

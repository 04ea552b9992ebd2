package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Corpus-level training-data operators: statistics and layouts that
  * need the WHOLE corpus per doc — novelty (corpus-wide shingle df)
  * and sequence packing (global token prefix-sum) — kept scalable by
  * the inverted-postings and distributed-prefix-sum shapes.
  */
object CorpusOps {

  /** T9 — n-gram NOVELTY per document: the fraction of a doc's
    * distinct 3-gram shingles that occur in NO other document —
    * the dedup-aware quality weight a pipeline uses to up-sample
    * genuinely novel text (a doc whose shingles all appear elsewhere
    * is boilerplate even when no single pair crosses a dedup
    * threshold).
    *
    * Shape: `shingle_keys` postings (two longs, same pack as the
    * dedup family), df per shingle via a window partitioned BY
    * SHINGLE (distributed — no global window), then one agg per doc.
    * Work is Θ(postings); the shingle window and the doc agg are the
    * only shuffles. Exact up to 64-bit shingle-key collisions (zero
    * at oracle scale, ≈ d²/2⁶⁵ corpus-wide — the documented contract
    * of the whole shingle-key family).
    */
  def textNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.HashFunctions.shingle_keys
    val postings = documents(spark, sfDir)
      .select(col("doc_id"),
        shingle_keys(col("text"), lit(""), 3).as("keys"))
      .as[(Long, Array[Long])]
      .flatMap { case (id, keys) => keys.map(h => (h, id)) }
      .toDF("shingle", "doc_id")
    postings
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** T10 — SEQUENCE PACKING: assign docs (in doc_id order) to
    * contiguous training-batch bins of `targetTokens` whitespace
    * tokens — the batch-packing layout step before tokenized
    * examples are written. A doc belongs to the bin where its token
    * range STARTS (offset packing): deterministic, order-preserving,
    * and one doc may straddle a boundary — the sequential greedy
    * packing a single-threaded writer would produce, computed
    * distributed.
    *
    * The global running token count comes from
    * [[graft.plans.GlobalOrder.withPrefixSum]] — per-partition
    * partial sums + offset pass — NOT `sum() OVER (ORDER BY ...)`,
    * whose unpartitioned window moves the entire corpus to one task.
    */
  def packSequences(spark: SparkSession, sfDir: String,
      targetTokens: Long = 2048L): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be > 0: $targetTokens")
    import graft.functions.TextFunctions.tokenCount
    val toks = documents(spark, sfDir)
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    // `div` (long integer division — both operands non-negative), not
    // floor(double /): past 2^53 cumulative tokens the double rounds
    // and can diverge from integer division, at odds with the 100 TB
    // contract.
    graft.plans.GlobalOrder
      .withPrefixSum(toks, Seq(col("doc_id")), "n_tokens", "cum")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div ${targetTokens}L").as("bin"))
      .orderBy(col("doc_id"))
  }

  /** T13 — SOURCE MIXING: sample each source's docs to a
    * temperature-rebalanced token budget — the standard α = 0.5
    * upweighting of low-resource sources (per-source share ∝
    * √tokens, the multilingual-sampling temperature trick). Docs are
    * taken in md5 order (deterministic, hash-spread — no RNG state to
    * reproduce across backfills) until the source's token target is
    * reached; the crossing doc is included (its range STARTS inside
    * the budget — same offset rule as [[packSequences]]).
    *
    * Exactness: per-source weights are `floor(√T_s)` as LONGS and the
    * target is `budget·w_s div ΣW` — pure integer arithmetic after
    * one correctly-rounded `sqrt`, so there is no float-summation
    * order to drift a boundary doc (a double share would make the
    * cut nondeterministic within 1 ulp).
    *
    * Shape: the weight table is #sources rows (tiny agg, broadcast
    * back); the running token count per source comes from
    * [[graft.plans.GlobalOrder.withPrefixSumKeyed]] — a keyed window
    * would put an entire source (terabytes at 100 TB) on ONE task.
    */
  def mixSources(spark: SparkSession, sfDir: String,
      budgetTokens: Long = 20000L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0: $budgetTokens")
    import graft.functions.TextFunctions.tokenCount
    import org.apache.spark.sql.functions.broadcast
    val d = documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n"),
        md5(col("text")).as("h"))
    val w = d.groupBy(col("source"))
      .agg(sum(col("n")).as("t"))
      .select(col("source"),
        floor(sqrt(col("t").cast("double"))).cast("long").as("w"))
    val targets = w
      .crossJoin(broadcast(w.agg(sum(col("w")).as("tot"))))
      .select(col("source"),
        expr(s"(${budgetTokens}L * w) div tot").as("target"))
    val cum = graft.plans.GlobalOrder.withPrefixSumKeyed(
      d, "source", Seq(col("h"), col("doc_id")), "n", "cum")
    cum.join(broadcast(targets), Seq("source"))
      .filter(col("cum") - col("n") < col("target"))
      .select(col("doc_id"), col("source"), col("n").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The word-trigram stream of one document — THE shared gram
    * builder for T17 mining and T18 counting: both stages must build
    * byte-identical grams or the counting stage silently scores zero
    * hits against the broadcast top-k set.
    *
    * Tokenization mirrors the oracle's
    * `regexp_split_to_array(trim(text), '\s+')` EXACTLY, which a
    * plain Java `t.trim.split("\\s+")` does not: DuckDB `trim`
    * strips SPACES only (Java trim strips all ≤ 0x20, losing the
    * edge empty token a leading tab produces), RE2's `\s` is
    * `[\t\n\f\r ]` (Java's adds `\x0B`), and DuckDB keeps the
    * trailing empty token Java's default split drops (hence
    * `limit = -1`). Verified against the harness DuckDB on
    * tab/newline/vertical-tab edge texts.
    */
  private def trigramsOf(t: String): Iterator[String] = {
    var b = 0
    var e = t.length
    while (b < e && t.charAt(b) == ' ') b += 1
    while (e > b && t.charAt(e - 1) == ' ') e -= 1
    val tk = t.substring(b, e).split("[ \t\n\f\r]+", -1)
    if (tk.length < 3) Iterator.empty
    else (0 to tk.length - 3).iterator
      .map(i => tk(i) + " " + tk(i + 1) + " " + tk(i + 2))
  }

  /** T17 — corpus-wide FREQUENT N-GRAM MINING (the C4/Gopher
    * boilerplate-detection prerequisite): exact counts of word
    * trigrams across the whole corpus, top-k by count with ties
    * broken by the n-gram string, so the frontier is deterministic
    * and the whole result hash-matches DuckDB.
    *
    * Scale shape: one scan through a typed flatMap (NOT
    * `explode(transform(...))` — that shape trips the
    * alias-substitution trap PlanAuditSpec lints: Generate's pushed
    * size/isnotnull predicate would re-run the gram-building HOF per
    * row in an interpreted Filter), then a partial-agged count —
    * map-side combine collapses repeated grams before the shuffle,
    * so the exchange carries distinct (gram, partial-count) rows —
    * and a TakeOrderedAndProject top-k: per-partition heaps, k rows
    * to the driver, never a global sort of the gram table.
    */
  def topNgrams(spark: SparkSession, sfDir: String,
      k: Int = 100): DataFrame = {
    require(k > 0 && k <= 100000,
      s"k must be in 1..100000 (driver-bounded result), got $k")
    import spark.implicits._
    documents(spark, sfDir).select(col("text")).as[String]
      .flatMap(trigramsOf)
      .toDF("ngram")
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(k)
  }

  /** T18 — per-document BOILERPLATE SHARE: how much of each document
    * is made of the corpus' [[topNgrams]] — the Gopher-style signal a
    * pipeline thresholds to drop template-heavy documents. Consumes
    * the mining stage: top-k grams (a bounded k-string driver collect,
    * the sanctioned IVF-fit precedent) broadcast into one typed-map
    * scan that counts total and boilerplate trigrams per document —
    * integer-exact, so the whole diagnostic hash-matches. Docs with
    * no trigram (< 3 tokens) have no share and are absent by
    * contract, mirroring the SQL GROUP BY.
    *
    * Eager contract (the bm25Search convention): the MINING stage
    * runs at construction time — building this frame costs a corpus
    * scan before any action, because the counting map needs the top-k
    * set as a broadcast value. The broadcast itself is reclaimed by
    * Spark's ContextCleaner once the returned frame is unreachable.
    */
  def boilerplateShare(spark: SparkSession, sfDir: String,
      k: Int = 100): DataFrame = {
    import spark.implicits._
    val top = topNgrams(spark, sfDir, k)
      .select(col("ngram")).as[String].collect().toSet
    val bc = spark.sparkContext.broadcast(top)
    documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        var total = 0L
        var hits = 0L
        trigramsOf(t).foreach { g =>
          total += 1
          if (bc.value.contains(g)) hits += 1
        }
        (id, total, hits)
      }
      .toDF("doc_id", "n_grams", "boiler_hits")
      .filter(col("n_grams") > 0)
      .orderBy(col("doc_id"))
  }

  /** T16 — corpus DATA CARD: the per-source report a pipeline records
    * alongside every training-data release — document/token/char
    * volumes, exact-duplicate uniqueness, decimal-exact mean quality,
    * and the English share (per the heuristic language ID). Every
    * column is ORACLE-CHECKED: counts and sums are integer-exact, the
    * quality mean goes through [[graft.Tables.davg]]'s decimal
    * lattice, so the whole card is engine-reproducible — a data card
    * that cannot drift between the engine that built the corpus and
    * the engine that audits it.
    *
    * Scale shape: one corpus scan — every metric is a one-pass kernel
    * projection — into a partial-agged groupBy on `source` (#sources
    * rows out). `countDistinct(fp)` expands to the standard two-level
    * aggregate: (source, fp) partial dedup before the shuffle, so the
    * exchange carries at most one row per distinct fingerprint, never
    * per document.
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokenCount, qualityScore,
      langId, fingerprintMd5}
    documents(spark, sfDir)
      .select(col("source"),
        tokenCount(col("text")).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"),
        fingerprintMd5(col("text")).as("fp"),
        qualityScore(col("text")).as("q"),
        (langId(col("text")) === lit("en")).cast("long").as("is_en"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        countDistinct(col("fp")).as("n_unique"),
        graft.Tables.davg(col("q")).as("avg_quality"),
        sum(col("is_en")).as("n_en"))
      .orderBy(col("source"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.TextFunctions.tokens

/** T14 — BM25 corpus retrieval: score every document against a query
  * string with Okapi BM25 (Lucene's idf variant) and return the
  * top-k. The retrieval counterpart of the dedup/contamination family
  * — the same engine that filters a corpus must be able to SEARCH it
  * (eval-set leakage triage, nearest-document audits, boilerplate
  * hunts).
  *
  * Spark-first shape, built for a 100 TB corpus:
  *  - term frequencies are PROJECTIONS (`filter(tokens, _ = term)`
  *    per query term — queries are a handful of terms), not an
  *    explode → groupBy: one scan, no shuffle for the per-doc side.
  *  - corpus statistics (N, avgdl, per-term document frequencies)
  *    are ONE scalar aggregation row collected to the driver (the
  *    sanctioned bounded collect — q doubles) and folded into the
  *    scoring projection as literals.
  *  - top-k via orderBy + limit = TakeOrderedAndProject: per-partition
  *    heaps, k rows to the driver, never a global sort spill.
  *
  * Determinism: the score sums its per-term contributions in FIXED
  * query-term order inside one projection (no aggregation-order
  * nondeterminism). Cross-engine: `ln` differs from DuckDB's by
  * 1 ulp on ~0.5% of idf inputs (measured), so the scored query is
  * rows-only for the driver oracle; the integer-exact retrieval core
  * (dl, per-term tf, matched-term count) is oracle-checked by
  * [[bm25DocStats]], and SearchSpec pins the scores bit-exactly
  * against an in-driver Java reference.
  */
object Search {

  val defaultQuery: Seq[String] = Seq("table", "scan", "window")

  /** (doc_id, dl, tf-array) via ONE `termCounts` kernel walk per row
    * inside a typed map. NOT a column expression: q `element_at`
    * consumers plus the matched-doc filter would each re-evaluate the
    * kernel — measured 4.5× per row; Catalyst's subexpression
    * elimination does not share across Filter/Project operators, and
    * predicate pushdown substitutes the alias below the projection
    * (the SURVEY §8 trap). The typed map materializes the array once;
    * downstream extraction reads an attribute. KernelEvalAuditSpec
    * pins one evaluation per row per scan.
    */
  private def baseOf(spark: SparkSession, sfDir: String,
      query: Seq[String]): DataFrame = {
    query.foreach(t => require(t.nonEmpty && !t.exists(_.isWhitespace),
      s"query term must be a single non-empty token: '$t'"))
    import spark.implicits._
    import graft.functions.HashKernels
    val spec = query.mkString(" ")
    documents(spark, sfDir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
        (id, HashKernels.wsTokenCount(u),
          HashKernels.termCounts(u, spec).toIntArray())
      }
      .toDF("doc_id", "dl", "tf")
  }

  /** Integer-only retrieval core for the DuckDB oracle: document
    * length and per-term tf for every document matching at least one
    * query term. Hash-exact (no floats).
    */
  def bm25DocStats(spark: SparkSession, sfDir: String,
      query: Seq[String] = defaultQuery): DataFrame = {
    val tfs = query.indices.map(i =>
      element_at(col("tf"), i + 1).cast("long").as(s"tf$i"))
    baseOf(spark, sfDir, query)
      .select((col("doc_id") +: col("dl").cast("long").as("dl") +: tfs): _*)
      .filter(query.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .orderBy(col("doc_id"))
  }

  /** BM25 top-k search (k1 = 1.2, b = 0.75, Lucene idf
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`). Ties break by doc_id so
    * the top-k frontier is deterministic.
    *
    * SINGLE corpus scan: BM25 needs corpus statistics BEFORE it can
    * score, so two jobs are inherent — but only the first may touch
    * the parquet. The derived projection `(doc_id, dl, tf)` — ids and
    * small ints, ≈ (12 + 4·q) bytes/doc, NOT the text column — is
    * persisted (memory-and-disk); the stats job materializes it as it
    * aggregates, and the scoring job's TakeOrderedAndProject reads
    * the cache. The bounded top-k result (≤ topK rows, the same rows
    * TakeOrdered drains to the driver anyway) is collected so the
    * cache can be released before returning; the caller gets a local
    * frame in ranked order. KernelEvalAuditSpec pins the contract:
    * one `term_counts` kernel evaluation per document per call.
    */
  def bm25Search(spark: SparkSession, sfDir: String,
      query: Seq[String] = defaultQuery, topK: Int = 50,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty && query.size <= 32,
      s"query must have 1..32 terms, got ${query.size}")
    require(topK > 0 && topK <= 100000,
      s"topK must be in 1..100000 (driver-bounded result), got $topK")
    val tfs = query.indices.map(i =>
      element_at(col("tf"), i + 1).cast("double").as(s"tf$i"))
    val base = baseOf(spark, sfDir, query)
      .select((col("doc_id") +: col("dl").cast("double").as("dl") +: tfs): _*)
      .persist()
    try {
      // ONE bounded scalar-stats job: N, Σdl, df per term — this job
      // performs the only parquet scan and fills the cache
      val aggCols: Seq[Column] =
        count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
          query.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val statRow = base.agg(aggCols.head, aggCols.tail: _*).head()
      val n = statRow.getLong(0)
      require(n > 0, "empty corpus")
      val avgdl = statRow.getDouble(1) / n
      val idf = query.indices.map { i =>
        val df = statRow.getLong(2 + i)
        math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      }
      // fixed-order contribution sum: deterministic, no agg involved
      val score = query.indices.map { i =>
        lit(idf(i)) * (col(s"tf$i") * lit(k1 + 1.0) /
          (col(s"tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      }.reduce(_ + _)
      val top = base.select(col("doc_id"), score.as("score"))
        .filter(col("score") > 0.0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(topK)
      val rows = top.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), top.schema)
    } finally base.unpersist()
  }

  /** The corpus token stream `(doc_id, fnv64(token))` with the
    * oracle's exact tokenization (`regexp_split_to_array(trim(text),
    * '\s+')` — see [[CorpusOps.duckTokens]]), as a typed flatMap
    * (never `explode(split(...))`, the linted Generate trap). Tokens
    * travel as 8-byte FNV keys, not strings — the count-table groupBy
    * and the count join are the LM family's only shuffles, and
    * hashing them is the same trade the jaccard posting family made
    * (SURVEY §8b): exact up to 64-bit collisions, ≈ v²/2⁶⁵ over the
    * vocabulary.
    */
  private def tokenStream(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        CorpusOps.duckTokens(t).map(w => (id, CorpusOps.lineHash(w)))
      }
      .toDF("doc_id", "w")
  }

  /** T20a — unigram-LM EVIDENCE per document, integer-exact (the
    * oracle-checked core of [[lmPerplexity]], the bm25DocStats
    * convention): for each doc, its token count, the sum of the
    * corpus-wide counts of its tokens (with multiplicity), and the
    * count of its rarest token. A doc whose `min_cnt` is 1 contains a
    * corpus-unique token; a doc whose `sum_cnt/n_tokens` is large is
    * made of very common words — the integer signals the smoothed LM
    * score is built from.
    *
    * Scale shape: token strings shuffle twice (count-table groupBy,
    * then the count join — both partial-agged / key-partitioned; the
    * join is vocab×corpus-tokens, the standard scalable LM-train +
    * score shape), one row per doc out. The corpus is scanned twice
    * (train pass + score pass) — inherent to scoring against
    * corpus-global statistics; both scans are the same cheap
    * projection of (doc_id, text).
    */
  def lmDocStats(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = tokenStream(spark, sfDir)
    val cnt = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    tok.join(cnt, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("c")).as("sum_cnt"),
        min(col("c")).as("min_cnt"))
      .orderBy(col("doc_id"))
  }

  /** T20 — per-document PERPLEXITY under an add-one-smoothed unigram
    * LM trained on the corpus itself (the CCNet-style LM quality
    * filter, with the corpus as its own reference model):
    * `ppl(d) = exp(ln(T+V+1) − (1/n)·Σ_w ln(c(w)+1))` — high for
    * docs of rare tokens, low for boilerplate-common text. Add-one
    * smoothing turns the per-token term into `ln(c+1)`, so the whole
    * score needs only the count table plus two global scalars
    * (T = total tokens, V = vocab size; one bounded agg folded in as
    * literals, the BM25 stats precedent).
    *
    * Determinism at any partition count: each `ln(c+1)` enters the
    * per-doc sum as its DECIMAL-scale-12 unscaled long (the
    * dec4Scaled pattern at LM precision), so the shuffled aggregation
    * is an exact integer sum — order-free — and only the final
    * `exp(lnTV − s/10¹²/n)` runs in floats, one fixed-order
    * expression. Scale contract: |Σ| < 2⁶³ holds through docs of
    * 3×10⁵ tokens against any vocab ≤ 10¹². Rows-only for the driver
    * oracle (JVM `ln`/`exp` differ from DuckDB's by 1 ulp on a tail
    * of inputs — the bm25_search precedent); SearchSpec pins the ppl
    * BIT-exactly against an in-driver reference, and the integer core
    * is oracle-checked via [[lmDocStats]].
    *
    * The count table stays persisted (memory-and-disk) because the
    * returned plan reads it twice removed — the stats job fills the
    * cache, Spark's ContextCleaner reclaims it once the frame is
    * unreachable (the boilerplateShare broadcast convention).
    */
  def lmPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = tokenStream(spark, sfDir)
    val cnt = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded scalar job: vocab size + total tokens (fills the
    // count-table cache as it aggregates)
    val statRow = cnt.agg(count(lit(1)).as("v"), sum(col("c")).as("t")).head()
    val vocab = statRow.getLong(0)
    require(vocab > 0, "empty corpus")
    val total = statRow.getLong(1)
    val lnTV = math.log(total.toDouble + vocab.toDouble + 1.0)
    // the dec12 ln term is a pure function of the COUNT-TABLE row —
    // compute it once per VOCAB entry (a vocab-sized typed map, JVM
    // libm pinned) and let the corpus-sized join carry the long: the
    // big stream never crosses a typed boundary and never calls libm
    // (measured 9.8 s → the join+agg floor at the 100× probe)
    val term = cnt.as[(Long, Long)]
      .map { case (w, c) =>
        (w, graft.functions.CentroidKernels.dec12Scaled(
          math.log(c.toDouble + 1.0)))
      }
      .toDF("w", "l")
    tok.join(term, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("l")).as("s"))
      .as[(Long, Long, Long)]
      // final scalar in the typed layer: Catalyst's exp codegen is
      // StrictMath-flavored and drifts 1 ulp from Math.exp on a tail
      // of inputs — the typed map pins the exact JVM op sequence the
      // spec reference uses
      .map { case (id, n, s) =>
        (id, n, math.exp(lnTV - s.toDouble / 1e12 / n.toDouble))
      }
      .toDF("doc_id", "n_tokens", "ppl")
      .orderBy(col("doc_id"))
  }

  /** The DSIR feature stream `(doc_id, fnv64(feature))`: hashed
    * unigrams AND bigrams with multiplicity — the feature space of
    * Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023), which selects pretraining data by the likelihood ratio of
    * each document under a target-domain bag-of-ngrams model vs the
    * raw-corpus model. Same typed-flatMap shape and 8-byte hashed
    * keys as [[tokenStream]] (tokens never shuffle as strings);
    * bigrams join on a single 0x20 so the SQL oracle's
    * `concat_ws(' ', ...)` builds identical bytes, and tokens contain
    * no whitespace by construction so unigram/bigram strings cannot
    * collide.
    */
  private def featureStream(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val tk = CorpusOps.duckTokens(t)
        val n = tk.length
        val out = new Array[(Long, Long)](n + math.max(n - 1, 0))
        var i = 0
        while (i < n) {
          out(i) = (id, CorpusOps.lineHash(tk(i)))
          i += 1
        }
        var j = 0
        while (j < n - 1) {
          out(n + j) = (id, CorpusOps.lineHash(tk(j) + " " + tk(j + 1)))
          j += 1
        }
        out
      }
      .toDF("doc_id", "w")
  }

  /** T22a — DSIR EVIDENCE per document, integer-exact (the
    * [[lmDocStats]] convention): for each doc, its feature count
    * (unigrams + bigrams, with multiplicity) and the sums of the
    * corpus-wide and target-subset counts of its features. The target
    * model is the `doc_id % refMod == 0` subset — the same standing
    * convention as the contamination screens (a pipeline would pass
    * its curated target corpus instead).
    *
    * Scale shape: ONE count-table groupBy computes both models
    * (corpus count + conditional target count per feature — partial
    * aggregation collapses the stream map-side), one count join, one
    * per-doc agg. Work is Θ(features); nothing collects.
    */
  def dsirDocStats(spark: SparkSession, sfDir: String,
      refMod: Int = 7): DataFrame = {
    require(refMod >= 2, s"refMod must be >= 2: $refMod")
    val f = featureStream(spark, sfDir)
    val cnt = f.groupBy(col("w"))
      .agg(count(lit(1)).as("cq"),
        sum(when(col("doc_id") % refMod === 0, 1L).otherwise(0L))
          .as("ct"))
    f.join(cnt, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("cq")).as("sum_cq"),
        sum(col("ct")).as("sum_ct"))
      .orderBy(col("doc_id"))
  }

  /** T22 — DSIR IMPORTANCE LOG-WEIGHT per document: the add-one
    * smoothed bag-of-ngrams log-likelihood ratio
    * `Σ_f ln((ct(f)+1)/(Tt+V)) − ln((cq(f)+1)/(Tq+V))` of the target
    * model over the raw model — the score DSIR resamples by to tilt a
    * 100 TB crawl toward a target domain. High = looks like the
    * target; low = generic crawl. A pipeline thresholds or
    * Gumbel-top-k's this column; both are order-statistics on the
    * deterministic weight, so the weight itself is the operator.
    *
    * Determinism at any partition count (the [[lmPerplexity]]
    * contract): each per-feature term enters the doc sum as its
    * DECIMAL-scale-12 unscaled long, so the shuffled aggregation is
    * an exact integer sum; the global shift `n·(ln(Tq+V) − ln(Tt+V))`
    * applies once per doc in a fixed-order typed map. Overflow bound:
    * the terms are ONE-SIDED — ct(f) ≤ cq(f) always (the target is a
    * subset of the corpus), so every term is ≤ 0 and ≥ −ln(cq+1) ≥
    * −ln(Tq+1) — hence |Σ| ≤ (2n−1)·ln(Tq+1)·10¹², which stays
    * < 2⁶³ through docs of ~1.5×10⁵ tokens (3×10⁵ features) against
    * corpora of Tq ≤ 10¹² features; longer docs must be pre-chunked
    * (the packedOf convention). Rows-only for the
    * driver oracle (JVM ln 1-ulp drift, the bm25 precedent);
    * SearchSpec pins the weights BIT-exactly against an in-driver
    * reference and the integer core is oracle-checked via
    * [[dsirDocStats]].
    */
  def dsirWeights(spark: SparkSession, sfDir: String,
      refMod: Int = 7): DataFrame = {
    require(refMod >= 2, s"refMod must be >= 2: $refMod")
    import spark.implicits._
    val f = featureStream(spark, sfDir)
    val cnt = f.groupBy(col("w"))
      .agg(count(lit(1)).as("cq"),
        sum(when(col("doc_id") % refMod === 0, 1L).otherwise(0L))
          .as("ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded scalar job: shared vocab size + both model totals
    // (fills the count-table cache as it aggregates; ContextCleaner
    // reclaims the cache once the frame is unreachable — the
    // lmPerplexity convention)
    val statRow = cnt.agg(count(lit(1)).as("v"),
      sum(col("cq")).as("tq"), sum(col("ct")).as("tt")).head()
    val vocab = statRow.getLong(0)
    require(vocab > 0, "empty corpus")
    val tq = statRow.getLong(1)
    val tt = statRow.getLong(2)
    require(tt > 0,
      s"target subset (doc_id % $refMod == 0) has no features")
    val shift = math.log(tq.toDouble + vocab.toDouble) -
      math.log(tt.toDouble + vocab.toDouble)
    // per-feature ln-ratio precomputed once per VOCAB entry (the
    // lmPerplexity trick): the corpus-sized join carries the dec12
    // long, never a typed boundary or a libm call per occurrence
    val term = cnt.select(col("w"), col("cq"), col("ct"))
      .as[(Long, Long, Long)]
      .map { case (w, q, t) =>
        (w, graft.functions.CentroidKernels.dec12Scaled(
          math.log(t.toDouble + 1.0) - math.log(q.toDouble + 1.0)))
      }
      .toDF("w", "l")
    f.join(term, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("l")).as("s"))
      .as[(Long, Long, Long)]
      // fixed-order final scalar in the typed layer (the lmPerplexity
      // codegen-drift note applies to ln here too)
      .map { case (id, n, s) =>
        (id, n, s.toDouble / 1e12 + n.toDouble * shift)
      }
      .toDF("doc_id", "n_feats", "dsir_logw")
      .orderBy(col("doc_id"))
  }

  /** T23 — DSIR SELECTION: the documents a pipeline KEEPS — taken in
    * DESCENDING importance-weight order until a token budget, the
    * deterministic τ→0 variant of DSIR's resampling step (pure
    * exploitation, no Gumbel noise — noise-free selection is what
    * makes a backfill reproduce the same corpus; a sampled variant
    * is a seeded perturbation of the same ranking). The crossing doc
    * is included — its token range STARTS inside the budget, the
    * [[graft.operators.CorpusOps.mixSources]] offset rule.
    *
    * Scale shape: the ranking is [[graft.plans.GlobalOrder
    * .withPrefixSum]] over `(weight DESC, doc_id)` — per-partition
    * partial sums + offset pass, never `sum() OVER (ORDER BY ...)`
    * whose unpartitioned window moves the corpus to one task. Ties
    * break by doc_id so the frontier is a total order. Rows-only for
    * the driver oracle (the weight is float-ordered; JVM-ln 1-ulp —
    * the dsir_weights precedent); SearchSpec pins the selected SET
    * exactly against the in-driver reference ranking.
    */
  def dsirSelect(spark: SparkSession, sfDir: String,
      budgetTokens: Long = 20000L, refMod: Int = 7): DataFrame =
    dsirSelectFromWeights(documents(spark, sfDir),
      dsirWeights(spark, sfDir, refMod), budgetTokens)

  /** [[dsirSelect]] from a MATERIALIZED `(doc_id, dsir_logw)` weight
    * frame — the shared-derivation entry point (the
    * [[Clusters.dedupApplyFromPairs]] convention): the standalone
    * query re-derives the full two-model weight pass per call (its
    * honest benchmark contract), but a pipeline selecting several
    * budgets — or a deterministic AND a sampled corpus — from one
    * scoring run should `localCheckpoint` the weight frame once and
    * feed it here. `docs` supplies the token counts (doc_id, text).
    */
  def dsirSelectFromWeights(docs: DataFrame, weights: DataFrame,
      budgetTokens: Long = 20000L): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    dsirSelectFromWeightsCounted(
      docs.select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens")),
      weights, budgetTokens)
  }

  /** [[dsirSelectFromWeights]] with a pluggable `(doc_id, n_tokens)`
    * counts frame (the [[CorpusOps.packSequencesCounted]] convention
    * — [[Bpe.bpeCounts]] budgets by mined subwords instead of
    * whitespace tokens).
    */
  def dsirSelectFromWeightsCounted(counts: DataFrame,
      weights: DataFrame, budgetTokens: Long = 20000L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0: $budgetTokens")
    val w = weights.select(col("doc_id"), col("dsir_logw"))
    graft.plans.GlobalOrder.withPrefixSum(w.join(counts, Seq("doc_id")),
        Seq(col("dsir_logw").desc, col("doc_id")), "n_tokens", "cum")
      .filter(col("cum") - col("n_tokens") < budgetTokens)
      .select(col("doc_id"), col("n_tokens"), col("dsir_logw"))
      .orderBy(col("doc_id"))
  }

  /** The seeded standard-Gumbel variate of one document: a pure
    * function of (seed, doc_id) — splitmix64 finalizer → uniform in
    * (0, 1) → `−ln(−ln(u))` — so the perturbation is reproducible at
    * any partition count and across backfills (no RNG state, the
    * md5-ordering convention of [[CorpusOps.mixSources]]).
    */
  private[graft] def gumbelOf(seed: Long, id: Long): Double = {
    var h = (seed ^ id) + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h = h ^ (h >>> 31)
    // 53-bit mantissa → u ∈ (0, 1): the +0.5 offset keeps u strictly
    // inside the open interval, so both ln's are finite
    val u = ((h >>> 11).toDouble + 0.5) / (1L << 53).toDouble
    -math.log(-math.log(u))
  }

  /** T23b — SAMPLED DSIR selection: the resampling step the DSIR
    * paper actually performs (Xie et al. §2: sample without
    * replacement with probability ∝ exp(logw/τ)), via the Gumbel
    * top-k trick — rank documents by `logw + τ·G(seed, doc_id)` with
    * per-doc seeded standard-Gumbel noise and take the budget prefix
    * of that ranking. Ranking by `logw + τ·G` IS sampling without
    * replacement from softmax(logw/τ) (Vieira 2014 / Kool et al.
    * 2019), and the formulation makes the two contracts literal:
    * τ = 0 RECOVERS [[dsirSelect]] exactly (noise term vanishes,
    * doc_id tie-break and all — SearchSpec pins the set equality),
    * and a fixed seed literal makes the sample a deterministic
    * artifact a backfill reproduces bit-for-bit.
    *
    * Scale shape: identical to [[dsirSelect]] — the noise is one
    * pure-function typed map over the weight frame (no RNG state, no
    * shuffle added), then the same GlobalOrder prefix-sum ranking.
    * Rows-only for the driver oracle (float-ordered ranking, the
    * dsir_select precedent); SearchSpec pins reproducibility, the
    * τ→0 recovery, and the tilt (sampled selections still prefer
    * high-weight docs).
    */
  def dsirSelectSampled(spark: SparkSession, sfDir: String,
      budgetTokens: Long = 20000L, refMod: Int = 7,
      tau: Double = 1.0, seed: Long = 42L): DataFrame =
    dsirSelectSampledFromWeights(documents(spark, sfDir),
      dsirWeights(spark, sfDir, refMod), budgetTokens, tau, seed)

  /** [[dsirSelectSampled]] from a materialized weight frame (the
    * shared-derivation entry point — one weight pass can feed the
    * deterministic selection and any number of seeded samples).
    */
  def dsirSelectSampledFromWeights(docs: DataFrame, weights: DataFrame,
      budgetTokens: Long = 20000L, tau: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0: $budgetTokens")
    require(tau >= 0.0 && java.lang.Double.isFinite(tau),
      s"tau must be finite and >= 0: $tau")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions.tokenCount
    // the perturbed key in a typed map: deterministic per (seed, id),
    // and kept out of Catalyst arithmetic on purpose — splitmix64
    // needs wrapping long multiplies, which ANSI-mode column exprs
    // reject
    val perturbed = weights.select(col("doc_id"), col("dsir_logw"))
      .as[(Long, Double)]
      .map { case (id, w) => (id, w, w + tau * gumbelOf(seed, id)) }
      .toDF("doc_id", "dsir_logw", "gkey")
    val toks = docs
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.plans.GlobalOrder.withPrefixSum(
        perturbed.join(toks, Seq("doc_id")),
        Seq(col("gkey").desc, col("doc_id")), "n_tokens", "cum")
      .filter(col("cum") - col("n_tokens") < budgetTokens)
      .select(col("doc_id"), col("n_tokens"), col("dsir_logw"),
        col("gkey"))
      .orderBy(col("doc_id"))
  }

  /** The mined DSIR models in stream-scoring form: sorted feature
    * keys with both counts (binary-search lookup), plus the FULL
    * corpus scalars (smoothing denominators are corpus-global even
    * when the frontier is frequency-floored). Serializable for
    * broadcast.
    */
  final case class DsirModel(keys: Array[Long], ct: Array[Long],
      cq: Array[Long], vocab: Long, tq: Long, tt: Long) {
    def shift: Double = math.log(tq.toDouble + vocab.toDouble) -
      math.log(tt.toDouble + vocab.toDouble)
  }

  /** Bounded export of the DSIR count models for STREAM-side scoring
    * (the stream–static split: models mined offline over the
    * historical corpus, arrivals scored online). `minCount` floors
    * the frontier by corpus frequency — features below it score as
    * unseen (ct=cq=0 → ln-ratio 0, shift-only), the standard
    * frontier truncation; at the default 1 the frontier is the full
    * vocabulary and stream scores equal the batch [[dsirWeights]]
    * BIT-exactly on docs drawn from the modeled corpus
    * (StreamingSpec pins this). The driver collect is budgeted by
    * `maxVocab` and FAILS LOUDLY past it (the bannedLineFrontier
    * contract; ~24 bytes per feature — the default 10M ≈ 240 MB):
    * raise `minCount` to shrink the frontier, or raise the budget
    * knowingly.
    */
  def dsirModel(spark: SparkSession, sfDir: String, refMod: Int = 7,
      minCount: Long = 1, maxVocab: Int = 10000000): DsirModel = {
    require(refMod >= 2, s"refMod must be >= 2: $refMod")
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    val f = featureStream(spark, sfDir)
    val cnt = f.groupBy(col("w"))
      .agg(count(lit(1)).as("cq"),
        sum(when(col("doc_id") % refMod === 0, 1L).otherwise(0L))
          .as("ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val statRow = cnt.agg(count(lit(1)).as("v"),
        sum(col("cq")).as("tq"), sum(col("ct")).as("tt")).head()
      val vocab = statRow.getLong(0)
      require(vocab > 0, "empty corpus")
      // no cluster-side orderBy before the bounded collect: every
      // frontier row must fit the budget anyway (the require below),
      // so sorting distributes nothing the driver can't do itself —
      // a TakeOrdered at k=maxVocab builds a 10M-entry heap PER
      // PARTITION just to feed a collect that would fail loudly
      // regardless
      val rows = cnt.filter(col("cq") >= minCount)
        .select(col("w"), col("ct"), col("cq"))
        .limit(maxVocab + 1)
        .collect()
      require(rows.length <= maxVocab,
        s"DSIR model frontier exceeds maxVocab=$maxVocab (~24 bytes per " +
          "feature on the driver and in the broadcast) — raise minCount " +
          "to floor the frontier by corpus frequency, or raise the " +
          "budget knowingly")
      val sorted = rows.sortBy(_.getLong(0))
      DsirModel(sorted.map(_.getLong(0)), sorted.map(_.getLong(1)),
        sorted.map(_.getLong(2)), vocab, statRow.getLong(1),
        statRow.getLong(2))
    } finally { cnt.unpersist(); () }
  }

  /** The positional bigram stream `(doc_id, bg, p, w2)` as FNV64
    * hashes of the bigram string, its context (left) token, and its
    * predicted (right) token — the [[featureStream]] convention
    * (8-byte keys shuffle, strings never do). The bigram joins on a
    * single 0x20 so the SQL oracle's `concat_ws(' ', ...)` builds
    * identical bytes; tokens contain no whitespace by construction,
    * so `split_part(bg, ' ', 1)` recovers the context token exactly.
    * Docs of fewer than two tokens emit nothing (no positions to
    * condition on) — consistent with the oracle's empty
    * `range(1, len)` list.
    */
  private def bigramStream(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val tk = CorpusOps.duckTokens(t)
        (0 until tk.length - 1).iterator.map { j =>
          (id, CorpusOps.lineHash(tk(j) + " " + tk(j + 1)),
            CorpusOps.lineHash(tk(j)), CorpusOps.lineHash(tk(j + 1)))
        }
      }
      .toDF("doc_id", "bg", "p", "w2")
  }

  /** T32a — bigram-LM EVIDENCE per document, integer-exact (the
    * [[lmDocStats]] convention, one model order up): for each doc
    * with ≥ 2 tokens, its bigram count, the sum of corpus-wide counts
    * of its bigrams, the sum of corpus-wide counts of their CONTEXT
    * tokens (the conditional denominator the order-2 model divides
    * by), and the count of its rarest bigram. `min_c2 = 1` flags a
    * corpus-unique transition; a large `sum_c2/sum_ctx` ratio means
    * the doc's transitions are predictable given their contexts — the
    * integer signals the interpolated score is built from.
    *
    * Scale shape: the model join runs MODEL-side first (bigram-vocab
    * rows join the unigram table once) so the corpus-sized stream
    * joins exactly one table; all keys are 8-byte hashes; two corpus
    * scans (bigram-count pass + score pass), inherent to scoring
    * against corpus-global statistics.
    */
  def lm2DocStats(spark: SparkSession, sfDir: String): DataFrame = {
    val bgs = bigramStream(spark, sfDir)
    val ucnt = tokenStream(spark, sfDir).groupBy(col("w"))
      .agg(count(lit(1)).as("c1"))
    // min(p) is deterministic and exact: p is a pure function of bg
    // (up to the documented FNV64 collision bound)
    val bcnt = bgs.groupBy(col("bg"))
      .agg(count(lit(1)).as("c2"), min(col("p")).as("p"))
    val model = bcnt
      .join(ucnt.select(col("w").as("p"), col("c1").as("c1p")), Seq("p"))
      .select(col("bg"), col("c2"), col("c1p"))
    bgs.select(col("doc_id"), col("bg")).join(model, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("c2")).as("sum_c2"),
        sum(col("c1p")).as("sum_ctx"), min(col("c2")).as("min_c2"))
      .orderBy(col("doc_id"))
  }

  /** T32 — per-document PERPLEXITY under a Jelinek–Mercer
    * INTERPOLATED BIGRAM LM trained on the corpus itself — the
    * order-2 upgrade of [[lmPerplexity]] (real perplexity filters —
    * CCNet's KenLM stage — score with higher-order models because
    * unigram perplexity cannot see scrambled word order):
    * `P(w|p) = λ·(c2(p,w)+1)/(c1(p)+V) + (1−λ)·(c1(w)+1)/(T+V)`,
    * `ppl2(d) = exp(−(1/n)·Σ ln P)` over the doc's n bigram
    * positions. Repetitive/boilerplate text scores low; shuffled or
    * rare-transition text scores high even when its unigram mix is
    * ordinary (Lm2Spec pins exactly this separation).
    *
    * Determinism at any partition count (the [[lmPerplexity]]
    * contract): every count entering a term is an exact integer, the
    * term is ONE fixed-shape float expression per bigram row, and it
    * enters the per-doc sum as its DECIMAL-scale-12 unscaled long —
    * an order-free integer aggregation; only the final
    * `exp(−s/10¹²/n)` runs in floats, in a typed map (Catalyst's exp
    * codegen drifts 1 ulp from Math.exp on a tail of inputs).
    * Overflow bound: `P ≥ (1−λ)/(T+V)` ⇒ |term| ≤ ln(T+V) − ln(1−λ),
    * so |Σ| ≤ n·(ln(T+V)+1.39)·10¹² at the default λ — safe through
    * docs of ~3×10⁵ tokens against corpora of T ≤ 10¹² tokens; longer
    * docs must be pre-chunked (the dsirWeights convention). Rows-only
    * for the driver oracle (JVM ln/exp 1-ulp drift, the bm25
    * precedent); Lm2Spec pins ppl2 BIT-exactly against an in-driver
    * reference, and the integer core is oracle-checked via
    * [[lm2DocStats]].
    */
  def lm2Perplexity(spark: SparkSession, sfDir: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda >= 0.0 && lambda < 1.0,
      s"lambda must be in [0, 1) — the unigram floor keeps P > 0: $lambda")
    import spark.implicits._
    val bgs = bigramStream(spark, sfDir)
    val ucnt = tokenStream(spark, sfDir).groupBy(col("w"))
      .agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded scalar job: unigram vocab + total tokens (fills the
    // unigram cache both model joins below read — the lmPerplexity
    // ContextCleaner convention)
    val statRow = ucnt.agg(count(lit(1)).as("v"), sum(col("c1")).as("t"))
      .head()
    val vocab = statRow.getLong(0)
    require(vocab > 0, "empty corpus")
    val total = statRow.getLong(1)
    val bcnt = bgs.groupBy(col("bg"))
      .agg(count(lit(1)).as("c2"), min(col("p")).as("p"),
        min(col("w2")).as("w2"))
    // per-transition term precomputed once per BIGRAM-VOCAB entry
    // (the lmPerplexity trick): the corpus-sized join carries the
    // dec12 long, never a typed boundary or a libm call per position
    val model = bcnt
      .join(ucnt.select(col("w").as("p"), col("c1").as("c1p")), Seq("p"))
      .join(ucnt.select(col("w").as("w2"), col("c1").as("c1w")), Seq("w2"))
      .select(col("bg"), col("c2"), col("c1p"), col("c1w"))
      .as[(Long, Long, Long, Long)]
      .map { case (bg, c2, c1p, c1w) =>
        (bg, graft.functions.CentroidKernels.dec12Scaled(math.log(
          lambda * (c2.toDouble + 1.0) /
            (c1p.toDouble + vocab.toDouble) +
          (1.0 - lambda) * (c1w.toDouble + 1.0) /
            (total.toDouble + vocab.toDouble))))
      }
      .toDF("bg", "l")
    bgs.select(col("doc_id"), col("bg")).join(model, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("l")).as("s"))
      .as[(Long, Long, Long)]
      .map { case (id, n, s) =>
        (id, n, math.exp(-(s.toDouble / 1e12) / n.toDouble))
      }
      .toDF("doc_id", "n_bigrams", "ppl2")
      .orderBy(col("doc_id"))
  }

  /** The mined bigram-LM tables in stream-scoring form (the
    * [[DsirModel]] convention): sorted unigram and bigram hash keys
    * with counts (binary-search lookup) plus the corpus scalars.
    * Serializable for broadcast.
    */
  final case class Lm2Model(uKeys: Array[Long], uCnt: Array[Long],
      bKeys: Array[Long], bCnt: Array[Long], vocab: Long, total: Long)

  /** Bounded export of the bigram-LM count tables for STREAM-side
    * perplexity scoring (the [[dsirModel]] stream–static split: the
    * model mined offline, arrivals scored online). `minCount` floors
    * BOTH tables by corpus frequency — floored entries look up as 0
    * and the add-one smoothing absorbs them, the standard frontier
    * truncation; at the default 1 the frontier is complete and stream
    * scores equal the batch [[lm2Perplexity]] BIT-exactly on docs
    * drawn from the modeled corpus (StreamingSpec pins it). The
    * driver collect is budgeted by `maxVocab` TOTAL rows across both
    * tables and FAILS LOUDLY past it (~16 bytes per row).
    */
  def lm2Model(spark: SparkSession, sfDir: String, minCount: Long = 1,
      maxVocab: Int = 10000000): Lm2Model = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    val ucnt = tokenStream(spark, sfDir).groupBy(col("w"))
      .agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val statRow = ucnt.agg(count(lit(1)).as("v"),
        sum(col("c1")).as("t")).head()
      val vocab = statRow.getLong(0)
      require(vocab > 0, "empty corpus")
      // no cluster-side orderBy before the bounded collects — the
      // dsirModel reasoning
      val uRows = ucnt.filter(col("c1") >= minCount)
        .limit(maxVocab + 1).collect()
      val bRows = bigramStream(spark, sfDir).groupBy(col("bg"))
        .agg(count(lit(1)).as("c2"))
        .filter(col("c2") >= minCount)
        .limit(maxVocab + 1).collect()
      require(uRows.length + bRows.length <= maxVocab,
        s"LM model frontier exceeds maxVocab=$maxVocab total rows " +
          s"(${uRows.length} unigrams + ${bRows.length} bigrams) — " +
          "raise minCount to floor the frontier, or raise the budget " +
          "knowingly")
      val u = uRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val b = bRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      Lm2Model(u.map(_._1), u.map(_._2), b.map(_._1), b.map(_._2),
        vocab, statRow.getLong(1))
    } finally { ucnt.unpersist(); () }
  }

  /** T32b — PERPLEXITY-BAND SELECTION: the CCNet gate — rank every
    * document by LM perplexity and keep one equal-population band
    * (CCNet trains on the head/middle split and discards the tail;
    * the default keeps the MIDDLE tertile: not boilerplate-degenerate
    * (head), not noise (tail)). Banding is by exact GLOBAL RANK, not
    * approximate quantiles — band populations differ by at most one
    * doc and a backfill reproduces the same split bit-for-bit.
    */
  def pplSelect(spark: SparkSession, sfDir: String, nBands: Int = 3,
      keepBand: Int = 1): DataFrame =
    pplSelectFromScores(lm2Perplexity(spark, sfDir), "ppl2",
      nBands, keepBand)

  /** [[pplSelect]] over an arbitrary materialized score frame — the
    * shared-derivation entry point (the [[dsirSelectFromWeights]]
    * convention), with the score column pluggable so the order-1
    * [[lmPerplexity]] or any model score gates the same way. The
    * scores are `localCheckpoint`ed here: banding needs the corpus
    * COUNT and the ranked pass over the same frame, and without the
    * checkpoint the upstream scoring pipeline would run twice
    * (doc_id + score is 16 bytes/doc on executor storage — bounded,
    * the pipeline_full sharing contract).
    *
    * Scale shape: rank comes from [[graft.plans.GlobalOrder
    * .withPrefixSum]] over ones — per-partition partials + offset
    * pass, never an unpartitioned `row_number()` window; the band is
    * pure integer arithmetic `(rank−1)·nBands div N`. Rows-only for
    * the driver oracle (float-ordered ranking, the dsir_select
    * precedent); Lm2Spec pins the selected SET against the in-driver
    * reference ranking and the ≤1-doc band-population balance.
    */
  /** T32c — PER-LANGUAGE PERPLEXITY BANDS: the split CCNet actually
    * ships (Wenzek et al. 2020 §4.3 — each LANGUAGE is ranked and
    * cut into head/middle/tail independently). A single global cut
    * ([[pplSelect]]) judges every language on the dominant one's
    * perplexity scale; LM perplexities are NOT comparable across
    * languages (different vocabularies, different entropy), so the
    * multilingual gate must band within language.
    *
    * Scale shape: rank comes from
    * [[graft.plans.GlobalOrder.withPrefixSumKeyed]] — per-partition
    * per-key partials + one offset pass, never a per-language window
    * (one language is terabytes on ONE task at 100 TB); per-language
    * counts are a #langs-row aggregate broadcast back; the band is
    * pure integer arithmetic. The lang join moves (doc_id, ppl2)
    * 16-byte rows, never text. Rows-only like T32b (float-ordered
    * ranking); Lm2Spec pins the per-language selected sets against
    * the in-driver reference and the ≤1-doc per-language balance.
    */
  def pplSelectByLang(spark: SparkSession, sfDir: String,
      nBands: Int = 3, keepBand: Int = 1): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2: $nBands")
    require(keepBand >= 0 && keepBand < nBands,
      s"keepBand must be in [0, $nBands): $keepBand")
    val s = lm2Perplexity(spark, sfDir)
      .select(col("doc_id"), col("ppl2"))
    val withLang = s.join(
        documents(spark, sfDir).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      // count + ranked pass share one scoring run (the Pipeline
      // fault-tolerance contract, SURVEY §5; reliable under the
      // Lineage checkpoint knob)
      .transform(graft.plans.Lineage.truncate(_))
    val counts = withLang.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    graft.plans.GlobalOrder.withPrefixSumKeyed(
        withLang.withColumn("one", lit(1L)), "lang",
        Seq(col("ppl2"), col("doc_id")), "one", "rank")
      .join(broadcast(counts), Seq("lang"))
      .filter(expr(s"(rank - 1L) * ${nBands}L div n_lang") ===
        keepBand)
      .select(col("doc_id"), col("lang"), col("ppl2"))
      .orderBy(col("doc_id"))
  }

  def pplSelectFromScores(scores: DataFrame, scoreCol: String = "ppl2",
      nBands: Int = 3, keepBand: Int = 1): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2: $nBands")
    require(keepBand >= 0 && keepBand < nBands,
      s"keepBand must be in [0, $nBands): $keepBand")
    val s = graft.plans.Lineage.truncate(
      scores.select(col("doc_id"), col(scoreCol)))
    val n = s.count()
    require(n > 0, "empty score frame")
    graft.plans.GlobalOrder.withPrefixSum(
        s.withColumn("one", lit(1L)),
        Seq(col(scoreCol), col("doc_id")), "one", "rank")
      .filter(expr(s"(rank - 1L) * ${nBands}L div ${n}L") === keepBand)
      .select(col("doc_id"), col(scoreCol))
      .orderBy(col("doc_id"))
  }
}

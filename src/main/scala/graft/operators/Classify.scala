package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** T27 — multinomial Naive Bayes over class-conditional word counts:
  * the one-pass, closed-form member of the model-scored curation
  * family (T15 scores with fixed heuristic weights; DSIR scores a
  * target/raw likelihood ratio; NB learns a per-CLASS model and
  * assigns each doc the argmax class). The standing self-train
  * convention applies: the corpus' own `lang` column is the label —
  * a pipeline would pass its labeled seed set and classify a
  * different corpus (the composable `*Docs` cores take any
  * `(doc_id, lang, text)` frame).
  *
  * Why NB and not logistic regression: the fastText-style curation
  * classifiers (CCNet, the GPT-3 quality filter) are iterative fits;
  * multinomial NB is the ONE-GROUPBY closed form — per-class counts
  * ARE the model, so training is a single partial-agged shuffle and
  * the whole fit is oracle-checkable. At 100 TB that is the
  * difference between a pass over the corpus and a training loop.
  *
  * Scale shape: tokens shuffle once as 8-byte FNV64 hashes to build
  * the `(lang, w) → c` model table; scoring joins the corpus token
  * stream against the model on `w` (the lmDocStats join shape — the
  * stream fans out only by the ≤ `maxClasses` classes that contain
  * the token); per-class scalars are one bounded collect folded in as
  * a broadcast local frame. Nothing else collects.
  */
object Classify {

  /** Classes are a cross-join multiplier on the zero-filled output
    * and the model fan-out — bound them loudly (a label column with
    * runaway cardinality is a bug, not a workload).
    */
  private val maxClasses = 1024

  /** The labeled token stream `(doc_id, lang, w)` — FNV64-hashed
    * tokens, the [[Search]] convention (strings never shuffle).
    */
  private def labeledTokens(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, t) =>
        CorpusOps.duckTokens(t).map(w => (id, lang, CorpusOps.lineHash(w)))
      }
      .toDF("doc_id", "lang", "w")
  }

  def nbDocStats(spark: SparkSession, sfDir: String): DataFrame =
    nbDocStatsDocs(documents(spark, sfDir))

  /** T27a — NB EVIDENCE per (document, class), integer-exact (the
    * lmDocStats convention): for every doc and every class, how many
    * of the doc's token occurrences appear in that class's training
    * counts (`n_matched`) and the sum of those class-conditional
    * counts (`sum_c`) — the integer signals the smoothed NB score is
    * built from. Zero-filled: every (doc, class) pair is present, so
    * the frame IS the dense score matrix skeleton. Hash-checked
    * against the DuckDB oracle.
    */
  def nbDocStatsDocs(docs: DataFrame): DataFrame = {
    val tok = labeledTokens(docs)
    val cls = tok.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    val matched = tok.select(col("doc_id"), col("w"))
      .join(cls, Seq("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val langs = docs.select(col("lang")).distinct()
    val pairs = docs.select(col("doc_id")).crossJoin(broadcast(langs))
    pairs.join(matched, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n"), lit(0L)).as("n_matched"),
        coalesce(col("s"), lit(0L)).as("sum_c"))
      .orderBy(col("doc_id"), col("lang"))
  }

  def nbClassify(spark: SparkSession, sfDir: String): DataFrame =
    nbClassifyDocs(documents(spark, sfDir))

  /** T27 — NB CLASSIFICATION: assign each doc
    * `argmax_s [ ln(N_s/N) + Σ_w ln((c_s(w)+1)/(T_s+V)) ]` — add-one
    * smoothed multinomial NB with the corpus-global vocabulary V.
    * The sum decomposes as
    * `Σ ln(c_s(w)+1) − n_d·ln(T_s+V) + ln(N_s/N)`, and unmatched
    * tokens contribute `ln(0+1) = 0` — so the Σ term needs only the
    * inner-joined matches, exactly the [[nbDocStatsDocs]] join.
    *
    * EXACT argmax at any partition count: every ln enters as its
    * DECIMAL-scale-12 unscaled long (per-match terms summed
    * order-free; the per-class scalars `dec12(ln(T_s+V))`,
    * `dec12(ln(N_s/N))` computed ONCE driver-side and folded in as a
    * broadcast local frame), so the per-(doc, class) score is one
    * exact integer and the argmax is integer ordering — no float
    * comparison anywhere in the decision. Ties (identical scaled
    * scores) break to the lexicographically LARGEST class, a total
    * order. Overflow: |score| ≤ n_d·ln(T_s+V)·10¹² plus lower-order
    * terms — safe through docs of ~3×10⁵ tokens against classes of
    * T_s ≤ 10¹² tokens (the dsirWeights convention).
    *
    * Rows-only for the driver oracle (the reported score is the
    * scaled float; JVM-ln 1-ulp drift — and on near-tied classes a
    * 1-ulp drift could even flip a cross-engine argmax); NbSpec pins
    * scores AND predictions bit-exactly against an in-driver
    * reference, planted-class recovery, and the integer core is
    * hash-checked via [[nbDocStats]].
    */
  def nbClassifyDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.CentroidKernels.dec12Scaled
    val tok = labeledTokens(docs)
    val cls = tok.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded stats job: per-class token totals + doc priors
    // (fills the model cache as it aggregates), plus the shared-vocab
    // scalar off the cached model
    val stats = cls.groupBy(col("lang")).agg(sum(col("c")).as("ts"))
      .join(docs.groupBy(col("lang")).agg(count(lit(1)).as("ns")),
        Seq("lang"))
      .collect()
    require(stats.nonEmpty, "empty corpus")
    require(stats.length <= maxClasses,
      s"${stats.length} classes exceed maxClasses=$maxClasses — the " +
        "label column has runaway cardinality (zero-fill and model " +
        "fan-out scale with it); pass a corpus with a real label")
    val vocab = cls.agg(count_distinct(col("w"))).head().getLong(0)
    val nDocs = stats.map(_.getLong(2)).sum
    // per-class scalars as dec12 longs, JVM libm once on the driver
    val classFrame = stats.toSeq.map { r =>
      (r.getString(0),
        dec12Scaled(math.log(r.getLong(1).toDouble + vocab.toDouble)),
        dec12Scaled(math.log(r.getLong(2).toDouble / nDocs.toDouble)))
    }.toDF("lang", "ln_denom", "ln_prior")
    // per-match term precomputed once per (class, token) MODEL entry
    // (the lmPerplexity trick — JVM libm in a model-sized typed map):
    // the corpus-sized join carries the dec12 long, never a typed
    // boundary or a libm call per token occurrence
    val term = cls.select(col("lang"), col("w"), col("c"))
      .as[(String, Long, Long)]
      .map { case (lang, w, c) =>
        (lang, w, dec12Scaled(math.log(c.toDouble + 1.0)))
      }
      .toDF("lang", "w", "l")
    val suml = tok.select(col("doc_id"), col("w"))
      .join(term, Seq("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("l")).as("suml"))
    val nTok = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"))
    docs.select(col("doc_id")).crossJoin(broadcast(classFrame))
      .join(suml, Seq("doc_id", "lang"), "left")
      .join(nTok, Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        (coalesce(col("suml"), lit(0L)) -
          col("n_tokens") * col("ln_denom") + col("ln_prior"))
          .as("score_scaled"))
      .groupBy(col("doc_id"))
      // integer argmax: max(struct) orders by score_scaled then lang
      // — ties go to the lexicographically largest class
      .agg(max(struct(col("score_scaled"), col("lang"))).as("m"))
      .select(col("doc_id"), col("m.lang").as("pred_lang"),
        (col("m.score_scaled").cast("double") / 1e12).as("score"))
      .orderBy(col("doc_id"))
  }

  /** The trained NB model in stream-scoring form (the
    * [[Search.DsirModel]] convention): classes in sorted label order,
    * each with its sorted feature keys + counts (binary-search
    * lookup) and its dec12-scaled smoothing scalars — computed ONCE
    * with the exact JVM op order the batch classifier uses, so stream
    * and batch scores are the same integers. Serializable for
    * broadcast.
    */
  final case class NbModel(langs: Array[String],
      keys: Array[Array[Long]], cnt: Array[Array[Long]],
      lnDenom: Array[Long], lnPrior: Array[Long])

  /** Bounded export of the NB model for STREAM-side classification
    * (the stream–static split: the model fit offline over the
    * labeled corpus, arrivals classified online). `minCount` floors
    * the per-class frontier by count — floored features score as
    * unmatched (`ln(0+1) = 0`), the same contribution batch gives
    * tokens absent from a class, so at the default 1 stream scores
    * equal [[nbClassifyDocs]] BIT-exactly on any document
    * (StreamingSpec pins it; matched-term semantics are identical
    * even off-corpus). The driver collect is budgeted by `maxVocab`
    * TOTAL (lang, w) rows and FAILS LOUDLY past it (the dsirModel
    * contract; ~24 bytes per row).
    */
  def nbModel(spark: SparkSession, sfDir: String, minCount: Long = 1,
      maxVocab: Int = 10000000): NbModel =
    fitModel(spark, sfDir, None, minCount, maxVocab)

  /** Fit AND persist in one pass: the model's exact integer
    * statistics written as ONE parquet table (the [[Bpe.saveModel]]
    * convention — the classifier is a shareable artifact a different
    * cluster loads and applies). Layout is typed rows: `kind` 0 =
    * per-(class, token) count (`lang, k`=hash, `v`=count), 1 =
    * per-class scalars (`lang, v`=token total, `v2`=doc count), 2 =
    * the global scalars (`v`=shared vocab, `v2`=total docs). The
    * dec12 smoothing scalars are NOT stored — fit and [[loadModel]]
    * both derive them from the integers in [[buildModel]], the single
    * place that op order lives, so a loaded model scores
    * bit-identically to the freshly fit one (NbSpec pins it).
    */
  def nbModelSaved(spark: SparkSession, sfDir: String, path: String,
      minCount: Long = 1, maxVocab: Int = 10000000): NbModel =
    fitModel(spark, sfDir, Some(path), minCount, maxVocab)

  private def fitModel(spark: SparkSession, sfDir: String,
      savePath: Option[String], minCount: Long,
      maxVocab: Int): NbModel = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    val docs = documents(spark, sfDir)
    val tok = labeledTokens(docs)
    val cls = tok.groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = cls.groupBy(col("lang")).agg(sum(col("c")).as("ts"))
        .join(docs.groupBy(col("lang")).agg(count(lit(1)).as("ns")),
          Seq("lang"))
        .collect()
      require(stats.nonEmpty, "empty corpus")
      require(stats.length <= maxClasses,
        s"${stats.length} classes exceed maxClasses=$maxClasses")
      val vocab = cls.agg(count_distinct(col("w"))).head().getLong(0)
      val nDocs = stats.map(_.getLong(2)).sum
      // no cluster-side orderBy before the bounded collect — the
      // dsirModel reasoning
      val rows = cls.filter(col("c") >= minCount)
        .select(col("lang"), col("w"), col("c"))
        .limit(maxVocab + 1)
        .collect()
      require(rows.length <= maxVocab,
        s"NB model frontier exceeds maxVocab=$maxVocab total (lang, " +
          "token) rows — raise minCount to floor the frontier, or " +
          "raise the budget knowingly")
      val countRows = rows.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
      val classRows = stats.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
      savePath.foreach { path =>
        import spark.implicits._
        (countRows.toIndexedSeq.map { case (l, k, v) => (0, l, k, v, 0L) } ++
          classRows.toIndexedSeq.map { case (l, ts, ns) => (1, l, 0L, ts, ns) } ++
          Seq((2, "", 0L, vocab, nDocs)))
          .toDF("kind", "lang", "k", "v", "v2")
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
      buildModel(countRows, classRows, vocab, nDocs)
    } finally { cls.unpersist(); () }
  }

  /** Load a model persisted by [[nbModelSaved]]. Refuses an
    * internally inconsistent artifact (missing global row, class
    * rows not covering the count rows, doc totals that do not sum) —
    * a truncated table must fail loudly rather than classify
    * differently. */
  def loadModel(spark: SparkSession, path: String): NbModel = {
    val rows = spark.read.parquet(path)
      .select(col("kind").cast("int"), col("lang"), col("k"),
        col("v"), col("v2"))
      .collect()
    val global = rows.filter(_.getInt(0) == 2)
    require(global.length == 1,
      s"NB artifact must carry exactly one global row, found " +
        s"${global.length}")
    val vocab = global.head.getLong(3)
    val nDocs = global.head.getLong(4)
    val classRows = rows.filter(_.getInt(0) == 1)
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    val countRows = rows.filter(_.getInt(0) == 0)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    require(classRows.nonEmpty, "NB artifact has no class rows")
    require(classRows.map(_._3).sum == nDocs,
      "NB artifact class doc counts do not sum to the global total")
    val known = classRows.map(_._1).toSet
    countRows.foreach { case (l, _, _) =>
      require(known(l), s"count row for unknown class '$l'") }
    buildModel(countRows, classRows, vocab, nDocs)
  }

  /** Assemble an [[NbModel]] from exact integer statistics — the
    * SINGLE place the dec12 smoothing scalars are derived, so fit,
    * fit-and-save, and load produce the same integers. */
  private def buildModel(countRows: Array[(String, Long, Long)],
      classRows: Array[(String, Long, Long)], vocab: Long,
      nDocs: Long): NbModel = {
    import graft.functions.CentroidKernels.dec12Scaled
    val langs = classRows.map(_._1).sorted
    val byLang = countRows.groupBy(_._1)
    val sortedPerLang = langs.map(l =>
      byLang.getOrElse(l, Array.empty).map(r => (r._2, r._3))
        .sortBy(_._1))
    val statByLang = classRows.map(r => r._1 -> ((r._2, r._3))).toMap
    NbModel(langs,
      sortedPerLang.map(_.map(_._1)), sortedPerLang.map(_.map(_._2)),
      langs.map(l => dec12Scaled(math.log(
        statByLang(l)._1.toDouble + vocab.toDouble))),
      langs.map(l => dec12Scaled(math.log(
        statByLang(l)._2.toDouble / nDocs.toDouble))))
  }
}

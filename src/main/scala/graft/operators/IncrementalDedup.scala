package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.HashFunctions._

/** D14/D15 — dedup of an INCREMENT against a PERSISTED corpus index
  * (SURVEY §2.3).
  *
  * The production shape of dedup at 100 TB is not "re-derive all
  * pairs over the full corpus every day": it is "screen today's
  * crawl against an index of everything already kept". This module
  * provides that path:
  *
  *   - [[buildIndex]]: one scan of the kept corpus → a parquet-able
  *     index table of (doc_id, fp, n_sh, sig) — the canonical md5
  *     fingerprint (exact identity) and the MinHash(k) signature
  *     (near identity). ~(16 + 8k) bytes per doc: at k=32 that is
  *     ≈ 280 B/doc, so a 25-billion-doc (100 TB text) corpus indexes
  *     in ~7 TB of ids+sketches — joinable; the TEXT never enters
  *     the screen.
  *   - [[screenExactDocs]]: per-increment-doc verdict via a
  *     fingerprint left join against the fp → min(doc_id) aggregate
  *     of the index. Exact SQL semantics → fully DuckDB-oracle-able
  *     (`dedup_incremental_exact`).
  *   - [[screenNearDocs]]: near-dup pairs (increment doc, indexed
  *     doc, estimated jaccard) via the same LSH banding as
  *     [[MinHashDedup.minhashPairs]], but ONE-SIDED: index rows
  *     collect into bounded band buckets (`maxBucket`, observed +
  *     dropped loudly like minhashPairs); increment rows stream-join
  *     the buckets. The estimate is signature agreement — the index
  *     stores no text, so the screen is codes-only by design (the PQ
  *     ADC philosophy): survivors that need exact verification are
  *     few and can re-join the kept corpus by id.
  *
  * Scale shape: shuffles carry (band, bsig) 16-byte keys plus k-long
  * signatures; Σ bucket² work is bounded by `maxBucket`; the
  * increment side is typically ≪ index, so AQE picks the join side.
  * Equivalence contract (IncrementalDedupSpec): on a corpus split
  * into (old = index, new = increment), `screenNearDocs` emits
  * exactly `minhashPairs(full)` restricted to straddling pairs, with
  * identical estimates, whenever no bucket cap is breached — the
  * incremental path loses nothing against the monolithic one.
  */
object IncrementalDedup {

  /** Increment membership for the registered sf queries: doc_id % 5
    * == 0 is "today's crawl", the rest is the indexed corpus.
    */
  private val SplitMod = 5

  private[graft] def oldDocs(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).filter(col("doc_id") % SplitMod =!= 0)

  private[graft] def newDocs(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).filter(col("doc_id") % SplitMod === 0)

  /** D14 — the index scan: one pass over the kept corpus. `sig` is
    * the MinHash(k) signature over 3-token shingle keys (the
    * minhashPairs sketch, identically parameterized so estimates are
    * comparable across the incremental and monolithic paths); docs
    * with no shingle identity (< 3 tokens) carry n_sh = 0 and are
    * exact-screened only.
    */
  def buildIndex(docs: DataFrame, k: Int = 32): DataFrame =
    docs
      // a null text has no fingerprint or shingle identity: exclude
      // the row from the index instead of letting it crash the
      // screens (the typed screen kernels deserialize n_sh as an
      // Int, and size(null) is null — one bad crawl record killed
      // the whole ingest job). The ingest recipes agree: a null-text
      // doc is absent from the index AND dropped by the gopher
      // keep===1 gate, so "the doc does not exist" is consistent
      // end-to-end (spec-pinned in PipelineSpec). The predicate is
      // scan-pushed — zero cost on clean corpora.
      .filter(col("text").isNotNull)
      .select(col("doc_id"), canonical_md5(col("text")).as("fp"),
        shingle_keys(col("text"), lit(""), 3).as("sh"))
      .select(col("doc_id"), col("fp"), size(col("sh")).as("n_sh"),
        minhash_keys(col("sh"), k).as("sig"))

  /** Persist an index built by [[buildIndex]]. Plain parquet — the
    * index is a distributed table, not a driver artifact: it is
    * never collected (unlike the bounded model exports of
    * Bpe/Classify), so there is no size budget to enforce here.
    */
  def saveIndex(docs: DataFrame, path: String, k: Int = 32): Unit =
    buildIndex(docs, k).write.mode("overwrite").parquet(path)

  /** Append an increment's rows to a persisted index — the daily
    * ingest loop closed: screen today's batch, keep the novel docs,
    * index them for tomorrow. Parquet append, no rewrite of the
    * existing index files; IncrementalDedupSpec pins screens against
    * an appended index bit-equal to screens against a full rebuild
    * (the index semantics are per-row, so append ≡ union).
    */
  def appendIndex(docs: DataFrame, path: String, k: Int = 32): Unit =
    buildIndex(docs, k).write.mode("append").parquet(path)

  /** Load a persisted index, refusing a table that does not carry
    * the index schema (the Bpe.loadModel "fail loudly" convention).
    */
  def loadIndex(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val need = Seq("doc_id", "fp", "n_sh", "sig")
    require(need.forall(df.columns.contains),
      s"not an IncrementalDedup index at $path: has " +
        df.columns.mkString("[", ",", "]") + s", needs $need")
    df.select(need.map(col): _*)
  }

  /** D14 — exact screen: one verdict row per increment doc.
    * `is_dup` = fingerprint already present in the index; `ref_id` =
    * the smallest indexed doc_id carrying it (null when novel). The
    * index side aggregates fp → min(id) BEFORE the join, so the join
    * key cardinality is distinct-fingerprints, duplicates in the
    * index never fan out, and a hot fingerprint (boilerplate page
    * kept once, crawled daily) costs one row.
    */
  def screenExactDocs(newBatch: DataFrame, index: DataFrame): DataFrame =
    screenExactSigs(
      // null text = the doc does not exist, UNIFORMLY across the
      // index and both screens: without this, a null crawl record
      // got a (doc_id, is_dup = 0) verdict here — "novel", admitted —
      // while the near screen and the index treated it as
      // nonexistent, and (being absent from the index) it would
      // re-screen as novel every day (the r18 review's finding)
      newBatch.filter(col("text").isNotNull)
        .select(col("doc_id"), canonical_md5(col("text")).as("fp")),
      index)

  /** [[screenExactDocs]] over PRE-COMPUTED increment fingerprints
    * (any frame carrying doc_id + fp, e.g. [[buildIndex]] output) —
    * the shared-derivation entry mirroring [[screenNearSigs]].
    */
  def screenExactSigs(newFps: DataFrame, index: DataFrame): DataFrame = {
    val refs = index.groupBy(col("fp")).agg(min(col("doc_id")).as("ref_id"))
    newFps
      .select(col("doc_id"), col("fp"))
      .join(refs, Seq("fp"), "left")
      .select(col("doc_id"),
        col("ref_id").isNotNull.cast("int").as("is_dup"), col("ref_id"))
      .orderBy(col("doc_id"))
  }

  /** D15 — near screen: (increment doc, indexed doc, est_jaccard)
    * for signature agreement ≥ `minEst`. Banding is the minhashPairs
    * scheme (bands × rows = k, bucket key = fold-hash of the band's
    * signature slice); agreement runs as an unboxed loop inside the
    * bucket flatMap, never as an interpreted HOF in a join condition.
    */
  def screenNearDocs(newBatch: DataFrame, index: DataFrame,
      k: Int = 32, bands: Int = 8, minEst: Double = 0.5,
      maxBucket: Int = 5000): DataFrame =
    screenNearSigs(
      newBatch
        // null text has no shingle identity — same exclusion as
        // [[buildIndex]] (a null n_sh crashes the typed banding
        // flatMap; the doc simply does not exist to the screen)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          shingle_keys(col("text"), lit(""), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n_sh"),
          minhash_keys(col("sh"), k).as("sig")),
      index, k, bands, minEst, maxBucket)

  /** [[screenNearDocs]] over PRE-COMPUTED increment signatures (an
    * index-shaped frame from [[buildIndex]]) — the shared-derivation
    * entry: one sketch pass feeds the exact screen, the near screen
    * and tomorrow's [[appendIndex]] (the dedupApplyFromPairs
    * convention).
    */
  def screenNearSigs(newSigs: DataFrame, index: DataFrame,
      k: Int = 32, bands: Int = 8, minEst: Double = 0.5,
      maxBucket: Int = 5000): DataFrame = {
    val spark = newSigs.sparkSession
    import spark.implicits._
    val rows = k / bands
    require(rows * bands == k, s"bands ($bands) must divide k ($k)")

    def banded(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("n_sh"), col("sig"))
      .as[(Long, Int, Seq[Long])]
      .flatMap { case (id, nSh, sig) =>
        if (nSh == 0) Seq.empty
        else (0 until bands).map { j =>
          var h = 1125899906842597L
          var i = j * rows
          while (i < (j + 1) * rows) { h = h * 31 + sig(i); i += 1 }
          (id, sig, j, h)
        }
      }
      .toDF("doc_id", "sig", "band", "bsig")

    // Index side: bounded bucket lists. The cap applies to INDEX
    // members only — the increment side streams — and trips the same
    // loud observe counter as minhashPairs.
    val buckets = banded(index)
      .groupBy(col("band"), col("bsig"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig"))))
        .as("members"))
      // NOTE: observe rows are ERASED by AQE when the FINAL result is
      // empty (AQEPropagateEmptyRelation drops the executed
      // CollectMetrics from the plan observedMetrics walks) — the
      // metric is best-effort on empty output; see the canonical
      // caveat + spec pin on Similarity.simJoinLsh.
      .observe("incremental_bucket_cap",
        sum(when(size(col("members")) > maxBucket, 1L).otherwise(0L))
          .as("dropped_buckets"))
      .filter(size(col("members")) <= maxBucket)

    banded(newSigs)
      .join(buckets, Seq("band", "bsig"))
      .select(col("doc_id"), col("sig"), col("members"))
      .as[(Long, Seq[Long], Seq[(Long, Seq[Long])])]
      .flatMap { case (newId, nSig, members) =>
        val ns = nSig.toArray
        val out = Seq.newBuilder[(Long, Long, Double)]
        members.foreach { case (oldId, oSig) =>
          var agree = 0; var c = 0
          while (c < ns.length) {
            if (ns(c) == oSig(c)) agree += 1
            c += 1
          }
          val est = agree.toDouble / k
          if (est >= minEst) out += ((newId, oldId, est))
        }
        out.result()
      }
      .toDF("doc_id", "ref_id", "est_jaccard")
      // the same pair collides in several bands with the same est —
      // one row per pair, the minhashPairs distinct
      .distinct()
      .orderBy(col("doc_id"), col("ref_id"))
  }

  /** D17 — EXACT-VERIFIED near screen: the [[screenNearSigs]] flags
    * re-verified through the D4 exact sorted-key jaccard, so a
    * keep/drop decision at the threshold boundary rides the true
    * jaccard instead of a k-minhash estimate (whose ±2σ at k=32 is
    * ≈ ±0.18 near j = 0.5 — wide enough to flip verdicts). Mirrors
    * how [[Dedup.jaccardPairsLsh]] verifies D2's candidates: take
    * candidates from a LOWER estimate band (threshold − 0.2, ≈ 2.3σ),
    * fetch the TEXT of flagged docs by id, and keep pairs whose exact
    * jaccard clears the threshold.
    *
    * Scale shape: both text fetches are LEFT SEMI joins against the
    * distinct flagged ids, so the shingle kernel and the verify join
    * are bounded by the FLAG volume, not the corpus — the corpus is
    * scanned (ids only survive pruning) but never re-sketched.
    * `cand` is consumed three times (two semi-joins + the verify
    * join), so it is localCheckpointed HERE: a non-materialized
    * candidate frame from the nondeterministic LSH screen could
    * otherwise show each consumer a different candidate set and
    * silently drop or mis-verify pairs. The checkpoint is pair-sized
    * (ids + one double), never text. FAULT TOLERANCE: unlike the
    * `share` sites this checkpoint is CORRECTNESS-bearing (one
    * candidate set, not a scan saving), so there is no recompute
    * fallback — cluster runs that need executor-loss retry-ability
    * should give Spark a reliable checkpoint dir; see the
    * [[graft.operators.Pipeline]] contract (SURVEY §5).
    *
    * Equivalence contract (IncrementalDedupSpec): on an old/new
    * corpus split this equals `minhashPairs(full, minEst =
    * threshold − 0.2).filter(jaccard ≥ threshold)` restricted to
    * straddling pairs — same pairs, same estimates, bit-identical
    * exact jaccard — whenever no bucket cap is breached.
    */
  def verifyNearPairs(cand0: DataFrame, newBatch: DataFrame,
      corpus: DataFrame, threshold: Double = 0.5): DataFrame = {
    val cand = graft.plans.Lineage.truncate(cand0)
    val newSets = newBatch
      .join(cand.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        shingle_keys(col("text"), lit(""), 3).as("sh_a"))
    val oldSets = corpus
      .join(cand.select(col("ref_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("ref_id"),
        shingle_keys(col("text"), lit(""), 3).as("sh_b"))
    val inter = sorted_intersect_count(col("sh_a"), col("sh_b"))
    cand.select(col("doc_id"), col("ref_id"), col("est_jaccard"))
      .join(newSets, Seq("doc_id"))
      .join(oldSets, Seq("ref_id"))
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("ref_id"), col("est_jaccard"),
        col("jaccard"))
      .orderBy(col("doc_id"), col("ref_id"))
  }

  /** Registered `dedup_incremental_verified` (rows-only; spec'd equal
    * to the monolithic exact-verified pair list restricted to
    * straddling pairs). [[verifyNearPairs]] localCheckpoints the
    * candidate frame itself, so the screen runs ONCE for its three
    * consumers (the Pipeline shared-derivation convention).
    */
  def incrementalNearVerified(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5): DataFrame = {
    val nd = newDocs(spark, sfDir)
    val od = oldDocs(spark, sfDir)
    val cand = screenNearDocs(nd, buildIndex(od),
      minEst = math.max(0.0, threshold - 0.2))
    verifyNearPairs(cand, nd, od, threshold)
  }

  /** Registered `dedup_index_build`: the oracle-checkable face of
    * [[buildIndex]] — fingerprint + shingle-identity count per
    * indexed doc (the signature itself is engine-specific; its
    * semantics are pinned by the screenNearDocs ≡ minhashPairs
    * equivalence spec, the dsir_doc_stats integer-core convention).
    */
  def indexBuildQuery(spark: SparkSession, sfDir: String): DataFrame =
    buildIndex(oldDocs(spark, sfDir))
      .select(col("doc_id"), col("fp"), col("n_sh"))
      .orderBy(col("doc_id"))

  /** Registered `dedup_incremental_exact` (hash-checked). */
  def incrementalExact(spark: SparkSession, sfDir: String): DataFrame =
    screenExactDocs(newDocs(spark, sfDir),
      buildIndex(oldDocs(spark, sfDir)))

  /** Registered `dedup_incremental` (rows-only; spec'd equivalent to
    * the monolithic minhashPairs restricted to straddling pairs).
    */
  def incrementalNear(spark: SparkSession, sfDir: String): DataFrame =
    screenNearDocs(newDocs(spark, sfDir),
      buildIndex(oldDocs(spark, sfDir)))
}

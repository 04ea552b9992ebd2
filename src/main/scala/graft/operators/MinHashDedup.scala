package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.HashFunctions._
import graft.functions.TextFunctions._

/** Sketch-based near-duplicate detection (SURVEY §2.3 D2/D3 + §2.5
  * T4's rolling hash).
  *
  * Scale shape (the whole point of MinHash-LSH): the only shuffles are
  * (a) explode+groupBy on (band, band-signature) — key cardinality ≈
  * corpus × bands, uniformly hashed, no skew — and (b) the verify
  * join on doc ids. Candidate pairs are generated strictly within
  * buckets, so cost is Σ bucket² instead of n²; everything upstream
  * is a projection with the sketch kernels inlined in codegen.
  */
object MinHashDedup {

  /** D2 — MinHash(k=32) + LSH(8 bands × 4 rows) candidate pairs with
    * signature-estimated and exact-verified Jaccard. Emits pairs with
    * est ≥ `minEst`; `jaccard` is the exact value computed only for
    * the candidates (the expensive step is bounded by bucket sizes).
    */
  def minhashPairs(spark: SparkSession, sfDir: String,
      k: Int = 32, bands: Int = 8, minEst: Double = 0.5,
      maxBucket: Int = 5000): DataFrame = {
    val rows = k / bands
    import spark.implicits._
    // shingle_keys + minhash_keys: the whole sketch path runs on
    // 64-bit shingle keys — no token arrays, no shingle strings (the
    // string chain was the dominant cost at the 100× probe, same
    // finding as Dedup.jaccardPairs). Keys are sorted distinct longs,
    // so exact verification is a merge-count, not array_intersect.
    val docs = documents(spark, sfDir)
      .select(col("doc_id"),
        shingle_keys(col("text"), lit(""), 3).as("sh"))
      .withColumn("sig", minhash_keys(col("sh"), k))

    // banding via typed flatMap (one signature evaluation per doc;
    // explode() would re-run the minhash kernel per band row — see
    // Dedup.jaccardPairs). Band bucket key = fold-hash of the band's
    // signature slice. Shingle-less docs (< 3 tokens) are skipped
    // HERE, inside the flatMap: they have no MinHash identity — all
    // of them share the sentinel signature and would collapse into
    // one quadratic bucket with est=1.0, jaccard=NaN. (A DataFrame
    // filter(size(sh)>0) would instead force sh to evaluate twice.)
    val banded = docs.select(col("doc_id"), size(col("sh")).as("n_sh"),
        col("sig"))
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

    // In-bucket pair generation via groupBy + flatMap, NOT a banded
    // self-join: the join form shuffles the signature arrays twice
    // and lets Catalyst push the est filter into the join condition,
    // where `aggregate(zip_with(...))` runs INTERPRETED per candidate
    // pair — measured wedging a 100× probe (≈80M candidate pairs of a
    // duplicate-heavy corpus on one skewed task). Here the signature
    // agreement runs as a tight unboxed loop inside the bucket, only
    // survivors (est ≥ minEst) reach the shuffle, and `maxBucket`
    // bounds a degenerate bucket exactly like simJoinLsh.
    val estimated = banded
      .groupBy(col("band"), col("bsig"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig"))))
        .as("members"))
      .filter(size(col("members")) > 1)
      // NOTE: observe rows are ERASED by AQE when the FINAL result is
      // empty (AQEPropagateEmptyRelation drops the executed
      // CollectMetrics from the plan observedMetrics walks) — the
      // metric is best-effort on empty output; see the canonical
      // caveat + spec pin on Similarity.simJoinLsh.
      .observe("minhash_bucket_cap",
        sum(when(size(col("members")) > maxBucket, 1L).otherwise(0L))
          .as("dropped_buckets"))
      .filter(size(col("members")) <= maxBucket)
      .select(col("members"))
      // identical member sets across bands (e.g. every band of an
      // exact-duplicate group) pair-generate once, not bands× — on a
      // duplicate-heavy corpus this is a bands-fold cut in pair work
      // for one extra shuffle of the (already shuffled) bucket lists
      .distinct()
      .as[Seq[(Long, Seq[Long])]]
      .flatMap { members =>
        val ids = members.map(_._1).toArray
        val sigs = members.map(_._2.toArray).toArray
        val n = ids.length
        val out = Seq.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val sa = sigs(i); val sb = sigs(j)
            var agree = 0; var c = 0
            while (c < sa.length) {
              if (sa(c) == sb(c)) agree += 1
              c += 1
            }
            val est = agree.toDouble / k
            if (est >= minEst) out += ((ids(i), ids(j), est))
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("doc_a", "doc_b", "est_jaccard")
      .distinct()

    // exact verification join — only for surviving candidates; the
    // sorted-key merge-count replaces array_intersect's per-row hash
    // set (27M candidate pairs at the 100× probe make this the
    // second-largest term after the bucket shuffle)
    val sets = docs.select(col("doc_id"), col("sh"))
    val inter = sorted_intersect_count(col("sh_a"), col("sh_b"))
    estimated
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** D3 — SimHash near-dup pairs: 64-bit signature, candidates =
    * equal 16-bit chunk (4 chunks → Hamming ≤ 3 guaranteed recall at
    * ≥ 1 exact chunk), verified by popcount of the XOR.
    */
  def simhashPairs(spark: SparkSession, sfDir: String,
      maxHamming: Int = 3, maxBucket: Int = 5000): DataFrame = {
    import spark.implicits._
    // simhash_text: one-pass byte kernel, no token string array
    // (identical output to simhash64(tokens(..)), prop-pinned)
    val docs = documents(spark, sfDir).select(col("doc_id"),
      simhash_text(col("text")).as("sig"))
    // chunking via flatMap for the same one-evaluation reason as the
    // minhash banding above.
    val chunked = docs.as[(Long, Long)]
      .flatMap { case (id, sig) =>
        (0 until 4).map(c => (id, sig, c, (sig >>> (c * 16)) & 0xffffL))
      }
      .toDF("doc_id", "sig", "chunk", "csig")

    // bucketed pair generation with popcount verify inside the
    // flatMap (same shape + rationale as minhashPairs above): only
    // pairs within hamming ≤ maxHamming ever reach a shuffle, and a
    // degenerate chunk bucket is capped, not quadratic.
    chunked
      .groupBy(col("chunk"), col("csig"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig"))))
        .as("members"))
      .filter(size(col("members")) > 1)
      // NOTE: observe rows are ERASED by AQE when the FINAL result is
      // empty (AQEPropagateEmptyRelation drops the executed
      // CollectMetrics from the plan observedMetrics walks) — the
      // metric is best-effort on empty output; see the canonical
      // caveat + spec pin on Similarity.simJoinLsh.
      .observe("simhash_bucket_cap",
        sum(when(size(col("members")) > maxBucket, 1L).otherwise(0L))
          .as("dropped_buckets"))
      .filter(size(col("members")) <= maxBucket)
      .select(col("members"))
      // identical member sets across bands (e.g. every band of an
      // exact-duplicate group) pair-generate once, not bands× — on a
      // duplicate-heavy corpus this is a bands-fold cut in pair work
      // for one extra shuffle of the (already shuffled) bucket lists
      .distinct()
      .as[Seq[(Long, Long)]]
      .flatMap { members =>
        val arr = members.toArray
        val out = Seq.newBuilder[(Long, Long, Int)]
        var i = 0
        while (i < arr.length) {
          var j = i + 1
          while (j < arr.length) {
            val h = java.lang.Long.bitCount(arr(i)._2 ^ arr(j)._2)
            if (h <= maxHamming) out += ((arr(i)._1, arr(j)._1, h))
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("doc_a", "doc_b", "hamming")
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** D6 — winnowing near-dup pairs: per-doc winnow sketch (k-gram
    * rolling hashes, windowed minima), inverted index on fingerprint,
    * pairs ranked by shared-fingerprint overlap ratio. Any shared
    * run of ≥ win+k-1 chars guarantees a shared fingerprint, so
    * copied passages surface even when global similarity is low —
    * the property MinHash (whole-set resemblance) can't give.
    */
  def winnowPairs(spark: SparkSession, sfDir: String,
      k: Int = 16, win: Int = 8, minOverlap: Double = 0.3,
      maxDf: Int = 100, minima: Int = 1): DataFrame = {
    import spark.implicits._
    // minima > 1 = multi-minima winnowing: a denser sketch that also
    // surfaces shared runs shorter than the win+k-1 single-min
    // guarantee, at minima× posting volume
    val docs = documents(spark, sfDir).select(col("doc_id"),
      winnow_sketch(col("text"), k, win, minima).as("sketch"))
    // packed postings, same rationale as Dedup.jaccardPairs: the
    // posting shuffle carries two longs (fp + doc_id/n_fp packed
    // word), sort_array on plain longs orders by doc_id for free
    val postings = docs.as[(Long, Seq[Long])]
      .flatMap { case (id, sk) =>
        val packed = (id << 20) | sk.length.toLong
        sk.map(f => (f, packed))
      }
      .toDF("fp", "packed")
    // document-frequency ceiling on fingerprint buckets — same
    // stop-shingle rationale and observability as Dedup.jaccardPairs
    // (a boilerplate fingerprint shared corpus-wide must not form one
    // quadratic bucket); drops counted via observe().
    val buckets = postings
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col("packed"))).as("ids"))
      .filter(size(col("ids")) > 1)
      // NOTE: observe rows are ERASED by AQE when the FINAL result is
      // empty (AQEPropagateEmptyRelation drops the executed
      // CollectMetrics from the plan observedMetrics walks) — the
      // metric is best-effort on empty output; see the canonical
      // caveat + spec pin on Similarity.simJoinLsh.
      .observe("winnow_bucket_cap",
        sum(when(size(col("ids")) > maxDf, 1L).otherwise(0L))
          .as("dropped_buckets"))
      .filter(size(col("ids")) <= maxDf)
      // identical member sets collapse to ONE pair generation carrying
      // their multiplicity: on a duplicate-heavy corpus every
      // fingerprint of a replica group lists the same members, so
      // pairs were generated once PER FINGERPRINT (measured 1.2G
      // exploded rows at the 100× probe). sum(cnt) reproduces the
      // per-pair shared-fingerprint count exactly.
      .groupBy(col("ids")).agg(count(lit(1)).as("cnt"))
    val nMask = (1L << 20) - 1
    val pairGen = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
        struct(shiftright(a, 20).as("doc_a"),
          shiftright(b, 20).as("doc_b"),
          a.bitwiseAND(lit(nMask)).as("n_a"),
          b.bitwiseAND(lit(nMask)).as("n_b")))))
    buckets.select(col("cnt"), explode(pairGen).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .agg(sum(col("cnt")).as("shared"))
      .withColumn("overlap",
        col("shared").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("overlap") >= minOverlap)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("overlap"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** T4b — rolling-hash (Karp-Rabin) fingerprints: robust 64-char
    * window minimum, alongside the doc's simhash for triage.
    */
  def rollingFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).select(col("doc_id"),
      rolling_fingerprint(col("text"), 64).as("roll_fp"),
      simhash_text(col("text")).as("simhash"))
      .orderBy(col("doc_id"))
}

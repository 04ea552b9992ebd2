package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` (SURVEY §2.3).
  *
  * Scale shape: exact dedup is one hash aggregation (shuffle on the
  * 128-bit fingerprint — uniformly distributed, no skew). Candidate
  * generation never goes O(n²): pairs are only formed inside a
  * blocking/bucketing key (source block here; MinHash-LSH band
  * buckets in MinHashDedup), then verified exactly.
  */
object Dedup {

  /** D1 — exact dedup by canonical-form fingerprint. Emits every doc
    * with its duplicate-group stats; `is_dup` rows are the ones a
    * pipeline would drop. Window over fp ≡ groupBy+join but one
    * shuffle only.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = fingerprintMd5(col("text"))
    val byFp = Window.partitionBy(col("fp"))
    documents(spark, sfDir)
      .select(col("doc_id"), fp.as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(byFp))
      .withColumn("group_size", count(lit(1)).over(byFp))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** D4 — exact n-gram Jaccard over blocked candidate pairs (block =
    * source). At 100 TB the block key comes from LSH buckets instead
    * (MinHashDedup); the verification join is identical.
    *
    * Inverted-index formulation, NOT pairwise array_intersect: explode
    * to (shingle, doc) postings, self-join on (source, shingle), count
    * shared shingles per pair. Cost is Σ posting-list² per shingle —
    * sparse-data cheap — instead of block² full-array intersections;
    * pairs sharing zero shingles (jaccard 0) never materialize. The
    * jaccard division is int/int → double: bit-identical in the
    * oracle, which states the same semantics pairwise.
    */
  def jaccardPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.02, maxDf: Int = 100): DataFrame = {
    // Single scan: shingle set per doc, then postings carrying the
    // doc's set size so no later join back is needed. The explode is
    // a typed flatMap, NOT explode(): Catalyst inlines a computed
    // array into the Generate input and re-evaluates it per OUTPUT
    // row (O(shingles²) per doc — measured 8.6 s vs 1.4 s at sf0.1);
    // flatMap forces one evaluation per input row.
    import spark.implicits._
    val postings = documents(spark, sfDir)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("source"),
        array_distinct(wordShinglesFrom(col("toks"), 3)).as("sh"))
      // (shingle-less docs emit no postings from the flatMap below, so
      // they need no explicit filter — a Filter(size(sh)>0) here would
      // force `sh` to evaluate twice per row)
      .as[(Long, String, Seq[String])]
      .flatMap { case (id, src, sh) =>
        // postings carry a 64-bit FNV-1a of the shingle, not the
        // string: the posting shuffle is the operator's dominant cost
        // at scale (~10⁸ rows at the 100× probe) and the ~30-byte
        // shingle text is pure key weight. Distinct-shingle counts
        // (n_sh) come from the true strings; intersection-by-hash is
        // exact up to 64-bit collisions (≈ d²/2⁶⁵ expected spurious
        // shared shingles corpus-wide — vanishing at any real scale,
        // zero at oracle scale).
        sh.map { s =>
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < s.length) {
            h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1
          }
          (id, src, sh.length, h)
        }
      }
      .toDF("doc_id", "source", "n_sh", "shingle")

    // bucket per (source, shingle): tiny sorted member lists (posting
    // lists are bounded by block size), pairs generated inside the
    // bucket with array lambdas — one shuffle, no self-join re-scan.
    // A document-frequency ceiling (`maxDf`) drops stop-shingle
    // buckets — one shingle shared by 10⁵ docs would otherwise form a
    // single 10¹⁰-pair bucket; a shingle that common carries no
    // near-dup signal anyway (standard stop-shingle treatment).
    // Coverage loss is observable: observe("jaccard_bucket_cap")
    // reports dropped_buckets per run. maxDf=100 ≫ the max df of 6
    // seen at sf0.1, so the oracle sees zero drops at test scale.
    val buckets = postings
      .groupBy(col("source"), col("shingle"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"))))
        .as("ids"))
      .filter(size(col("ids")) > 1)
      .observe("jaccard_bucket_cap",
        sum(when(size(col("ids")) > maxDf, 1L).otherwise(0L))
          .as("dropped_buckets"))
      .filter(size(col("ids")) <= maxDf)

    val pairGen = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
        struct(a.getField("doc_id").as("doc_a"),
          b.getField("doc_id").as("doc_b"),
          a.getField("n_sh").as("n_a"),
          b.getField("n_sh").as("n_b")))))

    buckets
      .select(explode(pairGen).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}

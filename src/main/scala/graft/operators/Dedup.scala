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
    * (MinHashDedup); the verification join is identical. The jaccard
    * division is int/int → double: bit-identical in the oracle.
    */
  def jaccardPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.02): DataFrame = {
    val docs = documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        array_distinct(wordShingles(col("text"), 3)).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("source"),
      col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("source"),
      col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables plus the numeric
  * conventions that keep Spark results bit-identical to the DuckDB
  * oracle.
  *
  * Determinism convention: every floating aggregate is computed as an
  * exact DECIMAL sum and only then cast back to DOUBLE. A plain
  * `sum(double)` depends on partition order (IEEE addition is not
  * associative), so Spark-at-32-partitions and single-threaded DuckDB
  * would drift in the last bits; decimal sums are exact in both
  * engines, and the final decimal->double cast plus any division is a
  * single deterministic IEEE operation on identical inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read natively; read it as raw nanos (legacy conf) and truncate to
    * microseconds — exactly what DuckDB does when it loads the same
    * file, so oracle comparisons stay bit-identical.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    // Only TIMESTAMP(NANOS) files surface ts as a long (via the conf
    // above) and need the µs truncation; micro/milli files load as a
    // native timestamp already.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  /** Exact sum of a double column: decimal-accumulate, ROUND to 2
    * places, then emit double. The round matters at scale: DuckDB
    * casts DECIMAL→DOUBLE via the int128 raw value (inexact above
    * 2^53 ≈ 9e15 scaled units), so a scale-4/scale-8 sum above ~1e9
    * drifts in the last bits vs Spark's correctly-rounded
    * BigDecimal.toDouble. After rounding to 2 decimals the scaled
    * integer fits a double exactly in both engines up to ~9e13.
    * Oracle: CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE).
    */
  def dsum(c: Column): Column =
    round(sum(c.cast("decimal(18,4)")), 2).cast("double")

  /** Deterministic average built from the exact rounded sum.
    * Oracle: CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)
    *         / COUNT(x).
    */
  def davg(c: Column): Column =
    dsum(c) / count(c)

  /** Exact sum of a product of two doubles (price * (1-disc) style).
    * Both factors are decimal-cast BEFORE multiplying so the product
    * is exact; rounded like dsum. Oracle:
    * CAST(ROUND(SUM(CAST(a AS DECIMAL(18,4)) * CAST(b AS
    * DECIMAL(18,4))), 2) AS DOUBLE).
    */
  def dsumProd(a: Column, b: Column): Column =
    round(sum(a.cast("decimal(18,4)") * b.cast("decimal(18,4)")), 2)
      .cast("double")
}

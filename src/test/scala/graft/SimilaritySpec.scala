package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def neighborSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact = neighborSet(Similarity.annBruteForce(spark, sf))

  test("brute force returns k neighbors per query") {
    val counts = Similarity.annBruteForce(spark, sf)
      .groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 5))
  }

  test("LSH recall vs brute force is reasonable") {
    val lsh = neighborSet(Similarity.annLsh(spark, sf))
    val recall = (lsh intersect exact).size.toDouble / exact.size
    // 16 planes / 4 bands over random vectors: recall won't be perfect,
    // but an implementation bug (empty buckets, broken signatures)
    // drives this to ~0.
    assert(recall >= 0.3, s"LSH recall $recall too low")
  }

  test("IVF recall vs brute force is reasonable") {
    val ivf = neighborSet(Similarity.annIvf(spark, sf))
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("sim_join pairs are ordered and above threshold") {
    val df = Similarity.simJoin(spark, sf, 0.3)
    import org.apache.spark.sql.functions._
    assert(df.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(df.filter(col("cosine") < 0.3).count() == 0)
  }
}

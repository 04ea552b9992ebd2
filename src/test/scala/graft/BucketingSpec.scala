package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's co-location claim, demonstrated: bucketed tables join
  * without a shuffle (no Exchange above either scan), and payload
  * JSON decoding works through Payloads.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed join plans without exchanges") {
    val sf = "/root/testdata/sf0.001"
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previous JVM's warehouse dir survives the in-memory catalog
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t"))
    }
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.substring(plan.indexOf("Join"))
    // co-located: no shuffle between the join and the bucketed scans
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$joinSection")
    assert(joined.count() > 0)
  }

  test("payload JSON decode via Payloads.asJson") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq("""{"k": 42, "tag": "x"}""").toDF("s")
      .select(encode(col("s"), "UTF-8").as("payload"))
    val schema = StructType(Seq(StructField("k", IntegerType),
      StructField("tag", StringType)))
    val out = df.select(
      graft.functions.Payloads.asJson(col("payload"), schema).as("j"))
      .select(col("j.k"), col("j.tag")).head()
    assert(out.getInt(0) == 42 && out.getString(1) == "x")
  }

  test("payload CSV decode via Payloads.asCsv") {
    import spark.implicits._
    val fields = Seq("7,temp,21.5").toDF("s")
      .select(encode(col("s"), "UTF-8").as("payload"))
      .select(graft.functions.Payloads.asCsv(col("payload")).as("f"))
      .head().getSeq[String](0)
    assert(fields == Seq("7", "temp", "21.5"))
  }
}

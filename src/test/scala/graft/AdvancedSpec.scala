package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AdvancedOps, TextOps}

class AdvancedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("asof join: every event row present; prices only from prior orders") {
    val asof = AdvancedOps.qAsofJoin(spark, sf)
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(asof.count() == nEvents)
    // spot-verify one matched row against a direct subquery
    val matched = asof.filter(col("last_orderkey").isNotNull).head()
    val uid = matched.getAs[Long]("user_id")
    val ts = matched.getAs[java.sql.Timestamp]("ts")
    val expect = graft.Tables.orders(spark, sf)
      .filter(col("o_custkey") === uid && col("o_orderdate") <= lit(ts))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .head()
    assert(matched.getAs[Long]("last_orderkey") ==
      expect.getAs[Long]("o_orderkey"))
  }

  test("salted wordcount equals direct wordcount") {
    val direct = TextOps.wordcount(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = AdvancedOps.wordcountSalted(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == salted)
  }

  test("approx percentiles are within 10% of exact") {
    val approx = AdvancedOps.qApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) / exact(k) < 0.1,
        s"$k: approx $v vs exact ${exact(k)}")
    }
  }
}

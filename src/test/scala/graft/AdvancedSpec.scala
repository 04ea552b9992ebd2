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
    // type-agnostic: driver-generated events have shipped ts as both
    // TIMESTAMP(NANOS) (collects as java.sql.Timestamp through the
    // nanos truncation) and timestamp[us] NTZ (collects as
    // java.time.LocalDateTime); lit() accepts either
    val ts = matched.getAs[Any]("ts")
    val expect = graft.Tables.orders(spark, sf)
      .filter(col("o_custkey") === uid && col("o_orderdate") <= lit(ts))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .head()
    assert(matched.getAs[Long]("last_orderkey") ==
      expect.getAs[Long]("o_orderkey"))
  }

  test("TopKBuffer fuzz: heap equals sort-take-k under random streams and merges") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(200)
      // duplicate ords force the id tie-break
      val items = Seq.fill(n)((rnd.nextInt(20).toDouble, rnd.nextLong()))
      val (l, r) = items.splitAt(rnd.nextInt(n + 1))
      val a = new graft.functions.TopKBuffer(k)
      val b = new graft.functions.TopKBuffer(k)
      l.foreach { case (o, i) => a.offer(o, i) }
      r.foreach { case (o, i) => b.offer(o, i) }
      var j = 0
      while (j < b.size) { a.offer(b.ords(j), b.ids(j)); j += 1 }
      val want = items.sortBy { case (o, i) => (-o, i) }.take(k)
      assert(a.sorted.toSeq == want, s"k=$k n=$n")
    }
  }

  test("q_topk_agg plan is a partial object aggregation, no window") {
    val df = AdvancedOps.qTopKAgg(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in top-k plan:\n$plan")
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"no partial object aggregation:\n$plan")
    val rows = df.collect()
    assert(rows.length == 15) // 5 priorities x k=3
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

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AdvancedOps
import graft.plans.GlobalOrder

/** Distributed global ranking (plans/GlobalOrder): value-identical to
  * the single-partition window it replaces, with the single-partition
  * stage provably gone from the plan.
  */
class GlobalOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("qNtile matches the windowed reference row for row") {
    val fast = AdvancedOps.qNtile(spark, sf).collect()
    val ref = AdvancedOps.qNtileWindowed(spark, sf).collect()
    assert(fast.length == ref.length && fast.length > 0)
    fast.zip(ref).foreach { case (a, b) => assert(a == b) }
  }

  test("qNtile plan has no window operator and no single-partition exchange") {
    val plan = AdvancedOps.qNtile(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator survived:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in plan:\n$plan")
  }

  test("row numbers are a 1..N permutation consistent with the order") {
    import spark.implicits._
    val df = Seq(5 -> "e", 1 -> "a", 3 -> "c", 2 -> "b", 4 -> "d")
      .toDF("k", "v").repartition(4)
    val (ranked, n) = GlobalOrder.withRowNumber(df, Seq(col("k")))
    assert(n == 5)
    val rows = ranked.orderBy("rn").collect()
    assert(rows.map(_.getLong(2)).toSeq == (1L to 5L))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
  }

  test("ntileOf / percentRankOf match Spark's window functions on random sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val total = 1 + rnd.nextInt(500)
      val buckets = 1 + rnd.nextInt(16)
      // unique keys in shuffled order, across several partitions
      val df = rnd.shuffle((1 to total).toList).toDF("k").repartition(5)
      val (ranked, n) = GlobalOrder.withRowNumber(df, Seq(col("k")))
      assert(n == total)
      val got = ranked
        .select(col("k"), GlobalOrder.ntileOf(col("rn"), n, buckets).as("b"),
          GlobalOrder.percentRankOf(col("rn"), n).as("pr"))
        .orderBy("k").collect()
      val w = Window.orderBy(col("k"))
      val want = df
        .select(col("k"), ntile(buckets).over(w).as("b"),
          percent_rank().over(w).as("pr"))
        .orderBy("k").collect()
      got.zip(want).foreach { case (a, b) =>
        assert(a.getInt(1) == b.getInt(1),
          s"ntile($buckets) of ${a.getInt(0)}/$total: " +
            s"${a.getInt(1)} vs ${b.getInt(1)}")
        assert(a.getDouble(2) == b.getDouble(2))
      }
    }
  }

  test("empty input yields an empty frame and total 0") {
    import spark.implicits._
    val df = Seq.empty[Int].toDF("k")
    val (ranked, n) = GlobalOrder.withRowNumber(df, Seq(col("k")))
    assert(n == 0 && ranked.count() == 0)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational / analytic core (SURVEY §2.2) — the query surface the
  * ingested stream feeds. Declarative DataFrame plans only: Catalyst
  * does pushdown/pruning; dimension sides of joins are broadcast
  * explicitly where they are guaranteed small relative to the fact
  * table at any scale factor.
  */
object Relational {

  /** R2 — TPC-H Q1-style pricing summary over lineitem. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** R1 — scan + filter + project; predicate and column pruning reach
    * the parquet scan (verified via explain: PushedFilters/ReadSchema).
    */
  def qFilterProject(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))

  /** R3 — TPC-H Q3-style shipping priority: customer ⋈ orders ⋈
    * lineitem, aggregate revenue, top 10. customer is the small side →
    * broadcast; orders⋈lineitem shuffles on the order key.
    */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** R4 — 5-way star join: region → nation → customer/supplier →
    * orders → lineitem (TPC-H Q5 shape). All dimension tables are
    * broadcast; only the orders⋈lineitem fact join shuffles.
    */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val reg = region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nat = nation(spark, sfDir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey"), col("n_name"))
    val ord = orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"))
    val supp = supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** R5 — top-N customers by total order value (sort + limit; Spark
    * plans TakeOrderedAndProject — no full sort at scale).
    */
  def qTopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    val cust = customer(spark, sfDir)
    ord.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(cust.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"),
        col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(20)
  }

  /** R6 — distinct (p_brand, p_type) pairs. */
  def qDistinctParts(spark: SparkSession, sfDir: String): DataFrame =
    part(spark, sfDir)
      .select(col("p_brand"), col("p_type"))
      .distinct()
      .orderBy(col("p_brand"), col("p_type"))

  /** R7a — left-semi join: customers having at least one open order. */
  def qSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val open = orders(spark, sfDir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    customer(spark, sfDir)
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** R7b — left-anti join: customers with no urgent-priority orders. */
  def qAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    customer(spark, sfDir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** R8 — window functions: rank each part's suppliers by supply
    * volume; keep top-3 per part.
    */
  def qWindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPartSupp = lineitem(spark, sfDir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("vol"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("vol").desc, col("l_suppkey"))
    byPartSupp
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("l_partkey"), col("l_suppkey"), col("vol"), col("rnk"))
      .orderBy(col("l_partkey"), col("rnk"), col("l_suppkey"))
  }

  /** R8b — running sum per customer over order dates (the reference
    * WordCount's keyBy→sum shape, as a batch window).
    */
  def runningSum(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, sfDir)
      .withColumn("run_total",
        round(sum(col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("run_total"))
      .filter(col("o_custkey") < 100)
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** R26 — left outer join: every customer with their order count and
    * exact total, including order-less customers (NULL-safe zero).
    */
  def qLeftJoin(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir)
      .join(orders(spark, sfDir), col("c_custkey") === col("o_custkey"),
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total"))
      .orderBy(col("c_custkey"))

  /** R27 — full outer join: reconcile two derived aggregates (urgent
    * vs low-priority spend per customer), keeping customers present
    * on either side only.
    */
  def qFullOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("cust_u"))
      .agg(dsum(col("o_totalprice")).as("urgent_total"))
    val low = orders(spark, sfDir)
      .filter(col("o_orderpriority") === "5-LOW")
      .groupBy(col("o_custkey").as("cust_l"))
      .agg(dsum(col("o_totalprice")).as("low_total"))
    urgent.join(low, col("cust_u") === col("cust_l"), "full_outer")
      .select(coalesce(col("cust_u"), col("cust_l")).as("custkey"),
        coalesce(col("urgent_total"), lit(0.0)).as("urgent_total"),
        coalesce(col("low_total"), lit(0.0)).as("low_total"))
      .orderBy(col("custkey"))
  }

  /** R12 — conditional aggregation + HAVING. */
  def qConditionalAgg(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("n_purchases"),
        dsum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("purchase_value"))
      .filter(col("n_purchases") >= 5)
      .orderBy(col("user_id"))

  /** R13 — orders above the global average price (scalar subquery via
    * cross-join of a 1-row aggregate; Catalyst broadcasts it).
    */
  def qOrderAboveAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    val avgPrice = ord.agg(davg(col("o_totalprice")).as("ap"))
    ord.crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("ap") * 1.5)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** R14 — rollup over (returnflag, linestatus) with grouping ids. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** R15 — approx distinct: HLL sketch of partkeys per supplier.
    * Rows-only oracle (sketches are engine-specific); the spec checks
    * relative error against exact counts.
    */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_suppkey"))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Advanced relational operators: as-of join, skew-salted
  * aggregation, approximate percentiles.
  */
object AdvancedOps {

  /** As-of join — for each event, the user's most recent order at or
    * before the event time. Spark lacks the operator; rather than a
    * per-key loop or a range cross-join, this is the scalable
    * union+window formulation: one shuffle on the key, one ordered
    * pass per key partition (orders and events interleaved by time,
    * `last_value(ignoreNulls)` carries the latest order forward).
    *
    * Orders are pre-deduped to one per (custkey, orderdate) — max
    * orderkey — so as-of ties are deterministic in both engines
    * (the oracle uses DuckDB's native ASOF JOIN, which leaves ties
    * unspecified otherwise).
    */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ord1 = orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .join(orders(spark, sfDir), Seq("o_custkey", "o_orderdate", "o_orderkey"))
      .select(col("o_custkey").as("key"), col("o_orderdate").as("t"),
        lit(1).as("is_order"), col("o_orderkey"), col("o_totalprice"))

    val ev = events(spark, sfDir)
      .select(col("user_id").as("key"), col("ts").as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"),
        col("event_id"))

    val unioned = ord1
      .withColumn("event_id", lit(null).cast("long"))
      .unionByName(ev)

    // at equal t, the order row sorts first (is_order desc) so an
    // order exactly at the event time is visible to the event.
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("is_order").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("last_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("last_price",
        last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("key").as("user_id"), col("t").as("ts"),
        col("last_orderkey"), col("last_price"))
      .orderBy(col("event_id"))
  }

  /** Skew-salted two-phase aggregation: wordcount where phase 1
    * aggregates on (word, salt) — spreading a hot key over N reducers
    * — and phase 2 merges the partials. Same result as the direct
    * groupBy (the oracle is identical SQL); at 100 TB this is the
    * shape that survives a power-law token distribution.
    */
  def wordcountSalted(spark: SparkSession, sfDir: String,
      salts: Int = 16): DataFrame =
    documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("word"))
      .withColumn("salt", pmod(crc32(monotonically_increasing_id()
        .cast("string")), lit(salts)))
      .groupBy(col("word"), col("salt"))
      .agg(count(lit(1)).as("pn"))
      .groupBy(col("word"))
      .agg(sum(col("pn")).as("n"))
      .orderBy(col("n").desc, col("word"))

  /** Range (band) join — pairs of events from the same user within
    * 5 minutes of each other. A naive inequality join is a nested
    * loop over the key group; the scalable shape is the binned band
    * join: bucket each event into its 5-minute bin, join each event
    * against its own and the next bin (every |Δt| ≤ 5 min pair shares
    * a bin boundary), then apply the exact predicate. Joins are
    * equi-joins on (user, bin) → hash-partitioned, no nested loop.
    */
  def qRangeJoin(spark: SparkSession, sfDir: String,
      bandSec: Long = 300): DataFrame = {
    val e = events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        (unix_timestamp(col("ts")) / bandSec).cast("long").as("bin"))
    val left = e.select(col("event_id").as("id_a"),
      col("user_id"), col("ts").as("ts_a"), col("bin"))
    // right side joins at bin-1/bin/bin+1: two timestamps within the
    // band are always in same-or-adjacent bins, regardless of how
    // event ids order relative to time; distinct() collapses the
    // same-bin double match.
    val right = e.select(col("event_id").as("id_b"), col("user_id"),
        col("ts").as("ts_b"), col("bin").as("rbin"))
      .withColumn("bin",
        explode(array(col("rbin") - 1, col("rbin"), col("rbin") + 1)))
    left.join(right, Seq("user_id", "bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(unix_timestamp(col("ts_b")) - unix_timestamp(col("ts_a")))
          <= bandSec)
      .select(col("user_id"), col("id_a"), col("id_b"))
      .distinct()
      .orderBy(col("user_id"), col("id_a"), col("id_b"))
  }

  /** Deterministic train/val/test split — hash-based, reproducible
    * across engines and runs (no RNG): first hex char of the content
    * md5 buckets 16 ways → 12/2/2 split. The split must be a pure
    * function of content so re-runs and backfills land rows
    * identically — the property a training pipeline actually needs.
    */
  def qTrainSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val h = substring(md5(col("text")), 1, 1)
    documents(spark, sfDir)
      .withColumn("split",
        when(h.isin("0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
          "a", "b"), "train")
          .when(h.isin("c", "d"), "val")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("split"))
  }

  /** Histogram — fixed-width binning of event values (the
    * width_bucket shape; bin arithmetic stated identically in the
    * oracle).
    */
  def qHistogram(spark: SparkSession, sfDir: String,
      binWidth: Double = 25.0): DataFrame =
    events(spark, sfDir)
      .withColumn("bin", floor(col("value") / binWidth).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("bin"))

  /** Pearson correlation of quantity vs discount per return flag,
    * assembled from exact decimal sums (sum x, y, xy, x², y²) so the
    * result is bit-identical in the oracle — Spark's corr() and
    * DuckDB's corr() accumulate floats in different orders, so the
    * built-in aggregates would NOT hash-match.
    */
  def qCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_discount")
    lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsumProd(x, y).as("sxy"),
        dsumProd(x, x).as("sxx"),
        dsumProd(y, y).as("syy"))
      .withColumn("corr_qd",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
      .select(col("l_returnflag"), col("n"), col("corr_qd"))
      .orderBy(col("l_returnflag"))
  }

  /** Pivot — event counts per user across event types (dynamic
    * columns from a bounded domain; the oracle states the CASE
    * expansion explicitly).
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Set operations: segments of customers via UNION / EXCEPT /
    * INTERSECT — each leg oracle-stated with the same ANSI operators.
    */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = customer(spark, sfDir)
    val building = cust.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val rich = cust.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val both = building.intersect(rich).withColumn("segment", lit("both"))
    val onlyB = building.except(rich).withColumn("segment", lit("building_only"))
    val onlyR = rich.except(building).withColumn("segment", lit("rich_only"))
    both.unionByName(onlyB).unionByName(onlyR)
      .orderBy(col("segment"), col("c_custkey"))
  }

  /** ntile + percent_rank over a GLOBAL ordering of customer
    * balances. An unpartitioned `Window.orderBy` funnels the whole
    * table into one partition; this uses the distributed
    * range-partitioned row-number composition instead
    * (graft.plans.GlobalOrder) — same values, no single-partition
    * stage. The order key ends in the unique c_custkey, so the order
    * is total and rank == row number.
    */
  def qNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val (ranked, n) = graft.plans.GlobalOrder.withRowNumber(
      customer(spark, sfDir).select(col("c_custkey"), col("c_acctbal")),
      Seq(col("c_acctbal"), col("c_custkey")))
    ranked.select(col("c_custkey"), col("c_acctbal"),
      graft.plans.GlobalOrder.ntileOf(col("rn"), n, 10).as("decile"),
      round(graft.plans.GlobalOrder.percentRankOf(col("rn"), n), 6)
        .as("pct_rank"))
      .orderBy(col("c_custkey"))
  }

  /** Reference implementation of qNtile via the single-partition
    * window, kept for the equivalence spec only — do not use at
    * scale.
    */
  private[graft] def qNtileWindowed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(10).over(w).as("decile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy(col("c_custkey"))
  }

  /** R26 — exact per-group top-k via the TopKBy
    * TypedImperativeAggregate: one aggregation with a bounded k-entry
    * heap per group, combined map-side, so at most k·groups entries
    * per partition reach the shuffle. The window form
    * (q_window_rank's shape) shuffles every row to rank it — this is
    * the 100 TB-safe way to answer "top N per key".
    */
  def qTopKAgg(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.AggFunctions.topk_by(
        col("o_totalprice").cast("double"), col("o_orderkey"), k).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("o_orderkey"), col("col.ord").as("price"))
      .orderBy(col("o_orderpriority"), col("rank"))

  /** CUBE over (returnflag, linestatus). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Approximate percentiles of order value per priority (rows-only:
    * the sketch is engine-specific; the spec bounds its error against
    * exact percentiles).
    */
  def qApproxPercentile(spark: SparkSession, sfDir: String): DataFrame =
    orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
          .as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(1000))
          .as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
}

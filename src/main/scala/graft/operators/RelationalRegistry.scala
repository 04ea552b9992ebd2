package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query + oracle registry for the relational core (SURVEY §2.2).
  *
  * Oracle-parity conventions (see Tables.scala): exact decimal sums
  * cast back to double; identical column aliases; explicit ORDER BY on
  * both sides.
  */
object RelationalRegistry {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q_filter_project" -> (Relational.qFilterProject _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q_top_customers" -> (Relational.qTopCustomers _),
    "q_distinct_parts" -> (Relational.qDistinctParts _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_left_join" -> (Relational.qLeftJoin _),
    "q_full_outer" -> (Relational.qFullOuterJoin _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "running_sum" -> (Relational.runningSum _),
    "q_conditional_agg" -> (Relational.qConditionalAgg _),
    "q_order_above_avg" -> (Relational.qOrderAboveAvg _),
    "q_rollup" -> (Relational.qRollup _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_events_tumbling" -> (Windows.qEventsTumbling _),
    "q_events_sliding" -> (Windows.qEventsSliding _),
    "q_sessionize" -> (Windows.qSessionize _),
    "q_asof_join" -> (AdvancedOps.qAsofJoin _),
    "q_range_join" -> ((s, d) => AdvancedOps.qRangeJoin(s, d)),
    "q_pivot" -> (AdvancedOps.qPivot _),
    "q_set_ops" -> (AdvancedOps.qSetOps _),
    "q_ntile" -> (AdvancedOps.qNtile _),
    "q_topk_agg" -> ((s, d) => AdvancedOps.qTopKAgg(s, d)),
    "q_cube" -> (AdvancedOps.qCube _),
    "q_train_split" -> (AdvancedOps.qTrainSplit _),
    "q_histogram" -> ((s, d) => AdvancedOps.qHistogram(s, d)),
    "q_corr" -> (AdvancedOps.qCorr _),
    "wordcount_salted" -> ((s, d) => AdvancedOps.wordcountSalted(s, d)),
    // rows-only: percentile sketch is engine-specific; error bound
    // asserted in AdvancedSpec.
    "q_approx_percentile" -> (AdvancedOps.qApproxPercentile _)
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_partkey, l_quantity""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_spent,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_distinct_parts" ->
      """SELECT DISTINCT p_brand, p_type FROM part
        |ORDER BY p_brand, p_type""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        | COALESCE(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
        |   AS DOUBLE), 0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_full_outer" ->
      """WITH u AS (SELECT o_custkey AS cust_u,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS urgent_total
        | FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
        |l AS (SELECT o_custkey AS cust_l,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS low_total
        | FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey)
        |SELECT COALESCE(cust_u, cust_l) AS custkey,
        | COALESCE(urgent_total, 0.0) AS urgent_total,
        | COALESCE(low_total, 0.0) AS low_total
        |FROM u FULL OUTER JOIN l ON cust_u = cust_l
        |ORDER BY custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT l_partkey, l_suppkey, vol, rnk FROM (
        |  SELECT l_partkey, l_suppkey, vol,
        |    ROW_NUMBER() OVER (PARTITION BY l_partkey
        |      ORDER BY vol DESC, l_suppkey) AS rnk
        |  FROM (
        |    SELECT l_partkey, l_suppkey,
        |      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS vol
        |    FROM lineitem GROUP BY l_partkey, l_suppkey))
        |WHERE rnk <= 3
        |ORDER BY l_partkey, rnk, l_suppkey""".stripMargin,
    "running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |   AS run_total
        |FROM orders
        |QUALIFY o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_conditional_agg" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        | CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,4))), 2) AS DOUBLE) AS purchase_value
        |FROM events
        |GROUP BY user_id
        |HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 5
        |ORDER BY user_id""".stripMargin,
    "q_order_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    / COUNT(o_totalprice) FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        | COUNT(*) AS n,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q_events_sliding" ->
      """WITH e AS (
        | SELECT *, date_trunc('hour', ts) +
        |   CASE WHEN EXTRACT(minute FROM ts) >= 30
        |        THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS f30
        | FROM events)
        |SELECT window_start, event_type, COUNT(*) AS n,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT *, f30 AS window_start FROM e
        |  UNION ALL
        |  SELECT *, f30 - INTERVAL 30 MINUTE AS window_start FROM e)
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q_asof_join" ->
      """WITH o1 AS (
        |  SELECT o.o_custkey, o.o_orderdate, o.o_orderkey, o.o_totalprice
        |  FROM orders o
        |  JOIN (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |        FROM orders GROUP BY o_custkey, o_orderdate) m
        |  USING (o_custkey, o_orderdate, o_orderkey))
        |SELECT e.event_id, e.user_id, e.ts,
        |  o1.o_orderkey AS last_orderkey,
        |  o1.o_totalprice AS last_price
        |FROM events e
        |ASOF LEFT JOIN o1
        |  ON e.user_id = o1.o_custkey AND o1.o_orderdate <= e.ts
        |ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(CAST(floor(epoch(b.ts)) AS BIGINT)
        |       - CAST(floor(epoch(a.ts)) AS BIGINT)) <= 300
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,
    "q_train_split" ->
      """SELECT lang,
        | CASE WHEN substring(md5(text), 1, 1) IN
        |        ('0','1','2','3','4','5','6','7','8','9','a','b')
        |      THEN 'train'
        |      WHEN substring(md5(text), 1, 1) IN ('c','d') THEN 'val'
        |      ELSE 'test' END AS split,
        | COUNT(*) AS n
        |FROM documents GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
        | COUNT(*) AS n,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |   AS sum_value
        |FROM events GROUP BY bin ORDER BY bin""".stripMargin,
    "q_corr" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sx,
        |  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sy,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sxy,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sxx,
        |  CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS syy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | (n * sxy - sx * sy) /
        |   (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qd
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        | COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        | COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_set_ops" ->
      """WITH building AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT c_custkey, 'both' AS segment
        |  FROM (SELECT c_custkey FROM building
        |        INTERSECT SELECT c_custkey FROM rich)
        |UNION ALL
        |SELECT c_custkey, 'building_only' AS segment
        |  FROM (SELECT c_custkey FROM building
        |        EXCEPT SELECT c_custkey FROM rich)
        |UNION ALL
        |SELECT c_custkey, 'rich_only' AS segment
        |  FROM (SELECT c_custkey FROM rich
        |        EXCEPT SELECT c_custkey FROM building)
        |ORDER BY segment, c_custkey""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey, c_acctbal,
        | NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile,
        | round(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6)
        |   AS pct_rank
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_topk_agg" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rank, o_orderkey, price
        |FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  CAST(o_totalprice AS DOUBLE) AS price,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        | l_linestatus ASC NULLS FIRST""".stripMargin,
    "wordcount_salted" ->
      """SELECT word, COUNT(*) AS n FROM (
        | SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        | FROM documents)
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR CAST(floor(epoch(ts)) AS BIGINT)
        |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT *, CAST(SUM(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS session_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}

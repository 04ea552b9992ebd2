package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed total-order ranking.
  *
  * `ntile(k).over(Window.orderBy(...))` — an unpartitioned window —
  * makes Spark move EVERY row to a single partition (WindowExec logs
  * "No Partition Defined for Window operation"); at 100 TB that one
  * task is the whole job. This operator keeps the global ordering but
  * never concentrates data:
  *
  *  1. `orderBy(orderCols)` — Spark's own scalable total sort
  *     (range-partitioned exchange + per-partition sort, AQE-sized).
  *  2. One O(numPartitions) pass counts rows per sorted partition;
  *     the cumulative counts are the global offset of each partition.
  *     The count job and the output job share the same RDD lineage,
  *     so the sort's shuffle map outputs are computed once (the
  *     reduce-side local sort runs twice — the same trade
  *     `RDD.zipWithIndex` makes, and a second local sort of spilled
  *     runs is cheap next to re-shuffling).
  *  3. A per-partition single pass appends `offset + local index` as
  *     the global 1-based row number — no window operator at all.
  *
  * Rank functions over the result (`ntileOf`, `percentRankOf`) are
  * then pure arithmetic on the row-number column: codegen'd, embarrassingly
  * parallel, and bit-identical to the SQL window definitions when the
  * order is total.
  *
  * Ties: append a unique key as the last sort column. With a
  * non-total order the assigned numbers are a valid but arbitrary
  * tie-break — exactly ROW_NUMBER semantics, NOT RANK (percentRankOf
  * assumes rank == row number, which only holds for a total order).
  */
object GlobalOrder {

  /** Sort `df` by `orderCols` and append a 1-based global row number.
    * Returns the ranked frame and the total row count (a free
    * byproduct of the offset pass). Eager: the offset job runs when
    * this is called.
    */
  def withRowNumber(df: DataFrame, orderCols: Seq[Column],
      rnName: String = "rn"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols: _*)
    val internal = sorted.queryExecution.toRdd
    val counts = internal.mapPartitions { it =>
      var c = 0L
      while (it.hasNext) { it.next(); c += 1 }
      Iterator.single(c)
    }.collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val zipped = internal.mapPartitionsWithIndex { (pid, it) =>
      val base = offsets(pid)
      val rn = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      var i = 0L
      it.map { row =>
        i += 1
        rn.setLong(0, base + i)
        joined(row, rn): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val schema = StructType(
      sorted.schema.fields :+ StructField(rnName, LongType, nullable = false))
    (ColumnBridge.internalDataFrame(spark, zipped, schema), total)
  }

  /** Sort `df` by `orderCols` and append the INCLUSIVE running sum of
    * `valueCol` (a non-nullable long) — the distributed prefix-sum:
    * `sum(v) OVER (ORDER BY ...)` without the unpartitioned-window
    * single-task collapse. Same two-job shape as [[withRowNumber]]:
    * one O(numPartitions) pass collects per-partition partial sums
    * (the only driver-side data — one long per partition), a second
    * pass adds the partition offset to a local running sum.
    */
  def withPrefixSum(df: DataFrame, orderCols: Seq[Column],
      valueCol: String, sumName: String = "cumsum"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols: _*)
    val ord = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(ord).dataType == LongType,
      s"prefix-sum column $valueCol must be long, " +
        s"got ${sorted.schema(ord).dataType}")
    val internal = sorted.queryExecution.toRdd
    val partials = internal.mapPartitions { it =>
      var s = 0L
      while (it.hasNext) s += it.next().getLong(ord)
      Iterator.single(s)
    }.collect()
    val offsets = partials.scanLeft(0L)(_ + _)
    val summed = internal.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      val cs = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      it.map { row =>
        run += row.getLong(ord)
        cs.setLong(0, run)
        joined(row, cs): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val schema = StructType(
      sorted.schema.fields :+ StructField(sumName, LongType, nullable = false))
    ColumnBridge.internalDataFrame(spark, summed, schema)
  }

  /** KEYED distributed prefix-sum: the inclusive running sum of
    * `valueCol` per `keyCol` group in `orderCols` order —
    * `sum(v) OVER (PARTITION BY key ORDER BY ...)` without the keyed
    * window's one-task-per-key collapse (at 100 TB one source/key can
    * be terabytes; a window partition puts all of it on one task).
    *
    * Shape: global sort on (key, orderCols) — Spark's range exchange
    * spreads a huge key across MANY partitions — then the same
    * two-pass trick as [[withPrefixSum]] with per-(partition, key)
    * partials. Driver-side data is one (key, long) per key per
    * partition that touches it; the sort makes each partition span a
    * contiguous key range, so that is ≈ numPartitions + numKeys
    * entries, not numPartitions × numKeys.
    *
    * `keyCol` must be a non-null string column; `valueCol` a
    * non-nullable long.
    */
  def withPrefixSumKeyed(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valueCol: String,
      sumName: String = "cumsum"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(col(keyCol) +: orderCols: _*)
    val kord = sorted.schema.fieldIndex(keyCol)
    val vord = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(kord).dataType ==
      org.apache.spark.sql.types.StringType,
      s"prefix-sum key $keyCol must be string, " +
        s"got ${sorted.schema(kord).dataType}")
    require(sorted.schema(vord).dataType == LongType,
      s"prefix-sum column $valueCol must be long, " +
        s"got ${sorted.schema(vord).dataType}")
    val internal = sorted.queryExecution.toRdd
    // pass 1: per-partition partial sum per key (insertion-ordered;
    // a sorted partition touches each key in one contiguous run)
    val partials: Array[Array[(String, Long)]] =
      internal.mapPartitions { it =>
        val m = mutable.LinkedHashMap[String, Long]()
        while (it.hasNext) {
          val row = it.next()
          // loud contract check: a null key would otherwise NPE deep
          // in the executor with no hint of which column violated it
          val u = row.getUTF8String(kord)
          if (u == null) throw new IllegalArgumentException(
            s"prefix-sum key column '$keyCol' contains a NULL — " +
              "the keyed prefix sum requires non-null keys")
          val k = u.toString
          m.update(k, m.getOrElse(k, 0L) + row.getLong(vord))
        }
        Iterator.single(m.toArray)
      }.collect()
    // offsets(pid)(key) = Σ partials of key in partitions < pid
    val running = mutable.HashMap[String, Long]()
    val offsets: Array[Map[String, Long]] = partials.map { part =>
      val snap = part.map { case (k, _) =>
        k -> running.getOrElse(k, 0L) }.toMap
      part.foreach { case (k, v) =>
        running.update(k, running.getOrElse(k, 0L) + v) }
      snap
    }
    val summed = internal.mapPartitionsWithIndex { (pid, it) =>
      val run = mutable.HashMap[String, Long]() ++ offsets(pid)
      val cs = new SpecificInternalRow(Seq(LongType))
      val joined = new JoinedRow
      it.map { row =>
        val k = row.getUTF8String(kord).toString
        val s = run.getOrElse(k, 0L) + row.getLong(vord)
        run.update(k, s)
        cs.setLong(0, s)
        joined(row, cs): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val schema = StructType(
      sorted.schema.fields :+ StructField(sumName, LongType, nullable = false))
    ColumnBridge.internalDataFrame(spark, summed, schema)
  }

  /** SQL-standard NTILE(n) from a global 1-based row number: the
    * first `total % n` buckets hold `total / n + 1` rows, the rest
    * `total / n`.
    */
  def ntileOf(rn: Column, total: Long, n: Int): Column = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val q = total / n
    val r = total % n
    if (q == 0L) rn.cast("int")
    else {
      val cut = r * (q + 1)
      when(rn <= cut, (rn - 1) / (q + 1) + 1)
        .otherwise((rn - cut - 1) / q + r + 1)
        .cast("int")
    }
  }

  /** PERCENT_RANK from a global row number: (rank - 1) / (total - 1),
    * with rank == row number under a total order.
    */
  def percentRankOf(rn: Column, total: Long): Column =
    if (total <= 1L) lit(0.0)
    else (rn - 1).cast("double") / lit((total - 1).toDouble)
}

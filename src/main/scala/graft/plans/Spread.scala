package graft.plans

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for kernel-heavy scan stages (guide §2.5
  * "input skew": one small file = one scan partition).
  *
  * A single parquet file under `spark.sql.files.maxPartitionBytes`
  * (and any single-row-group file regardless of size) scans as ONE
  * partition, so every codegen kernel, typed flatMap and quadratic
  * pair loop that runs before the first exchange executes on one
  * core — measured at sf0.1: knn_graph's 4M-pair cross join ran
  * single-threaded, 5.1 s vs 0.65 s spread (bit-identical rows).
  *
  * `spreadIfNarrow` round-robins the frame to the session's shuffle
  * parallelism ONLY when the physical scan is narrower than that —
  * at production scale (thousands of scan partitions) it is a no-op
  * by construction, so no extra corpus shuffle is ever added where
  * the scan is already parallel. The repartition is deterministic
  * (spark.sql.execution.sortBeforeRepartition, on by default) and
  * every consumer here is order-insensitive past it.
  *
  * Streaming frames pass through untouched (no .rdd on an unstarted
  * stream). Originally private to Dedup (r18); promoted this round
  * for the similarity/text kernel paths.
  */
object Spread {
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.isStreaming || df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}

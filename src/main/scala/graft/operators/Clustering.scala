package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CentroidFunctions.{nearest_cell, nearest_cos}

/** S7/S8 — embedding-space clustering and cluster-blocked semantic
  * dedup (the SemDeDup recipe: k-means the corpus, then near-dup
  * within clusters — Abbas et al. 2023, arXiv:2303.09540).
  *
  * UNLIKE the usual float k-means, the whole fit is ORACLE-CHECKED:
  * every Lloyd's iteration is reproduced bit-exactly by a DuckDB CTE
  * chain, because (a) cosine argmax uses the sequential-fold double
  * formulation both engines share (see SimilarityRegistry), and
  * (b) the centroid update is the DECIMAL-EXACT mean
  * `round(sum(decimal(18,4)), 2) / n` ([[Tables.davg]]) — an
  * order-independent sum, so Spark's partial-agg shuffle order
  * cannot drift from DuckDB's single-threaded fold. The 1e-4
  * centroid quantization this buys is far below the inter-cluster
  * distances that matter at corpus scale, and it makes "same
  * clusters on every engine, every partitioning, every retry" a
  * testable contract instead of a hope.
  *
  * Scale shape (100 TB): each iteration is ONE corpus scan — the
  * assignment is a pure projection (the centroid matrix rides into
  * codegen as a k×dim reference object, no crossJoin row blow-up),
  * and the update is posexplode → partial-agged (cell, dim) decimal
  * sums, a shuffle of numPartitions × k × dim scalar rows. Driver
  * traffic is k × dim doubles per iteration. k grows with corpus
  * size in the SemDeDup regime (clusters stay ~constant-sized); past
  * the point where k×dim fits a codegen reference (~10⁶ × 64), swap
  * the literal matrix for an IVF-style coarse quantizer — the
  * per-iteration plan shape is unchanged.
  */
object Clustering {

  /** Full assignment after `iters` decimal-exact Lloyd's rounds:
    * (vec_id, emb, cell_id, cosine-to-final-centroid).
    */
  private[operators] def assignments(spark: SparkSession, sfDir: String,
      k: Int, iters: Int): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("emb"))
    // init: the first k vectors are the seed centroids (exact copy)
    var cells: Array[(Int, Array[Double])] = emb
      .filter(col("vec_id") < k)
      .select(col("vec_id"), col("emb").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    import spark.implicits._
    var it = 0
    while (it < iters) {
      // one scan per iteration, MLlib-shaped: project (cell, vec) and
      // treeAggregate per-partition k×dim accumulators. Each value
      // enters the sum as its scale-4 decimal's unscaled long
      // (dec4Scaled IS the decimal(18,4) cast's rounding), so the
      // accumulated sums are bit-equivalent to the oracle's
      // order-independent DECIMAL sums — no 12.8M-row explode, no
      // aggregate hash map, numPartitions × (k×dim + k) longs reduced.
      val cellIds = cells.map(_._1)
      val dim = cells.head._2.length
      val idxOf = new Array[Int](cellIds.max + 1)
      cellIds.zipWithIndex.foreach { case (cid, j) => idxOf(cid) = j }
      val k = cells.length
      val assigned = emb
        .select(nearest_cell(col("emb"), cells).as("cell_id"),
          col("emb").cast("array<double>").as("v"))
        .as[(Int, Array[Double])]
      val (sums, counts) = assigned.rdd.treeAggregate(
        (new Array[Long](k * dim), new Array[Long](k)))(
        seqOp = { case ((s, c), (cid, v)) =>
          val j = idxOf(cid)
          var d = 0
          while (d < dim) {
            s(j * dim + d) +=
              graft.functions.CentroidKernels.dec4Scaled(v(d))
            d += 1
          }
          c(j) += 1
          (s, c)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          var j = 0
          while (j < c1.length) { c1(j) += c2(j); j += 1 }
          (s1, c1)
        })
      cells = cells.indices.flatMap { j =>
        val n = counts(j)
        if (n == 0) None // empty cells drop out, like the SQL
        else Some((cellIds(j), Array.tabulate(dim) { d =>
          // round(sum, 2): HALF_UP on the scale-4 integer, then the
          // exact decimal→double→/n of Tables.davg
          val s4 = sums(j * dim + d)
          val r2 = if (s4 >= 0) (s4 + 50) / 100 else (s4 - 50) / 100
          r2.toDouble / 100.0 / n.toDouble
        }))
      }.toArray.sortBy(_._1)
      it += 1
    }
    emb.select(col("vec_id"), col("emb"),
      nearest_cell(col("emb"), cells).as("cell_id"),
      nearest_cos(col("emb"), cells).as("cosine"))
  }

  /** S7 — `embed_kmeans`: per-vector cluster assignment, with the
    * cosine to the final centroid (the SemDeDup "distance to cluster
    * center" curation signal).
    */
  def embedKmeans(spark: SparkSession, sfDir: String,
      k: Int = 8, iters: Int = 3): DataFrame =
    assignments(spark, sfDir, k, iters)
      .select(col("vec_id"), col("cell_id"), col("cosine"))
      .orderBy(col("vec_id"))

  /** S8 — `dedup_semantic`: exact near-dup pairs WITHIN k-means
    * clusters. The cluster id replaces [[Similarity.dedupEmbedding]]'s
    * oracle-only label blocking with a blocking the pipeline itself
    * computes — the SemDeDup production shape. Pair cost is quadratic
    * in cluster size, so k is the knob: it grows with the corpus so
    * clusters stay ~bounded (the probe runs k=64 at 100×).
    */
  def dedupSemantic(spark: SparkSession, sfDir: String,
      k: Int = 8, iters: Int = 3, threshold: Double = 0.45): DataFrame = {
    import graft.functions.VectorFunctions.cosineAny
    val a = assignments(spark, sfDir, k, iters)
      .select(col("vec_id"), col("emb"), col("cell_id"))
    val l = a.select(col("cell_id"), col("vec_id").as("vec_a"),
      col("emb").as("emb_a"))
    val r = a.select(col("cell_id"), col("vec_id").as("vec_b"),
      col("emb").as("emb_b"))
    l.join(r, Seq("cell_id"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosineAny(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}

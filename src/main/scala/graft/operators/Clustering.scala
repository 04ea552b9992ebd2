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

  /** Sentinel `k`: size the cluster count to the corpus (SemDeDup
    * regime — clusters stay ~`targetCluster` vectors as the corpus
    * grows, so the within-cluster quadratic pair cost stays bounded
    * per cluster instead of silently degrading at scale).
    */
  val AutoK: Int = -1

  /** Corpus-proportional k: `max(8, ceil(n / targetCluster))` from a
    * bounded count (a count-only parquet scan — row-group metadata,
    * no embedding bytes). The floor of 8 keeps tiny corpora on the
    * oracle-checked default; past k×dim ≈ 10⁶×64 (≈ a 10⁹-vector
    * corpus at targetCluster=1000, dim 64) the centroid matrix
    * outgrows a codegen reference object — swap the literal matrix
    * for an IVF-style coarse quantizer there, per the class scaladoc.
    */
  private def resolveK(spark: SparkSession, sfDir: String,
      k: Int, targetCluster: Int): Int =
    if (k != AutoK) k
    else {
      require(targetCluster > 0, s"targetCluster must be > 0: $targetCluster")
      val n = Tables.embeddings(spark, sfDir).count()
      math.min(math.max(8L, (n + targetCluster - 1) / targetCluster),
        Int.MaxValue.toLong).toInt
    }

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
    * center" curation signal). `k` defaults to [[AutoK]] — sized to
    * the corpus so cluster populations track `targetCluster` instead
    * of growing with the data; the driver's oracle query pins k=8
    * explicitly to match its unrolled CTE chain.
    */
  def embedKmeans(spark: SparkSession, sfDir: String,
      k: Int = AutoK, iters: Int = 3,
      targetCluster: Int = 1000): DataFrame =
    assignments(spark, sfDir, resolveK(spark, sfDir, k, targetCluster), iters)
      .select(col("vec_id"), col("cell_id"), col("cosine"))
      .orderBy(col("vec_id"))

  /** S14 — `embed_prune_proto`: SSL-prototypes data pruning
    * (Sorscher et al. 2022, arXiv:2206.14486 — the "beyond neural
    * scaling laws" self-supervised metric, and the DataComp
    * "SSL prototypes" filtering baseline): k-means the corpus with
    * S7's decimal-exact fit, rank every vector within its cluster by
    * cosine to the final centroid DESC (most prototypical first,
    * vec_id tie-break), and PRUNE each cluster's ⌈frac·n⌉ most
    * prototypical members — in the abundant-data regime the paper
    * keeps the HARD examples near cluster boundaries; the easy
    * prototype cores are what a large corpus can afford to drop.
    *
    * `frac = pruneNum/pruneDen` is applied by exact integer
    * cross-multiplication — keep ⟺ rank > ⌈num·n/den⌉ ⟺
    * (rank−1)·den ≥ num·n — so the keep bit is hash-exact against
    * the oracle (no float ceil). The rank window is PARTITIONED by
    * cell (never unpartitioned): cluster populations track
    * [[AutoK]]'s `targetCluster`, so the largest cluster bounds one
    * task's sort regardless of corpus size, and the assignment
    * itself is S7's one-scan projection. 100 TB shape: fit once,
    * rank per cell, zero extra corpus scans beyond S7's.
    */
  def embedPruneProto(spark: SparkSession, sfDir: String,
      k: Int = AutoK, iters: Int = 3,
      pruneNum: Int = 3, pruneDen: Int = 10,
      targetCluster: Int = 1000): DataFrame = {
    require(pruneDen > 0 && pruneNum >= 0 && pruneNum <= pruneDen,
      s"prune fraction must be in [0,1]: $pruneNum/$pruneDen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell_id"))
    assignments(spark, sfDir,
        resolveK(spark, sfDir, k, targetCluster), iters)
      .select(col("vec_id"), col("cell_id"), col("cosine"))
      .withColumn("proto_rank", row_number().over(
        w.orderBy(col("cosine").desc, col("vec_id"))))
      .withColumn("keep",
        ((col("proto_rank") - 1) * pruneDen >=
          lit(pruneNum) * count(lit(1)).over(w)).cast("int"))
      .select(col("vec_id"), col("cell_id"), col("cosine"),
        col("proto_rank"), col("keep"))
      .orderBy(col("vec_id"))
  }

  /** S8 — `dedup_semantic`: exact near-dup pairs WITHIN k-means
    * clusters. The cluster id replaces [[Similarity.dedupEmbedding]]'s
    * oracle-only label blocking with a blocking the pipeline itself
    * computes — the SemDeDup production shape. Pair cost is quadratic
    * in cluster size, so k is the knob: [[AutoK]] (the default) grows
    * it with the corpus so clusters stay ~`targetCluster`-sized.
    *
    * Scale shape: the embeddings cross exactly ONE exchange — the
    * per-cell groupBy — and the quadratic pair loop runs unboxed
    * inside each bucket with the threshold applied before anything
    * reaches the output shuffle (the [[Similarity.simJoinLsh]]
    * shape). The previous self-join carried the vector array on BOTH
    * join sides, shuffling the corpus' embedding bytes twice for the
    * same pair set. Cosine is the sequential-fold double formulation
    * (floats widened before multiply), so the pairs stay hash-exact
    * against the DuckDB oracle.
    */
  def dedupSemantic(spark: SparkSession, sfDir: String,
      k: Int = AutoK, iters: Int = 3, threshold: Double = 0.45,
      targetCluster: Int = 1000): DataFrame = {
    import spark.implicits._
    assignments(spark, sfDir,
        resolveK(spark, sfDir, k, targetCluster), iters)
      .groupBy(col("cell_id"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("emb"))))
        .as("members"))
      .filter(size(col("members")) > 1)
      .select(col("members"))
      .as[Seq[(Long, Seq[Float])]]
      .flatMap { members =>
        val ids = members.map(_._1).toArray
        val vecs = members.map(_._2.toArray).toArray
        val n = ids.length
        val norms = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v = vecs(i); var s = 0.0; var d = 0
          while (d < v.length) {
            val x = v(d).toDouble; s += x * x; d += 1
          }
          norms(i) = math.sqrt(s); i += 1
        }
        val out = Seq.newBuilder[(Long, Long, Double)]
        i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val va = vecs(i); val vb = vecs(j)
            var dot = 0.0; var d = 0
            while (d < va.length) {
              dot += va(d).toDouble * vb(d).toDouble; d += 1
            }
            // zero-norm pairs are DROPPED, matching the oracle:
            // DuckDB's `/` yields NULL for 0.0/0.0 (verified on the
            // harness's 1.0.0 — not NaN; ieee_floating_point_ops does
            // not exist there), and `WHERE NULL >= t` filters the
            // row. The old Spark Column filter emitted the pair
            // (Spark doubles give NaN, and Spark SQL ranks NaN above
            // any threshold) — i.e. the SELF-JOIN form silently
            // diverged from its oracle on a zero-vector corpus; the
            // guard here is the parity-correct behavior, pinned by
            // the planted-zero-vector spec.
            val denom = norms(i) * norms(j)
            if (denom != 0.0) {
              val c = dot / denom
              if (c >= threshold) out += ((ids(i), ids(j), c))
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("vec_a", "vec_b", "cosine")
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** S10 — SEMDEDUP APPLY: the semantically deduplicated embedding
    * corpus itself — [[dedupSemantic]]'s pair list closed into
    * components ([[Clusters.clusterPairs]]' O(log n) star
    * contraction), each cluster collapsed to its min-id
    * representative, all unpaired vectors kept. Completes the
    * semantic family the way `dedup_apply` completes D4/D8 and
    * `screen_apply` completes D7: diagnostics → the shippable
    * corpus. Output is `(vec_id, label)` — ids only through the
    * anti-join, no embedding bytes cross a shuffle, and no array
    * column reaches the driver harness's canonicalization.
    */
  def semdedupApply(spark: SparkSession, sfDir: String,
      k: Int = AutoK, iters: Int = 3, threshold: Double = 0.45,
      targetCluster: Int = 1000): DataFrame = {
    val losers = Clusters.clusterPairs(
        dedupSemantic(spark, sfDir, k, iters, threshold, targetCluster)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id").as("vec_id"))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
      .join(losers, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }
}

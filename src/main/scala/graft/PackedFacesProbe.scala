package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** In-session A/B of the r20 packed production faces vs their array
  * twins at probe scale (the r19 verdict's #1 done-criterion: "a
  * probe A/B showing the win on knn_graph_ivf or ann_ivf_indexed at
  * 100×"). Both faces live in THIS binary (`packed` parameter /
  * format-parallel persisted indexes), so the comparison is
  * interleaved in one session — min-of-3 per face, host drift cannot
  * masquerade as a storage effect — and every pair is asserted
  * BIT-equal before its timings print (the PackedProbe convention).
  *
  * Rows measured:
  *  - `knn_graph_ivf_{array,packed}`: the S15 production graph build
  *    (fit + assign + probe + candidate join) with the candidate
  *    side as array<float> vs packed blobs;
  *  - `ann_ivf_indexed_{array,packed}`: the S12 persisted-index
  *    search over format-parallel artifacts built from the same
  *    deterministic fit (index build time NOT in the timed window —
  *    production searches an index that already exists).
  *
  * Usage: runMain graft.PackedFacesProbe [sfDir]  (default /tmp/sfpert)
  *
  * Coverage note (the no-silent-caps rule): the committed r20
  * artifact carries dims 64 (the perturbed harness corpus) and 256;
  * the dim-1024 graph-build leg did not complete at 200k×1024 with
  * both formats + checkpoint blocks resident in one 16 GB session —
  * the kernel-level dim-1024 win is covered by PackedProbe
  * (PROBE_r20_packed_AB.jsonl) instead.
  */
object PackedFacesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sfpert"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // pre-fault (the Probe convention: measure the engine, not disk)
    Tables.embeddings(spark, sfDir).queryExecution.toRdd.count()

    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        r.getInt(3))).toSeq

    def timed(name: String, reps: Int)(mk: () => DataFrame): Unit = {
      var best = Double.MaxValue
      var n = -1L
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        n = mk().queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
        r += 1
      }
      println(f"""{"query":"$name","sec":$best%.2f,"rows":$n}""")
    }

    // S15 graph build: bit-equality first, then interleaved timings
    val gArr = rows(Similarity.knnGraphIvf(spark, sfDir, packed = false))
    val gPk = rows(Similarity.knnGraphIvf(spark, sfDir))
    require(gArr == gPk && gArr.nonEmpty,
      "knnGraphIvf packed face drifted from the array face at scale")
    timed("knn_graph_ivf_array", 3)(() =>
      Similarity.knnGraphIvf(spark, sfDir, packed = false))
    timed("knn_graph_ivf_packed", 3)(() =>
      Similarity.knnGraphIvf(spark, sfDir))

    // S12 persisted search: format-parallel indexes, same fit. More
    // cells than the sf-dir default so the probed lists carry real
    // volume at 100× (the knnGraphIvf auto-sizing rationale).
    val nCells = 64
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_pkprobe_arr").toString
    val dirP = java.nio.file.Files
      .createTempDirectory("graft_pkprobe_pk").toString
    Similarity.saveIvfIndex(spark, sfDir, dirA, nCells = nCells)
    Similarity.saveIvfIndexPacked(spark, sfDir, dirP, nCells = nCells)
    val (cA, aA) = Similarity.loadIvfIndex(spark, dirA)
    val (cP, aP) = Similarity.loadIvfIndexPacked(spark, dirP)
    val nQ = 200
    val sArr = rows(Similarity.annIvfIndexed(cA, aA, nQueries = nQ))
    val sPk = rows(Similarity.annIvfIndexedPacked(cP, aP, nQueries = nQ))
    require(sArr == sPk && sArr.nonEmpty,
      "annIvfIndexedPacked drifted from the array face at scale")
    timed("ann_ivf_indexed_array", 3)(() =>
      Similarity.annIvfIndexed(cA, aA, nQueries = nQ))
    timed("ann_ivf_indexed_packed", 3)(() =>
      Similarity.annIvfIndexedPacked(cP, aP, nQueries = nQ))
    println("""{"query":"packed_faces_equal","sec":0.0,"rows":""" +
      s"${gArr.length + sArr.length}}")
    spark.stop()
  }
}

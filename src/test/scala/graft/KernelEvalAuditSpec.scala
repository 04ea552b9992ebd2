package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KernelMetrics
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.StreamDoc

/** Pins "one kernel evaluation per input row" on the streaming banding
  * paths (X7 streamingNearDup, X8 contaminationScreen). The risk under
  * audit: Catalyst duplicating the non-cheap `minhash_keys` /
  * `shingle_keys` projections into every per-band consumer
  * (`xxhash64(slice(sig, ...))` × bands), re-running the two most
  * expensive kernels in the repo 8× per row on the hot streaming path —
  * the same Generate-input trap SURVEY §8 measured at ~9× on batch
  * explode. Counters live inside the static kernels (HashKernels), so
  * they see interpreted and codegen evaluations alike.
  */
class KernelEvalAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Int) = new Timestamp(3600_000L * 10 + min * 60_000L)
  private def doc(i: Int) =
    (1 to 40).map(j => s"tok${i}x$j").mkString(" ")

  test("X7 streamingNearDup evaluates each kernel once per input row") {
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.streamingNearDup(in.toDS(), theta = 0.7)
      .writeStream.format("memory").queryName("audit_neardup")
      .outputMode("append").start()
    try {
      val n = 10
      val (_, shingles, minhashes) = KernelMetrics.counting {
        in.addData((1 to n).map(i => StreamDoc(i.toLong, ts(i), doc(i))): _*)
        q.processAllAvailable()
      }
      info(s"X7: $shingles shingle evals, $minhashes minhash evals for $n rows")
      assert(shingles == n, s"shingle_keys ran $shingles times for $n rows")
      assert(minhashes == n, s"minhash_keys ran $minhashes times for $n rows")
    } finally q.stop()
  }

  test("X8 contaminationScreen evaluates each kernel once per stream row") {
    val ref = Seq((100L, doc(100)), (200L, doc(200))).toDF("ref_id", "text")
    // per its contract the reference index is computed once and
    // persisted; otherwise the stream-static join re-derives it (and
    // re-runs its kernels) every micro-batch
    val refIdx = StreamingOps.referenceIndex(ref).persist()
    refIdx.count()
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.contaminationScreen(in.toDS(), refIdx, theta = 0.6)
      .writeStream.format("memory").queryName("audit_contam")
      .outputMode("append").start()
    try {
      val n = 10
      val (_, shingles, minhashes) = KernelMetrics.counting {
        in.addData((1 to n).map(i => StreamDoc(i.toLong, ts(i), doc(i))): _*)
        q.processAllAvailable()
      }
      info(s"X8: $shingles shingle evals, $minhashes minhash evals for $n rows")
      assert(shingles == n, s"shingle_keys ran $shingles times for $n rows")
      assert(minhashes == n, s"minhash_keys ran $minhashes times for $n rows")
    } finally { q.stop(); refIdx.unpersist() }
  }

  test("X8 passes through unshingleable docs without emitting matches") {
    val ref = Seq((100L, doc(100))).toDF("ref_id", "text")
    val refIdx = StreamingOps.referenceIndex(ref).persist()
    refIdx.count()
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.contaminationScreen(in.toDS(), refIdx, theta = 0.6)
      .writeStream.format("memory").queryName("audit_contam_empty")
      .outputMode("append").start()
    try {
      // "tiny" has < n tokens -> empty shingle set -> sentinel sig;
      // with the size filter gone it must still never reach output
      in.addData(StreamDoc(1L, ts(0), "tiny"), StreamDoc(2L, ts(1), ""),
        StreamDoc(3L, ts(2), doc(100)))
      q.processAllAvailable()
      val got = spark.table("audit_contam_empty").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ref_id")).toSet
      assert(got == Set(3L -> 100L), s"got $got")
    } finally { q.stop(); refIdx.unpersist() }
  }

  test("X8 contaminationScreen refuses theta <= 0") {
    val ref = Seq((100L, doc(100))).toDF("ref_id", "text")
    val refIdx = StreamingOps.referenceIndex(ref)
    val in = MemoryStream[StreamDoc]
    val ex = intercept[IllegalArgumentException] {
      StreamingOps.contaminationScreen(in.toDS(), refIdx, theta = 0.0)
    }
    assert(ex.getMessage.contains("theta must be > 0"))
  }

  test("bm25 term_counts kernel runs once per row per scan") {
    // q per-term tf columns read element_at(term_counts(...), i) from
    // the SAME subtree: whole-stage CSE must collapse them to one
    // kernel walk. bm25Search scans base twice (stats job + score
    // job) → 2 evals/row; docStats scans once, but its matched-doc
    // filter must not smuggle a second evaluation below the project.
    val sf = "/root/testdata/sf0.001"
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    // docStats ends in orderBy: the range partitioner's SAMPLING pass
    // is a genuine second scan of the typed map (1 eval/row), so the
    // bound is 2n — what must never return is the 4.5n of the
    // column-expression form (filter pushdown + per-term extraction
    // each re-running the kernel)
    val (_, _, _, terms1) = KernelMetrics.countingAll {
      graft.operators.Search.bm25DocStats(spark, sf).collect()
    }
    info(s"docStats: $terms1 term_counts evals for $n rows (sort sample + output)")
    assert(terms1 <= 2 * n, s"term_counts ran $terms1 times for $n rows")
    // search = stats job (the one parquet scan, filling the persisted
    // (doc_id, dl, tf) projection) + TakeOrdered job reading the
    // cache = ONE kernel evaluation per document per call
    val (_, _, _, terms2) = KernelMetrics.countingAll {
      graft.operators.Search.bm25Search(spark, sf).collect()
    }
    info(s"search: $terms2 term_counts evals for $n rows (single scan)")
    assert(terms2 == n,
      s"term_counts ran $terms2 times for $n rows — corpus scanned more than once")
  }

  test("referenceIndex evaluates each kernel once per reference row") {
    val ref = (1 to 10).map(i => (i.toLong, doc(i))).toDF("ref_id", "text")
    val (_, shingles, minhashes) = KernelMetrics.counting {
      StreamingOps.referenceIndex(ref).count()
    }
    info(s"refIndex: $shingles shingle evals, $minhashes minhash evals for 10 rows")
    assert(shingles == 10, s"shingle_keys ran $shingles times for 10 rows")
    assert(minhashes == 10, s"minhash_keys ran $minhashes times for 10 rows")
  }

  test("X16 incremental screen evaluates the sketch kernels once per stream row") {
    // static side: the persisted index — its sketches are
    // materialized once, so the stream-static join must contribute
    // ZERO kernel evals per micro-batch; the stream side computes
    // each sketch once even though the exact and near branches scan
    // the batch separately (column pruning drops `sig` from the
    // exact branch and `fp` from the near branch)
    val old = Seq((100L, doc(100)), (200L, doc(200))).toDF("doc_id", "text")
    val index = graft.operators.IncrementalDedup.buildIndex(old).persist()
    index.count()
    val in = MemoryStream[StreamDoc]
    val q = StreamingOps.streamingIncrementalScreen(in.toDS(), index)
      .writeStream.format("memory").queryName("audit_incscreen")
      .outputMode("append").start()
    try {
      val n = 10
      val (_, shingles, minhashes) = KernelMetrics.counting {
        in.addData((1 to n).map(i => StreamDoc(i.toLong, ts(i), doc(i))): _*)
        q.processAllAvailable()
      }
      info(s"X16: $shingles shingle evals, $minhashes minhash evals for $n rows")
      assert(shingles == n, s"shingle_keys ran $shingles times for $n rows")
      assert(minhashes == n, s"minhash_keys ran $minhashes times for $n rows")
    } finally { q.stop(); index.unpersist() }
  }

  test("T38 page_stats kernel runs once per row under the signals table's consumers") {
    // qualitySignals fans the fused array into 14 element_at
    // consumers (10 gopher gate slots + 4 c4 slots) — whole-stage CSE
    // must collapse them to ONE kernel evaluation per row per pass
    // (2n total: RangePartitioning's sample pass + the output pass,
    // the model_stats precedent below)
    val sfDir = "/root/testdata/sf0.001"
    val fixture = graft.operators.TextOps.qualitySignalsQuery(spark, sfDir)
    val (n, evals) = {
      KernelMetrics.reset()
      KernelMetrics.enabled = true
      try {
        val r = fixture.collect()
        (r.length.toLong, KernelMetrics.pageStatsEvals.sum())
      } finally { KernelMetrics.enabled = false; KernelMetrics.reset() }
    }
    info(s"T38: $evals page_stats evals for $n rows (sort sample + output)")
    assert(evals == 2 * n, s"page_stats ran $evals times for $n rows")
  }

  test("T15 model_stats kernel runs once per row under all its consumers") {
    // quality_classify references the score twice (q_score + keep)
    // and the score fans out to ~10 element_at consumers —
    // whole-stage subexpression elimination must collapse them to
    // ONE kernel evaluation per row (the TermCounts contract). The
    // audit reads the real parquet scan: a LocalRelation input would
    // route through ConvertToLocalRelation's interpreted per-column
    // eval, where no CSE exists (measured 10×/row there — which is
    // why the registered queries all scan parquet).
    val sfDir = "/root/testdata/sf0.001"
    val n = graft.Tables.documents(spark, sfDir).count()
    val (_, evals) = {
      KernelMetrics.reset()
      KernelMetrics.enabled = true
      try {
        val r = graft.operators.TextOps.qualityClassify(spark, sfDir)
          .collect()
        (r, KernelMetrics.modelStatsEvals.sum())
      } finally { KernelMetrics.enabled = false; KernelMetrics.reset() }
    }
    // 2n, not n: the registered query ends in a global orderBy, and
    // RangePartitioning's sample pass executes the projection once
    // before the output pass does (the bm25 doc_stats precedent
    // above). The pin is that the ~10 element_at consumers + the
    // doubled score reference collapse to ONE eval per row per pass
    // — without CSE this would read 10n/20n.
    info(s"T15: $evals model_stats evals for $n rows (sort sample + output)")
    assert(evals == 2 * n, s"model_stats ran $evals times for $n rows")
  }

  test("T15 quality gate runs model_stats ONCE per row inside a Filter") {
    // FilterExec does no subexpression elimination (only Project/
    // Aggregate do), so the historical Column tree re-ran model_stats
    // once per element_at reference — measured 10× per corpus row —
    // whenever the score sat in a predicate, which is EXACTLY the
    // P1/P2 quality-gate shape. The r17 fused model_score kernel is
    // the fix; this pins 1 eval/row in the bare-filter shape so the
    // tree can never silently return to a hot predicate.
    import org.apache.spark.sql.functions.{col, lit}
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    KernelMetrics.reset(); KernelMetrics.enabled = true
    try {
      docs.filter(graft.operators.TextOps.modelQualityScore(col("text"))
        >= lit(0.5)).count()
      val evals = KernelMetrics.modelStatsEvals.sum()
      info(s"gate: $evals model_stats evals for $n rows")
      assert(evals == n, s"model_stats ran $evals times for $n rows " +
        "in the quality-gate filter (tree shape would read 10n)")
    } finally { KernelMetrics.enabled = false; KernelMetrics.reset() }
  }

  test("P3 ingest runs gopher_stats ONCE per increment row per pass") {
    // the fenced gopher frame must have ONE consumer: a Fence is an
    // iterator handoff, not a materialization, so the former
    // keep===0 anti-join branch + n_words join pair re-executed the
    // whole gopher kernel scan once per consumer (2x/row — 4n here
    // with the orderBy's range-partitioner sample pass). The single
    // keep===1 inner join reads 2n: sample pass + output pass.
    val sfDir = "/root/testdata/sf0.001"
    val n = graft.operators.IncrementalDedup.newDocs(spark, sfDir).count()
    KernelMetrics.reset(); KernelMetrics.enabled = true
    try {
      graft.operators.Pipeline.pipelineIngestQuery(spark, sfDir).collect()
      val evals = KernelMetrics.gopherStatsEvals.sum()
      info(s"P3: $evals gopher_stats evals for $n increment rows")
      assert(evals <= 2 * n, s"gopher_stats ran $evals times for $n " +
        "rows (two consumers of the fenced frame would read 4n)")
    } finally { KernelMetrics.enabled = false; KernelMetrics.reset() }
  }

  test("T43 threshold sweep runs model_stats ONCE per row through " +
      "the 21-way grid fan-out") {
    // whole-stage codegen evaluates a deferred single-call projection
    // AT ITS USE SITE — for a projection under a broadcast join
    // fan-out that is INSIDE the join loop, so the fused model_score
    // kernel ran 21×/row (the old tree was saved by accident: its
    // repeated subtrees triggered subexpression elimination, whose
    // functions evaluate eagerly before the loop; the r17 100× probe
    // caught the 1.8 s → 10.3 s regression). The sweep now fences its
    // scores frame; this pins 1 eval/row so neither the fence nor the
    // kernel can regress silently.
    val sfDir = "/root/testdata/sf0.001"
    val n = graft.Tables.documents(spark, sfDir).count()
    KernelMetrics.reset(); KernelMetrics.enabled = true
    try {
      graft.operators.TextOps.modelThresholdSweep(spark, sfDir).collect()
      val evals = KernelMetrics.modelStatsEvals.sum()
      info(s"sweep: $evals model_stats evals for $n rows")
      assert(evals == n, s"model_stats ran $evals times for $n rows " +
        "through the sweep (deferred-eval fan-out would read 21n)")
    } finally { KernelMetrics.enabled = false; KernelMetrics.reset() }
  }
}

package graft.functions

import java.util.concurrent.atomic.LongAdder

/** Evaluation counters for the two most expensive text kernels,
  * [[HashKernels.shingleKeys]] and [[HashKernels.minhashFromKeys]].
  *
  * Purpose: plan-shape auditing. Catalyst can duplicate a non-cheap
  * expression into several consumers (the Generate-input trap SURVEY
  * §8 measured at 9× on batch explode paths), and a plan string does
  * not always reveal it — these counters measure actual kernel
  * invocations, interpreted AND codegen'd, since both paths dispatch
  * into the same static kernels (local[*] keeps executors in this
  * JVM, so the adders see every task). KernelEvalAuditSpec pins
  * "one evaluation per input row" on the streaming banding paths.
  *
  * Off by default: the hot path pays one volatile read + untaken
  * branch per kernel call (sub-ns next to the µs-scale kernels).
  */
object KernelMetrics {
  @volatile var enabled: Boolean = false
  val shingleEvals = new LongAdder
  val minhashEvals = new LongAdder
  val termEvals = new LongAdder
  val topTokenEvals = new LongAdder
  val piiCountEvals = new LongAdder
  val piiScrubEvals = new LongAdder
  val modelStatsEvals = new LongAdder
  val pageStatsEvals = new LongAdder
  val gopherStatsEvals = new LongAdder
  val minedBpeEvals = new LongAdder

  def reset(): Unit = {
    shingleEvals.reset(); minhashEvals.reset(); termEvals.reset()
    topTokenEvals.reset(); piiCountEvals.reset(); piiScrubEvals.reset()
    modelStatsEvals.reset(); pageStatsEvals.reset()
    gopherStatsEvals.reset(); minedBpeEvals.reset()
  }

  /** Run `body` with counting on; returns (result, shingles, minhashes). */
  def counting[A](body: => A): (A, Long, Long) = {
    reset()
    enabled = true
    try {
      val r = body
      (r, shingleEvals.sum(), minhashEvals.sum())
    } finally { enabled = false; reset() }
  }

  /** Like [[counting]] with the term-counts kernel included:
    * (result, shingles, minhashes, terms).
    */
  def countingAll[A](body: => A): (A, Long, Long, Long) = {
    reset()
    enabled = true
    try {
      val r = body
      (r, shingleEvals.sum(), minhashEvals.sum(), termEvals.sum())
    } finally { enabled = false; reset() }
  }
}

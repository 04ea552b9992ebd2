package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.ColumnBridge

/** Optimizer/codegen fence: re-roots a DataFrame on its own compiled
  * RDD (the [[GlobalOrder]] `toRdd` + `internalDataFrame` bridge), so
  * the plan ABOVE the fence sees a leaf.
  *
  * Why this exists — the fused-projection 64 KB failure mode: a
  * projection that computes N signal columns from one expensive
  * kernel call (`pagestats`, `model_stats`, …) followed by a filter
  * on those columns gets rewritten by `PushDownPredicates`, which
  * substitutes each alias's FULL defining expression into every
  * predicate conjunct. The filter then carries the kernel tree once
  * per conjunct; `FilterExec` does no subexpression elimination
  * (only Project/Aggregate do), so whole-stage codegen inlines each
  * copy and `processNext()` grows past janino's 64 KB method limit —
  * the stage falls back to interpreted — and even where it compiles,
  * the kernels are EVALUATED once per conjunct instead of once per
  * row. The release pipelines (P6/P7/P8) hit exactly this on their
  * signals+selection projection.
  *
  * The fence stops both: a `LogicalRDD` leaf is opaque to
  * `PushDownPredicates`/`CollapseProject`/column pruning, and the
  * physical `RDDScanExec` starts a FRESH whole-stage-codegen span, so
  * each half compiles comfortably. Cost: none in data movement (the
  * handoff is a same-task iterator of the child plan's unsafe rows —
  * no shuffle, no serialization, no materialization of the ROW
  * stream). Planning of the child happens at fence-construction
  * time, and under AQE (on by default) `toRdd` on an
  * `AdaptiveSparkPlanExec` also materializes the child's non-result
  * EXCHANGE stages eagerly — so constructing a fence over a child
  * with a broadcast join submits that broadcast job at composition
  * time (the current release-pipeline children do exactly this;
  * it is the same work, paid earlier). Do NOT fence a child with a
  * large shuffle unless eager execution at composition time is
  * acceptable. Because pruning cannot cross it, SELECT exactly the
  * columns the upper half needs before fencing. Row-stream execution
  * (the scan itself) stays lazy.
  *
  * Batch-only (`LogicalRDD` is a batch leaf) — streaming faces of the
  * same operators (X25/X27) keep their un-fenced single plan; their
  * per-micro-batch volumes never approach the regime where the
  * interpreted fallback hurts.
  */
object Fence {

  /** Structural audit of the "do NOT fence a shuffle-bearing child"
    * rule (the scaladoc paragraph above): when enabled, every
    * [[stageBarrier]] call records the child's schema and any
    * shuffle exchanges in its pre-AQE physical plan. OFF by default
    * — production fences pay only the flag check; PlanAuditSpec
    * enables it, re-composes every fenced recipe (P3/P3b, P6/P7/P8,
    * T43), and asserts the log shows zero shuffles below any fence,
    * so the next composition cannot violate the rule silently (the
    * r17 verdict's #3). Broadcast exchanges are deliberately NOT
    * flagged: eager broadcast of a small side at composition time is
    * the same work paid earlier, which the fence contract accepts.
    */
  @volatile private[graft] var auditEnabled = false
  private[graft] val auditLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[String])]()

  /** Re-root `df` as a leaf: everything below is planned now and
    * becomes one (or more) independent codegen span(s); everything
    * above plans against an opaque scan with `df.schema`.
    */
  def stageBarrier(df: DataFrame): DataFrame = {
    if (auditEnabled) {
      // the EXECUTED plan, not sparkPlan: EnsureRequirements inserts
      // Exchange nodes only in the preparation pipeline, so sparkPlan
      // NEVER contains them (an audit there is vacuous — found by the
      // r18 review, with a negative control in PlanAuditSpec now
      // pinning it). Under AQE the executedPlan is an un-executed
      // AdaptiveSparkPlanExec whose current plan IS the prepared
      // initial plan, exchanges included; this runs before the toRdd
      // below, so no stage has been replaced yet, and already-
      // materialized stages would still surface via QueryStageExec.
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[String] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shuffles(q.plan)
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          s.nodeName +: s.children.flatMap(shuffles)
        case other => other.children.flatMap(shuffles)
      }
      auditLog.add((df.schema.fieldNames.mkString(","),
        shuffles(df.queryExecution.executedPlan)))
    }
    ColumnBridge.internalDataFrame(df.sparkSession,
      df.queryExecution.toRdd, df.schema)
  }
}

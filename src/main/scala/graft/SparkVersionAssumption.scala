package graft

/** The ONE place the library's Spark-version assumption lives (the
  * r18 verdict's #6). Two spec pins encode behavior of Spark
  * INTERNALS that a version bump may legitimately change, and both
  * must be re-adjudicated — not silently re-interpreted — when the
  * runtime moves off the assumed version:
  *
  *  1. **AQE observe-erasure on empty results**
  *     (SimilaritySpec "expected_recall_ppm … AQE erases the row on
  *     empty results"): `AQEPropagateEmptyRelation` replaces executed
  *     stages with `EmptyRelationExec`, dropping an already-populated
  *     CollectMetrics row from `observedMetrics`. A Spark that fixes
  *     this should flip the pin; the right response is to strengthen
  *     the empty-result test to assert the metric VALUE, not to
  *     delete the assertion.
  *  2. **`EnsureRequirements` runs only in the execution-preparation
  *     pipeline** (PlanAuditSpec "no registered fence sits above a
  *     shuffle exchange" + `Fence.auditExchanges`): the fence lint
  *     walks the AQE executedPlan precisely because `sparkPlan` never
  *     contains Exchange nodes. A Spark that plants exchanges earlier
  *     (or renames the AQE wrapper nodes) breaks the walk — the
  *     lint's NEGATIVE CONTROL (a deliberately fenced groupBy whose
  *     shuffle must be seen) fails loudly in that case.
  *
  * `SparkVersionSpec` pins the session's `spark.version` against
  * [[assumed]], so an upgrade trips ONE deliberate, documented
  * failure naming this file instead of two mysterious behavior-pin
  * failures. Build-matrix note: the build compiles against the
  * unmanaged jars at /opt/spark/jars (build.sbt `unmanagedBase`);
  * there is no second-version CI compile in this zero-egress
  * environment, so the upgrade procedure is: point `unmanagedBase`
  * at the new distribution, bump [[assumed]], run the full suite,
  * and re-adjudicate the two pins above plus anything else that
  * fails.
  */
object SparkVersionAssumption {
  /** The Spark release the version-coupled pins were validated on. */
  val assumed = "4.1.2"
}

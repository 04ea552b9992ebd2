package graft

import org.scalatest.funsuite.AnyFunSuite

/** The upgrade canary (the r18 verdict's #6): two spec pins encode
  * Spark-internal behavior (the AQE observe-erasure in
  * SimilaritySpec, the EnsureRequirements/executedPlan walk under the
  * fence lint in PlanAuditSpec). This pin makes a version bump fail
  * HERE first, with the re-adjudication instructions, instead of
  * surfacing as two mysterious behavior-pin failures.
  */
class SparkVersionSpec extends AnyFunSuite {
  test("runtime Spark version matches the recorded assumption") {
    val spark = SparkTestSession.spark
    assert(spark.version == SparkVersionAssumption.assumed,
      s"Spark moved from ${SparkVersionAssumption.assumed} to " +
        s"${spark.version}: re-adjudicate the version-coupled pins " +
        "listed in graft.SparkVersionAssumption (AQE observe-erasure, " +
        "fence exchange walk), then bump `assumed`")
  }
}

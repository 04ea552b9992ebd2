package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.Literal
import graft.functions._

/** Library entry point for SQL users: registers every graft function
  * in the session's function registry, so the whole surface is
  * reachable from `spark.sql(...)` as well as the Column API.
  *
  * Use either
  *   `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *   `GraftFunctions.registerAll(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.injections.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft", name),
          builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** name → expression builder, shared by the extension injection and
    * the imperative registration path.
    */
  val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "mqtt_topic_matches" ->
      ((es: Seq[Expression]) => MqttTopicMatches(es(0), es(1))),
    "minhash_signature" ->
      ((es: Seq[Expression]) =>
        MinHashSignature(es(0), intArg(es(1), "k"))),
    "simhash64" -> ((es: Seq[Expression]) => SimHash64(es(0))),
    "rolling_fingerprint" ->
      ((es: Seq[Expression]) =>
        RollingFingerprint(es(0), intArg(es(1), "window"))),
    "shingle_keys" ->
      ((es: Seq[Expression]) =>
        ShingleKeys(es(0), es(1), intArg(es(2), "n"))),
    "minhash_keys" ->
      ((es: Seq[Expression]) =>
        MinHashKeys(es(0), intArg(es(1), "k"))),
    "sorted_intersect_count" ->
      ((es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    "simhash_text" -> ((es: Seq[Expression]) => SimHashText(es(0))),
    "canonical_md5" -> ((es: Seq[Expression]) => CanonicalMd5(es(0))),
    "dot_product" ->
      ((es: Seq[Expression]) => DotProduct(es(0), es(1))),
    "winnow_sketch" ->
      ((es: Seq[Expression]) => WinnowSketch(es(0),
        intArg(es(1), "k"), intArg(es(2), "window"),
        if (es.length > 3) intArg(es(3), "minima") else 1)),
    "bpe_token_count" ->
      ((es: Seq[Expression]) => BpeTokenCount(es(0))),
    "ws_token_count" ->
      ((es: Seq[Expression]) => WsTokenCount(es(0))),
    "punct_count" -> ((es: Seq[Expression]) => PunctCount(es(0))),
    "stopword_hits" ->
      ((es: Seq[Expression]) =>
        StopwordHits(es(0), stringArg(es(1), "lang"))),
    "lang_id" -> ((es: Seq[Expression]) => LangId(es(0))),
    "top_token_count" ->
      ((es: Seq[Expression]) => TopTokenCount(es(0))),
    "term_counts" ->
      ((es: Seq[Expression]) =>
        TermCounts(es(0), stringArg(es(1), "terms"))),
    "pii_counts" -> ((es: Seq[Expression]) => PiiCounts(es(0))),
    "pii_scrub_text" ->
      ((es: Seq[Expression]) => PiiScrubText(es(0))))

  /** Imperative registration on a live session. */
  def registerAll(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

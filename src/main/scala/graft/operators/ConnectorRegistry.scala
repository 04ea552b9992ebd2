package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for the connector-surface batch queries (SURVEY §2.1). */
object ConnectorRegistry {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "emqx_envelope" -> (ConnectorOps.emqxEnvelope _),
    "emqx_decode" -> (ConnectorOps.emqxDecode _),
    "emqx_topic_filter" -> (ConnectorOps.emqxTopicFilter _),
    "multimodal_meta" -> (graft.multimodal.Multimodal.multimodalMeta _),
    // rows-only: features come from real JDK codec decodes (PNG
    // luminance histograms, WAV RMS envelopes) — not SQL-expressible.
    // The registered shape digests the float-array feature column to
    // a BIGINT so every output column is harness-sortable; the raw
    // array stays on decodeMediaFeatures for the Dataset API.
    "multimodal_decode" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.decodeMediaFeaturesDigest(s, d).toDF()),
    // rows-only: signatures come from real codec decodes (luminance
    // planes, PCM envelopes); MediaDedupSpec pins them bit-exactly
    // on planted fixtures through both decode paths
    "media_phash" -> (graft.multimodal.Multimodal.mediaSignatures _),
    // rows-only: per-doc earlier-duplicate verdicts over the
    // signatures; spec'd on planted exact/re-encoded/resized/
    // perturbed variants, non-degenerate on the replicated probe
    "media_dedup" -> (graft.multimodal.Multimodal.mediaDedup _)
  )

  val oracle: Map[String, String] = Map(
    "emqx_envelope" ->
      """SELECT event_id,
        | 't/' || event_type || '/' || CAST(user_id % 5 AS VARCHAR) AS topic,
        | event_id % 3 AS qos,
        | event_id % 10 = 0 AS retained,
        | octet_length(encode(props)) AS payload_len
        |FROM events ORDER BY event_id""".stripMargin,
    "emqx_decode" ->
      """SELECT event_id,
        | length(props) AS decoded_len,
        | TRY_CAST(regexp_extract(props, '"k":\s*"?([^",}]*)"?', 1) AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "emqx_topic_filter" ->
      """SELECT event_id,
        | 't/' || event_type || '/' || CAST(user_id % 5 AS VARCHAR) AS topic,
        | TRUE AS m_all,
        | event_type = 'purchase' AS m_purchase,
        | user_id % 5 = 3 AS m_user3
        |FROM events ORDER BY event_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        | CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |   ELSE 'webp' END AS fmt,
        | CAST(doc_id % 640 + 64 AS INT) AS width,
        | CAST(doc_id % 480 + 48 AS INT) AS height,
        | octet_length(encode(text)) AS byte_len,
        | CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query + oracle registry for similarity search (SURVEY §2.4).
  *
  * The cosine oracle relies on both engines folding the double dot
  * product sequentially: Spark `aggregate(zip_with(...))` vs DuckDB
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])` — verified
  * bit-identical by tools/parity.py. LSH/IVF are rows-only (bucket
  * internals are engine-specific); their recall against the
  * brute-force baseline is asserted in SimilaritySpec.
  */
object SimilarityRegistry {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> ((s, d) => Similarity.annBruteForce(s, d)),
    "sim_join" -> ((s, d) => Similarity.simJoin(s, d)),
    // production path: LSH-banded blocking, rows-only (bucket
    // internals engine-specific); recall vs sim_join spec'd ≥ 0.9
    "sim_join_lsh" -> ((s, d) => Similarity.simJoinLsh(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_pq" -> ((s, d) => Similarity.annPq(s, d)),
    "dedup_embedding" -> ((s, d) => Similarity.dedupEmbedding(s, d))
  )

  private val COS =
    "list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)))"

  private def cos(a: String, b: String) = COS.format(a, b, a, a, b, b)

  val oracle: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM v WHERE vec_id < 10),
         |s AS (SELECT query_id, v.vec_id,
         |   ${cos("v.emb", "q_emb")} AS cosine
         | FROM v CROSS JOIN q WHERE v.vec_id <> query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |   ORDER BY cosine DESC, vec_id) AS rnk FROM s)
         |SELECT query_id, vec_id AS neighbor_id, cosine, rnk
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "sim_join" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         | ${cos("a.emb", "b.emb")} AS cosine
         |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cos("a.emb", "b.emb")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,
    "dedup_embedding" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         | ${cos("a.emb", "b.emb")} AS cosine
         |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cos("a.emb", "b.emb")} >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin
  )
}

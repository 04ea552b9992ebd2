package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusOps

/** T28 token-window chunking: reconstruction and bound invariants on
  * the sf corpus plus hand-pinned edge geometry. The byte-level
  * oracle check is the driver's DuckDB hash-match (`chunk_docs`).
  */
class ChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def collect(chunk: Int, overlap: Int) =
    CorpusOps.chunkDocs(spark, sf, chunk, overlap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("chunks reconstruct the canonical token stream exactly") {
    val chunk = 32
    val overlap = 8
    val stride = chunk - overlap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> CorpusOps.duckTokens(r.getString(1))).toMap
    val byDoc = collect(chunk, overlap).groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // dense 0-based chunk ids
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      // every chunk within bounds, non-empty token range
      sorted.foreach { case (_, _, text, n) =>
        assert(n >= 1 && n <= chunk)
        assert(CorpusOps.duckTokens(text).length.toLong == n ||
          (text.isEmpty && n == 1)) // the single-empty-token doc
      }
      // dropping each later chunk's leading overlap re-concatenates
      // to the canonical token stream
      val rebuilt = sorted.zipWithIndex.flatMap { case ((_, _, text, _), i) =>
        val tk = text.split(" ", -1)
        if (i == 0) tk else tk.drop(overlap)
      }
      assert(rebuilt.toSeq == docs(id).toSeq, s"doc $id reconstruction")
      // only the last chunk may be short
      sorted.dropRight(1).foreach { case (_, cid, _, n) =>
        assert(n == chunk, s"doc $id chunk $cid short mid-stream")
      }
    }
    // the sf corpus genuinely multi-chunks at this window
    assert(byDoc.values.exists(_.length > 1), "vacuous: no doc chunked")
  }

  test("chunk geometry: fit, exact-stride, remainder, and zero overlap") {
    import spark.implicits._
    def chunksOf(tokens: Int, chunk: Int, overlap: Int): Seq[(Long, Long)] =
      CorpusOps.chunkDocsOf(
          Seq((1L, (1 to tokens).map(i => s"t$i").mkString(" ")))
            .toDF("doc_id", "text"), chunk, overlap)
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(chunksOf(5, 8, 2) == Seq((0L, 5L)))          // fits: one chunk
    assert(chunksOf(8, 8, 2) == Seq((0L, 8L)))          // exact fit
    assert(chunksOf(9, 8, 2) == Seq((0L, 8L), (1L, 3L))) // remainder
    assert(chunksOf(14, 8, 2) == Seq((0L, 8L), (1L, 8L))) // ends at n
    assert(chunksOf(15, 8, 2) == Seq((0L, 8L), (1L, 8L), (2L, 3L)))
    assert(chunksOf(16, 8, 0) == Seq((0L, 8L), (1L, 8L))) // partition
    val e = intercept[IllegalArgumentException] {
      chunksOf(4, 8, 8)
    }
    assert(e.getMessage.contains("overlap"))
  }
}

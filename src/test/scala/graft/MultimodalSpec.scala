package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("media table carries opaque binary + typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.filter(col("width") < 64 || col("height") < 48).count() == 0)
  }

  test("batched decode emits deterministic features") {
    val a = Multimodal.decodeFeatures(spark, sf).collect()
    val b = Multimodal.decodeFeatures(spark, sf).collect()
    assert(a.length == b.length && a.length > 0)
    val byId = b.map(f => f.doc_id -> f).toMap
    a.foreach { f =>
      val g = byId(f.doc_id)
      assert(f.checksum == g.checksum && f.feature.sameElements(g.feature))
      assert(f.feature.length == 8)
      assert(f.byte_len > 0)
    }
  }

  test("frame sampling keeps every stride-th chunk, chunks re-concatenate") {
    val full = Multimodal.frameSample(spark, sf, chunkSize = 256, stride = 1)
    val sampled = Multimodal.frameSample(spark, sf, chunkSize = 256, stride = 4)
    assert(sampled.filter(col("chunk_idx") % 4 =!= 0).count() == 0)
    // stride=1 chunk bytes must reassemble to the original content
    val doc0 = full.filter(col("doc_id") === 0).orderBy("chunk_idx")
      .collect().flatMap(_.getAs[Array[Byte]]("chunk"))
    val orig = Multimodal.mediaTable(spark, sf).filter(col("doc_id") === 0)
      .head().getAs[Array[Byte]]("content")
    assert(doc0.sameElements(orig))
  }
}

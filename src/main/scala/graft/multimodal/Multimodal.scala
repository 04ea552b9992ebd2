package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal column plumbing (SURVEY §2.6): media as opaque `binary`
  * columns with typed metadata, processed partition-wise in batches.
  *
  * The actual image/audio decode is STUBBED (this container has no
  * media libraries): `StubDecoder.decode` derives deterministic fake
  * features from the bytes. Everything around it — the schema, the
  * batched partition-wise processing shape, chunking/frame-sampling,
  * and the feature join-back — is the real production plumbing and is
  * what the tests exercise. Swap `StubDecoder` for a JNI/library-backed
  * decoder without touching the Spark side.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, fmt: String, width: Int,
      height: Int, content: Array[Byte])

  case class MediaFeatures(doc_id: Long, byte_len: Int, checksum: Long,
      feature: Array[Float])

  /** Deterministic stand-in for a real media decoder. */
  object StubDecoder {
    /** STUB: a real implementation would decode `content` (JPEG/WAV/
      * MP4…) and run feature extraction; here features are a
      * deterministic hash-fold of the bytes so tests are exact.
      */
    def decode(rec: MediaRecord): MediaFeatures = {
      var crc = 0xcbf29ce484222325L
      var i = 0
      while (i < rec.content.length) {
        crc ^= (rec.content(i) & 0xffL); crc *= 0x100000001b3L; i += 1
      }
      val feat = new Array[Float](8)
      var j = 0
      while (j < 8) {
        feat(j) = (((crc >>> (j * 8)) & 0xff).toInt - 128) / 128.0f
        j += 1
      }
      MediaFeatures(rec.doc_id, rec.content.length, crc, feat)
    }
  }

  /** Synthesize a media table from `documents`: text bytes stand in
    * for encoded media; metadata is derived deterministically. This
    * is the envelope a real ingest (S3 of JPEGs, tar shards) would
    * produce.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir).select(
      col("doc_id"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("content"))

  /** M1 — metadata projection over the opaque binary column. */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"), col("fmt"), col("width"), col("height"),
      length(col("content")).as("byte_len"),
      ceil(length(col("content")) / 256.0).cast("bigint").as("n_chunks"))
      .orderBy(col("doc_id"))

  /** M2 — partition-wise batched decode: mapPartitions keeps one
    * decoder per partition (amortizing model/codec init, the
    * mapInPandas batching shape in Scala), emitting typed features.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRecord]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts,
        // model weights); the stub needs none.
        it.map(StubDecoder.decode)
      }
  }

  /** M3 — chunk / frame-sample the binary payload: fixed 256-byte
    * chunks via posexplode, keeping every `stride`-th chunk (frame
    * sampling). Pure column ops — no driver loops, no UDF.
    */
  def frameSample(spark: SparkSession, sfDir: String,
      chunkSize: Int = 256, stride: Int = 4): DataFrame = {
    val n = ceil(length(col("content")) / chunkSize.toDouble).cast("int")
    mediaTable(spark, sfDir)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), greatest(n - 1, lit(0)))))
      .filter(col("chunk_idx") % stride === 0)
      .select(col("doc_id"), col("chunk_idx"),
        col("content").substr(col("chunk_idx") * chunkSize + 1,
          lit(chunkSize)).as("chunk"))
  }
}

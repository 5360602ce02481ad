package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The container has no image/audio codecs, so the *decode* step is a clearly
  * marked deterministic stub ([[stubDecode]]); everything Spark-side — schema,
  * batch shape, partition-parallel extraction, frame-sampling explode — is real
  * and oracle-tested. In production the stub body is replaced by a codec call
  * inside the same `mapPartitions` (one codec init per partition, not per row —
  * the Scala analog of `mapInPandas` batching).
  */
object Multimodal {

  /** documents → multimodal layout: payload as binary + metadata struct.
    * (The synthetic corpus has no real media, so text bytes stand in for the
    * payload; the column types are what an image table would carry.) */
  def asBinaryTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          col("source").as("origin"),
          col("lang").as("declared_lang"),
          col("n_chars").as("declared_size")).as("meta"))

  /** Metadata/feature extraction over the binary payload — pure expressions,
    * no codec needed: byte length, content hash, leading byte. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    asBinaryTable(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_md5"),
        ascii(substring(col("payload").cast("string"), 1, 1)).cast("int").as("first_byte"),
        col("meta.origin").as("origin"))
      .orderBy("doc_id")

  /** Frame sampling: split each payload into fixed-size 64-byte "frames"
    * (the video-keyframe access pattern) — posexplode keeps it distributed and
    * 1 output row per frame. */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 64): DataFrame =
    asBinaryTable(spark, dir)
      .select(col("doc_id"), col("payload").cast("string").as("s"))
      // empty payloads yield zero frames (matches integer-floor oracle
      // semantics: DuckDB's (0-1)//64 = -1 → empty range, while Spark's
      // CAST(-1/64 AS INT) truncates to 0 → would emit one empty frame)
      .filter(length(col("s")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, CAST((length(s) - 1) / $frameBytes AS INT)), i -> substring(s, i * $frameBytes + 1, $frameBytes))")))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("frame_idx"),
        md5(col("col")).as("frame_md5"),
        length(col("col")).as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  /** Decode stub: where a real codec would run. Deterministic fake decode —
    * "dimensions" derived from the content hash — keeping the mapPartitions
    * batch shape honest (binary in, fixed-width features out).
    * STUB: replace `fakeDims` with the codec call in production. */
  def stubDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = asBinaryTable(spark, dir)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    src.mapPartitions { it =>
      // one "codec init" per partition, amortized across the batch
      it.map { case (id, bytes) =>
        val fakeDims = ((bytes.length % 640) + 1, (bytes.take(8).map(_.toInt & 0xff).sum % 480) + 1)
        (id, bytes.length.toLong, fakeDims._1, fakeDims._2)
      }
    }.toDF("doc_id", "byte_len", "width", "height")
      .orderBy("doc_id")
  }
}

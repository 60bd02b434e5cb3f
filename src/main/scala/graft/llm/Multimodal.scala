package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs alongside.
  *
  * The Spark-side shape is real and tested — schema, partition-friendly
  * narrow transforms, deterministic batch processing — while the actual
  * media decode is STUBBED (`fakeDecode*`): this container has no image or
  * audio codecs, so the decode produces a deterministic synthetic result
  * derived from the payload bytes. Swapping in a real decoder means
  * replacing only the fake struct fields (e.g. with an Arrow-batch native
  * function or a JNI codec) — every surrounding column stays identical.
  */
object Multimodal {

  /** Wrap text documents as binary payloads (stand-in for image bytes). */
  def asPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Metadata extraction over binary payloads — all engine-exact. */
  def payloadMetadata(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("payload"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("payload_md5"))

  /** STUB decode: deterministic fake "image" dimensions derived from the
    * payload hash — stands in for a real image decode. */
  def fakeDecodeImage(payload: Column): Column = struct(
    (pmod(crc32(payload), lit(1920L)) + 1L).cast("int").as("width"),
    (pmod(crc32(payload) * 31L, lit(1080L)) + 1L).cast("int").as("height"),
    lit(3).as("channels"))

  /** STUB frame sampling: byte-range slices standing in for video frames;
    * the slicing arithmetic (the part Spark executes) is real. */
  def fakeSampleFrames(payload: Column, frames: Int): Column =
    transform(sequence(lit(0), lit(frames - 1)), f => struct(
      f.as("frame_idx"),
      substring(payload, f * 16 + 1, lit(16)).as("frame_bytes")))

  def decodeTable(df: DataFrame): DataFrame =
    payloadMetadata(df)
      .withColumn("image", fakeDecodeImage(col("payload")))
      .withColumn("frames", fakeSampleFrames(col("payload"), 4))
      .drop("payload")
}

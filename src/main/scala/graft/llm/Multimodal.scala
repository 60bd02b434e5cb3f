package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs alongside.
  *
  * IMAGE decode is REAL for the formats the JDK ships codecs for
  * (`javax.imageio`: PNG, JPEG, GIF, BMP, ...): width/height/channels/format
  * come from the actual image header, read without materializing pixel
  * data. Payloads no installed reader recognizes (including the text
  * stand-ins the test corpus uses) fall back to the deterministic FAKE
  * decode derived from the payload bytes — `decoded=false` marks them, so
  * downstream can filter or route. Audio/video remain stubbed
  * (`fakeSampleFrames`): those codecs are genuinely absent here, but the
  * Spark-side shape — schema, narrow transforms, deterministic batches —
  * is real and tested either way.
  */
object Multimodal {

  /** Decoded image header metadata; `decoded=false` means the fallback
    * fake values (payload-hash-derived) are standing in. */
  case class ImageMeta(
      width: Int, height: Int, channels: Int, format: String, decoded: Boolean)

  /** Header-only image decode via the JDK's own `javax.imageio` readers —
    * `getWidth/getHeight/getImageTypes` read metadata, not pixels, so a
    * 100 MB JPEG costs a header parse, not a decode. Deterministic. */
  private[llm] def decodeMeta(bytes: Array[Byte]): ImageMeta = {
    if (bytes == null) return null
    // catch NonFatal, not just IOException: corrupt payloads with a valid
    // magic header make ImageIO readers throw IllegalArgument/IndexOOB/
    // NegativeArraySize from getWidth/getImageTypes — at corpus scale ONE
    // such payload must fall back, never kill the job. The stream creation
    // itself sits inside the try (it can throw or return null).
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) return fallbackMeta(bytes)
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val ch =
            if (types != null && types.hasNext) types.next().getNumComponents
            else 3
          ImageMeta(w, h, ch, r.getFormatName.toLowerCase, decoded = true)
        } finally r.dispose()
      } else fallbackMeta(bytes)
    } catch {
      case scala.util.control.NonFatal(_) => fallbackMeta(bytes)
    } finally {
      if (iis != null) {
        try iis.close() catch { case scala.util.control.NonFatal(_) => }
      }
    }
  }

  /** Same arithmetic as [[fakeDecodeImage]], for payloads without a codec:
    * the payload's md5 FIRST THREE BYTES as a 24-bit int. md5 (not crc32)
    * because every engine computes it identically — the DuckDB oracle
    * reproduces these fake dimensions exactly, so the multimodal plumbing
    * is checkable end-to-end. */
  private def fallbackMeta(bytes: Array[Byte]): ImageMeta = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val v = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
    ImageMeta((v % 1920L).toInt + 1, ((v * 31L) % 1080L).toInt + 1, 3,
      "unknown", decoded = false)
  }

  private val metaType = "struct<width:int,height:int,channels:int," +
    "format:string,decoded:boolean>"

  /** Column-level decode: real header decode where a JDK codec exists,
    * deterministic fake fallback elsewhere.
    *
    * A RELATIONAL magic-byte prefilter routes payloads: only candidates
    * whose first bytes carry a known image signature (PNG/JPEG/GIF/BMP/
    * TIFF/RIFF) enter the ImageIO UDF; everything else — at 100 TB of
    * mostly-text payloads, nearly everything — takes the codegen'd md5
    * fallback without ever paying a reader probe. `CaseWhen` evaluates
    * per-row lazily, so the UDF truly runs only on candidate rows. The
    * fallback arithmetic is identical to [[fallbackMeta]] (and to what a
    * magic-matching-but-corrupt payload gets from the UDF's own fallback),
    * so routing never changes values.
    *
    * The built-in signature list matches the STOCK JDK's codecs. A cluster
    * carrying service-loaded ImageIO plugins (e.g. PSD/PCX readers) must
    * widen the routing to match, or those payloads get the fake fallback
    * instead of their plugin decode: list extra uppercase hex magic
    * prefixes in `spark.graft.multimodal.extraMagicPrefixes` (comma-
    * separated, e.g. "38425053" for PSD), or set
    * `spark.graft.multimodal.prefilter=false` to probe every payload (the
    * pre-prefilter behavior — plugin-complete, slower on text corpora). */
  def decodeImage(payload: Column): Column = {
    val u = udf((b: Array[Byte]) => decodeMeta(b))
    val conf = org.apache.spark.sql.SparkSession.active.conf
    if (conf.getOption("spark.graft.multimodal.prefilter").contains("false"))
      return when(payload.isNull, lit(null).cast(metaType))
        .otherwise(u(payload))
    val extras = conf
      .getOption("spark.graft.multimodal.extraMagicPrefixes").toSeq
      .flatMap(_.split(",")).map(_.trim.toUpperCase).filter(_.nonEmpty)
    val h8 = hex(substring(payload, 1, 4))
    val extraMatch = extras.map(p =>
      substring(h8, 1, p.length) === p: Column)
    val looksImage = (extraMatch :+ (
      h8 === "89504E47" ||                    // PNG  \x89PNG
      substring(h8, 1, 6) === "FFD8FF" ||     // JPEG
      h8 === "47494638" ||                    // GIF8
      substring(h8, 1, 4) === "424D" ||       // BMP  "BM"
      h8.isin("49492A00", "4D4D002A") ||      // TIFF II*\0 / MM\0*
      h8 === "52494646" ||                    // RIFF (WEBP et al.)
      // WBMP (the JDK ships a reader): type byte 0 + fix-header 0. A weak
      // two-zero-byte signature — some non-image binary payloads will
      // match and pay one reader probe before falling back, but a real
      // WBMP must keep decoding for real (routing may cost, never change
      // values). Text payloads never start with NULs.
      substring(h8, 1, 4) === "0000")).reduce(_ || _)
    val v = conv(substring(md5(payload), 1, 6), 16, 10).cast("long")
    val fallback = struct(
      (pmod(v, lit(1920L)) + 1L).cast("int").as("width"),
      (pmod(v * 31L, lit(1080L)) + 1L).cast("int").as("height"),
      lit(3).as("channels"),
      lit("unknown").as("format"),
      lit(false).as("decoded"))
    when(payload.isNull, lit(null).cast(metaType))
      .when(looksImage, u(payload))
      .otherwise(fallback)
  }

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
    * payload's md5 (first 24 bits) — stands in for a real image decode.
    * md5, not crc32: every engine computes it identically, so the oracle
    * gate reproduces these values (see [[fallbackMeta]]). */
  def fakeDecodeImage(payload: Column): Column = {
    val v = conv(substring(md5(payload), 1, 6), 16, 10).cast("long")
    struct(
      (pmod(v, lit(1920L)) + 1L).cast("int").as("width"),
      (pmod(v * 31L, lit(1080L)) + 1L).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** STUB frame sampling: byte-range slices standing in for video frames;
    * the slicing arithmetic (the part Spark executes) is real. */
  def fakeSampleFrames(payload: Column, frames: Int): Column =
    transform(sequence(lit(0), lit(frames - 1)), f => struct(
      f.as("frame_idx"),
      substring(payload, f * 16 + 1, lit(16)).as("frame_bytes")))

  def decodeTable(df: DataFrame): DataFrame =
    payloadMetadata(df)
      .withColumn("image", decodeImage(col("payload")))
      .withColumn("frames", fakeSampleFrames(col("payload"), 4))
      .drop("payload")
}

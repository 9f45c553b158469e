package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus feature extraction and
  * frame sampling as batch operators.
  *
  * STUB BOUNDARY (deliberate, per the task spec): this container ships
  * no image/audio codecs, so `fakeDecodeFeatures` stands in for the
  * real decoder with a deterministic byte-histogram "feature vector" —
  * the Spark-side contract (schema `array<float>`, null-safety,
  * per-partition batching, column pruning of the heavy binary column)
  * is real and tested; swapping in a real JNI/codec decode changes only
  * the function body marked STUB below.
  */
object Multimodal {

  /** Typed metadata for an opaque binary payload. */
  final case class BinaryMeta(n_bytes: Int, magic: String, sha256: String)

  private def sniffMagic(b: Array[Byte]): String = {
    if (b == null || b.length < 4) return "short"
    val m = b.take(4)
    if (m.startsWith(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))) "png"
    else if (m.startsWith(Array(0xff.toByte, 0xd8.toByte))) "jpeg"
    else if (m.startsWith("RIFF".getBytes)) "riff"
    else if (m.startsWith("<htm".getBytes) || m.startsWith("<HTM".getBytes) ||
             m.startsWith("<!do".getBytes)) "html"
    else m.map(x => f"${x & 0xff}%02x").mkString
  }

  /** Metadata extraction: size, magic-byte sniff, content hash.
    * r6: kept ONLY as the spec reference for the built-in composition
    * below (MultimodalMetaSpec asserts row-identical output) — this was
    * the literal "UDF where a built-in exists" case. */
  private[graft] val binaryMetaUdf = udf((b: Array[Byte]) => {
    if (b == null) null
    else {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      BinaryMeta(b.length, sniffMagic(b), md.digest(b).map(x => f"${x & 0xff}%02x").mkString)
    }
  })

  /** [[binaryMetaUdf]] as pure codegen'd built-ins: length / sha2 /
    * hex(substring(..,1,4)) + CASE — no UDF boundary, no byte-array
    * copy out of the internal row. Identical struct (field order,
    * null-for-null, the "short" sentinel, lowercase hex fallback). */
  private def binaryMetaBuiltin(c: Column): Column = {
    val h4 = hex(substring(c, 1, 4)) // uppercase hex of the first 4 bytes
    val magic = when(length(c) < 4, lit("short"))
      .when(h4 === "89504E47", "png")
      .when(substring(h4, 1, 4) === "FFD8", "jpeg")
      .when(h4 === "52494646", "riff")
      .when(h4.isin("3C68746D", "3C48544D", "3C21646F"), "html")
      .otherwise(lower(h4))
    when(c.isNotNull, struct(
      length(c).cast("int").as("n_bytes"),
      magic.as("magic"),
      sha2(c, 256).as("sha256")))
  }

  /** STUB for media decode + feature extraction: a real implementation
    * would decode the image/audio and run a feature extractor; this
    * deterministic stand-in emits a 16-bin normalized byte histogram so
    * the whole pipeline (schema, batching, downstream ANN over the
    * features) is exercised end-to-end with a pure function. */
  val fakeDecodeFeaturesUdf = udf((b: Array[Byte]) => {
    if (b == null) null
    else {
      val bins = new Array[Float](16)
      var i = 0
      while (i < b.length) { bins((b(i) & 0xff) >> 4) += 1f; i += 1 }
      val n = math.max(1, b.length).toFloat
      bins.map(_ / n)
    }
  })

  /** STUB for video frame sampling: slices `numFrames` fixed-width
    * windows at deterministic offsets (a real implementation seeks
    * keyframes). Returns array<binary>. */
  val frameSampleUdf = udf((b: Array[Byte], numFrames: Int) => {
    if (b == null || numFrames <= 0) null
    else {
      val frameLen = math.max(1, b.length / math.max(1, numFrames))
      (0 until math.min(numFrames, b.length)).map { f =>
        val start = f * frameLen
        java.util.Arrays.copyOfRange(b, start, math.min(b.length, start + frameLen))
      }.toArray
    }
  })

  /** Column helpers. */
  def binaryMeta(c: Column): Column = binaryMetaBuiltin(c)
  def decodeFeatures(c: Column): Column = fakeDecodeFeaturesUdf(c)
  def frameSample(c: Column, n: Int): Column = frameSampleUdf(c, lit(n))

  /** Attach metadata + features to a binary column, keeping the heavy
    * payload out of downstream shuffles (select drops it immediately —
    * at 100 TB the binary bytes must never leave the scan stage unless
    * explicitly requested). */
  def enrich(df: DataFrame, binCol: String, idCols: Seq[String]): DataFrame =
    df.select((idCols.map(col) ++ Seq(
      binaryMeta(col(binCol)).as("meta"),
      decodeFeatures(col(binCol)).as("features"))): _*)
}

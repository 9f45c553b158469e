package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r6 — the built-in binaryMeta composition (length / sha2 /
  * hex(substring) + CASE) must be row-identical to the retired UDF on
  * every magic-sniff branch: png/jpeg/riff/html prefixes, the "short"
  * sentinel, the lowercase-hex fallback, and null payloads. */
class MultimodalMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("built-in binaryMeta == reference UDF on all sniff branches") {
    import spark.implicits._
    val payloads: Seq[Array[Byte]] = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10),        // png
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 1),  // jpeg
      "RIFF1234".getBytes,                                     // riff
      "<html><body>x</body></html>".getBytes,                  // html lower
      "<HTML>".getBytes,                                       // html upper
      "<!doctype html>".getBytes,                              // html doctype
      "plain text payload".getBytes,                           // hex fallback
      Array[Byte](0, 1, 2),                                    // short
      Array.empty[Byte],                                       // short (empty)
      null)                                                    // null -> null
    val df = payloads.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "b")
    val rows = df.select(col("i"),
        Multimodal.binaryMeta(col("b")).as("m"),
        Multimodal.binaryMetaUdf(col("b")).as("u"))
      .select(col("i"),
        (col("m") <=> col("u")).as("eq"),
        col("m.magic"), col("u.magic"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(1), s"payload ${r.getInt(0)}: " +
        s"builtin=${r.getString(2)} udf=${r.getString(3)}")
    }
    // the branches themselves resolved as intended
    val magics = df.select(Multimodal.binaryMeta(col("b")).getField("magic"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(magics.take(8) === Seq("png", "jpeg", "riff", "html", "html",
      "html", "706c6169", "short"))
  }
}

package graft

import graft.functions.Graft
import graft.similarity.{Ann, Quantize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 symmetric quantization: code range, reconstruction error
  * bounded by scale/2 per component, cosine fidelity, zero-vector
  * safety — all through the expression-level (codegen) path. */
class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  private def randomVecs(n: Int, dim: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (pmod(xxhash64(col("id"), d), lit(2001)).cast("double") - 1000.0) / 1000.0
      ).as("v"))

  test("codes stay in [-127,127] and reconstruction error <= scale/2 + ulp") {
    val q = Quantize.withInt8(randomVecs(200, 16), "v", "emb")
    val rows = q.select(col("v"), col("emb_q"), col("emb_scale")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val codes = r.getSeq[Byte](1)
      val scale = r.getDouble(2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"component $x decoded to ${c * scale} at scale $scale")
      }
    }
  }

  test("int8 cosine tracks float cosine within 0.02 on random pairs") {
    val q = Quantize.withInt8(randomVecs(100, 64), "v", "emb")
    val pairs = q.select(col("vec_id").as("a"), col("v").as("va"), col("emb_q").as("qa"))
      .join(q.select(col("vec_id").as("b"), col("v").as("vb"), col("emb_q").as("qb")),
        col("a") < col("b"))
    val maxDev = pairs.select(abs(
        Quantize.cosineInt8(col("qa"), col("qb")) - Ann.cosine(col("va"), col("vb"))
      ).as("d")).agg(max(col("d"))).head.getDouble(0)
    assert(maxDev <= 0.02, s"max cosine deviation $maxDev")
  }

  test("zero vectors quantize to zero codes with scale 0") {
    import spark.implicits._
    val d = Seq((1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(1.0, -0.5, 0.25)))
      .toDF("vec_id", "v")
    val q = Quantize.withInt8(d, "v", "emb").orderBy("vec_id").collect()
    assert(q(0).getSeq[Byte](q(0).fieldIndex("emb_q")) === Seq[Byte](0, 0, 0))
    assert(q(0).getDouble(q(0).fieldIndex("emb_scale")) === 0.0)
    assert(q(1).getSeq[Byte](q(1).fieldIndex("emb_q")) === Seq[Byte](127, -64, 32))
  }

  test("driver query ann_int8_recall returns both TRUEs") {
    assume(new java.io.File("/root/testdata/sf0.001/embeddings.parquet").exists())
    val r = SparkEntry.queries("ann_int8_recall")(spark, "/root/testdata/sf0.001").head
    assert(r.getBoolean(0) && r.getBoolean(1))
  }
}

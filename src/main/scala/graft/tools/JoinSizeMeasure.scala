package graft.tools

import graft.core.{Cms, CountSketch}
import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN45 evidence tool: join-size estimation accuracy, CMS inner
  * product (O34, one-sided) vs Count Sketch / AMS inner product (O79,
  * unbiased), from sketches built over two 32M-row key columns with
  * controlled overlap. The claim under test: the CMS estimator's
  * overshoot grows with eps*totalA*totalB — the CORPUS sizes — while
  * the AMS estimator's error scales with sqrt(F2a*F2b/width),
  * independent of how the totals dwarf the true intersection. Run:
  *   sbt "runMain graft.tools.JoinSizeMeasure [rows] [overlapPct]"
  */
object JoinSizeMeasure {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(32000000L)
    val overlapPct = args.lift(1).map(_.toInt).getOrElse(2)

    val spark = Graft.ensure(SparkSession.builder()
      .master("local[32]")
      .appName("graft-joinsize-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // side A: keys a0..a(rows-1), unique; side B: `overlapPct`% of its
    // rows hit A's key space (hash-selected), the rest are disjoint —
    // the selective-join regime where estimation matters (true join
    // size << totalA * totalB)
    val a = spark.range(rows).select(concat(lit("a"), col("id")).as("k"))
    val b = spark.range(rows).select(
      when(pmod(xxhash64(col("id")), lit(100)) < overlapPct,
        concat(lit("a"), col("id")))
        .otherwise(concat(lit("b"), col("id"))).as("k"))

    val t0 = System.nanoTime()
    val cmsA = Cms.fromBytes(a.select(expr("cms_agg(k)")).head.getAs[Array[Byte]](0))
    val cmsB = Cms.fromBytes(b.select(expr("cms_agg(k)")).head.getAs[Array[Byte]](0))
    val csA = CountSketch.fromBytes(a.select(expr("cs_agg(k)")).head.getAs[Array[Byte]](0))
    val csB = CountSketch.fromBytes(b.select(expr("cs_agg(k)")).head.getAs[Array[Byte]](0))
    val tBuild = (System.nanoTime() - t0) / 1e9

    val exact = a.join(b, "k").count()
    val cmsEst = cmsA.innerProduct(cmsB)
    val csEst = csA.innerProduct(csB)
    val cmsBound = cmsA.eps * cmsA.total * cmsB.total
    // both sides are near-distinct so F2 ~ totals
    val csSigma = math.sqrt(2.0 * rows.toDouble * rows.toDouble / csA.width)

    println(f"[js] rows=$rows overlap=$overlapPct%% exact_join=$exact " +
      f"(build $tBuild%.1f s, both sketch pairs)")
    println(f"[js] CMS  est=$cmsEst rel_err=${(cmsEst - exact).toDouble / exact}%+.3f " +
      f"(bound eps*Na*Nb = ${cmsBound}%.3g)")
    println(f"[js] CS   est=${csEst}%.0f rel_err=${(csEst - exact) / exact}%+.3f " +
      f"(sigma = ${csSigma}%.3g, err/sigma = ${(csEst - exact) / csSigma}%+.2f)")
  }
}

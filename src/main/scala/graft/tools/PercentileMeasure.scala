package graft.tools

import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN36 evidence tool: exact `percentile` vs the O71 opt-in KLL
  * rewrite, at the PLAN27 measurement shape (32M rows, 5 groups) with
  * a HIGH-CARDINALITY value column — exact Percentile's buffer is an
  * OpenHashMap over distinct values, so mostly-distinct doubles (the
  * warc_ts-quantile regime from the north star) are its worst case,
  * while the KLL form stays ~1 KB per group whatever the cardinality.
  * Run: sbt "runMain graft.tools.PercentileMeasure [rows] [trials]"
  */
object PercentileMeasure {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(32000000L)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)

    val spark = Graft.ensure(SparkSession.builder()
      .master("local[32]")
      .appName("graft-percentile-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // 5 groups; v is a hash-derived double, ~all-distinct per group
    def t = spark.range(rows).select(
      pmod(col("id"), lit(5)).as("g"),
      (xxhash64(col("id")).cast("double") / lit(1e12)).as("v"))

    def runOnce(approx: Boolean): (Double, Array[(Long, Double)]) = {
      if (approx) spark.conf.set("spark.graft.approxPercentile.enabled", "true")
      else spark.conf.unset("spark.graft.approxPercentile.enabled")
      val t0 = System.nanoTime()
      val out = t.groupBy("g").agg(expr("percentile(v, 0.5D)").as("p50"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      ((System.nanoTime() - t0) / 1e9, out)
    }

    // Spark's own bounded-state alternative, for the like-for-like row
    def runBuiltin(): (Double, Array[(Long, Double)]) = {
      spark.conf.unset("spark.graft.approxPercentile.enabled")
      val t0 = System.nanoTime()
      val out = t.groupBy("g")
        .agg(expr("approx_percentile(v, 0.5D, 10000)").as("p50"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      ((System.nanoTime() - t0) / 1e9, out)
    }

    var exact: Array[(Long, Double)] = null
    var est: Array[(Long, Double)] = null
    (1 to trials).foreach { i =>
      val (te, oe) = runOnce(approx = false); exact = oe
      val (ta, oa) = runOnce(approx = true); est = oa
      val (tb, _) = runBuiltin()
      println(f"[pm] trial $i: exact $te%.2f s, rewritten $ta%.2f s " +
        f"(${te / ta}%.1fx), builtin approx_percentile $tb%.2f s")
    }
    // rank deviation of each estimate against the exact median, in
    // value space mapped back through the empirical distribution
    exact.zip(est).foreach { case ((g, ev), (_, av)) =>
      val rank = t.filter(col("g") === g)
        .agg((sum(when(col("v") <= av, 1L).otherwise(0L)) / count(lit(1))).as("r"))
        .head.getDouble(0)
      println(f"[pm] group $g: exact p50 $ev%.6f, est $av%.6f, exact rank of est $rank%.5f")
    }
    spark.stop()
  }
}

package graft.tools

import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN41 evidence tool: exact `mode` vs the O76 opt-in Misra-Gries
  * rewrite at the PLAN27/PLAN36 measurement shape (32M rows, 5 groups)
  * with a heavy hitter over mostly-distinct strings — exact Mode's
  * per-group hash map holds every distinct value, the MG form holds
  * `capacity` slots. Run:
  *   sbt "runMain graft.tools.ModeMeasure [rows] [trials]"
  */
object ModeMeasure {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(32000000L)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)

    val spark = Graft.ensure(SparkSession.builder()
      .master("local[32]")
      .appName("graft-mode-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // ~10% of rows carry the group's hot value (hash-selected so every
    // group gets its share — plain mod would correlate with g), the
    // rest are singletons
    def t = spark.range(rows).select(
      pmod(col("id"), lit(5)).as("g"),
      when(pmod(xxhash64(col("id")), lit(10)) === 0,
          concat(lit("hot"), pmod(col("id"), lit(5))))
        .otherwise(concat(lit("u"), col("id"))).as("s"))

    def runOnce(approx: Boolean): (Double, Array[(Long, String)]) = {
      if (approx) spark.conf.set("spark.graft.approxMode.enabled", "true")
      else spark.conf.unset("spark.graft.approxMode.enabled")
      val t0 = System.nanoTime()
      val out = t.groupBy("g").agg(expr("mode(s)").as("m"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      ((System.nanoTime() - t0) / 1e9, out)
    }

    (1 to trials).foreach { i =>
      val (te, oe) = runOnce(approx = false)
      val (ta, oa) = runOnce(approx = true)
      val agree = oe.sameElements(oa)
      println(f"[mm] trial $i: exact $te%.2f s, rewritten $ta%.2f s " +
        f"(${te / ta}%.1fx), answers agree: $agree")
    }
    spark.stop()
  }
}

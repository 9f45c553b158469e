package graft.tools

import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN42 evidence tool: exact top-k-by-count vs the O80 opt-in
  * Misra-Gries rewrite at the PLAN27/PLAN36/PLAN41 measurement shape —
  * 32M rows whose key column mixes ~40 genuine heavy hitters with a
  * mostly-singleton tail (the webtext token regime: the exact plan's
  * exchange carries one row per DISTINCT key, the rewrite's exchange
  * carries one 256-slot MG buffer per task). Run:
  *   sbt "runMain graft.tools.TopKMeasure [rows] [trials] [k]"
  */
object TopKMeasure {

  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(32000000L)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val k = args.lift(2).map(_.toInt).getOrElse(20)

    val spark = Graft.ensure(SparkSession.builder()
      .master("local[32]")
      .appName("graft-topk-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // 10 hot tokens on a triangular mass ladder (tK covers K+1 of 128
    // hash cells -> counts step by rows/128 ~ 250k, from 250k up to
    // 2.5M) over a ~57% singleton tail (~18M distinct keys — the
    // webtext vocabulary regime the rewrite exists for: the exact
    // plan's exchange carries all ~18M distinct (key,count) pairs to
    // produce 10 rows). The honest MG contract at this shape, DEFAULT
    // capacity 256: the top-k KEY sequence is exact (consecutive gaps
    // ~250k clear the worst-case undercount n/(capacity+1) ~ 125k),
    // counts are under-estimates within that bound. Exact count
    // equality needs vocab <= capacity (the driver-gate case), never
    // an 18M-key vocabulary.
    val cell = pmod(xxhash64(col("id")), lit(128L))
    val hotIdx = floor((sqrt(cell.cast("double") * 8 + 1) - 1) / 2).cast("int")
    def t = spark.range(rows).select(
      when(cell < 55, concat(lit("t"), hotIdx))
        .otherwise(concat(lit("u"), col("id"))).as("token"))

    def runOnce(approx: Boolean): (Double, Array[(String, Long)]) = {
      if (approx) spark.conf.set("spark.graft.approxTopK.enabled", "true")
      else spark.conf.unset("spark.graft.approxTopK.enabled")
      val t0 = System.nanoTime()
      val out = t.groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc).limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      ((System.nanoTime() - t0) / 1e9, out)
    }

    val undercountBound = rows / 257 // n/(capacity+1), default capacity
    (1 to trials).foreach { i =>
      val (te, oe) = runOnce(approx = false)
      val (ta, oa) = runOnce(approx = true)
      val keysIdentical = oe.map(_._1).sameElements(oa.map(_._1))
      val maxDev = oe.zip(oa).map { case ((_, ce), (_, ca)) => ce - ca }.max
      val withinBound = oe.zip(oa).forall { case ((_, ce), (_, ca)) =>
        ca <= ce && ce - ca <= undercountBound
      }
      println(f"[tk] trial $i: exact $te%.2f s, rewritten $ta%.2f s " +
        f"(${te / ta}%.1fx), top-$k keys+order identical: $keysIdentical, " +
        f"max undercount $maxDev (bound $undercountBound, within: $withinBound)")
      if (!keysIdentical) {
        println("  exact:     " + oe.take(k).mkString(" "))
        println("  rewritten: " + oa.take(k).mkString(" "))
      }
    }
    spark.stop()
  }
}

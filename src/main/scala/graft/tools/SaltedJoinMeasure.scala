package graft.tools

import graft.pipeline.SaltedJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN24 evidence tool: salted vs plain equi-join on a hot-key fact,
  * in the shape AQE's skew split declines to repair — join(key)
  * followed by groupBy(key), where splitting the skewed partition
  * would break the distribution the aggregation wants to reuse.
  *
  * Broadcast is disabled: with a broadcastable dim the join is
  * map-side and key skew never materializes — the salted join's regime
  * is a dim BEYOND the broadcast budget (same regime as the sharded
  * EBF paths), which at bench scale is emulated by forcing the
  * shuffle join. Run:
  *   sbt "runMain graft.tools.SaltedJoinMeasure [factRows] [dimKeys] [hotFrac] [trials]"
  */
object SaltedJoinMeasure {

  def main(args: Array[String]): Unit = {
    val factRows = args.lift(0).map(_.toLong).getOrElse(32000000L)
    val dimKeys = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val hotFrac = args.lift(2).map(_.toDouble).getOrElse(0.25)
    val trials = args.lift(3).map(_.toInt).getOrElse(3)

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-saltedjoin-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fact: hotFrac of rows land on key 0 (the Zipf head), the rest
    // uniform over dimKeys; 64B payload so shuffled bytes are realistic
    val fact = spark.range(factRows).select(
      when(pmod(col("id"), lit(1000)) < lit((hotFrac * 1000).toLong), lit(0L))
        .otherwise(pmod(col("id") * 2654435761L, lit(dimKeys))).as("k"),
      col("id").as("fid"),
      lpad(col("id").cast("string"), 56, "x").as("payload"))
    val dim = spark.range(dimKeys).select(
      col("id").as("k"), md5(col("id").cast("string")).as("dpay"))
    import spark.implicits._
    val hot = Seq(0L).toDF("k")

    def runOnce(salted: Boolean): (Double, Long) = {
      val joined =
        if (salted) SaltedJoin.joinSkewedWithHot(fact, dim, Seq("k"), col("fid"), 32, hot)
        else fact.join(dim, Seq("k"))
      val t0 = System.nanoTime()
      val r = joined.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
        .agg(count(lit(1)), sum(col("n"))).head
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, r.getLong(1))
    }

    println(f"factRows=$factRows dimKeys=$dimKeys hotFrac=$hotFrac " +
      f"(hot key carries ~${(factRows * hotFrac / 1e6)}%.1fM rows)")
    for (t <- 1 to trials) {
      val (ps, pn) = runOnce(salted = false)
      val (ss, sn) = runOnce(salted = true)
      require(pn == sn, s"row-count mismatch: plain $pn vs salted $sn")
      println(f"trial $t: plain $ps%.2f s | salted $ss%.2f s | speedup ${ps / ss}%.2fx | rows $pn")
    }
    spark.stop()
  }
}

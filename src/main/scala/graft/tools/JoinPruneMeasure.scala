package graft.tools

import graft.pipeline.JoinPrune
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN9 evidence tool: the EBF-pruned join vs the plain join on a
  * selective fact/dimension equi-join — wall time AND actual shuffle
  * write bytes (the thing pruning exists to cut at 10^12 rows), from
  * stage metrics via a SparkListener. Run:
  *   sbt "runMain graft.tools.JoinPruneMeasure [factRows] [buildKeys] [keySpace]"
  */
object JoinPruneMeasure {

  def main(args: Array[String]): Unit = {
    val factRows = args.lift(0).map(_.toLong).getOrElse(32000000L)
    val buildKeys = args.lift(1).map(_.toLong).getOrElse(200000L)
    val keySpace = args.lift(2).map(_.toLong).getOrElse(10000000L)
    val trials = args.lift(3).map(_.toInt).getOrElse(3)

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-joinprune-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      // isolate the effect under test: without pruning the plain join
      // must actually shuffle the fact side (no broadcast, no Spark
      // runtime bloom filter riding along)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // registers EbfJoinPruneRule (opt-in via conf) + the sketch functions
    graft.functions.Graft.ensure(spark)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // fact: (key, 64B payload); ~3% of fact keys hit the build side
    val fact = spark.range(factRows).select(
      (col("id") % keySpace).as("fk"),
      concat(lit("payload-"), lpad(col("id").cast("string"), 56, "x")).as("payload"))
    val build = spark.range(buildKeys)
      .select(((col("id") * 2654435761L) % keySpace).as("bk")).distinct()
    build.cache().count()

    def measure(label: String)(body: => Long): Unit = {
      // settle async listener traffic from the previous phase
      Thread.sleep(1500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      val mb = (shuffleBytes.get() - b0) / 1e6
      println(f"[joinprune] $label%-12s rows=$n%12d  ${sec}%7.2f s  shuffleWrite=${mb}%10.1f MB")
    }

    // sum(length(payload)) forces the payload through the fact-side
    // exchange (a bare count() would let Catalyst prune it pre-shuffle)
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)).as("n"), sum(length(col("payload")))).head.getLong(0)

    // warmup both paths (codegen/JIT outside the window)
    consume(fact.limit(1000000).join(build, col("fk") === col("bk")))
    consume(JoinPrune.ebfPrunedJoin(fact.limit(1000000), "fk", build, "bk"))

    // O36 rule paths: maxBuildMb steers which window admits the build
    // side (HUGE -> monolithic single-EBF subquery; 1 -> the sharded
    // blob form) so the two filter shapes A/B on the SAME build side
    def rulePath(label: String, maxBuildMb: Long): Unit = {
      spark.conf.set("spark.graft.joinPrune.enabled", "true")
      spark.conf.set("spark.graft.joinPrune.maxBuildBytes", (maxBuildMb << 20).toString)
      try {
        val j = fact.join(build, col("fk") === col("bk"))
        val opt = j.queryExecution.optimizedPlan
        def n(p: Class[_]) = {
          var c = 0
          opt.foreach(x => x.expressions.foreach(_.foreach(e =>
            if (p.isInstance(e)) c += 1)))
          c
        }
        println(s"[joinprune] $label fired: mono=" +
          n(classOf[graft.plans.EbfProbeExpr]) +
          " sharded=" + n(classOf[graft.plans.EbfShardedBlobProbeExpr]) +
          " buildStats=" + build.queryExecution.optimizedPlan.stats.sizeInBytes)
        measure(label) { consume(j) }
      } finally {
        spark.conf.unset("spark.graft.joinPrune.enabled")
        spark.conf.unset("spark.graft.joinPrune.maxBuildBytes")
      }
    }

    for (_ <- 1 to trials) {
      measure("plain") {
        consume(fact.join(build, col("fk") === col("bk")))
      }
      measure("ebf-pruned") {
        consume(JoinPrune.ebfPrunedJoin(fact, "fk", build, "bk"))
      }
      rulePath("rule-mono", 1L << 20)
      rulePath("rule-sharded", 1L)
    }
    spark.stop()
  }
}

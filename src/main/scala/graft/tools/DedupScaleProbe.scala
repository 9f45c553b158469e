package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r6 — 100x-shape stress evidence for the dedup tier (VERDICT r5 next
  * #7): the flagship got multi-round scaling evidence in r3-r5; the
  * dedup candidate generators had only sf0.1 numbers. This probe runs
  * the minhash-band and winnowing candidate generators over the 32M-row
  * synthetic webpages bench table and reports, per generator:
  *
  *   - the bucket-density histogram of the blocking key (band hash /
  *     fingerprint) and the candidate-pair count it implies
  *     (sum over buckets of c*(c-1)/2, the bucket-density model both
  *     operators' scaladocs cite);
  *   - for winnowing, the same after the stop-gram cap (2 <= c <=
  *     maxBucket) that bounds any bucket's quadratic blowup;
  *   - measured wall seconds, total shuffle read/write bytes, and the
  *     max per-task peak execution memory of the signature+count pass
  *     (SparkListener task metrics) — the evidence that the pass is
  *     shuffle-bounded map work, not an O(n^2) join.
  *
  * Candidate COUNTS come from the density aggregation, not from
  * materializing pairs: the model (and the stop-gram cap) is exactly
  * what the probe is checking, and at 32M rows an uncapped pair
  * materialization would be the O(n^2)-shaped mistake the operators
  * exist to avoid.
  *
  * Usage: `runMain graft.tools.DedupScaleProbe [tablePath] [rowLimit]`
  * (defaults: the bench table, all rows). Results recorded in
  * BENCH/PLANS.md.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val tablePath = args.headOption.getOrElse("/root/repo/data/webpages/bench_32000000")
    val rowLimit = args.lift(1).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-scale-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Graft.ensure(spark)

    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakMem.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      }
    })
    def resetMetrics(): Unit = { shufRead.set(0); shufWrite.set(0); peakMem.set(0) }

    val raw = spark.read.parquet(tablePath).select(col("url").as("id"), col("text"))
    val docs = if (rowLimit > 0) raw.limit(rowLimit.toInt) else raw
    val n = docs.count()
    System.err.println(s"[probe] $n docs from $tablePath")

    def densityReport(name: String, keyed: org.apache.spark.sql.DataFrame,
                      capLo: Long, capHi: Long): Unit = {
      resetMetrics()
      val t0 = System.nanoTime()
      // bucket sizes of the blocking key -> candidate model in one pass
      val sizes = keyed.groupBy("k").agg(count(lit(1)).as("c"))
      val agg = sizes.agg(
        count(lit(1)).as("buckets"),
        max(col("c")).as("max_bucket"),
        sum(col("c")).as("entries"),
        sum(col("c") * (col("c") - 1) / 2).as("cand_uncapped"),
        sum(when(col("c").between(capLo, capHi), col("c") * (col("c") - 1) / 2)
          .otherwise(0L)).as("cand_capped"),
        sum(when(col("c") > capHi, 1L).otherwise(0L)).as("stop_buckets")).head
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","rows":$n,"buckets":${agg.getLong(0)},""" +
        f""""max_bucket":${agg.getLong(1)},"entries":${agg.getLong(2)},""" +
        f""""cand_uncapped":${agg.getAs[Any](3)},"cand_capped":${agg.getAs[Any](4)},""" +
        f""""stop_buckets":${agg.getLong(5)},"wall_sec":$secs%.1f,""" +
        f""""shuffle_read_mb":${shufRead.get / 1e6}%.1f,"shuffle_write_mb":${shufWrite.get / 1e6}%.1f,""" +
        f""""max_task_peak_mem_mb":${peakMem.get / 1e6}%.1f}""")
    }

    // minhash bands: the blocking key is (band_idx, band_hash)
    val numHashes = 64
    val numBands = 16
    val sig = graft.plans.MinhashSigExpr.column(col("text"), numHashes, 3)
    val bands = docs.select(posexplode(
        graft.plans.MinhashBandsExpr.column(sig, numBands, numHashes / numBands))
        .as(Seq("bi", "bh")))
      .select(concat_ws(":", col("bi"), col("bh")).as("k"))
    densityReport("minhash_bands", bands, 2L, Long.MaxValue)

    // winnow fingerprints: blocking key is the fingerprint, stop-gram
    // cap maxBucket=50 (the operator's default)
    val fps = docs.select(
      explode(graft.plans.WinnowFpExpr.column(col("text"), 16, 8)).as("k"))
    densityReport("winnow_fps", fps, 2L, 50L)

    spark.stop()
  }
}

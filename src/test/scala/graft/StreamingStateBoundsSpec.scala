package graft

import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The scale claims behind the streaming gates, MEASURED instead of
  * asserted in prose: with a watermark, Spark EVICTS finalized state,
  * so (a) a windowed sketch aggregation holds only the windows in
  * flight — not every window ever seen — and (b) watermarked dedup
  * holds only keys inside the re-arrival horizon. Both read the
  * engine's own `StateOperatorProgress.numRowsTotal` after an
  * AvailableNow replay. Without these, state grows with the corpus
  * and the operator dies at continuous ingest — the numbers here are
  * the difference.
  */
class StreamingStateBoundsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  private def sequentialSlices(df: org.apache.spark.sql.DataFrame, tmp: String,
                               idCol: String, n: Long): Unit =
    for (i <- 0L until 4L)
      df.filter(col(idCol) * 4 >= lit(i * n) && col(idCol) * 4 < lit((i + 1) * n))
        .coalesce(1).write.mode(if (i == 0L) "overwrite" else "append").parquet(tmp)

  private def finalStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null) 0L else p.stateOperators.map(_.numRowsTotal).sum
  }

  test("windowed aggregation state holds windows IN FLIGHT, not windows ever") {
    val n = 6000L
    val tmp = java.nio.file.Files.createTempDirectory("graft_state_win").toString
    try {
      // one event per minute -> 100 ten-minute windows per slice, 600
      // windows total; watermark = one window
      val base = spark.range(n).select(col("id"),
        timestamp_seconds(lit(1700000000L) + col("id") * 60L).as("ts"))
      sequentialSlices(base, tmp, "id", n)
      val q = spark.readStream.schema(spark.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
        .withWatermark("ts", "600 seconds")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(expr("hll_agg(cast(id as string))").as("hll"))
        .writeStream.outputMode("append").format("noop")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val state = finalStateRows(q)
      val totalWindows = n * 60 / 600
      assert(state <= 4, s"expected <= 4 in-flight windows, state holds $state")
      assert(state < totalWindows / 10,
        s"state $state is not bounded vs $totalWindows windows ever seen")
    } finally graft.util.GraftFiles.deleteRecursively(tmp)
  }

  test("dropDuplicatesWithinWatermark evicts keys past the re-arrival horizon") {
    val n = 6000L
    val tmp = java.nio.file.Files.createTempDirectory("graft_state_dedup").toString
    try {
      // one event per minute across ~4 days; duplicates arrive 90 s
      // later, watermark 1 hour >> the re-arrival gap
      val base = spark.range(n).select(col("id"),
        timestamp_seconds(lit(1700000000L) + col("id") * 60L).as("ts"))
      sequentialSlices(base, tmp, "id", n)
      val q = spark.readStream.schema(spark.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.outputMode("append").format("noop")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val state = finalStateRows(q)
      // only keys within (watermark delay + slack) of max ts survive:
      // ~60-120 of 6000, never the whole key set
      assert(state < n / 10,
        s"dedup state $state not evicted (total keys $n)")
      assert(state >= 1, "some recent keys must still be buffered")
    } finally graft.util.GraftFiles.deleteRecursively(tmp)
  }
}

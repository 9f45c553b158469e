package graft

import graft.core.{Ebf, Hll}
import graft.data.WebPagesGen
import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming compatibility: the sketch aggregators are plain
  * TypedImperativeAggregates with associative merge, so they drop into
  * streaming windowed aggregations and into custom
  * `flatMapGroupsWithState` state unchanged — the streaming story for
  * the engine (SURVEY.md §2.2 marks streaming out of scope for the
  * north rule; these tests document that the capability nevertheless
  * exists and works).
  */
class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  test("sketch UDAFs run inside a streaming windowed aggregation with watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    WebPagesGen.dataset(spark, 2000L, numHosts = 50).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("warc_ts", "10 days")
      .groupBy(window(col("warc_ts"), "90 days"), col("lang"))
      .agg(expr("hll_estimate(hll_agg(url))").as("ndv_est"),
        expr("topk_items(topk_tokens_agg(text), 1)").as("top1"),
        // the kernel-fused CMS+MG aggregator is streaming-safe too
        expr("cms_estimate(cms_topk_tokens_agg(text).cms, 'the')").as("the_cnt"),
        count(lit(1)).as("n"))

    val q = stream.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName("graft_stream_agg")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("graft_stream_agg").collect()
      assert(out.nonEmpty)
      // HLL estimate should track the exact per-group count closely
      out.foreach { r =>
        val est = r.getAs[Long]("ndv_est")
        val exact = r.getAs[Long]("n") // urls are unique
        assert(math.abs(est - exact) <= 3 * 1.04 / math.sqrt(4096) * exact + 3,
          s"group ${r.get(1)}: est=$est exact=$exact")
        // heavy-hitter aggregator also runs in-stream: each group must
        // surface a top token with a positive estimate
        val top1 = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("top1")
        assert(top1.nonEmpty && top1.head.getAs[Long]("est") > 0,
          s"group ${r.get(1)}: empty streaming top-1")
      }
      val totalN = out.map(_.getAs[Long]("n")).sum
      assert(totalN === 2000L)
      // 'the' heads the en stopword vocabulary: the fused CMS must see it
      assert(out.map(_.getAs[Long]("the_cnt")).max > 0,
        "fused streaming CMS never counted 'the'")
    } finally q.stop()
  }

  test("EBF as flatMapGroupsWithState streaming state (mergeable sketch state)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_state").toString
    WebPagesGen.dataset(spark, 1000L, numHosts = 20).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    // state = serialized EBF per lang; emit (lang, n, level) per batch
    def update(lang: String, rows: Iterator[org.apache.spark.sql.Row],
               state: GroupState[Array[Byte]]): Iterator[(String, Long, Int)] = {
      val ebf = if (state.exists) Ebf.fromBytes(state.get) else Ebf.empty(m0 = 64)
      rows.foreach(r => ebf.insert(r.getAs[String]("url")))
      state.update(ebf.toBytes)
      Iterator((lang, ebf.n, ebf.level))
    }

    val q = spark.readStream.schema(schema).parquet(dir)
      .select(col("lang"), col("url"))
      .groupByKey(_.getAs[String]("lang"))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
      .toDF("lang", "n", "level")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName("graft_stream_state")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("graft_stream_state")
        .groupBy("lang").agg(max("n").as("n"), max("level").as("level")).collect()
      assert(out.map(_.getAs[Long]("n")).sum === 1000L)
      assert(out.exists(_.getAs[Int]("level") > 0), "expected expansions with m0=64")
      val _ = Hll // touch import
    } finally q.stop()
  }
}

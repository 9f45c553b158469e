package graft.tools

import org.apache.spark.sql.SparkSession

/** Rewrite a parquet table with a different compression codec
  * (identical rows, lang-partitioned layout preserved):
  * `runMain graft.tools.TableRecode <src> <dst> <codec>`. Used for the
  * PLAN15 scan-codec A/B — zstd trades shared DRAM read bandwidth for
  * decode CPU, which is the right direction for 8->32 thread scaling
  * on one socket. */
object TableRecode {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: TableRecode <src> <dst> <codec>")
    val Array(src, dst, codec) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-recode")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(src)
    // 32MB row groups: partitionBy opens one writer per (task,
    // partition) and buffers a full row group in each — at 128MB
    // default that is 5 langs x 32 tasks x 128MB ~= 20GB of writer
    // buffers (measured OOM); 32MB caps it at ~5GB
    df.write.option("compression", codec)
      .option("parquet.block.size", (32 * 1024 * 1024).toString)
      .partitionBy("lang")
      .mode("overwrite").parquet(dst)
    println(s"[recode] rows=${spark.read.parquet(dst).count()} codec=$codec dst=$dst")
    spark.stop()
  }
}

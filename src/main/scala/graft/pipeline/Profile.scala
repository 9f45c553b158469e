package graft.pipeline

import graft.core.{FreqSketch, Hll, Kll}
import graft.functions.Graft
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** O74 — one-pass table profile: the ANALYZE-TABLE / CBO-stats role
  * built from the engine's own mergeable sketches.
  *
  * Per numeric column: exact non-null count, null count, min, max,
  * mean, plus HLL NDV and KLL p50/p95 estimates. Per string column:
  * exact counts plus HLL NDV and the Misra-Gries heavy hitter with its
  * frequency estimate.
  *
  * Everything comes from ONE aggregation pass — a single scan and a
  * single reduce of mergeable buffers — where the exact-stats SQL
  * (`COUNT(DISTINCT c)` per column + `percentile(c, ..)` per column)
  * plans a distinct expansion and a full-value sort PER COLUMN. At
  * corpus scale that is the difference between one pipelined pass and
  * 2-3 shuffles per profiled column; Spark's own ANALYZE TABLE ... FOR
  * COLUMNS makes the same trade (HLL NDV, no exact distinct).
  *
  * The final reshape collects the ONE aggregated row (bounded:
  * ~(4 sketches + 5 scalars) x columns) and emits a per-column frame —
  * the same bounded driver-side artifact as the shard tables and
  * flagship summaries.
  */
object Profile {

  private val schema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("nulls", LongType, nullable = false),
    StructField("min_d", DoubleType, nullable = true),
    StructField("max_d", DoubleType, nullable = true),
    StructField("mean", DoubleType, nullable = true),
    StructField("ndv_est", LongType, nullable = false),
    StructField("p50_est", DoubleType, nullable = true),
    StructField("p95_est", DoubleType, nullable = true),
    StructField("top_key", StringType, nullable = true),
    StructField("top_est", LongType, nullable = true)))

  /** One row per profiled column; see object scaladoc. Estimate
    * columns carry the library's published bounds (HLL sigma ~
    * 1.04/sqrt(2^p); KLL rank eps ~1.55% at the default k). */
  def profile(spark: SparkSession, df: DataFrame,
              numericCols: Seq[String], stringCols: Seq[String]): DataFrame = {
    Graft.ensure(spark)
    require(numericCols.nonEmpty || stringCols.nonEmpty, "nothing to profile")
    val aggs: Seq[Column] =
      numericCols.flatMap { c =>
        Seq(
          count(col(c)).as(s"${c}__n"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"${c}__nulls"), // sum over zero rows is null
          min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"),
          avg(col(c)).as(s"${c}__mean"),
          expr(s"hll_agg(cast($c as string))").as(s"${c}__hll"),
          expr(s"kll_agg(cast($c as double))").as(s"${c}__kll"))
      } ++
      stringCols.flatMap { c =>
        Seq(
          count(col(c)).as(s"${c}__n"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"${c}__nulls"),
          expr(s"hll_agg($c)").as(s"${c}__hll"),
          expr(s"topk_agg($c)").as(s"${c}__topk"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def bytes(name: String): Array[Byte] = row.getAs[Array[Byte]](name)

    val out =
      numericCols.map { c =>
        val kll = Kll.fromBytes(bytes(s"${c}__kll"))
        val n = row.getAs[Long](s"${c}__n")
        Row(c, n, row.getAs[Long](s"${c}__nulls"),
          if (n == 0) null else row.getAs[Double](s"${c}__min"),
          if (n == 0) null else row.getAs[Double](s"${c}__max"),
          if (n == 0) null else row.getAs[Double](s"${c}__mean"),
          Hll.fromBytes(bytes(s"${c}__hll")).estimate,
          if (n == 0) null else kll.quantile(0.5),
          if (n == 0) null else kll.quantile(0.95),
          null, null)
      } ++
      stringCols.map { c =>
        val top = FreqSketch.fromBytes(bytes(s"${c}__topk")).topK(1).headOption
        Row(c, row.getAs[Long](s"${c}__n"), row.getAs[Long](s"${c}__nulls"),
          null, null, null,
          Hll.fromBytes(bytes(s"${c}__hll")).estimate,
          null, null,
          top.map(_._1).orNull, top.map(t => java.lang.Long.valueOf(t._2)).orNull)
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}

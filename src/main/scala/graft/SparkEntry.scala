package graft

import graft.core._
import graft.functions.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2.3 + §A.3.
  *
  * Every implemented operator has a `queries` entry; oracle-safe ones
  * (deterministic + ANSI-SQL-expressible) also have an `oracleSql`
  * entry for the driver's DuckDB compare. Sketch *estimates* are not
  * SQL-expressible, so estimate queries come in pairs: a rows-only
  * estimate dump, and an oracle-checked bound query that outputs
  * booleans proving the estimate sits within the algorithm's published
  * error bound (computed against the Spark-side exact value).
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Flagship: all five sketches over documents grouped by lang (5 rows). */
  def entry(spark: SparkSession): DataFrame = {
    Graft.ensure(spark)
    docs(spark, "/root/testdata/sf0.001")
      .groupBy(col("lang"))
      .agg(
        expr("hll_estimate(hll_agg(cast(doc_id as string)))").as("ndv_est"),
        expr("ebf_info(ebf_agg(cast(doc_id as string)))").as("ebf"),
        expr("kll_quantile(kll_agg(cast(n_chars as double)), 0.5D)").as("median_chars"),
        expr("tdigest_quantile(tdigest_agg(cast(n_chars as double)), 0.99D)").as("p99_chars"),
        expr("cms_estimate(cms_agg(source), 'src0')").as("src0_freq_est"),
        count(lit(1)).as("n_docs")
      )
      .orderBy("lang")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = baseQueries ++
    graft.queries.SketchQueries.queries ++
    graft.queries.PipelineQueries.queries ++
    graft.queries.DataPipelineQueries.queries ++
    graft.queries.WebPagesQueries.queries ++
    graft.queries.RelationalQueries.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------- EBF
    "ebf_member_probe" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir)
      val sk = Ebf.fromBytes(
        d.select(expr("ebf_agg(cast(doc_id as string))")).head.getAs[Array[Byte]](0))
      val probe = Graft.ebfProbe(s, sk)
      d.select(col("doc_id"), probe(col("doc_id").cast("string")).as("hit"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------- HLL
    "hll_ndv_by_lang" -> { (s, dir) =>
      Graft.ensure(s)
      docs(s, dir).groupBy(col("lang"))
        .agg(expr("hll_estimate(hll_agg(cast(doc_id as string)))").as("ndv_est"))
        .orderBy("lang")
    },
    "hll_within_bound" -> { (s, dir) =>
      Graft.ensure(s)
      docs(s, dir).groupBy(col("lang"))
        .agg(
          expr("hll_estimate(hll_agg(cast(doc_id as string)))").as("est"),
          countDistinct(col("doc_id")).as("exact"))
        .select(col("lang"),
          (abs(col("est") - col("exact")) <=
            lit(3.0 * 1.04 / math.sqrt(4096.0)) * col("exact") + lit(3.0)).as("within_bound"))
        .orderBy("lang")
    },
    "exact_ndv_by_lang" -> { (s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("ndv"))
        .orderBy("lang")
    },
  )

  def oracleSql: Map[String, String] = baseOracleSql ++
    graft.queries.SketchQueries.oracleSql ++
    graft.queries.PipelineQueries.oracleSql ++
    graft.queries.DataPipelineQueries.oracleSql ++
    graft.queries.WebPagesQueries.oracleSql ++
    graft.queries.RelationalQueries.oracleSql

  private def baseOracleSql: Map[String, String] = Map(
    "ebf_member_probe" ->
      "SELECT doc_id, TRUE AS hit FROM documents ORDER BY doc_id",
    "hll_within_bound" ->
      "SELECT lang, TRUE AS within_bound FROM documents GROUP BY lang ORDER BY lang",
    "exact_ndv_by_lang" ->
      "SELECT lang, COUNT(DISTINCT doc_id) AS ndv FROM documents GROUP BY lang ORDER BY lang",
  )
}

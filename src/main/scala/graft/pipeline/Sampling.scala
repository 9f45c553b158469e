package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for corpus curation.
  *
  * Training-data pipelines need samples that are (a) reproducible
  * across runs and engines (no RNG state, no partition-order
  * dependence), (b) stable under re-partitioning, and (c) cheap at
  * 10^12 rows (a per-row hash compare, no shuffle). `rand(seed)` fails
  * (a)/(b): Spark seeds it per-partition, so the sample changes with
  * the partitioning. Here membership is decided by the md5 of the key
  * alone: `md5(key) < threshold` — the same predicate evaluates
  * identically in Spark, DuckDB, or any engine with md5, which is what
  * makes the driver-gate oracle exact.
  *
  * The threshold is a hex prefix: md5 output is uniform, so a
  * `prefixLen`-nibble threshold t keeps ~ t / 16^prefixLen of rows.
  */
object Sampling {

  /** Keep rows whose `md5(keyCol)` hex is lexicographically below
    * `thresholdHex` (lowercase). E.g. "28f5" keeps ~16% (0x28f5/65536). */
  def deterministicSample(df: DataFrame, keyCol: Column, thresholdHex: String): DataFrame = {
    require(thresholdHex.nonEmpty && thresholdHex.forall(c =>
      c.isDigit || (c >= 'a' && c <= 'f')), s"bad hex threshold: $thresholdHex")
    df.filter(substring(md5(keyCol.cast("string")), 1, thresholdHex.length) < thresholdHex)
  }

  /** Per-stratum thresholds (e.g. different rates per lang): strata
    * missing from the map are dropped. The rate column join is a
    * broadcast of a handful of rows; the filter stays a map-only hash
    * compare. */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
                       thresholds: Map[String, String]): DataFrame = {
    require(thresholds.nonEmpty)
    require(thresholds.values.map(_.length).toSet.size == 1,
      "all thresholds must have the same hex length")
    val spark = df.sparkSession
    import spark.implicits._
    val t = thresholds.toSeq.toDF("__stratum", "__threshold")
    df.join(broadcast(t), stratumCol === col("__stratum"), "inner")
      .filter(substring(md5(keyCol.cast("string")), 1,
        thresholds.values.head.length) < col("__threshold"))
      .drop("__stratum", "__threshold")
  }
}

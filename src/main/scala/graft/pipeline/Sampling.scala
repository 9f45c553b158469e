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

  /** Deterministic WEIGHTED sampling without replacement
    * (Efraimidis & Spirakis 2006, algorithm A-ES): per group, keep the
    * `n` rows with the largest `u^(1/w)` — equivalently the largest
    * `ln(u)/w`, which is what is computed (monotone transform, avoids
    * pow underflow at large weights). The uniform `u` derives from the
    * md5 of the key, NOT an RNG: 13 hex nibbles = 52 bits convert to a
    * double exactly, so any engine with md5 reproduces the identical
    * sample — the DuckDB driver-gate oracle compares the selected
    * id SETS row-for-row. Rows with weight <= 0 are never sampled.
    *
    * This is the weighted corpus-selection primitive (sample documents
    * proportional to a quality/length score within each lang/source
    * stratum). Plan shape at 10^12 rows: one hash exchange on the
    * group columns and a per-group sort — the standard top-n window;
    * for the UNgrouped case prefer a small `n` (Spark rewrites global
    * `orderBy.limit` to TakeOrdered, but the windowed form sorts one
    * partition). Ties are broken by the key for cross-engine
    * determinism (score ties are ~impossible for distinct keys). */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
                     n: Int, groupCols: Seq[Column] = Nil): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    // (v + 1) / (16^13 + 1): v in [0, 16^13) -> u in (0, 1) — never 0
    // (ln defined) and never 1 (ranks below any unweighted tie)
    val u = (conv(substring(md5(keyCol.cast("string")), 1, 13), 16, 10)
      .cast("double") + 1.0) / 4503599627370497.0
    val score = log(u) / weightCol.cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*)
      .orderBy(score.desc, keyCol.cast("string").asc)
    df.filter(weightCol > 0)
      .withColumn("__wr", row_number().over(w))
      .filter(col("__wr") <= n)
      .drop("__wr")
  }

  /** O77 — deterministic corpus MIXING: downsample strata so the output
    * approximates target proportions given as integer parts (e.g.
    * `en->4, de->2, zh->1`), keeping the largest feasible output — the
    * data-mixture step every LLM corpus release runs ("X% web, Y% code,
    * Z% reference"), here as one map-only hash-compare pass.
    *
    * Sizing: with parts w_s (sum W) and stratum counts n_s, the largest
    * total t honoring every proportion is t = min_s floor(n_s * W /
    * w_s); stratum s then keeps rate_s = t * w_s / (W * n_s) of its
    * rows (the binding stratum keeps everything). Membership is the
    * md5-threshold rule (object scaladoc), with per-stratum thresholds
    * floor(rate_s * 16^8) computed in EXACT integer arithmetic (BigInt)
    * — no floating-point in the cutoff, so any engine reproduces the
    * identical row set and the driver gate compares rows, not counts.
    * A rate-1 stratum gets the sentinel threshold "g" (every md5 hex
    * prefix sorts below 'g').
    *
    * The achieved proportions are binomial around the targets
    * (sigma/n_s ~ sqrt(rate(1-rate)/n_s)); the gate checks them within
    * 4 sigma. Strata absent from `parts` are dropped (not mixed in);
    * parts naming strata with no rows make t = 0 and are rejected.
    * Scale shape: one count aggregation (bounded by |strata|), a
    * broadcast of |strata| thresholds, and a codegen'd per-row compare
    * — no shuffle of the data itself. */
  def mixToParts(df: DataFrame, keyCol: Column, stratumCol: Column,
                 parts: Map[String, Long]): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "parts must be positive")
    val prefixLen = 8
    val scale = BigInt(16).pow(prefixLen)
    val w = parts.mapValues(BigInt(_))
    val wSum = w.values.sum
    val counts = df.filter(stratumCol.isin(parts.keys.toSeq: _*))
      .groupBy(stratumCol.as("__s")).count()
      .collect().map(r => r.getString(0) -> BigInt(r.getLong(1))).toMap
    val missing = parts.keySet -- counts.keySet
    require(missing.isEmpty, s"parts name strata with no rows: $missing")
    val t = counts.map { case (s, n) => n * wSum / w(s) }.min
    val thresholds = counts.map { case (s, n) =>
      val thr = t * w(s) * scale / (wSum * n)
      s -> (if (thr >= scale) "g" else {
        val hex = thr.toString(16)
        "0" * (prefixLen - hex.length) + hex
      })
    }
    val spark = df.sparkSession
    import spark.implicits._
    val tdf = thresholds.toSeq.toDF("__stratum", "__threshold")
    df.join(broadcast(tdf), stratumCol === col("__stratum"), "inner")
      .filter(substring(md5(keyCol.cast("string")), 1, prefixLen) < col("__threshold"))
      .drop("__stratum", "__threshold")
  }
}

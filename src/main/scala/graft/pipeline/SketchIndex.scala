package graft.pipeline

import graft.functions.Graft
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping: a sketch sidecar over a parquet dataset.
  *
  * The missing piece between "sketches as query answers" and "sketches
  * as infrastructure": one sidecar row per data file carrying the
  * file's row count, key min/max, and an EBF over its keys — the same
  * role as parquet zone maps + Delta/Iceberg bloom indexes, but as a
  * first-class table the engine's own aggregators build in one
  * distributed pass (`groupBy(input_file_name())`).
  *
  * Point lookups then touch only files that survive TWO prune stages:
  *   1. min/max — kills files whose key range can't hold any probe
  *      (pays off when the layout is range-clustered, e.g. written via
  *      [[RangePartition.byKll]]);
  *   2. EBF membership — kills in-range files that don't actually
  *      contain any probe (pays off exactly where zone maps can't:
  *      sparse/filtered key domains). No false negatives, so pruning
  *      NEVER loses rows; a false positive only admits an extra file,
  *      and the exact post-read filter keeps the result precise.
  *
  * Scale shape: the sidecar is ~1 row per data file (~800k rows for
  * 100 TB of 128 MB files — broadcast-size), probes broadcast against
  * it, and candidacy is a map-side semi-join. The only driver-side
  * materialization is the candidate FILE LIST — bounded by matching
  * files, the same thing any table format's planner collects. A
  * negative lookup (key absent from the dataset) reads ZERO data
  * files with probability (1 - fpr)^files, the classic bloom-index
  * win over pure zone maps.
  */
object SketchIndex {

  /** Build the sidecar: one row per file of the parquet dataset at
    * `path` — `[file, rows, mn, mx, sk]`. Keys are sketched as their
    * string form (probe-side must cast identically; [[candidates]]
    * and [[lookup]] do). One distributed pass, no shuffle beyond the
    * per-file groupBy (which AQE coalesces to the file count).
    */
  def build(spark: SparkSession, path: String, keyName: String): DataFrame = {
    Graft.ensure(spark)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyName)).as("mn"), max(col(keyName)).as("mx"),
        expr(s"ebf_agg(cast($keyName as string))").as("sk"))
  }

  /** Incremental maintenance: index ONLY files not already covered by
    * `existing` and return the refreshed sidecar (old rows + new
    * rows). At 100 TB a daily append adds ~0.1% of files — rebuilding
    * the sidecar from scratch would re-scan the whole dataset, while
    * this touches just the appended files (the file list comes from
    * the dataset's own listing; the anti-join against the existing
    * sidecar is driver-free and broadcast-size). Stats for already-
    * indexed files are reused as-is, so lookups through the refreshed
    * index are identical to a full rebuild (spec-asserted via a
    * tamper-survival proof — byte comparison alone can't distinguish
    * reuse from a deterministic rebuild).
    *
    * CONTRACT: `existing` must be a STORED sidecar — a frame whose
    * lineage does NOT read `path` (read it back from its own table).
    * A merely `.cache()`d build over `path` is silently REFRESHED by
    * Spark's cache invalidation when the append is written, which
    * degrades this call to a full rebuild with no error (measured —
    * see the gate query's history in PLANS.md PLAN33). That matches
    * real deployments anyway: the sidecar's whole point is to be a
    * persisted table that outlives the job that built it.
    */
  def update(spark: SparkSession, path: String, keyName: String,
             existing: DataFrame): DataFrame = {
    Graft.ensure(spark)
    val ds = spark.read.parquet(path)
    // the file LIST is driver-side (it is what any table format's
    // planner holds anyway); the scan below reads ONLY the new files
    val known = existing.select("file").collect().map(_.getString(0)).toSet
    val fresh = ds.inputFiles.filterNot(known)
    if (fresh.isEmpty) existing
    else {
      val idx = spark.read.schema(ds.schema).parquet(fresh.toIndexedSeq: _*)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"),
          min(col(keyName)).as("mn"), max(col(keyName)).as("mx"),
          expr(s"ebf_agg(cast($keyName as string))").as("sk"))
      existing.unionByName(idx)
    }
  }

  /** Files that might contain at least one probe key: the min/max
    * stage, then (if `useEbf`) the membership stage. Returns the
    * pruned sidecar (distributed; count it for prune stats, collect
    * `file` to plan the read). Null probes match nothing, mirroring
    * the aggregators' null-skipping.
    */
  def candidates(index: DataFrame, probes: DataFrame, useEbf: Boolean = true): DataFrame = {
    val key = probes.columns.head
    val p = broadcast(probes.select(col(key).as("__p")).filter(col("__p").isNotNull).distinct())
    val inRange = col("__p") >= col("mn") && col("__p") <= col("mx")
    val cond = if (useEbf)
      inRange && expr("ebf_might_contain(sk, cast(__p as string))")
    else inRange
    index.join(p, cond, "left_semi")
  }

  /** Exact point lookup through the index: read ONLY candidate files,
    * then the precise semi-join against the probe set. Row-identical
    * to filtering the full dataset (no false negatives); the empty
    * candidate set short-circuits to an empty frame without touching
    * any data file.
    */
  def lookup(spark: SparkSession, path: String, index: DataFrame,
             keyName: String, probes: DataFrame): DataFrame = {
    val files = candidates(index, probes).select("file").collect().map(_.getString(0))
    val schema = spark.read.parquet(path).schema
    val base =
      if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
    val key = probes.columns.head
    base.join(broadcast(probes.select(col(key).as(keyName)).filter(col(keyName).isNotNull).distinct()),
      Seq(keyName), "left_semi")
  }
}

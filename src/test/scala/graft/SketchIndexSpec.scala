package graft

import graft.functions.Graft
import graft.pipeline.SketchIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The data-skipping contract: pruning may only REMOVE files, never
  * rows — a lookup through the index is row-identical to filtering the
  * full dataset for any probe set, the EBF stage is at least as
  * selective as min/max alone, and an empty candidate set returns an
  * empty frame with the dataset's schema without touching data files.
  */
class SketchIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.ensure(s)
  }

  // sparse key domain (evens only) so in-range absences exist
  private def dataset: DataFrame =
    spark.range(0, 2000).select((col("id") * 2).as("k"),
      (col("id") % 7).as("v"))

  private def staged(f: (String, DataFrame) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_si_spec").toString
    try {
      dataset.repartitionByRange(8, col("k")).write.mode("overwrite").parquet(tmp)
      f(tmp, SketchIndex.build(spark, tmp, "k"))
    } finally graft.util.GraftFiles.deleteRecursively(tmp)
  }

  private def probesOf(ks: Seq[Long]): DataFrame = {
    import spark.implicits._
    ks.toDF("k")
  }

  test("sidecar covers every file and conserves row counts") {
    staged { (_, idx) =>
      val rows = idx.collect()
      assert(rows.length == 8)
      assert(rows.map(_.getAs[Long]("rows")).sum == 2000L)
      assert(rows.forall(r => r.getAs[Long]("mn") <= r.getAs[Long]("mx")))
    }
  }

  test("lookup == full-scan filter for mixed present/absent/out-of-range probes") {
    staged { (path, idx) =>
      val probes = probesOf(Seq(0L, 2L, 1999L, 3998L, -4L, 700001L, 123L, 456L))
      val got = SketchIndex.lookup(spark, path, idx, "k", probes)
        .orderBy("k").collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v")))
      val want = dataset.join(probes, Seq("k"), "left_semi")
        .orderBy("k").collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v")))
      assert(got.toSeq === want.toSeq)
      assert(got.nonEmpty)
    }
  }

  test("EBF stage is at least as selective as min/max and loses no hit files") {
    staged { (_, idx) =>
      // odd keys: all inside the global range, none present
      val absent = probesOf(Seq(11L, 501L, 1001L, 2501L, 3501L))
      val mm = SketchIndex.candidates(idx, absent, useEbf = false).count()
      val both = SketchIndex.candidates(idx, absent).count()
      assert(mm == 5L) // one range file per probe
      assert(both <= mm)
      // present keys: their files must survive the EBF stage
      val present = probesOf(Seq(0L, 1000L, 3998L))
      assert(SketchIndex.candidates(idx, present).count() >= 3L)
    }
  }

  test("out-of-range probe set reads zero files and returns empty with schema") {
    staged { (path, idx) =>
      val probes = probesOf(Seq(-100L, 999999L))
      assert(SketchIndex.candidates(idx, probes).count() == 0L)
      val out = SketchIndex.lookup(spark, path, idx, "k", probes)
      assert(out.count() == 0L)
      assert(out.columns.toSeq === Seq("k", "v"))
    }
  }

  test("null probes match nothing instead of NPE-ing") {
    staged { (path, idx) =>
      import spark.implicits._
      val probes = Seq[java.lang.Long](null, 4L).toDF("k")
      val got = SketchIndex.lookup(spark, path, idx, "k", probes).collect()
      assert(got.map(_.getAs[Long]("k")).toSeq === Seq(4L))
    }
  }

  test("incremental update scans only appended files; lookups match a full rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_si_upd").toString
    val sideTmp = java.nio.file.Files.createTempDirectory("graft_si_side").toString
    try {
      dataset.repartitionByRange(8, col("k")).write.mode("overwrite").parquet(tmp)
      // the CONTRACT: the sidecar is a STORED table (a cached build
      // over `tmp` would be silently recached to a full rebuild by
      // the append below — see update()'s scaladoc)
      SketchIndex.build(spark, tmp, "k").write.mode("overwrite").parquet(sideTmp)
      // tamper one day-1 row: if update truly REUSES existing rows,
      // the tamper survives; a rebuild would erase it (deterministic
      // builds make byte-comparison alone unable to prove reuse)
      val idx0 = spark.read.parquet(sideTmp)
        .withColumn("rows", when(col("mn") === 0L, lit(424242L)).otherwise(col("rows")))
      val files0 = idx0.count()
      // no new files -> the same frame comes back untouched
      assert(SketchIndex.update(spark, tmp, "k", idx0).count() == files0)
      // append a batch with NEW keys (odds above the old domain)
      spark.range(0, 500).select((col("id") * 2 + 9000).as("k"), (col("id") % 7).as("v"))
        .repartition(3).write.mode("append").parquet(tmp)
      val updated = SketchIndex.update(spark, tmp, "k", idx0).cache()
      val rebuilt = SketchIndex.build(spark, tmp, "k").cache()
      assert(updated.count() == files0 + 3, s"expected ${files0 + 3} files, got ${updated.count()}")
      assert(updated.count() == rebuilt.count())
      // the tampered day-1 row survived: update did NOT rescan it
      assert(updated.filter(col("rows") === 424242L).count() == 1L)
      // every other row identical to the rebuild file-for-file
      val mismatch = updated.as("u").join(rebuilt.as("r"), "file")
        .filter(col("u.rows") =!= lit(424242L))
        .filter(col("u.rows") =!= col("r.rows") || col("u.mn") =!= col("r.mn") ||
          col("u.mx") =!= col("r.mx") || col("u.sk") =!= col("r.sk")).count()
      assert(mismatch == 0L)
      // a lookup that needs BOTH old and new files is row-identical to
      // the full-scan filter through either index
      val probes = probesOf(Seq(4L, 9002L, 9998L))
      val viaUpdated = SketchIndex.lookup(spark, tmp, updated, "k", probes)
        .orderBy("k").collect()
      val viaRebuilt = SketchIndex.lookup(spark, tmp, rebuilt, "k", probes)
        .orderBy("k").collect()
      assert(viaUpdated.toSeq === viaRebuilt.toSeq)
      assert(viaUpdated.map(_.getAs[Long]("k")).toSeq === Seq(4L, 9002L, 9998L))
      updated.unpersist(); rebuilt.unpersist()
    } finally {
      graft.util.GraftFiles.deleteRecursively(tmp)
      graft.util.GraftFiles.deleteRecursively(sideTmp)
    }
  }
}

package graft.pipeline

import graft.pipeline.SaltedAgg.SketchSpec
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** O12 — checkpoint-resumable bulk sketch build with per-chunk lineage
  * and metrics (BASELINE.json:north_rule "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * The 10^12-row story (SURVEY.md §3 E3): a single monolithic
  * aggregation over 100 TB cannot survive driver loss and re-runs from
  * zero. Instead the input is split into `numChunks` deterministic
  * hash-chunks; each chunk is one bounded Spark job writing per-group
  * sketches to `outDir/chunks/chunk=<i>/` plus a manifest line carrying
  * lineage (chunk id, row count, input fingerprint, wall time, group
  * count). A restart replays the manifest, skips completed chunks whose
  * lineage matches, and re-runs only the remainder. The final pass
  * re-aggregates all chunk outputs with the `*_merge_agg` aggregators —
  * correct under arbitrary chunk completion order because sketch merge
  * is associative and commutative (the §2.1 theorem), which is exactly
  * why chunked execution cannot change the result.
  *
  * The input fingerprint (order-independent sum of xxhash64 over the
  * chunk key) detects input drift between the original run and a
  * resume: a mismatch fails the resume instead of silently merging
  * sketches of different data.
  */
object CheckpointRunner {

  final case class ChunkRecord(chunk: Int, numChunks: Int, rows: Long,
                               fingerprint: Long, groups: Long, durationMs: Long, ts: Long)

  /** Thrown when a resume sees a completed chunk whose recorded input
    * fingerprint no longer matches the current input. */
  final class LineageMismatch(msg: String) extends RuntimeException(msg)

  def manifestPath(outDir: String): java.nio.file.Path = Paths.get(outDir, "manifest.jsonl")

  /** Order-independent content fingerprint of a key column: sum of
    * xxhash64 in decimal(38,0) (no ANSI long overflow even at 10^12
    * rows), folded into a long via mod 2^61-1. */
  private def fingerprintAgg(chunkKey: Column): Column =
    pmod(sum(xxhash64(chunkKey).cast(org.apache.spark.sql.types.DecimalType(38, 0))),
      lit(new java.math.BigDecimal(2305843009213693951L)))
      .cast("long")

  def readManifest(outDir: String): Seq[ChunkRecord] = {
    val p = manifestPath(outDir)
    if (!Files.exists(p)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map(parseRecord)
  }

  // minimal flat-JSON codec (keys are fixed, values numeric)
  private def renderRecord(r: ChunkRecord): String =
    s"""{"chunk":${r.chunk},"numChunks":${r.numChunks},"rows":${r.rows},""" +
      s""""fingerprint":${r.fingerprint},"groups":${r.groups},""" +
      s""""durationMs":${r.durationMs},"ts":${r.ts}}"""

  private def parseRecord(line: String): ChunkRecord = {
    def field(name: String): Long = {
      val m = java.util.regex.Pattern.compile("\"" + name + "\":(-?\\d+)").matcher(line)
      require(m.find(), s"manifest line missing $name: $line")
      m.group(1).toLong
    }
    ChunkRecord(field("chunk").toInt, field("numChunks").toInt, field("rows"),
      field("fingerprint"), field("groups"), field("durationMs"), field("ts"))
  }

  /** Run (or resume) a chunked sketch build.
    *
    * @param chunkKey      deterministic column hashed into chunk ids AND
    *                      fingerprinted for lineage (use the row key, e.g. url)
    * @param stopAfter     complete at most this many *new* chunks then
    *                      return null (simulates a killed job for
    *                      resume tests); default unlimited
    * @return the final merged per-group sketch DataFrame (null if
    *         stopped early by `stopAfter`)
    */
  def run(spark: SparkSession, input: DataFrame, chunkKey: Column, numChunks: Int,
          keys: Seq[String], specs: Seq[SketchSpec], outDir: String,
          stopAfter: Int = Int.MaxValue,
          // Re-fingerprinting every completed chunk on resume is one
          // extra input scan; at 100 TB turn this off (or sample) once
          // the input is known-immutable — the manifest still guards
          // against numChunks drift.
          verifyLineageOnResume: Boolean = true): DataFrame = {
    require(numChunks >= 1)
    Files.createDirectories(Paths.get(outDir))
    val done = readManifest(outDir)
    done.find(_.numChunks != numChunks).foreach { r =>
      throw new LineageMismatch(
        s"manifest written with numChunks=${r.numChunks}, now $numChunks")
    }
    val doneIds = done.map(_.chunk).toSet
    val chunkOf = pmod(xxhash64(chunkKey), lit(numChunks))

    var completedNow = 0
    var chunk = 0
    while (chunk < numChunks && completedNow < stopAfter) {
      if (!doneIds.contains(chunk)) {
        val t0 = System.nanoTime()
        val chunkDf = input.filter(chunkOf === lit(chunk))
        val aggs = specs.map(sp => sp.build.as(sp.name)) ++ Seq(
          count(lit(1)).as("__rows"),
          // order-independent content fingerprint of the chunk's keys
          fingerprintAgg(chunkKey).as("__fp"))
        val grouped = chunkDf.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
        val chunkDir = s"$outDir/chunks/chunk=$chunk"
        grouped.write.mode(SaveMode.Overwrite).parquet(chunkDir)
        // lineage totals from the (small) written sketch table
        // per-group fps are already mod 2^61-1; modular re-fold across
        // groups equals the fold of the raw total sum
        val stats = spark.read.parquet(chunkDir)
          .agg(coalesce(sum("__rows"), lit(0L)),
            coalesce(pmod(sum(col("__fp").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
              lit(new java.math.BigDecimal(2305843009213693951L))).cast("long"), lit(0L)),
            count(lit(1)))
          .head()
        val rec = ChunkRecord(chunk, numChunks, stats.getLong(0), stats.getLong(1),
          stats.getLong(2), (System.nanoTime() - t0) / 1000000L, System.currentTimeMillis())
        Files.write(manifestPath(outDir), (renderRecord(rec) + "\n").getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        completedNow += 1
      } else if (verifyLineageOnResume) {
        // resumed chunk: verify lineage against current input
        val rec = done.find(_.chunk == chunk).get
        val cur = input.filter(chunkOf === lit(chunk))
          .agg(count(lit(1)), coalesce(fingerprintAgg(chunkKey), lit(0L))).head()
        if (cur.getLong(0) != rec.rows || cur.getLong(1) != rec.fingerprint)
          throw new LineageMismatch(
            s"chunk $chunk input drifted: manifest (rows=${rec.rows}, fp=${rec.fingerprint}) " +
              s"vs current (rows=${cur.getLong(0)}, fp=${cur.getLong(1)})")
      }
      chunk += 1
    }
    if (chunk < numChunks) return null // stopped early (kill simulation)

    // final pass: re-aggregate all chunk sketches (associative merge)
    val all = spark.read.parquet(s"$outDir/chunks")
    val mergeAggs = specs.map(sp => expr(s"${sp.mergeFn}(${sp.name})").as(sp.name)) ++
      Seq(sum("__rows").as("rows"))
    all.groupBy(keys.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }
}

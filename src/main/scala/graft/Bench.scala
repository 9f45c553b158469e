package graft

import graft.data.WebPagesGen
import graft.functions.Graft
import graft.pipeline.Flagship
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line on stdout.
  *
  * Contract fields: metric/value/unit/sf (value = total seconds across
  * the driver-contract queries at SPARK_GRAFT_SF_DIR). Extra fields
  * carry the BASELINE.md protocol evidence: the flagship
  * sketch-build+merge throughput (docs/sec) on the synthetic webpages
  * bench table at TWO parallelism levels — local[8] (N) vs local[32]
  * (4N), the sandbox surrogate for N vs 4N executors — with the scaling
  * efficiency and the FPR-within-bound check riding the same run.
  *
  * The stdout line deliberately does NOT carry the per-query timing map:
  * rounds 1 and 2 both arrived driver-side truncated ("parsed": null)
  * because the ~60-entry map pushed the line past the driver's
  * tail-capture window. The line now carries only scalars + the failed
  * list (bounded; a BenchLineSpec asserts < 1500 bytes rendered), and
  * the full per-query map + nested flagship records live in
  * BENCH/result.json, referenced by the line's "detail" field.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
  * (default 32), SPARK_GRAFT_CPUS_LOW (default cpus/4),
  * SPARK_GRAFT_BENCH_ROWS (default 32M; the table is generated once
  * and cached on disk), SPARK_GRAFT_TRIALS (default 5 — min-of-N per
  * phase; 5 damps the shared-VM variance that put the builder's own
  * r2 efficiency readings anywhere in 0.58-0.80),
  * SPARK_GRAFT_SCALING=0 to skip the low-parallelism run.
  */
object Bench {

  /** The driver-contract stdout line, extracted for the size spec:
    * every field is a scalar or the (normally empty, always BOUNDED)
    * failed list — per-query timings intentionally excluded (see
    * object scaladoc). A catastrophic round failing all ~66 queries
    * must not overflow the line either, so at most 8 failed names ride
    * it; `failed_count` always carries the true total and
    * BENCH/result.json the full list. */
  private[graft] def contractLine(totalSec: Double, nQueries: Int, sfDir: String,
                                  failed: Seq[String], headline: String): String = {
    val failedJson = failed.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    f"""{"metric":"total","value":$totalSec%.2f,"unit":"sec","sf":"$sfDir",""" +
      s""""queries_count":$nQueries,"failed_count":${failed.size},""" +
      s""""failed":$failedJson$headline,""" +
      s""""detail":"BENCH/result.json"}"""
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the bench table is only ~2.6GB: at the 128MB default it splits
      // into ~21 scan tasks, starving 32 cores. At 100TB the default is
      // fine (splits >> cores); here split smaller so scan parallelism
      // matches the core count.
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Confine ALL threads of this JVM to the first `n` cores via
    * taskset(1). local[8] on a 32-core box is NOT an 8-core cluster:
    * GC, JIT-compiler, Netty and Parquet reader threads spill onto the
    * 24 idle cores, inflating the low-parallelism throughput and
    * systematically deflating the measured N->4N scaling efficiency.
    * Whole-process sched_setaffinity is the honest small-cluster
    * emulation (an 8-executor cluster does not get 32 cores of GC) —
    * if anything it is pessimistic for the low level, since the JVM
    * sized its GC/JIT thread pools for 32 cores at startup and those
    * now timeshare n. Returns whether the confinement was applied;
    * non-fatal (bench proceeds unconfined) if taskset is missing. */
  private[graft] def confineToCores(n: Int): Boolean = try {
    val pid = ProcessHandle.current().pid()
    val p = new ProcessBuilder("taskset", "-a", "-p", "-c", s"0-${n - 1}", pid.toString)
      .redirectErrorStream(true).start()
    p.getInputStream.readAllBytes() // drain (-a prints one line per thread)
    p.waitFor() == 0
  } catch { case _: Throwable => false }

  /** Pure-JVM calibration of the BOX's thread-scaling ceiling: the
    * flagship's dominant kernel (EBF inserts) run on plain threads with
    * zero Spark overhead. On dedicated hardware this scales ~linearly;
    * on this shared VM it measures how much 8->32-thread speedup the
    * host actually grants, which upper-bounds any Spark job's
    * measurable scaling efficiency. Reported in the bench JSON so the
    * Spark numbers can be read against the machine floor. */
  private def calibrate(threads: Int, keysPerThread: Int = 4000000): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val chunk = 250000 // fresh sketch per chunk bounds memory to ~12MB/thread
    try {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val tasks = (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var done = 0
              while (done < keysPerThread) {
                val e = graft.core.Ebf.empty(4096, 5, 16, 1, 8, Graft.SketchSeed)
                var i = 0
                while (i < chunk) { e.insert(t.toLong * keysPerThread + done + i); i += 1 }
                done += chunk
              }
            }
          })
        }
        tasks.foreach(_.get())
        threads.toDouble * keysPerThread / ((System.nanoTime() - t0) / 1e9)
      }.max
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 32M default: at 16M, per-phase fixed costs (job scheduling, scan
    // setup, codegen, the sampling pre-pass) are a large enough share of
    // local[32] phase times to dominate the measured 8->32 efficiency
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "32000000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") == "1"
    val benchPath = s"/root/repo/data/webpages/bench_$benchRows"

    val warmupPath = "/root/repo/data/webpages/test"

    // generate the bench + warmup tables once (excluded from timings)
    {
      val s = session(cpus)
      WebPagesGen.ensureTable(s, benchPath, benchRows, numHosts = 10000)
      WebPagesGen.ensureTable(s, warmupPath, 50000L, numHosts = 2000)
      s.stop()
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Per-phase minima over N trials estimate engine capability:
    // multi-second swings between identical trials on this shared VM
    // are environmental (the in-bench calibration kernel quantifies
    // the box's wandering ceiling). Raw per-trial numbers go to stderr
    // for the record. nProbes=0 skips the FPR probe phase — used for
    // the low-parallelism scaling trials, where only the phase-1..3
    // throughput enters the metric and the FPR evidence rides the
    // high-parallelism run.
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt
    def bestOf(s: SparkSession, label: String, nProbes: Long = 1000000L): Flagship.Result = {
      val rs = (1 to trials).map { i =>
        val r = Flagship.run(s, benchPath, nProbes = nProbes)
        System.err.println(f"[bench] $label trial $i: perHost=${r.buildPerHostSec}%.2f " +
          f"cms=${r.cmsTokensSec}%.2f ebf=${r.globalEbfSec}%.2f probe=${r.probeSec}%.2f")
        r
      }
      val base = rs.maxBy(_.docsPerSec)
      val t1 = rs.map(_.buildPerHostSec).min
      val t2 = rs.map(_.cmsTokensSec).min
      val t3 = rs.map(_.globalEbfSec).min
      base.copy(buildPerHostSec = t1, cmsTokensSec = t2, globalEbfSec = t3,
        probeSec = rs.map(_.probeSec).min,
        docsPerSec = base.rows.toDouble / (t1 + t2 + t3))
    }

    // N for the N-vs-4N pair (defaults to cpus/4 so a driver-chosen
    // SPARK_GRAFT_CPUS always yields a sane pair); a small warmup run
    // precedes each timed batch so JIT/codegen lands outside the window
    val cpusLow = sys.env.get("SPARK_GRAFT_CPUS_LOW").map(_.toInt)
      .getOrElse(math.max(2, cpus / 4))
    // The entire low-parallelism batch (its calibration AND its Spark
    // trials) runs with the whole JVM confined to cpusLow cores — see
    // confineToCores. The mask is restored to the full core set before
    // the high-parallelism batch.
    var confined = false
    val (calib: Option[(Double, Double)], low: Option[Flagship.Result]) =
      if (doScaling) {
        confined = confineToCores(cpusLow)
        System.err.println(s"[bench] affinity confined to $cpusLow cores: $confined")
        val lo = calibrate(cpusLow)
        val s = session(cpusLow)
        Flagship.run(s, warmupPath, nProbes = 0)
        val r = bestOf(s, s"local$cpusLow", nProbes = 0)
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        confineToCores(cpus)
        val hi = calibrate(cpus)
        System.err.println(f"[bench] calibration: $cpusLow threads ${lo / 1e6}%.1f M inserts/s, " +
          f"$cpus threads ${hi / 1e6}%.1f M inserts/s, efficiency ${hi / (lo * cpus / cpusLow)}%.3f")
        (Some((lo, hi)), Some(r))
      } else (None, None)

    // 4N = local[cpus] flagship + per-query timings
    val spark = session(cpus)
    Flagship.run(spark, warmupPath)
    val high = bestOf(spark, s"local$cpus")

    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val queryList =
      if (doQueries) SparkEntry.queries.toSeq.sortBy(_._1)
      else Seq.empty[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]
    val results = queryList.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes EVERY output column (a bare count() lets
      // Catalyst prune the expensive expressions out of the timing)
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          false
      }
      // -1 marks a failed query so a consumer can't mistake a partial
      // elapsed time for a passing run
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val efficiency = low.map(l => high.docsPerSec / ((cpus.toDouble / cpusLow) * l.docsPerSec))

    def flagshipJson(r: Flagship.Result): String =
      s"""{"rows":${r.rows},"host_groups":${r.hostGroups},""" +
        f""""build_per_host_sec":${r.buildPerHostSec}%.2f,"cms_tokens_sec":${r.cmsTokensSec}%.2f,""" +
        f""""global_ebf_sec":${r.globalEbfSec}%.2f,"probe_sec":${r.probeSec}%.2f,""" +
        f""""docs_per_sec":${r.docsPerSec}%.0f,"fpr_measured":${r.fprMeasured}%.6f,""" +
        f""""fpr_bound":${r.fprBound}%.6f,"ebf_level":${r.ebfLevel},""" +
        s""""false_negatives":${r.falseNegatives}}"""

    // headline flagship fields, inlined (not nested objects) to keep
    // the stdout contract line SHORT; full detail goes to
    // BENCH/result.json instead
    val head = new StringBuilder
    head.append(f""","flagship_docs_per_sec":${high.docsPerSec}%.0f""")
    efficiency.foreach(e => head.append(f""","scaling_efficiency":$e%.3f"""))
    head.append(s""","scaling_pair":[$cpusLow,$cpus]""")
    if (doScaling) head.append(s""","affinity_confined":$confined""")
    low.foreach(l => head.append(f""","docs_per_sec_local$cpusLow":${l.docsPerSec}%.0f"""))
    head.append(f""","fpr_measured":${high.fprMeasured}%.6f,"fpr_bound":${high.fprBound}%.6f""")
    head.append(s""","false_negatives":${high.falseNegatives}""")
    calib.foreach { case (lo, hi) =>
      val calibEff = hi / (lo * cpus / cpusLow)
      head.append(f""","calibration_efficiency":$calibEff%.3f""")
      head.append(f""","calibration_minserts_per_sec":[${lo / 1e6}%.1f,${hi / 1e6}%.1f]""")
      // Spark scaling read against the machine floor: the calibration
      // kernel (pure-JVM threaded EBF inserts, zero Spark) bounds what
      // this shared VM's cores+memory actually grant from N to 4N
      // threads; >= 1.0 here means the engine scales at least as well
      // as the box itself
      efficiency.foreach(e =>
        head.append(f""","scaling_vs_machine_floor":${e / calibEff}%.3f"""))
    }

    val line = contractLine(total, results.size, sfDir, failed.toSeq, head.result())

    // full record: per-query timing map + nested flagship objects at
    // both parallelism levels (everything the stdout line omits)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val extras = new StringBuilder
    extras.append(s""","flagship_local$cpus":${flagshipJson(high)}""")
    low.foreach(l => extras.append(s""","flagship_local$cpusLow":${flagshipJson(l)}"""))
    // per-lang heavy hitters from the fused phase-2 aggregation (the
    // north star's "heavy-hitter token frequencies", enumerated)
    val topJson = high.topTokensPerLang.toSeq.sortBy(_._1).map { case (lang, toks) =>
      "\"" + lang + "\":" + toks.map("\"" + _ + "\"").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    extras.append(s""","top_tokens":$topJson""")
    val full =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","failed":$failedJson${head.result()}${extras.result()}}"""
    try {
      val out = java.nio.file.Paths.get("/root/repo/BENCH/result.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, full + "\n")
    } catch {
      case e: Throwable => System.err.println(s"[bench] could not write result.json: $e")
    }

    spark.stop()
    // the contract line goes LAST so tail-capture cannot truncate it
    println(line)
  }
}

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
  * efficiency and the FPR-within-bound check riding the same run. The
  * low level runs with the whole JVM taskset-confined to N cores, and
  * the two levels are measured as interleaved adjacent trial PAIRS
  * (median of per-pair ratios, each pair carrying its own machine-floor
  * calibration) — see the scaling-protocol comment in main().
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

  private[graft] def session(cpus: Int): SparkSession = {
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
      .config("spark.sql.files.maxPartitionBytes",
        (sys.env.get("SPARK_GRAFT_MAX_PART_MB").flatMap(_.trim.toIntOption)
          .getOrElse(32) * 1024 * 1024).toString)
      // A/B knob: start AQE from finer-grained shuffle partitions (it
      // can only coalesce, never split) so reduce-side stragglers don't
      // idle cores at the stage tail; 1 = plain cpus partitions.
      // Measured at mult=4 (32M flagship, 3 trials): phase minima 47.0s
      // vs 45.8s at mult=1 — within trial noise, so the default stays 1
      // (the reduce tail is not what limits 8->32 scaling here)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus * sys.env.get("SPARK_GRAFT_SHUFFLE_MULT")
          .flatMap(v => v.trim.toIntOption).filter(_ >= 1).getOrElse(1)).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      // A/B knob: shuffle/broadcast compression codec. zstd writes
      // ~30% smaller shuffle blocks than lz4 for these hash-heavy rows
      // at more decode CPU — trading shared DRAM bandwidth (the
      // non-scaling resource on one box) for compute (which scales
      // with cores); measured in PLAN15
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))
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
  private[graft] def calibrate(threads: Int, reps: Int = 3, keysPerThread: Int = 4000000): Double = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val chunk = 250000 // fresh sketch per chunk bounds memory to ~12MB/thread
    try {
      (1 to reps).map { _ =>
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
    // Bench-scale warmup table (r5): the 50K warmup JIT-compiles the
    // code paths but does not reach C2 tiering on the hot kernels or
    // touch the bench table's page cache — r4's confined local[8]
    // perHost trials declined monotonically 210.6 -> 91.5 -> 74.2 s
    // across the driver window, i.e. the first pairs measured warmup
    // residue, not engine scaling. 2M rows (~1/16 of the bench table)
    // runs the warmup in a few seconds per level while pushing the hot
    // loops well past JIT tiering thresholds.
    val warmup2mPath = "/root/repo/data/webpages/warmup_2000000"

    // generate the bench + warmup tables once (excluded from timings)
    {
      val s = session(cpus)
      WebPagesGen.ensureTable(s, benchPath, benchRows, numHosts = 10000)
      WebPagesGen.ensureTable(s, warmupPath, 50000L, numHosts = 2000)
      WebPagesGen.ensureTable(s, warmup2mPath, 2000000L, numHosts = 10000)
      s.stop()
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Pre-touch the bench table into the OS page cache, UNtimed and
    // unconfined: r4's first confined low-level trial paid the cold
    // read of the full zstd table at 8 cores inside its measured
    // window (part of the 210 s outlier above). A plain parallel file
    // read warms the cache in seconds at full parallelism; trials then
    // measure compute, not first-touch I/O. (On a real cluster the
    // executors' first scan pays this once too — but the scaling
    // metric is about CPU scaling, not one cold read.)
    locally {
      // recursive: the table is partitionBy(lang) — files live in
      // lang=* subdirectories
      val files = {
        val out = Array.newBuilder[java.io.File]
        def walk(d: java.io.File): Unit =
          Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
            if (f.isDirectory) walk(f)
            else if (f.getName.endsWith(".parquet")) out += f
          }
        walk(new java.io.File(benchPath))
        out.result()
      }
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      try {
        val t0 = System.nanoTime()
        val buf = new ThreadLocal[Array[Byte]] {
          override def initialValue(): Array[Byte] = new Array[Byte](1 << 20)
        }
        files.map { f =>
          pool.submit(new Runnable {
            def run(): Unit = {
              val in = new java.io.FileInputStream(f)
              try { while (in.read(buf.get()) >= 0) () } finally in.close()
            }
          })
        }.foreach(_.get())
        System.err.println(f"[bench] page-cache pre-touch: ${files.length} files, " +
          f"${files.map(_.length).sum / 1e9}%.1f GB in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } finally pool.shutdown()
    }

    // Per-phase minima over N trials estimate engine capability:
    // multi-second swings between identical trials on this shared VM
    // are environmental (the in-bench calibration kernel quantifies
    // the box's wandering ceiling). Raw per-trial numbers go to stderr
    // for the record. nProbes=0 skips the FPR probe phase — used for
    // the low-parallelism scaling trials, where only the phase-1..3
    // throughput enters the metric and the FPR evidence rides the
    // high-parallelism run.
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt

    def runOnce(nCpus: Int, nProbes: Long, label: String, i: Int): Flagship.Result = {
      val s = session(nCpus)
      try {
        val r = Flagship.run(s, benchPath, nProbes = nProbes)
        System.err.println(f"[bench] $label trial $i: perHost=${r.buildPerHostSec}%.2f " +
          f"cms=${r.cmsTokensSec}%.2f ebf=${r.globalEbfSec}%.2f probe=${r.probeSec}%.2f")
        r
      } finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
    def phaseSum(r: Flagship.Result): Double =
      r.buildPerHostSec + r.cmsTokensSec + r.globalEbfSec
    def composite(rs: Seq[Flagship.Result]): Flagship.Result = {
      val base = rs.maxBy(_.docsPerSec)
      val t1 = rs.map(_.buildPerHostSec).min
      val t2 = rs.map(_.cmsTokensSec).min
      val t3 = rs.map(_.globalEbfSec).min
      base.copy(buildPerHostSec = t1, cmsTokensSec = t2, globalEbfSec = t3,
        probeSec = rs.map(_.probeSec).min,
        docsPerSec = base.rows.toDouble / (t1 + t2 + t3))
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // N for the N-vs-4N pair (defaults to cpus/4 so a driver-chosen
    // SPARK_GRAFT_CPUS always yields a sane pair)
    val cpusLow = sys.env.get("SPARK_GRAFT_CPUS_LOW").map(_.toInt)
      .getOrElse(math.max(2, cpus / 4))

    // Scaling protocol (N vs 4N on one shared box):
    //   1. The low level runs with the WHOLE JVM confined to cpusLow
    //      cores (confineToCores) — local[8] on an unconfined 32-core
    //      box is not an 8-core cluster (GC/JIT/IO threads spill onto
    //      the idle cores and inflate low-level throughput).
    //   2. Low and high trials are INTERLEAVED as adjacent pairs, each
    //      pair preceded by its own machine-floor calibration at both
    //      thread counts, and the reported efficiency is the MEDIAN of
    //      per-pair ratios. The previous batched design (all low
    //      trials, then all high) let box-load drift between the two
    //      batches contaminate the ratio directly: one polluted batch
    //      moved measured efficiency by up to 2x on this host.
    // Per-pair efficiency uses each trial's own phase sum (not
    // cross-trial minima) so both sides of a ratio come from the SAME
    // minutes on the box; the composite (min-per-phase) results still
    // feed the headline throughput and FPR evidence.
    var confined = false
    case class PairStats(eff: Vector[Double], calibEff: Vector[Double],
                         vsFloor: Vector[Double], calLo: Vector[Double], calHi: Vector[Double],
                         lowRs: Vector[Flagship.Result], highRs: Vector[Flagship.Result])
    val (pairs: Option[PairStats], low: Option[Flagship.Result], highPaired: Option[Flagship.Result]) =
      if (doScaling) try {
        confined = confineToCores(cpusLow)
        System.err.println(s"[bench] affinity confined to $cpusLow cores: $confined")
        // JIT/codegen warmup at each level, outside every timed window —
        // at BENCH-like scale (the 2M-row table; see warmup2mPath note)
        // so C2 tiering on the hot kernels amortizes before pair 1, not
        // inside it.
        // try/finally: a leaked SparkContext would make every later
        // session(cpus).getOrCreate silently reuse the low-parallelism
        // context (getOrCreate ignores the new master), mislabeling all
        // subsequent numbers
        locally {
          val s = session(cpusLow)
          try Flagship.run(s, warmup2mPath, nProbes = 0) finally {
            s.stop()
            SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
          }
        }
        confineToCores(cpus)
        locally {
          val s = session(cpus)
          try Flagship.run(s, warmup2mPath) finally {
            s.stop()
            SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
          }
        }
        val lowRs = Vector.newBuilder[Flagship.Result]
        val highRs = Vector.newBuilder[Flagship.Result]
        val effs = Vector.newBuilder[Double]
        val cEffs = Vector.newBuilder[Double]
        val vsFs = Vector.newBuilder[Double]
        val cLos = Vector.newBuilder[Double]
        val cHis = Vector.newBuilder[Double]
        for (i <- 1 to trials) {
          confineToCores(cpusLow)
          val cLo = calibrate(cpusLow, reps = 2)
          val rLo = runOnce(cpusLow, 0, s"local$cpusLow", i)
          confineToCores(cpus)
          val cHi = calibrate(cpus, reps = 2)
          val rHi = runOnce(cpus, 1000000L, s"local$cpus", i)
          val eff = (rHi.rows / phaseSum(rHi)) / (rLo.rows / phaseSum(rLo)) / (cpus.toDouble / cpusLow)
          val cEff = cHi / (cLo * cpus / cpusLow)
          System.err.println(f"[bench] pair $i: eff=$eff%.3f floor=$cEff%.3f vs_floor=${eff / cEff}%.3f " +
            f"(calib ${cLo / 1e6}%.1f -> ${cHi / 1e6}%.1f M inserts/s)")
          lowRs += rLo; highRs += rHi
          effs += eff; cEffs += cEff; vsFs += eff / cEff; cLos += cLo; cHis += cHi
        }
        val lowV = lowRs.result()
        val highV = highRs.result()
        (Some(PairStats(effs.result(), cEffs.result(), vsFs.result(), cLos.result(),
          cHis.result(), lowV, highV)),
          Some(composite(lowV)), Some(composite(highV)))
      } catch {
        // a dead scaling phase must not take the driver contract line
        // with it: restore the full mask and fall through to the
        // query-sweep session, which re-runs the flagship at the high
        // level (the line then carries throughput/FPR without the
        // scaling fields rather than nothing at all)
        case e: Throwable =>
          System.err.println(s"[bench] scaling phase failed, continuing without it: $e")
          confined = false // no confined measurement survives into the line
          confineToCores(cpus)
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          (None, None, None)
      } else (None, None, None)

    // query-sweep session (also hosts the flagship trials when the
    // scaling pairs were skipped)
    val spark = session(cpus)
    val high = highPaired.getOrElse {
      try {
        Flagship.run(spark, warmup2mPath)
        composite((1 to trials).map { i =>
          val r = Flagship.run(spark, benchPath)
          System.err.println(f"[bench] local$cpus trial $i: perHost=${r.buildPerHostSec}%.2f " +
            f"cms=${r.cmsTokensSec}%.2f ebf=${r.globalEbfSec}%.2f probe=${r.probeSec}%.2f")
          r
        })
      } catch {
        // -1 sentinels: the contract line still prints, and no field
        // can be mistaken for a measured value
        case e: Throwable =>
          System.err.println(s"[bench] flagship failed, reporting sentinels: $e")
          Flagship.Result(0L, 0L, 0L, -1, -1, -1, -1, -1, -1, -1, -1, -1L, -1L)
      }
    }

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
    // headline scaling = median of per-pair ratios (drift-immune); the
    // composite-throughput ratio is also derivable from the per-level
    // docs_per_sec fields for anyone who prefers it
    val efficiency = pairs.map(p => median(p.eff))
    // outlier-robust auxiliary: per-PHASE medians across pairs, then
    // the ratio of the median phase sums. One box event in one phase of
    // one trial (round 3's pair-2 60.7s CMS trial, eff 0.273) cannot
    // move this number, while the primary median-of-pairs keeps its
    // same-minutes pairing guarantee. Reported alongside, not instead.
    val effMedPhase = pairs.map { p =>
      def medPhases(rs: Seq[Flagship.Result]): Double =
        median(rs.map(_.buildPerHostSec)) + median(rs.map(_.cmsTokensSec)) +
          median(rs.map(_.globalEbfSec))
      (p.lowRs.head.rows / medPhases(p.highRs)) /
        (p.lowRs.head.rows / medPhases(p.lowRs)) / (cpus.toDouble / cpusLow)
    }

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
    pairs.foreach { p =>
      head.append(s""","scaling_method":"paired-median-of-$trials"""")
      effMedPhase.foreach(e =>
        head.append(f""","scaling_efficiency_med_phase":$e%.3f"""))
      head.append(f""","calibration_efficiency":${median(p.calibEff)}%.3f""")
      head.append(f""","calibration_minserts_per_sec":[${median(p.calLo) / 1e6}%.1f,${median(p.calHi) / 1e6}%.1f]""")
      // Spark scaling read against the machine floor: the calibration
      // kernel (pure-JVM threaded EBF inserts, zero Spark) bounds what
      // this shared VM's cores+memory actually grant from N to 4N
      // threads in the SAME minutes as each pair; >= 1.0 means the
      // engine scales at least as well as the box itself
      head.append(f""","scaling_vs_machine_floor":${median(p.vsFloor)}%.3f""")
    }

    val line = contractLine(total, results.size, sfDir, failed.toSeq, head.result())

    // full record: per-query timing map + nested flagship objects at
    // both parallelism levels (everything the stdout line omits)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val extras = new StringBuilder
    extras.append(s""","flagship_local$cpus":${flagshipJson(high)}""")
    low.foreach(l => extras.append(s""","flagship_local$cpusLow":${flagshipJson(l)}"""))
    // the full per-pair record behind the headline medians
    pairs.foreach { p =>
      def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      extras.append(s""","pair_efficiencies":${arr(p.eff)}""")
      extras.append(s""","pair_floor_efficiencies":${arr(p.calibEff)}""")
      extras.append(s""","pair_vs_floor":${arr(p.vsFloor)}""")
    }
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

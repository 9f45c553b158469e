package graft.tools

import graft.Bench
import graft.data.WebPagesGen
import graft.functions.Graft
import graft.pipeline.Flagship
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-phase scaling decomposition: runs selected flagship phase
  * variants at each requested parallelism level (whole-JVM
  * taskset-confined, same as the bench's paired protocol), printing
  * per-variant wall times plus a per-level machine-floor calibration so
  * each phase's 8->32 efficiency can be read against the box's grant.
  *
  * Levels are INTERLEAVED per trial (low, high, low, high, ...) so a
  * wandering box contaminates pairs, not levels.
  *
  * Env: SP_CPUS="8,32" (low first), SP_TRIALS=2,
  * SP_VARIANTS="p1,p2,p3,p3p", SPARK_GRAFT_BENCH_ROWS.
  */
object ScalingProbe {

  private def timed(f: => Any): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "32000000").toLong
    // SP_TABLE: probe an alternative copy of the bench table (e.g. a
    // different parquet codec) without touching the canonical path
    val benchPath = sys.env.getOrElse("SP_TABLE",
      s"/root/repo/data/webpages/bench_$benchRows")
    val levels = sys.env.getOrElse("SP_CPUS", "8,32").split(",").map(_.trim.toInt).toSeq
    val trials = sys.env.getOrElse("SP_TRIALS", "2").toInt
    val variants = sys.env.getOrElse("SP_VARIANTS", "p1,p2,p3c,p3p").split(",").map(_.trim).toSeq

    locally {
      val s = Bench.session(32)
      WebPagesGen.ensureTable(s, benchPath, benchRows, numHosts = 10000)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def runLevel(cpus: Int, trial: Int, warm: Boolean): Unit = {
      Bench.confineToCores(cpus)
      val calib = Bench.calibrate(cpus, reps = 1)
      val s = Bench.session(cpus)
      try {
        Graft.ensure(s)
        if (sys.env.get("SP_STAGES").contains("1")) {
          s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = ev.stageInfo
              val m = si.taskMetrics
              val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b)
                .getOrElse(-1L) / 1e3
              println(f"[spstage] cpus=$cpus stage=${si.stageId} tasks=${si.numTasks} " +
                f"wall=$wall%.1f cpuSec=${m.executorRunTime / 1e3}%.1f " +
                f"deserSec=${m.executorDeserializeTime / 1e3}%.1f gcSec=${m.jvmGCTime / 1e3}%.1f " +
                f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
                f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB " +
                f"in=${m.inputMetrics.bytesRead / 1e6}%.0fMB name=${si.name.take(60)}")
            }
          })
        }
        val wp = s.read.parquet(benchPath)
        if (warm) { // one cheap pass to warm codegen/JIT at this level
          Flagship.run(s, "/root/repo/data/webpages/test", nProbes = 0)
        }
        def p3(shards: Int, clusterFirst: Boolean, native: Boolean): Double = {
          val t0 = System.nanoTime()
          val tbl = Flagship.phase3(wp, shards, clusterFirst = clusterFirst,
            nativeAgg = native)
          val t = (System.nanoTime() - t0) / 1e9
          tbl.unpersist(blocking = true)
          t
        }
        val times = variants.map {
          case "p12f" => "p12f" -> timed(Flagship.phase12Fused(wp, 32))
          case "p1" => "p1" -> timed(Flagship.phase1(wp, 32, native = false))
          case "p1n" => "p1n" -> timed(Flagship.phase1(wp, 32, native = true))
          case "p2" => "p2" -> timed(Flagship.phase2(wp, native = false))
          case "p2n" => "p2n" -> timed(Flagship.phase2(wp, native = true))
          case v if v.startsWith("p2b") =>
            v -> timed(Flagship.phase2(wp, native = true, batchTokens = v.drop(3).toInt))
          case "p3c" => "p3c" -> p3(64, clusterFirst = true, native = false)
          case "p3p" => "p3p" -> p3(64, clusterFirst = false, native = false)
          case "p3n64" => "p3n64" -> p3(64, clusterFirst = true, native = true)
          case "p3u256" => "p3u256" -> p3(256, clusterFirst = true, native = false)
          case "p3n256" => "p3n256" -> p3(256, clusterFirst = true, native = true)
          case other => other -> -1.0
        }
        println(f"[sp] trial $trial cpus=$cpus calib=${calib / 1e6}%.1f M/s " +
          times.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      } finally {
        s.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }

    // warmup both levels once, then interleaved timed trials
    levels.foreach(c => runLevel(c, 0, warm = true))
    for (t <- 1 to trials; c <- levels) runLevel(c, t, warm = false)
    Bench.confineToCores(Runtime.getRuntime.availableProcessors())
  }
}

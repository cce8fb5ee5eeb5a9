package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (optimization receipts): per-query job/stage accounting.
  *
  * For each named query: one warmup run at sf0.001 (JIT/codegen, like
  * Bench), then two timed runs at the target SF with a listener
  * recording every job's wall time, stage count and summed task time.
  * The SECOND run's breakdown is printed (memo-warm steady state —
  * the same state Bench's min-of-2 measures), plus both wall times.
  *
  * Usage: runMain graft.BenchProfile <q1> [q2 ...] [--sf <dir>]
  */
object BenchProfile {
  private final class Acc extends SparkListener {
    case class Job(id: Int, desc: String, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
      var gcMs: Long = 0L, var cpuMs: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    @volatile var on = false
    override def onJobStart(e: SparkListenerJobStart): Unit = if (on) synchronized {
      val d = Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")
      jobs(e.jobId) = Job(e.jobId, d, e.time)
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
        j.stages += 1
        j.tasks += si.numTasks
      }
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        if (e.taskInfo != null) j.taskMs += (e.taskInfo.finishTime - e.taskInfo.launchTime)
        if (e.taskMetrics != null) {
          j.gcMs += e.taskMetrics.jvmGCTime
          j.cpuMs += e.taskMetrics.executorCpuTime / 1000000L
        }
      }
    }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
    def report(): String = synchronized {
      val rows = jobs.values.toSeq
      val tot = rows.map(j => j.t1 - j.t0).sum
      val hdr = f"  jobs=${rows.size}%d stages=${rows.map(_.stages).sum}%d " +
        f"tasks=${rows.map(_.tasks).sum}%d jobWallSum=${tot / 1000.0}%.2fs " +
        f"taskTimeSum=${rows.map(_.taskMs).sum / 1000.0}%.2fs"
      val per = rows.map { j =>
        f"    job ${j.id}%4d ${(j.t1 - j.t0) / 1000.0}%6.3fs stages=${j.stages}%2d " +
          f"tasks=${j.tasks}%3d taskSum=${j.taskMs / 1000.0}%6.3fs " +
          f"cpu=${j.cpuMs / 1000.0}%6.3fs gc=${j.gcMs / 1000.0}%6.3fs ${j.desc.take(60)}"
      }.mkString("\n")
      hdr + "\n" + per
    }
  }

  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("--sf")
    val sfDir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val names = (if (sfIdx >= 0) args.take(sfIdx) ++ args.drop(sfIdx + 2) else args).toSeq
    val spark = GraftSession.get()
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val walls = (1 to 2).map { i =>
        acc.reset(); acc.on = true
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // listener bus is async; let the tail drain
        acc.on = false
        spark.catalog.clearCache(); System.gc()
        (i, dt)
      }
      println(f"[profile] $name run1=${walls(0)._2}%.3fs run2=${walls(1)._2}%.3fs")
      println(acc.report())
    }
    spark.stop()
  }
}

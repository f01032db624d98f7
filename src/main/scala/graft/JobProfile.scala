package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Where does a query's wall time go? Runs the named queries once each
  * (same session/noop-sink shape as BenchOne) with a listener that tallies
  * jobs, stages, tasks, summed task time and summed job wall-clock — the
  * split between scheduler/dispatch overhead and executor compute that
  * decides WHICH optimization (fewer jobs vs fewer shuffled bytes) a slow
  * query needs. Usage: runMain graft.JobProfile <name> [name ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.prepare(spark, sfDir)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    val gcNanos = new AtomicLong
    val cpuNanos = new AtomicLong
    val jobMillis = new AtomicLong
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val verbose = sys.env.contains("JOBPROFILE_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobStarts.put(j.jobId, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        // explicit Option: remove() returns null for an unseen jobId and
        // the former code leaned on Scala unboxing null to 0L (ADVICE r14)
        Option(jobStarts.remove(j.jobId)).map(_.longValue).foreach { t0 =>
          jobMillis.addAndGet(j.time - t0)
          if (verbose && j.time - t0 > 100)
            println(f"[jobprofile]   job ${j.jobId} ${(j.time - t0) / 1e3}%.2fs")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val info = s.stageInfo
        if (verbose) {
          val dt = (for {a <- info.completionTime; b <- info.submissionTime}
            yield (a - b) / 1e3).getOrElse(-1.0)
          if (dt > 0.1)
            println(f"[jobprofile]   stage ${info.stageId} $dt%.2fs " +
              f"tasks=${info.numTasks} ${info.name.take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
          gcNanos.addAndGet(t.taskMetrics.jvmGCTime * 1000000L)
          cpuNanos.addAndGet(t.taskMetrics.executorCpuTime)
        }
      }
    })
    args.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0)
      taskNanos.set(0); gcNanos.set(0); cpuNanos.set(0); jobMillis.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // drain by stabilization — the fixed 300 ms sleep raced the
      // listener bus on loaded hosts and could undercount tallies
      // (ADVICE r14; SparkContext.listenerBus is private[spark], so poll
      // the tallies until they stop moving instead)
      var snap = (-1, -1, -1L)
      var same = 0
      var waited = 0
      while (same < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = (jobs.get, tasks.get, taskNanos.get)
        if (cur == snap) same += 1 else { same = 0; snap = cur }
      }
      println(f"[jobprofile] $name wall=$dt%.2fs jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} " +
        f"taskTime=${taskNanos.get / 1e9}%.2fs cpu=${cpuNanos.get / 1e9}%.2fs " +
        f"gc=${gcNanos.get / 1e9}%.2fs jobWall=${jobMillis.get / 1e3}%.2fs")
      System.gc()
    }
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Host-profile decomposition probe — the diagnosis instrument for the
  * graph-family bench residual (rounds 10-12: q73/q81/q82/q96/q120/q163
  * read 1.3-1.7× their round-9 normalized seconds with UNTOUCHED code,
  * while the single-job calibration probe and the scan/agg-bound queries
  * — q01 0.98×, q91 1.10× on the identical cold protocol — read flat).
  *
  * The iterative graph operators are many-SHORT-JOB queries: a fixed
  * per-job cost (scheduler dispatch, task serialization, result fetch,
  * GC between jobs) that the one-big-job calibration probe cannot see
  * multiplies by their job count, not their data volume. This main
  * measures each cost axis separately so round-over-round diffs can say
  * WHICH resource moved:
  *
  *  - tiny-job latency: 200 one-partition count() jobs → ms/job
  *    (scheduler + task round-trip floor),
  *  - small-shuffle latency: 20 two-stage 32-partition jobs → ms/job
  *    (the per-ROUND cost shape of an iterative operator),
  *  - the standard calibration probe (50M-row shuffle — CPU/shuffle
  *    throughput, the axis that reads flat),
  *  - localCheckpoint I/O: 2M rows materialized to local block storage
  *    (the q73 lineage-cut cost),
  *  - the measured JOB COUNT and LISTENER-DECOMPOSED overhead of one
  *    representative iterative query (q96 connected components) at
  *    SPARK_GRAFT_SF_DIR.
  *
  * The q96 overhead attribution (round 13, replacing the vacuous
  * serialized product jobs × ms/job that EXCEEDED the wall it claimed
  * to bound — and a first per-stage-critical-path attempt that
  * OVERSHOT it the other way, because concurrent stages double-count):
  * the listener records every task's [launch, finish] interval; their
  * merged UNION is the wall-clock time at least one task was running.
  * `q96_task_coverage_sec` is that union; `q96_sched_gap_sec = wall −
  * coverage` is the time the 32-core executor sat with ZERO tasks
  * running inside the query window — pure driver/scheduler time (job
  * planning, stage submission, result handling between the 121 jobs),
  * the job-count-multiplied axis the diagnosis attributes the residual
  * to. Gap ≤ wall holds BY CONSTRUCTION (a union of sub-intervals
  * cannot exceed the window), and it is a conservative FLOOR: dispatch
  * latency inside a task's own span (deserialize, result fetch) is
  * counted as coverage, not gap. `q96_gap_share` is gap/wall.
  *
  * Output: one JSON line + sched_probe.json. */
object SchedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    import org.apache.spark.sql.functions._
    // warm: codegen, shuffle machinery, FS
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    System.gc()

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val tinyN = 200
    val tiny = sec { (1 to tinyN).foreach(_ => spark.range(0, 100, 1, 1).count()) }
    val shufN = 20
    val shuf = sec { (1 to shufN).foreach { _ =>
      spark.range(0, 100000, 1, 32).selectExpr("id % 97 as k")
        .groupBy("k").count().count()
    } }
    val calib = sec {
      spark.range(50000000L).selectExpr("id % 1000 as k", "id as v")
        .groupBy("k").agg(sum("v"))
        .write.format("noop").mode("overwrite").save()
    }
    val ckpt = sec {
      val df = spark.range(0, 2000000, 1, 32)
        .selectExpr("id", "id * 2 as v").localCheckpoint(true)
      df.count(); df.unpersist()
    }

    // job count + wall + per-stage critical-path compute of one
    // representative iterative operator. Counters are atomics and the
    // listener bus is drained before they are read: listener callbacks
    // run on the bus thread, and removeSparkListener neither flushes
    // queued events nor establishes happens-before with this thread.
    val jobs = new AtomicInteger(0)
    val jobMs = new AtomicLong(0L)
    val tasks = new AtomicInteger(0)
    val taskRunMs = new AtomicLong(0L)
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    // per-task [launch, finish] wall intervals — appended only on the
    // single listener-bus thread, read after the drain below
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        starts.remove(j.jobId).foreach(t0 => jobMs.addAndGet(j.time - t0))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m => taskRunMs.addAndGet(m.executorRunTime))
        val info = t.taskInfo
        if (info != null && info.finishTime > 0)
          spans.synchronized { spans += ((info.launchTime, info.finishTime)) }
      }
    }
    spark.sparkContext.addSparkListener(l)
    val w0 = System.currentTimeMillis()
    val q96 = sec {
      SparkEntry.queries("q96_connected_components")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val w1 = System.currentTimeMillis()
    // drain: the bus delivers asynchronously; poll until the counters
    // stabilize for 300 ms (bounded at 5 s — typical drain is instant)
    val deadline = System.nanoTime() + 5000000000L
    var stable = 0
    var last = -1L
    while (stable < 3 && System.nanoTime() < deadline) {
      val now = jobs.get().toLong * 1000000 + tasks.get()
      if (now == last) stable += 1 else { stable = 0; last = now }
      Thread.sleep(100)
    }
    spark.sparkContext.removeSparkListener(l)

    // merged union of task intervals, clamped to the query window
    val merged = spans.synchronized { spans.toVector }
      .map { case (a, b) => (math.max(a, w0), math.min(b, w1)) }
      .filter { case (a, b) => b > a }.sortBy(_._1)
    var coveredMs = 0L
    var curA = 0L; var curB = -1L // empty current interval
    merged.foreach { case (a, b) =>
      if (a > curB) { // disjoint: flush the current interval
        if (curB > curA) coveredMs += curB - curA
        curA = a; curB = b
      } else curB = math.max(curB, b)
    }
    if (curB > curA) coveredMs += curB - curA
    val coverageSec = coveredMs / 1000.0
    val gapSec = math.max((w1 - w0) / 1000.0 - coverageSec, 0.0)
    val share = if (q96 > 0) gapSec / q96 else 0.0
    val msTiny = tiny * 1000 / tinyN
    val msShuf = shuf * 1000 / shufN
    val js = f"""{"metric":"sched_probe","tiny_job_ms":$msTiny%.1f,"small_shuffle_job_ms":$msShuf%.1f,"calib_sec":$calib%.3f,"local_checkpoint_sec":$ckpt%.3f,"q96_sec":$q96%.3f,"q96_jobs":${jobs.get()},"q96_job_wall_ms":${jobMs.get()},"q96_tasks":${tasks.get()},"q96_task_run_ms":${taskRunMs.get()},"q96_task_coverage_sec":$coverageSec%.3f,"q96_sched_gap_sec":$gapSec%.3f,"q96_gap_share":$share%.3f,"sf":"$sfDir","generated_at":"${java.time.Instant.now()}"}"""
    println(js)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("sched_probe.json"), (js + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

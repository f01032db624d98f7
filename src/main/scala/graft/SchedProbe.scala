package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

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
  *  - the measured JOB COUNT of one representative iterative query
  *    (q96 connected components) at SPARK_GRAFT_SF_DIR, so
  *    (job count × per-job floor) bounds the pure-overhead share of its
  *    wall time.
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

    // job count + wall of one representative iterative operator
    var jobs = 0
    var jobMs = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        starts.remove(j.jobId).foreach(t0 => jobMs += j.time - t0)
      }
    }
    spark.sparkContext.addSparkListener(l)
    val q96 = sec {
      SparkEntry.queries("q96_connected_components")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.sparkContext.removeSparkListener(l)

    val msTiny = tiny * 1000 / tinyN
    val msShuf = shuf * 1000 / shufN
    val js = f"""{"metric":"sched_probe","tiny_job_ms":$msTiny%.1f,"small_shuffle_job_ms":$msShuf%.1f,"calib_sec":$calib%.3f,"local_checkpoint_sec":$ckpt%.3f,"q96_sec":$q96%.3f,"q96_jobs":$jobs,"q96_job_wall_ms":$jobMs,"q96_sched_floor_sec":${jobs * msShuf / 1000}%.2f,"sf":"$sfDir","generated_at":"${java.time.Instant.now()}"}"""
    println(js)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("sched_probe.json"), (js + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}

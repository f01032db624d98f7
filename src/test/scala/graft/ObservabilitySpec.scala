package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.QualityMetrics

/** Gates for the observe()-based data-quality channel: the metrics must
  * ride the job's own pass (no second scan) and report EXACT counts for
  * planted violations, in both batch (QueryExecution.observedMetrics)
  * and streaming (StreamingQueryProgress.observedMetrics) harvests. */
class ObservabilitySpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  test("batch observe: planted violations counted exactly, zero extra scan") {
    val s = spark
    import s.implicits._
    val harvest = new QualityMetrics.BatchHarvest
    s.listenerManager.register(harvest)
    try {
      val df = Seq(
        (1L, ts(0), 10.0),
        (2L, ts(1), -3.0),   // negative value
        (-7L, ts(2), 1.0),   // bad user
        (3L, ts(3), -0.5),   // negative value
        (4L, ts(4), 2.0))
        .toDF("user_id", "ts", "value")
        .withColumn("ts", when(col("user_id") === 4L,
          lit(null).cast("timestamp")).otherwise(col("ts"))) // null ts
      val out = QualityMetrics.observed(df, "q_batch")
        .groupBy().agg(count(lit(1)).as("n")).collect()
      assert(out.head.getLong(0) == 5L)
      // listener delivery is async — poll briefly
      var m = harvest.metrics("q_batch")
      val deadline = System.nanoTime() + 10e9.toLong
      while (m.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(50); m = harvest.metrics("q_batch")
      }
      assert(m.isDefined, "observed metrics not harvested")
      val r = m.get
      assert(r.getAs[Long]("n_rows") == 5L)
      assert(r.getAs[Long]("n_null_ts") == 1L)
      assert(r.getAs[Long]("n_neg_value") == 2L)
      assert(r.getAs[Long]("n_bad_user") == 1L)
    } finally s.listenerManager.unregister(harvest)
  }

  test("streaming observe: per-epoch quality metrics ride the progress") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger

    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = QualityMetrics.observed(
        input.toDS().toDF("user_id", "ts", "value"), "q_stream")
      .writeStream.format("memory").queryName("obs_out")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      input.addData((1L, ts(0), 1.0), (2L, ts(1), -2.0), (-3L, ts(2), 5.0))
      q.processAllAvailable()
      val obs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("q_stream")))
      assert(obs.nonEmpty, "no observed metrics in stream progress")
      val total = obs.map(_.getAs[Long]("n_rows")).sum
      val neg = obs.map(_.getAs[Long]("n_neg_value")).sum
      val bad = obs.map(_.getAs[Long]("n_bad_user")).sum
      assert(total == 3L && neg == 1L && bad == 1L,
        s"rows=$total neg=$neg bad=$bad")
    } finally q.stop()
  }
}

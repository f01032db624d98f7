package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions.col
import graft.streaming.Stateful

/** Stateful streaming operators: watermark dedup, session windows,
  * flatMapGroupsWithState running totals (SURVEY.md §2.2 streaming row).
  */
class StatefulSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming dedup drops re-delivered ids (dropDuplicates + watermark)") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    // re-deliveries carry SHIFTED timestamps (retry with arrival-time
    // stamping) — id-only dedup must still drop them
    input.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(3)), (3L, ts(2)), (2L, ts(4)))
    val df = input.toDF().toDF("event_id", "ts")
    val q = Stateful.dedupStream(df, "ts", "10 minutes", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.sql("SELECT event_id FROM dedup_out").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("RocksDB state store backs a stateful query (production large-state backend)") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    // HDFS-backed (in-heap) state is the default; at real scale windowed
    // state outgrows the heap and the RocksDB provider is the shipped
    // answer (spills to local disk, incremental checkpoints). Pin that
    // the whole stateful pipeline runs unchanged on it.
    val prev = s.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, Timestamp)]
      input.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(3)), (3L, ts(2)), (2L, ts(4)))
      val q = Stateful.dedupStream(input.toDF().toDF("event_id", "ts"),
          "ts", "10 minutes", Seq("event_id"))
        .writeStream.format("memory").queryName("rocks_out")
        .option("checkpointLocation", tmpDir("rocks_ck"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // the state store actually in use is recorded in query progress
      assert(s.sql("SELECT event_id FROM rocks_out").as[Long].collect().sorted
        .toSeq == Seq(1L, 2L, 3L))
    } finally {
      if (prev.isEmpty)
        s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else s.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    }
  }

  test("session window groups events within gap per user") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Timestamp, Double)]
    // user 7: events at 10:00,10:02,10:03 (one session), 10:30 (new session)
    input.addData((7L, ts(0), 1.0), (7L, ts(2), 2.0), (7L, ts(3), 3.0), (7L, ts(30), 4.0))
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = Stateful.sessionize(df, "ts", "1 hour", "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.sql("SELECT n_events, sum_value FROM sess_out ORDER BY n_events")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4.0), (3L, 6.0)))
  }

  test("flatMapGroupsWithState keeps running totals across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Double)]
    val q = Stateful.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(100)).start()

    input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
    q.processAllAvailable()
    input.addData((1L, 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = s.sql("SELECT key, n, total FROM state_out")
      .as[(Long, Long, Double)].collect().toSeq
    // second emission for key 1 must carry state from the first batch
    assert(rows.contains((1L, 3L, 16.0)), s"expected accumulated state, got $rows")
    assert(rows.contains((2L, 1L, 1.0)))
  }

  test("event-time tumbling window counts with watermark") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    input.addData((ts(0), "click"), (ts(1), "click"), (ts(12), "view"))
    val df = input.toDF().toDF("ts", "event_type")
    val q = Stateful.windowedCounts(df, "ts", "1 minute", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.sql("SELECT event_type, n FROM win_out ORDER BY event_type")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("click", 2L), ("view", 1L)))
  }
  test("sliding event-time windows produce overlapping buckets") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    input.addData((ts(0), "click"), (ts(7), "click"))
    val df = input.toDF().toDF("ts", "event_type")
    val q = Stateful.windowedCounts(df, "ts", "1 minute", "10 minutes",
        slide = Some("5 minutes"))
      .writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // 10:00 event -> windows [09:55,10:05),[10:00,10:10); 10:07 -> [10:00,10:10),[10:05,10:15)
    val got = s.sql("SELECT n FROM slide_out ORDER BY window.start")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 1L), s"overlapping window counts, got $got")
  }

  test("ForeachWriter sink: open/process/close per partition, all rows delivered") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Int]
    input.addData(1 to 50: _*)
    val q = input.toDS().writeStream
      .option("checkpointLocation", tmpDir("fw_ck"))
      .trigger(Trigger.AvailableNow())
      .foreach(new org.apache.spark.sql.ForeachWriter[Int] {
        def open(partitionId: Long, epochId: Long): Boolean = { ForeachSink.opens.incrementAndGet(); true }
        def process(v: Int): Unit = ForeachSink.rows.add(v)
        def close(errorOrNull: Throwable): Unit = ForeachSink.closes.incrementAndGet()
      }).start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    assert(ForeachSink.rows.asScala.toSeq.sorted == (1 to 50))
    assert(ForeachSink.opens.get() == ForeachSink.closes.get() && ForeachSink.opens.get() >= 1)
  }
  test("late rows beyond the watermark are dropped (append mode)") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val q = Stateful.windowedCounts(input.toDF().toDF("ts", "event_type"),
        "ts", "10 minutes", "10 minutes")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50)).start()

    // batch 1: events at 10:00 and 10:30 -> watermark advances to 10:20,
    // closing window [10:00, 10:10) with n=1
    input.addData((ts(0), "a"), (ts(30), "a")); q.processAllAvailable()
    // batch 2: LATE event at 10:05 — its window is already finalized
    input.addData((ts(5), "a")); q.processAllAvailable()
    // batch 3: advance watermark past 10:40 to close the 10:30 window
    input.addData((ts(59), "a")); q.processAllAvailable()
    q.stop()

    val got = s.sql("SELECT ws, n FROM late_out ORDER BY ws")
      .as[(Timestamp, Long)].collect().toSeq
    // the late 10:05 row must NOT appear anywhere: 10:00 window stays 1
    assert(got.headOption.contains((ts(0), 1L)),
      s"late row leaked into a closed window: $got")
    assert(got.map(_._2).sum == 2L, s"emitted counts: $got")
  }

  test("streaming session windows == batch q37 sessions on the real event log") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val sf = "/root/testdata/sf0.001"

    // gap-boundary note: session_window breaks at gap >= 10 min, the
    // batch gaps-and-islands at gap > 10 min — the event log has no
    // exact-600s inter-arrival at this SF, so the two definitions agree
    val events = Tables.events(s, sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
      .orderBy("ts", "event_id").as[Stateful.Ev].collect()
    val sentinelTs = new Timestamp(
      events.map(_._2.getTime).max + 30L * 86400 * 1000)
    val input = MemoryStream[Stateful.Ev]
    val q = Stateful.sessionize(
        input.toDS().toDF("user_id", "ts", "event_id", "event_type", "value"),
        "ts", "2 hours", "10 minutes")
      .writeStream.format("memory").queryName("sess_parity")
      .trigger(Trigger.ProcessingTime(50)).start()
    val (first, rest) = events.splitAt(events.length / 2)
    input.addData(first.toSeq); q.processAllAvailable()
    input.addData(rest.toSeq); q.processAllAvailable()
    input.addData(Seq((-1L, sentinelTs, -1L, "zz_sentinel", 0.0)))
    q.processAllAvailable()
    q.stop()

    def canon(rows: Array[(Long, Long, Double)]): Map[Long, Seq[(Long, Double)]] =
      rows.groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3)).sortBy(identity).toSeq).toMap
    val streamed = canon(s.sql(
      "SELECT user_id, n_events, sum_value FROM sess_parity WHERE user_id >= 0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    val batch = canon(SparkEntry.queries("q37_sessionize")(s, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))))
    assert(streamed.nonEmpty)
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (user, sess) =>
      val b = batch(user)
      assert(sess.length == b.length, s"user $user: ${sess.length} streamed " +
        s"sessions vs ${b.length} batch")
      sess.zip(b).foreach { case ((n1, v1), (n2, v2)) =>
        assert(n1 == n2, s"user $user: session sizes $n1 vs $n2")
        // batch sums are r2-rounded, streamed raw
        assert(math.abs(v1 - v2) <= 0.0051, s"user $user: $v1 vs $v2")
      }
    }
  }

  test("update-mode streaming agg IS incremental view maintenance: == batch q88") {
    // q88 proves merge(partials) == recompute in batch; a streaming
    // aggregation in update mode maintains the SAME algebraic state
    // (count/sum/min/max partials merged per micro-batch), so its final
    // table must equal the batch view — the streaming leg of the IVM
    // contract, fed the full sf0.001 log across three micro-batches.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val sf = "/root/testdata/sf0.001"

    val events = Tables.events(s, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val input = MemoryStream[(String, Double)]
    val view = input.toDF().toDF("event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
    val q = view.writeStream.format("memory").queryName("ivm_out")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.ProcessingTime(50)).start()
    val third = events.length / 3
    Seq(events.slice(0, third), events.slice(third, 2 * third),
      events.drop(2 * third)).foreach { chunk =>
      input.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()
    // update mode re-emits a key each time it changes; the LAST emission
    // per key is the maintained view
    val streamed = s.sql(
      """SELECT event_type, n_rows, sum_value, min_value, max_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY n_rows DESC) AS rn FROM ivm_out)
        |WHERE rn = 1""".stripMargin)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val batch = SparkEntry.queries("q88_incremental_view")(s, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, (n, sv, mn, mx)) =>
      val (bn, bsv, bmn, bmx) = batch(k)
      assert(n == bn, s"$k: n $n vs $bn")
      // batch sum is r2-rounded; min/max are exact in both
      assert(math.abs(sv - bsv) <= 0.0051, s"$k: sum $sv vs $bsv")
      assert(mn == bmn && mx == bmx, s"$k: extremes ($mn,$mx) vs ($bmn,$bmx)")
    }
  }
}

/** Shared state for the ForeachWriter test (writer is serialized per task). */
object ForeachSink {
  val rows = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
}
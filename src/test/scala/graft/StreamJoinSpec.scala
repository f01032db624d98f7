package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream joins with watermarks + time-bound conditions, and
  * checkpoint-recovery delivery semantics (the ErrDontAck analog:
  * an uncommitted epoch is retried after restart, nothing is lost).
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream interval join: click joins its purchase within 10m") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    clicks.addData((1L, ts(5)), (2L, ts(20)), (3L, ts(40)))
    buys.addData((1L, ts(2)), (2L, ts(3)), (3L, ts(39)))

    val c2 = clicks.toDF().toDF("cu", "c_ts").withWatermark("c_ts", "1 hour")
    val b2 = buys.toDF().toDF("bu", "b_ts").withWatermark("b_ts", "1 hour")
    val q = c2.join(b2, col("cu") === col("bu") &&
        col("b_ts").between(col("c_ts") - expr("INTERVAL 10 MINUTES"), col("c_ts")))
      .select(col("cu"), col("c_ts"), col("b_ts"))
      .writeStream.format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val got = s.sql("SELECT cu FROM ssj_out").as[Long].collect().sorted.toSeq
    // user 1: buy 3m before click → match; user 2: 17m before → no;
    // user 3: 1m before → match
    assert(got == Seq(1L, 3L), s"got $got")
  }

  test("stream-stream LEFT OUTER interval join: unmatched click null-completes on watermark") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    clicks.addData((1L, ts(5)), (2L, ts(20)), (3L, ts(40)))
    buys.addData((1L, ts(2)), (2L, ts(3)), (3L, ts(39)))
    // watermark driver: a late event far past the horizon forces the
    // state store to give up on unmatched left rows and emit them
    // null-completed — the outer-join contract (no emission before the
    // watermark proves no match can still arrive)
    clicks.addData((99L, Timestamp.valueOf("2024-01-01 13:00:00")))

    val c2 = clicks.toDF().toDF("cu", "c_ts").withWatermark("c_ts", "10 minutes")
    val b2 = buys.toDF().toDF("bu", "b_ts").withWatermark("b_ts", "10 minutes")
    val q = c2.join(b2, col("cu") === col("bu") &&
        col("b_ts").between(col("c_ts") - expr("INTERVAL 10 MINUTES"), col("c_ts")),
        "left_outer")
      .select(col("cu"), col("bu"))
      .writeStream.format("memory").queryName("ssj_left_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val got = s.sql("SELECT cu, bu FROM ssj_left_out").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // 1 and 3 match inside the interval; 2's buy is 17m early → null side
    assert(got(1L) === Some(1L) && got(3L) === Some(3L), s"got $got")
    assert(got(2L) === None, s"user 2 must null-complete, got $got")
  }

  test("stream-static join: event stream enriched against a dimension table") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    // static dim comes straight off parquet — the standard enrichment
    // shape (a broadcast per micro-batch, no state store involvement)
    val dim = Tables.nation(s, "/root/testdata/sf0.001")
      .select(col("n_nationkey").as("nk"), col("n_name"))

    val input = MemoryStream[(Long, Timestamp, Double)]
    input.addData((0L, ts(1), 10.0), (1L, ts(2), 20.0),
      (2L, ts(3), 30.0), (0L, ts(4), 40.0), (99L, ts(5), 50.0))
    val stream = input.toDF().toDF("nk", "ts", "v")
    val q = stream.join(dim, Seq("nk"), "left")
      .groupBy("n_name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .writeStream.format("memory").queryName("ssd_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val got = s.sql("SELECT n_name, n, sv FROM ssd_out")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2)
    // nk 99 has no dim row → null-enriched group survives the left join
    assert(got.exists(g => g._1.isEmpty && g._2 == 1L && g._3 == 50.0))
    // nk 0 appears twice → its nation aggregates both rows
    assert(got.exists(g => g._1.nonEmpty && g._2 == 2L && g._3 == 50.0))
    assert(got.map(_._2).sum == 5L)
  }

  test("checkpoint recovery: failed epoch is retried, delivered exactly once") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val ck = tmpDir("recover_ck")
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[Int]()

    // first attempt: flush throws AFTER seeing the data (transient sink
    // failure — the reference's ErrDontAck shape, batcher.go:16-21)
    val input1 = MemoryStream[Int]
    input1.addData(1 to 20: _*)
    val q1 = input1.toDF()
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect() // read it, then fail before "ack"
        throw new RuntimeException("transient sink outage")
      }.start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }

    // restart with the same checkpoint + same source content: the
    // uncommitted batch replays and commits this time
    val input2 = MemoryStream[Int]
    input2.addData(1 to 20: _*)
    val q2 = input2.toDF()
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => delivered.add(r.getInt(0)))
      }.start()
    q2.awaitTermination(60000)

    import scala.jdk.CollectionConverters._
    assert(delivered.asScala.toSeq.sorted == (1 to 20),
      "retried epoch delivers every row exactly once")
  }
}

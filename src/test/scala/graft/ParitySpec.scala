package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream/batch parity: the same event-time aggregation over the events
  * table must produce identical results whether executed as a batch
  * DataFrame or replayed incrementally through a MemoryStream — the
  * "streams and tables are the same computation" guarantee the unified
  * engine is supposed to give.
  */
class ParitySpec extends SparkSpec {

  test("windowed counts: batch == incremental replay over events (sf0.001)") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value"))

    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("event_type"), col("n"))

    val rows = events.as[(Timestamp, String, Double)].collect()
    val input = MemoryStream[(Timestamp, String, Double)]
    // feed in three chunks to force multiple micro-batches
    val q = input.toDF().toDF("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("parity_out")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.ProcessingTime(50))
      .start()
    rows.grouped(400).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()

    val got = s.sql("SELECT * FROM parity_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    val want = batch.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sorted
    assert(got.toSeq == want.toSeq,
      s"stream/batch divergence: ${got.length} vs ${want.length} groups")
  }
}

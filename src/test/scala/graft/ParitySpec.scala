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

  test("event dedup: streaming watermark dedup == batch q70 on ordered replay") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    // ordered replay (the OrderedReplaySpec convention): first arrival
    // per (user, type, bucket) is then exactly q70's (ts, event_id) min
    val rows = Tables.events(s, "/root/testdata/sf0.001")
      .withColumn("bkt", expr("unix_micros(ts) div 600000000"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("bkt"))
      .orderBy("ts", "event_id")
      .as[(Long, Timestamp, Long, String, Long)].collect()

    val input = MemoryStream[(Long, Timestamp, Long, String, Long)]
    val q = streaming.Stateful.dedupStream(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type", "bkt"),
        "ts", "1 hour", Seq("user_id", "event_type", "bkt"))
      .writeStream.format("memory").queryName("dedup70_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .start()
    rows.grouped(rows.length / 3 + 1).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()

    val streamed = s.sql("SELECT event_id FROM dedup70_out")
      .collect().map(_.getLong(0)).toSet
    val batch = operators.Relational3.q70EventDedup
      .run(s, "/root/testdata/sf0.001")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch,
      s"stream kept ${streamed.size}, batch kept ${batch.size}, " +
        s"diff ${(streamed diff batch).take(5)} / ${(batch diff streamed).take(5)}")
  }

  test("sliding distinct actives: chained streaming aggs == batch q80") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val sf = "/root/testdata/sf0.001"
    val rows = Tables.events(s, sf)
      .select(col("user_id"), col("ts"))
      .orderBy("ts").as[(Long, Timestamp)].collect()
    // sentinel far past the horizon: advances the watermark so every
    // real window closes and append mode emits it; its own windows end
    // in buckets no real event observed, so the filter below drops them
    val sentinel = (-1L,
      new Timestamp(rows.map(_._2.getTime).max + 5L * 24 * 3600 * 1000))

    val input = MemoryStream[(Long, Timestamp)]
    val q = streaming.Stateful.slidingDistinctStream(
        input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50))
      .start()
    rows.grouped(rows.length / 3 + 1).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    input.addData(sentinel); q.processAllAvailable()
    q.stop()

    // streamed window end e ↦ q80's window_end_bucket e/6h − 1; batch
    // reports only buckets that themselves saw an event, so restrict
    // the streamed series the same way before comparing
    val batch = operators.Behavioral.q80SlidingDistinct.run(s, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val observed = Tables.events(s, sf)
      .select(expr("unix_micros(ts) div 21600000000").as("hr"))
      .distinct().as[Long].collect().toSet
    val streamed = s.sql("SELECT * FROM sliding_out").collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L) / 21600000000L - 1 ->
        r.getLong(1))
      .filter { case (h, _) => observed(h) }.toMap
    assert(streamed == batch,
      s"stream ${streamed.size} windows vs batch ${batch.size}; " +
        s"diff ${(streamed.toSet diff batch.toSet).take(3)} / " +
        s"${(batch.toSet diff streamed.toSet).take(3)}")
  }

  test("streaming DAU/MAU: two chained windowed distincts == batch q123") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val sf = "/root/testdata/sf0.001"
    val DayUs = 86400000000L
    val rows = Tables.events(s, sf)
      .select(col("user_id"), col("ts"))
      .orderBy("ts").as[(Long, Timestamp)].collect()
    val sentinel = (-1L,
      new Timestamp(rows.map(_._2.getTime).max + 40L * 24 * 3600 * 1000))

    // the same feed through BOTH calendar grains: q123's daily actives
    // (1-day tumbling distinct) and trailing-28-day actives (28-day
    // window sliding daily) — no new operator, the q80 machinery
    // parameterized to the DAU/MAU grains
    val in1 = MemoryStream[(Long, Timestamp)]
    val in2 = MemoryStream[(Long, Timestamp)]
    val qd = streaming.Stateful.slidingDistinctStream(
        in1.toDF().toDF("user_id", "ts"),
        windowDur = "1 day", slide = "1 day")
      .writeStream.format("memory").queryName("dau_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50)).start()
    val qm = streaming.Stateful.slidingDistinctStream(
        in2.toDF().toDF("user_id", "ts"),
        windowDur = "28 days", slide = "1 day")
      .writeStream.format("memory").queryName("mau_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(50)).start()
    rows.grouped(rows.length / 3 + 1).foreach { chunk =>
      in1.addData(chunk.toIndexedSeq: _*)
      in2.addData(chunk.toIndexedSeq: _*)
      qd.processAllAvailable(); qm.processAllAvailable()
    }
    in1.addData(sentinel); in2.addData(sentinel)
    qd.processAllAvailable(); qm.processAllAvailable()
    qd.stop(); qm.stop()

    // window end e covers [e−dur, e) ⇒ q123's day is e/day − 1
    def series(tbl: String): Map[Long, Long] =
      s.sql(s"SELECT * FROM $tbl").collect()
        .map(r => (r.getTimestamp(0).getTime * 1000L) / DayUs - 1 ->
          r.getLong(1)).toMap
    val dau = series("dau_out")
    val mau = series("mau_out")
    val batch = SparkEntry.queries("q123_dau_mau")(s, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batch.nonEmpty)
    // exact distinct counts at both grains, day for day (stickiness is
    // the identical r6 division of these two integers in shared code)
    batch.foreach { case (day, (bd, bm)) =>
      assert(dau.get(day).contains(bd),
        s"day $day dau: stream=${dau.get(day)} batch=$bd")
      assert(mau.get(day).contains(bm),
        s"day $day mau: stream=${mau.get(day)} batch=$bm")
    }
  }

  test("heavy hitters: merged streaming MG summaries cover the exact batch set") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    // corpus token stream + planted hot keys: the synthetic corpus is
    // near-uniform by construction (no token exceeds n/(k+1) for any
    // useful k), so plant one above-threshold and one below-threshold
    // key to make the survival guarantee bind; k=16 < vocabulary size
    // so MG compaction actually fires. Deterministic interleave.
    val k = 16
    val corpus = Tables.documents(s, "/root/testdata/sf0.001")
      .select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("gram"))
      .as[String].collect()
    val planted = Array.fill(2500)("hh_hot") ++ Array.fill(1800)("hh_warm")
    val grams = (corpus ++ planted).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 100003 }.map(_._1)

    // batches complete in order, so the last write per bucket wins —
    // exactly the latest state snapshot (memory-sink row order is not
    // a contract; foreachBatch batchId order is)
    val finalMaps =
      new java.util.concurrent.ConcurrentHashMap[Int, Map[String, Long]]()
    val input = MemoryStream[String]
    val q = streaming.Stateful
      .heavyHittersStream(input.toDF().toDF("gram"), k, buckets = 8)
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[streaming.Stateful.HhSummary],
         _: Long) =>
          df.collect().foreach(h => finalMaps.put(h.bucket, h.items))
      }
      .trigger(Trigger.ProcessingTime(50))
      .start()
    grams.grouped(grams.length / 3 + 1).foreach { chunk =>
      input.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()

    // merge the final per-bucket summaries with the same MG merge
    import scala.jdk.CollectionConverters._
    val mg = new functions.MisraGries(k)
    val merged = finalMaps.values.asScala.foldLeft(
      scala.collection.mutable.HashMap.empty[String, Long]) { (acc, m) =>
      mg.merge(acc, scala.collection.mutable.HashMap(m.toSeq: _*))
    }

    // every item with true frequency > n/(k+1) must survive: sharding
    // sends an item's whole count to one bucket whose stream is ≤ n, so
    // the per-bucket MG bound applies, and the merge preserves it
    // (mergeable-summaries property)
    val exact = grams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = grams.length.toLong
    val trueHh = exact.filter { case (_, c) => c * (k + 1) > n }
    assert(trueHh.contains("hh_hot"), "test setup: planted key must qualify")
    val missing = trueHh.keySet -- merged.keySet
    assert(missing.isEmpty,
      s"streaming MG lost ${missing.size} true heavy hitters: $missing")
    // and the summary never overcounts
    assert(merged.forall { case (g, est) => est <= exact.getOrElse(g, 0L) })
  }
}

package graft

import org.apache.spark.sql.streaming.Trigger
import graft.connectors.MessageBus

/** DSv2 MQTT-shaped source: envelope schema, exactly-once delivery across
  * epochs, offset tracking across restarts, and the epoch-commit ack
  * watermark (the reference's QoS ack, mqtt.go:212-225 / types.go:48-57).
  */
class MqttLikeSourceSpec extends SparkSpec {

  private def read(topic: String) =
    spark.readStream.format("graft.connectors.MqttLikeSource")
      .option("topic", topic).load()

  test("delivers published envelopes exactly once with key/topic/value") {
    val s = spark
    import s.implicits._
    MessageBus.reset("t1")
    (1 to 25).foreach(i => MessageBus.publish("t1", s"mid-$i", s"payload-$i".getBytes))

    val ck = tmpDir("mqtt_ck")
    val q = read("t1").writeStream.format("memory").queryName("mq_out")
      .option("checkpointLocation", ck).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val rows = s.sql("SELECT key, topic, CAST(value AS STRING) FROM mq_out").collect()
    assert(rows.length == 25)
    assert(rows.map(_.getString(2)).sorted.toSeq == (1 to 25).map(i => s"payload-$i").sorted)
    assert(rows.forall(_.getString(1) == "t1"))
    assert(rows.map(_.getString(0)).distinct.length == 25, "unique message ids")

    // The engine calls MicroBatchStream.commit lazily (when the next epoch
    // is constructed), so AvailableNow termination leaves the watermark at
    // the previous epoch. Verify the ack contract itself directly: commit
    // advances the broker watermark to the committed offset.
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val table = new graft.connectors.MqttLikeSource()
      .getTable(null, Array.empty, java.util.Map.of("topic", "t1"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val stream = table.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .toMicroBatchStream(tmpDir("mqtt_ack_ck"))
    stream.commit(stream.deserializeOffset("""{"offset":25}"""))
    assert(MessageBus.acked("t1") == 25L, s"acked=${MessageBus.acked("t1")}")
  }

  test("offset tracking across restarts: only new messages on second run") {
    val s = spark
    import s.implicits._
    MessageBus.reset("t2")
    (1 to 10).foreach(i => MessageBus.publish("t2", s"a$i", s"old-$i".getBytes))

    val ck = tmpDir("mqtt_ck2")
    val first = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q1 = read("t2").writeStream
      .option("checkpointLocation", ck).trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.selectExpr("CAST(value AS STRING)").collect()
          .foreach(r => first.add(r.getString(0)))
      }.start()
    q1.awaitTermination(60000)
    assert(first.size == 10)

    (1 to 5).foreach(i => MessageBus.publish("t2", s"b$i", s"new-$i".getBytes))
    val second = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = read("t2").writeStream
      .option("checkpointLocation", ck).trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.selectExpr("CAST(value AS STRING)").collect()
          .foreach(r => second.add(r.getString(0)))
      }.start()
    q2.awaitTermination(60000)

    import scala.jdk.CollectionConverters._
    assert(second.asScala.toSeq.sorted == (1 to 5).map(i => s"new-$i").sorted,
      s"second run must deliver only the 5 new messages, got ${second.asScala.toSeq}")
  }
  test("maxRowsPerTrigger caps epochs (FlushLength, batcher.go:50-57)") {
    MessageBus.reset("t3")
    (1 to 100).foreach(i => MessageBus.publish("t3", s"m$i", s"p-$i".getBytes))
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val nRows = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.format("graft.connectors.MqttLikeSource")
      .option("topic", "t3").option("maxRowsPerTrigger", "30").load()
      .writeStream.option("checkpointLocation", tmpDir("mqtt_ck3"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count().toInt
        nBatches.incrementAndGet(); nRows.addAndGet(n)
        maxSeen.updateAndGet(m => math.max(m, n))
        ()
      }.start()
    q.awaitTermination(60000)
    assert(nRows.get() == 100, s"all rows delivered, got ${nRows.get()}")
    assert(maxSeen.get() <= 30, s"epoch exceeded FlushLength: ${maxSeen.get()}")
    assert(nBatches.get() >= 4, s"expected >=4 capped epochs, got ${nBatches.get()}")
  }

  test("multi-query concurrency: 3 independent queries drain one topic, offset isolation across one query's restart") {
    // The FlushParallelism>1 analog (batcher.go:139): the reference
    // fans one destination's flushes across N workers; Spark's native
    // rendition is N concurrent StreamingQueries over the same broker
    // log, each with its OWN checkpoint (subscriber group) and its own
    // per-epoch-committed sink. Pinned here: (a) the queries run
    // CONCURRENTLY against one shared topic and each drains everything
    // exactly once through the DSv2 StreamingWrite 2PC path; (b)
    // offsets are per-query — killing and restarting query 2 mid-run
    // neither disturbs queries 1/3 nor makes query 2 skip or re-publish
    // anything (it resumes from ITS checkpoint, not the others').
    import graft.connectors.CollectingSink
    val s = spark
    MessageBus.reset("mq_multi")
    val cks = (0 until 3).map(i => tmpDir(s"mq_multi_ck$i"))
    (0 until 3).foreach(i => CollectingSink.clear(s"mq_multi_$i"))

    def startQ(i: Int) = read("mq_multi")
      .selectExpr("key", "CAST(value AS STRING) AS payload")
      .writeStream.format("graft.connectors.CollectingSink")
      .option("table", s"mq_multi_$i")
      .option("checkpointLocation", cks(i))
      .outputMode("append").start()

    def keysOf(i: Int): Seq[String] =
      CollectingSink.streamRows(s"mq_multi_$i")
        .map(_.head.asInstanceOf[String])

    // tranche 1 → all three live subscribers see it
    (1 to 300).foreach(k =>
      MessageBus.publish("mq_multi", s"k$k", s"p$k".getBytes))
    val qs = scala.collection.mutable.ArrayBuffer(
      startQ(0), startQ(1), startQ(2))
    qs.foreach(_.processAllAvailable())
    assert((0 until 3).forall(keysOf(_).size == 300),
      s"tranche 1 fan-out: ${(0 until 3).map(keysOf(_).size)}")

    // query 2 goes down (simulated redeploy); tranche 2 lands while
    // it's out — queries 0/1 keep draining, unaffected
    qs(2).stop()
    (301 to 600).foreach(k =>
      MessageBus.publish("mq_multi", s"k$k", s"p$k".getBytes))
    qs(0).processAllAvailable(); qs(1).processAllAvailable()
    assert(keysOf(0).size == 600 && keysOf(1).size == 600,
      "live queries stalled by the dead one")
    assert(keysOf(2).size == 300, "stopped query must not advance")

    // restart query 2 from ITS checkpoint: catches up on exactly the
    // missed tranche (offset isolation — it does not inherit the other
    // queries' positions), then tranche 3 reaches all three
    qs(2) = startQ(2)
    qs(2).processAllAvailable()
    assert(keysOf(2).size == 600,
      s"restarted query missed/duplicated rows: ${keysOf(2).size}")
    (601 to 900).foreach(k =>
      MessageBus.publish("mq_multi", s"k$k", s"p$k".getBytes))
    qs.foreach(_.processAllAvailable())
    qs.foreach(_.stop())

    val want = (1 to 900).map(k => s"k$k").toSet
    (0 until 3).foreach { i =>
      val got = keysOf(i)
      assert(got.size == 900,
        s"query $i delivered ${got.size} rows (loss or duplication)")
      assert(got.toSet == want, s"query $i key set diverged")
    }
  }
}

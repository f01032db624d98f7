package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import graft.streaming.Sinks

/** Batcher semantics (x/batcher/batcher.go, batcher_test.go:37-379) as
  * micro-batch trigger/epoch tests:
  *  - flushes receive full batches (Flusher.Flush = foreachBatch);
  *  - flush error with Raise policy kills the pipeline (batcher.go:126-132);
  *  - fan-out writes every sink before the epoch commits (multidest.go:20-31).
  */
class BatcherSpec extends SparkSpec {

  test("foreachBatch receives batches; all rows flushed exactly once") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Int]
    input.addData(1 to 100: _*)
    val flushed = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val nFlushes = new AtomicInteger(0)

    val q = input.toDF()
      .writeStream.option("checkpointLocation", tmpDir("batcher_ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        nFlushes.incrementAndGet()
        df.collect().foreach(r => flushed.add(r.getInt(0)))
      }.start()
    q.awaitTermination(60000)

    import scala.jdk.CollectionConverters._
    assert(flushed.asScala.toSeq.sorted == (1 to 100), "all rows flushed once")
    assert(nFlushes.get() >= 1)
  }

  test("flush error (Raise policy) fails the query — batcher.go:126-132") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Int]
    input.addData(1, 2, 3)
    val q = input.toDF()
      .writeStream.option("checkpointLocation", tmpDir("batcher_err_ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        throw new RuntimeException("flush failed")
      }.start()
    val err = intercept[StreamingQueryException] { q.awaitTermination() }
    assert(err.getMessage.contains("flush failed") ||
      err.getCause.getMessage.contains("flush failed"))
  }

  test("fan-out: every sink sees the epoch; commit only after all writes") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Int]
    input.addData(1 to 10: _*)
    val sinkA = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val sinkB = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val writers: Seq[(org.apache.spark.sql.DataFrame, Long) => Unit] = Seq(
      (df, _) => df.collect().foreach(r => sinkA.add(r.getInt(0))),
      (df, _) => df.collect().foreach(r => sinkB.add(r.getInt(0))))

    val q = input.toDF()
      .writeStream.option("checkpointLocation", tmpDir("fanout_ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch(Sinks.multi(writers) _).start()
    q.awaitTermination(60000)

    import scala.jdk.CollectionConverters._
    assert(sinkA.asScala.toSeq.sorted == (1 to 10))
    assert(sinkB.asScala.toSeq.sorted == (1 to 10))
  }

  test("gzip time-partitioned sink writes hour-keyed gzip objects (s3.go:143-148)") {
    val s = spark
    import s.implicits._
    val out = tmpDir("gzsink")
    val df = Seq("r1", "r2", "r3").toDF("value")
    Sinks.gzipTimePartitioned(df, out, batchId = 7L)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator()
    import scala.jdk.CollectionConverters._
    val gz = files.asScala.filter(_.toString.endsWith(".gz")).toList
    assert(gz.nonEmpty, "gzip objects written")
    // key scheme prefix/yyyy/MM/dd/HH/batch_7
    assert(gz.head.toString.matches(".*/\\d{4}/\\d{2}/\\d{2}/\\d{2}/batch_7/.*"))
    val back = s.read.option("compression", "gzip").text(out + "/*/*/*/*/batch_7")
    assert(back.collect().map(_.getString(0)).sorted.toSeq == Seq("r1", "r2", "r3"))
  }

  test("gzip sink two-phase flush: committed replays absorbed, crashed attempts cleaned (ack-after-durable-write)") {
    val s = spark
    import s.implicits._
    def rows(prefix: String): Seq[String] =
      s.read.option("recursiveFileLookup", "true").text(prefix)
        .collect().map(_.getString(0)).toSeq

    // 1. replay AFTER commit: foreachBatch is at-least-once — the same
    // (epoch, data) delivered twice must publish once (types.go:104-113:
    // ack fired means durable; a replayed ack'd epoch is a no-op)
    val out1 = tmpDir("gz2pc_replay")
    Sinks.gzipTimePartitioned(Seq("a", "b").toDF("value"), out1, 3L)
    Sinks.gzipTimePartitioned(Seq("a", "b").toDF("value"), out1, 3L)
    assert(rows(out1).sorted == Seq("a", "b"),
      s"replayed committed epoch duplicated rows: ${rows(out1)}")

    // 2. replay after a CRASH between data write and commit (intent
    // marker present, commit absent — the half-written-object state):
    // the retry must delete the orphaned directory the intent names,
    // then publish exactly once, even when the wall-clock hour moved
    // and the rewrite lands under a different key
    val out2 = tmpDir("gz2pc_crash")
    val stale = s"$out2/1970/01/01/00/batch_9"
    Seq("stale1", "stale2").toDF("value").write
      .option("compression", "gzip").text(stale)
    val epochs = new java.io.File(s"$out2/_epochs"); epochs.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out2/_epochs/9.intent"),
      stale.getBytes("UTF-8"))
    Sinks.gzipTimePartitioned(Seq("fresh").toDF("value"), out2, 9L)
    assert(rows(out2) == Seq("fresh"),
      s"crashed attempt's partial objects survived the retry: ${rows(out2)}")
    assert(!new java.io.File(stale).exists(), "orphaned directory not deleted")
    assert(new java.io.File(s"$out2/_epochs/9.commit").exists(),
      "retry did not publish its commit marker")

    // 3. marker files are invisible to downstream readers (underscore
    // prefix = hidden to Spark's file index) — rows() above already
    // proves it, but pin the directory explicitly
    assert(new java.io.File(s"$out2/_epochs").listFiles().nonEmpty)

    // 4. a TRUNCATED intent (step 1 itself can crash mid-write) naming an
    // ancestor — here the hour directory holding ANOTHER epoch's committed
    // objects — must NOT be recursively deleted on replay: only a path of
    // the exact `$prefix/…/batch_$batchId` shape this epoch would have
    // written is eligible (Sinks.scala recovery validation)
    val out3 = tmpDir("gz2pc_trunc")
    val committed = s"$out3/1970/01/01/00/batch_5"
    Seq("keep1", "keep2").toDF("value").write
      .option("compression", "gzip").text(committed)
    new java.io.File(s"$out3/_epochs").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out3/_epochs/5.commit"), Array.empty[Byte])
    // epoch 9's intent crashed mid-write: names the HOUR directory
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out3/_epochs/9.intent"),
      s"$out3/1970/01/01/00".getBytes("UTF-8"))
    Sinks.gzipTimePartitioned(Seq("fresh9").toDF("value"), out3, 9L)
    assert(rows(out3).sorted == Seq("fresh9", "keep1", "keep2"),
      s"truncated intent recovery deleted another epoch's committed objects: ${rows(out3)}")
  }
}

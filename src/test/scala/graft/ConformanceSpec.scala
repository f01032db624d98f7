package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Msg, Pipeline}

/** Port of the reference's delivery-semantics conformance suite
  * (test/suite_test.go:16-88): 25 random 20-byte payloads through a
  * source → handler → sink pipeline; assert all delivered exactly once.
  * Spark's checkpointed MemoryStream → memory sink makes the exactly-once
  * assertion *stronger* than the reference's at-least-once contract.
  */
class ConformanceSpec extends SparkSpec {

  test("25 random payloads delivered exactly once through identity pipeline") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val rnd = new scala.util.Random(42)
    val payloads = Seq.fill(25)(rnd.alphanumeric.take(20).mkString)

    val input = MemoryStream[String]
    input.addData(payloads: _*)

    val envelope = input.toDS()
      .map(v => Msg(key = v.take(4), topic = "conformance",
        value = v.getBytes("UTF-8"), attributes = Map.empty[String, String]))
    val handled = Pipeline.via(envelope, Pipeline.pipe[Array[Byte]])

    val q = handled.map(m => new String(m.value, "UTF-8"))
      .writeStream.format("memory").queryName("conformance_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val got = s.sql("SELECT * FROM conformance_out").as[String].collect().toSeq
    assert(got.sorted == payloads.sorted, "all messages delivered")
    assert(got.distinct.size == got.size, "no duplicates")
  }

  test("handler drops (0-output) and fans out (n-output) like the reference") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Int]
    input.addData(1 to 10: _*)

    // odd → drop (empty Seq = processed+acked, types.go:124-126); even → 2 copies
    val h: Pipeline.Handler[Int, Int] = m =>
      if (m.value % 2 == 1) Seq.empty
      else Seq(m, m.copy(topic = "copy"))

    val envelope = input.toDS().map(v =>
      Msg(v.toString, "t", v, Map.empty[String, String]))
    val q = Pipeline.via(envelope, h).map(_.value)
      .writeStream.format("memory").queryName("handler_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val got = s.sql("SELECT * FROM handler_out").as[Int].collect().toSeq.sorted
    assert(got == Seq(2, 2, 4, 4, 6, 6, 8, 8, 10, 10))
  }

  test("fan-in union preserves all messages from both sources") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val a = MemoryStream[String]; val b = MemoryStream[String]
    a.addData("a1", "a2"); b.addData("b1", "b2", "b3")
    val q = a.toDS().union(b.toDS())
      .writeStream.format("memory").queryName("fanin_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.sql("SELECT * FROM fanin_out").as[String].collect().toSeq.sorted
    assert(got == Seq("a1", "a2", "b1", "b2", "b3"))
  }
}

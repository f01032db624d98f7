package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types.StructType
import graft.core.{Msg, Pipeline}

/** Deserialization semantics (`DeserializationSource`, types.go:169-195):
  * bytes → typed value preserving envelope fields; a deser failure is
  * FATAL to the pipeline (types.go:186,194) — the FAILFAST contract.
  * Spark's PERMISSIVE mode is the deliberate divergence option
  * (SURVEY.md §2 row 8). */
class DeserSpec extends SparkSpec {

  test("deser handler maps bytes to typed payload, envelope preserved") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[String]
    input.addData("7", "11")
    val env = input.toDS().map(v => Msg("k-" + v, "nums", v.getBytes("UTF-8"),
      Map("src" -> "test")))
    val typed = Pipeline.via(env,
      Pipeline.deserHandler((b: Array[Byte]) => new String(b, "UTF-8").toInt))
    val q = typed.writeStream.format("memory").queryName("deser_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = s.sql("SELECT key, topic, value, attributes['src'] FROM deser_out")
      .collect().sortBy(_.getInt(2))
    assert(rows.map(_.getInt(2)).toSeq == Seq(7, 11))
    assert(rows.head.getString(0) == "k-7" && rows.head.getString(1) == "nums")
    assert(rows.head.getString(3) == "test")
  }

  test("deser failure is fatal to the pipeline (FAILFAST, types.go:186)") {
    val s = spark
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[String]
    input.addData("42", "not-a-number")
    val env = input.toDS().map(v => Msg(v, "nums", v.getBytes("UTF-8"),
      Map.empty[String, String]))
    val typed = Pipeline.via(env,
      Pipeline.deserHandler((b: Array[Byte]) => new String(b, "UTF-8").toInt))
    val q = typed.writeStream.format("memory").queryName("deser_fail_out")
      .trigger(Trigger.AvailableNow()).start()
    intercept[StreamingQueryException] { q.awaitTermination() }
  }

  test("from_json FAILFAST vs PERMISSIVE on corrupt records") {
    val s = spark
    import s.implicits._
    val schema = StructType.fromDDL("k INT")
    val df = Seq("""{"k": 1}""", """{"k": oops""").toDF("js")

    // PERMISSIVE (divergence option): corrupt row → null struct
    val permissive = df.select(from_json(col("js"), schema).as("p"))
      .select(col("p.k")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(permissive.toSeq == Seq(Some(1), None))

    // FAILFAST (reference contract): corrupt row kills the job
    intercept[org.apache.spark.SparkException] {
      df.select(from_json(col("js"), schema, Map("mode" -> "FAILFAST")).as("p"))
        .collect()
    }
  }
}

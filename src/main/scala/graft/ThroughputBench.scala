package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Msg, Pipeline}

/** Analog of the reference's only benchmark harness (BenchmarkMem,
  * test/stream_test.go:29-41 / suite_test.go:106-155): push 1,000,000
  * 20-byte messages through source → envelope → identity handler → sink
  * and report end-to-end msgs/sec. Prints one JSON line with BOTH paths:
  *
  *  - `columnar`: the envelope as columns (key/topic/value/attributes) —
  *    stays inside Tungsten/whole-stage codegen, no JVM object serde.
  *    This is the engine's default path for byte pipelines.
  *  - `typed`: Dataset[Msg] with a flatMap Handler — pays object
  *    (de)serialization at every typed operator, including the
  *    Map[String,String] attributes conversion. Use only when handler
  *    logic genuinely needs JVM objects.
  *
  * The gap between the two is the reason SURVEY.md §7 says "functions,
  * not UDFs": at 100 TB the columnar envelope is the difference between
  * scan-bound and serde-bound.
  *
  * Usage: runMain graft.ThroughputBench [numMessages]
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 20-byte payloads, seeded (matches randomBytes(20), suite_test.go:18-25)
    val rnd = new scala.util.Random(42)
    val payload = Array.fill(20)(rnd.nextInt(256).toByte)

    def run(label: String, build: MemoryStream[Long] => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val input = MemoryStream[Long](cpus.toInt)
      input.addData(0L until n.toLong: _*)
      val t0 = System.nanoTime()
      val q = build(input).writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"tp_$label").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(600000)
      val secs = (System.nanoTime() - t0) / 1e9
      (q.recentProgress.map(_.numInputRows).sum, secs)
    }

    // columnar envelope: pure codegen'd column ops, no object serde
    val (cMsgs, cSecs) = run("columnar", in => in.toDF()
      .select((col("value") % 1024).cast("string").as("key"),
        lit("bench").as("topic"), lit(payload).as("value"),
        map().cast("map<string,string>").as("attributes")))

    // typed envelope + identity Handler: object boundary at each operator
    val (tMsgs, tSecs) = run("typed", in => in.toDS()
      .map(i => Msg(key = (i % 1024).toString, topic = "bench",
        value = payload, attributes = Map.empty[String, String]))
      .flatMap(Pipeline.pipe[Array[Byte]]).toDF())

    println(f"""{"metric":"mem_throughput","msgs":$n,"columnar_msgs_per_sec":${cMsgs / cSecs}%.0f,"typed_msgs_per_sec":${tMsgs / tSecs}%.0f,"columnar_sec":$cSecs%.2f,"typed_sec":$tSecs%.2f}""")
    spark.stop()
  }
}

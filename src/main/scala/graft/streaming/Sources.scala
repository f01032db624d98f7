package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source connectors (SURVEY.md §2 rows 16, 15, 18, 21, 24) mapped to
  * Spark sources. Each returns the canonical envelope columns
  * (key, topic, value, attributes) so handlers compose uniformly.
  */
object Sources {

  /** Scanner source (scanner.go:14-105): delimited reader → one message
    * per token. Batch flavor; `lineSep` handles arbitrary delimiters and
    * Spark's text source emits the final unterminated token exactly like
    * the reference's SplitFunc (scanner.go:90-105). */
  def scanner(spark: SparkSession, path: String, delim: String = "\n",
      topic: String = "scanner"): DataFrame =
    spark.read.option("lineSep", delim).text(path)
      .select(lit(null).cast("string").as("key"), lit(topic).as("topic"),
        col("value").cast("binary").as("value"),
        map().cast("map<string,string>").as("attributes"))

  /** Streaming scanner: file-stream flavor with EOF-drain ≈
    * Trigger.AvailableNow (scanner.go:43-76's "block until all acked"
    * becomes "process all available then stop"). */
  def scannerStream(spark: SparkSession, dir: String, delim: String = "\n",
      topic: String = "scanner"): DataFrame =
    spark.readStream.option("lineSep", delim).text(dir)
      .select(lit(null).cast("string").as("key"), lit(topic).as("topic"),
        col("value").cast("binary").as("value"),
        map().cast("map<string,string>").as("attributes"))

  /** Poller source (poller.go:15-99): periodic batch pull. Spark's
    * micro-batch loop IS this contract (latestOffset/getBatch with
    * batch-level commit = the coalesced ack, SURVEY.md §3.3); the rate
    * source stands in for an arbitrary poll target. NB the reference's
    * poller has a fatal bug (poller.go:79 always returns an error) — not
    * replicated. */
  def poller(spark: SparkSession, rowsPerSecond: Int = 100,
      topic: String = "poller"): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(col("value").cast("string").as("key"), lit(topic).as("topic"),
        col("value").cast("string").cast("binary").as("value"),
        map(lit("ts"), col("timestamp").cast("string")).as("attributes"))

  /** Fan-in (`MultiSource`, multisrc.go:18-81): union of sources; each
    * input's offsets are tracked independently in the checkpoint — the
    * per-origin ack passthrough for free. */
  def multi(sources: DataFrame*): DataFrame =
    sources.reduce(_.unionByName(_))

  /** EventLog-shaped source (windows/event_logs.go): the Windows-native
    * subscription is out of scope on JVM/Linux (SURVEY.md §2 row 24); its
    * schema + XPath-filter semantics are preserved as: JSON-lines read
    * with the nested EventLog StructType + a pushed-down filter. */
  val eventLogSchema: String =
    """system STRUCT<provider: STRUCT<name: STRING, guid: STRING>,
      |  eventId: STRING, version: STRING, level: STRING, task: STRING,
      |  opcode: STRING, keywords: STRING,
      |  timeCreated: STRUCT<systemTime: TIMESTAMP>,
      |  eventRecordId: STRING,
      |  execution: STRUCT<processId: STRING, threadId: STRING>,
      |  channel: STRING, computer: STRING,
      |  security: STRUCT<userId: STRING>>,
      |eventDataMap MAP<STRING, STRING>,
      |eventData ARRAY<STRING>,
      |userData MAP<STRING, STRING>""".stripMargin.replaceAll("\n", " ")

  def eventLog(spark: SparkSession, path: String, where: String = "true"): DataFrame =
    spark.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(eventLogSchema))
      .json(path).where(where)
}

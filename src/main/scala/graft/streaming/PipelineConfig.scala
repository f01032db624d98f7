package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Config-driven pipeline builder — the reference's daemon surface
  * (README.md:149-311): a declarative description of sources and
  * destinations assembled into a running pipeline.
  *
  * Reference config kinds → here:
  *  - sources `scanner`/`syslog`/`journald` → delimited text dirs;
  *    `mqtt` → DSv2 micro-batch connector; `eventlog` → JSON-lines with
  *    pushed filter; plus `rate`, `parquet`, and wishlist `kafka`
  *    (passthrough to Spark's connector);
  *  - destinations `printer` → console; `s3`/`r2` → gzip time-
  *    partitioned objects; `mqtt` → executor-side publisher;
  *    `runreveal` → webhook POST with error policies; plus
  *    `memory`/`parquet`.
  *
  * Config is a plain Map (parse JSON/HOCON however the host app likes —
  * deliberately no parser dependency here; zero-dependency library).
  */
object PipelineConfig {

  final case class SourceConf(kind: String, options: Map[String, String] = Map.empty)
  final case class SinkConf(kind: String, options: Map[String, String] = Map.empty)
  final case class PipelineConf(
      source: SourceConf,
      sink: SinkConf,
      checkpoint: String,
      triggerMs: Long = 1000L, // FlushFrequency default 1s (batcher.go:137)
      availableNow: Boolean = false) // drain-then-stop (scanner EOF analog)

  /** Build the source DataFrame (streaming). */
  def source(spark: SparkSession, c: SourceConf): DataFrame = c.kind match {
    // syslog (README.md:166-173) and journald (README.md:180-185) are
    // newline-delimited record streams; on Spark both land on the same
    // delimited-text file stream the scanner uses (the socket/journal
    // tail is the ingestion agent's job), tagged with their own topic.
    // The reference's `addr` option is accepted as inert metadata
    // (there's no listener to bind in a library); `contentType`
    // rfc3164/rfc5424 structures each record with the codegen'd
    // syslog parsers — malformed lines become valid=false structs,
    // never row failures.
    case "scanner" | "syslog" | "journald" =>
      val base = Sources.scannerStream(spark, c.options("path"),
        c.options.getOrElse("delim", "\n"),
        c.options.getOrElse("topic", c.kind))
      c.options.get("contentType") match {
        case Some("rfc3164") => base.withColumn("syslog",
          graft.functions.SyslogFunctions.parseRfc3164(
            org.apache.spark.sql.functions.col("value").cast("string")))
        case Some("rfc5424") => base.withColumn("syslog",
          graft.functions.SyslogFunctions.parseRfc5424(
            org.apache.spark.sql.functions.col("value").cast("string")))
        case _ => base
      }
    case "rate" =>
      Sources.poller(spark, c.options.getOrElse("rowsPerSecond", "100").toInt)
    // Columnar file-stream kinds: schema inferred once from existing
    // footers at pipeline build (NOT per micro-batch). orc rides the
    // same built-in file source machinery as parquet.
    case "parquet" =>
      spark.readStream.schema(
        spark.read.parquet(c.options("path")).schema).parquet(c.options("path"))
    case "orc" =>
      spark.readStream.schema(
        spark.read.orc(c.options("path")).schema).orc(c.options("path"))
    // Structured file-stream kinds for the two wire formats the
    // reference's deser layer targets (JSON via TransformUnmarshalJSON,
    // types.go:163-167; delimited records via the scanner): schema comes
    // from an explicit `schema` DDL option, or is inferred once from the
    // existing files (a batch-read of footers/samples at pipeline build —
    // NOT per micro-batch).
    case "jsonl" | "json" =>
      val schema = c.options.get("schema")
        .map(org.apache.spark.sql.types.StructType.fromDDL)
        .getOrElse(spark.read.json(c.options("path")).schema)
      spark.readStream.schema(schema).json(c.options("path"))
    case "csv" =>
      val header = c.options.getOrElse("header", "true")
      val schema = c.options.get("schema")
        .map(org.apache.spark.sql.types.StructType.fromDDL)
        .getOrElse(spark.read.option("header", header)
          .option("inferSchema", "true").csv(c.options("path")).schema)
      spark.readStream.schema(schema).option("header", header)
        .csv(c.options("path"))
    case "mqtt" =>
      // DSv2 micro-batch source (graft.connectors.MqttLikeSource); the
      // broker layer is the in-JVM MessageBus stub — see connector docs
      spark.readStream.format("graft.connectors.MqttLikeSource")
        .option("topic", c.options.getOrElse("topic", "#")).load()
    case "eventlog" =>
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(Sources.eventLogSchema))
        .json(c.options("path"))
        .where(c.options.getOrElse("query", "true")) // XPath filter analog
    // Wishlist kind (README.md:301-311) that is a one-liner on Spark:
    // options pass through verbatim (kafka.bootstrap.servers, subscribe,
    // …). Requires spark-sql-kafka on the classpath — absent here, the
    // provider lookup fails with Spark's own actionable error rather
    // than "unknown kind".
    case "kafka" =>
      c.options.foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
    case other => throw new IllegalArgumentException(s"unknown source kind: $other")
  }

  /** Attach the sink and start the query. */
  def start(spark: SparkSession, conf: PipelineConf, df: DataFrame): StreamingQuery = {
    val w = df.writeStream
      .option("checkpointLocation", conf.checkpoint)
      .trigger(if (conf.availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(conf.triggerMs))
    (conf.sink.kind match {
      case "console" | "printer" => w.format("console")
      case "memory" => w.format("memory").queryName(conf.sink.options("name"))
      case "parquet" => w.format("parquet").option("path", conf.sink.options("path"))
      case "orc" => w.format("orc").option("path", conf.sink.options("path"))
      case "s3" | "r2" => // r2 = same S3-compatible sink (README.md:159)
        val prefix = conf.sink.options.getOrElse("prefix",
          conf.sink.options("bucketName")) // reference option name
        w.foreachBatch((b: DataFrame, id: Long) => Sinks.gzipTimePartitioned(b, prefix, id))
      case "mqtt" => // mqtt.Destination (mqtt.go:105-176; loadOpts 92-103)
        w.foreach(Sinks.mqttPublisher(
          conf.sink.options.getOrElse("topic", "#"),
          qos = conf.sink.options.getOrElse("qos", "2").toInt,
          retained = conf.sink.options.getOrElse("retained", "false").toBoolean,
          clientId = conf.sink.options.getOrElse("clientID", "graft")))
      case "runreveal" => // webhook POST (README.md:245-251)
        val url = conf.sink.options("webhookURL")
        val policy = conf.sink.options.getOrElse("onError", "dontAck") match {
          case "raise" => Webhook.ErrorPolicy.Raise
          case "discard" => Webhook.ErrorPolicy.Discard
          case _ => Webhook.ErrorPolicy.DontAck
        }
        w.foreachBatch((b: DataFrame, id: Long) => Webhook.flush(url, policy)(b, id))
      case other => throw new IllegalArgumentException(s"unknown sink kind: $other")
    }).start()
  }

  /** Assemble source → optional SQL transform → sink (the full daemon
    * pipeline: Configure then Run, README.md:69-103). */
  def run(spark: SparkSession, conf: PipelineConf,
      transformSql: Option[String] = None): StreamingQuery = {
    val src = source(spark, conf.source)
    val transformed = transformSql.map { sql =>
      src.createOrReplaceTempView("src"); spark.sql(sql)
    }.getOrElse(src)
    start(spark, conf, transformed)
  }
}

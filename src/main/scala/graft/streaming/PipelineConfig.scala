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
  *    `mqtt`/`eventlog` → kafka-shaped / JSON-lines stand-ins;
  *    plus `rate` and `parquet`;
  *  - destinations `printer` → console; `s3` → gzip time-partitioned
  *    objects; `mqtt` → kafka-shaped; plus `memory`/`parquet`.
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
      triggerMs: Long = 1000L) // FlushFrequency default 1s (batcher.go:137)

  /** Build the source DataFrame (streaming). */
  def source(spark: SparkSession, c: SourceConf): DataFrame = c.kind match {
    case "scanner" =>
      Sources.scannerStream(spark, c.options("path"),
        c.options.getOrElse("delim", "\n"), c.options.getOrElse("topic", "scanner"))
    case "rate" =>
      Sources.poller(spark, c.options.getOrElse("rowsPerSecond", "100").toInt)
    case "parquet" =>
      spark.readStream.schema(
        spark.read.parquet(c.options("path")).schema).parquet(c.options("path"))
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
    case other => throw new IllegalArgumentException(s"unknown source kind: $other")
  }

  /** Attach the sink and start the query. */
  def start(spark: SparkSession, conf: PipelineConf, df: DataFrame): StreamingQuery = {
    val w = df.writeStream
      .option("checkpointLocation", conf.checkpoint)
      .trigger(Trigger.ProcessingTime(conf.triggerMs))
    (conf.sink.kind match {
      case "console" => w.format("console")
      case "memory" => w.format("memory").queryName(conf.sink.options("name"))
      case "parquet" => w.format("parquet").option("path", conf.sink.options("path"))
      case "s3" =>
        val prefix = conf.sink.options("prefix")
        w.foreachBatch((b: DataFrame, id: Long) => Sinks.gzipTimePartitioned(b, prefix, id))
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

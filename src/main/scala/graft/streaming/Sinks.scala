package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** Destination connectors (SURVEY.md §2 rows 17, 20, 23) on Spark sinks.
  * Delivery contract: the reference is at-least-once with ack-after-
  * durable-write (types.go:104-113); Spark's epoch commit to the sink's
  * log is a strict superset (exactly-once for replayable source +
  * idempotent sink) — documented divergence, not emulated (SURVEY.md §4).
  */
object Sinks {

  /** Printer sink (printer.go:10-43): value + delimiter to stdout —
    * every row, streamed through the driver without materializing the
    * whole result (matches the reference's per-message write loop). */
  def printer(df: DataFrame, delim: String = "\n"): Unit =
    df.select(col("value").cast("string")).toLocalIterator()
      .forEachRemaining(r => print(r.getString(0) + delim))

  /** S3-style sink (s3.go:20-162): batches as gzip NDJSON objects under
    * time-partitioned keys `prefix/yyyy/MM/dd/HH/` (s3.go:143-148).
    * Implemented as foreachBatch (= `Flusher.Flush`, batcher.go:30-38)
    * writing gzip text; `prefix` can be any Hadoop-FS URI (s3a:// in prod,
    * file:// in tests — same code path).
    *
    * Crash-replay idempotence (the reference's ack-after-durable-write
    * contract, types.go:104-113, at the object-store level): foreachBatch
    * is at-least-once, and the hour key comes from the WALL CLOCK — a
    * batch that wrote its objects but died before the checkpoint commit
    * would be replayed into a possibly-different hour directory,
    * duplicating every row. The flush is therefore two-phase per epoch:
    *  1. write `_epochs/<id>.intent` naming the target directory,
    *  2. write the gzip objects (mode overwrite — same-path replays
    *     self-clean),
    *  3. write `_epochs/<id>.commit` — the publication point.
    * A replayed epoch with a commit marker is absorbed (skip); one with
    * only an intent marker first deletes the half-written directory it
    * names, then rewrites. The recovered path is VALIDATED before the
    * recursive delete: the intent file is itself written non-atomically
    * (step 1 can crash mid-write), so a truncated marker could name an
    * ancestor (e.g. the hour directory) holding other epochs' committed
    * objects. Only a path of the exact shape this epoch would have
    * written — `$prefix/…/batch_$batchId` — is deleted; anything else is
    * skipped (safe: objects go out in mode overwrite, so a same-path
    * replay self-cleans without the delete). Marker files live under
    * `_epochs/`, which Spark's file index hides from downstream reads
    * (underscore prefix).
    * Soak's kill-and-resume drives this path end to end and reports
    * lost/duplicated = 0/0; SinkConformanceSpec pins the same contract
    * for the DSv2 streaming sink.
    *
    * Uniqueness/sortability of the reference's `<ksuid>_<unix>.gz` object
    * names is provided by Spark's task-attempt file naming + batchId. */
  def gzipTimePartitioned(df: DataFrame, prefix: String, batchId: Long): Unit = {
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    val epochsDir = new org.apache.hadoop.fs.Path(s"$prefix/_epochs")
    val fs = epochsDir.getFileSystem(hadoopConf)
    val commit = new org.apache.hadoop.fs.Path(epochsDir, s"$batchId.commit")
    if (fs.exists(commit)) return // replayed epoch: already published
    val intent = new org.apache.hadoop.fs.Path(epochsDir, s"$batchId.intent")
    if (fs.exists(intent)) { // crashed attempt: drop its partial objects
      val in = fs.open(intent)
      val prior = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (prior.startsWith(s"$prefix/") && prior.endsWith(s"/batch_$batchId"))
        fs.delete(new org.apache.hadoop.fs.Path(prior), true)
    }
    val hourPath = java.time.format.DateTimeFormatter.ofPattern("yyyy/MM/dd/HH")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val target = s"$prefix/$hourPath/batch_$batchId"
    val out = fs.create(intent, true)
    try out.write(target.getBytes("UTF-8")) finally out.close()
    df.select(col("value").cast("string"))
      .write.mode("overwrite").option("compression", "gzip")
      .text(target)
    fs.create(commit, true).close()
  }

  /** Batcher semantics (batcher.go:58-400) as a micro-batch writer:
    * FlushFrequency → processing-time trigger; FlushLength → source rate
    * limit (maxFilesPerTrigger/maxOffsetsPerTrigger, set on the source);
    * error policy Raise → exception propagates and fails the query;
    * ErrDontAck → batch not committed, retried from checkpoint (Spark's
    * native behavior). FlushParallelism>1 has no SINGLE-query micro-batch
    * equivalent — epochs are sequential by design (SURVEY.md §4); the
    * Spark-native analog is N concurrent queries over one source with
    * independent checkpoints, pinned in MqttLikeSourceSpec and measured
    * as StreamBench's concurrency_curve (aggregate drain ~N×, per-query
    * rate flat). */
  def batched(df: DataFrame, checkpoint: String, flushFrequencyMs: Long)(
      flush: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(flushFrequencyMs))
      .foreachBatch(flush)

  /** MQTT publisher sink (`mqtt.Destination`, mqtt.go:105-176): rows
    * published to the broker topic from executors, exactly-once via the
    * broker's (partition, epoch) dedup at the default qos=2 — see
    * MqttLikePublisher docs for the qos/retained/clientID option
    * surface (loadOpts, mqtt.go:92-103).
    * Usage: `df.writeStream.foreach(Sinks.mqttPublisher("t"))`. */
  def mqttPublisher(topic: String, qos: Int = 2, retained: Boolean = false,
      clientId: String = "graft"): graft.connectors.MqttLikePublisher =
    new graft.connectors.MqttLikePublisher(topic, qos, retained, clientId)

  /** Webhook destination (the daemon's `runreveal` kind) — see
    * graft.streaming.Webhook for the POST semantics + error policies. */
  def webhook(url: String,
      policy: Webhook.ErrorPolicy = Webhook.ErrorPolicy.DontAck)(
      df: DataFrame, epochId: Long): Unit =
    Webhook.flush(url, policy)(df, epochId)

  /** Fan-out (`MultiDestination`, multidest.go:9-49): write one epoch to
    * every sink inside a single foreachBatch — persist once, write n
    * times, commit once. The all-or-nothing ack (ackFn(ack, n),
    * multidest.go:20-31) is exactly "epoch commits only after every write
    * succeeded". */
  def multi(sinks: Seq[(DataFrame, Long) => Unit])(df: DataFrame, batchId: Long): Unit = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try sinks.foreach(s => s(df, batchId))
    finally df.unpersist()
  }

  /** Materialized streaming aggregate: maintain a queryable parquet table
    * from an update-mode aggregation by overwriting exactly the
    * partitions whose groups changed this epoch (dynamic partition
    * overwrite). The partition columns MUST be the full grouping key —
    * then each partition holds one group, the overwrite is a pure upsert,
    * and replaying an epoch after a crash rewrites the same partitions
    * with the same content: idempotent, hence exactly-once end-to-end
    * without a transactional table format. This is the micro-batch
    * MERGE-free upsert pattern for plain-parquet lakehouses; at 100 TB
    * the partition count is the group-key cardinality, so pick the key
    * accordingly (window × low-card dims), not a high-card id. */
  def materializedAgg(agg: DataFrame, checkpoint: String, path: String,
      partitionCols: Seq[String], triggerMs: Long = 100L): StreamingQuery =
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val conf = batch.sparkSession.conf
        val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try batch.write.mode("overwrite")
          .partitionBy(partitionCols: _*).parquet(path)
        finally conf.set("spark.sql.sources.partitionOverwriteMode",
          prev.getOrElse("static"))
      }
      .start()
}

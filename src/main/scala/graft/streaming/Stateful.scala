package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY.md §2.2 streaming row): event-time
  * windows, watermarked dedup, session windows, custom state machines.
  * The reference has NO event time and NO state store (batcher is
  * processing-time count/timer batching only, batcher.go:244-274) — this
  * is the §2.2 extension surface on Structured Streaming primitives.
  *
  * Scale posture: all state lives in the state store (RocksDB-backed on a
  * real cluster), partitioned by grouping key; watermarks bound state
  * growth; no driver-side state anywhere.
  */
object Stateful {

  /** Tumbling/sliding event-time window counts with late-data bound. */
  def windowedCounts(df: DataFrame, tsCol: String, watermark: String,
      windowDur: String, slide: Option[String] = None): DataFrame = {
    val w = slide.map(sl => window(col(tsCol), windowDur, sl))
      .getOrElse(window(col(tsCol), windowDur))
    df.withWatermark(tsCol, watermark)
      .groupBy(w, col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming exact dedup with bounded state: id-only dedup via
    * dropDuplicatesWithinWatermark — a re-delivery with a shifted
    * timestamp (arrival-time stamping after a retry) is still dropped,
    * and state for ids older than the watermark horizon is evicted
    * (the streaming analog of hash-dedup at rest). */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(idCols)

  /** Session windows: gap-based grouping per user. */
  def sessionize(df: DataFrame, tsCol: String, watermark: String,
      gap: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** Custom state machine via flatMapGroupsWithState: running per-key
    * count + total emitted on every update — the general template for
    * enrich/accumulate handlers the reference would write imperatively. */
  final case class KeyState(n: Long, total: Double)
  final case class Enriched(key: Long, n: Long, total: Double)

  def runningTotals(ds: Dataset[(Long, Double)])(
      implicit e1: Encoder[KeyState], e2: Encoder[Enriched],
      e3: Encoder[Long]): Dataset[Enriched] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[KeyState]) =>
          val prev = state.getOption.getOrElse(KeyState(0L, 0.0))
          val batch = rows.toSeq
          val next = KeyState(prev.n + batch.size, prev.total + batch.map(_._2).sum)
          state.update(next)
          Iterator.single(Enriched(key, next.n, next.total))
      }

  /** Streaming SCD2: the incremental twin of the batch history build
    * (operators/Temporal.q48Scd2). Per-key state carries the one OPEN
    * period; an attribute change closes it (emitted downstream, append
    * mode) and opens the next. State is O(1) per key — the closed
    * history lives in the sink, not the state store.
    *
    * Ordering contract: rows are applied in (ts, event_id) order within
    * each micro-batch; cross-batch order must be non-decreasing per key
    * (the CDC-source contract — a log-sequence-ordered feed). Handling
    * arbitrary out-of-order arrival needs watermark-bounded buffering in
    * the state, which trades state size for reordering slack. */
  final case class Scd2State(eventType: String, validFrom: java.sql.Timestamp,
      version: Int, nEvents: Long)
  final case class Scd2Period(user_id: Long, event_type: String,
      valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp,
      version: Int, n_events: Long)

  /** Input rows: (user_id, ts, event_id, event_type). */
  /** Streaming twin of the batch OHLC resample (Temporal.q56Ohlc):
    * watermarked 6-hour tumbling candles per event_type. Open/close are
    * min_by/max_by on the (ts, event_id) struct — a declarative
    * aggregate, so partial candles merge associatively across
    * micro-batches and state per (window, type) is O(1): six scalars
    * and two (key, value) pairs, never the events themselves. Candles
    * emit (append mode) once the watermark passes the window end —
    * the streamed table converges to exactly the batch resample. */
  def ohlcStream(df: DataFrame, watermark: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max("value").as("high"), min("value").as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        avg("value").as("mean_value"), sum("value").as("volume"))
      .select((col("window.start").cast("long") / 21600).cast("long").as("bucket"),
        col("event_type"), col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("mean_value"), col("volume"))

  def scd2Stream(ds: Dataset[(Long, java.sql.Timestamp, Long, String)])(
      implicit e1: Encoder[Scd2State], e2: Encoder[Scd2Period],
      e3: Encoder[Long]): Dataset[Scd2Period] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[Scd2State]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Period]
          rows.toSeq.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).foreach {
            case (_, ts, _, et) => st match {
              case null => st = Scd2State(et, ts, 1, 1L)
              case s if s.eventType == et => st = s.copy(nEvents = s.nEvents + 1)
              case s =>
                out += Scd2Period(user, s.eventType, s.validFrom, ts,
                  s.version, s.nEvents)
                st = Scd2State(et, ts, s.version + 1, 1L)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
}

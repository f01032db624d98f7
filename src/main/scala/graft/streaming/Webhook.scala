package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Webhook destination — the reference daemon's `runreveal` sink kind
  * (README.md:245-251: `{"type":"runreveal","webhookURL":...}`), which
  * POSTs event batches to an HTTP endpoint, composed with the batcher's
  * error policies (batcher.go:16-21, 358-381):
  *
  *  - `Raise`   — flush error propagates and fails the query
  *    (batcher.go:371-374 "exposing the error upstream");
  *  - `Discard` — error swallowed, epoch commits, batch dropped
  *    (an ErrorHandler returning nil);
  *  - `DontAck` — epoch does NOT commit; the checkpoint replays it on
  *    restart (ErrDontAck: "skip acking … retried upstream at the
  *    source", batcher.go:16-21).
  *
  * THE HTTP TRANSPORT IS A LOCAL IN-JVM STUB (`WebhookStub`) — this
  * environment has no egress; a real deployment swaps `WebhookStub.post`
  * for an HTTP client POST with the same idempotency-key header. The
  * Spark side is real: posts happen per-partition on executors (never a
  * driver collect), the idempotency key is (epochId, partitionId) so a
  * replayed epoch whose partition already landed is deduplicated by the
  * receiver — which is exactly how production webhook consumers get
  * exactly-once over an at-least-once retry loop.
  */
object Webhook {

  sealed trait ErrorPolicy
  object ErrorPolicy {
    case object Raise extends ErrorPolicy
    case object Discard extends ErrorPolicy
    case object DontAck extends ErrorPolicy
  }

  /** Marker for DontAck: fails the epoch so the checkpoint replays it;
    * distinguishable from a fatal `Raise` failure in logs/tests. */
  final class RetryableFlushException(cause: Throwable)
    extends RuntimeException("flush not acked; epoch will be retried from checkpoint", cause)

  /** foreachBatch flush: POST each partition's rows as one body. */
  def flush(url: String, policy: ErrorPolicy)(df: DataFrame, epochId: Long): Unit =
    try {
      df.select(col("value").cast("string").as("value"))
        .foreachPartition { (it: Iterator[Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val body = it.map(_.getString(0)).toArray
          if (body.nonEmpty) WebhookStub.post(url, s"$epochId-$pid", body)
        }
    } catch {
      case e: Throwable => policy match {
        case ErrorPolicy.Raise => throw e
        case ErrorPolicy.Discard => WebhookStub.recordDiscard(url)
        case ErrorPolicy.DontAck => throw new RetryableFlushException(e)
      }
    }
}

/** In-JVM stand-in for the remote webhook service: records bodies keyed
  * by idempotency key (duplicate key → no-op, like a dedup-by-
  * `Idempotency-Key` receiver) and can be told to fail the next N posts
  * (a flaky remote returning 503s). */
object WebhookStub {
  private val received = new ConcurrentHashMap[String, ConcurrentHashMap[String, Array[String]]]()
  private val failNextN = new ConcurrentHashMap[String, AtomicInteger]()
  private val attemptsN = new ConcurrentHashMap[String, AtomicLong]()
  private val discards = new ConcurrentHashMap[String, AtomicLong]()

  private def box(url: String) =
    received.computeIfAbsent(url, _ => new ConcurrentHashMap[String, Array[String]]())

  /** Make the next `n` posts to `url` fail (before anything is recorded —
    * the request never reached the handler). */
  def failNext(url: String, n: Int): Unit =
    failNextN.computeIfAbsent(url, _ => new AtomicInteger(0)).set(n)

  def post(url: String, idempotencyKey: String, body: Array[String]): Unit = {
    attemptsN.computeIfAbsent(url, _ => new AtomicLong(0)).incrementAndGet()
    val remaining = failNextN.get(url)
    if (remaining != null && remaining.getAndDecrement() > 0)
      throw new java.io.IOException(s"503 Service Unavailable: $url")
    box(url).putIfAbsent(idempotencyKey, body)
  }

  private[streaming] def recordDiscard(url: String): Unit =
    discards.computeIfAbsent(url, _ => new AtomicLong(0)).incrementAndGet()

  /** All delivered payload lines across accepted posts. */
  def delivered(url: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    box(url).values().asScala.toSeq.flatten
  }
  def attempts(url: String): Long =
    Option(attemptsN.get(url)).map(_.get()).getOrElse(0L)
  def discarded(url: String): Long =
    Option(discards.get(url)).map(_.get()).getOrElse(0L)

  def reset(url: String): Unit = {
    received.remove(url); failNextN.remove(url)
    attemptsN.remove(url); discards.remove(url)
  }
}

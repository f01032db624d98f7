package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra-Gries frequent-items summary with `k` counters, as a typed
  * Spark [[Aggregator]] (partial-aggregates map-side, merges on the
  * reducer — the mergeable-summary shape of Agarwal et al., "Mergeable
  * Summaries", PODS '12).
  *
  * Invariants (n = stream length, D = total decrement weight):
  *  - every compaction subtracts its decrement from ≥ k+1 counters, so
  *    (k+1)·D ≤ n, i.e. D ≤ n/(k+1);
  *  - each item's estimate undercounts its true frequency by ≤ D;
  *  - hence every item with true frequency > n/(k+1) SURVIVES in the
  *    summary (its counter cannot reach 0), and that guarantee is
  *    preserved under merge in any order.
  *
  * The summary itself is merge-order-dependent (which sub-threshold
  * items remain, and their estimates, vary with partition order), so
  * engine queries must not expose raw estimates where determinism is
  * required — see q66, which uses the summary only as a CANDIDATE set
  * and recounts exactly. MisraGriesSpec pins the guarantees.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(k >= 1, "MisraGries needs at least one counter")

  /** Decrement every counter by the smallest one and drop zeros: frees
    * ≥ 1 slot and retires (size ≥ k+1)·dec stream weight at once. */
  private def compact(b: mutable.HashMap[String, Long]): Unit = {
    val dec = b.valuesIterator.min
    b.mapValuesInPlace((_, v) => v - dec)
    b.filterInPlace((_, v) => v > 0)
  }

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], item: String)
      : mutable.HashMap[String, Long] = {
    if (item != null) {
      val cur = b.getOrElse(item, 0L)
      b.update(item, cur + 1L)
      if (cur == 0L && b.size > k) compact(b)
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (t, c) => big.update(t, big.getOrElse(t, 0L) + c) }
    while (big.size > k) compact(big)
    big
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
    b.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

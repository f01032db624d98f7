package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-by-count summary with exact stream totals, as a typed
  * [[Aggregator]] — the one-pass companion to [[MisraGries]] for inputs
  * that are ALREADY exact per-key counts (a post-aggregation key
  * histogram). State is (total weight, key count, k-element top list),
  * so partials are O(k), merge is associative and commutative (the top
  * list is a selection by the total order (count desc, key asc), which
  * is merge-order-invariant), and the result is deterministic — unlike
  * a sketch, nothing here is approximate because each input key arrives
  * exactly once.
  *
  * Used by q92's skew audit to fold (hot set + totals) out of the
  * per-key counts table in a single distributed pass instead of two
  * subplans re-scanning the corpus.
  */
final class TopKByCount(k: Int)
    extends Aggregator[(Long, Long), (Long, Long, Seq[(Long, Long)]),
      (Long, Long, Seq[(Long, Long)])] {
  require(k >= 1)

  /** entries are (count, key); selection order: count desc, key asc. */
  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: (Long, Long, Seq[(Long, Long)]) = (0L, 0L, Nil)

  override def reduce(b: (Long, Long, Seq[(Long, Long)]),
      in: (Long, Long)): (Long, Long, Seq[(Long, Long)]) = {
    val (key, n) = in
    (b._1 + n, b._2 + 1L, trim(b._3 :+ ((n, key))))
  }

  override def merge(a: (Long, Long, Seq[(Long, Long)]),
      b: (Long, Long, Seq[(Long, Long)])): (Long, Long, Seq[(Long, Long)]) =
    (a._1 + b._1, a._2 + b._2, trim(a._3 ++ b._3))

  override def finish(b: (Long, Long, Seq[(Long, Long)]))
      : (Long, Long, Seq[(Long, Long)]) = (b._1, b._2, trim(b._3))

  import org.apache.spark.sql.{Encoder, Encoders}
  override def bufferEncoder: Encoder[(Long, Long, Seq[(Long, Long)])] =
    Encoders.product[(Long, Long, Seq[(Long, Long)])]
  override def outputEncoder: Encoder[(Long, Long, Seq[(Long, Long)])] =
    Encoders.product[(Long, Long, Seq[(Long, Long)])]
}

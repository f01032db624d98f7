package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's pipeline model (`Processor`, processor.go:19-167)
  * re-expressed Spark-first.
  *
  * A reference pipeline is Source → Handler → Destination with n identical
  * worker loops; here the "plan" is a lazy Dataset transform chain and the
  * worker loops are Spark tasks (one per partition — `Parallelism(n)`
  * becomes partitioning, SURVEY.md §2 row 9). Fatal-error semantics
  * (processor.go:146-166) map to query/job failure; clean shutdown maps to
  * `StreamingQuery.stop()`.
  *
  * `Handler[T1,T2]` (types.go:127-135) — the reference's ONLY transform:
  * 1 event → 0..n events, possibly retyped. That is exactly `flatMap`:
  * filter = empty Seq, map = singleton. Handlers compose left-to-right.
  */
object Pipeline {

  /** Handler: 1 message in, 0..n messages out (types.go:124-135). */
  type Handler[A, B] = Msg[A] => Seq[Msg[B]]

  /** Identity handler (`Pipe[T]()`, types.go:137-145). */
  def pipe[A]: Handler[A, A] = m => Seq(m)

  /** Compose two handlers (the reference chains processors; we fuse). */
  def andThen[A, B, C](f: Handler[A, B], g: Handler[B, C]): Handler[A, C] =
    m => f(m).flatMap(g)

  /** Deserialization decorator (`DeserializationSource`, types.go:169-195):
    * bytes → T preserving envelope fields. A deser failure throws and kills
    * the job — the reference's FAILFAST contract (types.go:186,194). */
  def deserHandler[T](deser: Array[Byte] => T): Handler[Array[Byte], T] =
    m => Seq(Msg(m.key, m.topic, deser(m.value), m.attributes))

  /** Apply a handler to a typed envelope Dataset — works identically for
    * batch and streaming Datasets (incremental execution is the engine's
    * concern, not the operator's). */
  def via[A, B](ds: Dataset[Msg[A]], h: Handler[A, B])(
      implicit enc: Encoder[Msg[B]]): Dataset[Msg[B]] =
    ds.flatMap(h)

  /** Shard by envelope key (`Message.Key` contract, types.go:12-14):
    * hash-partition so all messages with one key land in one task — the
    * Spark analog of key-routed topic sharding. */
  def shardByKey[A](ds: Dataset[Msg[A]], numPartitions: Int): Dataset[Msg[A]] =
    ds.repartition(numPartitions, col("key"))
}

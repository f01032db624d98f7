package graft.core

import org.apache.spark.sql.types._

/** The message envelope — the reference's single fundamental abstraction
  * (`Message[T]`, types.go:10-26) re-expressed as a case class + canonical
  * StructType (SURVEY.md §1.4).
  *
  *  - `key`: sharding/routing key (types.go:12-14) → partitioning column;
  *  - `topic`: provenance, informational only (types.go:20-21);
  *  - `value`: the payload — `Array[Byte]` for wire-shaped pipelines
  *    (`ByteSource`, types.go:159-161), any Encoder-able T after deser;
  *  - `attributes`: flattened metadata map (types.go:28-30 — the reference's
  *    linked Attributes chain is never populated anywhere, so a MAP column
  *    loses nothing).
  *
  * Ack semantics (types.go:48-57) intentionally have NO field here: Spark's
  * checkpoint/offset tracking subsumes per-message acks (SURVEY.md §2 row 1).
  */
final case class Msg[T](
    key: String,
    topic: String,
    value: T,
    attributes: Map[String, String])

object Msg {
  /** Canonical envelope schema for untyped (DataFrame) pipelines: payload
    * as raw bytes, exactly the shape of Spark's Kafka source output. */
  val byteSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("topic", StringType),
    StructField("value", BinaryType),
    StructField("attributes", MapType(StringType, StringType))))

  def bytes(key: String, topic: String, value: Array[Byte]): Msg[Array[Byte]] =
    Msg(key, topic, value, Map.empty)
}

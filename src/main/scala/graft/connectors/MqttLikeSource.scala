package graft.connectors

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** MQTT-shaped DataSource V2 micro-batch source (SURVEY.md §2 rows 21-22 —
  * "the one connector that genuinely needs custom source code in Spark").
  *
  * The BROKER LAYER IS A DETERMINISTIC IN-JVM STUB (`MessageBus`) because
  * this environment has no network egress and no MQTT client jar; a real
  * deployment replaces `MessageBus` with a Paho subscription feeding the
  * same append-only per-topic log (payload + messageID key, exactly the
  * envelope mqtt.go:212-225 builds). Everything Spark-side is real DSv2:
  * offset tracking, checkpoint-driven replay, range-partitioned batch
  * planning, and per-epoch commit — i.e. the reference's ack contract
  * (ack after durable delivery, types.go:48-57) expressed as epoch commits.
  *
  * Usage:
  *   spark.readStream.format("graft.connectors.MqttLikeSource")
  *     .option("topic", "t").load()
  * Schema: the canonical envelope (key, topic, value binary, attributes).
  */
class MqttLikeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttLikeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttTable(properties.getOrDefault("topic", "#"),
      Option(properties.get("maxRowsPerTrigger")).map(_.toLong),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object MqttLikeSource {
  /** The canonical envelope schema (single definition: core.Msg). */
  val schema: StructType = graft.core.Msg.byteSchema
}

/** In-JVM append-only per-topic message log — the stand-in for a broker
  * session. `committed` mirrors the broker-side QoS ack watermark: it
  * advances only when Spark commits an epoch, never blocks replay from
  * an older checkpoint (the log is retained). */
object MessageBus {
  /** One broker message: key, payload, and publisher attributes (the
    * clientID/qos/retained metadata a real broker carries per packet). */
  final case class BusMsg(key: String, payload: Array[Byte],
      attrs: Map[String, String] = Map.empty)

  private val logs = new java.util.concurrent.ConcurrentHashMap[String, ArrayBuffer[BusMsg]]()
  private val committed = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  // per-topic last retained message — MQTT retained-flag semantics: the
  // broker keeps the newest retained payload for late subscribers
  private val retainedMsgs = new java.util.concurrent.ConcurrentHashMap[String, BusMsg]()
  // (topic, partitionId, epochId) triples already appended by a publisher —
  // the broker-side dedup a real deployment gets from MQTT QoS 2 / packet
  // identifiers (mqtt.go:64-67 qos option). Lets an epoch replayed from an
  // uncommitted checkpoint re-publish without duplicating.
  private val delivered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long, Long)]()

  private def log(topic: String): ArrayBuffer[BusMsg] =
    logs.computeIfAbsent(topic, _ => ArrayBuffer.empty)

  def publish(topic: String, key: String, payload: Array[Byte],
      attrs: Map[String, String] = Map.empty): Unit =
    log(topic).synchronized { log(topic) += BusMsg(key, payload, attrs) }

  /** Per-(partition, epoch) batch publish. With `dedup` (the QoS-2
    * analog) the batch appends only the first time a given (topic,
    * partition, epoch) is delivered; without it (QoS 0/1) a replayed
    * epoch re-publishes — at-least-once, duplicates visible, exactly
    * what downgrading QoS buys in a real broker. A `retained` batch
    * also installs its last row as the topic's retained message. */
  def publishEpoch(topic: String, partitionId: Long, epochId: Long,
      rows: Seq[BusMsg], retained: Boolean = false,
      dedup: Boolean = true): Unit =
    if (!dedup || delivered.add((topic, partitionId, epochId))) {
      log(topic).synchronized { log(topic) ++= rows }
      if (retained && rows.nonEmpty) retainedMsgs.put(topic, rows.last)
    }

  def epochDelivered(topic: String, partitionId: Long, epochId: Long): Boolean =
    delivered.contains((topic, partitionId, epochId))

  def size(topic: String): Long = log(topic).synchronized { log(topic).size.toLong }

  def range(topic: String, from: Long, until: Long): Seq[BusMsg] =
    log(topic).synchronized { log(topic).slice(from.toInt, until.toInt).toSeq }

  def payloads(topic: String): Seq[String] =
    range(topic, 0L, size(topic)).map(p => new String(p.payload, "UTF-8"))

  def retained(topic: String): Option[BusMsg] = Option(retainedMsgs.get(topic))

  def ack(topic: String, upTo: Long): Unit = committed.put(topic, upTo)
  def acked(topic: String): Long = committed.getOrDefault(topic, 0L)
  def reset(topic: String): Unit = {
    logs.remove(topic); committed.remove(topic); retainedMsgs.remove(topic)
    delivered.removeIf(_._1 == topic)
  }
}

/** MQTT-shaped publisher sink (`mqtt.Destination.Send`, mqtt.go:167-176:
  * a per-message `client.Publish(topic, qos, retained, msg.Value)` loop,
  * options loaded by loadOpts, mqtt.go:92-103: qos, retained, clientID).
  * Spark side: a ForeachWriter running on executors, buffering the
  * partition and handing it to the broker in `close` only on success.
  *
  * QoS mapping: at `qos >= 2` publish-after-complete-partition plus the
  * broker's (partition, epoch) dedup gives exactly-once into the bus —
  * the QoS-2 analog, and the default. At `qos <= 1` the dedup is
  * switched off: a replayed epoch re-publishes, i.e. at-least-once with
  * duplicates visible — exactly what downgrading QoS buys on a real
  * broker. `retained` installs the batch's last row as the topic's
  * retained message; `clientId` is stamped on every message's
  * attributes. Rows may be the canonical envelope (key/value used) or
  * any schema with a `value` column castable to binary. */
class MqttLikePublisher(topic: String, qos: Int = 2,
    retained: Boolean = false, clientId: String = "graft")
    extends org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
  private var buf: ArrayBuffer[MessageBus.BusMsg] = _
  private var pid: Long = _
  private var eid: Long = _
  private val attrs =
    Map("clientID" -> clientId, "qos" -> qos.toString,
      "retained" -> retained.toString)

  override def open(partitionId: Long, epochId: Long): Boolean = {
    pid = partitionId; eid = epochId; buf = ArrayBuffer.empty
    // replayed epoch already delivered by a previous attempt → skip
    // (QoS-2 only; lower QoS re-delivers)
    qos < 2 || !MessageBus.epochDelivered(topic, partitionId, epochId)
  }

  override def process(row: org.apache.spark.sql.Row): Unit = {
    val names = row.schema.fieldNames
    val key =
      if (names.contains("key") && !row.isNullAt(row.fieldIndex("key")))
        row.get(row.fieldIndex("key")).toString
      else null
    val payload = row.get(row.fieldIndex("value")) match {
      case b: Array[Byte] => b
      case s: String => s.getBytes("UTF-8")
      case other => String.valueOf(other).getBytes("UTF-8")
    }
    buf += MessageBus.BusMsg(key, payload, attrs)
  }

  override def close(errorOrNull: Throwable): Unit =
    if (errorOrNull == null && buf != null)
      MessageBus.publishEpoch(topic, pid, eid, buf.toSeq,
        retained = retained, dedup = qos >= 2)
}

private class MqttTable(topic: String, maxRows: Option[Long], parallelism: Int)
    extends Table with SupportsRead {
  override def name(): String = s"mqtt-like:$topic"
  override def schema(): StructType = MqttLikeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MqttLikeSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MqttMicroBatchStream(topic, maxRows, parallelism)
      }
    }
}

private case class BusOffset(n: Long) extends Offset {
  override def json(): String = s"""{"offset":$n}"""
}

/** Micro-batch contract: latestOffset polls the log head (the poller
  * loop, SURVEY.md §3.3); planInputPartitions splits the offset range
  * into parallel slices; commit advances the broker ack watermark —
  * ack-after-durable-write at epoch granularity. `maxRows` = the
  * reference batcher's FlushLength (batcher.go:50-57), honored through
  * DSv2 admission control by capping each epoch at start + maxRows. */
private class MqttMicroBatchStream(topic: String, maxRows: Option[Long],
    parallelism: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val Parallelism = parallelism
  // Trigger.AvailableNow snapshots the log head once, then drains up to it
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(MessageBus.size(topic))
  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())
  override def reportLatestOffset(): Offset = BusOffset(MessageBus.size(topic))
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = availableNowEnd.getOrElse(MessageBus.size(topic))
    val capped = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(head, start.asInstanceOf[BusOffset].n + r.maxRows())
      case _ => head
    }
    BusOffset(capped)
  }

  override def initialOffset(): Offset = BusOffset(0L)
  override def latestOffset(): Offset =
    BusOffset(availableNowEnd.getOrElse(MessageBus.size(topic)))
  override def deserializeOffset(json: String): Offset =
    BusOffset("""\d+""".r.findFirstIn(json).get.toLong)
  override def commit(end: Offset): Unit =
    MessageBus.ack(topic, end.asInstanceOf[BusOffset].n)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[BusOffset].n
    val hi = end.asInstanceOf[BusOffset].n
    if (hi <= lo) Array.empty
    else {
      val step = math.max(1L, (hi - lo) / Parallelism)
      (lo until hi by step).map { s =>
        BusPartition(topic, s, math.min(s + step, hi)): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val bp = p.asInstanceOf[BusPartition]
        new PartitionReader[InternalRow] {
          private val rows = MessageBus.range(bp.topic, bp.from, bp.until).iterator
          private var current: MessageBus.BusMsg = _
          override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
          override def get(): InternalRow = new GenericInternalRow(Array[Any](
            UTF8String.fromString(current.key),
            UTF8String.fromString(bp.topic),
            current.payload,
            new ArrayBasedMapData(
              org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
                current.attrs.keys.map(UTF8String.fromString).toArray),
              org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
                current.attrs.values.map(UTF8String.fromString).toArray))))
          override def close(): Unit = ()
        }
      }
    }
}

private case class BusPartition(topic: String, from: Long, until: Long)
  extends InputPartition

package graft.connectors

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path with real two-phase commit semantics
  * — the [[ArchiveSource]]'s sibling, completing DSv2 coverage on the
  * write side (the streaming sinks cover foreach/foreachBatch;
  * this is the `WriteBuilder → BatchWrite → DataWriter` stack a
  * warehouse-table connector implements):
  *
  *  - each task writes rows into a STAGED buffer keyed by
  *    (epoch, task, attempt) and ships a [[CollectingCommitMessage]]
  *    on `DataWriter.commit`;
  *  - the driver-side `BatchWrite.commit` PUBLISHES exactly the staged
  *    buffers named by the commit messages — a task attempt that
  *    failed (or a speculative duplicate that lost the race) leaves
  *    only unreferenced staging, which `abort`/publish discards;
  *  - so a mid-job failure publishes NOTHING (atomic visibility), and
  *    re-executed tasks cannot double-write — the same contract a
  *    real table format implements with staged files + a manifest
  *    swap, modeled in memory and gated by SinkConformanceSpec.
  *
  * The STREAMING write path (`Write.toStreaming` → [[StreamingWrite]]
  * → `StreamingDataWriterFactory`) extends the same 2PC to per-EPOCH
  * atomicity — the Spark-native rendition of the reference's
  * ack-after-durable-write contract (types.go:104-113, Destination
  * acks only after the batch is durable; batcher.go:377-381, the
  * batcher acks the whole flushed batch at once):
  *
  *  - tasks stage per (epoch, partition, task, attempt); the driver's
  *    `StreamingWrite.commit(epochId, …)` publishes the epoch
  *    atomically;
  *  - a REPLAYED epoch (restart after the sink committed but before
  *    the engine's commit log recorded it — the classic
  *    at-least-once window) is absorbed idempotently: the epoch id is
  *    already in the committed ledger, so its re-staged buffers are
  *    discarded and the published table is unchanged — end-to-end
  *    exactly-once;
  *  - a failed epoch (`abort`) publishes NOTHING — readers never see
  *    a partial epoch.
  *
  * Option `table` names the logical destination
  * ([[CollectingSink.rows]] / [[CollectingSink.epochs]] read it
  * back); test option `poisonEpoch=N` makes every writer of epoch N
  * throw, for atomic-visibility specs. */
class CollectingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the written DataFrame
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CollectingTable(
      Option(properties.get("table")).getOrElse("default"), schema,
      Option(properties.get("poisonEpoch"))
        .orElse(Option(properties.get("poisonepoch"))).map(_.toLong))
  override def supportsExternalMetadata(): Boolean = true
}

object CollectingSink {
  /** staging: (table, taskId, attempt) → rows; publish moves to
    * `published` atomically under the table's lock */
  private val staged =
    new ConcurrentHashMap[(String, Long, Int), ArrayBuffer[Seq[Any]]]()
  private val published = new ConcurrentHashMap[String, Seq[Seq[Any]]]()

  private[graft] def stage(table: String, task: Long, attempt: Int,
      rows: ArrayBuffer[Seq[Any]]): Unit =
    staged.put((table, task, attempt), rows)

  private[graft] def publish(table: String,
      messages: Seq[CollectingCommitMessage]): Unit = {
    val out = ArrayBuffer.empty[Seq[Any]]
    messages.sortBy(m => (m.taskId, m.attempt)).foreach { m =>
      val rows = staged.remove((table, m.taskId, m.attempt))
      // a commit message whose staged buffer is gone means the staging
      // map is not shared with the executor (this sink is a same-JVM
      // local-mode harness) or staging was lost — publishing a partial
      // table silently would break the atomic-visibility contract
      if (rows == null)
        throw new IllegalStateException(
          s"commit for $table references missing staged buffer " +
            s"(task=${m.taskId}, attempt=${m.attempt}); CollectingSink " +
            "requires driver and executors to share one JVM (local mode)")
      out ++= rows
    }
    published.put(table, out.toSeq)
    dropStaging(table)
  }

  private[graft] def dropStaging(table: String): Unit = {
    val it = staged.keySet.iterator()
    while (it.hasNext) if (it.next()._1 == table) it.remove()
  }

  /** Published (committed) rows for a table; staged-only rows are
    * invisible here by construction. */
  def rows(table: String): Seq[Seq[Any]] =
    Option(published.get(table)).getOrElse(Seq.empty)
  def clear(table: String): Unit = {
    published.remove(table); dropStaging(table)
    epochCommitted.remove(table); dropAllEpochStaging(table)
  }

  // ------------------------------------------------------- streaming 2PC
  /** streaming staging: (table, epoch, partition, task, attempt) → rows */
  private val epochStaged = new ConcurrentHashMap[
    (String, Long, Int, Long, Int), ArrayBuffer[Seq[Any]]]()
  /** committed ledger: table → (epoch → rows), epoch-ordered */
  private val epochCommitted = new ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentSkipListMap[
      Long, Seq[Seq[Any]]]]()

  private[graft] def stageEpoch(table: String, epoch: Long,
      partition: Int, task: Long, attempt: Int,
      rows: ArrayBuffer[Seq[Any]]): Unit =
    epochStaged.put((table, epoch, partition, task, attempt), rows)

  /** Driver-side epoch publish. Returns true if the epoch was
    * committed by THIS call, false if it was already in the ledger —
    * the replayed-epoch case (restart landed between the sink's
    * commit and the engine's commit-log record), absorbed
    * idempotently: re-staged buffers are dropped, the published
    * table is unchanged. */
  private[graft] def publishEpoch(table: String, epoch: Long,
      messages: Seq[EpochCommitMessage]): Boolean = {
    val ledger = epochCommitted.computeIfAbsent(table,
      _ => new java.util.concurrent.ConcurrentSkipListMap[
        Long, Seq[Seq[Any]]]())
    if (ledger.containsKey(epoch)) {
      dropEpochStaging(table, epoch)
      false
    } else {
      val out = ArrayBuffer.empty[Seq[Any]]
      messages.sortBy(m => (m.partitionId, m.taskId, m.attempt))
        .foreach { m =>
          val rows = epochStaged.remove(
            (table, epoch, m.partitionId, m.taskId, m.attempt))
          if (rows == null)
            throw new IllegalStateException(
              s"epoch $epoch commit for $table references missing " +
                s"staged buffer (partition=${m.partitionId}, " +
                s"task=${m.taskId}, attempt=${m.attempt})")
          out ++= rows
        }
      val won = ledger.putIfAbsent(epoch, out.toSeq) == null
      dropEpochStaging(table, epoch)
      won
    }
  }

  private[graft] def dropEpochStaging(table: String, epoch: Long): Unit = {
    val it = epochStaged.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1 == table && k._2 == epoch) it.remove()
    }
  }
  private def dropAllEpochStaging(table: String): Unit = {
    val it = epochStaged.keySet.iterator()
    while (it.hasNext) if (it.next()._1 == table) it.remove()
  }

  /** Committed epochs in epoch order: (epochId, rows). A replayed or
    * aborted epoch never appears twice / partially here. */
  def epochs(table: String): Seq[(Long, Seq[Seq[Any]])] =
    Option(epochCommitted.get(table)) match {
      case None => Seq.empty
      case Some(m) =>
        import scala.jdk.CollectionConverters._
        m.entrySet().asScala.toSeq.map(e => (e.getKey.longValue(), e.getValue))
    }
  /** All committed streaming rows, in epoch order. */
  def streamRows(table: String): Seq[Seq[Any]] =
    epochs(table).flatMap(_._2)
}

class CollectingTable(tableName: String, schema0: StructType,
    poisonEpoch: Option[Long] = None)
    extends Table with SupportsWrite {
  override def name(): String = s"collecting($tableName)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CollectingBatchWrite(tableName, info.schema())
        override def toStreaming: StreamingWrite =
          new CollectingStreamingWrite(tableName, info.schema(),
            poisonEpoch)
      }
    }
}

final case class CollectingCommitMessage(taskId: Long, attempt: Int,
    nRows: Long) extends WriterCommitMessage

class CollectingBatchWrite(table: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new CollectingWriterFactory(table, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    CollectingSink.publish(table,
      messages.toSeq.map(_.asInstanceOf[CollectingCommitMessage]))
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CollectingSink.dropStaging(table)
}

class CollectingWriterFactory(table: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new CollectingDataWriter(table, schema, taskId)
}

class CollectingDataWriter(table: String, schema: StructType,
    taskId: Long) extends DataWriter[InternalRow] {
  private val buf = ArrayBuffer.empty[Seq[Any]]
  private val attempt =
    org.apache.spark.TaskContext.get() match {
      case null => 0
      case tc => tc.attemptNumber()
    }

  override def write(record: InternalRow): Unit =
    buf += record.toSeq(schema).map {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }

  override def commit(): WriterCommitMessage = {
    CollectingSink.stage(table, taskId, attempt, buf)
    CollectingCommitMessage(taskId, attempt, buf.length.toLong)
  }
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

// --------------------------------------------------------- streaming path

final case class EpochCommitMessage(epochId: Long, partitionId: Int,
    taskId: Long, attempt: Int, nRows: Long) extends WriterCommitMessage

/** Per-epoch two-phase commit: tasks stage under (epoch, partition,
  * task, attempt); `commit(epochId, …)` publishes the epoch atomically
  * into the ledger (idempotent on replay); `abort(epochId, …)` drops
  * the epoch's staging so a failed epoch publishes nothing. The
  * ack-after-durable contract of the reference's Destination
  * (types.go:104-113) expressed as a DSv2 StreamingWrite. */
class CollectingStreamingWrite(table: String, schema: StructType,
    poisonEpoch: Option[Long]) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new CollectingStreamWriterFactory(table, schema, poisonEpoch)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    CollectingSink.publishEpoch(table, epochId,
      messages.toSeq.map(_.asInstanceOf[EpochCommitMessage]))
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    CollectingSink.dropEpochStaging(table, epochId)
}

class CollectingStreamWriterFactory(table: String, schema: StructType,
    poisonEpoch: Option[Long]) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CollectingEpochDataWriter(table, schema, epochId, partitionId,
      taskId, poisonEpoch)
}

class CollectingEpochDataWriter(table: String, schema: StructType,
    epochId: Long, partitionId: Int, taskId: Long,
    poisonEpoch: Option[Long]) extends DataWriter[InternalRow] {
  private val buf = ArrayBuffer.empty[Seq[Any]]
  private val attempt =
    org.apache.spark.TaskContext.get() match {
      case null => 0
      case tc => tc.attemptNumber()
    }

  override def write(record: InternalRow): Unit = {
    // test hook: every writer of the poisoned epoch fails, on every
    // attempt — the epoch can never commit, and the spec asserts it
    // published nothing
    if (poisonEpoch.contains(epochId))
      throw new RuntimeException(s"poisoned epoch $epochId")
    buf += record.toSeq(schema).map {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }
  }

  override def commit(): WriterCommitMessage = {
    CollectingSink.stageEpoch(table, epochId, partitionId, taskId,
      attempt, buf)
    EpochCommitMessage(epochId, partitionId, taskId, attempt,
      buf.length.toLong)
  }
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

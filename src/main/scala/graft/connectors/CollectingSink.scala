package graft.connectors

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Batch DataSource V2 WRITE path with real two-phase commit semantics
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
  * Option `table` names the logical destination
  * ([[CollectingSink.rows]] reads it back). */
class CollectingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the written DataFrame
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CollectingTable(
      Option(properties.get("table")).getOrElse("default"), schema)
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
  }
}

class CollectingTable(tableName: String, schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"collecting($tableName)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CollectingBatchWrite(tableName, info.schema())
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

package graft.connectors

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Batch DataSource V2 with REAL pushdown — the archival-store reading
  * posture for 100 TB: an external event archive where what reaches the
  * source decides scan cost. Three pushdowns are implemented and
  * spec-gated (ExtensionsSpec):
  *
  *  - predicate pushdown (`SupportsPushDownFilters`): `event_type =`,
  *    `event_id >=`, `event_id <` evaluate INSIDE the reader; anything
  *    else is left for Spark post-scan;
  *  - column pruning (`SupportsPushDownRequiredColumns`): readers emit
  *    only requested columns;
  *  - partition pruning: `event_id` range filters eliminate whole
  *    id-range splits at `planInputPartitions` time — the DSv2 analog
  *    of parquet row-group/partition pruning.
  *
  * Rows are a deterministic pure function of `event_id` (mixed-LCG
  * arithmetic), so a DuckDB `generate_series` replays the source
  * exactly and the q125 scan is ORACLE-MATCHED end-to-end — proving
  * the custom source against an independent engine, not just smoke.
  *
  * Options: `rows` (total ids, default 100000), `parts` (splits,
  * default 8). Complements the streaming DSv2
  * ([[MqttLikeSource]]); together they cover both Spark read paths. */
class ArchiveSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArchiveSource.schema
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong)
      .getOrElse(100000L)
    val parts = Option(properties.get("parts")).map(_.toInt).getOrElse(8)
    new ArchiveTable(rows, parts)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object ArchiveSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("day", LongType, nullable = false)))

  val types: Array[String] =
    Array("click", "view", "purchase", "signup", "error")

  /** The row formula — integer arithmetic only, replayable as SQL.
    * Each product is reduced mod the divisor FIRST so the Long math is
    * overflow-free at any id; (a·b) mod m == ((a mod m)·(b mod m)) mod
    * m, so this equals the plain formula everywhere the plain formula
    * doesn't wrap, and matches a DuckDB generate_series replay (which
    * widens to HUGEINT instead of wrapping) at every id. */
  def userOf(id: Long): Long = ((id % 997L) * (2654435761L % 997L)) % 997L
  def typeIdxOf(id: Long): Int = (((id % 5L) * (40503L % 5L)) % 5L).toInt
  def valueMilliOf(id: Long): Long =
    ((id % 1000000L) * (48271L % 1000000L)) % 1000000L
  def dayOf(id: Long): Long = id % 365L
}

class ArchiveTable(rows: Long, parts: Int) extends Table
    with SupportsRead {
  override def name(): String = s"archive($rows)"
  override def schema(): StructType = ArchiveSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ArchiveScanBuilder(rows, parts)
}

class ArchiveScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ArchiveSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("event_type", _: String) => true
      case GreaterThanOrEqual("event_id", _) => true
      case LessThan("event_id", _) => true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ArchiveScan(rows, parts, pushed, required)
}

final case class ArchiveRangePartition(start: Long, end: Long)
  extends InputPartition

class ArchiveScan(rows: Long, parts: Int, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ArchiveScan pushed=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // partition pruning: id-range predicates shrink the split set
    var lo = 0L
    var hi = rows
    pushed.foreach {
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case GreaterThanOrEqual("event_id", v: Int) =>
        lo = math.max(lo, v.toLong)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThan("event_id", v: Int) => hi = math.min(hi, v.toLong)
      case _ =>
    }
    if (lo >= hi) return Array.empty
    val step = math.max(1L, rows / parts)
    (0L until rows by step).flatMap { s =>
      val e = math.min(s + step, rows)
      val ps = math.max(s, lo)
      val pe = math.min(e, hi)
      if (ps < pe) Some(ArchiveRangePartition(ps, pe)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(pushed, required)
}

class ArchiveReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArchiveRangePartition]
    new ArchivePartitionReader(p.start, p.end, pushed, required)
  }
}

class ArchivePartitionReader(start: Long, end: Long,
    pushed: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {
  private val typeEq: Option[String] = pushed.collectFirst {
    case EqualTo("event_type", v: String) => v
  }
  private val cols: Array[String] = required.fieldNames
  private var id = start - 1
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (id + 1 < end) {
      id += 1
      val tIdx = ArchiveSource.typeIdxOf(id)
      if (typeEq.forall(_ == ArchiveSource.types(tIdx))) {
        current = InternalRow.fromSeq(cols.map {
          case "event_id" => id
          case "user_id" => ArchiveSource.userOf(id)
          case "event_type" =>
            UTF8String.fromString(ArchiveSource.types(tIdx))
          case "value" => ArchiveSource.valueMilliOf(id) / 1000.0
          case "day" => ArchiveSource.dayOf(id)
        }.toSeq)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

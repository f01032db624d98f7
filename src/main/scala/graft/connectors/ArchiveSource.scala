package graft.connectors

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
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
    val layout = Option(properties.get("layout")).getOrElse("range")
    new ArchiveTable(rows, parts, layout)
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
  /** Id-range split planning shared by the row scan and the aggregate
    * scan: range predicates prune whole splits before any reader runs. */
  private[connectors] def prunedRanges(rows: Long, parts: Int,
      pushed: Array[Filter]): Array[ArchiveRangePartition] = {
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

  private def countLe(n: Long, r: Long): Long =
    if (n < r) 0L else (n - r) / 5L + 1L

  /** Rows matching the (optional) type-residue filter in [s, e). */
  private def countIn(s: Long, e: Long, res: Option[Long]): Long =
    res match {
      case None => math.max(0L, e - s)
      case Some(r) =>
        if (e <= s) 0L else countLe(e - 1, r) - countLe(s - 1, r)
    }

  /** Id of the k-th (1-based) matching row at or after s. */
  private def kthMatch(s: Long, k: Long, res: Option[Long]): Long =
    res match {
      case None => s + k - 1L
      case Some(r) =>
        (s + (((r - s) % 5L) + 5L) % 5L) + 5L * (k - 1L)
    }

  /** Limit/top-N pushdown planning: truncate the ORDERED pruned ranges
    * to exactly the first (or, `fromEnd`, last) n rows matching the
    * pushed filters. Matching ids under a type filter form one residue
    * class mod 5 (see ArchiveAggPartitionReader), so the cut id is
    * exact arithmetic — the scan then plans only the splits (and the
    * fraction of the boundary split) the limit actually needs, the
    * archival analog of a LIMIT stopping at the first parquet
    * row-groups. */
  private[connectors] def limitRanges(
      ranges: Array[ArchiveRangePartition], pushed: Array[Filter],
      n: Long, fromEnd: Boolean): Array[ArchiveRangePartition] = {
    val typeEq = pushed.collectFirst {
      case EqualTo("event_type", v: String) => v
    }
    val res: Option[Long] = typeEq match {
      case None => None
      case Some(t) =>
        val idx = types.indexOf(t)
        if (idx < 0) return Array.empty
        Some((idx.toLong * 2L) % 5L)
    }
    val out =
      scala.collection.mutable.ArrayBuffer.empty[ArchiveRangePartition]
    var rem = n
    val walk = if (fromEnd) ranges.reverse else ranges
    walk.foreach { rg =>
      if (rem > 0L) {
        val c = countIn(rg.start, rg.end, res)
        if (c <= rem) { out += rg; rem -= c }
        else {
          if (fromEnd) {
            val s2 = kthMatch(rg.start, c - rem + 1L, res)
            out += ArchiveRangePartition(s2, rg.end)
          } else {
            val last = kthMatch(rg.start, rem, res)
            out += ArchiveRangePartition(rg.start, last + 1L)
          }
          rem = 0L
        }
      }
    }
    (if (fromEnd) out.reverse else out).toArray
  }

  /** Test observability hook: split count of the most recent
    * planInputPartitions (runtime pruning happens after the static
    * plan is printed, so the effect is only visible at execution). */
  val lastPlannedSplits = new java.util.concurrent.atomic.AtomicInteger(-1)

  def userOf(id: Long): Long = ((id % 997L) * (2654435761L % 997L)) % 997L
  def typeIdxOf(id: Long): Int = (((id % 5L) * (40503L % 5L)) % 5L).toInt
  def valueMilliOf(id: Long): Long =
    ((id % 1000000L) * (48271L % 1000000L)) % 1000000L
  def dayOf(id: Long): Long = id % 365L
}

class ArchiveTable(rows: Long, parts: Int, layout: String = "range")
    extends Table with SupportsRead {
  override def name(): String = s"archive($rows)"
  override def schema(): StructType = ArchiveSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ArchiveScanBuilder(rows, parts, layout)
}

class ArchiveScanBuilder(rows: Long, parts: Int,
    layout: String = "range") extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ArchiveSource.schema
  private var aggTokens: Seq[String] = Nil
  private var limit: Option[Long] = None
  private var topNAsc: Option[Boolean] = None

  /** LIMIT n with no required order: the ordered-range truncation
    * yields EXACTLY min(n, matches) rows, so the push is total
    * (isPartiallyPushed = false) and Spark drops its own limit. */
  override def pushLimit(l: Int): Boolean =
    if (aggTokens.nonEmpty || layout == "by_type") false
    else { limit = Some(l.toLong); true }

  /** ORDER BY event_id [ASC|DESC] LIMIT n: rows are generated in id
    * order within each split and splits are planned in id order, so
    * the global top-N is an exact prefix (or suffix) of the pruned
    * ranges. Partial push: Spark still merges the ≤n survivors into
    * its TakeOrdered (cross-partition order is the engine's job). */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    if (aggTokens.nonEmpty || layout == "by_type" ||
      orders.length != 1) return false
    val o = orders(0)
    val onEventId = o.expression() match {
      case nr: NamedReference => nr.fieldNames().mkString(".") == "event_id"
      case _ => false
    }
    if (!onEventId) return false
    topNAsc = Some(o.direction() ==
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
    limit = Some(l.toLong)
    true
  }

  override def isPartiallyPushed(): Boolean = topNAsc.isDefined

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("event_type", _: String) => true
      // Only the literal types prunedRanges can enforce; anything else
      // stays a Spark-side residual so no filter is silently dropped.
      case GreaterThanOrEqual("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Int) => true
      case LessThan("event_id", _: Long) => true
      case LessThan("event_id", _: Int) => true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (PARTIAL: Spark still merges per-split rows):
    * global COUNT(*) / MIN(event_id) / MAX(event_id) are answered from
    * the row formula's modular arithmetic in O(1) per split — the scan
    * never materializes a row. The archival-store analog of answering
    * COUNT from parquet footer statistics. */
  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference => Some(nr.fieldNames().mkString("."))
    case _ => None
  }
  private var groupByType = false

  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (layout == "by_type") return false
    val gb = agg.groupByExpressions().toSeq.map(fieldOf)
    val gbOk = gb.isEmpty || gb == Seq(Some("event_type"))
    if (!gbOk) return false
    val toks = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if fieldOf(m.column()).contains("event_id") =>
        Some("min_id")
      case m: Max if fieldOf(m.column()).contains("event_id") =>
        Some("max_id")
      case _ => None
    }
    if (toks.exists(_.isEmpty)) false
    else {
      aggTokens = toks.flatten
      groupByType = gb.nonEmpty
      true
    }
  }

  override def build(): Scan =
    if (layout == "by_type") new ArchiveTypeScan(rows, pushed, required)
    else if (aggTokens.nonEmpty)
      new ArchiveAggScan(rows, parts, pushed, aggTokens, groupByType)
    else new ArchiveScan(rows, parts, pushed, required, limit, topNAsc)
}

final case class ArchiveRangePartition(start: Long, end: Long)
  extends InputPartition

class ArchiveScan(rows: Long, parts: Int, pushed: Array[Filter],
    required: StructType, limit: Option[Long] = None,
    topNAsc: Option[Boolean] = None) extends Scan with Batch
    with SupportsRuntimeFiltering with SupportsReportOrdering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Reported ordering (`SupportsReportOrdering`): each split emits
    * rows in ascending event_id (the generator walks ids in order), so
    * a per-partition sort on event_id above this scan is redundant and
    * Spark elides it — the DSv2 analog of a sorted parquet layout
    * whose writer recorded the sort columns. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (required.fieldNames.contains("event_id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions
          .column("event_id"),
        org.apache.spark.sql.connector.expressions.SortDirection
          .ASCENDING))
    else Array.empty
  override def description(): String = {
    val lim = limit.map(n => topNAsc match {
      case Some(true) => s" topN=[$n asc event_id]"
      case Some(false) => s" topN=[$n desc event_id]"
      case None => s" limit=[$n]"
    }).getOrElse("")
    s"ArchiveScan pushed=[${pushed.mkString(", ")}]$lim runtimeFilterable=[event_id]"
  }

  /** Runtime filtering (the DSv2 analog of dynamic partition pruning):
    * when this scan sits under a join on event_id whose other side is
    * selective, Spark executes that side first and hands the observed
    * key set here BEFORE partitions are planned — whole id-range
    * splits with no candidate key are never read. False positives are
    * fine (the join re-checks), so only PRUNING uses the set. */
  private var runtimeKeys: Option[Array[Long]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("event_id"))
  override def filter(filters: Array[Filter]): Unit = {
    val vals = filters.collectFirst {
      case org.apache.spark.sql.sources.In("event_id", vs) =>
        val decoded =
          vs.collect { case l: java.lang.Long => l.longValue()
                       case i: java.lang.Integer => i.longValue() }
        // A partially-decoded key set would prune splits that hold the
        // undecoded keys — a false-negative prune, which
        // SupportsRuntimeFiltering forbids. Only prune when EVERY
        // value decoded; otherwise skip pruning (always sound: the
        // join re-checks).
        if (decoded.length == vs.length) Some(decoded) else None
    }
    runtimeKeys = vals.flatten.map(_.sorted)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val pruned = ArchiveSource.prunedRanges(rows, parts, pushed)
    val limited = limit.map(n => ArchiveSource.limitRanges(pruned, pushed,
        n, fromEnd = topNAsc.contains(false)))
      .getOrElse(pruned)
    val result = runtimeKeys match {
      case Some(keys) if keys.nonEmpty =>
        // keep only splits containing at least one runtime key
        limited.filter { rg =>
          val i = java.util.Arrays.binarySearch(keys, rg.start)
          val at = if (i >= 0) i else -i - 1
          at < keys.length && keys(at) < rg.end
        }
      case Some(_) => Array.empty[ArchiveRangePartition]
      case None => limited
    }
    ArchiveSource.lastPlannedSplits.set(result.length)
    result.map(identity[InputPartition])
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(pushed, required)
}

/** One by-type split: ALL rows of one event_type (its residue class
  * mod 5 over [start, end)). Implements `HasPartitionKey` so Spark can
  * see the clustering — the key value IS the partition identity. */
final case class ArchiveTypePartition(typeIdx: Int, start: Long,
    end: Long) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(ArchiveSource.types(typeIdx)))
}

/** The `layout=by_type` scan — the last rung of the DSv2 ladder
  * (`SupportsReportPartitioning`): the archive declares that its
  * splits are KEY-GROUPED on event_type (one split holds every row of
  * one type), so a groupBy/join on event_type plans with ZERO exchange
  * — Spark sees ClusteredDistribution(event_type) already satisfied by
  * the storage layout. The DSv2 analog of a bucketed table: at 100 TB
  * this is the difference between re-shuffling the fact table on every
  * aggregation and reading pre-clustered files straight into the final
  * aggregate. Requires spark.sql.sources.v2.bucketing.enabled=true
  * (ExtensionsSpec pins exchange-count 0 vs ≥1 when disabled).
  *
  * Filter pushdown still applies: a pushed type equality prunes whole
  * type-splits at planning time; id-range filters narrow each split's
  * stepped walk. Matching ids form one residue class mod 5 per type
  * (see ArchiveAggPartitionReader), so each split reads EXACTLY its
  * rows — the 5 splits together touch each id once. */
class ArchiveTypeScan(rows: Long, pushed: Array[Filter],
    required: StructType) extends Scan with Batch
    with SupportsReportPartitioning {
  private val typeEq: Option[String] = pushed.collectFirst {
    case EqualTo("event_type", v: String) => v
  }
  private val (lo, hi): (Long, Long) = {
    var l = 0L; var h = rows
    pushed.foreach {
      case GreaterThanOrEqual("event_id", v: Long) => l = math.max(l, v)
      case GreaterThanOrEqual("event_id", v: Int) =>
        l = math.max(l, v.toLong)
      case LessThan("event_id", v: Long) => h = math.min(h, v)
      case LessThan("event_id", v: Int) => h = math.min(h, v.toLong)
      case _ =>
    }
    (l, h)
  }
  private val surviving: Array[Int] =
    if (lo >= hi) Array.empty
    else ArchiveSource.types.indices
      .filter(i => typeEq.forall(_ == ArchiveSource.types(i))).toArray

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ArchiveTypeScan keyGrouped=[event_type] " +
      s"pushed=[${pushed.mkString(", ")}] types=${surviving.length}"
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    // an all-pruned scan (type filter matches nothing, or the id range
    // is empty) must NOT declare a zero-partition KeyGroupedPartitioning
    // — some planner paths divide by numPartitions; an empty scan has
    // no clustering worth declaring anyway
    if (surviving.isEmpty)
      new org.apache.spark.sql.connector.read.partitioning
        .UnknownPartitioning(0)
    else
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity("event_type")), surviving.length)
  override def planInputPartitions(): Array[InputPartition] = {
    ArchiveSource.lastPlannedSplits.set(surviving.length)
    surviving.map(i => ArchiveTypePartition(i, lo, hi))
      .map(identity[InputPartition])
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveTypeReaderFactory(required)
}

class ArchiveTypeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArchiveTypePartition]
    new ArchiveTypePartitionReader(p.typeIdx, p.start, p.end, required)
  }
}

/** Stepped reader over one type's residue class: first matching id at
  * or after `start`, then stride 5 — reads exactly the split's rows,
  * never filters. */
class ArchiveTypePartitionReader(typeIdx: Int, start: Long, end: Long,
    required: StructType) extends PartitionReader[InternalRow] {
  private val cols: Array[String] = required.fieldNames
  private val r: Long = (typeIdx.toLong * 2L) % 5L
  private var id: Long = start + ((r - start) % 5L + 5L) % 5L - 5L
  private var current: InternalRow = _

  override def next(): Boolean = {
    id += 5L
    if (id >= end) return false
    current = InternalRow.fromSeq(cols.map {
      case "event_id" => id
      case "user_id" => ArchiveSource.userOf(id)
      case "event_type" =>
        UTF8String.fromString(ArchiveSource.types(typeIdx))
      case "value" => ArchiveSource.valueMilliOf(id) / 1000.0
      case "day" => ArchiveSource.dayOf(id)
    }.toSeq)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Aggregate-pushdown scan: one pre-aggregated row per surviving split,
  * computed from the row formula's modular arithmetic — no row is ever
  * materialized. Spark merges the per-split partials (partial
  * pushdown), so correctness composes with any split count. */
class ArchiveAggScan(rows: Long, parts: Int, pushed: Array[Filter],
    aggTokens: Seq[String], groupByType: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = {
    val gb = if (groupByType)
      Seq(StructField("event_type", StringType, nullable = false))
    else Nil
    StructType(gb ++ aggTokens.zipWithIndex.map { case (t, i) =>
      StructField(s"agg_$i" + "_" + t, LongType, nullable = true)
    })
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"ArchiveAggScan pushedAgg=[${aggTokens.mkString(", ")}] " +
      s"groupBy=[${if (groupByType) "event_type" else ""}] " +
      s"pushed=[${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    ArchiveSource.prunedRanges(rows, parts, pushed)
      .map(identity[InputPartition])
  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveAggReaderFactory(pushed, aggTokens, groupByType)
}

class ArchiveAggReaderFactory(pushed: Array[Filter],
    aggTokens: Seq[String], groupByType: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArchiveRangePartition]
    new ArchiveAggPartitionReader(p.start, p.end, pushed, aggTokens,
      groupByType)
  }
}

/** O(1) per-split aggregate answers. With a type filter, matching ids
  * form one residue class mod 5 (typeIdxOf is a bijection on residues:
  * idx = (r*3) mod 5 ⇔ r = (idx*2) mod 5, 2 being 3⁻¹ mod 5), so
  * count/min/max over [start, end) reduce to arithmetic on the class. */
class ArchiveAggPartitionReader(start: Long, end: Long,
    pushed: Array[Filter], aggTokens: Seq[String], groupByType: Boolean)
    extends PartitionReader[InternalRow] {

  private val typeEq: Option[String] = pushed.collectFirst {
    case EqualTo("event_type", v: String) => v
  }

  // ids <= n in the residue class r (mod 5); n < r means none
  private def countLe(n: Long, r: Long): Long =
    if (n < r) 0L else (n - r) / 5L + 1L

  /** count/min/max over [start, end) ∩ residue class r — O(1). */
  private def stats(r: Long): (Long, Option[Long], Option[Long]) = {
    val c = countLe(end - 1, r) - countLe(start - 1, r)
    if (c == 0L) (0L, None, None)
    else {
      val lo = start + ((r - start) % 5L + 5L) % 5L
      val hi = (end - 1) - (((end - 1) - r) % 5L + 5L) % 5L
      (c, Some(lo), Some(hi))
    }
  }

  private def rowFor(prefix: Seq[Any],
      st: (Long, Option[Long], Option[Long])): InternalRow =
    InternalRow.fromSeq(prefix ++ aggTokens.map {
      case "count" => st._1
      case "min_id" => st._2.map(Long.box).orNull
      case "max_id" => st._3.map(Long.box).orNull
    })

  private val out: Iterator[InternalRow] =
    if (groupByType) {
      // one row per type PRESENT in the split (absent groups must not
      // be invented); a pushed type filter narrows to its residue
      ArchiveSource.types.zipWithIndex.iterator
        .filter { case (t, _) => typeEq.forall(_ == t) }
        .map { case (t, idx) => (t, stats((idx.toLong * 2L) % 5L)) }
        .filter(_._2._1 > 0L)
        .map { case (t, st) =>
          rowFor(Seq(UTF8String.fromString(t)), st)
        }
    } else {
      val st = typeEq match {
        case Some(t) =>
          val idx = ArchiveSource.types.indexOf(t)
          if (idx < 0) (0L, None, None)
          else stats((idx.toLong * 2L) % 5L)
        case None =>
          if (end > start) (end - start, Some(start), Some(end - 1))
          else (0L, None, None)
      }
      Iterator.single(rowFor(Nil, st))
    }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (out.hasNext) { current = out.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
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

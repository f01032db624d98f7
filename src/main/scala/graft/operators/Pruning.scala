package graft.operators

import graft.QueryDef

/** Explicit bloom-filter join pruning: cut the fact side of a
  * fact-to-filtered-dim join BEFORE the join's exchange, using the bloom
  * sketch expressions Spark ships for its own runtime filter injection
  * (exposed to SQL via GraftExtensions).
  *
  * At this SF the dim side broadcasts and pruning is redundant — the
  * point is the at-scale plan: with a dim too large to broadcast the
  * join degrades to sort-merge, and each side shuffles IN FULL before
  * any row is dropped. The bloom (a few MB even for 10^8 keys) rides to
  * every fact task as a scalar-subquery result and drops non-matching
  * fact rows at the scan, so the fact shuffle carries only ~selectivity
  * of the data. Catalyst's own InjectRuntimeFilter does this when it can
  * prove the pattern; the explicit form covers dim pipelines the rule
  * can't see through (and is exact on the final result either way —
  * bloom false positives are removed by the join itself, which is why
  * the oracle is the plain join).
  */
object Pruning {

  // ---------------------------------------------------------------- q49
  val q49BloomPruneJoin = QueryDef(
    "q49_bloom_prune_join",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      graft.GraftExtensions.register(s)
      s.sql("""WITH dim AS (
              |  SELECT s_suppkey, n_name
              |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')),
              |pruned AS (
              |  SELECT l_suppkey, l_extendedprice, l_discount
              |  FROM lineitem
              |  WHERE might_contain(
              |    (SELECT bloom_filter_agg(xxhash64(s_suppkey)) FROM dim),
              |    xxhash64(l_suppkey)))
              |SELECT n_name,
              |  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
              |  CAST(count(*) AS BIGINT) AS n_items,
              |  round(sum(l_extendedprice * (1 - l_discount)) * 100) / 100 AS revenue
              |FROM pruned JOIN dim ON l_suppkey = s_suppkey
              |GROUP BY n_name ORDER BY n_name""".stripMargin)
    },
    Some("""SELECT n_name,
           |  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
           |  CAST(count(*) AS BIGINT) AS n_items,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  // --------------------------------------------------------------- q125
  /** Scan through the custom batch DSv2 source
    * (graft.connectors.ArchiveSource) with all three pushdowns live:
    * the type-equality and id-range predicates evaluate INSIDE the
    * reader, the id range prunes whole input splits at planning time,
    * and column pruning drops user_id before a byte moves. The row
    * formula is pure integer arithmetic, so the DuckDB oracle replays
    * the source with generate_series and the custom connector is
    * proven end-to-end against an independent engine.
    * ExtensionsSpec pins the pushdown evidence in the plan. */
  val q125ArchivePushdown = QueryDef(
    "q125_archive_pushdown",
    (s, _) => {
      import org.apache.spark.sql.functions._
      s.read.format("graft.connectors.ArchiveSource").load()
        .filter(col("event_type") === "click" &&
          col("event_id") >= 10000L && col("event_id") < 60000L)
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(round(value * 1000) as bigint)")).as("vm_sum"))
        .orderBy("day")
    },
    Some("""WITH ids AS (
           |  SELECT g AS id FROM generate_series(10000, 59999) t(g)),
           |rows_ AS (
           |  SELECT id % 365 AS day,
           |    ['click','view','purchase','signup','error']
           |      [CAST((id * 40503) % 5 AS INT) + 1] AS event_type,
           |    (id * 48271) % 1000000 AS vm
           |  FROM ids)
           |SELECT day, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(vm) AS BIGINT) AS vm_sum
           |FROM rows_ WHERE event_type = 'click'
           |GROUP BY day ORDER BY day""".stripMargin))

  // --------------------------------------------------------------- q142
  /** Aggregate pushdown through the custom DSv2 source: global
    * COUNT(*) / MIN / MAX over a filtered id range are answered by the
    * scan itself from the row formula's modular arithmetic — O(1) per
    * split, NO ROW EVER MATERIALIZED (the archival analog of answering
    * COUNT from parquet footer stats). Partial pushdown: each split
    * returns one pre-aggregated row and Spark merges, so the result is
    * split-count-independent. ExtensionsSpec pins ArchiveAggScan in
    * the plan; the DuckDB oracle replays the formula with
    * generate_series — the whole pushdown path is oracle-matched. */
  val q142ArchiveAggPushdown = QueryDef(
    "q142_archive_agg_pushdown",
    (s, _) => {
      import org.apache.spark.sql.functions._
      s.read.format("graft.connectors.ArchiveSource").load()
        .filter(col("event_type") === "view" &&
          col("event_id") >= 5000L && col("event_id") < 95000L)
        .agg(count(lit(1)).as("n_rows"),
          min("event_id").as("min_id"),
          max("event_id").as("max_id"))
    },
    Some("""WITH ids AS (
           |  SELECT g AS id FROM generate_series(5000, 94999) t(g)),
           |rows_ AS (
           |  SELECT id,
           |    ['click','view','purchase','signup','error']
           |      [CAST((id * 40503) % 5 AS INT) + 1] AS event_type
           |  FROM ids)
           |SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  min(id) AS min_id, max(id) AS max_id
           |FROM rows_ WHERE event_type = 'view'""".stripMargin))

  // --------------------------------------------------------------- q144
  /** GROUP BY pushdown through the custom DSv2 source: per-type
    * count/min/max over an id range are answered by the scan with one
    * O(1) row per (split, present type) — matching ids form one
    * residue class mod 5, so each group's stats are arithmetic, and
    * absent groups are never invented. Spark's merge aggregate keeps
    * the result split-count-independent (partial pushdown). The
    * DuckDB oracle replays the formula with generate_series, so the
    * grouped pushdown path is oracle-matched end to end. */
  val q144ArchiveGroupPushdown = QueryDef(
    "q144_archive_group_pushdown",
    (s, _) => {
      import org.apache.spark.sql.functions._
      s.read.format("graft.connectors.ArchiveSource").load()
        .filter(col("event_id") >= 20000L && col("event_id") < 80000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          min("event_id").as("min_id"),
          max("event_id").as("max_id"))
        .orderBy("event_type")
    },
    Some("""WITH ids AS (
           |  SELECT g AS id FROM generate_series(20000, 79999) t(g)),
           |rows_ AS (
           |  SELECT id,
           |    ['click','view','purchase','signup','error']
           |      [CAST((id * 40503) % 5 AS INT) + 1] AS event_type
           |  FROM ids)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           |  min(id) AS min_id, max(id) AS max_id
           |FROM rows_ GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(q49BloomPruneJoin, q125ArchivePushdown, q142ArchiveAggPushdown,
      q144ArchiveGroupPushdown)
}

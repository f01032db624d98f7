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

  val all: Seq[QueryDef] = Seq(q49BloomPruneJoin)
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Rounding.r6

/** Graph-propagation operators. Web-graph centrality is a standard
  * crawl-curation quality signal (rank-weighted sampling of pretraining
  * corpora); the relational testbed has no hyperlinks, so the graph here
  * is the part co-purchase graph (parts sharing an order), which has the
  * same shape: sparse, skewed, symmetric.
  */
object Graph {

  // ---------------------------------------------------------------- q73
  /** PageRank over the co-purchase graph, in FIXED-POINT integer
    * arithmetic: ranks are BIGINT micro-units (1e12 = mass 1.0), every
    * step is integer division, so the 8-round iteration is bit-exact in
    * any engine — no cross-engine float-summation drift to round away,
    * which is what makes an iterative-numeric oracle hash-matchable at
    * all. r_0 = M/N; r_{t+1} = 0.15·M/N + (85·Σ_in (r_t div deg)) div
    * 100 with M = 1e12. Floor losses mean total mass is not exactly
    * conserved — the documented trade for determinism.
    *
    * Scale shape: d03's iterated-propagation pattern applied to rank
    * mass — the edge list is built with a single map-side-combined
    * exchange, cached hash-partitioned on src, and never re-shuffled:
    * each round shuffled-hash-joins the O(V) rank table against the
    * in-place edges and hash-aggs contributions on dst (partial agg
    * map-side), so per-round traffic is O(V), not O(E) — the
    * Pregel/GraphX message-passing shape in DataFrame form. Rounds are
    * a fixed constant (8).
    * N comes from one count() — a catalog stat at ingest in production
    * (the d08 precedent). The classic GraphX/Pregel formulation maps
    * 1:1 onto this loop if a corpus ever needs vertex-cut partitioning. */
  val q73CopurchaseRank = QueryDef(
    "q73_copurchase_rank",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      // Adjacency-set aggregation: ONE exchange (map-side-combined
      // collect_set) gives dedup AND out-degree, and the exploded edge
      // list comes out hash-partitioned on src — the loop's join key —
      // so the cached e is never re-shuffled by the iterations. (For
      // hub-heavy graphs where a single adjacency set would not fit a
      // task, the two-shuffle distinct + count-over-Window(src) form is
      // the drop-in; co-purchase degree is order-fanout-bounded.)
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst0"))
        .groupBy("src").agg(collect_set(col("dst0")).as("nbrs"))
        .select(col("src"), explode(col("nbrs")).as("dst"),
          size(col("nbrs")).cast("long").as("deg"))
        .persist()
      val nodes = e.select(col("src").as("node")).distinct().persist()
      val n = nodes.count() // one job; a catalog stat at ingest (d08 precedent)
      // The loop must cut LINEAGE each round, not just cache: persist
      // alone leaves the logical plan nesting, and Catalyst analysis
      // over 8 rounds of stacked join+agg+join blows up super-linearly.
      // Re-rooting on the materialized RDD keeps plan depth constant
      // (LogicalRDD leaf) and — unlike localCheckpoint, whose blocks
      // only die at a driver GC — lets each round free its parent's
      // blocks deterministically. (On a cluster: checkpoint() to
      // reliable storage, same contract.)
      def materialize(df: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val out = s.createDataFrame(df.rdd, df.schema).persist()
        out.count()
        out
      }
      var ranks = materialize(nodes.select(col("node"),
        lit(1000000000000L / n).as("r")))
      var lastMat = ranks
      for (it <- 1 to 8) {
        // shuffle_hash hint: ranks is a stats-less LogicalRDD after
        // re-rooting, so unhinted the planner sort-merge-joins and
        // re-shuffles the cached edges every round. Hinted, e streams
        // in place (its cached HashPartitioning(src) satisfies the
        // join) and only the O(V) rank table moves — the Pregel shape.
        val contrib = e.join(ranks.hint("shuffle_hash"),
            col("src") === col("node"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("in_sum"))
        val next = nodes.join(contrib.hint("broadcast"),
            col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(150000000000L / n) +
              expr("(85 * coalesce(in_sum, 0L)) div 100")).as("r"))
        // materialize every SECOND round: plan depth stays ≤ 2 rounds
        // (analysis is fine there) while the per-round action count —
        // the dominant cost of a small-graph iteration — halves.
        if (it % 2 == 0 || it == 8) {
          ranks = materialize(next)
          lastMat.unpersist()
          lastMat = ranks
        } else ranks = next
      }
      val out = ranks.select(col("node").as("part"),
          col("r").as("rank_micro"), r6(col("r") / 1e12).as("rank"))
        .orderBy("part")
      e.unpersist(); nodes.unpersist()
      out
    },
    Some("""WITH RECURSIVE
           |li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
           |edges AS (SELECT DISTINCT a.p AS src, b.p AS dst
           |  FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p),
           |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
           |  FROM edges GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
           |pr(iter, node, r) AS (
           |  SELECT 0, node, CAST(1000000000000 // n AS BIGINT)
           |  FROM nodes CROSS JOIN nn
           |  UNION ALL
           |  SELECT p.iter + 1, e.dst,
           |    CAST(150000000000 // nn.n +
           |         (85 * sum(p.r // e.deg)) // 100 AS BIGINT)
           |  FROM pr p
           |  JOIN (SELECT e0.src, e0.dst, o.deg FROM edges e0
           |        JOIN outdeg o ON e0.src = o.src) e ON p.node = e.src
           |  CROSS JOIN nn
           |  WHERE p.iter < 8
           |  GROUP BY p.iter + 1, e.dst, nn.n)
           |SELECT node AS part, r AS rank_micro,
           |  round(r / 1e12, 6) AS rank
           |FROM pr WHERE iter = 8 ORDER BY part""".stripMargin))

  val all: Seq[QueryDef] = Seq(q73CopurchaseRank)
}

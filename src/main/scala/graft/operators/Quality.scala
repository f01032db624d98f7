package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Data-quality / governance operators: running-peak drawdown over
  * per-entity value curves, a declarative expectation-suite evaluator
  * (the Deequ-style rule pack every lakehouse ingest gate runs), and a
  * differentially-private release mechanism with a deterministic
  * hash-Laplace noise source so the mechanism itself is oracle-testable.
  *
  * The family's 100 TB posture: drawdown shuffles once to
  * high-cardinality per-user windows (no global window anywhere); the
  * rule pack evaluates every expectation in ONE scan of the audited
  * table via stacked conditional aggregates (adding a rule adds a
  * counter, not a pass); DP release is a map-side-combined count-agg
  * over a handful of groups plus per-row noise arithmetic.
  *
  * Reference scope note: runreveal/cheetah (types.go, processor.go) has
  * no quality/governance surface — this battery is part of the
  * large-scale-pipeline extension the brief mandates. */
object Quality {

  // --------------------------------------------------------------- q160
  /** Maximum drawdown per user over the signed purchase/error cash
    * curve — the classic risk statistic (largest peak-to-trough drop of
    * the running equity), and the same prefix-max shape that powers
    * "worst regression from best score" quality tracking. Purchases
    * add `value`, errors (refund analog) subtract it; every move is an
    * exact BIGINT cent so running sums are order-proof; the curve
    * replays per user ordered by (ts, event_id) — the event log's
    * deterministic total order.
    *
    * Scale shape: one scan, one shuffle to (user_id) window partitions
    * — a high-cardinality key, so the sort parallelizes; the final
    * per-user rollup rides the same partitioning (no second exchange).
    * Streaming twin: `Stateful.drawdownStream` folds the identical
    * recurrence in O(1) state per user (cum, peak, maxdd). */
  val q160MaxDrawdown = QueryDef(
    "q160_max_drawdown",
    (s, d) => {
      val mv = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("ts"), col("event_id"),
          (when(col("event_type") === "purchase", lit(1L)).otherwise(lit(-1L))
            * expr("cast(round(value * 100) as bigint)")).as("delta_cents"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      mv.withColumn("equity", sum("delta_cents").over(w))
        .withColumn("peak", max("equity").over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_moves"),
          sum("delta_cents").as("final_cents"),
          max("peak").as("peak_cents"),
          max(col("peak") - col("equity")).as("max_dd_cents"))
        .withColumn("max_dd", col("max_dd_cents").cast("double") / 100)
        .orderBy("user_id")
    },
    Some("""WITH mv AS (
           |  SELECT user_id, ts, event_id,
           |    (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
           |      * CAST(round(value * 100) AS BIGINT) AS delta_cents
           |  FROM events WHERE event_type IN ('purchase', 'error')),
           |curve AS (
           |  SELECT user_id, ts, event_id, delta_cents,
           |    CAST(sum(delta_cents) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS equity
           |  FROM mv),
           |pk AS (
           |  SELECT user_id, delta_cents, equity,
           |    CAST(max(equity) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS peak
           |  FROM curve)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_moves,
           |  CAST(sum(delta_cents) AS BIGINT) AS final_cents,
           |  CAST(max(peak) AS BIGINT) AS peak_cents,
           |  CAST(max(peak - equity) AS BIGINT) AS max_dd_cents,
           |  CAST(CAST(max(peak - equity) AS BIGINT) AS DOUBLE) / 100
           |    AS max_dd
           |FROM pk GROUP BY 1 ORDER BY 1""".stripMargin))

  // --------------------------------------------------------------- q161
  /** Declarative data-quality rule pack over `orders` — the
    * expectation-suite evaluation an ingest gate runs before publishing
    * a partition (completeness, key uniqueness, value range, enum
    * domain, referential integrity, attribute completeness). Every rule
    * is a conditional counter inside ONE aggregate over one scan of the
    * audited table (plus a broadcast of the dimension keyset for the
    * referential rule); `stack` unpivots the counter row into the
    * (rule_id, metric, threshold, pass) report. Metrics are micro-share
    * BIGINTs (1e6 = 100%) — exact integers, order-proof.
    *
    * Scale shape: adding a rule adds an aggregate buffer, never a scan;
    * the referential probe is a broadcast-hash left join against the
    * dimension keys (at 100 TB: a bloom-filter pre-probe, the x11
    * posture, with the residual checked exactly). The distinct-count
    * rule is the one expand (2×) in the pass — the price of an exact
    * uniqueness metric; q27's HLL form is the sketch fallback. */
  val q161DqRules = QueryDef(
    "q161_dq_rules",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).select(col("c_custkey"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .agg(
          count(lit(1)).as("n"),
          count(col("o_orderdate")).as("n_date"),
          countDistinct(col("o_orderkey")).as("n_key"),
          sum(when(col("o_totalprice") > 0 &&
            col("o_totalprice") <= 600000.0, 1L).otherwise(0L)).as("n_range"),
          sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("n_enum"),
          count(col("c_custkey")).as("n_ref"),
          count(col("o_orderpriority")).as("n_prio"))
        .selectExpr(
          """stack(6,
            |  'r01_complete_orderdate',
            |    cast(round(n_date * 1e6 / n) as bigint), cast(990000 as bigint),
            |  'r02_unique_orderkey',
            |    cast(round(n_key * 1e6 / n) as bigint), cast(1000000 as bigint),
            |  'r03_range_totalprice',
            |    cast(round(n_range * 1e6 / n) as bigint), cast(999000 as bigint),
            |  'r04_enum_orderstatus',
            |    cast(round(n_enum * 1e6 / n) as bigint), cast(1000000 as bigint),
            |  'r05_ref_custkey',
            |    cast(round(n_ref * 1e6 / n) as bigint), cast(1000000 as bigint),
            |  'r06_complete_priority',
            |    cast(round(n_prio * 1e6 / n) as bigint), cast(1000000 as bigint)
            |) as (rule_id, metric_micro, threshold_micro)""".stripMargin)
        .withColumn("pass",
          (col("metric_micro") >= col("threshold_micro")).cast("int"))
        .orderBy("rule_id")
    },
    Some("""WITH j AS (
           |  SELECT o.*, c.c_custkey AS ck
           |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(o_orderdate) AS BIGINT) AS n_date,
           |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_key,
           |    CAST(sum(CASE WHEN o_totalprice > 0 AND o_totalprice <= 600000
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_range,
           |    CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_enum,
           |    CAST(count(ck) AS BIGINT) AS n_ref,
           |    CAST(count(o_orderpriority) AS BIGINT) AS n_prio
           |  FROM j),
           |r AS (
           |  SELECT 'r01_complete_orderdate' AS rule_id,
           |    CAST(round(n_date * 1e6 / n) AS BIGINT) AS metric_micro,
           |    CAST(990000 AS BIGINT) AS threshold_micro FROM a
           |  UNION ALL SELECT 'r02_unique_orderkey',
           |    CAST(round(n_key * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a
           |  UNION ALL SELECT 'r03_range_totalprice',
           |    CAST(round(n_range * 1e6 / n) AS BIGINT),
           |    CAST(999000 AS BIGINT) FROM a
           |  UNION ALL SELECT 'r04_enum_orderstatus',
           |    CAST(round(n_enum * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a
           |  UNION ALL SELECT 'r05_ref_custkey',
           |    CAST(round(n_ref * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a
           |  UNION ALL SELECT 'r06_complete_priority',
           |    CAST(round(n_prio * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a)
           |SELECT rule_id, metric_micro, threshold_micro,
           |  CAST(metric_micro >= threshold_micro AS INT) AS pass
           |FROM r ORDER BY rule_id""".stripMargin))

  // --------------------------------------------------------------- q162
  /** Differentially-private histogram release over event types —
    * count + Laplace(1/ε) noise per group, with the noise drawn from a
    * DETERMINISTIC hash-uniform source (md5 of the group key + a release
    * salt → u ∈ (0,1) → inverse-CDF Laplace) so the mechanism's
    * arithmetic is reproducible and oracle-testable; a production
    * release swaps the salt for a secret per-release nonce and the
    * mechanism is the textbook one. Counts have sensitivity 1; groups
    * are disjoint, so parallel composition prices the whole histogram
    * at ε = 0.5 (the ledger column). Noise lands as micro-unit BIGINT
    * (round(noise·1e6)) — the fixed-point posture that makes a
    * float-formula output order-proof.
    *
    * Scale shape: ONE map-side-combined count-agg to the event-type
    * grid; noise is per-GROUP arithmetic (5 rows), not per-row work.
    * 100 TB of events reaches the mechanism as a handful of counters. */
  val q162DpRelease = QueryDef(
    "q162_dp_release",
    (s, d) => {
      Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        // u = (bucket + 0.5) / 2^32 ∈ (0,1): the shared md5-bucket split
        .withColumn("u",
          (expr("cast(conv(substring(md5(concat(event_type, ':dp1')), 1, 8)," +
            " 16, 10) as bigint)") + 0.5) / 4294967296.0)
        .withColumn("noise",
          -lit(2.0) * signum(col("u") - 0.5)
            * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
        .select(col("event_type"), col("n"),
          expr("cast(round(noise * 1e6) as bigint)").as("noise_micro"),
          (col("n") * 1000000L
            + expr("cast(round(noise * 1e6) as bigint)")).as("noisy_n_micro"),
          lit(500000L).as("eps_claimed_micro"),
          // Noise is md5-derived and reproducible — NOT a calibrated DP
          // mechanism. The column makes the output self-describing so a
          // consumer can't mistake the demo for a formal epsilon.
          lit("deterministic-demo").as("mechanism"))
        .orderBy("event_type")
    },
    Some("""WITH g AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1),
           |u AS (
           |  SELECT event_type, n,
           |    (('0x' || substr(md5(event_type || ':dp1'), 1, 8))::BIGINT
           |      + 0.5) / 4294967296.0 AS u
           |  FROM g),
           |nz AS (
           |  SELECT event_type, n,
           |    -2.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
           |  FROM u)
           |SELECT event_type, n,
           |  CAST(round(noise * 1e6) AS BIGINT) AS noise_micro,
           |  n * 1000000 + CAST(round(noise * 1e6) AS BIGINT)
           |    AS noisy_n_micro,
           |  CAST(500000 AS BIGINT) AS eps_claimed_micro,
           |  'deterministic-demo' AS mechanism
           |FROM nz ORDER BY event_type""".stripMargin))

  // --------------------------------------------------------------- q167
  /** q167's counter grid → rule report projection, shared with the
    * dqStream twin (identical code over identical integer counters ⇒
    * bit-for-bit). `counters` columns: event_type, n, n_range, n_enum,
    * n_k, n_user — one row per event type (the stream's key grid). */
  def q167Finish(counters: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    counters.agg(sum("n").as("n"), sum("n_range").as("n_range"),
      sum("n_enum").as("n_enum"), sum("n_k").as("n_k"),
      sum("n_user").as("n_user"))
      .selectExpr(
        """stack(4,
          |  'r01_range_value',
          |    cast(round(n_range * 1e6 / n) as bigint), cast(750000 as bigint),
          |  'r02_enum_type',
          |    cast(round(n_enum * 1e6 / n) as bigint), cast(1000000 as bigint),
          |  'r03_props_json',
          |    cast(round(n_k * 1e6 / n) as bigint), cast(1000000 as bigint),
          |  'r04_user_nonneg',
          |    cast(round(n_user * 1e6 / n) as bigint), cast(1000000 as bigint)
          |) as (rule_id, metric_micro, threshold_micro)""".stripMargin)
      .withColumn("pass",
        (col("metric_micro") >= col("threshold_micro")).cast("int"))
      .orderBy("rule_id")

  /** The live-feed expectation pack — q161's rule-suite shape applied
    * to the event stream (range, enum domain, payload parseability,
    * key sanity), the monitoring side of the same governance story.
    * Counters accumulate per event type so the stream twin
    * (`Stateful.dqStream`) keys on a catalog-sized grid with O(1)
    * commutative state per key; batch and stream share `q167Finish`.
    *
    * Scale shape: ONE map-side-combined conditional aggregate to the
    * event-type grid; the JSON-payload rule is a row-local regex (no
    * parse, no shuffle); the report rolls up on the ≤5-row grid. */
  val q167EventDq = QueryDef(
    "q167_event_dq",
    (s, d) => q167Finish(
      Tables.events(s, d).groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 0 && col("value") <= 400.0, 1L)
          .otherwise(0L)).as("n_range"),
        sum(when(col("event_type")
          .isin("click", "view", "purchase", "signup", "error"), 1L)
          .otherwise(0L)).as("n_enum"),
        sum(when(col("props").rlike("^\\{\"k\": -?[0-9]+\\}$"), 1L)
          .otherwise(0L)).as("n_k"),
        sum(when(col("user_id") >= 0, 1L).otherwise(0L)).as("n_user"))),
    Some("""WITH a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN value > 0 AND value <= 400
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_range,
           |    CAST(sum(CASE WHEN event_type IN
           |      ('click','view','purchase','signup','error')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_enum,
           |    CAST(sum(CASE WHEN regexp_matches(props,
           |      '^\{"k": -?[0-9]+\}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_k,
           |    CAST(sum(CASE WHEN user_id >= 0 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_user
           |  FROM events),
           |r AS (
           |  SELECT 'r01_range_value' AS rule_id,
           |    CAST(round(n_range * 1e6 / n) AS BIGINT) AS metric_micro,
           |    CAST(750000 AS BIGINT) AS threshold_micro FROM a
           |  UNION ALL SELECT 'r02_enum_type',
           |    CAST(round(n_enum * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a
           |  UNION ALL SELECT 'r03_props_json',
           |    CAST(round(n_k * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a
           |  UNION ALL SELECT 'r04_user_nonneg',
           |    CAST(round(n_user * 1e6 / n) AS BIGINT),
           |    CAST(1000000 AS BIGINT) FROM a)
           |SELECT rule_id, metric_micro, threshold_micro,
           |  CAST(metric_micro >= threshold_micro AS INT) AS pass
           |FROM r ORDER BY rule_id""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(q160MaxDrawdown, q161DqRules, q162DpRelease, q167EventDq)
}

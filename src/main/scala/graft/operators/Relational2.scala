package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Rounding.{r2, r4, r6}

/** Second relational battery: outer joins, custom UDAF (Aggregator),
  * generators (explode/UDTF analog of the reference Handler), RANGE
  * window frames, exact percentiles, and statistical aggregates.
  */
object Relational2 {

  // ---------------------------------------------------------------- q29
  /** Left outer join preserving unmatched left rows (null-filled right),
    * aggregated so null handling is visible in the result. */
  val q29OuterJoin = QueryDef(
    "q29_outer_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_matched"),
          r2(sum(coalesce(col("o_totalprice"), lit(0.0)))).as("sum_big"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, count(*) AS n_rows,
           |  count(o_orderkey) AS n_matched,
           |  round(sum(coalesce(o_totalprice, 0.0)), 2) AS sum_big
           |FROM customer
           |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
           |  ON c_custkey = o_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q30
  /** Full outer join over two aggregates (nation-level customer vs
    * supplier balances) — unmatched rows on both sides survive. */
  val q30FullOuter = QueryDef(
    "q30_full_outer_join",
    (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val p = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      c.join(p, Seq("nk"), "full_outer")
        .select(col("nk"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    },
    Some("""SELECT coalesce(c.nk, p.nk) AS nk,
           |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
           |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
           |      WHERE c_acctbal > 9000 GROUP BY 1) c
           |FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp
           |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) p
           |  USING (nk)
           |ORDER BY nk""".stripMargin))

  // ---------------------------------------------------------------- q31
  /** Custom typed UDAF via Aggregator (SURVEY.md §2.2 UDF/UDAF row):
    * geometric mean — partial state (sum of logs, count) merges
    * associatively, so Catalyst runs it as a partial+final hash agg
    * exactly like a built-in. Oracle: exp(avg(ln(x))). */
  val geomean: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double): (Double, Long) =
        (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
        (x._1 + y._1, x._2 + y._2)
      def finish(b: (Double, Long)): Double =
        if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val q31Udaf = QueryDef(
    "q31_udaf_geomean",
    (s, d) => {
      val gm = udaf(geomean)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(r4(gm(col("l_extendedprice"))).as("geomean_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q32
  /** Generator / UDTF analog (the reference Handler's 1→n shape,
    * types.go:127-135, in SQL form): explode tokens, aggregate global
    * token frequencies — the classic wordcount as a lateral view. */
  val q32Explode = QueryDef(
    "q32_explode_wordcount",
    (s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)
    },
    Some("""SELECT tok, count(*) AS n
           |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           |GROUP BY 1 ORDER BY n DESC, tok LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------- q33
  /** RANGE window frame over a numeric ordering: sum of all order values
    * within 10k below the current row's price, per customer. */
  val q33RangeFrame = QueryDef(
    "q33_range_frame",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
        .rangeBetween(-10000L, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("near_sum", r2(sum("o_totalprice").over(w)))
        .withColumn("near_n", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          r2(col("o_totalprice")).as("price"), col("near_sum"), col("near_n"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
           |  round(sum(o_totalprice) OVER w, 2) AS near_sum,
           |  count(*) OVER w AS near_n
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
           |  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  // ---------------------------------------------------------------- q34
  /** Exact interpolated percentiles (median/p90) per group. */
  val q34Percentiles = QueryDef(
    "q34_percentiles",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(r2(expr("percentile(o_totalprice, 0.5)")).as("median_price"),
          r2(expr("percentile(o_totalprice, 0.9)")).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
           |  count(*) AS n
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q35
  /** Statistical aggregate battery: stddev/variance/correlation/covariance. */
  val q35Stats = QueryDef(
    "q35_stats",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          r4(var_samp(col("l_discount"))).as("var_disc"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
          r4(covar_samp(col("l_quantity"), col("l_tax"))).as("covar_qty_tax"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
           |  round(stddev_samp(l_quantity), 4) AS sd_qty,
           |  round(var_samp(l_discount), 4) AS var_disc,
           |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           |  round(covar_samp(l_quantity, l_tax), 4) AS covar_qty_tax,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q37
  /** Batch sessionization via gap detection: a session break is a >10min
    * silence per user; session_id = running count of breaks (classic
    * lag + conditional cumsum — one shuffle on user_id, no state store
    * needed at rest; the streaming twin is Stateful.sessionize). */
  val q37Sessionize = QueryDef(
    "q37_sessionize",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("gap_s",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser)))
        .withColumn("is_break",
          when(col("gap_s").isNull || col("gap_s") > 600L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum("is_break").over(run))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"), r2(sum("value")).as("sum_value"),
          min("event_id").as("first_event"))
        .orderBy("user_id", "session_seq")
    },
    Some("""WITH gapped AS (
           |  SELECT user_id, event_id, value, ts,
           |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_s
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |marked AS (
           |  SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 * 1000000
           |                 THEN 1 ELSE 0 END AS is_break
           |  FROM gapped),
           |sessions AS (
           |  SELECT *, sum(is_break) OVER (PARTITION BY user_id
           |    ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           |  FROM marked)
           |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           |  count(*) AS n_events, round(sum(value), 2) AS sum_value,
           |  min(event_id) AS first_event
           |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q38
  /** Pivot: event-type counts as columns per user band. Spark's pivot
    * with explicit values = conditional aggregation (the oracle form). */
  val q38Pivot = QueryDef(
    "q38_pivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("user_band"))
        .pivot("event_type", types)
        .count()
        .select(col("user_band") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_band")
    },
    Some("""SELECT user_id % 10 AS user_band,
           |  count(*) FILTER (WHERE event_type = 'click') AS click,
           |  count(*) FILTER (WHERE event_type = 'error') AS error,
           |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
           |  count(*) FILTER (WHERE event_type = 'view') AS view
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q39
  /** Unpivot/melt: wide numeric measures to long (entity, measure, value). */
  val q39Unpivot = QueryDef(
    "q39_unpivot",
    (s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "measure", "value")
        .orderBy("p_partkey", "measure")
    },
    Some("""SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
           |FROM part
           |UNION ALL
           |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
           |ORDER BY p_partkey, measure""".stripMargin))

  // ---------------------------------------------------------------- q40
  /** Window navigation battery: first/last/nth value over an explicit
    * full-partition frame (deterministic ordering). */
  val q40WindowNav = QueryDef(
    "q40_window_nav",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("first_key", first("o_orderkey").over(w))
        .withColumn("last_key", last("o_orderkey").over(w))
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          col("first_key"), col("last_key"), col("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  first_value(o_orderkey) OVER w AS first_key,
           |  last_value(o_orderkey) OVER w AS last_key,
           |  nth_value(o_orderkey, 2) OVER w AS second_key
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  // ---------------------------------------------------------------- q41
  /** Collect aggregation with deterministic ordering: sorted distinct set
    * folded to a string (collect_set order is engine-defined, so the
    * sort happens before the fold on both sides). */
  val q41CollectAgg = QueryDef(
    "q41_collect_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
          countDistinct(col("l_linestatus")).as("n_statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           |  count(DISTINCT l_linestatus) AS n_statuses, count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q42
  /** Correlated scalar subquery (orders at >2× their customer's average):
    * Catalyst decorrelates this into an aggregate + join — the optimizer
    * capability itself is what's under test; identical SQL runs on both
    * engines. */
  val q42CorrelatedSubquery = QueryDef(
    "q42_correlated_subquery",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql("""SELECT o_orderkey, o_custkey,
              |  round(o_totalprice * 100) / 100 AS price
              |FROM orders o
              |WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
              |                      FROM orders o2
              |                      WHERE o2.o_custkey = o.o_custkey)
              |ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders o
           |WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
           |                      FROM orders o2
           |                      WHERE o2.o_custkey = o.o_custkey)
           |ORDER BY o_orderkey""".stripMargin))

  // ---------------------------------------------------------------- q43
  /** String battery 2: padding, case, char translation, edit distance,
    * field extraction. */
  val q43StringFuncs2 = QueryDef(
    "q43_string_funcs2",
    (s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "_").as("brand_pad"),
          reverse(col("p_name")).as("name_rev"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
          levenshtein(col("p_brand"), lit("Brand#33")).as("brand_dist"),
          substring_index(col("p_type"), " ", 1).as("type_first"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
           |  lpad(p_brand, 12, '_') AS brand_pad,
           |  reverse(p_name) AS name_rev,
           |  translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
           |  CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS brand_dist,
           |  split_part(p_type, ' ', 1) AS type_first
           |FROM part ORDER BY p_partkey""".stripMargin))

  // ---------------------------------------------------------------- q44
  /** Math battery 2: trig, exponent, sign, modulo, greatest/least. */
  val q44MathFuncs2 = QueryDef(
    "q44_math_funcs2",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(r4(sum(sin(col("l_quantity")))).as("sum_sin"),
          r4(sum(atan2(col("l_quantity"), col("l_extendedprice")))).as("sum_atan2"),
          r4(sum(exp(col("l_discount")))).as("sum_exp_disc"),
          sum(signum(col("l_discount") - 0.05).cast("long")).as("sum_sign"),
          r4(sum(pmod(col("l_quantity"), lit(7.0)))).as("sum_mod7"),
          r2(sum(greatest(col("l_tax"), col("l_discount")))).as("sum_max_rate"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
           |  round(sum(sin(l_quantity)), 4) AS sum_sin,
           |  round(sum(atan2(l_quantity, l_extendedprice)), 4) AS sum_atan2,
           |  round(sum(exp(l_discount)), 4) AS sum_exp_disc,
           |  CAST(sum(CAST(sign(l_discount - 0.05) AS BIGINT)) AS BIGINT) AS sum_sign,
           |  round(sum(fmod(fmod(l_quantity, 7) + 7, 7)), 4) AS sum_mod7,
           |  round(sum(greatest(l_tax, l_discount)), 2) AS sum_max_rate
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q45
  /** Date battery 2: interval arithmetic, day difference, month-end. */
  val q45DateFuncs2 = QueryDef(
    "q45_date_funcs2",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("date").as("due_date"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("age_days"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days,
           |  last_day(CAST(o_orderdate AS DATE)) AS month_end
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---------------------------------------------------------------- q47
  /** Recursive CTE (Spark 4's WITH RECURSIVE): generate a month spine over
    * the TPC-H order-date domain and gap-fill order counts/revenue per
    * month — the canonical time-series gap-fill that plain GROUP BY can't
    * express (empty months must appear). The recursion is coarse (one
    * step per YEAR, depth 7) with the 12 months expanded per step:
    * Spark executes one plan iteration per recursion step, so depth is
    * the cost driver — recurse coarse, expand fine (depth-84 month-wise
    * recursion spends ~4s of pure iteration overhead for the same rows).
    * The orders aggregate stays a single hash-agg shuffle joined
    * broadcast-side to the spine, so the shape is identical at 100 TB.
    * Engines differ only in date-arithmetic spelling; the recursion is
    * the same. */
  val q47RecursiveCte = QueryDef(
    "q47_recursive_cte",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql("""WITH RECURSIVE years(ystart) AS (
              |  SELECT DATE '1992-01-01'
              |  UNION ALL
              |  SELECT add_months(ystart, 12) FROM years
              |  WHERE ystart < DATE '1998-01-01'),
              |months AS (
              |  SELECT add_months(ystart, i) AS month
              |  FROM years LATERAL VIEW explode(sequence(0, 11)) t AS i)
              |SELECT m.month, COALESCE(o.n_orders, 0) AS n_orders,
              |  COALESCE(o.revenue, 0.0) AS revenue
              |FROM months m LEFT JOIN (
              |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
              |    count(*) AS n_orders,
              |    round(sum(o_totalprice) * 100) / 100 AS revenue
              |  FROM orders GROUP BY 1) o USING (month)
              |ORDER BY m.month""".stripMargin)
    },
    Some("""WITH RECURSIVE years(ystart) AS (
           |  SELECT DATE '1992-01-01'
           |  UNION ALL
           |  SELECT CAST(ystart + INTERVAL 12 MONTH AS DATE) FROM years
           |  WHERE ystart < DATE '1998-01-01'),
           |months AS (
           |  SELECT CAST(ystart + CAST(i AS INT) * INTERVAL 1 MONTH AS DATE) AS month
           |  FROM years CROSS JOIN (SELECT unnest(range(0, 12)) AS i))
           |SELECT m.month, COALESCE(o.n_orders, 0) AS n_orders,
           |  COALESCE(o.revenue, 0.0) AS revenue
           |FROM months m LEFT JOIN (
           |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           |    CAST(count(*) AS BIGINT) AS n_orders,
           |    round(sum(o_totalprice), 2) AS revenue
           |  FROM orders GROUP BY 1) o USING (month)
           |ORDER BY m.month""".stripMargin))

  // ---------------------------------------------------------------- q51
  /** NOT IN with NULLs — the three-valued-logic trap: against a null-free
    * subquery NOT IN is a plain anti join, but one NULL in the subquery
    * makes `x NOT IN (...)` never-true and the result EMPTY. Engines that
    * compile NOT IN to a naive anti join silently return wrong rows;
    * Spark plans a null-aware anti join (broadcast NAAJ) for exactly this
    * case. Both counts in one row: the null-free count is positive, the
    * with-nulls count must be exactly 0 — and the oracle agrees from the
    * same SQL semantics. */
  val q51NotInNulls = QueryDef(
    "q51_not_in_nulls",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql("""SELECT
              |  (SELECT count(*) FROM customer
              |   WHERE c_custkey NOT IN
              |     (SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
              |    AS n_clean,
              |  (SELECT count(*) FROM customer
              |   WHERE c_custkey NOT IN
              |     (SELECT CASE WHEN o_totalprice <= 400000 THEN o_custkey END
              |      FROM orders))
              |    AS n_with_nulls""".stripMargin)
    },
    Some("""SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM customer
           |   WHERE c_custkey NOT IN
           |     (SELECT o_custkey FROM orders WHERE o_totalprice > 400000))
           |    AS n_clean,
           |  (SELECT CAST(count(*) AS BIGINT) FROM customer
           |   WHERE c_custkey NOT IN
           |     (SELECT CASE WHEN o_totalprice <= 400000 THEN o_custkey END
           |      FROM orders))
           |    AS n_with_nulls""".stripMargin))

  // ---------------------------------------------------------------- q52
  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the "top-n rows
    * of B per row of A" join shape SQL users reach for before they know
    * window functions. Catalyst decorrelates it (DomainJoin → rank filter
    * over a single shuffle), so it costs the same as the q08 window
    * formulation rather than one subquery execution per outer row. */
  val q52LateralTopN = QueryDef(
    "q52_lateral_topn",
    (s, d) => {
      graft.Tables.registerViews(s, d)
      s.sql("""SELECT n.n_name, t.s_name, t.s_acctbal
              |FROM nation n,
              |LATERAL (SELECT s_name, s_acctbal FROM supplier
              |         WHERE s_nationkey = n.n_nationkey
              |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
              |ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""".stripMargin)
    },
    Some("""SELECT n.n_name, t.s_name, t.s_acctbal
           |FROM nation n,
           |LATERAL (SELECT s_name, s_acctbal FROM supplier
           |         WHERE s_nationkey = n.n_nationkey
           |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
           |ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""".stripMargin))

  // ---------------------------------------------------------------- q54
  /** Distribution windows — ntile / percent_rank / cume_dist, the
    * quantile-assignment trio q34's exact percentiles don't cover.
    * Deterministic because the window order is a total order (price,
    * orderkey); rolled up per (priority, decile) so the output stays
    * small at any SF. */
  val q54DistWindows = QueryDef(
    "q54_dist_windows",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      graft.Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"),
          ntile(10).over(w).as("decile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n"),
          r2(min("o_totalprice")).as("lo"), r2(max("o_totalprice")).as("hi"),
          r6(max("pr")).as("max_pr"), r6(max("cd")).as("max_cd"))
        .orderBy("o_orderpriority", "decile")
    },
    Some("""WITH ranked AS (
           |  SELECT o_orderpriority, o_totalprice,
           |    ntile(10) OVER w AS decile,
           |    percent_rank() OVER w AS pr,
           |    cume_dist() OVER w AS cd
           |  FROM orders
           |  WINDOW w AS (PARTITION BY o_orderpriority
           |               ORDER BY o_totalprice, o_orderkey))
           |SELECT o_orderpriority, CAST(decile AS INT) AS decile,
           |  CAST(count(*) AS BIGINT) AS n,
           |  round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi,
           |  round(max(pr), 6) AS max_pr, round(max(cd), 6) AS max_cd
           |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q59
  /** Value-based deciles — the SCALE twin of q54 (the d07/d08 pattern
    * applied to rank functions). q54's exact ntile window partitions on
    * `o_orderpriority` (5 values), so parallelism caps at 5 tasks no
    * matter the cluster; here the corpus-sized work is ONE map-side-
    * combined hash aggregate (the price histogram), and only the
    * histogram — bounded by the price DOMAIN, not the data volume —
    * passes through the per-priority cumulative window (the q50
    * histogram trick). Decile of a price = ceil(10·cum/n) over the
    * cumulative count, computed in integer arithmetic; ties share a
    * decile (value-based semantics — the one intended difference from
    * ntile, which splits ties to equalize bucket sizes). Deterministic,
    * so the DuckDB oracle hash-matches exactly. */
  val q59ValueDeciles = QueryDef(
    "q59_value_deciles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("o_orderpriority")
      graft.Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), col("o_totalprice"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("n_all", sum("cnt").over(wAll))
        .withColumn("decile", expr("CAST((10 * cum - 1) DIV n_all + 1 AS INT)"))
        .groupBy("o_orderpriority", "decile")
        .agg(sum("cnt").as("n"),
          r2(min("o_totalprice")).as("lo"), r2(max("o_totalprice")).as("hi"))
        .orderBy("o_orderpriority", "decile")
    },
    Some("""WITH h AS (
           |  SELECT o_orderpriority, o_totalprice, count(*) AS cnt
           |  FROM orders GROUP BY 1, 2),
           |c AS (
           |  SELECT o_orderpriority, o_totalprice, cnt,
           |    sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
           |      ROWS UNBOUNDED PRECEDING) AS cum,
           |    sum(cnt) OVER (PARTITION BY o_orderpriority) AS n_all
           |  FROM h)
           |SELECT o_orderpriority,
           |  CAST(((10 * cum - 1) // n_all) + 1 AS INT) AS decile,
           |  CAST(sum(cnt) AS BIGINT) AS n,
           |  round(min(o_totalprice), 2) AS lo,
           |  round(max(o_totalprice), 2) AS hi
           |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q129
  /** Session-gap sensitivity sweep: q37's sessionization re-cut at gap
    * thresholds 5/10/30/60 min from ONE lag pass — the d14/s15/t26
    * calibration posture applied to the parameter every session-based
    * metric silently depends on. Per gap: session count and events per
    * session — the curve's knee is where the gap stops splitting real
    * visits and starts splitting pauses.
    *
    * Scale shape: one user-partitioned lag window over the log, then a
    * constant 4-way explode of the per-event gap diffs and one hash-agg
    * onto the 4-row gap grid — the log is NOT re-windowed per
    * threshold. All-integer counts. */
  val q129SessionGapSweep = QueryDef(
    "q129_session_gap_sweep",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val diffs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("diff_us", unix_micros(col("ts")) - col("prev_us"))
      val gapsSec = Seq(300, 600, 1800, 3600)
      diffs
        .select(col("diff_us"),
          explode(array(gapsSec.map(lit): _*)).as("gap_seconds"))
        .withColumn("is_new",
          (col("diff_us").isNull ||
            col("diff_us") > col("gap_seconds").cast("long") * 1000000L)
            .cast("long"))
        .groupBy("gap_seconds")
        .agg(sum("is_new").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .select(col("gap_seconds"), col("n_sessions"), col("n_events"),
          r4(col("n_events").cast("double") / col("n_sessions"))
            .as("events_per_session"))
        .orderBy("gap_seconds")
    },
    Some("""WITH diffs AS (
           |  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
           |      PARTITION BY user_id ORDER BY ts, event_id) AS diff_us
           |  FROM events),
           |sweep AS (
           |  SELECT diff_us, unnest([300, 600, 1800, 3600]) AS gap_seconds
           |  FROM diffs),
           |agg AS (
           |  SELECT gap_seconds,
           |    CAST(sum(CASE WHEN diff_us IS NULL
           |      OR diff_us > CAST(gap_seconds AS BIGINT) * 1000000
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           |    CAST(count(*) AS BIGINT) AS n_events
           |  FROM sweep GROUP BY 1)
           |SELECT gap_seconds, n_sessions, n_events,
           |  round(CAST(n_events AS DOUBLE) / n_sessions * 10000) / 10000
           |    AS events_per_session
           |FROM agg ORDER BY gap_seconds""".stripMargin))

  val all: Seq[QueryDef] = Seq(q29OuterJoin, q30FullOuter, q31Udaf, q32Explode,
    q33RangeFrame, q34Percentiles, q35Stats, q37Sessionize, q38Pivot, q39Unpivot,
    q40WindowNav, q41CollectAgg, q42CorrelatedSubquery, q43StringFuncs2,
    q44MathFuncs2, q45DateFuncs2, q47RecursiveCte, q51NotInNulls, q52LateralTopN,
    q54DistWindows, q59ValueDeciles, q129SessionGapSweep)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Relational operator battery (SURVEY.md §2.2): projection/filter, joins
  * (inner/semi/anti/broadcast/range/as-of), aggregations (hash, distinct,
  * rollup/cube/grouping sets), window functions, sort/limit/top-k, set ops,
  * and the scalar-function batteries (string/date/math/json/array/case).
  *
  * Scale posture (100 TB): dimension tables (region/nation/supplier/part at
  * TPC-H proportions) are explicitly `broadcast()`; fact-fact joins shuffle on
  * their join key and rely on AQE for skew/coalesce; every aggregate is a
  * hash-agg with map-side partials (automatic in Catalyst); no collect() in
  * any operator path. Results carry deterministic ORDER BY on unique keys so
  * the driver's hash compare is stable.
  *
  * Reference scope note: the reference (runreveal/cheetah, see SURVEY.md §2.1)
  * implements none of these — its only transform is the per-event Handler
  * (types.go:127-135). This battery is the §2.2 "absent in reference → Spark
  * built-in" surface.
  */
object Relational {

  // DuckDB-bit-compatible rounding — single shared definition
  import graft.functions.Rounding.{r2, r4}

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: hash aggregate with map-side combine;
    * one shuffle on the (returnflag, linestatus) grouping key. */
  val q01PricingSummary = QueryDef(
    "q01_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r2(sum("l_quantity")).as("sum_qty"),
          r2(sum("l_extendedprice")).as("sum_base_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          r2(avg("l_quantity")).as("avg_qty"),
          r2(avg("l_extendedprice")).as("avg_price"),
          r4(avg("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice), 2) AS sum_base_price,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           |  round(avg(l_quantity), 2) AS avg_qty,
           |  round(avg(l_extendedprice), 2) AS avg_price,
           |  round(avg(l_discount), 4) AS avg_disc,
           |  count(*) AS count_order
           |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q02
  /** Projection + filter; both the shipdate predicate and the 4-column
    * projection push down into the parquet scan (PushedFilters/ReadSchema). */
  val q02FilterProject = QueryDef(
    "q02_filter_project",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-06-01").cast("timestamp") && col("l_discount") > 0.08)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          r2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |  round(l_extendedprice * (1 - l_discount), 2) AS net_price
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '2000-06-01' AND l_discount > 0.08
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3-style 3-way join + agg + top-k. customer is small relative to
    * orders/lineitem → broadcast; orders⋈lineitem shuffles on the orderkey. */
  val q03JoinAgg = QueryDef(
    "q03_join_agg",
    (s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
        .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin))

  // ---------------------------------------------------------------- q04
  /** Left-semi join (EXISTS): only the join key crosses the shuffle; the
    * probe side never materializes matched rows twice. */
  val q04SemiJoin = QueryDef(
    "q04_semi_join",
    (s, d) => {
      val ord = Tables.orders(s, d)
      val bigLines = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders
           |FROM orders
           |WHERE EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q05
  /** Left-anti join (NOT EXISTS): customers that never ordered. */
  val q05AntiJoin = QueryDef(
    "q05_anti_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"), r2(sum("c_acctbal")).as("sum_bal"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, count(*) AS n_customers,
           |  round(sum(c_acctbal), 2) AS sum_bal
           |FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q06
  /** Star-schema join with explicit broadcast of the dimension chain
    * (region 5 rows, nation 25 rows at every SF) — no shuffle of the fact
    * side at all; the plan is scan→BroadcastHashJoin×2→partial agg. */
  val q06BroadcastJoin = QueryDef(
    "q06_broadcast_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), r2(sum("c_acctbal")).as("sum_bal"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, count(*) AS n_customers,
           |  round(sum(c_acctbal), 2) AS sum_bal
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q07
  /** TPC-H Q6-style conditional aggregate: all three predicates push into
    * the parquet scan; result is a single global agg (2-stage partial). */
  val q07ConditionalAgg = QueryDef(
    "q07_conditional_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           |  count(*) AS n_lines
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin))

  // ---------------------------------------------------------------- q08
  /** Top-k per group via ranking window: single shuffle on the partition
    * key, then a per-partition sort — the scalable top-k idiom (no global
    * sort, no collect). */
  val q08TopkPerGroup = QueryDef(
    "q08_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .orderBy("l_returnflag", "rn")
    },
    Some("""SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
           |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
           |        row_number() OVER (PARTITION BY l_returnflag
           |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           |      FROM lineitem)
           |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin))

  // ---------------------------------------------------------------- q09
  /** Analytic window battery: lag + running sum with an explicit ROWS frame
    * over a fully-deterministic (date, orderkey) ordering. */
  val q09WindowAnalytic = QueryDef(
    "q09_window_analytic",
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("prev_price", r2(lag("o_totalprice", 1).over(w)))
        .withColumn("run_sum", r2(sum("o_totalprice").over(wRun)))
        .withColumn("rank_in_cust", row_number().over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("orderdate"),
          r2(col("o_totalprice")).as("price"),
          col("prev_price"), col("run_sum"), col("rank_in_cust"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           |  round(o_totalprice, 2) AS price,
           |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
           |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
           |  row_number() OVER w AS rank_in_cust
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  // ---------------------------------------------------------------- q10
  /** ROLLUP hierarchy aggregate; NULL grouping slots are coalesced to 'ALL'
    * so the hash compare is null-free and engine-agnostic. */
  val q10Rollup = QueryDef(
    "q10_rollup",
    (s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(r2(sum("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           |  coalesce(l_linestatus, 'ALL') AS linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q11
  /** CUBE over two independent dimensions. */
  val q11Cube = QueryDef(
    "q11_cube",
    (s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), r2(sum("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
           |  coalesce(o_orderpriority, 'ALL') AS priority,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           |ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q12
  /** Exact distinct aggregates (Catalyst expands to a two-phase
    * distinct-then-agg; at scale this is the standard expand+shuffle plan). */
  val q12DistinctAgg = QueryDef(
    "q12_distinct_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_lines
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q13
  /** Global sort + limit: Spark executes as TakeOrderedAndProject — a
    * per-partition top-N then a driver-side merge of N×partitions rows,
    * never a full global sort. */
  val q13SortLimit = QueryDef(
    "q13_sort_limit",
    (s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), r2(col("o_totalprice")).as("price"),
          col("o_orderdate").cast("date").as("orderdate"))
        .limit(10)
    },
    Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price,
           |  CAST(o_orderdate AS DATE) AS orderdate
           |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin))

  // ---------------------------------------------------------------- q14-16
  /** Set operations: UNION (distinct), INTERSECT, EXCEPT. */
  val q14Union = QueryDef(
    "q14_setop_union",
    (s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")
    },
    Some("""SELECT c_nationkey AS nk FROM customer
           |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin))

  val q15Intersect = QueryDef(
    "q15_setop_intersect",
    (s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },
    Some("""SELECT c_nationkey AS nk FROM customer
           |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin))

  val q16Except = QueryDef(
    "q16_setop_except",
    (s, d) => {
      Tables.customer(s, d).select(col("c_custkey").as("ck"))
        .except(Tables.orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("ck")))
        .orderBy("ck")
    },
    Some("""SELECT c_custkey AS ck FROM customer
           |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000
           |ORDER BY ck""".stripMargin))

  // ---------------------------------------------------------------- q17
  /** String scalar battery: substring/upper/length/concat_ws/regexp/replace —
    * all codegen'd builtins, no UDFs. */
  val q17StringFuncs = QueryDef(
    "q17_string_funcs",
    (s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 5)).as("head5"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, upper(substring(p_name, 1, 5)) AS head5,
           |  CAST(length(p_name) AS INT) AS name_len,
           |  concat_ws('-', p_brand, p_type) AS brand_type,
           |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           |  regexp_replace(p_type, ' ', '_', 'g') AS type_snake
           |FROM part ORDER BY p_partkey""".stripMargin))

  // ---------------------------------------------------------------- q18
  /** Date/time battery: date_trunc bucketing + component extraction. */
  val q18DateFuncs = QueryDef(
    "q18_date_funcs",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_mm"))
        .agg(count(lit(1)).as("n"), r2(sum("o_totalprice")).as("sum_price"))
        .orderBy("order_month")
    },
    Some("""SELECT date_trunc('month', o_orderdate) AS order_month,
           |  CAST(year(o_orderdate) AS INT) AS order_year,
           |  CAST(month(o_orderdate) AS INT) AS order_mm,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
           |FROM orders GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q19
  /** Math battery grouped by a computed bucket. */
  val q19MathFuncs = QueryDef(
    "q19_math_funcs",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_quantity") / 10).cast("long").as("qty_bucket"))
        .agg(count(lit(1)).as("n"),
          r2(sum(sqrt(col("l_quantity")))).as("sum_sqrt_qty"),
          r2(sum(log(col("l_extendedprice")))).as("sum_ln_price"),
          r2(sum(abs(col("l_discount") - 0.05))).as("sum_absdev_disc"),
          r4(sum(pow(col("l_tax"), 2))).as("sum_tax_sq"))
        .orderBy("qty_bucket")
    },
    Some("""SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
           |  count(*) AS n,
           |  round(sum(sqrt(l_quantity)), 2) AS sum_sqrt_qty,
           |  round(sum(ln(l_extendedprice)), 2) AS sum_ln_price,
           |  round(sum(abs(l_discount - 0.05)), 2) AS sum_absdev_disc,
           |  round(sum(pow(l_tax, 2)), 4) AS sum_tax_sq
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q20
  /** JSON extraction (schema-on-read, SURVEY.md §1.2): from_json with an
    * explicit schema — the Spark-native path; oracle mirrors via regexp. */
  val q20JsonFuncs = QueryDef(
    "q20_json_funcs",
    (s, d) => {
      Tables.events(s, d)
        .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          r2(avg("value")).as("avg_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |  CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
           |  round(avg(value), 2) AS avg_value
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q21
  /** CASE WHEN bucketing. */
  val q21CaseWhen = QueryDef(
    "q21_case_when",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("price_band"))
        .agg(count(lit(1)).as("n"), r2(sum("o_totalprice")).as("sum_price"))
        .orderBy("price_band")
    },
    Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
           |            WHEN o_totalprice < 150000 THEN 'mid'
           |            ELSE 'high' END AS price_band,
           |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q22
  /** GROUPING SETS via SQL (exercises the spark.sql entry path + views). */
  val q22GroupingSets = QueryDef(
    "q22_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      // round(x*100)/100 matches the DuckDB oracle's round(x, 2) (see r2)
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
              |  coalesce(l_linestatus, 'ALL') AS linestatus,
              |  count(*) AS n, round(sum(l_extendedprice) * 100) / 100 AS sum_price
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY 1, 2""".stripMargin)
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           |  coalesce(l_linestatus, 'ALL') AS linestatus,
           |  count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q23
  /** Array function battery over tokenized documents. */
  val q23ArrayFuncs = QueryDef(
    "q23_array_funcs",
    (s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_uniq"),
          array_contains(toks, "the").as("has_the"),
          concat_ws(",", slice(sort_array(array_distinct(toks)), 1, 3)).as("first3"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
           |  list_contains(string_split(text, ' '), 'the') AS has_the,
           |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- q25
  /** As-of join, Spark-first: instead of a per-row backward probe (which on a
    * cluster would be a skewed non-equi join), union the two sides tagged,
    * sort within each user partition by time, and carry the latest purchase
    * forward with last_value(ignoreNulls) — one shuffle on user_id, linear
    * work, no cross product. Matches DuckDB's ASOF JOIN semantics
    * (purchase.ts <= click.ts, latest wins). */
  val q25AsofJoin = QueryDef(
    "q25_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_click"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_click"))
      // purchases sort before clicks at identical ts => "<=" as-of semantics
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.union(purchases)
        .withColumn("purchase_event_id",
          last(when(col("is_click") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("purchase_ts",
          last(when(col("is_click") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("is_click") === 1 && col("purchase_event_id").isNotNull)
        .select(col("event_id"), col("purchase_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("purchase_ts"))).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, p.event_id AS purchase_event_id,
           |  epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
           |FROM (SELECT * FROM events WHERE event_type = 'click') e
           |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           |  ON e.user_id = p.user_id AND e.ts >= p.ts
           |ORDER BY e.event_id""".stripMargin))

  // ---------------------------------------------------------------- q26
  /** Range (theta) join against a tiny in-memory band dimension: Spark picks
    * BroadcastNestedLoopJoin — correct at any fact-side scale because the
    * band table is O(1). */
  val q26RangeJoin = QueryDef(
    "q26_range_join",
    (s, d) => {
      val bands = s.createDataFrame(Seq(
        (0.0, 50.0, "small"), (50.0, 150.0, "mid"), (150.0, 1e9, "big")))
        .toDF("lo", "hi", "band")
      val ev = Tables.events(s, d)
      ev.join(broadcast(bands), ev("value") >= bands("lo") && ev("value") < bands("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), r2(sum("value")).as("sum_value"))
        .orderBy("band")
    },
    Some("""SELECT band, count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events
           |JOIN (VALUES (0.0, 50.0, 'small'), (50.0, 150.0, 'mid'),
           |             (150.0, 1000000000.0, 'big')) AS b(lo, hi, band)
           |  ON value >= lo AND value < hi
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q27
  /** Approximate distinct (HyperLogLog++). Engine-specific sketch values
    * can't hash-match an oracle → registered rows-only. */
  val q27ApproxDistinct = QueryDef(
    "q27_approx_distinct",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    None)

  // ---------------------------------------------------------------- q28
  /** Map function battery. DuckDB's MAP type diverges, but every output
    * column here is a plain scalar/array, so the oracle states the
    * expected values directly — verifying Spark's map construction,
    * key listing, and element lookup end to end. */
  val q28MapFuncs = QueryDef(
    "q28_map_funcs",
    (s, d) => {
      Tables.events(s, d)
        .withColumn("m", map(lit("type"), col("event_type"),
          lit("bucket"), when(col("value") < 100, "lo").otherwise("hi")))
        .select(col("event_id"),
          concat_ws(",", map_keys(col("m"))).as("ks"),
          element_at(col("m"), "type").as("type_val"),
          element_at(col("m"), "bucket").as("bucket_val"),
          size(map_values(col("m"))).as("n_vals"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, 'type,bucket' AS ks,
           |  event_type AS type_val,
           |  CASE WHEN value < 100 THEN 'lo' ELSE 'hi' END AS bucket_val,
           |  2 AS n_vals
           |FROM events ORDER BY event_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02FilterProject, q03JoinAgg, q04SemiJoin, q05AntiJoin,
    q06BroadcastJoin, q07ConditionalAgg, q08TopkPerGroup, q09WindowAnalytic,
    q10Rollup, q11Cube, q12DistinctAgg, q13SortLimit, q14Union, q15Intersect,
    q16Except, q17StringFuncs, q18DateFuncs, q19MathFuncs, q20JsonFuncs,
    q21CaseWhen, q22GroupingSets, q23ArrayFuncs, q25AsofJoin, q26RangeJoin,
    q27ApproxDistinct, q28MapFuncs)
}

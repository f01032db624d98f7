package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Rounding.r2

/** Skew-handling patterns for hot keys at cluster scale.
  *
  * Two-phase salted aggregation: append a random-but-deterministic salt to
  * the grouping key, pre-aggregate on (key, salt) — spreading one hot key
  * over `SaltBuckets` reducers — then aggregate the partials on the bare
  * key. For algebraic aggregates (sum/count/min/max) the result is exactly
  * the plain groupBy result, so the oracle is the UNsalted SQL.
  *
  * (AQE skew-join splitting handles the join-side analog automatically;
  * this pattern is for aggregations, where AQE cannot split a hash-agg
  * group. l_returnflag has 3 values at any SF — the canonical "3 reducers
  * do all the work" shape this fixes.)
  */
object Skew {

  private val SaltBuckets = 16

  val q36SaltedAgg = QueryDef(
    "q36_salted_agg",
    (s, d) => {
      // deterministic salt: spread rows by a hash of the row identity,
      // NOT rand() — keeps the query replayable/retry-safe
      val salted = Tables.lineitem(s, d)
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(SaltBuckets)))
      val partial = salted.groupBy("l_returnflag", "salt")
        .agg(sum("l_quantity").as("p_qty"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("p_rev"),
          count(lit(1)).as("p_n"))
      partial.groupBy("l_returnflag")
        .agg(r2(sum("p_qty")).as("sum_qty"), r2(sum("p_rev")).as("revenue"),
          sum("p_n").as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q46
  /** Deterministic hash sampling (~10%): rows where the first md5 hex
    * digit of the key is '0' or '1' (16ths → 12.5%). Unlike TABLESAMPLE
    * or rand(), the sample is stable across engines, retries, and
    * partitionings — the property a reproducible training-data pipeline
    * needs — and the same md5 runs in the oracle. */
  val q46HashSample = QueryDef(
    "q46_hash_sample",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 1)
          .isin("0", "1"))
        .agg(count(lit(1)).as("n_sampled"),
          r2(sum("l_extendedprice")).as("sum_price"))
    },
    Some("""SELECT count(*) AS n_sampled,
           |  round(sum(l_extendedprice), 2) AS sum_price
           |FROM lineitem
           |WHERE substring(md5(l_orderkey || '-' || l_linenumber), 1, 1) IN ('0', '1')""".stripMargin))

  // ---------------------------------------------------------------- q50
  /** Equi-width histogram: fixed-width value buckets with count and the
    * observed [lo, hi] per bucket — the one-pass distribution profile a
    * planner/quality monitor reads. One hash-agg shuffle on the bucket id
    * (bounded cardinality), counts combine map-side; at 100 TB this is
    * the cheapest full-scan statistic there is. (Bucketing is spelled
    * floor(x/width) — engine-portable, unlike width_bucket which the
    * oracle engine lacks.) */
  val q50Histogram = QueryDef(
    "q50_histogram",
    (s, d) => {
      val width = 5500.0
      Tables.lineitem(s, d)
        .withColumn("bucket", floor(col("l_extendedprice") / width).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          r2(min("l_extendedprice")).as("lo"),
          r2(max("l_extendedprice")).as("hi"))
        .orderBy("bucket")
    },
    Some("""SELECT CAST(floor(l_extendedprice / 5500.0) AS INT) AS bucket,
           |  count(*) AS n,
           |  round(min(l_extendedprice), 2) AS lo,
           |  round(max(l_extendedprice), 2) AS hi
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q53
  /** One-pass table profile — the data-quality snapshot a pipeline
    * monitor computes per partition-load: row count, per-column null
    * counts, exact distinct counts for the low-cardinality columns, and
    * value ranges. A single stacked aggregation: one scan, one
    * reduce-to-one-row (count-distincts expand internally, still
    * shuffle-bounded by column cardinality, never by row count). */
  val q53Profile = QueryDef(
    "q53_profile",
    (s, d) => {
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
        sum(col("o_orderstatus").isNull.cast("long")).as("null_status"),
        countDistinct("o_orderstatus").as("ndv_status"),
        countDistinct("o_orderpriority").as("ndv_priority"),
        r2(min("o_totalprice")).as("min_price"),
        r2(max("o_totalprice")).as("max_price"),
        min(to_date(col("o_orderdate"))).as("min_date"),
        max(to_date(col("o_orderdate"))).as("max_date"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS null_custkey,
           |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS null_status,
           |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status,
           |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv_priority,
           |  round(min(o_totalprice), 2) AS min_price,
           |  round(max(o_totalprice), 2) AS max_price,
           |  CAST(min(o_orderdate) AS DATE) AS min_date,
           |  CAST(max(o_orderdate) AS DATE) AS max_date
           |FROM orders""".stripMargin))

  val all: Seq[QueryDef] = Seq(q36SaltedAgg, q46HashSample, q50Histogram, q53Profile)
}

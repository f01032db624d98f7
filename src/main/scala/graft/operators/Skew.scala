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

  val all: Seq[QueryDef] = Seq(q36SaltedAgg)
}

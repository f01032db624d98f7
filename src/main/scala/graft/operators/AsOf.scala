package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

import graft.{QueryDef, Tables}
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy, BandJoinPlan, BandJoinStrategy}

/** DataFrame-level entry point for the native as-of join operator
  * (graft.plans.AsOfJoinExec). Resolves the key/time/sequence columns
  * by NAME against each side's analyzed output, validates they are
  * BIGINT (callers project unix_micros(ts) first), registers the
  * planner strategy on the session, and returns a DataFrame over the
  * resolved [[AsOfJoinPlan]].
  *
  * Semantics: left outer; backward = latest right.ts <= left.ts
  * (equal-ts ties to the highest seq — q25's rule), forward = earliest
  * right.ts >= left.ts (ties to the lowest seq — q89's rule);
  * `tolUs >= 0` bounds the gap.
  */
object AsOf {

  private def attr(df: DataFrame, name: String): Attribute = {
    val plan = Bridge.analyzed(df)
    val a = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    require(a.dataType == LongType,
      s"as-of join expects BIGINT for '$name' (project unix_micros first), " +
        s"got ${a.dataType.simpleString}")
    a
  }

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      rightSeq: String, forward: Boolean = false, tolUs: Long = -1L)
      : DataFrame = {
    val spark = left.sparkSession
    Bridge.addStrategy(spark, new AsOfJoinStrategy)
    Bridge.addOptimization(spark, graft.plans.PushFilterThroughGraftJoins)
    Bridge.ofRows(spark, AsOfJoinPlan(
      Bridge.analyzed(left), Bridge.analyzed(right),
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTs), attr(right, rightTs), attr(right, rightSeq),
      tolUs, forward))
  }

  /** Native keyed band join (graft.plans.BandJoinExec): inner pairs
    * with equal keys and |rightTs − leftTs| ≤ tolUs, executed as one
    * co-partitioned sliding-window merge. */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      tolUs: Long): DataFrame = {
    require(tolUs >= 0L, s"band tolerance must be >= 0, got $tolUs")
    val spark = left.sparkSession
    Bridge.addStrategy(spark, new BandJoinStrategy)
    Bridge.addOptimization(spark, graft.plans.PushFilterThroughGraftJoins)
    Bridge.ofRows(spark, BandJoinPlan(
      Bridge.analyzed(left), Bridge.analyzed(right),
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTs), attr(right, rightTs), tolUs))
  }

  // --------------------------------------------------------------- q101
  /** q25's click→latest-purchase enrichment through the NATIVE operator
    * instead of the union+window rewrite — same oracle, so the custom
    * plan node sits under the DuckDB ASOF JOIN gate. The plan is two
    * filtered scans, one exchange per side, one merge: no unioned
    * intermediate, no window buffer (PlanSpec pins AsOfJoinExec present
    * and Window absent). */
  val q101AsofNative = QueryDef(
    "q101_asof_native",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("ck"), unix_micros(col("ts")).as("ct"),
          col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pk"), unix_micros(col("ts")).as("pt"),
          col("event_id").as("purchase_event_id"))
      join(clicks, purchases, "ck", "pk", "ct", "pt", "purchase_event_id")
        .filter(col("purchase_event_id").isNotNull)
        .select(col("event_id"), col("purchase_event_id"),
          (col("ct") - col("pt")).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, p.event_id AS purchase_event_id,
           |  epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
           |FROM (SELECT * FROM events WHERE event_type = 'click') e
           |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           |  ON e.user_id = p.user_id AND e.ts >= p.ts
           |ORDER BY e.event_id""".stripMargin))

  // --------------------------------------------------------------- q109
  /** Click↔purchase pairs within ±30 minutes per user through the
    * NATIVE band join, rolled up to the co-action summary — the keyed
    * time-band join q84's bucket-explode family approximates, executed
    * as a single sliding-window merge (PlanSpec pins BandJoinExec
    * present and no nested-loop join). The aggregate keeps every
    * statistic in exact integer µs, so it hash-matches the plain theta
    * join DuckDB runs on the same predicate. */
  val q109BandNative = QueryDef(
    "q109_band_native",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("ck"), unix_micros(col("ts")).as("ct"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pk"), unix_micros(col("ts")).as("pt"),
          col("event_id").as("purchase_id"))
      bandJoin(clicks, purchases, "ck", "pk", "ct", "pt",
          tolUs = 1800000000L)
        .groupBy(col("ck").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("pt") - col("ct"))).as("sum_abs_gap_us"),
          min(col("pt") - col("ct")).as("min_gap_us"),
          max(col("pt") - col("ct")).as("max_gap_us"))
        .orderBy("user_id")
    },
    Some("""SELECT c.user_id,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(abs(epoch_us(p.ts) - epoch_us(c.ts))) AS BIGINT)
           |    AS sum_abs_gap_us,
           |  CAST(min(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT)
           |    AS min_gap_us,
           |  CAST(max(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT)
           |    AS max_gap_us
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           |  ON c.user_id = p.user_id
           |  AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 1800000000
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[QueryDef] = Seq(q101AsofNative, q109BandNative)
}

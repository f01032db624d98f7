package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Gates for the native as-of join (graft.plans.AsOfJoinExec): plan
  * shape (custom node present, window/union rewrite absent), semantic
  * parity with the q25/q89 window formulations on real data, and the
  * edge semantics (no-match nulls, tolerance cutoffs, equal-ts ties)
  * on constructed frames. */
class AsOfNativeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q101 plan: AsOfJoinExec with one exchange per side, no window/union") {
    val df = SparkEntry.queries("q101_asof_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the exec node prints as "AsOfJoin" (Spark strips the Exec suffix)
    assert(plan.contains("AsOfJoin"), s"missing custom node:\n$plan")
    assert(!plan.contains("Window"), "window rewrite leaked into native plan")
    assert(!plan.contains("Union"), "union rewrite leaked into native plan")
  }

  test("native backward == q25 union+window formulation") {
    val native = SparkEntry.queries("q101_asof_native")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val window = SparkEntry.queries("q25_asof_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native.nonEmpty)
    assert(native == window,
      s"native-only: ${native.diff(window).take(3)}; " +
        s"window-only: ${window.diff(native).take(3)}")
  }

  test("native forward with 24h tolerance == q89 forward columns") {
    val s = spark
    val TolUs = 86400000000L
    val ev = Tables.events(s, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("ck"), unix_micros(col("ts")).as("ct"),
        col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pk"), unix_micros(col("ts")).as("pt"),
        col("event_id").as("fwd_event_id"))
    val native = AsOf.join(clicks, purchases, "ck", "pk", "ct", "pt",
        "fwd_event_id", forward = true, tolUs = TolUs)
      .select(col("event_id"), col("fwd_event_id"),
        (col("pt") - col("ct")).as("fwd_gap_us"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    val batch = SparkEntry.queries("q89_asof_directions")(s, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
      .toMap
    assert(native.nonEmpty && native.values.exists(_.isDefined))
    assert(native == batch,
      s"native-only: ${native.toSet.diff(batch.toSet).take(3)}; " +
        s"batch-only: ${batch.toSet.diff(native.toSet).take(3)}")
  }

  test("edge semantics: no-match nulls, tolerance cutoff, equal-ts ties") {
    val s = spark
    import s.implicits._
    // left: key 1 has candidates, key 2 has none, key 3's candidate is
    // beyond tolerance; right key 1 has equal-ts rows (seq tie-break)
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 100L, 12L),
        (3L, 500L, 13L))
      .toDF("k", "t", "lid").repartition(4, col("k"))
    val right = Seq((1L, 100L, 20L), (1L, 100L, 21L), (1L, 40L, 22L),
        (3L, 100L, 23L))
      .toDF("k", "t", "rid")
      .select(col("k").as("rk"), col("t").as("rt"), col("rid"))
      .repartition(3, col("rk"))
    def run(fwd: Boolean, tol: Long): Map[Long, Option[Long]] =
      AsOf.join(left, right, "k", "rk", "t", "rt", "rid",
          forward = fwd, tolUs = tol)
        .select(col("lid"), col("rid")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // backward, tol 300: lid 10 (t=100) ties at rt=100 → HIGHEST seq 21;
    // lid 11 (t=50) → rt=40 (rid 22); lid 12 no key-2 rows → null;
    // lid 13 (t=500) → rt=100 gap 400 > 300 → null
    assert(run(fwd = false, tol = 300L) ==
      Map(10L -> Some(21L), 11L -> Some(22L), 12L -> None, 13L -> None))
    // forward, unbounded: lid 10 ties at rt=100 → LOWEST seq 20; lid 11
    // → earliest rt >= 50 is 100 (seq 20); lid 13: no rt >= 500 → null
    assert(run(fwd = true, tol = -1L) ==
      Map(10L -> Some(20L), 11L -> Some(20L), 12L -> None, 13L -> None))
  }

  test("q109 plan: BandJoinExec merge, no nested-loop or theta-residual join") {
    val df = SparkEntry.queries("q109_band_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BandJoin"), s"missing custom node:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "band must execute as the sliding merge, not a nested loop")
  }

  test("native band join == DataFrame theta join on real data") {
    val s = spark
    val TolUs = 1800000000L
    val ev = Tables.events(s, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("ck"), unix_micros(col("ts")).as("ct"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pk"), unix_micros(col("ts")).as("pt"),
        col("event_id").as("purchase_id"))
    val native = AsOf.bandJoin(clicks, purchases, "ck", "pk", "ct", "pt",
        TolUs)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val theta = clicks.join(purchases,
        col("ck") === col("pk") && abs(col("pt") - col("ct")) <= TolUs)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native.nonEmpty)
    assert(native == theta,
      s"native-only: ${native.diff(theta).take(3)}; " +
        s"theta-only: ${theta.diff(native).take(3)}")
  }

  test("optimizer rule: left filters push through the custom joins to the scan") {
    val s = spark
    val ev = Tables.events(s, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("ck"), unix_micros(col("ts")).as("ct"),
        col("event_id"), col("value").as("cv"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pk"), unix_micros(col("ts")).as("pt"),
        col("event_id").as("pid"))
    // filter applied ABOVE the join, on a LEFT-side column the join
    // condition never touches — only the pushdown rule can move it
    val joined = AsOf.join(clicks, purchases, "ck", "pk", "ct", "pt", "pid")
      .filter(col("cv") > 100.0)
    val opt = joined.queryExecution.optimizedPlan
    val asof = opt.collectFirst { case j: graft.plans.AsOfJoinPlan => j }
    assert(asof.isDefined, s"as-of node lost in:\n$opt")
    assert(asof.get.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isDefined || asof.get.left.toString.contains("PushedFilters"),
      s"left filter did not push below the join:\n$opt")
    // and it reaches the parquet scan as a pushed filter
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("GreaterThan(value,100.0)"),
      s"predicate missing from PushedFilters:\n${phys.take(1500)}")
    // results identical to filtering before the join by hand
    val manual = AsOf.join(clicks.filter(col("cv") > 100.0), purchases,
      "ck", "pk", "ct", "pt", "pid")
    assert(joined.count() === manual.count())
    // a RIGHT-side predicate on the left-outer as-of must NOT push:
    // it observes null-completed columns
    val rightPred = AsOf.join(clicks, purchases, "ck", "pk", "ct", "pt",
        "pid")
      .filter(col("pid").isNotNull)
    val opt2 = rightPred.queryExecution.optimizedPlan
    // the IsNotNull must remain a Filter sitting ABOVE the join node
    val stillAbove = opt2.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c,
          _: graft.plans.AsOfJoinPlan) => c
    }
    assert(stillAbove.exists(_.toString.toLowerCase.contains("isnotnull")),
      s"right-side predicate illegally pushed through as-of:\n$opt2")
  }

  test("band edge semantics: inclusive edges, per-key isolation, empty side") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 100L, 12L))
      .toDF("k", "t", "lid").repartition(4, col("k"))
    val right = Seq((1L, 50L, 20L), (1L, 150L, 21L), (1L, 260L, 22L),
        (2L, 300L, 23L), (9L, 100L, 24L))
      .toDF("rk", "rt", "rid").repartition(3, col("rk"))
    val got = AsOf.bandJoin(left, right, "k", "rk", "t", "rt", 50L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // lid 10 (k1,t100): band [50,150] → rids 20 (edge) and 21 (edge);
    // lid 11 (k1,t200): band [150,250] → rid 21 only (260 is out);
    // lid 12 (k2,t100): band [50,150] → nothing (k2's 300 is out);
    // key 9 on the right never pairs
    assert(got == Set((10L, 20L), (10L, 21L), (11L, 21L)))
    // empty right side → empty result, not a failure
    val none = AsOf.bandJoin(left, right.filter(col("rk") === 99L),
      "k", "rk", "t", "rt", 50L)
    assert(none.count() === 0L)
  }
}

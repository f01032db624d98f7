package graft

import org.apache.spark.sql.functions._

/** Semantics gates for the customer/series analytics operators added in
  * round 6 (q102 RFM, q103 cohort LTV, q104 CUSUM, q105 mutual
  * partners, t23 readability). The oracle rows prove cross-engine
  * agreement; these prove the outputs mean what they claim: the RFM
  * rollup conserves the customer population, LTV curves are monotone,
  * the CUSUM closes at exactly zero (it is a sum of deviations from its
  * own mean), mutual pairs are genuinely exclusive, and readability
  * bands match their thresholds.
  */
class CohortAnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q102: scores are 1..5 and the rollup conserves every customer") {
    val s = spark
    val out = operators.Behavioral.q102RfmSegments.run(s, sf).cache()
    try {
      for (c <- Seq("r_score", "f_score", "m_score"))
        assert(out.filter(col(c) < 1 || col(c) > 5).count() === 0)
      val total = out.agg(sum("n_customers")).head.getLong(0)
      val custs = Tables.orders(s, sf)
        .select(countDistinct("o_custkey")).head.getLong(0)
      assert(total === custs)
    } finally out.unpersist()
  }

  test("q103: LTV is monotone in age and actives never exceed the cohort") {
    val s = spark
    val out = operators.Behavioral.q103CohortLtv.run(s, sf).cache()
    try {
      assert(out.filter(col("n_active") > col("cohort_size")).count() === 0)
      // cumulative revenue per customer can only grow with age
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort_year", "cohort_month").orderBy("age")
      val drops = out
        .withColumn("prev", lag("ltv_per_customer", 1).over(w))
        .filter(col("prev").isNotNull &&
          col("ltv_per_customer") < col("prev") - lit(1e-9))
      assert(drops.count() === 0)
      // age 0 exists for every cohort (the cohort-defining order itself)
      val missing = out.groupBy("cohort_year", "cohort_month")
        .agg(min("age").as("a0")).filter(col("a0") =!= 0)
      assert(missing.count() === 0)
    } finally out.unpersist()
  }

  test("q104: CUSUM of deviations from the series mean closes at zero") {
    val s = spark
    val out = operators.Temporal.q104Cusum.run(s, sf).cache()
    try {
      // Σ(mᵢ − μ) = 0 by construction; the integer-exact pipeline makes
      // the final row's cusum EXACTLY 0.0 after rounding, per type
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("day").desc)
      val last = out.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      assert(last.filter(abs(col("cusum")) > lit(1e-9)).count() === 0)
      // a shifted day requires a nonzero excursion
      assert(out.filter(col("shifted") && col("cusum") === 0.0)
        .count() === 0)
    } finally out.unpersist()
  }

  test("q105: mutual pairs are exclusive — each part in at most one pair") {
    val s = spark
    val out = operators.Graph.q105MutualTop.run(s, sf).cache()
    try {
      assert(out.filter(col("part_a") >= col("part_b")).count() === 0)
      val parts = out.select(col("part_a").as("p"))
        .union(out.select(col("part_b").as("p")))
      assert(parts.count() === parts.distinct().count())
      assert(out.filter(col("n_shared_orders") < 1).count() === 0)
    } finally out.unpersist()
  }

  test("q106: arms partition the exposed users and stats are coherent") {
    val s = spark
    val row = operators.Behavioral.q106AbLift.run(s, sf).head
    val (nc, nt) = (row.getLong(0), row.getLong(1))
    val (cc, ct) = (row.getLong(2), row.getLong(3))
    val exposed = Tables.events(s, sf)
      .filter(col("event_type") === "view")
      .select(countDistinct("user_id")).head.getLong(0)
    assert(nc + nt === exposed)
    assert(cc <= nc && ct <= nt && cc >= 0 && ct >= 0)
    val (rc, rt) = (row.getDouble(4), row.getDouble(5))
    assert(rc >= 0.0 && rc <= 1.0 && rt >= 0.0 && rt <= 1.0)
    // lift is the rate difference (to the 1e-6 rounding grid)
    assert(math.abs(row.getDouble(6) - (rt - rc)) < 2e-6)
  }

  test("q107: conversion-lag percentiles are ordered and positive") {
    val s = spark
    val row = operators.Behavioral.q107ConversionLag.run(s, sf).head
    assert(row.getLong(0) > 0)
    val (mean, p50, p90, p99, mx) = (row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5))
    assert(p50 > 0 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    assert(mean > 0 && mean <= mx)
  }

  test("q108: weekly trend reconciles with q106's global readout") {
    val s = spark
    val trend = operators.Behavioral.q108FunnelTrend.run(s, sf).cache()
    try {
      val ab = operators.Behavioral.q106AbLift.run(s, sf).head
      // Σweeks == the experiment's exposed/converted totals
      assert(trend.agg(sum("n_exposed")).head.getLong(0) ===
        ab.getLong(0) + ab.getLong(1))
      assert(trend.agg(sum("n_converted")).head.getLong(0) ===
        ab.getLong(2) + ab.getLong(3))
      assert(trend.filter(col("n_converted") > col("n_exposed"))
        .count() === 0)
      assert(trend.filter(col("conv_rate") < 0 || col("conv_rate") > 1)
        .count() === 0)
    } finally trend.unpersist()
  }

  test("q115: weekday shares sum to one and deviations cancel per type") {
    val s = spark
    val out = operators.Temporal.q115WeekdayProfile.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("dow") < 0 || col("dow") > 6).count() === 0)
      val sums = out.groupBy("event_type")
        .agg(sum("share").as("ss"), sum("dev_from_uniform").as("sd"))
      assert(sums.filter(abs(col("ss") - 1.0) > 1e-3).count() === 0)
      assert(sums.filter(abs(col("sd")) > 1e-3).count() === 0)
    } finally out.unpersist()
  }

  test("t24: richness ratios are coherent with the token counts") {
    val s = spark
    val out = operators.TextAnalysis.t24LexicalRichness.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      // types ≤ tokens, hapax ≤ types, and ttr·mean_freq ≈ 1
      assert(out.filter(col("n_types") > col("n_tokens") ||
        col("n_hapax") > col("n_types")).count() === 0)
      assert(out.filter(col("ttr") <= 0 || col("ttr") > 1 ||
        col("hapax_share") < 0 || col("hapax_share") > 1).count() === 0)
      assert(out.filter(abs(col("ttr") * col("mean_freq") - 1.0) > 1e-2)
        .count() === 0)
    } finally out.unpersist()
  }

  test("t23: bands match the flesch thresholds and counts are sane") {
    val s = spark
    val out = operators.TextAnalysis.t23Readability.run(s, sf).cache()
    try {
      assert(out.filter(col("n_words") <= 0).count() === 0)
      assert(out.filter(col("n_sents") < 1).count() === 0)
      val badBand = out.filter(
        (col("flesch") >= 60 && col("band") =!= "easy") ||
        (col("flesch") >= 30 && col("flesch") < 60 &&
          col("band") =!= "medium") ||
        (col("flesch") < 30 && col("band") =!= "hard"))
      assert(badBand.count() === 0)
      // vowel-group runs can never outnumber characters
      val docs = Tables.documents(s, sf).select(col("doc_id"),
        length(col("text")).as("len"))
      assert(out.join(docs, "doc_id")
        .filter(col("n_vgroups") > col("len")).count() === 0)
    } finally out.unpersist()
  }
}

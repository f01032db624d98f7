package graft

import org.apache.spark.sql.functions._

/** Semantics gates for the security-analytics operators (q110 UEBA
  * rarity, q111 beaconing). The oracle rows prove cross-engine
  * agreement; these prove the outputs mean what they claim: rarity
  * scores are positive sums of per-event surprise with a consistent
  * mean, and the beaconing CV is the non-negative scale-free statistic
  * whose ordering the detector ranks by.
  */
class SecuritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q110: rarity scores are positive, ranked, and mean-consistent") {
    val s = spark
    val out = operators.Security.q110RarityScore.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("score_nats") <= 0 ||
        col("n_events") < 1).count() === 0)
      // surprise is −ln(p) with p ≤ 1, so every mean is ≥ 0 and the
      // mean reconstructs score / n to the rounding grid
      assert(out.filter(abs(col("mean_nats") -
        col("score_nats") / col("n_events")) > 1e-3).count() === 0)
      // ranking is by score descending
      val scores = out.select("score_nats").collect().map(_.getDouble(0))
      assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    } finally out.unpersist()
  }

  test("q112: first-seen series covers every pair exactly once") {
    val s = spark
    val out = operators.Security.q112FirstSeen.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      // the series ends at full coverage for every type…
      val last = out.groupBy("event_type")
        .agg(max("cum_new").as("cn"), max("coverage").as("cov"))
      assert(last.filter(abs(col("cov") - 1.0) > 1e-9).count() === 0)
      // …and Σ daily novelty reconstructs the distinct pair count
      val pairs = Tables.events(s, sf)
        .select("user_id", "event_type").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(out.groupBy("event_type").agg(sum("n_new").as("sn"))
        .join(pairs, "event_type")
        .filter(col("sn") =!= col("n")).count() === 0)
    } finally out.unpersist()
  }

  test("q111: beaconing CVs are non-negative and ranked ascending") {
    val s = spark
    val out = operators.Security.q111Beaconing.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("cv") < 0 || col("mean_gap_s") <= 0 ||
        col("n_gaps") < 10).count() === 0)
      val cvs = out.select("cv").collect().map(_.getDouble(0))
      assert(cvs.sameElements(cvs.sorted))
      // synthetic uniform traffic must NOT look like beaconing: no
      // channel ticks with near-constant period (the q99 convention —
      // the detector's finding here is the absence)
      assert(out.filter(col("cv") < 0.2).count() === 0)
    } finally out.unpersist()
  }
}

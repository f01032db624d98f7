package graft

import org.apache.spark.sql.functions._

/** Semantics gates for the time-series / packing / outlier operators
  * (q55 gap fill, q56 OHLC, x06 sequence packing, s07 centroid
  * outliers). The oracle rows prove cross-engine agreement; these prove
  * the outputs mean what they claim: the filled grid is dense and agrees
  * with the observations, candles bound their constituents and conserve
  * the event count, packing conserves every document and token, and the
  * flagged outliers really are the per-label cosine minima.
  */
class AnalyticsInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q55: grid is dense per user and fills agree with observations") {
    val s = spark
    val out = operators.Temporal.q55GapFill.run(s, sf).cache()
    try {
      // dense: per user, rows == max(hr) - min(hr) + 1, no duplicate hr
      val perUser = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"), min("hr").as("mn"), max("hr").as("mx"),
          countDistinct("hr").as("nd"))
      assert(perUser.filter(col("n") =!= col("mx") - col("mn") + 1 ||
        col("n") =!= col("nd")).count() === 0)
      // fills never null (every user has >= 1 observation by construction)
      assert(out.filter(col("v_ffill").isNull || col("v_interp").isNull)
        .count() === 0)
      // at observed points both fills equal the observation (ffill frame
      // includes the current row; interpolation degenerates to the point)
      assert(out.filter(col("observed") === 1 &&
        col("v_ffill") =!= col("v_interp")).count() === 0)
      // interpolation stays within the [prev, next] value envelope, so it
      // can never exceed the user's observed range
      val env = out.filter(col("observed") === 1)
        .groupBy("user_id").agg(min("v_ffill").as("lo"), max("v_ffill").as("hi"))
      assert(out.join(env, "user_id")
        .filter(col("v_interp") < col("lo") - 1e-9 ||
          col("v_interp") > col("hi") + 1e-9).count() === 0)
    } finally out.unpersist()
  }

  test("q56: candles bound their events and conserve the count") {
    val s = spark
    val out = operators.Temporal.q56Ohlc.run(s, sf).cache()
    try {
      assert(out.filter(col("high") < col("low") ||
        col("open") > col("high") || col("open") < col("low") ||
        col("close") > col("high") || col("close") < col("low") ||
        col("mean_value") > col("high") + 1e-9 ||
        col("mean_value") < col("low") - 1e-9).count() === 0)
      val total = Tables.events(s, sf).count()
      assert(out.agg(sum("n_events")).head.getLong(0) === total)
      // open/close really are the first/last event's value in the bucket
      val firsts = Tables.events(s, sf)
        .select(col("event_type"),
          floor(col("ts").cast("long") / 21600).as("bucket"),
          col("ts"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type", "bucket")
            .orderBy(col("ts").asc, col("event_id").asc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("bucket"), col("value").as("expect_open"))
      assert(out.join(firsts, Seq("event_type", "bucket"))
        .filter(col("open") =!= col("expect_open")).count() === 0)
    } finally out.unpersist()
  }

  test("x06: packing conserves documents and tokens") {
    val s = spark
    val out = operators.Curation.x06PackSequences.run(s, sf).cache()
    try {
      val docs = Tables.documents(s, sf)
        .select(size(split(col("text"), " ")).as("tok"))
      assert(out.agg(sum("n_docs")).head.getLong(0) === docs.count())
      assert(out.agg(sum("tokens")).head.getLong(0) ===
        docs.agg(sum("tok")).head.getLong(0))
      // bins start at 0 per shard and fill ratios are positive
      assert(out.groupBy("source").agg(min("bin").as("b"))
        .filter(col("b") =!= 0).count() === 0)
      assert(out.filter(col("fill_ratio") <= 0).count() === 0)
    } finally out.unpersist()
  }

  test("s07: flagged outliers are the per-label cosine minima, z < 0") {
    val s = spark
    val out = operators.Similarity.s07CentroidOutliers.run(s, sf).cache()
    try {
      val perLabel = out.groupBy("label").agg(count(lit(1)).as("n"))
      assert(perLabel.filter(col("n") =!= 5).count() === 0)
      // below-centroid-mean by construction: the 5 lowest cosines sit
      // under the label mean, so every z is negative
      assert(out.filter(col("z") >= 0).count() === 0)
      // ranks order the cosines
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy("rank")
      assert(out.withColumn("prev", lag("cos", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") > col("cos"))
        .count() === 0)
      // rank-1 cosine == global min cosine over the full scored corpus
      val full = operators.Similarity.s07CentroidOutliers.run(s, sf)
      assert(full.filter(col("rank") === 1).count() ===
        full.select("label").distinct().count())
    } finally out.unpersist()
  }
}

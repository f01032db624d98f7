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

  test("m07: interleaved packing conserves docs, images, and tokens") {
    val s = spark
    val out = operators.Multimodal.m07InterleavedPack.run(s, sf).cache()
    try {
      val docs = Tables.documents(s, sf)
        .select(size(split(col("text"), " ")).as("tok"))
      val nDocs = docs.count()
      assert(out.agg(sum("n_docs")).head.getLong(0) === nDocs)
      // exactly one image per document, each costing its fixed budget
      assert(out.agg(sum("n_images")).head.getLong(0) === nDocs)
      assert(out.filter(col("vision_tokens") =!= col("n_images") * 64L)
        .count() === 0)
      assert(out.agg(sum("text_tokens")).head.getLong(0) ===
        docs.agg(sum("tok")).head.getLong(0))
      // the manifest's boundary docs exist and bins start at 0 per shard
      assert(out.filter(col("first_doc_id").isNull ||
        col("last_doc_id").isNull).count() === 0)
      assert(out.groupBy("source").agg(min("bin").as("b"))
        .filter(col("b") =!= 0).count() === 0)
      // fill ≈ (vision + text) / 2048 on every row
      assert(out.filter(abs(col("fill_ratio") -
          (col("vision_tokens") + col("text_tokens")) / lit(2048.0))
        > lit(1e-3)).count() === 0)
    } finally out.unpersist()
  }

  test("q113: pareto curve is monotone and closes at full shares") {
    val s = spark
    val out = operators.Skew.q113Pareto.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      // curve rows are in descending band order; shares grow monotonically
      val rows = out.collect()
      val ps = rows.map(_.getAs[Double]("part_share"))
      val rs = rows.map(_.getAs[Double]("rev_share"))
      assert(ps.sameElements(ps.sorted) && rs.sameElements(rs.sorted))
      // the last row covers everything exactly
      assert(math.abs(ps.last - 1.0) < 1e-9 &&
        math.abs(rs.last - 1.0) < 1e-9)
      // the 80% flag is a threshold: false rows strictly precede true
      val flags = rows.map(_.getAs[Boolean]("covers_80pct"))
      assert(!flags.sliding(2).exists { case Array(a, b) => a && !b })
      assert(flags.last)
      // parts conserve: Σ n_parts == distinct parts in lineitem
      val n = Tables.lineitem(s, sf)
        .select(countDistinct("l_partkey")).head.getLong(0)
      assert(out.agg(sum("n_parts")).head.getLong(0) === n)
    } finally out.unpersist()
  }

  test("q114: Gini is in [0,1) and zero only under perfect equality") {
    val s = spark
    val out = operators.Skew.q114SourceGini.run(s, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("gini") < 0 || col("gini") >= 1).count() === 0)
      // hand-check one source against the rank formula on driver side
      val src = out.head.getString(0)
      val xs = Tables.documents(s, sf).filter(col("source") === src)
        .orderBy(col("n_chars").asc, col("doc_id").asc)
        .select("n_chars").collect().map(_.getLong(0))
      val n = xs.length.toLong
      val num = xs.zipWithIndex.map { case (x, i0) =>
        (2L * (i0 + 1) - n - 1L) * x }.sum
      val expected = num.toDouble / (n * xs.sum)
      val got = out.filter(col("source") === src)
        .head.getDouble(3)
      assert(math.abs(got - expected) < 1e-4, s"$got vs $expected")
    } finally out.unpersist()
  }

  test("d15: cluster-size histogram reconstructs the d03 clustering") {
    val s = spark
    val out = operators.Dedup.d15ClusterSizes.run(s, sf).cache()
    try {
      val lbl = operators.Dedup.minhashClustersCached(s, sf)
      assert(out.agg(sum("docs_covered")).head.getLong(0) === lbl.count())
      assert(out.agg(sum("n_clusters_of_sz")).head.getLong(0) ===
        lbl.select("cluster_id").distinct().count())
      // shares sum to 1 over the histogram
      val shareSum = out.agg(sum("doc_share")).head.getDouble(0)
      assert(math.abs(shareSum - 1.0) < 1e-3)
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

  test("q69: star join matches a hint-free replan of the same predicate") {
    val s = spark
    val out = operators.Relational3.q69StarJoin.run(s, sf).cache()
    try {
      // same query, different join order, no broadcast hints — Catalyst
      // must converge to the same result regardless of the plan we forced
      Tables.registerViews(s, sf)
      val replan = s.sql(
        """SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem
          |JOIN orders   ON l_orderkey = o_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation   ON s_nationkey = n_nationkey
          |JOIN region   ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate <  TIMESTAMP '1997-01-01'
          |GROUP BY 1""".stripMargin)
      assert(out.join(replan, Seq("n_name"), "full_outer")
        .filter(out("n_items") =!= replan("n_items") ||
          out("revenue") =!= replan("revenue")).count() === 0)
      assert(out.count() > 0)
    } finally out.unpersist()
  }

  test("q70: dedup keeps exactly one first-event per bucket, counts conserve") {
    val s = spark
    val out = operators.Relational3.q70EventDedup.run(s, sf).cache()
    try {
      val ev = Tables.events(s, sf)
        .withColumn("bkt", expr("unix_micros(ts) div 600000000"))
      // one survivor per populated (user, type, bucket)
      assert(out.count() ===
        ev.select("user_id", "event_type", "bkt").distinct().count())
      // collapsed counts conserve the log
      assert(out.agg(sum("n_in_bucket")).head.getLong(0) === ev.count())
      // each survivor is its bucket's (ts, event_id) minimum
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type", "bkt")
        .orderBy(col("ts"), col("event_id"))
      val firsts = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("event_id"))
      assert(out.join(firsts, "event_id").count() === out.count())
    } finally out.unpersist()
  }

  test("q71: arg extremes point at rows carrying the group extreme") {
    val s = spark
    val out = operators.Relational3.q71ArgExtremes.run(s, sf).cache()
    try {
      val orders = Tables.orders(s, sf)
      assert(out.agg(sum("n_orders")).head.getLong(0) === orders.count())
      // the named top/bottom orders really carry the reported prices
      val top = out.join(orders,
        col("top_order") === col("o_orderkey"))
        .filter(round(col("o_totalprice"), 2) =!= col("top_price"))
      val bot = out.join(orders,
        col("bottom_order") === col("o_orderkey"))
        .filter(round(col("o_totalprice"), 2) =!= col("bottom_price"))
      assert(top.count() === 0 && bot.count() === 0)
      assert(out.filter(col("top_price") < col("bottom_price")).count() === 0)
    } finally out.unpersist()
  }

  test("q72: regression fit is positive, r2 in range, pairs conserve") {
    val s = spark
    val out = operators.Relational3.q72Regression.run(s, sf).cache()
    try {
      // r2 is a proper coefficient of determination
      assert(out.filter(col("r2") < 0 || col("r2") > 1).count() === 0)
      assert(out.agg(sum("n_pairs")).head.getLong(0) ===
        Tables.lineitem(s, sf).count())
      // OLS identity: slope == covar_pop(y,x) / var_pop(x), recomputed
      // from first principles per group
      val chk = Tables.lineitem(s, sf)
        .groupBy("l_returnflag")
        .agg((covar_pop(col("l_extendedprice"), col("l_quantity")) /
          var_pop(col("l_quantity"))).as("expect_slope"))
      assert(out.join(chk, "l_returnflag")
        .filter(abs(col("slope") - col("expect_slope")) > 1e-3)
        .count() === 0)
    } finally out.unpersist()
  }

  test("q73: integer pagerank conserves mass within floor loss, floors hold") {
    val s = spark
    val out = operators.Graph.q73CopurchaseRank.run(s, sf).cache()
    try {
      val n = out.count()
      // every node keeps at least the teleport floor
      val floor = 150000000000L / n
      assert(out.filter(col("rank_micro") < floor).count() === 0)
      // total mass ≤ 1.0 (floor losses only shrink it) and within 2% of it
      val mass = out.agg(sum("rank_micro")).head.getLong(0)
      assert(mass <= 1000000000000L)
      assert(mass > 980000000000L, s"mass leaked too far: $mass")
      // the reported double rank is the micro-rank, scaled
      assert(out.filter(col("rank") <= 0).count() === 0)
    } finally out.unpersist()
  }

  test("d11: edit verify covers exactly d05's candidate pairs, sim in [0,1]") {
    val s = spark
    val out = operators.Dedup.d11EditVerify.run(s, sf).cache()
    try {
      val cand = operators.Dedup.d05NgramJaccard.run(s, sf)
      assert(out.select("a_id", "b_id").except(
        cand.select("a_id", "b_id")).count() === 0)
      assert(cand.select("a_id", "b_id").except(
        out.select("a_id", "b_id")).count() === 0)
      assert(out.filter(col("edit_sim") < 0 || col("edit_sim") > 1)
        .count() === 0)
      // identical docs would be distance 0; near-dups must beat unrelated
      // text: planted near-dup pairs (high jaccard) have high edit_sim
      assert(out.filter(col("jaccard") >= 0.5 && col("edit_sim") < 0.5)
        .count() === 0)
    } finally out.unpersist()
  }

  test("t13: confusion matrix conserves the corpus, shares normalize") {
    val s = spark
    val out = operators.TextAnalysis.t13LangidConfusion.run(s, sf).cache()
    try {
      // cells conserve the corpus
      assert(out.agg(sum("n")).head.getLong(0) ===
        Tables.documents(s, sf).count())
      // recall shares sum to 1 within each actual class (4dp rounding)
      val byAct = out.groupBy("lang_actual")
        .agg(sum("recall_share").as("s")).collect()
      assert(byAct.forall(r => math.abs(r.getDouble(1) - 1.0) < 0.001),
        byAct.mkString(","))
      // precision shares sum to 1 within each predicted class
      val byPrd = out.groupBy("lang_pred")
        .agg(sum("precision_share").as("s")).collect()
      assert(byPrd.forall(r => math.abs(r.getDouble(1) - 1.0) < 0.001),
        byPrd.mkString(","))
    } finally out.unpersist()
  }

  test("t14: chunks tile every document — full coverage, no redundant tails") {
    val s = spark
    val out = operators.TextAnalysis.t14Chunking.run(s, sf).cache()
    try {
      val docs = Tables.documents(s, sf)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      val spans = out.groupBy("doc_id").agg(
        min("start_tok").as("first"),
        max(col("start_tok") + col("n_tok")).as("covered"),
        count(lit(1)).as("n_chunks"))
      val joined = spans.join(docs, "doc_id").cache()
      // every doc chunked, chunk 0 starts at token 0, last chunk reaches n
      assert(joined.count() === docs.count())
      assert(joined.filter(col("first") =!= 0 || col("covered") =!= col("n")).count() === 0)
      // no chunk fully contained in its predecessor: start_tok < n for all
      assert(out.join(docs, "doc_id")
        .filter(col("chunk_id") > 0 && col("start_tok") >= col("n")).count() === 0)
      joined.unpersist()
    } finally out.unpersist()
  }

  test("q76: z-order files bound both dimensions, time files only one") {
    val s = spark
    val out = operators.Relational3.q76ZorderLayout.run(s, sf).cache()
    try {
      val byLayout = out.groupBy("layout").agg(
        sum(col("n_rows")).as("rows"),
        avg(col("n_types")).as("avg_types"),
        avg(col("minute_span")).as("avg_span")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      // both layouts tile the whole table
      assert(byLayout("zorder")._1 === byLayout("time")._1)
      // the point of z-order: per-file event-type sets are strictly
      // narrower than the time layout's (which sprays all types into
      // every file), while the time span stays bounded (not the full
      // range a type-only sort would give)
      assert(byLayout("zorder")._2 < byLayout("time")._2,
        s"zorder avg_types ${byLayout("zorder")._2} !< time ${byLayout("time")._2}")
      val fullSpan = out.filter(col("layout") === "time")
        .agg(max("minute_span")).head.getLong(0)
      assert(byLayout("zorder")._3 < fullSpan * 32L,
        "zorder files must not each cover the whole time range")
    } finally out.unpersist()
  }

  test("x12: compaction plan conserves docs and bytes, files near target") {
    val s = spark
    val out = operators.Curation.x12CompactionPlan.run(s, sf).cache()
    try {
      val docs = Tables.documents(s, sf)
      assert(out.agg(sum("n_docs")).head.getLong(0) === docs.count())
      assert(out.agg(sum("file_bytes")).head.getLong(0) ===
        docs.agg(sum("n_chars")).head.getLong(0))
      // file count per partition == the ceil(bytes/target) plan
      val planned = out.groupBy("source", "lang")
        .agg(countDistinct("file_id").as("got"), sum("file_bytes").as("b"))
        .withColumn("want", greatest(lit(1L), expr("(b + 1023) div 1024")))
      // hash assignment may leave a planned file empty on tiny
      // partitions, never create extras
      assert(planned.filter(col("got") > col("want")).count() === 0)
    } finally out.unpersist()
  }

  test("t15: datasheet conserves the corpus, entropy bounded by ln(n_langs)") {
    val s = spark
    val out = operators.TextAnalysis.t15CorpusDatasheet.run(s, sf).cache()
    try {
      assert(out.agg(sum("n_docs")).head.getLong(0) ===
        Tables.documents(s, sf).count())
      assert(out.filter(col("lang_entropy") < 0 ||
        col("lang_entropy") > log(col("n_langs")) + 1e-9).count() === 0)
      assert(out.filter(col("median_tokens") > col("p95_tokens")).count() === 0)
    } finally out.unpersist()
  }

  test("x10: pipeline drop reasons partition the corpus, stages agree") {
    val s = spark
    val out = operators.Curation.x10CurationPipeline.run(s, sf).cache()
    try {
      // per-source: kept + dropped-by-reason == docs in
      assert(out.filter(col("n_kept") + col("n_drop_dup") +
        col("n_drop_contam") + col("n_drop_quality") =!= col("n_docs"))
        .count() === 0)
      // totals: every non-bench document is accounted for exactly once
      val nonBench = Tables.documents(s, sf)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1) =!= "0")
      assert(out.agg(sum("n_docs")).head.getLong(0) === nonBench.count())
      // contaminated drops can never exceed x01's contaminated set (x10
      // only counts reps, x01 counts every non-bench doc)
      val x01Contam = operators.Curation.x01Decontaminate.run(s, sf)
        .filter(col("contaminated") === 1).count()
      assert(out.agg(sum("n_drop_contam")).head.getLong(0) <= x01Contam)
      // keep rate is a rate
      assert(out.filter(col("token_keep_rate") < 0 ||
        col("token_keep_rate") > 1).count() === 0)
    } finally out.unpersist()
  }

  test("q81: triangle corners come from the graph, counts bound degree") {
    val s = spark
    val out = operators.Graph.q81Triangles.run(s, sf).cache()
    try {
      assert(out.count() <= 20 && out.count() > 0)
      assert(out.filter(col("n_triangles") <= 0).count() === 0)
      // every reported corner is a real co-purchase node, and its
      // triangle count is bounded by deg*(deg-1)/2 (wedges at the node)
      val li = Tables.lineitem(s, sf)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      val und = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      val deg = und.select(col("u").as("n"))
        .union(und.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val joined = out.join(deg, col("part") === col("n"), "left").cache()
      try {
        assert(joined.filter(col("dg").isNull).count() === 0)
        assert(joined.filter(
          col("n_triangles") > col("dg") * (col("dg") - 1) / 2)
          .count() === 0)
      } finally joined.unpersist()
    } finally out.unpersist()
  }

  test("q82: BFS levels are valid shortest-path prefixes") {
    val s = spark
    val out = operators.Graph.q82BfsLevels.run(s, sf).cache()
    try {
      // levels live in [0, 4]; seeds (and only part%97 nodes) sit at 0
      assert(out.filter(col("level") < 0 || col("level") > 4).count() === 0)
      assert(out.filter(col("level") === 0 && col("part") % 97 =!= 0)
        .count() === 0)
      // triangle inequality on the sparsified edge set: neighbors'
      // levels differ by at most 1 when both are reached
      val li = Tables.lineitem(s, sf)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(countDistinct(col("a.ok")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select("u", "v")
      val lv = out.select(col("part").as("n"), col("level").as("l"))
      val both = pairs
        .join(lv.withColumnRenamed("n", "u").withColumnRenamed("l", "lu"), "u")
        .join(lv.withColumnRenamed("n", "v").withColumnRenamed("l", "lv2"), "v")
      // allow the frontier cutoff: a gap > 1 is only legal if the larger
      // side is exactly the horizon (its true level may be beyond 4)
      assert(both.filter(abs(col("lu") - col("lv2")) > 1 &&
        greatest(col("lu"), col("lv2")) =!= 4).count() === 0)
    } finally out.unpersist()
  }

  test("s11: fused ranking is a valid RRF of the two source rankings") {
    val s = spark
    val out = operators.Similarity.s11HybridRrf.run(s, sf).cache()
    try {
      // 10 fused hits per query, ranks dense 1..10
      val perQ = out.groupBy("qid")
        .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      assert(perQ.filter(col("n") =!= 10 || col("mx") =!= 10).count() === 0)
      // the fused score really is 1/(60+rv) + [1/(60+rl)]
      assert(out.filter(abs(col("rrf") -
        (lit(1.0) / (col("rv") + 60) +
          coalesce(lit(1.0) / (col("rl") + 60), lit(0.0)))) > 1e-4)
        .count() === 0)
      // fused order is monotone in the (recomputed) score per query
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy("rank")
      assert(out.withColumn("prev", lag("rrf", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") < col("rrf") - 1e-9)
        .count() === 0)
      // a doc ranked 1st by BOTH sources must be fused rank 1
      val doubleFirst = out.filter(col("rv") === 1 && col("rl") === 1)
      assert(doubleFirst.filter(col("rank") =!= 1).count() === 0)
    } finally out.unpersist()
  }

  test("m05: segments are disjoint islands of above-threshold frames") {
    val s = spark
    val out = operators.Multimodal.m05VadSegments.run(s, sf).cache()
    try {
      // bounds are sane and consistent with the frame count
      assert(out.filter(col("seg_start") > col("seg_end") ||
        col("n_frames") =!= col("seg_end") - col("seg_start") + 1)
        .count() === 0)
      // every frame in a segment cleared the gate, so the mean did too
      assert(out.filter(col("mean_energy") < 5).count() === 0)
      // segments never overlap or touch within a doc (touching islands
      // would have merged): next start > this end + 1
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("seg_start")
      assert(out.withColumn("nxt", lead("seg_start", 1).over(w))
        .filter(col("nxt").isNotNull && col("nxt") <= col("seg_end") + 1)
        .count() === 0)
      // min-duration gate held
      assert(out.filter(col("n_frames") < 2).count() === 0)
    } finally out.unpersist()
  }

  test("t18: buckets cover every doc, tertiles balanced, head outranks tail") {
    val s = spark
    val out = operators.TextAnalysis.t18PplBuckets.run(s, sf).cache()
    try {
      // every document gets exactly one bucket
      val nDocs = Tables.documents(s, sf).count()
      assert(out.count() === nDocs)
      assert(out.select("doc_id").distinct().count() === nDocs)
      // per language: tertiles within 1 of each other is too strict with
      // value ties, but no bucket may be empty or hold > 60% of the lang
      val byBucket = out.groupBy("lang", "ppl_bucket").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val langs = byBucket.keys.map(_._1).toSet
      langs.foreach { l =>
        val h = byBucket.getOrElse((l, "head"), 0L)
        val m = byBucket.getOrElse((l, "middle"), 0L)
        val t = byBucket.getOrElse((l, "tail"), 0L)
        val tot = h + m + t
        assert(h > 0 && m > 0 && t > 0, s"$l: empty tertile h=$h m=$m t=$t")
        Seq(h, m, t).foreach(b =>
          assert(b.toDouble / tot <= 0.6, s"$l: degenerate split h=$h m=$m t=$t"))
      }
      // ordering semantics: within a language, every head doc's score
      // >= every tail doc's score
      val agg = out.groupBy("lang", "ppl_bucket")
        .agg(min("score").as("mn"), max("score").as("mx"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3))).toMap
      langs.foreach { l =>
        assert(agg((l, "head"))._1 >= agg((l, "tail"))._2,
          s"$l: head min < tail max")
        assert(agg((l, "middle"))._1 >= agg((l, "tail"))._2 - 1e-12)
        assert(agg((l, "head"))._1 >= agg((l, "middle"))._2 - 1e-12)
      }
    } finally out.unpersist()
  }

  test("x15: weights cover the corpus and separate target from raw") {
    val s = spark
    val out = operators.Curation.x15DsirWeights.run(s, sf).cache()
    try {
      val docs = Tables.documents(s, sf)
      assert(out.count() === docs.count())
      // target_like flag consistent with the sign of the exact micro sum
      assert(out.filter((col("weight_micro") > 0) =!=
        (col("target_like") === 1)).count() === 0)
      // the signal separates: src0 docs (the target slice itself) must
      // average a strictly higher weight than the rest of the corpus —
      // if this fails the likelihood ratio is wired backwards
      val j = out.join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy(col("source") === "src0")
        .agg(avg("weight").as("w")).collect()
        .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      assert(j(true) > j(false),
        s"target mean ${j(true)} not above raw mean ${j(false)}")
    } finally out.unpersist()
  }

  test("x16: shards partition the corpus, hash balance holds") {
    val s = spark
    val out = operators.Curation.x16ShardPlan.run(s, sf).cache()
    try {
      val docs = Tables.documents(s, sf)
      val tot = out.agg(sum("n_docs"), sum("n_chars")).collect()(0)
      assert(tot.getLong(0) === docs.count())
      assert(tot.getLong(1) ===
        docs.agg(sum("n_chars")).collect()(0).getLong(0))
      // 32 distinct shards, each non-empty (md5 spread at 500 docs)
      assert(out.count() === 32)
      assert(out.filter(col("n_docs") === 0).count() === 0)
      // hash placement balance: no shard more than 3x the mean chars
      // (binomial spread at n/32 ≈ 16 docs/shard is wide but bounded)
      assert(out.filter(col("balance") > 3.0).count() === 0)
      // diversity: no shard dominated by a single source
      assert(out.filter(col("top_source_share") > 0.8).count() === 0)
    } finally out.unpersist()
  }

  test("x17: agreement classes partition the union of both pair sets") {
    val s = spark
    val out = operators.Curation.x17ModalityAgreement.run(s, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    val nText = operators.Dedup.d05NgramJaccard.run(s, sf).count()
    val nEmb = operators.Dedup.d07EmbeddingPairs.run(s, sf).count()
    def n(c: String) = out.get(c).map(_._1).getOrElse(0L)
    // class counts reconstruct each standalone operator's pair count
    assert(n("both") + n("text_only") === nText,
      s"text classes ${n("both")}+${n("text_only")} != d05 $nText")
    assert(n("both") + n("embedding_only") === nEmb,
      s"embedding classes ${n("both")}+${n("embedding_only")} != d07 $nEmb")
    // a class's scores are present exactly for the modalities it covers
    out.get("text_only").foreach { case (_, j, c) =>
      assert(j.isDefined && c.isEmpty) }
    out.get("embedding_only").foreach { case (_, j, c) =>
      assert(j.isEmpty && c.isDefined) }
    out.get("both").foreach { case (_, j, c) =>
      assert(j.isDefined && c.isDefined) }
  }

  test("m06 CDC chunking: tiles exactly, resyncs after insertion, dedupes shared regions") {
    import operators.Multimodal.chunksOf
    def md5s(b: Array[Byte]) = chunksOf(b).map { case (off, len) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(b, off, len)
      md.digest().map(x => f"$x%02x").mkString
    }
    // deterministic pseudo-random blob
    def blob(seed: Long, n: Int): Array[Byte] = {
      var x = seed
      Array.fill(n) { x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte }
    }
    val b = blob(7L, 2000)
    // 1. chunks tile the blob: contiguous offsets, lengths sum to size
    val ch = chunksOf(b)
    assert(ch.head._1 == 0 && ch.map(_._2).sum == b.length)
    assert(ch.sliding(2).forall {
      case Seq((o1, l1), (o2, _)) => o2 == o1 + l1; case _ => true })
    assert(ch.forall(_._2 <= 256))
    // 2. content-defined resync: inserting ONE byte early leaves most
    //    chunk fingerprints identical (fixed-window chunking loses all)
    val shifted = (b.take(300) :+ 0x55.toByte) ++ b.drop(300)
    val (ha, hb) = (md5s(b), md5s(shifted))
    val shared = ha.toSet.intersect(hb.toSet).size.toDouble / ha.toSet.size
    assert(shared >= 0.6, f"resync too weak: $shared%.2f shared after insert")
    // 3. a region shared between two different blobs dedupes
    val c = blob(99L, 400) ++ b.slice(500, 1200) ++ blob(13L, 400)
    assert(md5s(b).toSet.intersect(md5s(c).toSet).nonEmpty,
      "shared 700-byte region produced no common chunk")
  }
}

package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of the native expressions, and bucketed
  * co-located joins (the at-rest layout that removes the shuffle from
  * repeated fact-fact joins at scale). */
class ExtensionsSpec extends SparkSpec {

  test("cosine_similarity and dot_product are callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
  }

  test("partitioned writes prune: a type filter reads only its directory") {
    val s = spark
    val out = tmpDir("part_events")
    val events = Tables.events(s, "/root/testdata/sf0.001")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val one = s.read.parquet(out).filter(col("event_type") === "click")
      .select(col("event_id"))
    val plan = one.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not PushedFilters (row-group skipping) — at 100 TB that is the
    // difference between listing one partition and scanning them all
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning in:\n${plan.take(900)}")
    assert(one.count() ===
      events.filter(col("event_type") === "click").count())
  }

  test("dynamic partition pruning: a dim-side filter prunes fact dirs at runtime") {
    val s = spark
    import s.implicits._
    val factDir = tmpDir("dpp_fact")
    val dimDir = tmpDir("dpp_dim")
    val events = Tables.events(s, "/root/testdata/sf0.001")
    events.write.mode("overwrite").partitionBy("event_type").parquet(factDir)
    // dim carries an attribute the filter hits — the partition keys to
    // keep are only known AFTER the dim scan runs, so static pruning
    // can't apply and the optimizer must inject a runtime DPP filter
    Seq(("click", "funnel"), ("view", "funnel"), ("purchase", "revenue"),
      ("login", "auth"), ("logout", "auth"))
      .toDF("event_type", "family").write.mode("overwrite").parquet(dimDir)

    val fact = s.read.parquet(factDir)
    val dim = s.read.parquet(dimDir).filter(col("family") === "revenue")
    val joined = fact.join(dim, "event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val plan = joined.queryExecution.executedPlan.toString
    // at 100 TB this is the TPC-DS star-join saver: the fact scan lists
    // only the partitions the filtered dim admits, at runtime
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a runtime partition-pruning subquery in:\n${plan.take(1200)}")
    assert(joined.head.getLong(0) ===
      events.filter(col("event_type") === "purchase").count())
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val s = spark
    import s.implicits._
    val wh = tmpDir("warehouse") // external-table paths; warehouse conf is static
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables.orders(s, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.lineitem(s, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    // disable broadcast so the join must pick a non-broadcast strategy;
    // bucketing should then satisfy the distribution with ZERO exchanges
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("b_orders").join(s.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not re-shuffle join keys:\n${plan.take(1200)}")
      assert(joined.collect().map(_.getLong(1)).sum == 6000L)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("archive DSv2: predicates reach the reader and prune whole splits") {
    val s = spark
    val full = s.read.format("graft.connectors.ArchiveSource").load()
    val filtered = full
      .filter(col("event_type") === "click" &&
        col("event_id") >= 10000L && col("event_id") < 60000L)
      .select("day")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("ArchiveScan pushed=["),
      s"scan description missing pushdown evidence:\n${p.take(600)}")
    assert(p.contains("event_id"), "id-range predicates must be pushed")
    // partition pruning: [10000, 60000) over 8×12500-wide splits → 5
    assert(filtered.rdd.getNumPartitions == 5,
      s"expected 5 pruned splits, got ${filtered.rdd.getNumPartitions}")
    assert(full.rdd.getNumPartitions == 8, "unfiltered scan plans all 8")
    // pushdown changes the plan, never the answer
    val pushed = filtered.count()
    val post = full.collect().count(r =>
      r.getString(2) == "click" && r.getLong(0) >= 10000L &&
        r.getLong(0) < 60000L)
    assert(pushed == post, s"pushdown changed the result: $pushed vs $post")
    // column pruning reaches the reader's projection
    assert(filtered.columns.sameElements(Array("day")))
  }

  test("archive DSv2: global count/min/max push into the aggregate scan") {
    val s = spark
    val agg = SparkEntry.queries("q142_archive_agg_pushdown")(s, "")
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("ArchiveAggScan pushedAgg=[count, min_id, max_id]"),
      s"aggregates not pushed:\n${p.take(800)}")
    // partial pushdown: Spark must still merge the per-split rows
    assert(p.contains("sum(") || p.contains("partial_sum"),
      "merge-side sum over split counts missing")
    // answered by modular arithmetic, verified against the ROW path
    // (a plain projection scan cannot trigger aggregate pushdown)
    val r = agg.head
    val ids = s.read.format("graft.connectors.ArchiveSource").load()
      .filter(col("event_type") === "view" &&
        col("event_id") >= 5000L && col("event_id") < 95000L)
      .select("event_id").collect().map(_.getLong(0))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      (ids.length.toLong, ids.min, ids.max))
    // a grouping the source can't answer (user_id) must fall back
    val grouped = s.read.format("graft.connectors.ArchiveSource").load()
      .groupBy("user_id").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("ArchiveAggScan"), "unsupported grouping should fall back")
    assert(grouped.count() == 997L)
  }

  test("archive DSv2: GROUP BY event_type pushes into the aggregate scan") {
    val s = spark
    val agg = SparkEntry.queries("q144_archive_group_pushdown")(s, "")
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("ArchiveAggScan") && p.contains("groupBy=[event_type]"),
      s"grouped aggregates not pushed:\n${p.take(800)}")
    // verified against the ROW path (projection scans can't push aggs)
    val rows = s.read.format("graft.connectors.ArchiveSource").load()
      .filter(col("event_id") >= 20000L && col("event_id") < 80000L)
      .select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) =>
        (t, (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max))
      }
    val pushedRes = agg.collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(pushedRes == rows, s"grouped pushdown diverges from row scan")
  }

  test("archive DSv2: LIMIT pushes totally — scan emits exactly n rows") {
    val s = spark
    val limited = s.read.format("graft.connectors.ArchiveSource").load()
      .filter(col("event_type") === "purchase" &&
        col("event_id") >= 20000L && col("event_id") < 80000L)
      .limit(1000)
    val p = limited.queryExecution.executedPlan.toString
    assert(p.contains("limit=[1000]"),
      s"limit not pushed into the scan:\n${p.take(800)}")
    // TOTAL push: the source's truncated ranges contain exactly the
    // 1000 smallest matching ids — provable because the full-push
    // contract says Spark may drop its own limit
    val ids = limited.select("event_id").collect().map(_.getLong(0))
    assert(ids.length == 1000, s"scan emitted ${ids.length} rows")
    val expected = (20000L until 80000L)
      .filter(id => ((id % 5L) * 3L) % 5L == 2L).take(1000)
    assert(ids.sorted.sameElements(expected),
      "limit pushdown must keep the smallest matching ids")
    // a limit the data can't fill is NOT an error: all matches survive
    val tiny = s.read.format("graft.connectors.ArchiveSource").load()
      .filter(col("event_type") === "purchase" &&
        col("event_id") >= 20000L && col("event_id") < 20020L)
      .limit(1000)
    assert(tiny.count() == 4L)
  }

  test("archive DSv2: ORDER BY event_id DESC LIMIT pushes as top-N") {
    val s = spark
    val top = s.read.format("graft.connectors.ArchiveSource").load()
      .filter(col("event_type") === "error" && col("event_id") < 70000L)
      .orderBy(col("event_id").desc)
      .limit(500)
    val p = top.queryExecution.executedPlan.toString
    assert(p.contains("topN=[500 desc event_id]"),
      s"top-N not pushed into the scan:\n${p.take(800)}")
    // partial push: Spark's TakeOrdered still runs, but over ≤500 rows
    val ids = top.select("event_id").collect().map(_.getLong(0))
    val expected = (0L until 70000L)
      .filter(id => ((id % 5L) * 3L) % 5L == 4L).takeRight(500).reverse
    assert(ids.sameElements(expected),
      "top-N pushdown must keep the largest matching ids, descending")
    // ascending variant walks the ranges from the front
    val asc = s.read.format("graft.connectors.ArchiveSource").load()
      .filter(col("event_type") === "error")
      .orderBy(col("event_id").asc).limit(100)
    assert(asc.queryExecution.executedPlan.toString
      .contains("topN=[100 asc event_id]"))
    val ascIds = asc.select("event_id").collect().map(_.getLong(0))
    assert(ascIds.sameElements(
      (0L until 100000L).filter(id => ((id % 5L) * 3L) % 5L == 4L)
        .take(100)))
    // an order the source can't serve (user_id) must fall back cleanly
    val fb = s.read.format("graft.connectors.ArchiveSource").load()
      .orderBy(col("user_id").desc).limit(10)
    assert(!fb.queryExecution.executedPlan.toString.contains("topN=["),
      "unsupported sort column must not push")
    assert(fb.collect().length == 10)
  }

  test("archive DSv2: key-grouped layout plans the groupBy with zero exchange") {
    // SupportsReportPartitioning — the last rung of the connector
    // ladder: layout=by_type plans one split per event_type and
    // declares the clustering (HasPartitionKey + KeyGroupedPartitioning),
    // so a groupBy(event_type) aggregation needs NO shuffle at all —
    // the DSv2 analog of a bucketed table.
    val s = spark
    val prev = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      .getOrElse("false")
    try {
      val agg = SparkEntry.queries("q194_archive_keygrouped")(s, "")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("ArchiveTypeScan"),
        s"by_type layout not planned:\n${plan.take(600)}")
      assert(!plan.contains("Exchange hashpartitioning(event_type"),
        s"key-grouped groupBy must not shuffle:\n${plan.take(1200)}")
      // declared clustering is REAL: 5 splits, each exactly its type's
      // rows, together covering each id once
      val byType = s.read.format("graft.connectors.ArchiveSource")
        .option("layout", "by_type").load()
      assert(byType.rdd.getNumPartitions == 5)
      assert(byType.count() == 100000L)
      // the elided exchange never changes the answer: same aggregation
      // through the default range layout (which must shuffle)
      val viaRange = s.read.format("graft.connectors.ArchiveSource").load()
        .filter(col("event_id") >= 10000L && col("event_id") < 90000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(round(value * 1000) as bigint)")).as("vm_sum"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
      val k = (r: org.apache.spark.sql.Row) => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(agg.collect().map(k).toMap == viaRange.collect().map(k).toMap,
        "key-grouped aggregation diverges from the shuffled path")
      // with the bucketing conf OFF the declaration is ignored and the
      // exchange comes back — pinning that the elision came from the
      // reported partitioning, not from something else in the plan
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = s.read.format("graft.connectors.ArchiveSource")
        .option("layout", "by_type").load()
        .groupBy("event_type").agg(
          sum(expr("cast(round(value * 1000) as bigint)")).as("vm_sum"))
      assert(off.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning(event_type"),
        "with v2 bucketing disabled the groupBy must shuffle")
      // a pushed type filter prunes whole type-splits at planning time
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val one = s.read.format("graft.connectors.ArchiveSource")
        .option("layout", "by_type").load()
        .filter(col("event_type") === "view")
      assert(one.rdd.getNumPartitions == 1,
        "type filter must prune to the one matching type-split")
      assert(one.count() == 20000L)
      // the all-pruned edge (round-9 ADVICE): a type filter matching
      // NO type, or an empty id range, must not declare a
      // zero-partition KeyGroupedPartitioning — the scan reports
      // UnknownPartitioning(0) instead, and grouping over it still
      // plans and returns empty
      val none = s.read.format("graft.connectors.ArchiveSource")
        .option("layout", "by_type").load()
        .filter(col("event_type") === "no_such_type")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(none.collect().isEmpty,
        "all-pruned type scan must aggregate to zero rows")
      val emptyRange = s.read.format("graft.connectors.ArchiveSource")
        .option("layout", "by_type").load()
        .filter(col("event_id") >= 90000L && col("event_id") < 10000L)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(emptyRange.collect().isEmpty,
        "empty-id-range type scan must aggregate to zero rows")
    } finally {
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", prev)
    }
  }

  test("archive DSv2: reported ordering elides the per-partition sort") {
    // SupportsReportOrdering: splits emit ascending event_id, so a
    // sortWithinPartitions("event_id") above the scan is satisfied by
    // the reported ordering and plans with NO Sort node — the DSv2
    // analog of parquet files whose writer recorded the sort columns.
    val s = spark
    val sorted = s.read.format("graft.connectors.ArchiveSource").load()
      .sortWithinPartitions("event_id").select("event_id")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort ["),
      s"reported ordering should elide the sort:\n${plan.take(900)}")
    // the claim is true: every partition really is ascending
    val asc = sorted.rdd.mapPartitions { it =>
      val ids = it.map(_.getLong(0)).toArray
      Iterator.single(ids.sameElements(ids.sorted))
    }.collect()
    assert(asc.forall(identity), "a split emitted out-of-order ids")
    // an ordering the source does NOT report still plans a real sort
    val other = s.read.format("graft.connectors.ArchiveSource").load()
      .sortWithinPartitions("user_id").select("user_id")
    assert(other.queryExecution.executedPlan.toString.contains("Sort ["),
      "unreported ordering must keep the sort")
  }

  test("archive DSv2: runtime filtering (DPP analog) prunes splits at execution") {
    // a selective dim joined on event_id: Spark executes the dim first
    // and hands the observed key set to the scan (SupportsRuntimeFiltering)
    // BEFORE partitions plan — splits without a candidate key are never
    // read. The dim must NOT be a LocalRelation (ConvertToLocalRelation
    // folds the filter away and DPP sees no selective predicate).
    val s = spark
    def dim = s.range(0L, 100000L).select(col("id").as("k"))
      .filter(col("k") < 10000L && col("k") % 999L === 0L)
    def fact = s.read.format("graft.connectors.ArchiveSource").load()

    val j = fact.join(broadcast(dim), col("event_id") === col("k"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression(event_id"),
      s"runtime filter not injected:\n${p.take(900)}")

    graft.connectors.ArchiveSource.lastPlannedSplits.set(-1)
    val got = j.select("event_id").collect().map(_.getLong(0)).sorted
    // all 11 keys live in split [0, 12500) — 7 of 8 splits pruned
    assert(graft.connectors.ArchiveSource.lastPlannedSplits.get() == 1,
      s"expected 1 surviving split, planned " +
        s"${graft.connectors.ArchiveSource.lastPlannedSplits.get()}")
    val expected = (0L until 10000L by 999L).toArray
    assert(got.sameElements(expected), "pruning changed the join result")

    // pruning is an optimization, never a semantics change: the same
    // join with runtime filtering disabled returns identical rows and
    // carries no dynamic filter. (Catalyst may STILL statically prune —
    // InferFiltersFromConstraints propagates the dim's k < 10000 onto
    // event_id through the join equality — which is the correct
    // static-analysis behavior, so split count is not asserted here.)
    val prev = s.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try {
      s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      val off = fact.join(broadcast(dim), col("event_id") === col("k"))
      assert(!off.queryExecution.executedPlan.toString
        .contains("dynamicpruningexpression"),
        "dynamic filter must not inject when DPP is disabled")
      val full = off.select("event_id").collect().map(_.getLong(0)).sorted
      assert(full.sameElements(expected))
    } finally {
      s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
    }
  }

  test("archive DSv2: a partially-decoded runtime In-set disables pruning") {
    // If any In-value fails to decode to a Long key, pruning on the
    // decoded subset could drop splits holding the undecoded keys — a
    // false-negative prune SupportsRuntimeFiltering forbids. The scan
    // must fall back to NO pruning (always sound: the join re-checks).
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("event_id", LongType)))
    def scan() = new graft.connectors.ArchiveScan(
      100000L, 8, Array.empty, schema)
    val baseline = scan().planInputPartitions().length
    assert(baseline == 8, s"expected 8 unpruned splits, got $baseline")

    val clean = scan()
    clean.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("event_id",
        Array[Any](java.lang.Long.valueOf(5L)))))
    assert(clean.planInputPartitions().length == 1,
      "a fully-decoded single-key set must prune to its one split")

    val mixed = scan()
    mixed.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("event_id",
        Array[Any](java.lang.Long.valueOf(5L), "not-a-key"))))
    assert(mixed.planInputPartitions().length == baseline,
      "a partially-decoded key set must disable pruning, not prune " +
        "on the decoded subset")

    // an empty decodable set is also a full-decode: empty In = no rows
    // can match, pruning everything is sound and expected
    val empty = scan()
    empty.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("event_id", Array[Any]())))
    assert(empty.planInputPartitions().length <= 1,
      "an empty In-set may prune everything (no key can match)")
  }
}

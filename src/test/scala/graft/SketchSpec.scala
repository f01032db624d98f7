package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Gates for the two sketch operators (Skew.scala q66/q67) whose inner
  * summaries are engine-specific: the Misra-Gries frequency guarantees
  * and the HLL rollup's accuracy/consistency. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------- Misra-Gries
  test("misra-gries keeps every item above n/(k+1) and undercounts by <= n/(k+1)") {
    val s = spark
    import s.implicits._
    // adversarial skew: item i repeated ~2^(12-i) times, plus a uniform
    // tail far wider than k — forces constant compaction
    val stream = (0 to 11).flatMap(i => Seq.fill(1 << (12 - i))(s"hot_$i")) ++
      (0 until 6000).map(i => s"tail_${i % 3000}")
    val n = stream.length.toLong
    val k = 64
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    // shuffle the stream across partitions so merges see interleaved data
    val summary = stream.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % n }.map(_._1)
      .toDF("item").repartition(8)
      .agg(mg(col("item"))).as[Map[String, Long]].head()

    assert(summary.size <= k)
    val bound = n / (k + 1) // D <= n/(k+1)
    exact.foreach { case (item, c) =>
      if (c > bound)
        assert(summary.contains(item), s"guaranteed item $item (count $c) evicted")
    }
    summary.foreach { case (item, est) =>
      val c = exact(item)
      assert(est <= c, s"$item overestimated: $est > $c")
      assert(c - est <= bound, s"$item undercount ${c - est} > bound $bound")
    }
  }

  test("q66 output == exact trigram heavy hitters (candidate set is sufficient)") {
    val df = SparkEntry.queries("q66_heavy_hitters")(spark, sf)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 16384
    val grams = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFunctions.shinglesAll(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("gram"))
    val n = grams.count()
    val exact = grams.groupBy("gram").count()
      .filter(col("count") * (k + 1) > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, s"q66 diverges from exact: " +
      s"missing=${(exact.keySet -- got.keySet).take(3)} " +
      s"extra=${(got.keySet -- exact.keySet).take(3)}")
    assert(got.nonEmpty)
  }

  // -------------------------------------------------------- HLL rollup
  test("q67 union estimates within 2% of exact distinct users per type") {
    val est = SparkEntry.queries("q67_sketch_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val e = est(t)
      assert(math.abs(e - n).toDouble / n < 0.02,
        s"$t: estimate $e vs exact $n (${math.abs(e - n).toDouble / n})")
    }
  }

  test("q67 daily-sketch union == direct sketch over the full range") {
    val viaUnion = SparkEntry.queries("q67_sketch_rollup")(spark, sf)
      .select("event_type", "est_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .cast("long").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaUnion == direct,
      s"union-of-daily vs direct sketch diverge: $viaUnion vs $direct")
  }

  test("q93 inclusion-exclusion overlap tracks the exact click∩purchase set") {
    val s = spark
    val est = SparkEntry.queries("q93_sketch_overlap")(s, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val DayUs = 86400000000L
    val exact = Tables.events(s, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select((unix_micros(col("ts")) / DayUs).cast("long").as("day"),
        col("event_type"), col("user_id"))
      .groupBy("day", "user_id")
      .agg(count_distinct(col("event_type")).as("nt"))
      .filter(col("nt") === 2)
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // days with zero true overlap are absent from `exact` but still
    // estimated (as ≈0) — default them in rather than requiring key match
    assert(exact.keySet.subsetOf(est.keySet))
    est.foreach { case (day, e) =>
      val n = exact.getOrElse(day, 0L)
      // differenced estimate: error budget is the sum of the three
      // sketches' relative errors on the LARGER sets, so gate on the
      // union size, not the (small) intersection
      val slack = math.max(0.05 * n, 8.0)
      assert(math.abs(e - n) <= slack,
        s"day $day: estimate $e vs exact $n (slack $slack)")
    }
  }

  test("q86 approx quantiles honor the GK rank-error guarantee per group") {
    import org.apache.spark.sql.functions._
    val s = spark
    val out = operators.Skew.q86QuantileSketch.run(s, sf).collect()
    assert(out.nonEmpty)
    val orders = Tables.orders(s, sf)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    // GK guarantee: the returned value's RANK is within n/accuracy of
    // the target rank; allow one extra rank for boundary semantics
    val eps = 1.0 / 10000
    out.foreach { r =>
      val grp = r.getString(0)
      val vals = orders(grp)
      val n = vals.length
      assert(r.getLong(7) === n.toLong)
      Seq((r.getDouble(1), 0.5), (r.getDouble(2), 0.9), (r.getDouble(3), 0.99))
        .foreach { case (approx, q) =>
          val rankAtOrBelow = vals.count(_ <= approx).toDouble / n
          val rankBelow = vals.count(_ < approx).toDouble / n
          val slack = eps + 1.0 / n
          assert(rankBelow <= q + slack && rankAtOrBelow >= q - slack,
            f"$grp q=$q: approx $approx%.2f has rank window " +
              f"[$rankBelow%.4f, $rankAtOrBelow%.4f], outside ±$slack%.4f")
        }
      // exact columns must bracket sanely too: p50 <= p90 <= p99
      assert(r.getDouble(4) <= r.getDouble(5) && r.getDouble(5) <= r.getDouble(6))
    }
  }

  // ------------------------------------------------- HLL approx distinct
  test("q27 approx distinct within 2% of exact distinct parts per flag") {
    val est = SparkEntry.queries("q27_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (f, n) =>
      val e = est(f)
      assert(math.abs(e - n).toDouble / n < 0.02,
        s"$f: estimate $e vs exact $n (${math.abs(e - n).toDouble / n})")
    }
  }

  // ------------------------------------------------- HyperBall ANF q164
  test("q164 HyperBall ball-2 estimates track q163 exact counts") {
    // q163 excludes self; the sketch ball includes it — compare vs n+1
    val exact = SparkEntry.queries("q163_two_hop")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) + 1L)).toMap
    val est = SparkEntry.queries("q164_anf_sketch")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, "node sets diverge")
    assert(est.nonEmpty)
    val relErrs = exact.map { case (node, n) =>
      math.abs(est(node) - n) / n.toDouble
    }
    val mean = relErrs.sum / relErrs.size
    // lgK=14 gives ~0.8% sigma; small balls are EXACT in sparse mode
    assert(mean < 0.02, f"mean relative error $mean%.4f >= 2%%")
    assert(relErrs.max < 0.10, f"max relative error ${relErrs.max}%.4f >= 10%%")
  }

  // -------------------------------------------- harmonic centrality q180
  test("q180 r<=2 harmonic truncation tracks the exact two-hop harmonic") {
    val s = spark
    // exact degree over the same sparsified (>=2-shared-orders) graph
    val li = Tables.lineitem(s, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(countDistinct(col("a.ok")).as("n_ord"))
      .filter(col("n_ord") >= 2)
    val deg = pairs.select(col("u").as("n")).union(
        pairs.select(col("v").as("n")))
      .groupBy("n").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoHop = SparkEntry.queries("q163_two_hop")(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = SparkEntry.queries("q180_harmonic_centrality")(s, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(est.length == 20)
    val relErrs = est.map { case (part, r1, r2, _) =>
      val d = deg(part).toDouble
      val exact = d + (twoHop(part) - d) / 2.0
      math.abs((r1 + r2 / 2.0) - exact) / exact
    }
    val mean = relErrs.sum / relErrs.size
    assert(mean < 0.03, f"mean relative error $mean%.4f >= 3%%")
    // the ranking surfaces genuinely high-reach nodes: every top-20
    // pick must beat the exact-harmonic median
    val allExact = twoHop.map { case (p, n2) =>
      val d = deg(p).toDouble; d + (n2 - d) / 2.0
    }.toSeq.sorted
    val median = allExact(allExact.size / 2)
    est.foreach { case (part, r1, r2, _) =>
      val d = deg(part).toDouble
      val exact = d + (twoHop(part) - d) / 2.0
      assert(exact >= median, s"top-20 pick $part below median reach")
    }
  }
}

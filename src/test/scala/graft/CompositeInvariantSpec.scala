package graft

import org.apache.spark.sql.functions._

/** Cross-column invariant gates for the association/bridge/allocation
  * family — relationships the DuckDB hash-match can't see because both
  * engines would violate them identically if the FORMULA were wrong
  * (the oracle proves the two engines agree, these prove the math
  * means what the scaladoc claims). */
class CompositeInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q116: pair counts bounded by marginals; support below confidence") {
    val rows = SparkEntry.queries("q116_basket_lift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nab, na, nb, nbk, supp, conf) =>
      assert(a < b, "pairs must be canonical a < b")
      assert(nab <= math.min(na, nb), s"($a,$b) co-count exceeds a marginal")
      assert(na <= nbk && nb <= nbk, "marginal exceeds basket count")
      assert(supp <= conf + 1e-9, "support cannot exceed confidence")
    }
  }

  test("q117: outlier counts within n; shares consistent") {
    val rows = SparkEntry.queries("q117_mad_outliers")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, out, share) =>
      assert(out >= 0L && out <= n, s"$et outliers outside [0, n]")
      assert(math.abs(share - out.toDouble / n) < 1e-5,
        s"$et share inconsistent with counts")
    }
  }

  test("q118: the bridge identity holds — delta == volume + price effect") {
    val rows = SparkEntry.queries("q118_price_volume_bridge")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (brand, delta, vol, price) =>
      // exact identity up to the three independent cent-roundings
      assert(math.abs(delta - (vol + price)) <= 0.02,
        s"$brand bridge does not reconcile: $delta vs ${vol + price}")
    }
  }

  test("q121: each model's credit shares close to 1; touch counts agree") {
    val rows = SparkEntry.queries("q121_multitouch_attribution")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (model, grp) =>
      val shareSum = grp.map(_._4).sum
      assert(math.abs(shareSum - 1.0) < 1e-5,
        s"$model shares sum to $shareSum")
    }
    val touchTotals = rows.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    assert(touchTotals.values.toSet.size == 1,
      s"models disagree on the touch count: $touchTotals")
  }

  test("q123: dau never exceeds mau; stickiness in (0, 1]") {
    val rows = SparkEntry.queries("q123_dau_mau")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, dau, mau, st) =>
      assert(dau <= mau, s"day $day: dau $dau > mau $mau")
      assert(st > 0.0 && st <= 1.0 + 1e-9, s"day $day stickiness $st")
    }
  }

  test("q124: residuals reconcile; half-life matches the slope") {
    val rows = SparkEntry.queries("q124_retention_decay")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, ret, fitted, resid, slope, hl) =>
      assert(math.abs(resid - (ret - fitted)) < 1e-5,
        s"offset $k residual does not reconcile")
      assert(slope < 0.0, "retention must decay")
      assert(hl > 0.0, "half-life must be positive")
    }
    // half_life = -ln2/slope within rounding of both displays
    val (s0, h0) = (rows.head._5, rows.head._6)
    assert(math.abs(h0 - (-math.log(2.0) / s0)) / h0 < 0.02,
      "half-life inconsistent with slope")
  }

  test("x19: waterfill exhausts the budget up to per-source floors") {
    val rows = SparkEntry.queries("x19_token_budget")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    val supply = rows.map(_._2).sum
    val alloc = rows.map(_._3).sum
    val budget = supply * 2 / 5
    assert(alloc <= budget, "allocation exceeds the budget")
    assert(budget - alloc < rows.length,
      "waterfill left more than the floor dust on the table")
    rows.foreach { case (src, sup, al, funded) =>
      assert(al <= sup, s"$src allocated beyond supply")
      assert(funded == (al == sup), s"$src funded flag inconsistent")
    }
  }

  test("x21: post-dedup volumes shrink; pre shares close to 1") {
    val rows = SparkEntry.queries("x21_post_dedup_rebalance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, dPre, dPost, cPre, cPost, _) =>
      assert(dPost <= dPre && cPost <= cPre, s"$src grew under dedup")
    }
    val shareSum = rows.map(_._6).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"pre shares sum to $shareSum")
  }

  test("q120: the 3-core nests inside the 2-core and is denser") {
    val rows = SparkEntry.queries("q120_kcore")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2, 3))
    val Seq(c2, c3) = rows.toSeq
    assert(c3._2 <= c2._2 && c3._3 <= c2._3,
      "3-core must be a subgraph of the 2-core")
    if (c3._2 >= 2) assert(c3._4 >= c2._4 - 1e-9,
      "peeling must not reduce density")
  }

  test("d16: kept set equals vectors with no lower-id close neighbor") {
    val out = SparkEntry.queries("d16_semantic_prune")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (v, kept, by) =>
      assert(kept == (by < 0L), s"vec $v flag inconsistent with witness")
      if (by >= 0L) assert(by < v, s"vec $v pruned by a HIGHER id $by")
    }
    assert(out.exists(_._2), "prune removed everything")
  }

  // ------------------------------------------------ round-7 statistics

  test("q137: PSI contributions are nonnegative and sum to the total") {
    // (p−q) and ln(p/q) always share sign, so every smoothed bin
    // contribution must be >= 0 (up to micro rounding) — a formula
    // property both engines would violate identically if miscoded
    val rows = SparkEntry.queries("q137_psi_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, tn, sn, contrib, _) =>
      assert(tn >= 0L && sn >= 0L)
      assert(contrib >= -1L, s"$et negative PSI contribution $contrib")
    }
    rows.groupBy(_._1).foreach { case (et, cells) =>
      val total = cells.head._5
      assert(cells.map(_._4).sum == total,
        s"$et psi_micro != sum of contributions")
      assert(total >= -cells.length, s"$et negative total PSI")
    }
  }

  test("q138: bootstrap CI brackets the point estimate; se positive") {
    val rows = SparkEntry.queries("q138_bootstrap_ci")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, mean, se, lo, hi) =>
      assert(n > 0L)
      assert(lo <= hi, s"$et CI inverted")
      // the resample distribution centers on the sample mean; at this
      // n the percentile CI must bracket it
      assert(lo <= mean && mean <= hi,
        s"$et mean $mean outside CI [$lo, $hi]")
      assert(se >= 0.0 && se < mean, s"$et implausible se $se")
    }
  }

  test("q139: interpolation lies within its bracket values and gaps") {
    val s = spark
    val rows = SparkEntry.queries("q139_interp_join")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, back, fwd, v) =>
      assert(back >= 0L && fwd >= 0L, s"event $id negative bracket gap")
      assert(!v.isNaN, s"event $id NaN interpolation")
    }
    // linear interpolation never leaves the corpus value range
    val (lo, hi) = (0.0, Tables.events(s, sf).agg(max("value"))
      .head.getDouble(0) + 1e-6)
    rows.foreach { case (id, _, _, v) =>
      assert(v >= lo && v <= hi, s"event $id interp $v escapes range")
    }
  }

  test("q140: CUPED preserves the pooled mean and reduces variance") {
    val rows = SparkEntry.queries("q140_cuped_lift")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == 2, "exactly two arms")
    val n = rows.map(_._2).sum.toDouble
    val pooledPost = rows.map(r => r._2 * r._4).sum / n
    val pooledAdj = rows.map(r => r._2 * r._5).sum / n
    // θ·(x − x̄) sums to zero over the pooled population
    assert(math.abs(pooledPost - pooledAdj) < 2e-4,
      s"CUPED shifted the pooled mean: $pooledPost vs $pooledAdj")
    rows.foreach { case (arm, _, _, _, _, theta, vr) =>
      assert(theta == rows.head._6 && vr == rows.head._7,
        s"arm $arm sees different pooled scalars")
      assert(vr >= 0.0 && vr < 1.0, s"variance reduction $vr outside [0,1)")
    }
  }

  test("q141: distribution functions coherent within each partition") {
    val rows = SparkEntry.queries("q141_rank_battery")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getInt(3), r.getInt(4),
        r.getDouble(5), r.getDouble(6), r.getInt(7)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, part) =>
      val sorted = part.sortBy(_._3)
      assert(sorted.head._3 == 1 && sorted.head._5 == 0.0,
        s"$et first row must have rank 1, percent_rank 0")
      assert(sorted.last._6 == 1.0, s"$et last cume_dist must be 1")
      sorted.foreach { case (_, _, rnk, drnk, prank, cdist, q4) =>
        assert(drnk <= rnk, "dense_rank exceeds rank")
        assert(prank >= 0.0 && prank <= 1.0)
        assert(cdist > 0.0 && cdist <= 1.0)
        assert(q4 >= 1 && q4 <= 4)
      }
      // counts must be nonincreasing along the rank order
      val ns = sorted.map(_._2)
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"$et rank order violates n DESC")
    }
  }

  test("q145: decomposition reassembles — mi == trend + seasonal + residual") {
    val rows = SparkEntry.queries("q145_seasonal_decompose")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, day, mi, trend, seas, resid) =>
      val rebuilt = trend + seas + resid
      assert(math.abs(mi / 1000.0 - rebuilt) < 2e-3,
        s"$et day $day: ${mi / 1000.0} != $trend + $seas + $resid")
    }
  }

  test("q143: survival curve is monotone nonincreasing within [0, 1]") {
    val rows = SparkEntry.queries("q143_survival_km")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_._1)
    sorted.foreach { case (t, nRisk, d, c, sHat) =>
      assert(d + c <= nRisk, s"t=$t more events+censors than at risk")
      assert(sHat >= 0.0 && sHat <= 1.0, s"t=$t s_hat $sHat outside [0,1]")
    }
    val ss = sorted.map(_._5)
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b - 1e-9 },
      "survival increased over time")
    // risk sets telescope: n_{i+1} = n_i - d_i - c_i
    sorted.zip(sorted.tail).foreach { case ((_, n1, d1, c1, _),
        (t2, n2, _, _, _)) =>
      assert(n2 == n1 - d1 - c1, s"risk set broken at t=$t2")
    }
  }

  test("x24: allocations sum exactly to the budget; within 1 of proportional") {
    val rows = SparkEntry.queries("x24_largest_remainder")(spark, sf)
      .select("n_docs", "base", "extra", "alloc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._4).sum
    assert(total == 10000L, s"largest-remainder lost the budget: $total")
    // Hamilton quota property: every stratum gets floor or ceil of its
    // exact proportional share, never drifts further
    val nn = rows.map(_._1).sum
    rows.foreach { case (n, base, extra, alloc) =>
      assert(extra == 0L || extra == 1L)
      assert(base == 10000L * n / nn, s"base not the floor quota")
      assert(alloc - base <= 1L)
    }
  }

  test("q160: drawdown bounded by peak; final never exceeds peak") {
    val rows = SparkEntry.queries("q160_max_drawdown")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, fin, peak, dd) =>
      assert(n > 0L, s"user $u emitted with no moves")
      assert(dd >= 0L, s"user $u negative drawdown")
      assert(fin <= peak, s"user $u final above running peak")
      // the trough the drawdown measures is a real prefix value, so the
      // drop can never exceed peak minus the worst possible prefix; in
      // particular peak - final is ONE candidate drawdown
      assert(dd >= peak - fin, s"user $u drawdown below peak-final")
    }
  }

  test("q161/q167: rule metrics are shares; pass agrees with threshold") {
    for (q <- Seq("q161_dq_rules", "q167_event_dq")) {
      val rows = SparkEntry.queries(q)(spark, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(rows.nonEmpty, q)
      rows.foreach { case (rule, m, t, pass) =>
        assert(m >= 0L && m <= 1000000L, s"$q $rule metric outside [0,1e6]")
        assert(pass == (if (m >= t) 1 else 0), s"$q $rule pass flag wrong")
      }
    }
  }

  test("q162: noisy count = true count + noise; ledger constant") {
    val raw = SparkEntry.queries("q162_dp_release")(spark, sf).collect()
    val rows = raw
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // The release must self-describe as a reproducible demo, not real DP
    raw.foreach(r => assert(r.getString(5) == "deterministic-demo"))
    rows.foreach { case (et, n, noise, noisy, eps) =>
      assert(noisy == n * 1000000L + noise, s"$et additivity broken")
      assert(eps == 500000L)
      // Laplace(2) noise beyond 40 units (|u-0.5| < 2e-9) means the
      // hash-uniform source is broken, not unlucky
      assert(math.abs(noise) < 40000000L, s"$et implausible noise $noise")
    }
  }

  test("q163/q164: two-hop reach bounds and sketch sanity") {
    val exact = SparkEntry.queries("q163_two_hop")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    // reach within 2 hops is at least the node's degree
    val deg = {
      val s = spark
      val li = Tables.lineitem(s, sf)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(countDistinct(col("a.ok")).as("n_ord"))
        .filter(col("n_ord") >= 2)
      pairs.select(col("u").as("n")).union(pairs.select(col("v").as("n")))
        .groupBy("n").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    exact.foreach { case (node, reach) =>
      assert(reach >= deg.getOrElse(node, 0L),
        s"node $node reach below degree")
    }
  }

  test("q166: matrix cells partition the part set; revenue reconciles") {
    val s = spark
    val rows = SparkEntry.queries("q166_abc_xyz")(s, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nParts = rows.map(_._3).sum
    val revTotal = rows.map(_._4).sum
    val expectedParts = Tables.lineitem(s, sf)
      .select(countDistinct(col("l_partkey"))).head.getLong(0)
    val expectedRev = Tables.lineitem(s, sf)
      .select(sum(expr("cast(round(l_extendedprice * 100) as bigint)")))
      .head.getLong(0)
    assert(nParts == expectedParts, s"cells lost parts: $nParts vs $expectedParts")
    assert(revTotal == expectedRev, s"cells lost revenue")
    rows.foreach { case (abc, xyz, n, _) =>
      assert(Set("A", "B", "C")(abc) && Set("X", "Y", "Z")(xyz))
      assert(n > 0L, "empty cell emitted")
    }
  }

  test("q169: MI non-negative within rounding; V in [0, 1]") {
    val rows = SparkEntry.queries("q169_feature_relevance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("weekday", "value_band"))
    rows.foreach { case (f, cells, mi, chi2, v) =>
      assert(cells > 0L)
      // true MI >= 0; per-cell micro rounding can dip the sum by at
      // most half a micro per cell
      assert(mi >= -cells, s"$f MI below rounding floor: $mi")
      assert(chi2 >= 0L)
      assert(v >= 0L && v <= 1000L, s"$f Cramér V outside [0,1]: $v")
    }
  }

  test("q171: split partitions the series; stat recomputes from parts") {
    val s = spark
    val days = Tables.events(s, sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q171_change_point")(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, _, nb, na, ml, mr, stat) =>
      assert(nb >= 1L && na >= 1L, s"$et empty side")
      assert(nb + na == days(et), s"$et split loses days")
      assert(stat >= 0L)
      // the statistic must be within rounding of what the (rounded)
      // means imply
      val n = nb + na
      val approx = math.sqrt(nb.toDouble * na / n) *
        math.abs(ml - mr) * 100.0 * 10000.0
      // means are r4-rounded (1e-4 dollars = 1e-2 cents), amplified by
      // sqrt(k·na/n)·1e4 — allow that propagation plus one ulp
      val tol = math.sqrt(nb.toDouble * na / n) * 100.0 * 2 + 1
      assert(math.abs(stat - approx) <= tol,
        s"$et stat $stat far from recomputed $approx (tol $tol)")
    }
  }

  test("q172: accuracy identities; argmax prediction never beats majority") {
    val rows = SparkEntry.queries("q172_markov_eval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (cur, _, nTest, nCorrect, acc, base, skill) =>
      assert(nCorrect <= nTest, s"$cur correct exceeds test")
      assert(acc == nCorrect * 1000000L / nTest, s"$cur acc identity")
      assert(skill == acc - base, s"$cur skill identity")
      // the test-set majority class is by construction at least as
      // frequent as whatever the train argmax predicted
      assert(acc <= base, s"$cur prediction beat the majority count")
    }
  }

  test("q173: input-availability ordering and error sanity") {
    val rows = SparkEntry.queries("q173_forecast_backtest")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (et, ms) =>
      val n = ms.map(m => m._2 -> m._3).toMap
      // ma7 needs all 7 lags; naive needs 1 of them — strictly fewer
      // valid origins for ma7 is impossible to violate
      assert(n("ma7") <= n("naive"), s"$et ma7 origins exceed naive")
      assert(n("ma7") <= n("snaive"), s"$et ma7 origins exceed snaive")
      ms.foreach { case (_, method, no, mae, mape) =>
        assert(no > 0L && mae >= 0.0 && mape >= 0L,
          s"$et $method bad metrics")
      }
    }
  }

  test("q174: outlier flag agrees with the exact integer MAD rule") {
    val rows = SparkEntry.queries("q174_robust_outliers")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, med, mad, nOut, maxZ) =>
      assert(nOut >= 0L && nOut <= n, s"$et outlier count out of range")
      assert(mad > 0L, s"$et degenerate MAD")
      assert(med >= 0L)
      // max_abs_z is computed from the farthest deviation: outliers
      // exist iff that deviation crosses the exact threshold
      val maxDev = Math.round(maxZ * mad / 0.6745)
      assert((nOut > 0L) == (6745L * maxDev > 35000L * mad)
        || math.abs(6745.0 * maxDev - 35000.0 * mad) < 6745.0,
        s"$et outlier flag inconsistent with max dev $maxDev")
    }
  }

  test("q175: FK joins make the true size an identity; q-error >= 1") {
    val s = spark
    val rows = SparkEntry.queries("q175_join_estimate")(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(rows.length == 3)
    val liRows = Tables.lineitem(s, sf).count()
    val ordRows = Tables.orders(s, sf).count()
    rows.foreach { case (name, ra, na, rb, nb, est, act, qe) =>
      assert(na <= ra && nb <= rb, s"$name ndv exceeds rows")
      assert(est == ra * rb / math.max(na, nb), s"$name estimator identity")
      assert(qe >= 1.0, s"$name q-error below 1")
      // every fact row joins exactly one dim row in these FK joins
      name match {
        case "lineitem_orders" | "lineitem_part" =>
          assert(act == liRows, s"$name true size must equal lineitem")
        case "orders_customer" =>
          assert(act == ordRows, s"$name true size must equal orders")
      }
    }
  }

  test("q176: anomaly flag consistent with worst deviation") {
    val rows = SparkEntry.queries("q176_stl_anomaly")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        if (r.isNullAt(6)) Double.NaN else r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, nDays, mad, nAnom, worstZ) =>
      assert(nAnom >= 0L && nAnom <= nDays, s"$et count out of range")
      assert(mad > 0L, s"$et degenerate MAD")
      if (nAnom > 0L) assert(worstZ >= 3.5, s"$et anomalies but z $worstZ")
      else assert(worstZ <= 3.5001, s"$et no anomalies but z $worstZ")
    }
  }

  test("q177/q178: distribution covers every customer; Q18 cut respected") {
    val s = spark
    val dist = SparkEntry.queries("q177_custdist")(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(dist.map(_._2).sum == Tables.customer(s, sf).count(),
      "custdist rows must partition the customer set")
    assert(dist.map(_._1).distinct.length == dist.length)
    val orderSum = dist.map { case (c, n) => c * n }.sum
    assert(orderSum == Tables.orders(s, sf).count(),
      "weighted counts must recover the order total")
    val big = SparkEntry.queries("q178_large_orders")(s, sf).collect()
      .map(r => (r.getLong(2), r.getLong(5)))
    assert(big.nonEmpty)
    assert(big.forall(_._2 > 300L), "Q18 threshold violated")
    assert(big.map(_._1).distinct.length == big.length)
  }

  test("q179: decay weights bounded; score never exceeds line count") {
    val rows = SparkEntry.queries("q179_decayed_popularity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (pk, n, score) =>
      // each line contributes at most 1e6 (age 0) and more than 0
      assert(score <= n * 1000000L, s"part $pk score exceeds line count")
      assert(score > 0L, s"part $pk zero score")
    }
    // ranking is by score, descending
    assert(rows.map(_._3).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    })
  }

  test("x25: epoch shuffles decorrelate (|r| within 3 sigma of zero)") {
    val rows = SparkEntry.queries("x25_epoch_shuffle_audit")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    rows.foreach { case (e, n, rMicro) =>
      // under independence r ~ N(0, 1/sqrt(n)); 3 sigma in micro units
      val bound = (3.0 * 1e6 / math.sqrt(n.toDouble)).toLong
      assert(math.abs(rMicro) <= bound,
        s"epoch $e correlation $rMicro exceeds 3-sigma bound $bound")
    }
  }

  test("m09: dup accounting identities; cross-source <= duplicated") {
    val rows = SparkEntry.queries("m09_segment_dedup")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum > 0L)
    rows.foreach { case (src, nSeg, nDup, nCross, ppm) =>
      assert(nDup <= nSeg && nCross <= nDup,
        s"$src dedup counts inconsistent")
      assert(ppm == nDup * 1000000L / nSeg, s"$src ppm identity")
    }
    // planted near-dups must surface SOMEWHERE as cross-source hits
    assert(rows.map(_._4).sum > 0L, "no cross-source duplicate found")
  }

  test("t27: every source gets 3 ranked terms with positive top z") {
    val rows = SparkEntry.queries("t27_distinctive_terms")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(4)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, ts) =>
      assert(ts.map(_._2).sorted.toSeq == Seq(1, 2, 3), s"$src ranks")
      val sorted = ts.sortBy(_._2).map(_._4)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true
      }, s"$src z not non-increasing")
    }
  }

  test("q181: tiers partition the day grid; shares and costs reconcile") {
    val s = spark
    val rows = SparkEntry.queries("q181_tier_plan")(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq.sorted ==
      rows.map(_._1).toSeq, "tier order")
    val totalDays = Tables.events(s, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().count()
    val totalRows = Tables.events(s, sf).count()
    assert(rows.map(_._2).sum == totalDays, "tiers lose days")
    assert(rows.map(_._3).sum == totalRows, "tiers lose rows")
    val shareSum = rows.map(_._5).sum
    assert(shareSum >= 999997L && shareSum <= 1000000L,
      s"byte shares don't reconcile: $shareSum")
    rows.foreach { case (t, _, _, bytes, _, cost) =>
      val rate = t match {
        case "1_hot" => 23L; case "2_warm" => 10L; case _ => 4L
      }
      assert(cost == bytes * rate / 1048576L, s"$t cost identity")
    }
  }

  test("q182: skyline is mutually non-dominated and dominates the rest") {
    val s = spark
    val sky = SparkEntry.queries("q182_skyline")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sky.nonEmpty)
    def dom(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    // no skyline member dominates another
    for (a <- sky; b <- sky if a != b)
      assert(!dom(a, b), s"skyline member $a dominates member $b")
    // every non-member is dominated by some member
    val all = Tables.part(s, sf).select(col("p_partkey"),
        expr("cast(round(p_retailprice * 100) as bigint)"),
        col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach { p =>
      assert(sky.exists(m => dom(m, p)), s"non-member $p undominated")
    }
  }

  test("d18: Jaccard identities over exact set sizes") {
    val rows = SparkEntry.queries("d18_assortment_match")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (c, sup, na, nb, shared, j) =>
      assert(shared <= math.min(na, nb), s"($c,$sup) overlap too big")
      assert(shared >= 10L)
      assert(j == shared * 1000000L / (na + nb - shared),
        s"($c,$sup) jaccard identity")
      assert(j <= 1000000L)
    }
  }

  test("q184/q185: interim analysis and CI structural gates") {
    val seq = SparkEntry.queries("q184_sequential_ab")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(7)))
    assert(seq.nonEmpty)
    var lastBoundary = Long.MaxValue
    seq.sortBy(_._1).foreach { case (k, cna, cxa, cnb, cxb, b) =>
      assert(cxa <= cna && cxb <= cnb, s"look $k conversions exceed n")
      assert(b <= lastBoundary, s"look $k boundary must shrink")
      lastBoundary = b
    }
    val ci = SparkEntry.queries("q185_median_ci")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(ci.nonEmpty)
    ci.foreach { case (et, med, lo, hi, w) =>
      assert(lo <= med && med <= hi, s"$et median outside its CI")
      assert(w == hi - lo && w >= 0L, s"$et width identity")
    }
  }

  test("q186/q187: correlation bounds and the Pearson moment inequality") {
    val a = SparkEntry.queries("q186_assortativity")(spark, sf).head()
    assert(math.abs(a.getLong(1)) <= 1000000L,
      s"assortativity outside [-1,1]: ${a.getLong(1)}")
    // symmetric-edge self-consistency: the edge list holds (u,v) iff
    // (v,u), so n_edges must be exactly twice the undirected pair
    // count (evenness included), and an INDEPENDENT formulation —
    // Spark's own double-path corr() over the rebuilt symmetric join —
    // must agree with the integer-exact statistic to rounding
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(countDistinct(col("a.ok")).as("n_ord"))
      .filter(col("n_ord") >= 2)
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    val nPairs = pairs.count()
    assert(a.getLong(0) == 2L * nPairs,
      s"n_edges ${a.getLong(0)} != 2 x $nPairs undirected pairs")
    val deg = edges.groupBy(col("src").as("n"))
      .agg(count(lit(1)).as("deg"))
    val rCorr = edges
      .join(deg.select(col("n").as("ns"), col("deg").as("dx")),
        col("src") === col("ns"))
      .join(deg.select(col("n").as("nd"), col("deg").as("dy")),
        col("dst") === col("nd"))
      .agg(corr(col("dx").cast("double"), col("dy").cast("double")))
      .head().getDouble(0)
    edges.unpersist()
    assert(math.abs(math.round(rCorr * 1e6) - a.getLong(1)) <= 2L,
      s"corr() ${math.round(rCorr * 1e6)} vs exact ${a.getLong(1)}")
    val rows = SparkEntry.queries("q187_higher_moments")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, g1, g2, bc) =>
      // kurtosis >= skewness^2 + 1 (Pearson) <=> BC in (0, 1]
      assert(g2 + 3.0 >= g1 * g1 + 1.0 - 1e-4,
        s"$et violates the Pearson inequality")
      assert(bc > 0.0 && bc <= 1.0 + 1e-4, s"$et bimodality $bc")
    }
  }

  test("q188: KS structural gates — D in [0,1], p in (0,2], threshold real") {
    val s = spark
    val r = SparkEntry.queries("q188_ks_test")(s, sf).head()
    val (na, nb, thr, dd, p) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(5))
    assert(na > 0L && nb > 0L)
    assert(dd >= 0.0 && dd <= 1.0, s"D outside [0,1]: $dd")
    assert(p > 0.0 && p <= 2.0, s"asymptotic p outside (0,2]: $p")
    // the argmax threshold must be an actually-observed milli value
    val vals = Tables.events(s, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(expr("cast(round(value * 1000) as bigint)").as("vm"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(vals(thr), s"threshold $thr not an observed value")
  }

  test("q168: metric ranges and DCG <= IDCG") {
    val rows = SparkEntry.queries("q168_ir_metrics")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nRel, p10, mrr, dcg, ndcg) =>
      assert(nRel >= 0L && nRel <= 10L)
      assert(p10 == nRel * 100000L, s"q$qid precision inconsistent")
      assert(mrr >= 0L && mrr <= 1000000L)
      assert(ndcg >= 0L && ndcg <= 1000000L, s"q$qid NDCG outside [0,1]")
      assert((nRel == 0L) == (mrr == 0L), s"q$qid MRR/relevance mismatch")
      assert((dcg == 0L) == (nRel == 0L))
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.Rounding

/** Temporal / CDC-style operators: dimension-history (SCD Type 2) builds
  * over an append-only event stream. The reference's envelope model
  * (README.md:37-53 — keyed messages with event time) makes "latest state
  * per key with full history" the canonical downstream table shape; this
  * is the batch builder for it.
  */
object Temporal {

  // ---------------------------------------------------------------- q48
  /** SCD2 history build: collapse each user's event-type runs into
    * validity periods `[valid_from, valid_to)` with a version number and
    * an is_current flag — gaps-and-islands (lag → change flag → running
    * sum) then one aggregation per run.
    *
    * Scale shape: every window partitions on `user_id`, so the whole
    * query is ONE exchange on the key — run starts are filtered rows
    * (chg=1), run length comes from row-number deltas, and the period
    * close comes from lead() over the (already co-partitioned) starts.
    * No groupBy re-shuffle and no self-join against the history table
    * (the naive MERGE formulation), so a 100 TB replay is a single
    * exchange + sort of the event log. */
  val q48Scd2 = QueryDef(
    "q48_scd2",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wAll = Window.partitionBy("user_id")
      val runs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("chg",
          when(lag("event_type", 1).over(w).isNull ||
            lag("event_type", 1).over(w) =!= col("event_type"), 1).otherwise(0))
        .withColumn("rn", row_number().over(w))
        .withColumn("grp", sum("chg").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_user", count(lit(1)).over(wAll))
      val w2 = Window.partitionBy("user_id").orderBy("rn")
      runs.filter(col("chg") === 1)
        .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
          lead("ts", 1).over(w2).as("valid_to"),
          col("grp").cast("int").as("version"),
          lead("ts", 1).over(w2).isNull.cast("int").as("is_current"),
          (coalesce(lead("rn", 1).over(w2), col("n_user") + 1) - col("rn"))
            .cast("long").as("n_events"))
        .orderBy("user_id", "version")
    },
    Some("""WITH runs AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    CASE WHEN lag(event_type) OVER w IS NULL
           |              OR lag(event_type) OVER w <> event_type
           |         THEN 1 ELSE 0 END AS chg,
           |    row_number() OVER w AS rn,
           |    count(*) OVER (PARTITION BY user_id) AS n_user
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |grps AS (
           |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS UNBOUNDED PRECEDING) AS grp FROM runs),
           |starts AS (SELECT * FROM grps WHERE chg = 1)
           |SELECT user_id, event_type, ts AS valid_from,
           |  lead(ts) OVER w2 AS valid_to,
           |  CAST(grp AS INT) AS version,
           |  CAST(lead(ts) OVER w2 IS NULL AS INT) AS is_current,
           |  CAST(COALESCE(lead(rn) OVER w2, n_user + 1) - rn AS BIGINT) AS n_events
           |FROM starts
           |WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)
           |ORDER BY user_id, version""".stripMargin))

  // ---------------------------------------------------------------- q55
  /** Time-series gap fill: bucket each user's events into a 6-hour grid,
    * densify the grid (sequence-explode of the user's observed range),
    * then fill the holes two ways — forward-fill (last observation
    * carried forward) and linear interpolation between the surrounding
    * observations. The standard sensor/metric repair step before any
    * per-entity model sees the series.
    *
    * Scale shape: each observation looks one row ahead (lead over a
    * single exchange on user_id) and EMITS its own gap rows by exploding
    * the bucket range up to the next observation — no dense-spine
    * self-join, no IGNORE-NULLS carry scan, no second shuffle. Output
    * size is the filled grid; intermediate size is only the observations.
    * The grid never materializes before the explode, so 100 TB of sparse
    * series never pays a join on the dense key space. */
  val q55GapFill = QueryDef(
    "q55_gap_fill",
    (s, d) => {
      import graft.functions.Rounding.r4
      val w = Window.partitionBy("user_id").orderBy("hr")
      val obs = Tables.events(s, d)
        .select(col("user_id"),
          floor(col("ts").cast("long") / 21600).as("hr"), col("value"))
        .groupBy("user_id", "hr").agg(avg("value").as("v"))
        .withColumn("nh", lead("hr", 1).over(w))
        .withColumn("nv", lead("v", 1).over(w))
      obs.select(col("user_id"), col("hr").as("ph"), col("v"),
          col("nh"), col("nv"),
          explode(sequence(col("hr"),
            coalesce(col("nh") - 1, col("hr")))).as("hr"))
        .select(col("user_id"), col("hr"),
          (col("hr") === col("ph")).cast("int").as("observed"),
          r4(col("v")).as("v_ffill"),
          r4(when(col("nh").isNull, col("v"))
            .otherwise(col("v") + (col("nv") - col("v")) *
              (col("hr") - col("ph")) / (col("nh") - col("ph"))))
            .as("v_interp"))
        .orderBy("user_id", "hr")
    },
    Some("""WITH sparse AS (
           |  SELECT user_id, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS hr,
           |         avg(value) AS v
           |  FROM events GROUP BY 1, 2),
           |obs AS (
           |  SELECT user_id, hr AS ph, v,
           |    lead(hr) OVER (PARTITION BY user_id ORDER BY hr) AS nh,
           |    lead(v)  OVER (PARTITION BY user_id ORDER BY hr) AS nv
           |  FROM sparse),
           |filled AS (
           |  SELECT user_id, ph, v, nh, nv,
           |         unnest(range(ph, COALESCE(nh, ph + 1))) AS hr
           |  FROM obs)
           |SELECT user_id, hr, CAST(hr = ph AS INT) AS observed,
           |  round(v * 10000) / 10000 AS v_ffill,
           |  round(CASE WHEN nh IS NULL THEN v
           |             ELSE v + (nv - v) * (hr - ph) / (nh - ph)
           |        END * 10000) / 10000 AS v_interp
           |FROM filled ORDER BY user_id, hr""".stripMargin))

  // ---------------------------------------------------------------- q56
  /** OHLC resampling: collapse the raw event stream into 6-hour candles
    * per event_type — open/close by event order (ts, event_id tie-break),
    * high/low/mean/volume over the bucket. The canonical downsampling
    * step for dashboards and time-series feature tables.
    *
    * Scale shape: open/close come from two row_number windows over the
    * SAME partition keys the final groupBy uses, so the whole query is
    * one exchange on (event_type, bucket) — the windows and the hash
    * aggregate reuse the partitioning; no self-join against min/max-ts
    * rows (the naive formulation, which would re-shuffle twice). */
  val q56Ohlc = QueryDef(
    "q56_ohlc",
    (s, d) => {
      import graft.functions.Rounding.r2
      val w1 = Window.partitionBy("event_type", "bucket")
        .orderBy(col("ts").asc, col("event_id").asc)
      val w2 = Window.partitionBy("event_type", "bucket")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("event_type"),
          floor(col("ts").cast("long") / 21600).as("bucket"),
          col("ts"), col("event_id"), col("value"))
        .withColumn("rn_a", row_number().over(w1))
        .withColumn("rn_d", row_number().over(w2))
        .groupBy("event_type", "bucket")
        .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
          max("value").as("high"), min("value").as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_events"),
          r2(avg("value")).as("mean_value"),
          r2(sum("value")).as("volume"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH base AS (
           |  SELECT event_type, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS bucket,
           |         ts, event_id, value,
           |    row_number() OVER (PARTITION BY event_type,
           |      CAST(floor(epoch(ts)/21600.0) AS BIGINT)
           |      ORDER BY ts ASC, event_id ASC) AS rn_a,
           |    row_number() OVER (PARTITION BY event_type,
           |      CAST(floor(epoch(ts)/21600.0) AS BIGINT)
           |      ORDER BY ts DESC, event_id DESC) AS rn_d
           |  FROM events)
           |SELECT event_type, bucket,
           |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
           |  max(value) AS high, min(value) AS low,
           |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  round(avg(value) * 100) / 100 AS mean_value,
           |  round(sum(value) * 100) / 100 AS volume
           |FROM base GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q60
  /** Rolling z-score anomaly detection: per event_type, each 6-hour
    * bucket's mean value is scored against the trailing 12 buckets'
    * mean/stddev (frame [-12, -1] — the current bucket never scores
    * itself), flagging |z| > 2. The standard metric-monitoring shape.
    *
    * The trailing stddev is computed from explicit running sums
    * (s1 = Σm, s2 = Σm²) rather than a stddev aggregate so both engines
    * evaluate the identical IEEE expression in the identical frame
    * order — stddev_samp implementations differ across engines.
    *
    * Scale shape: the corpus-sized work is one map-side-combined hash
    * aggregate into (event_type, bucket) cells; the low-cardinality
    * event_type window runs over the bucketed series, which is bounded
    * by the TIME DOMAIN (buckets), not the event volume — the q50/q59
    * histogram argument. sqrt is guarded with greatest(·, 0): the
    * catastrophic-cancellation negative-epsilon case would be NaN, and
    * Spark orders NaN above every number, silently flipping `sd > 0`. */
  val q60Anomaly = QueryDef(
    "q60_anomaly_zscore",
    (s, d) => {
      import graft.functions.Rounding.r4
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-12, -1)
      val z = (col("m") - col("mu")) / col("sd")
      Tables.events(s, d)
        .select(col("event_type"),
          floor(col("ts").cast("long") / 21600).as("bucket"), col("value"))
        .groupBy("event_type", "bucket").agg(avg("value").as("m"))
        .withColumn("s1", sum("m").over(w))
        .withColumn("s2", sum(col("m") * col("m")).over(w))
        .withColumn("nt", count("m").over(w))
        .filter(col("nt") >= 4)
        .withColumn("mu", col("s1") / col("nt"))
        .withColumn("sd", sqrt(greatest(
          (col("s2") - col("s1") * col("s1") / col("nt")) / (col("nt") - 1),
          lit(0.0))))
        .select(col("event_type"), col("bucket"),
          r4(col("m")).as("mean_value"),
          r4(col("mu")).as("trailing_mu"),
          r4(col("sd")).as("trailing_sd"),
          r4(when(col("sd") > 0, z)).as("z"),
          when(col("sd") > 0 && abs(z) > 2, 1).otherwise(0).as("is_anomaly"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH b AS (
           |  SELECT event_type, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS bucket,
           |         avg(value) AS m
           |  FROM events GROUP BY 1, 2),
           |t AS (
           |  SELECT event_type, bucket, m,
           |    sum(m) OVER w AS s1, sum(m*m) OVER w AS s2, count(m) OVER w AS nt
           |  FROM b
           |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
           |               ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)),
           |c AS (
           |  SELECT event_type, bucket, m, s1/nt AS mu,
           |    sqrt(greatest((s2 - s1*s1/nt) / (nt - 1), 0.0)) AS sd
           |  FROM t WHERE nt >= 4)
           |SELECT event_type, bucket,
           |  round(m * 10000) / 10000 AS mean_value,
           |  round(mu * 10000) / 10000 AS trailing_mu,
           |  round(sd * 10000) / 10000 AS trailing_sd,
           |  round(CASE WHEN sd > 0 THEN (m - mu)/sd END * 10000) / 10000 AS z,
           |  CAST(CASE WHEN sd > 0 AND abs((m - mu)/sd) > 2
           |       THEN 1 ELSE 0 END AS INT) AS is_anomaly
           |FROM c ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q63
  /** Cross-series correlation: Pearson r between every pair of event
    * types' 6-hour bucket-mean series (inner-joined on bucket) — the
    * "which metrics move together" question behind alert grouping and
    * root-cause hints. Computed from explicit sums (n, Σx, Σy, Σxy, Σx²,
    * Σy²) rather than a corr() aggregate so the formula is the same
    * IEEE expression in both engines (r6-rounded: summation order across
    * partitions is the only remaining degree of freedom).
    *
    * Scale shape: corpus-sized work is the one bucketed hash aggregate;
    * the pair join and correlation run over the domain-bounded series
    * (card(types)² pairs × buckets). */
  val q63SeriesCorr = QueryDef(
    "q63_series_correlation",
    (s, d) => {
      import graft.functions.Rounding.r6
      val b = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("ts").cast("long") / 21600).as("bucket"), col("value"))
        .groupBy("event_type", "bucket").agg(avg("value").as("m"))
      val j = b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") &&
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.m").as("x"), col("b.m").as("y"))
      j.groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_buckets"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("type_a"), col("type_b"), col("n_buckets"),
          r6((col("n_buckets") * col("sxy") - col("sx") * col("sy")) /
            sqrt(greatest(
              (col("n_buckets") * col("sxx") - col("sx") * col("sx")) *
              (col("n_buckets") * col("syy") - col("sy") * col("sy")),
              lit(1e-300)))).as("corr"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH b AS (
           |  SELECT event_type, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS bucket,
           |         avg(value) AS m
           |  FROM events GROUP BY 1, 2),
           |j AS (
           |  SELECT u.event_type AS type_a, v.event_type AS type_b,
           |         u.m AS x, v.m AS y
           |  FROM b u JOIN b v ON u.bucket = v.bucket
           |   AND u.event_type < v.event_type),
           |agg AS (
           |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_buckets,
           |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
           |    sum(x*x) AS sxx, sum(y*y) AS syy
           |  FROM j GROUP BY 1, 2)
           |SELECT type_a, type_b, n_buckets,
           |  round((n_buckets * sxy - sx * sy) /
           |    sqrt(greatest((n_buckets * sxx - sx * sx)
           |                * (n_buckets * syy - sy * sy), 1e-300))
           |    * 1000000) / 1000000 AS corr
           |FROM agg ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q64
  /** Exponentially-weighted moving average: per event_type, the exact
    * recursive EWMA (α = 0.2) over the 6-hour bucket-mean series —
    * e_0 = m_0, e_i = α·m_i + (1-α)·e_{i-1}. The smoothing baseline
    * behind q60's anomaly z-scores and most "trend vs level" monitors.
    *
    * The recurrence is inherently sequential per series, so it is NOT a
    * window function: Spark runs a typed groupByKey + flatMapGroups
    * sequential scan per series; the oracle replays the identical
    * recurrence as a recursive CTE. Both engines evaluate the same IEEE
    * expression `0.2 * m + 0.8 * e` in the same order, so the series
    * agree to the ulp (r4-rounded for the avg()'s partial-sum freedom).
    *
    * Scale shape: corpus-sized work is the one map-side-combined hash
    * aggregate into (event_type, bucket) cells; the sequential scan runs
    * over the bucketed series, bounded by the TIME DOMAIN, not event
    * volume (the q60 argument), with O(1) running state — the batch twin
    * of a flatMapGroupsWithState streaming EWMA. */
  val q64Ewma = QueryDef(
    "q64_ewma",
    (s, d) => {
      import s.implicits._
      import graft.functions.Rounding.r4
      val series = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("ts").cast("long") / 21600).as("bucket"), col("value"))
        .groupBy("event_type", "bucket").agg(avg("value").as("m"))
        .as[(String, Long, Double)]
      series.groupByKey(_._1)
        .flatMapGroups { (k, it) =>
          val pts = it.toArray.sortBy(_._2)
          var e = 0.0
          pts.iterator.zipWithIndex.map { case ((_, b, m), i) =>
            e = if (i == 0) m else 0.2 * m + 0.8 * e
            (k, b, m, e)
          }
        }
        .toDF("event_type", "bucket", "m", "e")
        .select(col("event_type"), col("bucket"),
          r4(col("m")).as("mean_value"), r4(col("e")).as("ewma"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH RECURSIVE b AS (
           |  SELECT event_type, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS bucket,
           |         avg(value) AS m
           |  FROM events GROUP BY 1, 2),
           |s AS (
           |  SELECT event_type, bucket, m,
           |    row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
           |  FROM b),
           |r AS (
           |  SELECT event_type, bucket, m, rn, m AS e FROM s WHERE rn = 1
           |  UNION ALL
           |  SELECT s.event_type, s.bucket, s.m, s.rn, 0.2 * s.m + 0.8 * r.e
           |  FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1)
           |SELECT event_type, bucket,
           |  round(m * 10000) / 10000 AS mean_value,
           |  round(e * 10000) / 10000 AS ewma
           |FROM r ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q65
  /** Autocorrelation function: per event_type, Pearson r between the
    * 6-hour bucket-mean series and itself shifted by k = 1..6 buckets
    * (pairs matched on exact bucket distance, so series gaps don't
    * smear the lag). The seasonality probe — a daily cycle on 6-hour
    * buckets shows up as an ACF peak at lag 4.
    *
    * Same explicit-sum Pearson as q63 (identical IEEE expression in both
    * engines, r6-rounded); pairs come from a self-join on bucket
    * distance rather than lag() so k never crosses series holes.
    *
    * Scale shape: corpus-sized work is the one bucketed hash aggregate;
    * the self-join keys on event_type over the domain-bounded series
    * (≤ 6·buckets pairs per type) — the q63 argument. */
  val q65Autocorr = QueryDef(
    "q65_autocorrelation",
    (s, d) => {
      import graft.functions.Rounding.r6
      val b = Tables.events(s, d)
        .select(col("event_type"),
          floor(col("ts").cast("long") / 21600).as("bucket"), col("value"))
        .groupBy("event_type", "bucket").agg(avg("value").as("m"))
      val j = b.as("a").join(b.as("c"),
          col("a.event_type") === col("c.event_type") &&
          (col("a.bucket") - col("c.bucket")).between(1, 6))
        .select(col("a.event_type").as("event_type"),
          (col("a.bucket") - col("c.bucket")).as("lag_k"),
          col("a.m").as("x"), col("c.m").as("y"))
      j.groupBy("event_type", "lag_k")
        .agg(count(lit(1)).as("n_pairs"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("lag_k"), col("n_pairs"),
          r6((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
            sqrt(greatest(
              (col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
              (col("n_pairs") * col("syy") - col("sy") * col("sy")),
              lit(1e-300)))).as("acf"))
        .orderBy("event_type", "lag_k")
    },
    Some("""WITH b AS (
           |  SELECT event_type, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS bucket,
           |         avg(value) AS m
           |  FROM events GROUP BY 1, 2),
           |j AS (
           |  SELECT a.event_type, a.bucket - c.bucket AS lag_k,
           |         a.m AS x, c.m AS y
           |  FROM b a JOIN b c ON a.event_type = c.event_type
           |   AND a.bucket - c.bucket BETWEEN 1 AND 6),
           |agg AS (
           |  SELECT event_type, lag_k, CAST(count(*) AS BIGINT) AS n_pairs,
           |    sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
           |    sum(x*x) AS sxx, sum(y*y) AS syy
           |  FROM j GROUP BY 1, 2)
           |SELECT event_type, lag_k, n_pairs,
           |  round((n_pairs * sxy - sx * sy) /
           |    sqrt(greatest((n_pairs * sxx - sx * sx)
           |                * (n_pairs * syy - sy * sy), 1e-300))
           |    * 1000000) / 1000000 AS acf
           |FROM agg ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q78
  /** Snapshot diff / reconciliation — the validation half of any CDC
    * pipeline: given two keyed snapshots of a table, classify every key
    * as added / removed / changed / unchanged and roll up counts and
    * value drift per class and status. The two snapshots are carved
    * deterministically out of `orders` (md5 percentile buckets: 1%
    * missing from each side, 1% price-adjusted) so the diff exercises
    * all four classes with an exactly replayable input.
    *
    * Scale shape: ONE full-outer sort-merge join on the snapshot key —
    * the unavoidable reconciliation shuffle, partitioned by key so it
    * scales with executor count — then a pure projection and a
    * four-by-status hash-agg. Change detection compares the value
    * columns directly; a wide table would md5 a canonical concat of its
    * columns instead (the d02 fingerprint), same plan shape. */
  val q78SnapshotDiff = QueryDef(
    "q78_snapshot_diff",
    (s, d) => {
      import graft.functions.Rounding.r2
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("p"),
          (conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long") % 100).as("b"))
      val old = base.filter(col("b") =!= 0)
        .select(col("k"), col("st").as("st_old"), col("p").as("p_old"))
      val nw = base.filter(col("b") =!= 1)
        .select(col("k"), col("st").as("st_new"),
          when(col("b") === 2, r2(col("p") * 1.1)).otherwise(col("p"))
            .as("p_new"))
      old.join(nw, Seq("k"), "full_outer")
        .withColumn("change_type",
          when(col("p_old").isNull, lit("added"))
            .when(col("p_new").isNull, lit("removed"))
            .when(col("p_old") =!= col("p_new") ||
              col("st_old") =!= col("st_new"), lit("changed"))
            .otherwise(lit("unchanged")))
        .withColumn("status", coalesce(col("st_new"), col("st_old")))
        .groupBy("change_type", "status")
        .agg(count(lit(1)).as("n_rows"),
          r2(sum(coalesce(col("p_old"), lit(0.0)))).as("old_value"),
          r2(sum(coalesce(col("p_new"), lit(0.0)))).as("new_value"))
        .orderBy("change_type", "status")
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p,
           |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           |      % 100 AS b
           |  FROM orders),
           |old AS (SELECT k, st AS st_old, p AS p_old FROM base WHERE b <> 0),
           |nw AS (SELECT k, st AS st_new,
           |    CASE WHEN b = 2 THEN round(p * 1.1 * 100) / 100 ELSE p END
           |      AS p_new
           |  FROM base WHERE b <> 1),
           |j AS (
           |  SELECT coalesce(o.k, n.k) AS k, st_old, p_old, st_new, p_new,
           |    CASE WHEN p_old IS NULL THEN 'added'
           |         WHEN p_new IS NULL THEN 'removed'
           |         WHEN p_old <> p_new OR st_old <> st_new THEN 'changed'
           |         ELSE 'unchanged' END AS change_type,
           |    coalesce(st_new, st_old) AS status
           |  FROM old o FULL OUTER JOIN nw n ON o.k = n.k)
           |SELECT change_type, status, CAST(count(*) AS BIGINT) AS n_rows,
           |  round(sum(coalesce(p_old, 0)), 2) AS old_value,
           |  round(sum(coalesce(p_new, 0)), 2) AS new_value
           |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q84
  /** Two-sided interval-overlap join at scale: user activity sessions
    * (10-minute-gap sessionization, the q37 contract) against per-type
    * surge windows (5-minute buckets with ≥ max(2, 1.5×type-average)
    * events, merged into consecutive-bucket islands clipped at midnight —
    * the q83 convention at the coarser grain). "Which activity windows were exposed to each surge" is
    * the interval-stabbing question capacity/incident analysis asks, and
    * neither side carries an equi key — the naive plan is a
    * BroadcastNestedLoopJoin over every (session, surge) pair.
    *
    * Scale shape: both interval sets explode into the HOUR buckets they
    * span, the join becomes an equi-join on the bucket with the exact
    * overlap predicate as a residual, and a distinct on (surge, session)
    * dedups multi-bucket matches. Bucket cardinality grows with the
    * timespan (not the volume) and per-hour fan-out is bounded by
    * islands-per-hour, so join work stays ∝ true matches — the standard
    * bin-the-intervals remedy for interval joins, same family as d08's
    * banding. Sessions cost one exchange on user_id; the surge side is
    * aggregate-bounded (≤ 288 bucket rows per (type, day)) before its
    * window. */
  private val BktUs = 300000000L // 5-minute surge buckets
  private val HourUs = 3600000000L

  /** q84's session side: [s0, s1] closed µs intervals per (user,
    * session_seq) — q37's gap rule verbatim. Exposed so the streaming
    * twin's parity spec can compare interval sets directly. */
  def q84SessionIntervals(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("gap_s",
        unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser)))
      .withColumn("is_break",
        when(col("gap_s").isNull || col("gap_s") > 600L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("is_break").over(run))
      .groupBy("user_id", "session_seq")
      .agg(min(unix_micros(col("ts"))).as("s0"),
        max(unix_micros(col("ts"))).as("s1"))
  }

  /** q84's surge side: per-type 5-minute-bucket counts thresholded at
    * max(2, 1.5×type-average) and merged into consecutive-bucket islands
    * clipped at midnight — [m0, m1] closed bucket intervals. */
  def q84SurgeIslands(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val mc = Tables.events(s, d)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div ${BktUs}L").as("m"))
      .groupBy("event_type", "m").agg(count(lit(1)).as("n"))
    val av = mc.groupBy("event_type")
      .agg(avg(col("n").cast("double")).as("avgn"))
    val surge = mc.join(broadcast(av), Seq("event_type"))
      .filter(col("n") >= 2L && col("n").cast("double") >= lit(1.5) * col("avgn"))
      .withColumn("day", expr("m div 288"))
    val wDay = Window.partitionBy("event_type", "day").orderBy("m")
    val wRun = wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    surge
      .withColumn("brk",
        when(col("m") - lag("m", 1).over(wDay) === 1L, 0L).otherwise(1L))
      .withColumn("iid", sum("brk").over(wRun))
      .groupBy("event_type", "day", "iid")
      .agg(min("m").as("m0"), max("m").as("m1"))
  }

  /** q84's join+rollup: hour-bucket expansion → equi-join → exact-overlap
    * residual → distinct → per-surge session/user counts. Takes the two
    * interval sets as inputs so the batch query and the streaming twin's
    * parity spec run the IDENTICAL plan over their respective sides. */
  def q84OverlapAgg(sess: org.apache.spark.sql.DataFrame,
      iv: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sessB = sess.withColumn("hr",
      explode(sequence(expr(s"s0 div $HourUs"), expr(s"s1 div $HourUs"))))
    val ivB = iv.withColumn("hr",
      explode(sequence(expr("m0 div 12"), expr("m1 div 12"))))
    ivB.join(sessB, Seq("hr"))
      .filter(col("s0") < (col("m1") + 1L) * BktUs &&
        col("s1") >= col("m0") * BktUs)
      .select("event_type", "m0", "m1", "user_id", "session_seq")
      .distinct()
      .groupBy(col("event_type"), col("m0").as("surge_start"),
        (col("m1") - col("m0") + 1L).as("surge_min"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "surge_start")
  }

  val q84IntervalJoin = QueryDef(
    "q84_interval_join",
    (s, d) => q84OverlapAgg(q84SessionIntervals(s, d), q84SurgeIslands(s, d)),
    Some("""WITH gapped AS (
           |  SELECT user_id, event_id, ts,
           |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_s
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |marked AS (
           |  SELECT *, CASE WHEN gap_s IS NULL OR gap_s > 600 * 1000000
           |                 THEN 1 ELSE 0 END AS is_break
           |  FROM gapped),
           |sess AS (
           |  SELECT user_id, session_seq, min(epoch_us(ts)) AS s0,
           |    max(epoch_us(ts)) AS s1
           |  FROM (SELECT *, sum(is_break) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           |    FROM marked)
           |  GROUP BY 1, 2),
           |mc AS (SELECT event_type, epoch_us(ts) // 300000000 AS m,
           |    count(*) AS n
           |  FROM events GROUP BY 1, 2),
           |av AS (SELECT event_type, avg(CAST(n AS DOUBLE)) AS avgn
           |  FROM mc GROUP BY 1),
           |surge AS (SELECT mc.event_type, m, m // 288 AS day
           |  FROM mc JOIN av USING (event_type)
           |  WHERE n >= 2 AND CAST(n AS DOUBLE) >= 1.5 * avgn),
           |isl AS (SELECT *, CASE WHEN m - lag(m) OVER
           |      (PARTITION BY event_type, day ORDER BY m) = 1
           |    THEN 0 ELSE 1 END AS brk
           |  FROM surge),
           |iv AS (SELECT event_type, day, iid, min(m) AS m0, max(m) AS m1
           |  FROM (SELECT *, sum(brk) OVER (PARTITION BY event_type, day
           |      ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS iid
           |    FROM isl)
           |  GROUP BY 1, 2, 3),
           |ov AS (SELECT DISTINCT iv.event_type, m0, m1, s.user_id,
           |    s.session_seq
           |  FROM iv JOIN sess s
           |    ON s.s0 < (m1 + 1) * 300000000 AND s.s1 >= m0 * 300000000)
           |SELECT event_type, m0 AS surge_start,
           |  CAST(m1 - m0 + 1 AS BIGINT) AS surge_min,
           |  count(*) AS n_sessions,
           |  count(DISTINCT user_id) AS n_users
           |FROM ov GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q89
  /** As-of join direction battery — completes q25's backward-only as-of
    * with the other two directions pandas' merge_asof and kdb's aj ship:
    * for every click, the latest purchase at-or-before (backward), the
    * earliest purchase at-or-after (forward), and the nearer of the two
    * (nearest, ties → backward), each subject to a 24 h tolerance.
    *
    * Scale shape: same as q25 — union the two tagged sides and resolve
    * every direction with windows over ONE exchange on user_id (two sort
    * orders share the partitioning, so Catalyst plans exchange-sort-
    * window-sort-window, no re-shuffle). A per-row non-equi probe join
    * would be quadratic in hot users and unbounded in skew; the carry
    * formulation is linear and skew-bounded by the per-user row count.
    * At equal timestamps the purchase sorts before the click in the
    * backward order and after it in the forward order, so ties count as
    * matches in BOTH directions (>= / <= semantics, like merge_asof). */
  val q89AsofDirections = QueryDef(
    "q89_asof_directions",
    (s, d) => {
      val TolUs = 86400000000L // 24 h
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "click", 1).otherwise(0).as("is_click"))
      val wb = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click").desc, col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val p = when(col("is_click") === 0, col("event_id"))
      val pUs = when(col("is_click") === 0, unix_micros(col("ts")))
      val enriched = ev
        .withColumn("back_id0", last(p, ignoreNulls = true).over(wb))
        .withColumn("back_us", last(pUs, ignoreNulls = true).over(wb))
        .withColumn("fwd_id0", first(p, ignoreNulls = true).over(wf))
        .withColumn("fwd_us", first(pUs, ignoreNulls = true).over(wf))
        .filter(col("is_click") === 1)
        .withColumn("c_us", unix_micros(col("ts")))
        .withColumn("back_gap_us",
          when(col("c_us") - col("back_us") <= TolUs,
            col("c_us") - col("back_us")))
        .withColumn("fwd_gap_us",
          when(col("fwd_us") - col("c_us") <= TolUs,
            col("fwd_us") - col("c_us")))
      enriched
        .select(col("event_id"),
          when(col("back_gap_us").isNotNull, col("back_id0")).as("back_event_id"),
          col("back_gap_us"),
          when(col("fwd_gap_us").isNotNull, col("fwd_id0")).as("fwd_event_id"),
          col("fwd_gap_us"),
          when(col("back_gap_us").isNotNull &&
              (col("fwd_gap_us").isNull || col("back_gap_us") <= col("fwd_gap_us")),
              lit("b"))
            .when(col("fwd_gap_us").isNotNull, lit("f"))
            .as("nearest_dir"))
        .orderBy("event_id")
    },
    Some("""WITH u AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
           |  FROM events WHERE event_type IN ('click', 'purchase')),
           |caught AS (
           |  SELECT *,
           |    last_value(CASE WHEN is_click = 0 THEN event_id END IGNORE NULLS)
           |      OVER wb AS back_id0,
           |    last_value(CASE WHEN is_click = 0 THEN epoch_us(ts) END IGNORE NULLS)
           |      OVER wb AS back_us,
           |    first_value(CASE WHEN is_click = 0 THEN event_id END IGNORE NULLS)
           |      OVER wf AS fwd_id0,
           |    first_value(CASE WHEN is_click = 0 THEN epoch_us(ts) END IGNORE NULLS)
           |      OVER wf AS fwd_us
           |  FROM u
           |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, is_click, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |  wf AS (PARTITION BY user_id ORDER BY ts, is_click DESC, event_id
           |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
           |gapped AS (
           |  SELECT event_id, back_id0, fwd_id0,
           |    CASE WHEN epoch_us(ts) - back_us <= 86400000000
           |         THEN epoch_us(ts) - back_us END AS back_gap_us,
           |    CASE WHEN fwd_us - epoch_us(ts) <= 86400000000
           |         THEN fwd_us - epoch_us(ts) END AS fwd_gap_us
           |  FROM caught WHERE is_click = 1)
           |SELECT event_id,
           |  CASE WHEN back_gap_us IS NOT NULL THEN back_id0 END AS back_event_id,
           |  back_gap_us,
           |  CASE WHEN fwd_gap_us IS NOT NULL THEN fwd_id0 END AS fwd_event_id,
           |  fwd_gap_us,
           |  CASE WHEN back_gap_us IS NOT NULL
           |         AND (fwd_gap_us IS NULL OR back_gap_us <= fwd_gap_us)
           |       THEN 'b'
           |       WHEN fwd_gap_us IS NOT NULL THEN 'f' END AS nearest_dir
           |FROM gapped ORDER BY event_id""".stripMargin))

  // ---------------------------------------------------------------- q90
  /** Seasonal-naive forecast evaluation: learn an hour-of-day profile per
    * event_type on the first half of the timeline (q85's midpoint split
    * convention), predict each test-half hourly mean with the profile,
    * and score it against the train-global-mean naive baseline — the
    * capacity-planning backtest that closes the time-series family
    * (q60 anomaly, q63 correlation, q64 EWMA, q65 ACF).
    *
    * Scale shape: the corpus collapses in ONE map-side-combined hash-agg
    * to (type, day, hour) buckets; profiles, baselines, and error
    * metrics all derive from that bounded bucket table (types × days ×
    * 24), so 100 TB of raw events never reaches a window or join. The
    * profile join broadcasts (types × 24 rows). */
  val q90SeasonalNaive = QueryDef(
    "q90_seasonal_naive",
    (s, d) => {
      val DayUs = 86400000000L
      val HourUs = 3600000000L
      val b = Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
          expr(s"(unix_micros(ts) div ${HourUs}L) % 24").cast("int")
            .as("hod"),
          col("value"))
        .groupBy("event_type", "day", "hod")
        .agg(sum("value").as("sv"), count(lit(1)).as("n"))
      // timeline span from the raw single-column scan (a catalog stat at
      // ingest, per the q83/q85 convention) — NOT derived from `b`,
      // which would re-plan and re-run the full bucket aggregate
      val span = Tables.events(s, d)
        .select(expr(s"unix_micros(ts) div ${DayUs}L").as("day"))
        .agg(min("day").as("d0"), max("day").as("d1"))
      val bs = b.crossJoin(broadcast(span))
        .withColumn("is_train", col("day") < expr("(d0 + d1 + 1) div 2"))
      val prof = bs.filter(col("is_train"))
        .groupBy("event_type", "hod")
        .agg((sum("sv") / sum("n")).as("prof_mean"))
      val glob = bs.filter(col("is_train"))
        .groupBy("event_type")
        .agg((sum("sv") / sum("n")).as("glob_mean"))
      bs.filter(!col("is_train"))
        .withColumn("test_mean", col("sv") / col("n"))
        .join(broadcast(prof), Seq("event_type", "hod"))
        .join(broadcast(glob), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          Rounding.r4(avg(abs(col("test_mean") - col("prof_mean"))))
            .as("mae_seasonal"),
          Rounding.r4(avg(abs(col("test_mean") - col("glob_mean"))))
            .as("mae_naive"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
           |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           |    (epoch_us(ts) // 3600000000) % 24 AS hod,
           |    sum(value) AS sv, count(*) AS n
           |  FROM events GROUP BY 1, 2, 3),
           |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM b),
           |bs AS (SELECT b.*, day < (d0 + d1 + 1) // 2 AS is_train
           |  FROM b CROSS JOIN span),
           |prof AS (SELECT event_type, hod, sum(sv) / sum(n) AS prof_mean
           |  FROM bs WHERE is_train GROUP BY 1, 2),
           |gm AS (SELECT event_type, sum(sv) / sum(n) AS glob_mean
           |  FROM bs WHERE is_train GROUP BY 1)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
           |  round(avg(abs(sv / n - prof_mean)) * 10000) / 10000 AS mae_seasonal,
           |  round(avg(abs(sv / n - glob_mean)) * 10000) / 10000 AS mae_naive
           |FROM bs JOIN prof USING (event_type, hod)
           |  JOIN gm USING (event_type)
           |WHERE NOT is_train
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q95
  /** Rolling exact quantiles — the robust-statistics twin of q60's
    * rolling z-score: per event_type 6-hour bucket, the trailing-12-
    * bucket exact median and IQR band (p25/p75), plus an outlier flag
    * for buckets escaping 1.5×IQR. Medians resist the heavy-tailed
    * value spikes that inflate a mean-based z-score; this is the
    * monitor you deploy when q60 pages too often.
    *
    * Scale shape: identical to q60 — the corpus collapses in ONE
    * map-side-combined hash-agg to the (type, bucket) domain; the
    * rolling window then runs over the DOMAIN-BOUNDED series (types ×
    * buckets), so the exact per-frame quantile sort touches ≤ 12 rows
    * per frame regardless of corpus size. */
  val q95RollingQuantiles = QueryDef(
    "q95_rolling_quantiles",
    (s, d) => {
      val BucketUs = 21600000000L // 6 h
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(-11, Window.currentRow)
      val series = Tables.events(s, d)
        .select(col("event_type"),
          expr(s"unix_micros(ts) div ${BucketUs}L").as("bucket"),
          col("value"))
        .groupBy("event_type", "bucket")
        .agg((sum("value") / count(lit(1))).as("v"))
      series
        .withColumn("med", expr("percentile(v, 0.5)").over(w))
        .withColumn("p25", expr("percentile(v, 0.25)").over(w))
        .withColumn("p75", expr("percentile(v, 0.75)").over(w))
        .select(col("event_type"), col("bucket"), Rounding.r4(col("v")).as("v"),
          Rounding.r4(col("med")).as("roll_med"),
          Rounding.r4(col("p25")).as("roll_p25"),
          Rounding.r4(col("p75")).as("roll_p75"),
          (col("v") > col("p75") + (col("p75") - col("p25")) * 1.5 ||
            col("v") < col("p25") - (col("p75") - col("p25")) * 1.5)
            .cast("int").as("iqr_outlier"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH series AS (
           |  SELECT event_type, epoch_us(ts) // 21600000000 AS bucket,
           |    sum(value) / count(*) AS v
           |  FROM events GROUP BY 1, 2),
           |rolled AS (
           |  SELECT event_type, bucket, v,
           |    quantile_cont(v, 0.5)  OVER w AS med,
           |    quantile_cont(v, 0.25) OVER w AS p25,
           |    quantile_cont(v, 0.75) OVER w AS p75
           |  FROM series
           |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
           |    ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
           |SELECT event_type, bucket,
           |  round(v * 10000) / 10000 AS v,
           |  round(med * 10000) / 10000 AS roll_med,
           |  round(p25 * 10000) / 10000 AS roll_p25,
           |  round(p75 * 10000) / 10000 AS roll_p75,
           |  CAST(v > p75 + (p75 - p25) * 1.5
           |    OR v < p25 - (p75 - p25) * 1.5 AS INT) AS iqr_outlier
           |FROM rolled ORDER BY event_type, bucket""".stripMargin))

  // ---------------------------------------------------------------- q97
  /** MERGE (upsert + delete) application — the lakehouse `MERGE INTO`
    * executed relationally: a keyed base snapshot, a delta batch of
    * INSERT / UPDATE / DELETE operations (derived here by deterministic
    * md5 carves — a real deployment reads its CDC feed), and the next
    * snapshot = base ∖ deletes, updates applied via coalesce, inserts
    * unioned — with per-type row/op accounting proving exactly what the
    * merge did. Delete wins over update on the same key (the anti-join
    * runs first), matching MERGE's WHEN MATCHED THEN DELETE precedence.
    *
    * Scale shape: one anti join + one left join on the snapshot key +
    * a union — all hash-partitioned on event_id with no window and no
    * driver state; the base is read thrice only because this fixture
    * DERIVES it (a real snapshot is a materialized table, so each read
    * is a table scan, and the delta side is increment-sized). */
  val q97MergeApply = QueryDef(
    "q97_merge_apply",
    (s, d) => {
      def h(c: org.apache.spark.sql.Column, salt: String) =
        conv(substring(md5(concat(c.cast("string"), lit(salt))), 1, 8),
          16, 10).cast("long")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          (h(col("event_id"), "") % 100L).as("carve"))
      val base = ev.filter(col("carve") =!= 0L)
        .select(col("event_id"), col("event_type"), col("value"))
      val ins = ev.filter(col("carve") === 0L)
        .select(col("event_id"), col("event_type"), col("value"))
      val upd = base.filter(h(col("event_id"), "u") % 37L === 0L)
        .select(col("event_id"), (col("value") + 10.0).as("new_value"))
      val del = base.filter(h(col("event_id"), "d") % 41L === 0L)
        .select(col("event_id"), col("event_type"))
      val merged = base
        .join(del.select("event_id"), Seq("event_id"), "left_anti")
        .join(upd, Seq("event_id"), "left")
        .select(col("event_id"), col("event_type"),
          coalesce(col("new_value"), col("value")).as("value"),
          col("new_value").isNotNull.cast("long").as("was_upd"),
          lit(0L).as("was_ins"))
        .unionByName(ins.select(col("event_id"), col("event_type"),
          col("value"), lit(0L).as("was_upd"), lit(1L).as("was_ins")))
      merged.groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          Rounding.r2(sum("value")).as("sum_value"),
          sum("was_upd").as("n_updated"), sum("was_ins").as("n_inserted"))
        .join(del.groupBy("event_type").agg(count(lit(1)).as("n_deleted")),
          Seq("event_type"), "left")
        .select(col("event_type"), col("n_rows"), col("sum_value"),
          col("n_updated"), col("n_inserted"),
          coalesce(col("n_deleted"), lit(0L)).as("n_deleted"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_id, event_type, value,
           |    ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ''), 1, 8))
           |      ::BIGINT % 100 AS carve
           |  FROM events),
           |base AS (SELECT event_id, event_type, value FROM ev
           |  WHERE carve <> 0),
           |ins AS (SELECT event_id, event_type, value FROM ev
           |  WHERE carve = 0),
           |upd AS (SELECT event_id, value + 10.0 AS new_value FROM base
           |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'u'),
           |    1, 8))::BIGINT % 37 = 0),
           |del AS (SELECT event_id, event_type FROM base
           |  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'd'),
           |    1, 8))::BIGINT % 41 = 0),
           |merged AS (
           |  SELECT b.event_id, b.event_type,
           |    COALESCE(u.new_value, b.value) AS value,
           |    CASE WHEN u.new_value IS NOT NULL THEN 1 ELSE 0 END AS was_upd,
           |    0 AS was_ins
           |  FROM base b
           |  LEFT JOIN upd u ON b.event_id = u.event_id
           |  WHERE b.event_id NOT IN (SELECT event_id FROM del)
           |  UNION ALL
           |  SELECT event_id, event_type, value, 0, 1 FROM ins),
           |summary AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           |    round(sum(value), 2) AS sum_value,
           |    CAST(sum(was_upd) AS BIGINT) AS n_updated,
           |    CAST(sum(was_ins) AS BIGINT) AS n_inserted
           |  FROM merged GROUP BY 1),
           |dels AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_deleted
           |  FROM del GROUP BY 1)
           |SELECT s.event_type, n_rows, sum_value, n_updated, n_inserted,
           |  COALESCE(n_deleted, 0) AS n_deleted
           |FROM summary s LEFT JOIN dels USING (event_type)
           |ORDER BY event_type""".stripMargin))

  // --------------------------------------------------------------- q100
  /** Time-weighted average price (TWAP) per (event_type, day) over
    * irregular ticks — the kdb-style temporal aggregate q56's OHLC family
    * lacks: each observation holds until the NEXT one (piecewise-constant
    * interpolation), the last of the day until midnight, so a burst of
    * 100 ticks in one minute moves the day's mean by one minute's worth,
    * not 100 observations' worth. `mean_value` (the unweighted mean)
    * rides along precisely to expose that difference.
    *
    * Numerics: weights are exact µs→ms integers from lead(); values are
    * exact cents; Σ(cents·ms) accumulates in DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB) so the aggregate is an order-proof integer sum —
    * the q73/t17 fixed-point convention — and only the final division is
    * float. The day session opens at its first tick (no prior-close
    * carry-in) — the "session TWAP" convention, documented not implied.
    *
    * Scale shape: one projection, one lead() window per (event_type,
    * day) — the partition is a day of one type, the irreducible
    * ordered-scan unit every as-of/merge_asof shares (q25/q89); the
    * day's rows sort-spill within their partition, never globally. The
    * rollup after it is a map-side-combined hash-agg to the (type, day)
    * domain. */
  val q100Twap = QueryDef(
    "q100_twap",
    (s, d) => {
      import Rounding.r6
      val w = Window.partitionBy("event_type", "day")
        .orderBy(col("us").asc, col("event_id").asc)
      val base = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      base
        .withColumn("next_us", coalesce(lead("us", 1).over(w),
          unix_micros(date_add(col("day"), 1).cast("timestamp"))))
        .withColumn("w_ms", expr("(next_us - us) div 1000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_events"),
          sum("w_ms").as("dur_ms"),
          sum(expr("CAST(cents * w_ms AS DECIMAL(38,0))")).as("swv"),
          sum("cents").as("scents"))
        .select(col("event_type"), col("day"), col("n_events"),
          col("dur_ms"),
          r6(col("swv").cast("double") / col("dur_ms") / 100).as("twap"),
          r6(col("scents").cast("double") / col("n_events") / 100)
            .as("mean_value"))
        .orderBy("event_type", "day")
    },
    Some("""WITH base AS (
           |  SELECT event_type, CAST(ts AS DATE) AS day,
           |    epoch_us(ts) AS us, event_id,
           |    CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events),
           |led AS (
           |  SELECT event_type, day, cents,
           |    (coalesce(
           |       lead(us) OVER (PARTITION BY event_type, day
           |                      ORDER BY us, event_id),
           |       epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP))) - us)
           |      // 1000 AS w_ms
           |  FROM base)
           |SELECT event_type, day,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(sum(w_ms) AS BIGINT) AS dur_ms,
           |  round(CAST(sum(CAST(cents AS HUGEINT) * w_ms) AS DOUBLE)
           |        / sum(w_ms) / 100 * 1000000) / 1000000 AS twap,
           |  round(CAST(sum(cents) AS DOUBLE) / count(*) / 100 * 1000000)
           |    / 1000000 AS mean_value
           |FROM led GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q104
  /** CUSUM change-point scan: per event_type the daily mean value is
    * reduced to a cumulative sum of deviations from the series mean;
    * a day is flagged when |CUSUM| exceeds 2× the daily-mean standard
    * deviation — the classic mean-shift detector (a sustained shift
    * accumulates linearly while noise cancels).
    *
    * Scale shape: the raw log collapses to (type, day) by one
    * map-side-combined hash-agg; the series stats are a second tiny agg
    * over that; the running sum windows only the (type × days)
    * aggregate — bounded by the calendar, not the data volume. The
    * deviations feeding the CUSUM are pre-rounded to 6dp so the
    * running float sum is bit-identical across engines and partition
    * counts. */
  /** q104's daily exact-integer milli-unit means: (event_type, day, mi). */
  def q104Daily(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val DayUs = 86400000000L
    Tables.events(s, d)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
        round(col("value") * 1000).cast("long").as("vm"))
      .groupBy("event_type", "day")
      .agg(round(sum("vm") / count(lit(1))).cast("long").as("mi"))
  }

  /** q104's per-type series stats — exact two-pass variance in
    * integers: nd·Σm² − (Σm)². At ingest these land in the catalog; the
    * streaming monitor (Stateful.cusumStream) consumes them as its
    * reference parameters, the surgeIslands/d08 posture. */
  def q104Stats(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("mi").as("sm"),
        sum(col("mi") * col("mi")).as("sm2"))
      .select(col("event_type"), col("nd"), col("sm"),
        sqrt((col("nd") * col("sm2") - col("sm") * col("sm"))
          .cast("double") / (col("nd") * (col("nd") - 1))).as("sd_milli"))

  /** q104's final projection over (event_type, day, mi, cusums, nd,
    * sd_milli) — shared with the streaming twin so both sides apply the
    * IDENTICAL final-division expressions to identical integers (the
    * q100/TWAP parity convention). */
  def q104Finish(withCusum: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    withCusum.select(col("event_type"), col("day"),
      Rounding.r4(col("mi") / 1000.0).as("daily_mean"),
      Rounding.r4(col("cusums").cast("double") / col("nd") / 1000.0)
        .as("cusum"),
      (abs(col("cusums").cast("double") / col("nd")) >
        col("sd_milli") * 2).as("shifted"))
      .orderBy("event_type", "day")

  val q104Cusum = QueryDef(
    "q104_cusum_changepoint",
    (s, d) => {
      // values move in exact BIGINT milli-units; the daily mean is
      // rounded back to an integer so the series stats, deviations, and
      // the running CUSUM are all exact integer arithmetic — order-proof
      // across partitions AND engines. Floats appear only in final
      // per-row divisions of exact integers (deterministic).
      val daily = q104Daily(s, d)
      val stats = q104Stats(daily)
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      q104Finish(daily.join(broadcast(stats), "event_type")
        // dev scaled by nd to stay integer: dev = mi·nd − Σm
        .withColumn("devs", col("mi") * col("nd") - col("sm"))
        .withColumn("cusums", sum("devs").over(w)))
    },
    Some("""WITH daily AS (
           |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           |    CAST(round(sum(CAST(round(value * 1000) AS BIGINT))
           |      / count(*)) AS BIGINT) AS mi
           |  FROM events GROUP BY 1, 2),
           |stats AS (
           |  SELECT event_type, count(*) AS nd, sum(mi) AS sm,
           |    sqrt(CAST(count(*) * sum(mi * mi) - sum(mi) * sum(mi)
           |        AS DOUBLE) / (count(*) * (count(*) - 1))) AS sd_milli
           |  FROM daily GROUP BY 1),
           |cs AS (
           |  SELECT daily.*, nd, sm, sd_milli,
           |    sum(mi * nd - sm) OVER (PARTITION BY event_type
           |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusums
           |  FROM daily JOIN stats USING (event_type))
           |SELECT event_type, day,
           |  round(mi / 1000.0 * 10000) / 10000 AS daily_mean,
           |  round(CAST(cusums AS DOUBLE) / nd / 1000.0 * 10000) / 10000
           |    AS cusum,
           |  abs(CAST(cusums AS DOUBLE) / nd) > sd_milli * 2 AS shifted
           |FROM cs ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q115
  /** Day-of-week activity profile: per event_type, event counts by
    * weekday with each cell's share and its deviation from the uniform
    * 1/7 — the weekly-seasonality companion to q90's hour-of-day
    * profile (staffing follows weekday shape; a flat profile means
    * machine traffic, a weekday hump means humans). Epoch day 0 is a
    * Thursday, so dow = (day + 4) % 7 with Monday = 0 — pure integer
    * arithmetic both engines compute identically, no calendar library.
    *
    * Scale shape: ONE map-side-combined hash-agg to the types×7 grid;
    * totals broadcast back; shares divide exact integers. */
  val q115WeekdayProfile = QueryDef(
    "q115_weekday_profile",
    (s, d) => {
      val DayUs = 86400000000L
      val cells = Tables.events(s, d)
        .select(col("event_type"),
          (((unix_micros(col("ts")) / DayUs) + 4L) % 7L).cast("int")
            .as("dow"))
        .groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("event_type")
        .agg(sum("n").as("tot"))
        .withColumnRenamed("event_type", "et_t")
      cells.join(broadcast(totals), col("event_type") === col("et_t"))
        .select(col("event_type"), col("dow"), col("n"),
          Rounding.r6(col("n").cast("double") / col("tot")).as("share"),
          Rounding.r6(col("n").cast("double") / col("tot") - 1.0 / 7.0)
            .as("dev_from_uniform"))
        .orderBy("event_type", "dow")
    },
    Some("""WITH cells AS (
           |  SELECT event_type,
           |    CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS INT) AS dow,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |tot AS (SELECT event_type, sum(n) AS tot FROM cells GROUP BY 1)
           |SELECT event_type, dow, n,
           |  round(CAST(n AS DOUBLE) / tot * 1000000) / 1000000 AS share,
           |  round((CAST(n AS DOUBLE) / tot - 1.0 / 7.0) * 1000000)
           |    / 1000000 AS dev_from_uniform
           |FROM cells JOIN tot USING (event_type)
           |ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q119
  /** Holt double-exponential smoothing with a one-step-ahead backtest:
    * per event_type, the daily-mean series is smoothed with level +
    * trend state (α = 0.5, β = 0.25 — exact binary fractions, so the
    * float recursion is bit-identical across engines), and each day is
    * scored against the forecast made BEFORE seeing it — q64's EWMA
    * upgraded with a trend term and an honest backtest column.
    *
    * Scale shape: the corpus-sized work is q104's one hash-agg to the
    * types×days grid (exact milli-unit integer means); the smoothing
    * fold runs per type over the day-bounded series in flatMapGroups —
    * inherently sequential per key, parallel across keys, the q64
    * posture. */
  /** Shared final projection over (event_type, day, mi, f) rows —
    * identical code for the batch fold and the streaming twin's
    * emitted days. */
  def q119Finish(raw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.functions.Rounding.r4
    raw.select(col("event_type"), col("day"),
      r4(col("mi") / 1000.0).as("daily_mean"),
      r4(col("f") / 1000.0).as("forecast"),
      r4(abs(col("mi").cast("double") - col("f")) / 1000.0).as("abs_err"))
      .orderBy("event_type", "day")
  }

  val q119HoltForecast = QueryDef(
    "q119_holt_forecast",
    (s, d) => {
      import s.implicits._
      val daily = q104Daily(s, d).as[(String, Long, Long)]
      val raw = daily.groupByKey(_._1)
        .flatMapGroups { (k, it) =>
          val pts = it.toArray.sortBy(_._2)
          var l = 0.0; var b = 0.0
          pts.iterator.zipWithIndex.map { case ((_, day, mi), i) =>
            val m = mi.toDouble
            val fOpt = if (i == 0) None else Some(l + b)
            if (i == 0) { l = m; b = 0.0 }
            else {
              val lNew = 0.5 * m + 0.5 * (l + b)
              b = 0.25 * (lNew - l) + 0.75 * b
              l = lNew
            }
            (k, day, mi, fOpt)
          }
        }
        .toDF("event_type", "day", "mi", "f")
      q119Finish(raw)
    },
    Some("""WITH RECURSIVE daily AS (
           |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           |    CAST(round(sum(CAST(round(value * 1000) AS BIGINT))
           |      / count(*)) AS BIGINT) AS mi
           |  FROM events GROUP BY 1, 2),
           |s AS (
           |  SELECT event_type, day, mi,
           |    row_number() OVER (PARTITION BY event_type ORDER BY day)
           |      AS rn
           |  FROM daily),
           |r AS (
           |  SELECT event_type, day, mi, rn, CAST(mi AS DOUBLE) AS l,
           |    CAST(0 AS DOUBLE) AS b, CAST(NULL AS DOUBLE) AS f
           |  FROM s WHERE rn = 1
           |  UNION ALL
           |  SELECT s.event_type, s.day, s.mi, s.rn,
           |    0.5 * s.mi + 0.5 * (r.l + r.b),
           |    0.25 * ((0.5 * s.mi + 0.5 * (r.l + r.b)) - r.l)
           |      + 0.75 * r.b,
           |    r.l + r.b
           |  FROM s JOIN r ON s.event_type = r.event_type
           |    AND s.rn = r.rn + 1)
           |SELECT event_type, day,
           |  round(mi / 1000.0 * 10000) / 10000 AS daily_mean,
           |  round(f / 1000.0 * 10000) / 10000 AS forecast,
           |  round(abs(CAST(mi AS DOUBLE) - f) / 1000.0 * 10000) / 10000
           |    AS abs_err
           |FROM r ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q179
  /** Exponentially time-decayed popularity per part (30-day half-life,
    * anchored at the corpus's last ship day): the freshness-weighted
    * ranking a feature store / recommender serves instead of raw
    * counts — one order last week outweighs five from two years ago.
    * Each line's decay factor exp(−ln2/30 · age_days) rounds to a
    * micro BIGINT BEFORE the per-part sum (the fixed-point posture:
    * exact integer totals, order- and partition-proof; q143's
    * exp-term precedent), and the top-20 ties break on partkey.
    *
    * Scale shape: the anchor is a single-column max (a catalog stat at
    * ingest) broadcast back; ONE map-side-combined hash-agg onto the
    * part grid; top-20 is a TakeOrdered; the 20-row result broadcasts
    * into the name join. A streaming twin is the same commutative
    * micro-counter per part. */
  val q179DecayedPopularity = QueryDef(
    "q179_decayed_popularity",
    (s, d) => {
      val DayUs = 86400000000L
      val now = Tables.lineitem(s, d)
        .agg(max(expr(s"unix_micros(cast(l_shipdate as timestamp)) div ${DayUs}L"))
          .as("now_day"))
      val scored = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr(s"unix_micros(cast(l_shipdate as timestamp)) div ${DayUs}L")
            .as("ship_day"))
        .crossJoin(broadcast(now))
        .select(col("l_partkey"),
          expr("cast(round(1e6 * exp(-ln(2) / 30.0" +
            " * (now_day - ship_day))) as bigint)").as("w_micro"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_lines"), sum("w_micro").as("score_micro"))
        .orderBy(col("score_micro").desc, col("l_partkey").asc)
        .limit(20)
      scored.join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey").as("part_key"), col("p_name"),
          col("n_lines"), col("score_micro"))
        .orderBy(col("score_micro").desc, col("part_key").asc)
    },
    Some("""WITH anchor AS (
           |  SELECT max(epoch_us(l_shipdate) // 86400000000) AS now_day
           |  FROM lineitem),
           |scored AS (
           |  SELECT l_partkey,
           |    CAST(count(*) AS BIGINT) AS n_lines,
           |    CAST(sum(CAST(round(1e6 * exp(-ln(2) / 30.0
           |      * (now_day - epoch_us(l_shipdate) // 86400000000)))
           |      AS BIGINT)) AS BIGINT) AS score_micro
           |  FROM lineitem CROSS JOIN anchor GROUP BY 1
           |  ORDER BY score_micro DESC, l_partkey ASC LIMIT 20)
           |SELECT l_partkey AS part_key, p_name, n_lines, score_micro
           |FROM scored JOIN part ON l_partkey = p_partkey
           |ORDER BY score_micro DESC, part_key ASC""".stripMargin))

  val all: Seq[QueryDef] = Seq(q48Scd2, q55GapFill, q56Ohlc, q60Anomaly,
    q63SeriesCorr, q64Ewma, q65Autocorr, q78SnapshotDiff, q84IntervalJoin,
    q89AsofDirections, q90SeasonalNaive, q95RollingQuantiles, q97MergeApply,
    q100Twap, q104Cusum, q115WeekdayProfile, q119HoltForecast,
    q179DecayedPopularity)
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

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
    * Scale shape: the spine explode is per-user (no driver loop, no
    * global range), the left join shuffles on (user_id, bucket), and
    * both fill windows share ONE partition+order (user_id, hr) so the
    * carry columns cost a single exchange + sort. State per row is four
    * scalars — no collect_list of the series. */
  val q55GapFill = QueryDef(
    "q55_gap_fill",
    (s, d) => {
      val sparse = Tables.events(s, d)
        .select(col("user_id"),
          floor(col("ts").cast("long") / 21600).as("hr"), col("value"))
        .groupBy("user_id", "hr").agg(avg("value").as("v"))
      val spine = sparse.groupBy("user_id")
        .agg(min("hr").as("mn"), max("hr").as("mx"))
        .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("hr"))
      val wP = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wN = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      import graft.functions.Rounding.r4
      spine.join(sparse, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"), col("v"),
          last("v", ignoreNulls = true).over(wP).as("pv"),
          last(when(col("v").isNotNull, col("hr")), ignoreNulls = true)
            .over(wP).as("ph"),
          first("v", ignoreNulls = true).over(wN).as("nv"),
          first(when(col("v").isNotNull, col("hr")), ignoreNulls = true)
            .over(wN).as("nh"))
        .select(col("user_id"), col("hr"),
          col("v").isNotNull.cast("int").as("observed"),
          r4(coalesce(col("pv"), col("nv"))).as("v_ffill"),
          r4(when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .when(col("nh") === col("ph"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("hr") - col("ph")) / (col("nh") - col("ph"))))
            .as("v_interp"))
        .orderBy("user_id", "hr")
    },
    Some("""WITH sparse AS (
           |  SELECT user_id, CAST(floor(epoch(ts)/21600.0) AS BIGINT) AS hr,
           |         avg(value) AS v
           |  FROM events GROUP BY 1, 2),
           |spine AS (
           |  SELECT user_id, unnest(range(mn, mx + 1)) AS hr
           |  FROM (SELECT user_id, min(hr) AS mn, max(hr) AS mx
           |        FROM sparse GROUP BY 1)),
           |grid AS (
           |  SELECT s.user_id, s.hr, p.v FROM spine s
           |  LEFT JOIN sparse p ON s.user_id = p.user_id AND s.hr = p.hr),
           |carried AS (
           |  SELECT user_id, hr, v,
           |    last_value(v IGNORE NULLS) OVER wp AS pv,
           |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           |      OVER wp AS ph,
           |    first_value(v IGNORE NULLS) OVER wn AS nv,
           |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           |      OVER wn AS nh
           |  FROM grid
           |  WINDOW
           |    wp AS (PARTITION BY user_id ORDER BY hr ROWS UNBOUNDED PRECEDING),
           |    wn AS (PARTITION BY user_id ORDER BY hr
           |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           |SELECT user_id, hr, CAST(v IS NOT NULL AS INT) AS observed,
           |  round(COALESCE(pv, nv) * 10000) / 10000 AS v_ffill,
           |  round(CASE WHEN pv IS NULL THEN nv
           |             WHEN nv IS NULL THEN pv
           |             WHEN nh = ph THEN pv
           |             ELSE pv + (nv - pv) * (hr - ph) / (nh - ph)
           |        END * 10000) / 10000 AS v_interp
           |FROM carried ORDER BY user_id, hr""".stripMargin))

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

  val all: Seq[QueryDef] = Seq(q48Scd2, q55GapFill, q56Ohlc)
}

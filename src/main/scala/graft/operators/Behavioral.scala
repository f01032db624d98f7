package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.Rounding.{r2, r4, r6}

/** Behavioral / product-analytics operators over the event stream: the
  * ordered funnel and the cohort-retention matrix. These are the two
  * queries every event-analytics engine (the reference's domain —
  * keyed, timestamped envelopes) is ultimately asked for, and both
  * reduce to per-key aggregates + equi-joins, so they hold their shape
  * on an arbitrarily large event log.
  */
object Behavioral {

  // ---------------------------------------------------------------- q57
  /** Ordered funnel: view → click → purchase, each step strictly AFTER
    * the user's previous step (not merely "did both") — the sequencing
    * is what makes this a funnel and not three filters. Step k is the
    * per-user min event time of the step type among events after the
    * user's step-(k-1) time.
    *
    * Scale shape: each step is filter → per-user hash-agg → equi-join on
    * user_id with the (strictly smaller) previous step table; no window
    * over the raw log, no per-user event collection. The final counts
    * are three scalars; conversion comes from one lag over a 3-row
    * frame. */
  val q57Funnel = QueryDef(
    "q57_funnel",
    (s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val steps = s1.agg(count(lit(1)).as("users"))
        .select(lit(1).as("step"), lit("view").as("step_name"), col("users"))
        .unionByName(s2.agg(count(lit(1)).as("users"))
          .select(lit(2).as("step"), lit("click").as("step_name"), col("users")))
        .unionByName(s3.agg(count(lit(1)).as("users"))
          .select(lit(3).as("step"), lit("purchase").as("step_name"),
            col("users")))
      val w = Window.orderBy("step")
      steps
        .withColumn("conversion",
          r4(coalesce(col("users") / lag("users", 1).over(w), lit(1.0))))
        .orderBy("step")
    },
    Some("""WITH s1 AS (
           |  SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |s2 AS (
           |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
           |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
           |s3 AS (
           |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
           |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
           |steps AS (
           |  SELECT 1 AS step, 'view' AS step_name,
           |         CAST(count(*) AS BIGINT) AS users FROM s1
           |  UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
           |  UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3)
           |SELECT step, step_name, users,
           |  round(COALESCE(users / CAST(lag(users) OVER (ORDER BY step)
           |    AS DOUBLE), 1.0) * 10000) / 10000 AS conversion
           |FROM steps ORDER BY step""".stripMargin))

  // ---------------------------------------------------------------- q58
  /** Cohort retention: users grouped by first-seen day, tracked by how
    * many are active again k days later — the (cohort × offset)
    * retention matrix, normalized by the cohort's day-0 size.
    *
    * Scale shape: first-seen day is one per-user hash-agg over the log;
    * activity is a distinct (user, day) projection (map-side combined);
    * the join back is user_id equi-join; day-0 normalization is a
    * first_value window over the already-aggregated (cohort, offset)
    * matrix — bounded cardinality, no second pass over the log. */
  val q58Retention = QueryDef(
    "q58_retention",
    (s, d) => {
      val day = floor(col("ts").cast("long") / 86400)
      val ev = Tables.events(s, d).select(col("user_id"), day.as("day"))
      val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val active = ev.distinct()
      val matrix = active.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("users"))
      val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      matrix
        .withColumn("retention",
          r4(col("users") / first("users").over(w)))
        .orderBy("cohort_day", "day_offset")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(floor(epoch(ts)/86400.0) AS BIGINT) AS day
           |  FROM events),
           |cohort AS (
           |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
           |active AS (SELECT DISTINCT user_id, day FROM ev),
           |matrix AS (
           |  SELECT cohort_day, day - cohort_day AS day_offset,
           |         CAST(count(*) AS BIGINT) AS users
           |  FROM active JOIN cohort USING (user_id) GROUP BY 1, 2)
           |SELECT cohort_day, day_offset, users,
           |  round(users / CAST(first_value(users) OVER (
           |    PARTITION BY cohort_day ORDER BY day_offset) AS DOUBLE)
           |    * 10000) / 10000 AS retention
           |FROM matrix ORDER BY cohort_day, day_offset""".stripMargin))

  // ---------------------------------------------------------------- q61
  /** First-order Markov transition matrix between event types: per user,
    * each event's predecessor type (lag over the user's timeline), then
    * transition counts and row-normalized probabilities — the behavioral
    * model behind next-action prediction and path analysis.
    *
    * Scale shape: the lag window partitions on user_id (high cardinality
    * — one exchange, arbitrary parallelism); the pair aggregate is
    * map-side combined into a card(types)² matrix, and the normalizing
    * window runs over that tiny matrix only. */
  /** Shared tail of q61: count a (prev_type, next_type) pair table and
    * row-normalize. Factored out so the streaming twin
    * (Stateful.markovStream's emitted transitions) runs IDENTICAL code
    * after its incremental per-user pass — all-integer counts, so the
    * twin is bit-for-bit. */
  def q61Rollup(pairs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pairs.groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .withColumn("p",
        r6(col("n") / sum("n").over(Window.partitionBy("prev_type"))))
      .orderBy("prev_type", "next_type")

  val q61Markov = QueryDef(
    "q61_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      q61Rollup(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type"), col("event_type").as("next_type")))
    },
    Some("""WITH seq AS (
           |  SELECT user_id, event_type,
           |    lag(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS prev_type
           |  FROM events),
           |pairs AS (
           |  SELECT prev_type, event_type AS next_type,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
           |SELECT prev_type, next_type, n,
           |  round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
           |    * 1000000) / 1000000 AS p
           |FROM pairs ORDER BY prev_type, next_type""".stripMargin))

  // ---------------------------------------------------------------- q62
  /** Session path analysis: the top-20 opening paths (first three event
    * types, in order) across q37-style sessions (>10 min silence splits)
    * — the "where do sessions start" query behind every sankey/path
    * report.
    *
    * Scale shape: one exchange on user_id feeds the gap windows AND the
    * per-session row_number (same leading key); the path assembly sorts
    * a ≤3-element array per session (array_sort over collect_list is
    * order-insensitive to shuffle nondeterminism — the rn key makes the
    * path deterministic); path counting is a bounded-cardinality
    * hash-agg and the top-20 is a TakeOrdered, not a global sort. */
  /** Shared tail of q62: count a per-session `path` table and take the
    * top 20 — all-integer, shared with the streaming twin
    * (Stateful.sessionPathStream) for bit-for-bit parity. */
  def q62Rollup(paths: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)

  val q62SessionPaths = QueryDef(
    "q62_session_paths",
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bySess = Window.partitionBy("user_id", "sess")
        .orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(byUser)))
        .withColumn("is_break",
          when(col("gap_us").isNull || col("gap_us") > 600L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess", sum("is_break").over(run))
        .withColumn("rn", row_number().over(bySess))
        .filter(col("rn") <= 3)
        .groupBy("user_id", "sess")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .transform(q62Rollup)
    },
    Some("""WITH gapped AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |marked AS (
           |  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 600 * 1000000
           |                 THEN 1 ELSE 0 END AS is_break
           |  FROM gapped),
           |sessions AS (
           |  SELECT *, sum(is_break) OVER (PARTITION BY user_id
           |    ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           |  FROM marked),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY user_id, sess
           |    ORDER BY ts, event_id) AS rn
           |  FROM sessions),
           |paths AS (
           |  SELECT user_id, sess,
           |    string_agg(event_type, '>' ORDER BY rn) AS path
           |  FROM ranked WHERE rn <= 3 GROUP BY 1, 2)
           |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
           |FROM paths GROUP BY 1
           |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------- q68
  /** First/last-touch conversion attribution: for each user's FIRST
    * purchase, credit the first and the last touch event (view/click)
    * strictly before it — the marketing-analytics question the funnel
    * doesn't answer (which touch type opens journeys vs which closes
    * them), plus the mean last-touch→conversion latency per path.
    * "Strictly before" is (ts, event_id) tuple order, so a same-ts
    * touch/purchase pair resolves identically in both engines.
    *
    * Scale shape: one exchange on user_id for the first-purchase window,
    * one equi-join of touches against the (≤ one row per user) purchase
    * table, then the q56 open/close trick — first/last touch via two
    * row_number windows over the SAME (user_id) partitioning the join
    * just produced — and a final card(types²) hash-agg. No per-user
    * collection, no self-join on the raw log. */
  /** Shared tail of q68: roll a per-user (first_touch, last_touch,
    * gap_us) table into the attribution matrix. The mean latency sums
    * exact integer µs before the one division, so the rollup is
    * order-proof and the streaming twin (Stateful.attributionStream)
    * matches bit-for-bit. */
  def q68Rollup(perUser: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    perUser.groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("n_conversions"),
        r4(sum("gap_us").cast("double") / 60000000.0 / count(lit(1)))
          .as("avg_mins_to_convert"))
      .orderBy("first_touch", "last_touch")

  val q68Attribution = QueryDef(
    "q68_attribution",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val conv = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("conv_ts"),
          col("event_id").as("conv_id"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .filter(struct(col("ts"), col("event_id")) <
          struct(col("conv_ts"), col("conv_id")))
      val wa = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val wd = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      touches
        .withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy("user_id")
        .agg(max(when(col("rn_a") === 1, col("event_type"))).as("first_touch"),
          max(when(col("rn_d") === 1, col("event_type"))).as("last_touch"),
          max(when(col("rn_d") === 1,
            unix_micros(col("conv_ts")) - unix_micros(col("ts"))))
            .as("gap_us"))
        .transform(q68Rollup)
    },
    Some("""WITH conv AS (
           |  SELECT user_id, ts AS conv_ts, event_id AS conv_id
           |  FROM (SELECT user_id, ts, event_id,
           |          row_number() OVER (PARTITION BY user_id
           |            ORDER BY ts, event_id) AS rn
           |        FROM events WHERE event_type = 'purchase')
           |  WHERE rn = 1),
           |touches AS (
           |  SELECT e.user_id, e.ts, e.event_id, e.event_type,
           |         c.conv_ts, c.conv_id,
           |    row_number() OVER (PARTITION BY e.user_id
           |      ORDER BY e.ts ASC, e.event_id ASC) AS rn_a,
           |    row_number() OVER (PARTITION BY e.user_id
           |      ORDER BY e.ts DESC, e.event_id DESC) AS rn_d
           |  FROM events e JOIN conv c USING (user_id)
           |  WHERE e.event_type IN ('view', 'click')
           |    AND (e.ts, e.event_id) < (c.conv_ts, c.conv_id)),
           |per_user AS (
           |  SELECT user_id,
           |    max(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
           |    max(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch,
           |    max(CASE WHEN rn_d = 1 THEN
           |      epoch_us(conv_ts) - epoch_us(ts) END) AS gap_us
           |  FROM touches GROUP BY 1)
           |SELECT first_touch, last_touch,
           |  CAST(count(*) AS BIGINT) AS n_conversions,
           |  round(CAST(sum(gap_us) AS DOUBLE) / 60000000.0 / count(*)
           |    * 10000) / 10000 AS avg_mins_to_convert
           |FROM per_user GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q80
  /** Sliding-window EXACT distinct actives: per 6-hour bucket, the
    * number of distinct users seen in the trailing 24 hours (4 buckets)
    * — the rolling-actives series every engagement dashboard wants,
    * where the window overlap is what makes naive COUNT(DISTINCT)
    * per-window a 4× re-scan. Spelled as the posting-list trick: dedup
    * (user, bucket) once, EXPLODE each appearance into the ≤4 windows
    * it can serve, dedup (user, window), count — set semantics make the
    * overlap free, and no range self-join or per-window re-scan ever
    * happens.
    *
    * Scale shape: two hash-aggs with map-side partials and a constant
    * explode factor (window span / bucket size = 4); state per task is
    * bounded, traffic ∝ distinct (user, bucket) pairs, not events. */
  val q80SlidingDistinct = QueryDef(
    "q80_sliding_distinct",
    (s, d) => {
      val seen = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 21600000000").as("hr"))
        .distinct()
      val observed = seen.select(col("hr")).distinct()
      seen.select(col("user_id"),
          explode(sequence(col("hr"), col("hr") + 3)).as("win"))
        .distinct()
        .join(broadcast(observed), col("win") === col("hr"), "left_semi")
        .groupBy("win").agg(count(lit(1)).as("n_active_users"))
        .select(col("win").as("window_end_bucket"), col("n_active_users"))
        .orderBy("window_end_bucket")
    },
    Some("""WITH seen AS (
           |  SELECT DISTINCT user_id, epoch_us(ts) // 21600000000 AS hr
           |  FROM events),
           |observed AS (SELECT DISTINCT hr FROM seen),
           |cover AS (
           |  SELECT DISTINCT user_id, hr + k AS win
           |  FROM seen CROSS JOIN (SELECT unnest(range(0, 4)) AS k))
           |SELECT c.win AS window_end_bucket,
           |  CAST(count(*) AS BIGINT) AS n_active_users
           |FROM cover c
           |WHERE c.win IN (SELECT hr FROM observed)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q83
  /** Peak concurrency per (event_type, day) — the interval-sweep shape
    * (max simultaneous sessions = capacity planning / peak-load metric).
    * Each event opens a 30-minute session clipped at midnight; the sweep
    * is MINUTE-BUCKETED: +1/−1 deltas hash-agg down to at most 1440
    * net-delta rows per (type, day) BEFORE any ordered scan, so the
    * running sum's window partitions are domain-bounded regardless of
    * corpus size — the q59 histogram lesson applied to interval
    * stabbing. (The unbucketed exact sweep would sort every event in a
    * (type, day) partition — the q54 scale-killer.) Semantics: a session
    * is active from its start minute through the minute before its end
    * minute; concurrency is measured at minute resolution.
    *
    * Scale shape: corpus-sized data crosses one exchange (the delta
    * hash-agg, map-side combined); the cumulative window and peak agg
    * run over ≤ types×1440 rows per day. */
  /** q83's net-delta grid + session-start grid → peak report, shared
    * with the concurrencyStream twin (identical code over identical
    * integer cells ⇒ bit-for-bit). `net` columns: event_type, day,
    * minute, net; `starts`: event_type, day, n_sessions. Minutes whose
    * deltas cancel to zero may be absent — a zero-net minute's running
    * sum equals its predecessor's, so the per-day max is unchanged. */
  def q83Finish(net: org.apache.spark.sql.DataFrame,
      starts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("event_type", "day").orderBy("minute")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    net.withColumn("cum", sum("net").over(w))
      .groupBy("event_type", "day")
      .agg(max("cum").as("peak"))
      .join(starts, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_sessions"),
        col("peak"))
      .orderBy("event_type", "day")
  }

  val q83PeakConcurrency = QueryDef(
    "q83_peak_concurrency",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 60000000").as("m0"))
        .select(col("event_type"), col("m0"),
          expr("m0 div 1440").as("day"))
      val deltas = ev
        .select(col("event_type"), col("day"), col("m0").as("minute"),
          lit(1L).as("delta"))
        .union(ev
          .select(col("event_type"), col("day"),
            least(col("m0") + 30L, (col("day") + 1L) * 1440L).as("minute"),
            lit(-1L).as("delta"))
          .filter(col("minute") < (col("day") + 1L) * 1440L))
      val net = deltas.groupBy("event_type", "day", "minute")
        .agg(sum("delta").as("net"))
      val starts = ev.groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_sessions"))
      q83Finish(net, starts)
    },
    Some("""WITH ev AS (
           |  SELECT event_type, epoch_us(ts) // 60000000 AS m0,
           |    (epoch_us(ts) // 60000000) // 1440 AS day
           |  FROM events),
           |deltas AS (
           |  SELECT event_type, day, m0 AS minute, 1 AS delta FROM ev
           |  UNION ALL
           |  SELECT event_type, day,
           |    least(m0 + 30, (day + 1) * 1440) AS minute, -1 AS delta
           |  FROM ev WHERE least(m0 + 30, (day + 1) * 1440) < (day + 1) * 1440),
           |net AS (
           |  SELECT event_type, day, minute, CAST(sum(delta) AS BIGINT) AS net
           |  FROM deltas GROUP BY 1, 2, 3),
           |cum AS (
           |  SELECT event_type, day,
           |    sum(net) OVER (PARTITION BY event_type, day ORDER BY minute
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM net),
           |pk AS (SELECT event_type, day, CAST(max(cum) AS BIGINT) AS peak
           |  FROM cum GROUP BY 1, 2),
           |st AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_sessions
           |  FROM ev GROUP BY 1, 2)
           |SELECT event_type, day, n_sessions, peak
           |FROM pk JOIN st USING (event_type, day)
           |ORDER BY event_type, day""".stripMargin))

  // ---------------------------------------------------------------- q85
  /** Activity-decile mobility: split the event timeline into two halves
    * at its midpoint day, rank each half's active users into activity
    * deciles (by event count, value-based), and cross-tabulate the
    * 10×10 transition matrix over users active in BOTH halves — the
    * relational form of the drift question s12 asks of embeddings (is
    * the population's behavior distribution stable between two corpus
    * snapshots?). All-integer (counts, histogram cumsums, value-based
    * decile arithmetic), so both engines agree bit-for-bit.
    *
    * Scale shape: ONE map-side-combined hash-agg collapses the corpus
    * to a users-sized (c1, c2) table (at corpus scale this lands as an
    * ingest artifact — the d03 precedent — instead of re-deriving per
    * branch). Decile assignment is q59's histogram trick: each half's
    * count-value histogram (bounded by the count DOMAIN, not user
    * volume) flows through a tiny cumulative window and broadcast-joins
    * back by value, so no ntile window ever sees user-sized data. The
    * timeline midpoint comes from one min/max agg (a catalog stat at
    * ingest — the d08 precedent). */
  /** q85's decile cross-tab over a per-user (user_id, c1, c2) half-count
    * table: value-based decile assignment via count-value histograms (the
    * q59 trick — the windows only ever see the bounded count domain) and
    * the 10×10 transition matrix over users active in BOTH halves.
    * Exposed so the streaming twin's parity spec runs the IDENTICAL
    * mapping over its incrementally-maintained half counts. */
  def q85DecileCrossTab(wide: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def decileMap(cnts: org.apache.spark.sql.DataFrame, dcol: String)
        : org.apache.spark.sql.DataFrame = {
      val wCum = Window.orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // histogram of count VALUES — bounded by the count domain; the
      // global windows run over this bounded table, never over users
      cnts.groupBy("cnt").agg(count(lit(1)).as("freq"))
        .withColumn("cum", sum("freq").over(wCum))
        .withColumn("n_all", sum("freq").over(wAll))
        .select(col("cnt"),
          expr("CAST((10 * cum - 1) DIV n_all + 1 AS INT)").as(dcol))
    }
    val map1 = decileMap(
      wide.filter(col("c1") > 0L).select(col("c1").as("cnt")),
      "decile_before")
    val map2 = decileMap(
      wide.filter(col("c2") > 0L).select(col("c2").as("cnt")),
      "decile_after")
    wide.filter(col("c1") > 0L && col("c2") > 0L)
      .join(broadcast(map1.withColumnRenamed("cnt", "c1")), Seq("c1"))
      .join(broadcast(map2.withColumnRenamed("cnt", "c2")), Seq("c2"))
      .groupBy("decile_before", "decile_after")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("decile_before", "decile_after")
  }

  val q85DecileMobility = QueryDef(
    "q85_decile_mobility",
    (s, d) => {
      val DayUs = 86400000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr(s"unix_micros(ts) div ${DayUs}L").as("day"))
      val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
      val wide = ev.crossJoin(broadcast(span))
        .groupBy("user_id")
        .agg(
          sum(when(col("day") < expr("(d0 + d1 + 1) div 2"), 1L)
            .otherwise(0L)).as("c1"),
          sum(when(col("day") >= expr("(d0 + d1 + 1) div 2"), 1L)
            .otherwise(0L)).as("c2"))
      q85DecileCrossTab(wide)
    },
    Some("""WITH ev85 AS (
           |  SELECT user_id, epoch_us(ts) // 86400000000 AS day
           |  FROM events),
           |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev85),
           |wide AS (
           |  SELECT user_id,
           |    sum(CASE WHEN day < (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END) AS c1,
           |    sum(CASE WHEN day >= (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END) AS c2
           |  FROM ev85 CROSS JOIN span GROUP BY 1),
           |hist1 AS (SELECT c1 AS cnt, count(*) AS freq
           |  FROM wide WHERE c1 > 0 GROUP BY 1),
           |map1 AS (SELECT cnt,
           |    CAST((10 * sum(freq) OVER (ORDER BY cnt
           |        ROWS UNBOUNDED PRECEDING) - 1)
           |      // sum(freq) OVER () + 1 AS INT) AS decile_before
           |  FROM hist1),
           |hist2 AS (SELECT c2 AS cnt, count(*) AS freq
           |  FROM wide WHERE c2 > 0 GROUP BY 1),
           |map2 AS (SELECT cnt,
           |    CAST((10 * sum(freq) OVER (ORDER BY cnt
           |        ROWS UNBOUNDED PRECEDING) - 1)
           |      // sum(freq) OVER () + 1 AS INT) AS decile_after
           |  FROM hist2)
           |SELECT decile_before, decile_after,
           |  CAST(count(*) AS BIGINT) AS n_users
           |FROM wide
           |JOIN map1 ON wide.c1 = map1.cnt
           |JOIN map2 ON wide.c2 = map2.cnt
           |WHERE c1 > 0 AND c2 > 0
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Shared scoring + rollup tail of q102: band a per-customer
    * (rec_days, freq, mon_cents) table into 1–5 RFM scores and roll up
    * per cell. Factored out so the streaming twin (Stateful.rfmStream's
    * emitted snapshot) runs IDENTICAL code after its incremental
    * per-customer state pass. */
  def q102Rollup(per: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = per
      .withColumn("r_score",
        when(col("rec_days") <= 60, 5).when(col("rec_days") <= 120, 4)
          .when(col("rec_days") <= 240, 3).when(col("rec_days") <= 400, 2)
          .otherwise(1))
      .withColumn("f_score",
        when(col("freq") >= 14, 5).when(col("freq") >= 12, 4)
          .when(col("freq") >= 10, 3).when(col("freq") >= 8, 2)
          .otherwise(1))
      .withColumn("m_score",
        when(col("mon_cents") >= 320000000L, 5)
          .when(col("mon_cents") >= 260000000L, 4)
          .when(col("mon_cents") >= 220000000L, 3)
          .when(col("mon_cents") >= 170000000L, 2)
          .otherwise(1))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        r2(sum("mon_cents") / 100.0 / count(lit(1))).as("avg_monetary"),
        r2(sum("rec_days").cast("double") / count(lit(1)))
          .as("avg_rec_days"))
      .orderBy("r_score", "f_score", "m_score")
  }

  // --------------------------------------------------------------- q102
  /** RFM segmentation over the order history: per customer recency
    * (days since last order, against the corpus max date — a catalog
    * stat), frequency (order count) and monetary (lifetime spend), each
    * banded into a 1–5 score by FIXED value thresholds, then rolled up
    * per (r, f, m) cell.
    *
    * Fixed bands, not ntile, deliberately: quantile scoring needs a
    * global rank (one window over every customer — the q54-style exact
    * form that q59 exists to replace), while fixed bands are a pure
    * projection + hash aggregate, so the query is two map-side-combined
    * shuffles at any scale. The thresholds are the quintile boundaries
    * of the synthetic corpus, frozen as constants the way a production
    * scoring job freezes its band definitions. */
  val q102RfmSegments = QueryDef(
    "q102_rfm_segments",
    (s, d) => {
      val DayUs = 86400000000L
      // o_orderdate is TIMESTAMP_NTZ; the cast is an identity under the
      // UTC session TZ both engines pin. Money moves in exact BIGINT
      // cents so every sum is order-proof (the t17/q100 convention).
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"),
          (unix_micros(col("o_orderdate").cast("timestamp")) / DayUs)
            .cast("long").as("day"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      // corpus max date: single-column scan → one scalar (catalog stat)
      val span = Tables.orders(s, d)
        .select((unix_micros(col("o_orderdate").cast("timestamp")) / DayUs)
          .cast("long").as("day"))
        .agg(max("day").as("dmax"))
      val per = ord.crossJoin(broadcast(span))
        .groupBy("o_custkey")
        .agg(min(col("dmax") - col("day")).as("rec_days"),
          count(lit(1)).as("freq"),
          sum("cents").as("mon_cents"))
      q102Rollup(per)
    },
    Some("""WITH per AS (
           |  SELECT o_custkey,
           |    min((SELECT max(epoch_us(o_orderdate) // 86400000000)
           |         FROM orders) - epoch_us(o_orderdate) // 86400000000)
           |      AS rec_days,
           |    count(*) AS freq,
           |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon_cents
           |  FROM orders GROUP BY 1),
           |scored AS (
           |  SELECT *,
           |    CASE WHEN rec_days <= 60 THEN 5 WHEN rec_days <= 120 THEN 4
           |         WHEN rec_days <= 240 THEN 3 WHEN rec_days <= 400 THEN 2
           |         ELSE 1 END AS r_score,
           |    CASE WHEN freq >= 14 THEN 5 WHEN freq >= 12 THEN 4
           |         WHEN freq >= 10 THEN 3 WHEN freq >= 8 THEN 2
           |         ELSE 1 END AS f_score,
           |    CASE WHEN mon_cents >= 320000000 THEN 5
           |         WHEN mon_cents >= 260000000 THEN 4
           |         WHEN mon_cents >= 220000000 THEN 3
           |         WHEN mon_cents >= 170000000 THEN 2
           |         ELSE 1 END AS m_score
           |  FROM per)
           |SELECT r_score, f_score, m_score,
           |  CAST(count(*) AS BIGINT) AS n_customers,
           |  round(sum(mon_cents) / 100.0 / count(*) * 100) / 100
           |    AS avg_monetary,
           |  round(CAST(sum(rec_days) AS DOUBLE) / count(*) * 100) / 100
           |    AS avg_rec_days
           |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** Shared tail of q103: roll a per-(customer, cohort-month,
    * order-month) cell table — columns (o_custkey, cm, om, n, mcents) —
    * into the registered cohort-LTV output. Factored out so the
    * streaming twin (Stateful.cohortStream's emitted snapshot) runs
    * IDENTICAL code after its incremental per-customer state pass. */
  def q103Rollup(custMonth: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // cells and sizes both derive from custMonth — rename the join key
    // on the sizes side so the self-join never carries conflicting
    // attribute references (bites when custMonth is a memory-sink table)
    val sizes = custMonth.select("o_custkey", "cm").distinct()
      .groupBy("cm").agg(count(lit(1)).as("cohort_size"))
      .withColumnRenamed("cm", "cm_sz")
    val cells = custMonth
      .withColumn("age", (col("om") - col("cm")).cast("int"))
      .groupBy(col("cm"), col("age"))
      .agg(sum("n").as("n_orders"), count(lit(1)).as("n_active"),
        sum("mcents").as("rev_cents"))
    val w = Window.partitionBy("cm").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(sizes), col("cm") === col("cm_sz"))
      .drop("cm_sz")
      .withColumn("cum_cents", sum("rev_cents").over(w))
      .select(
        ((col("cm") - 1) / 12).cast("int").as("cohort_year"),
        (((col("cm") - 1) % 12) + 1).cast("int").as("cohort_month"),
        col("age"), col("n_orders"), col("n_active"), col("cohort_size"),
        r2(col("rev_cents") / 100.0).as("revenue"),
        r4(col("cum_cents") / 100.0 / col("cohort_size"))
          .as("ltv_per_customer"))
      .orderBy("cohort_year", "cohort_month", "age")
  }

  // --------------------------------------------------------------- q103
  /** Cohort lifetime value: customers are cohorted by first-order month;
    * each later order lands in an age bucket (months since cohort), and
    * the running per-customer cumulative revenue traces the LTV curve.
    *
    * Scale shape: one per-customer hash-agg for the cohort month, one
    * equi-join back to orders, one (cohort × age) hash-agg — all
    * map-side combined. The only window runs over the cohort×age
    * aggregate (≤ months² rows regardless of data size), never over
    * orders. */
  val q103CohortLtv = QueryDef(
    "q103_cohort_ltv",
    (s, d) => {
      // revenue moves in exact BIGINT cents end-to-end (sums and the
      // running cumulative are order-proof; floats appear only in the
      // final per-row division of two exact integers)
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("om"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val coh = ord.groupBy("o_custkey").agg(min("om").as("cm"))
      val custMonth = ord.join(coh, "o_custkey")
        .groupBy("o_custkey", "cm", "om")
        .agg(count(lit(1)).as("n"), sum("cents").as("mcents"))
      q103Rollup(custMonth)
    },
    Some("""WITH ord AS (
           |  SELECT o_custkey,
           |    year(o_orderdate) * 12 + month(o_orderdate) AS om,
           |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders),
           |coh AS (SELECT o_custkey, min(om) AS cm FROM ord GROUP BY 1),
           |sizes AS (SELECT cm, count(*) AS cohort_size FROM coh GROUP BY 1),
           |cells AS (
           |  SELECT cm, CAST(om - cm AS INT) AS age,
           |    CAST(count(*) AS BIGINT) AS n_orders,
           |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
           |    sum(cents) AS rev_cents
           |  FROM ord JOIN coh USING (o_custkey) GROUP BY 1, 2)
           |SELECT CAST((cm - 1) // 12 AS INT) AS cohort_year,
           |  CAST((cm - 1) % 12 + 1 AS INT) AS cohort_month,
           |  age, n_orders, n_active, cohort_size,
           |  round(rev_cents / 100.0 * 100) / 100 AS revenue,
           |  round(sum(rev_cents) OVER (PARTITION BY cm ORDER BY age
           |      ROWS UNBOUNDED PRECEDING) / 100.0 / cohort_size * 10000)
           |    / 10000 AS ltv_per_customer
           |FROM cells JOIN sizes USING (cm)
           |ORDER BY 1, 2, 3""".stripMargin))

  // --------------------------------------------------------------- q106
  /** A/B experiment readout: view-exposed users split into control/
    * treatment by a deterministic md5 hash (q46/q87's convention — a
    * deployment joins its assignment table instead), conversion = a
    * purchase within 24 h of the first view, reported as per-arm rates,
    * absolute lift, and the pooled two-proportion z-score the
    * ship/no-ship decision reads.
    *
    * Scale shape: one per-user hash-agg (map-side combined), then a
    * single-row global aggregate — the corpus collapses before any
    * statistics. Counts are exact BIGINTs; the rates/lift/z are final
    * per-row divisions of exact integers, so the readout is bit-stable
    * across partitionings and engines. */
  val q106AbLift = QueryDef(
    "q106_ab_lift",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      // exposed population = users with a first view; conversion = a
      // purchase within 24 h after it (the q57/q107 funnel sequencing)
      val exposed = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val per = ev.filter(col("event_type") === "purchase")
        .join(exposed, "user_id")
        .groupBy("user_id")
        .agg(max(when(col("ts") > col("t1") &&
            unix_micros(col("ts")) - unix_micros(col("t1")) <= 86400000000L,
          1L).otherwise(0L)).as("conv"))
        .join(exposed.select("user_id"), Seq("user_id"), "right_outer")
        .na.fill(0L, Seq("conv"))
      q106Rollup(per)
    },
    q106OracleSql)

  /** Shared tail of q106: md5-arm a per-user (user_id, conv) table and
    * reduce it to the one-row experiment readout. Factored out so the
    * streaming twin (Stateful.abStream's emitted snapshot) runs
    * IDENTICAL code after its incremental per-user state pass. */
  def q106Rollup(perUser: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val per = perUser
      .withColumn("arm",
        (expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)")
          % 2).cast("int"))
    val agg = per.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L))
          .as("conv_control"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L))
          .as("conv_treat"))
      agg
        .withColumn("rate_control",
          r6(col("conv_control").cast("double") / col("n_control")))
        .withColumn("rate_treat",
          r6(col("conv_treat").cast("double") / col("n_treat")))
        .withColumn("abs_lift",
          r6(col("conv_treat").cast("double") / col("n_treat")
            - col("conv_control").cast("double") / col("n_control")))
        .withColumn("p_pool",
          (col("conv_control") + col("conv_treat")).cast("double")
            / (col("n_control") + col("n_treat")))
        .withColumn("z_score",
          r4((col("conv_treat").cast("double") / col("n_treat")
              - col("conv_control").cast("double") / col("n_control"))
            / sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
              * (lit(1.0) / col("n_control") + lit(1.0) / col("n_treat")))))
        .drop("p_pool")
  }

  // lazy: referenced by q106AbLift's constructor above its declaration
  private lazy val q106OracleSql = Some("""WITH exposed AS (
           |  SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |per AS (
           |  SELECT x.user_id,
           |    coalesce(max(CASE WHEN e.event_type = 'purchase'
           |      AND e.ts > t1
           |      AND epoch_us(e.ts) - epoch_us(t1) <= 86400000000
           |      THEN 1 ELSE 0 END), 0) AS conv,
           |    ('0x' || substr(md5(CAST(x.user_id AS VARCHAR)), 1, 8))::BIGINT
           |      % 2 AS arm
           |  FROM exposed x LEFT JOIN events e
           |    ON e.user_id = x.user_id AND e.event_type = 'purchase'
           |  GROUP BY x.user_id),
           |agg AS (
           |  SELECT
           |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_control,
           |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_treat,
           |    sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS conv_control,
           |    sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS conv_treat
           |  FROM per)
           |SELECT CAST(n_control AS BIGINT) AS n_control,
           |  CAST(n_treat AS BIGINT) AS n_treat,
           |  CAST(conv_control AS BIGINT) AS conv_control,
           |  CAST(conv_treat AS BIGINT) AS conv_treat,
           |  round(CAST(conv_control AS DOUBLE) / n_control * 1000000)
           |    / 1000000 AS rate_control,
           |  round(CAST(conv_treat AS DOUBLE) / n_treat * 1000000)
           |    / 1000000 AS rate_treat,
           |  round((CAST(conv_treat AS DOUBLE) / n_treat
           |    - CAST(conv_control AS DOUBLE) / n_control) * 1000000)
           |    / 1000000 AS abs_lift,
           |  round((CAST(conv_treat AS DOUBLE) / n_treat
           |      - CAST(conv_control AS DOUBLE) / n_control)
           |    / sqrt((CAST(conv_control + conv_treat AS DOUBLE)
           |        / (n_control + n_treat))
           |      * (1.0 - CAST(conv_control + conv_treat AS DOUBLE)
           |        / (n_control + n_treat))
           |      * (1.0 / n_control + 1.0 / n_treat)) * 10000) / 10000
           |    AS z_score
           |FROM agg""".stripMargin)

  // --------------------------------------------------------------- q107
  /** Conversion-latency distribution: per user, the gap from first view
    * to the first purchase strictly after it (q57's funnel sequencing),
    * summarized as exact interpolated percentiles in minutes — the
    * time-to-convert table under the funnel's how-many counts.
    *
    * Scale shape: two filtered per-user hash-aggs and one equi-join
    * (the q57 shape), then a single-row percentile aggregate over the
    * users-sized lag table. Lags are exact integer µs; the mean is a
    * division of exact integers, and the percentile interpolation runs
    * on integers so both engines compute identical doubles. */
  val q107ConversionLag = QueryDef(
    "q107_conversion_lag",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val lag = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id")
        .agg((unix_micros(min("ts")) - unix_micros(min("t1"))).as("lag_us"))
      lag.agg(
        count(lit(1)).as("n_converted"),
        r4(sum("lag_us").cast("double") / count(lit(1)) / 60000000.0)
          .as("mean_minutes"),
        r4(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY lag_us)")
          / 60000000.0).as("p50_minutes"),
        r4(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY lag_us)")
          / 60000000.0).as("p90_minutes"),
        r4(expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY lag_us)")
          / 60000000.0).as("p99_minutes"),
        r4(max("lag_us").cast("double") / 60000000.0).as("max_minutes"))
    },
    Some("""WITH v AS (
           |  SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |lag AS (
           |  SELECT e.user_id,
           |    epoch_us(min(e.ts)) - epoch_us(min(t1)) AS lag_us
           |  FROM events e JOIN v USING (user_id)
           |  WHERE e.event_type = 'purchase' AND e.ts > t1
           |  GROUP BY 1)
           |SELECT CAST(count(*) AS BIGINT) AS n_converted,
           |  round(CAST(sum(lag_us) AS DOUBLE) / count(*) / 60000000.0
           |    * 10000) / 10000 AS mean_minutes,
           |  round(quantile_cont(lag_us, 0.5) / 60000000.0 * 10000) / 10000
           |    AS p50_minutes,
           |  round(quantile_cont(lag_us, 0.9) / 60000000.0 * 10000) / 10000
           |    AS p90_minutes,
           |  round(quantile_cont(lag_us, 0.99) / 60000000.0 * 10000) / 10000
           |    AS p99_minutes,
           |  round(CAST(max(lag_us) AS DOUBLE) / 60000000.0 * 10000) / 10000
           |    AS max_minutes
           |FROM lag""".stripMargin))

  // --------------------------------------------------------------- q108
  /** Conversion trend: q106's 24 h-conversion metric cut by the WEEK of
    * each user's first view — the time series a team watches to see
    * whether a launch moved the funnel, and the temporal complement of
    * q106's single-number readout.
    *
    * Scale shape: the same two per-user hash-aggs + equi-join as
    * q106/q107, then one calendar-bounded (week) hash-agg; counts are
    * exact BIGINTs and the rate is a final per-row division. */
  val q108FunnelTrend = QueryDef(
    "q108_funnel_trend",
    (s, d) => {
      val WeekUs = 604800000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val exposed = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(exposed, "user_id")
        .groupBy("user_id")
        .agg(max(when(col("ts") > col("t1") &&
            unix_micros(col("ts")) - unix_micros(col("t1")) <= 86400000000L,
          1L).otherwise(0L)).as("conv"))
      exposed.join(conv, Seq("user_id"), "left_outer")
        .na.fill(0L, Seq("conv"))
        .withColumn("week",
          expr(s"unix_micros(t1) div ${WeekUs}L"))
        .groupBy("week")
        .agg(count(lit(1)).as("n_exposed"),
          sum("conv").as("n_converted"),
          r6(sum("conv").cast("double") / count(lit(1))).as("conv_rate"))
        .orderBy("week")
    },
    Some("""WITH exposed AS (
           |  SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |conv AS (
           |  SELECT e.user_id,
           |    max(CASE WHEN e.ts > t1
           |      AND epoch_us(e.ts) - epoch_us(t1) <= 86400000000
           |      THEN 1 ELSE 0 END) AS conv
           |  FROM events e JOIN exposed USING (user_id)
           |  WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT epoch_us(t1) // 604800000000 AS week,
           |  CAST(count(*) AS BIGINT) AS n_exposed,
           |  CAST(sum(coalesce(conv, 0)) AS BIGINT) AS n_converted,
           |  round(CAST(sum(coalesce(conv, 0)) AS DOUBLE) / count(*)
           |    * 1000000) / 1000000 AS conv_rate
           |FROM exposed LEFT JOIN conv USING (user_id)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // --------------------------------------------------------------- q116
  /** Market-basket association rules over per-(user, day) baskets:
    * for every event-type pair a < b, the support, confidence(a→b) and
    * lift — the co-occurrence diagnostic behind "users who error also
    * churn"-style findings. A basket is the distinct set of event types
    * a user produced on one day.
    *
    * Scale shape: distinct → ONE hash-agg to (user, day) baskets with a
    * collect_set bounded by the event-type taxonomy (a catalog stat,
    * single digits to hundreds — never data-sized), pairs exploded from
    * the sorted set so a < b needs no join, then a hash-agg onto the
    * types² grid. Type totals and the basket count are grid-sized and
    * broadcast. No self-join of the event log against itself. */
  /** Rule computation from the distinct (user_id, day, event_type)
    * basket membership table — shared verbatim by the streaming twin,
    * which reconstructs the same baskets from its per-(user, day)
    * bitmask state snapshot. */
  def q116Rollup(baskets: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sets = baskets.groupBy("user_id", "day")
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
    val pairs = sets
      .select(col("types"), posexplode(col("types")).as(Seq("i", "lhs")))
      .select(col("i"), col("lhs"),
        posexplode(col("types")).as(Seq("j", "rhs")))
      .filter(col("i") < col("j"))
      .groupBy("lhs", "rhs").agg(count(lit(1)).as("n_ab"))
    val typeCounts = baskets.groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val tot = sets.agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(typeCounts.withColumnRenamed("event_type", "et_a")
        .withColumnRenamed("n", "n_lhs")), col("lhs") === col("et_a"))
      .join(broadcast(typeCounts.withColumnRenamed("event_type", "et_b")
        .withColumnRenamed("n", "n_rhs")), col("rhs") === col("et_b"))
      .crossJoin(broadcast(tot))
      .select(col("lhs"), col("rhs"), col("n_ab"), col("n_lhs"),
        col("n_rhs"), col("n_baskets"),
        r6(col("n_ab").cast("double") / col("n_baskets")).as("support"),
        r6(col("n_ab").cast("double") / col("n_lhs")).as("confidence"),
        r6(col("n_ab").cast("double") * col("n_baskets")
          / (col("n_lhs").cast("double") * col("n_rhs"))).as("lift"))
      .orderBy("lhs", "rhs")
  }

  val q116BasketLift = QueryDef(
    "q116_basket_lift",
    (s, d) => {
      q116Rollup(Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_type"))
        .distinct())
    },
    Some("""WITH b AS (
           |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
           |    event_type FROM events),
           |bk AS (SELECT user_id, day FROM b GROUP BY 1, 2),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM bk),
           |tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
           |  FROM b GROUP BY 1),
           |pc AS (
           |  SELECT x.event_type AS lhs, y.event_type AS rhs,
           |    CAST(count(*) AS BIGINT) AS n_ab
           |  FROM b x JOIN b y ON x.user_id = y.user_id AND x.day = y.day
           |    AND x.event_type < y.event_type
           |  GROUP BY 1, 2)
           |SELECT lhs, rhs, n_ab, ta.n AS n_lhs, tb.n AS n_rhs, n_baskets,
           |  round(CAST(n_ab AS DOUBLE) / n_baskets * 1000000) / 1000000
           |    AS support,
           |  round(CAST(n_ab AS DOUBLE) / ta.n * 1000000) / 1000000
           |    AS confidence,
           |  round(CAST(n_ab AS DOUBLE) * n_baskets
           |    / (CAST(ta.n AS DOUBLE) * tb.n) * 1000000) / 1000000 AS lift
           |FROM pc
           |JOIN tc ta ON pc.lhs = ta.event_type
           |JOIN tc tb ON pc.rhs = tb.event_type
           |CROSS JOIN tot ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q121
  /** Multi-touch attribution: the same pre-conversion touch journeys as
    * q68, credited under the THREE models a marketing review compares —
    * linear (1/n each), U-shaped position (40% first, 40% last, 20%
    * split across middles), and 7-day-half-life time decay — rolled to
    * per-(model, channel) credit totals and within-model shares.
    * Credits are exact integer micro-units throughout (integer division
    * of a 1e6 budget; the decay weight rounds ONCE to micro-units, the
    * q110/x15 fixed-point posture), so every sum is order-proof and the
    * documented cost of exactness is the sub-micro division dust.
    *
    * Scale shape: q68's touch construction (per-user windows over the
    * filtered touch set), one per-user decay-normalization window, a
    * 3-way stack unpivot, and ONE hash-agg onto the models×channels
    * grid with the model totals joined back from a grid-sized
    * aggregate. */
  val q121MultiTouch = QueryDef(
    "q121_multitouch_attribution",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val conv = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("conv_ts"),
          col("event_id").as("conv_id"))
      val wa = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val wd = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wu = Window.partitionBy("user_id")
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .filter(struct(col("ts"), col("event_id")) <
          struct(col("conv_ts"), col("conv_id")))
        .withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .withColumn("n", count(lit(1)).over(wu))
        .withColumn("w", expr("cast(round(pow(2.0, " +
          "-((unix_micros(conv_ts) - unix_micros(ts)) / 86400000000.0) " +
          "/ 7.0) * 1000000) as bigint)"))
        .withColumn("sw", sum("w").over(wu))
        .withColumn("c_lin", expr("1000000 div n"))
        .withColumn("c_pos",
          when(col("n") === 1L, 1000000L)
            .when(col("rn_a") === 1, when(col("n") === 2L, 500000L)
              .otherwise(400000L))
            .when(col("rn_d") === 1, when(col("n") === 2L, 500000L)
              .otherwise(400000L))
            .otherwise(expr("200000 div (n - 2)")))
        .withColumn("c_dec", expr("w * 1000000 div sw"))
      val wm = Window.partitionBy("model")
      touches.select(col("event_type"),
        expr("stack(3, 'linear', c_lin, 'position', c_pos, " +
          "'time_decay', c_dec) as (model, credit)"))
        .groupBy("model", "event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum("credit").as("credit_micro"))
        .select(col("model"), col("event_type"), col("n_touches"),
          col("credit_micro"),
          r6(col("credit_micro").cast("double")
            / sum("credit_micro").over(wm)).as("credit_share"))
        .orderBy("model", "event_type")
    },
    Some("""WITH conv AS (
           |  SELECT user_id, ts AS conv_ts, event_id AS conv_id
           |  FROM (SELECT user_id, ts, event_id,
           |          row_number() OVER (PARTITION BY user_id
           |            ORDER BY ts, event_id) AS rn
           |        FROM events WHERE event_type = 'purchase')
           |  WHERE rn = 1),
           |touches AS (
           |  SELECT e.user_id, e.event_type,
           |    row_number() OVER (PARTITION BY e.user_id
           |      ORDER BY e.ts ASC, e.event_id ASC) AS rn_a,
           |    row_number() OVER (PARTITION BY e.user_id
           |      ORDER BY e.ts DESC, e.event_id DESC) AS rn_d,
           |    CAST(count(*) OVER (PARTITION BY e.user_id) AS BIGINT)
           |      AS n,
           |    CAST(round(pow(2.0,
           |      -((epoch_us(c.conv_ts) - epoch_us(e.ts))
           |        / 86400000000.0) / 7.0) * 1000000) AS BIGINT) AS w
           |  FROM events e JOIN conv c USING (user_id)
           |  WHERE e.event_type IN ('view', 'click')
           |    AND (e.ts, e.event_id) < (c.conv_ts, c.conv_id)),
           |wn AS (
           |  SELECT *, CAST(sum(w) OVER (PARTITION BY user_id) AS BIGINT)
           |    AS sw
           |  FROM touches),
           |cr AS (
           |  SELECT event_type, 'linear' AS model,
           |    1000000 // n AS credit FROM wn
           |  UNION ALL
           |  SELECT event_type, 'position',
           |    CASE WHEN n = 1 THEN 1000000
           |         WHEN rn_a = 1 THEN CASE WHEN n = 2 THEN 500000
           |           ELSE 400000 END
           |         WHEN rn_d = 1 THEN CASE WHEN n = 2 THEN 500000
           |           ELSE 400000 END
           |         ELSE 200000 // (n - 2) END FROM wn
           |  UNION ALL
           |  SELECT event_type, 'time_decay', w * 1000000 // sw FROM wn),
           |agg AS (
           |  SELECT model, event_type,
           |    CAST(count(*) AS BIGINT) AS n_touches,
           |    CAST(sum(credit) AS BIGINT) AS credit_micro
           |  FROM cr GROUP BY 1, 2)
           |SELECT model, event_type, n_touches, credit_micro,
           |  round(CAST(credit_micro AS DOUBLE)
           |    / CAST(sum(credit_micro) OVER (PARTITION BY model)
           |      AS BIGINT) * 1000000) / 1000000 AS credit_share
           |FROM agg ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q123
  /** DAU / MAU stickiness: per day, the exact distinct daily actives,
    * the exact distinct trailing-28-day actives, and their ratio — the
    * engagement metric every growth dashboard leads with. Spelled with
    * q80's posting-list trick at calendar grain: dedup (user, day)
    * once, explode each active day into the 28 windows it can serve,
    * dedup (user, window), count — no range self-join, no per-window
    * re-scan, constant explode factor 28.
    *
    * Windows short of a full 28-day history (the first 27 days) report
    * the partial trailing count, the standard dashboard convention.
    *
    * Scale shape: two hash-aggs with map-side partials; traffic ∝
    * distinct (user, day) pairs × 28, never events × 28. */
  val q123DauMau = QueryDef(
    "q123_dau_mau",
    (s, d) => {
      val pairs = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = pairs
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 27L)).as("w"))
        .distinct()
        .groupBy("w").agg(count(lit(1)).as("mau"))
        .withColumnRenamed("w", "day")
      // report only days with activity (dau side): trailing windows
      // beyond the timeline end are index artifacts, not days
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
          r6(col("dau").cast("double") / col("mau")).as("stickiness"))
        .orderBy("day")
    },
    Some("""WITH pairs AS (
           |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           |  FROM events),
           |dau AS (
           |  SELECT day, CAST(count(*) AS BIGINT) AS dau
           |  FROM pairs GROUP BY 1),
           |expanded AS (
           |  SELECT DISTINCT user_id, day + gs.g AS w
           |  FROM pairs, generate_series(0, 27) gs(g)),
           |mau AS (
           |  SELECT w AS day, CAST(count(*) AS BIGINT) AS mau
           |  FROM expanded GROUP BY 1)
           |SELECT day, dau, mau,
           |  round(CAST(dau AS DOUBLE) / mau * 1000000) / 1000000
           |    AS stickiness
           |FROM dau JOIN mau USING (day) ORDER BY day""".stripMargin))

  // --------------------------------------------------------------- q124
  /** Exponential retention-decay fit: collapse q58's cohort matrix to
    * the global curve R(k) = active(k)/cohort(0), least-squares-fit
    * ln R(k) ~ a + b·k over offsets ≥ 1 (the t25 integer-micro trick —
    * ln values as exact micro-unit BIGINTs, offsets already integers,
    * so every regression sum is order-proof), and report each offset's
    * fitted value, the residual, plus the decay slope and half-life —
    * the one-line "how fast do users churn" answer the full q58 matrix
    * buries.
    *
    * Scale shape: two hash-aggs to the offset-bounded curve (calendar
    * domain), regression sums over that bounded table, results joined
    * back as a broadcast scalar. */
  val q124RetentionDecay = QueryDef(
    "q124_retention_decay",
    (s, d) => {
      val day = floor(col("ts").cast("long") / 86400)
      val ev = Tables.events(s, d).select(col("user_id"), day.as("day"))
      val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      val curve = ev.distinct().join(cohort, "user_id")
        .groupBy((col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
      val base = curve.filter(col("day_offset") === 0L)
        .select(col("n_users").as("n0"))
      val pts = curve.crossJoin(broadcast(base))
        .withColumn("retention",
          r6(col("n_users").cast("double") / col("n0")))
        .withColumn("y", expr(
          "cast(round(ln(cast(n_users as double) / n0) * 1000000) as bigint)"))
      val reg = pts.filter(col("day_offset") >= 1L)
        .agg(count(lit(1)).as("k"), sum("day_offset").as("sx"),
          sum("y").as("sy"),
          sum(col("day_offset") * col("y")).as("sxy"),
          sum(col("day_offset") * col("day_offset")).as("sxx"))
        .withColumn("slope_raw",
          (col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("k") * col("sxx") - col("sx") * col("sx"))
              .cast("double") / 1000000.0)
        .withColumn("icept_raw",
          (col("sy").cast("double") / 1000000.0
            - col("slope_raw") * col("sx")) / col("k"))
        .select("slope_raw", "icept_raw")
      pts.crossJoin(broadcast(reg))
        .select(col("day_offset"), col("n_users"), col("retention"),
          r6(exp(col("icept_raw") + col("slope_raw") * col("day_offset")))
            .as("fitted"),
          r6(col("retention")
            - r6(exp(col("icept_raw") + col("slope_raw")
              * col("day_offset")))).as("residual"),
          r6(col("slope_raw")).as("decay_slope"),
          r4(lit(-math.log(2.0)) / col("slope_raw")).as("half_life_days"))
        .orderBy("day_offset")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(floor(epoch(ts)/86400.0) AS BIGINT)
           |    AS day
           |  FROM events),
           |cohort AS (
           |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
           |curve AS (
           |  SELECT day - cohort_day AS day_offset,
           |    CAST(count(*) AS BIGINT) AS n_users
           |  FROM (SELECT DISTINCT user_id, day FROM ev) a
           |  JOIN cohort USING (user_id) GROUP BY 1),
           |base AS (
           |  SELECT n_users AS n0 FROM curve WHERE day_offset = 0),
           |pts AS (
           |  SELECT day_offset, n_users,
           |    round(CAST(n_users AS DOUBLE) / n0 * 1000000) / 1000000
           |      AS retention,
           |    CAST(round(ln(CAST(n_users AS DOUBLE) / n0) * 1000000)
           |      AS BIGINT) AS y
           |  FROM curve CROSS JOIN base),
           |agg AS (
           |  SELECT CAST(count(*) AS BIGINT) AS k,
           |    CAST(sum(day_offset) AS BIGINT) AS sx,
           |    CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(day_offset * y) AS BIGINT) AS sxy,
           |    CAST(sum(day_offset * day_offset) AS BIGINT) AS sxx
           |  FROM pts WHERE day_offset >= 1),
           |reg AS (
           |  SELECT CAST(k * sxy - sx * sy AS DOUBLE)
           |      / CAST(k * sxx - sx * sx AS DOUBLE) / 1000000.0
           |      AS slope_raw, k, sx, sy
           |  FROM agg),
           |reg2 AS (
           |  SELECT slope_raw,
           |    (CAST(sy AS DOUBLE) / 1000000.0 - slope_raw * sx) / k
           |      AS icept_raw
           |  FROM reg)
           |SELECT day_offset, n_users, retention,
           |  round(exp(icept_raw + slope_raw * day_offset) * 1000000)
           |    / 1000000 AS fitted,
           |  round((retention - round(exp(icept_raw + slope_raw
           |    * day_offset) * 1000000) / 1000000) * 1000000) / 1000000
           |    AS residual,
           |  round(slope_raw * 1000000) / 1000000 AS decay_slope,
           |  round(-ln(2.0) / slope_raw * 10000) / 10000
           |    AS half_life_days
           |FROM pts CROSS JOIN reg2 ORDER BY day_offset""".stripMargin))

  // --------------------------------------------------------------- q126
  /** Time-boxed funnel: q57's view → click → purchase sequencing with a
    * 24 h window on EACH step — step k counts only when it lands
    * strictly after step k−1 and within 24 h of it, the semantics
    * product-analytics funnels default to (an intent expires; a
    * purchase a month after the click is a different journey). Read
    * against q57's untimed counts, the delta is how much intent the
    * window expires.
    *
    * Scale shape: identical to q57 — per-step filter → per-user min-agg
    * → equi-join on user_id with the previous (strictly smaller) step
    * table; the window bound rides the join filter; the final table is
    * 3 rows. */
  val q126TimedFunnel = QueryDef(
    "q126_timed_funnel",
    (s, d) => {
      val WinUs = 86400000000L
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1") &&
          unix_micros(col("ts")) - unix_micros(col("t1")) <= WinUs)
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2") &&
          unix_micros(col("ts")) - unix_micros(col("t2")) <= WinUs)
        .groupBy("user_id").agg(min("ts").as("t3"))
      val steps = s1.agg(count(lit(1)).as("users"))
        .select(lit(1).as("step"), lit("view").as("step_name"),
          col("users"))
        .unionByName(s2.agg(count(lit(1)).as("users"))
          .select(lit(2).as("step"), lit("click").as("step_name"),
            col("users")))
        .unionByName(s3.agg(count(lit(1)).as("users"))
          .select(lit(3).as("step"), lit("purchase").as("step_name"),
            col("users")))
      val w = Window.orderBy("step")
      steps
        .withColumn("conversion",
          r4(coalesce(col("users") / lag("users", 1).over(w), lit(1.0))))
        .orderBy("step")
    },
    Some("""WITH s1 AS (
           |  SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |s2 AS (
           |  SELECT e.user_id, min(ts) AS t2
           |  FROM events e JOIN s1 USING (user_id)
           |  WHERE event_type = 'click' AND ts > t1
           |    AND epoch_us(ts) - epoch_us(t1) <= 86400000000
           |  GROUP BY 1),
           |s3 AS (
           |  SELECT e.user_id, min(ts) AS t3
           |  FROM events e JOIN s2 USING (user_id)
           |  WHERE event_type = 'purchase' AND ts > t2
           |    AND epoch_us(ts) - epoch_us(t2) <= 86400000000
           |  GROUP BY 1),
           |steps AS (
           |  SELECT 1 AS step, 'view' AS step_name,
           |         CAST(count(*) AS BIGINT) AS users FROM s1
           |  UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
           |  UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT)
           |    FROM s3)
           |SELECT step, step_name, users,
           |  round(COALESCE(users / CAST(lag(users) OVER (ORDER BY step)
           |    AS DOUBLE), 1.0) * 10000) / 10000 AS conversion
           |FROM steps ORDER BY step""".stripMargin))

  // --------------------------------------------------------------- q172
  /** Markov next-event prediction eval: train q61's first-order
    * transition model on half the users (deterministic md5 split — the
    * q46 convention, so the split is reproducible across engines and
    * retries), predict each test transition's next event as the train
    * argmax, and report per-current-type accuracy against the
    * majority-class baseline P(most common next). The eval layer q61
    * lacks (q168's role, for sequence models): on this synthetic log
    * the honest finding is that history buys ~nothing over the
    * baseline — transitions are near-independent — and the skill
    * column SAYS so.
    *
    * Scale shape: ONE user-keyed window exchange builds transitions
    * (lead over each user's (ts, event_id) timeline); everything after
    * is grid work — one hash-agg (map-side combined) onto the
    * (cur × next) ≤25-cell grid carrying train/test counters
    * side-by-side (so the corpus is scanned ONCE — no per-split
    * branches), the argmax is a window over that grid with a
    * (count DESC, type ASC) total order broadcast down the partition
    * by a full-frame window (not a join back), accuracies divide
    * exact integers once. 100 TB changes only the first exchange's
    * input. */
  /** The md5 user split shared by q172's batch pass and the streaming
    * twin's enrichment of markovStream's emitted transitions. */
  def q172IsTrain(userId: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    substring(md5(userId.cast("string")), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7")

  /** q172's transition grid → eval projection, shared with the
    * markovStream twin (identical code over identical integer counters
    * ⇒ bit-for-bit). `grid` columns: cur, nxt, n_train, n_test_c. */
  def q172Finish(grid: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val byCur = Window.partitionBy("cur")
      .orderBy(col("n_train").desc, col("nxt").asc)
    val fullCur = Window.partitionBy("cur")
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    grid
        .withColumn("rn", row_number().over(byCur))
        .withColumn("predicted",
          max(when(col("rn") === 1, col("nxt"))).over(fullCur))
        .groupBy("cur")
        .agg(max("predicted").as("predicted"),
          sum("n_test_c").as("n_test"),
          sum(when(col("nxt") === col("predicted"), col("n_test_c"))
            .otherwise(0L)).as("n_correct"),
          max("n_test_c").as("n_majority"))
        .select(col("cur").as("cur_type"), col("predicted"),
          col("n_test"), col("n_correct"),
          expr("n_correct * 1000000 div n_test").as("acc_ppm"),
          expr("n_majority * 1000000 div n_test").as("baseline_ppm"),
          // difference of the two non-negative floor divisions — never
          // divide a negative (Spark div truncates, DuckDB // floors)
          expr("n_correct * 1000000 div n_test" +
            " - n_majority * 1000000 div n_test").as("skill_ppm"))
        .orderBy("cur_type")
  }

  val q172MarkovEval = QueryDef(
    "q172_markov_eval",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      q172Finish(Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("cur"))
        .withColumn("nxt", lead("cur", 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("is_train", q172IsTrain(col("user_id")))
        .groupBy("cur", "nxt")
        .agg(sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
          sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test_c")))
    },
    Some("""WITH trans AS (
           |  SELECT event_type AS cur,
           |    lead(event_type, 1) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS nxt,
           |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
           |      IN ('0','1','2','3','4','5','6','7') AS is_train
           |  FROM events),
           |grid AS (
           |  SELECT cur, nxt,
           |    CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_train,
           |    CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
           |      AS n_test_c
           |  FROM trans WHERE nxt IS NOT NULL GROUP BY 1, 2),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY cur
           |    ORDER BY n_train DESC, nxt ASC) AS rn
           |  FROM grid),
           |p AS (
           |  SELECT *, max(CASE WHEN rn = 1 THEN nxt END)
           |    OVER (PARTITION BY cur) AS predicted
           |  FROM ranked),
           |test AS (
           |  SELECT cur, max(predicted) AS predicted,
           |    CAST(sum(n_test_c) AS BIGINT) AS n_test,
           |    CAST(sum(CASE WHEN nxt = predicted THEN n_test_c ELSE 0
           |      END) AS BIGINT) AS n_correct,
           |    CAST(max(n_test_c) AS BIGINT) AS n_majority
           |  FROM p GROUP BY 1)
           |SELECT cur AS cur_type, predicted, n_test, n_correct,
           |  n_correct * 1000000 // n_test AS acc_ppm,
           |  n_majority * 1000000 // n_test AS baseline_ppm,
           |  n_correct * 1000000 // n_test
           |    - n_majority * 1000000 // n_test AS skill_ppm
           |FROM test ORDER BY cur_type""".stripMargin))

  val all: Seq[QueryDef] = Seq(q57Funnel, q58Retention, q61Markov,
    q62SessionPaths, q68Attribution, q80SlidingDistinct, q83PeakConcurrency,
    q85DecileMobility, q102RfmSegments, q103CohortLtv, q106AbLift,
    q107ConversionLag, q108FunnelTrend, q116BasketLift, q121MultiTouch,
    q123DauMau, q124RetentionDecay, q126TimedFunnel, q172MarkovEval)
}

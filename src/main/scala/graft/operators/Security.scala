package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Rounding.{r4, r6}

/** Security-analytics operators over the event stream — the reference's
  * actual domain (runreveal/cheetah ships security telemetry:
  * README.md:9-16, the Windows Event Log source, the S3 audit sink).
  * These are the two detections every UEBA/NDR pipeline runs on exactly
  * this envelope shape (keyed, timestamped events): behavioral rarity
  * scoring and beaconing (periodicity) detection.
  */
object Security {

  // --------------------------------------------------------------- q110
  /** UEBA rarity score: each (event_type, hour-of-day) cell's global
    * frequency becomes a surprise weight −ln(p); a user's score is the
    * sum of the surprise of their events — users living in rare cells
    * float to the top, the baseline behavioral-anomaly ranking.
    *
    * Scale shape: the cell table is card(types)×24 — built by one
    * map-side-combined hash-agg and broadcast back; the per-user score
    * is a second hash-agg. Each cell's −ln(p) is computed ONCE from a
    * division of exact integers and rounded ONCE to integer micro-nats
    * (the x15/t17 fixed-point trick), so the per-user sum is an exact
    * BIGINT — order-proof, bit-exact cross-engine. */
  /** Shared tail of q110: rank a per-user (user_id, n_events, sm) table
    * — sm in exact integer micro-nats — into the top-20 anomaly board.
    * Shared with the streaming twin (Stateful.rarityStream) for
    * bit-for-bit parity. */
  def q110Rollup(perUser: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    perUser.select(col("user_id"), col("n_events"),
      r4(col("sm") / 1000000.0).as("score_nats"),
      r4(col("sm") / 1000000.0 / col("n_events")).as("mean_nats"))
      .orderBy(col("score_nats").desc, col("user_id"))
      .limit(20)

  /** q110's surprise-weight cell table (event_type, hod →
    * micro-nats) — fitted at ingest; the streaming monitor consumes it
    * as its reference parameters. */
  def q110Cells(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val HourUs = 3600000000L
    val total = Tables.events(s, d).agg(count(lit(1)).as("n_total"))
    Tables.events(s, d)
      .select(col("event_type"),
        ((unix_micros(col("ts")) / HourUs) % 24).cast("int").as("hod"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n_cell"))
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("hod"),
        round(-log(col("n_cell").cast("double") / col("n_total"))
          * 1000000).cast("long").as("surprise_micro"))
  }

  val q110RarityScore = QueryDef(
    "q110_rarity_score",
    (s, d) => {
      val HourUs = 3600000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          ((unix_micros(col("ts")) / HourUs) % 24).cast("int").as("hod"))
      ev.join(broadcast(q110Cells(s, d)), Seq("event_type", "hod"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("surprise_micro").as("sm"))
        .transform(q110Rollup)
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_type,
           |    (epoch_us(ts) // 3600000000) % 24 AS hod
           |  FROM events),
           |total AS (SELECT count(*) AS n_total FROM events),
           |cells AS (
           |  SELECT event_type, hod,
           |    CAST(round(-ln(CAST(count(*) AS DOUBLE)
           |      / (SELECT n_total FROM total)) * 1000000) AS BIGINT)
           |      AS surprise_micro
           |  FROM ev GROUP BY 1, 2)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           |  round(sum(surprise_micro) / 1000000.0 * 10000) / 10000
           |    AS score_nats,
           |  round(sum(surprise_micro) / 1000000.0 / count(*) * 10000)
           |    / 10000 AS mean_nats
           |FROM ev JOIN cells USING (event_type, hod)
           |GROUP BY 1 ORDER BY score_nats DESC, user_id
           |LIMIT 20""".stripMargin))

  // --------------------------------------------------------------- q111
  /** Beaconing detection: per (user, event_type) channel, the
    * coefficient of variation of inter-arrival gaps — automated C2
    * check-ins tick with near-constant periods (CV → 0) while human
    * activity is bursty (CV ≥ 1). Channels with enough events and the
    * lowest CV rank first; on this synthetic uniform log the finding is
    * that NOTHING beacons (all CVs near 1) — exactly what the detector
    * should say, the q99/Benford convention.
    *
    * Scale shape: one exchange on user_id for the gap window (lag),
    * then gaps collapse to exact integer-second sums and sum-of-squares
    * per channel — q104's integer two-pass variance — so the ranking is
    * bit-stable; the top-20 is a TakeOrdered. */
  /** Shared tail of q111: rank a per-channel (user_id, event_type,
    * n_gaps, sg, sg2) table — exact integer-second sums — into the
    * lowest-CV top-20. Shared with the streaming twin
    * (Stateful.beaconStream) for bit-for-bit parity. */
  def q111Rollup(ch: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ch.filter(col("n_gaps") >= 10)
      .select(col("user_id"), col("event_type"), col("n_gaps"),
        r4(col("sg").cast("double") / col("n_gaps")).as("mean_gap_s"),
        r4(sqrt((col("n_gaps") * col("sg2") - col("sg") * col("sg"))
            .cast("double") / (col("n_gaps") * (col("n_gaps") - 1)))
          / (col("sg").cast("double") / col("n_gaps"))).as("cv"))
      .orderBy(col("cv").asc, col("user_id"), col("event_type"))
      .limit(20)

  val q111Beaconing = QueryDef(
    "q111_beaconing",
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("gap_s",
          ((unix_micros(col("ts"))
            - unix_micros(lag("ts", 1).over(w))) / 1000000L).cast("long"))
        .filter(col("gap_s").isNotNull)
      gaps.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("sg"),
          sum(col("gap_s") * col("gap_s")).as("sg2"))
        .transform(q111Rollup)
    },
    Some("""WITH gaps AS (
           |  SELECT user_id, event_type,
           |    (epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
           |      PARTITION BY user_id, event_type
           |      ORDER BY ts, event_id))) // 1000000 AS gap_s
           |  FROM events),
           |ch AS (
           |  SELECT user_id, event_type,
           |    CAST(count(*) AS BIGINT) AS n_gaps,
           |    sum(gap_s) AS sg, sum(gap_s * gap_s) AS sg2
           |  FROM gaps WHERE gap_s IS NOT NULL
           |  GROUP BY 1, 2 HAVING count(*) >= 10)
           |SELECT user_id, event_type, n_gaps,
           |  round(CAST(sg AS DOUBLE) / n_gaps * 10000) / 10000
           |    AS mean_gap_s,
           |  round(sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)
           |      / (n_gaps * (n_gaps - 1)))
           |    / (CAST(sg AS DOUBLE) / n_gaps) * 10000) / 10000 AS cv
           |FROM ch ORDER BY cv ASC, user_id, event_type
           |LIMIT 20""".stripMargin))

  // --------------------------------------------------------------- q112
  /** First-time-seen detection: the day each (user, event_type) pair
    * first appears, rolled up to the daily novelty series per type —
    * the SIEM primitive behind "first admin login from this host"
    * alerts. A novelty spike marks onboarding waves or lateral
    * movement; the steady-state rate is the baseline alert budget.
    *
    * Scale shape: one map-side-combined min-agg on the (user, type)
    * pair key, then a calendar-bounded (type, day) hash-agg with a
    * running share — the cumulative window sees only the aggregate.
    * All-integer counts; the share divides exact integers. */
  /** Shared tail of q112: roll a per-pair (user_id, event_type,
    * first_day) table into the daily novelty series. Shared with the
    * streaming twin (Stateful.firstSeenStream) — all-integer, so the
    * twin is bit-for-bit. */
  def q112Rollup(firsts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("first_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = firsts.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumnRenamed("event_type", "et_sz")
    firsts.groupBy("event_type", "first_day")
      .agg(count(lit(1)).as("n_new"))
      .withColumn("cum_new", sum("n_new").over(w))
      .join(broadcast(totals), col("event_type") === col("et_sz"))
      .select(col("event_type"), col("first_day"), col("n_new"),
        col("cum_new"),
        r6(col("cum_new").cast("double") / col("n_pairs"))
          .as("coverage"))
      .orderBy("event_type", "first_day")
  }

  val q112FirstSeen = QueryDef(
    "q112_first_seen",
    (s, d) => {
      val DayUs = 86400000000L
      val firsts = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr(s"unix_micros(ts) div ${DayUs}L").as("day"))
        .groupBy("user_id", "event_type")
        .agg(min("day").as("first_day"))
      q112Rollup(firsts)
    },
    Some("""WITH firsts AS (
           |  SELECT user_id, event_type,
           |    min(epoch_us(ts) // 86400000000) AS first_day
           |  FROM events GROUP BY 1, 2),
           |daily AS (
           |  SELECT event_type, first_day,
           |    CAST(count(*) AS BIGINT) AS n_new
           |  FROM firsts GROUP BY 1, 2),
           |tot AS (
           |  SELECT event_type, count(*) AS n_pairs FROM firsts GROUP BY 1)
           |SELECT event_type, first_day, n_new,
           |  CAST(sum(n_new) OVER (PARTITION BY event_type
           |    ORDER BY first_day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |    AS cum_new,
           |  round(CAST(sum(n_new) OVER (PARTITION BY event_type
           |      ORDER BY first_day ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           |    / n_pairs * 1000000) / 1000000 AS coverage
           |FROM daily JOIN tot USING (event_type)
           |ORDER BY 1, 2""".stripMargin))

  // --------------------------------------------------------------- q128
  /** SLO burn-rate alerting (the Google-SRE multi-window rule): per
    * hour, the error fraction of all events, expressed as a burn rate
    * against a 5% error budget, paired with the enclosing 6-hour
    * window's burn — and the alert fires only when BOTH exceed their
    * thresholds (fast window 14.4×, slow window 6×), which is what
    * keeps single-hour blips from paging. The error stream here is the
    * corpus's own `event_type = 'error'`.
    *
    * Scale shape: ONE hash-agg to the hour grid carrying (errors,
    * total) exact integers; the 6-hour burn is a second hash-agg onto
    * the 6h grid joined back hour→window (calendar-bounded, broadcast);
    * every rate divides exact integers once. */
  /** Burn computation from the per-hour (errs, total) exact-integer
    * grid — identical code for the batch hash-agg and the streaming
    * monitor's closed hours. */
  def q128Finish(hours: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val Budget = 0.05
    val win6 = hours
      .groupBy(expr("hour div 6").as("w6"))
      .agg(sum("errs").as("errs6"), sum("total").as("total6"))
    hours.withColumn("w6j", expr("hour div 6"))
      .join(broadcast(win6), col("w6j") === col("w6"))
      .select(col("hour"), col("errs"), col("total"),
        r4(col("errs").cast("double") / col("total") / Budget)
          .as("burn_1h"),
        r4(col("errs6").cast("double") / col("total6") / Budget)
          .as("burn_6h"),
        (col("errs").cast("double") / col("total") / Budget > 14.4 &&
          col("errs6").cast("double") / col("total6") / Budget > 6.0)
          .as("page"))
      .orderBy("hour")
  }

  val q128BurnRate = QueryDef(
    "q128_burn_rate",
    (s, d) => {
      val HourUs = 3600000000L
      q128Finish(Tables.events(s, d)
        .select(expr(s"unix_micros(ts) div $HourUs").as("hour"),
          when(col("event_type") === "error", 1L).otherwise(0L)
            .as("is_err"))
        .groupBy("hour")
        .agg(sum("is_err").as("errs"), count(lit(1)).as("total")))
    },
    Some("""WITH hours AS (
           |  SELECT epoch_us(ts) // 3600000000 AS hour,
           |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS errs,
           |    CAST(count(*) AS BIGINT) AS total
           |  FROM events GROUP BY 1),
           |w6 AS (
           |  SELECT hour // 6 AS w6, CAST(sum(errs) AS BIGINT) AS errs6,
           |    CAST(sum(total) AS BIGINT) AS total6
           |  FROM hours GROUP BY 1)
           |SELECT hour, errs, total,
           |  round(CAST(errs AS DOUBLE) / total / 0.05 * 10000) / 10000
           |    AS burn_1h,
           |  round(CAST(errs6 AS DOUBLE) / total6 / 0.05 * 10000) / 10000
           |    AS burn_6h,
           |  (CAST(errs AS DOUBLE) / total / 0.05 > 14.4
           |    AND CAST(errs6 AS DOUBLE) / total6 / 0.05 > 6.0) AS page
           |FROM hours JOIN w6 ON hour // 6 = w6
           |ORDER BY hour""".stripMargin))

  // --------------------------------------------------------------- q146
  /** Request-log URL analytics: the HTTP-log read every security/log
    * pipeline runs (the reference's domain — its webhook/s3 sinks move
    * URL-shaped records all day). Each event synthesizes its request
    * URL deterministically from its own columns (a stand-in for a raw
    * `url` field), then Spark's `parse_url` extracts host / path /
    * query-param — and the DuckDB oracle re-derives the same pieces
    * straight from the source columns, so any parse_url extraction
    * error breaks the hash match: the parser is verified end to end,
    * not just the aggregation. Rollup: per
    * (host, path) request counts, distinct users, and exact traffic
    * share ×10⁶.
    *
    * Scale shape: parse_url is a codegen'd expression evaluated in the
    * scan projection; ONE map-side hash-agg onto the (hosts × paths)
    * grid (a catalog-bounded domain), totals broadcast back. */
  val q146UrlAnalytics = QueryDef(
    "q146_url_analytics",
    (s, d) => {
      val urled = Tables.events(s, d)
        .withColumn("url",
          concat(lit("https://"),
            element_at(lit(Array("api.example.com", "cdn.example.net",
              "auth.example.org")), (col("user_id") % 3L).cast("int") + 1),
            lit("/v1/"), col("event_type"),
            lit("?u="), col("user_id").cast("string"),
            lit("&q="), (col("value") * 100).cast("long").cast("string")))
      val parsed = urled.select(
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("u")).cast("long")
          .as("uid"))
      val grid = parsed.groupBy("host", "path")
        .agg(count(lit(1)).as("n_requests"),
          count_distinct(col("uid")).as("n_users"))
      val tot = grid.agg(sum("n_requests").as("total"))
      grid.crossJoin(broadcast(tot))
        .select(col("host"), col("path"), col("n_requests"),
          col("n_users"),
          expr("n_requests * 1000000 div total").as("share_ppm"))
        .orderBy("host", "path")
    },
    Some("""WITH urled AS (
           |  SELECT ['api.example.com', 'cdn.example.net',
           |      'auth.example.org'][CAST(user_id % 3 AS INT) + 1]
           |      AS host,
           |    '/v1/' || event_type AS path,
           |    user_id AS uid
           |  FROM events),
           |grid AS (
           |  SELECT host, path, CAST(count(*) AS BIGINT) AS n_requests,
           |    CAST(count(DISTINCT uid) AS BIGINT) AS n_users
           |  FROM urled GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(n_requests) AS BIGINT) AS total
           |  FROM grid)
           |SELECT host, path, n_requests, n_users,
           |  CAST(n_requests * 1000000 // total AS BIGINT) AS share_ppm
           |FROM grid CROSS JOIN tot ORDER BY host, path""".stripMargin))

  // --------------------------------------------------------------- q170
  /** Log-template mining (Drain-lite): collapse a raw log stream to its
    * TEMPLATES by masking every numeric token, then profile each
    * template — count, first/last seen, span, one example line. This is
    * the triage view every log pipeline (the reference's domain —
    * runreveal ships security logs end to end) builds first: millions
    * of distinct lines become dozens of templates. Each event
    * synthesizes its log line deterministically from its own columns
    * (q146's convention — a stand-in for a raw `message` field), the
    * DuckDB oracle re-derives the identical line, so the masking regex
    * and the rollup are verified end to end.
    *
    * Scale shape: line composition + regex masking are row-local
    * codegen'd projections in the scan; ONE map-side-combined hash-agg
    * onto the template grid (templates are format strings — a
    * catalog-bounded domain, NOT corpus-sized). first/last/example are
    * min/max aggregates, so the whole rollup is commutative — the
    * streaming twin (Stateful.templateStream) keeps one
    * (n, min, max, min-line) cell per template forever. */
  /** q170's per-event (template, line, us) projection, shared with the
    * streaming twin's feed enrichment. Columns in: event_type, ts,
    * user_id, value, event_id. */
  def q170Lines(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev.withColumn("line",
        concat(col("event_type"), lit(" user="),
          col("user_id").cast("string"),
          lit(" status="),
          when(col("value") >= 300.0, "FAIL").otherwise("OK"),
          lit(" took "),
          expr("cast(round(value * 1000) as bigint)").cast("string"),
          lit("us req="), pmod(col("event_id"), lit(9973L)).cast("string")))
      .select(regexp_replace(col("line"), "[0-9]+", "<N>").as("template"),
        col("line"), unix_micros(col("ts")).as("us"), col("ts"))

  /** q170's template grid → report projection, shared with the
    * streaming twin (identical code over identical commutative cells ⇒
    * bit-for-bit). `g` columns: template, n, first_us, last_us,
    * example. */
  def q170Finish(g: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    g.select(col("template"), col("n"), col("first_us"), col("last_us"),
        expr("(last_us - first_us) div 1000000L").as("span_s"),
        col("example"))
      .orderBy("template")

  val q170LogTemplates = QueryDef(
    "q170_log_templates",
    (s, d) =>
      q170Finish(q170Lines(Tables.events(s, d))
        .groupBy("template")
        .agg(count(lit(1)).as("n"), min("us").as("first_us"),
          max("us").as("last_us"), min("line").as("example"))),
    Some("""WITH lines AS (
           |  SELECT event_type || ' user=' || user_id || ' status='
           |      || (CASE WHEN value >= 300.0 THEN 'FAIL' ELSE 'OK' END)
           |      || ' took ' || CAST(round(value * 1000) AS BIGINT)
           |      || 'us req=' || (event_id % 9973) AS line,
           |    epoch_us(ts) AS us
           |  FROM events),
           |t AS (
           |  SELECT regexp_replace(line, '[0-9]+', '<N>', 'g')
           |      AS template,
           |    line, us
           |  FROM lines)
           |SELECT template, CAST(count(*) AS BIGINT) AS n,
           |  min(us) AS first_us, max(us) AS last_us,
           |  (max(us) - min(us)) // 1000000 AS span_s,
           |  min(line) AS example
           |FROM t GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[QueryDef] = Seq(q110RarityScore, q111Beaconing,
    q112FirstSeen, q128BurnRate, q146UrlAnalytics, q170LogTemplates)
}

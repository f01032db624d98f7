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

  val all: Seq[QueryDef] = Seq(q48Scd2)
}

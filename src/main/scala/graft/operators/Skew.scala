package graft.operators

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Rounding.{r2, r4, r6}
import graft.functions.{TextFunctions => T}

/** Skew-handling patterns for hot keys at cluster scale.
  *
  * Two-phase salted aggregation: append a random-but-deterministic salt to
  * the grouping key, pre-aggregate on (key, salt) — spreading one hot key
  * over `SaltBuckets` reducers — then aggregate the partials on the bare
  * key. For algebraic aggregates (sum/count/min/max) the result is exactly
  * the plain groupBy result, so the oracle is the UNsalted SQL.
  *
  * (AQE skew-join splitting handles the join-side analog automatically;
  * this pattern is for aggregations, where AQE cannot split a hash-agg
  * group. l_returnflag has 3 values at any SF — the canonical "3 reducers
  * do all the work" shape this fixes.)
  */
object Skew {

  private val SaltBuckets = 16

  val q36SaltedAgg = QueryDef(
    "q36_salted_agg",
    (s, d) => {
      // deterministic salt: spread rows by a hash of the row identity,
      // NOT rand() — keeps the query replayable/retry-safe
      val salted = Tables.lineitem(s, d)
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(SaltBuckets)))
      val partial = salted.groupBy("l_returnflag", "salt")
        .agg(sum("l_quantity").as("p_qty"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("p_rev"),
          count(lit(1)).as("p_n"))
      partial.groupBy("l_returnflag")
        .agg(r2(sum("p_qty")).as("sum_qty"), r2(sum("p_rev")).as("revenue"),
          sum("p_n").as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           |  count(*) AS n
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q46
  /** Deterministic hash sampling (~10%): rows where the first md5 hex
    * digit of the key is '0' or '1' (16ths → 12.5%). Unlike TABLESAMPLE
    * or rand(), the sample is stable across engines, retries, and
    * partitionings — the property a reproducible training-data pipeline
    * needs — and the same md5 runs in the oracle. */
  val q46HashSample = QueryDef(
    "q46_hash_sample",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 1)
          .isin("0", "1"))
        .agg(count(lit(1)).as("n_sampled"),
          r2(sum("l_extendedprice")).as("sum_price"))
    },
    Some("""SELECT count(*) AS n_sampled,
           |  round(sum(l_extendedprice), 2) AS sum_price
           |FROM lineitem
           |WHERE substring(md5(l_orderkey || '-' || l_linenumber), 1, 1) IN ('0', '1')""".stripMargin))

  // ---------------------------------------------------------------- q50
  /** Equi-width histogram: fixed-width value buckets with count and the
    * observed [lo, hi] per bucket — the one-pass distribution profile a
    * planner/quality monitor reads. One hash-agg shuffle on the bucket id
    * (bounded cardinality), counts combine map-side; at 100 TB this is
    * the cheapest full-scan statistic there is. (Bucketing is spelled
    * floor(x/width) — engine-portable, unlike width_bucket which the
    * oracle engine lacks.) */
  val q50Histogram = QueryDef(
    "q50_histogram",
    (s, d) => {
      val width = 5500.0
      Tables.lineitem(s, d)
        .withColumn("bucket", floor(col("l_extendedprice") / width).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          r2(min("l_extendedprice")).as("lo"),
          r2(max("l_extendedprice")).as("hi"))
        .orderBy("bucket")
    },
    Some("""SELECT CAST(floor(l_extendedprice / 5500.0) AS INT) AS bucket,
           |  count(*) AS n,
           |  round(min(l_extendedprice), 2) AS lo,
           |  round(max(l_extendedprice), 2) AS hi
           |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- q53
  /** One-pass table profile — the data-quality snapshot a pipeline
    * monitor computes per partition-load: row count, per-column null
    * counts, exact distinct counts for the low-cardinality columns, and
    * value ranges. A single stacked aggregation: one scan, one
    * reduce-to-one-row (count-distincts expand internally, still
    * shuffle-bounded by column cardinality, never by row count). */
  val q53Profile = QueryDef(
    "q53_profile",
    (s, d) => {
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
        sum(col("o_orderstatus").isNull.cast("long")).as("null_status"),
        countDistinct("o_orderstatus").as("ndv_status"),
        countDistinct("o_orderpriority").as("ndv_priority"),
        r2(min("o_totalprice")).as("min_price"),
        r2(max("o_totalprice")).as("max_price"),
        min(to_date(col("o_orderdate"))).as("min_date"),
        max(to_date(col("o_orderdate"))).as("max_date"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS null_custkey,
           |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS null_status,
           |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status,
           |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv_priority,
           |  round(min(o_totalprice), 2) AS min_price,
           |  round(max(o_totalprice), 2) AS max_price,
           |  CAST(min(o_orderdate) AS DATE) AS min_date,
           |  CAST(max(o_orderdate) AS DATE) AS max_date
           |FROM orders""".stripMargin))

  // ---------------------------------------------------------------- q66
  /** Exact heavy hitters with bounded memory — the two-pass
    * sketch-then-recount pattern: pass 1 runs a Misra-Gries summary
    * (k = 16384 counters) over the corpus trigram stream as one
    * map-side-combined aggregate, whose survivors are a CANDIDATE set
    * guaranteed to contain every trigram with frequency > n/(k+1);
    * pass 2 recounts only the candidates exactly (broadcast semi-join →
    * hash-agg bounded by k groups) and keeps those above the guarantee
    * threshold. Output is exact and deterministic even though the
    * sketch itself is merge-order-dependent — so the oracle is plain
    * GROUP BY/HAVING, while at 100 TB the engine never materializes the
    * full n-gram vocabulary (the naive groupBy's shuffle cardinality).
    *
    * Scale shape: two corpus scans (pass 1 carries n_total alongside
    * the sketch in the same aggregate); state is ≤ k entries per map
    * task (pass 1) and ≤ k groups total (pass 2). The candidate
    * broadcast is ≤ k rows by construction. */
  val q66HeavyHitters = QueryDef(
    "q66_heavy_hitters",
    (s, d) => {
      val k = 16384
      val mg = udaf(new graft.functions.MisraGries(k), Encoders.STRING)
      def grams = Tables.documents(s, d)
        .select(T.tokens(col("text")).as("toks"))
        .select(explode(T.shinglesAll(col("toks"), 3)).as("gram"))
      // one pass-1 aggregate yields BOTH the sketch and n_total; the
      // broadcast candidate table carries n_total on every row, so the
      // recount inner-join replaces semi-join + scalar cross-join and
      // pass 1 runs exactly once (not once per consumer)
      val cand = grams
        .agg(mg(col("gram")).as("sk"), count(lit(1)).as("n_total"))
        .select(explode(map_keys(col("sk"))).as("gram"), col("n_total"))
      grams.join(broadcast(cand), Seq("gram"))
        .groupBy("gram", "n_total").agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * (k + 1) > col("n_total"))
        .select(col("gram"), col("n_occurrences"),
          r6(col("n_occurrences") / col("n_total")).as("share"))
        .orderBy(col("n_occurrences").desc, col("gram"))
    },
    Some("""WITH g AS (
           |  SELECT unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
           |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
           |  FROM (SELECT string_split(text, ' ') AS t FROM documents)),
           |tot AS (SELECT count(*) AS n_total FROM g)
           |SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences,
           |  round(count(*) / (SELECT n_total FROM tot) * 1000000) / 1000000
           |    AS share
           |FROM g GROUP BY gram
           |HAVING count(*) * 16385 > (SELECT n_total FROM tot)
           |ORDER BY n_occurrences DESC, gram""".stripMargin))

  // ---------------------------------------------------------------- q67
  /** Mergeable distinct-count rollup: per (event_type, day) HLL sketches
    * of the user set, unioned per event_type — the pre-aggregation
    * pattern that makes 100 TB distinct-counting cheap: daily sketches
    * are built once (map-side combinable, fixed 2^12 registers), and any
    * rollup (weekly/monthly/all-time, any type subset) is a register-max
    * union over the TINY sketch table, never a re-scan of the raw log.
    * `sum_daily` carries the naive sum-of-daily-distincts for contrast
    * (it overcounts users active on multiple days — the error sketches
    * exist to avoid).
    *
    * No oracle: the estimates are DataSketches-specific (deterministic —
    * HLL state is a register-wise max, order-independent — but not
    * reproducible in the oracle engine). SketchRollupSpec gates the
    * estimates against exact distincts (<2% error at lgK=12) and pins
    * union-vs-direct consistency. */
  val q67SketchRollup = QueryDef(
    "q67_sketch_rollup",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          count_distinct(col("user_id")).as("n_exact_day"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .cast("long").as("est_users"),
          sum("n_exact_day").as("sum_daily"))
        .orderBy("event_type")
    },
    None)

  // ---------------------------------------------------------------- q77
  /** Per-GROUP heavy hitters — q66's sketch-then-recount pattern
    * composed under groupBy: one Misra-Gries summary per source
    * (k = 1024 counters each, still one map-side-combined aggregate),
    * survivors recounted exactly per (source, gram) and kept above each
    * source's own n/(k+1) guarantee threshold. Same exact-output
    * property as q66, but the sketch state is now per-GROUP bounded —
    * the form a curation pipeline uses for "top boilerplate per crawl"
    * without materializing any per-source vocabulary.
    *
    * Scale shape: two scans (pass 1 carries each source's n_total in
    * the same aggregate as its sketch); pass-1 state ≤ k per (source,
    * map task), candidate broadcast ≤ k·|sources| rows, pass-2 groups
    * ≤ the same. Nothing scales with vocabulary size. */
  val q77GroupHeavyHitters = QueryDef(
    "q77_group_heavy_hitters",
    (s, d) => {
      val k = 1024
      val mg = udaf(new graft.functions.MisraGries(k), Encoders.STRING)
      def grams = Tables.documents(s, d)
        .select(col("source"), T.tokens(col("text")).as("toks"))
        .select(col("source"), explode(T.shinglesAll(col("toks"), 3)).as("gram"))
      // pass 1 yields each source's sketch AND n_total in one aggregate;
      // the broadcast candidates carry n_total, so the recount
      // inner-join replaces semi-join + totals re-join and pass 1 runs
      // exactly once (not once per consumer)
      val cand = grams.groupBy("source")
        .agg(mg(col("gram")).as("sk"), count(lit(1)).as("n_total"))
        .select(col("source"), explode(map_keys(col("sk"))).as("gram"),
          col("n_total"))
      grams.join(broadcast(cand), Seq("source", "gram"))
        .groupBy("source", "gram", "n_total")
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * (k + 1) > col("n_total"))
        .select(col("source"), col("gram"), col("n_occurrences"),
          r6(col("n_occurrences") / col("n_total")).as("share"))
        .orderBy(col("source"), col("n_occurrences").desc, col("gram"))
    },
    Some("""WITH g AS (
           |  SELECT source,
           |    unnest(list_transform(range(1, greatest(len(t)-2, 0)+1),
           |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
           |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)),
           |tot AS (SELECT source, count(*) AS n_total FROM g GROUP BY 1)
           |SELECT g.source, g.gram, CAST(count(*) AS BIGINT) AS n_occurrences,
           |  round(count(*) / any_value(t.n_total) * 1000000) / 1000000
           |    AS share
           |FROM g JOIN tot t USING (source)
           |GROUP BY g.source, g.gram
           |HAVING count(*) * 1025 > any_value(t.n_total)
           |ORDER BY g.source, n_occurrences DESC, g.gram""".stripMargin))

  // ---------------------------------------------------------------- q86
  /** Mergeable quantile sketch audit: per-group approx percentiles
    * (Spark's Greenwald-Khanna summary via `approx_percentile`, the
    * mergeable single-pass path — O(1/ε) state per group, no sort) set
    * against q34's exact interpolated percentiles, with the value gap —
    * completing the sketch family beside q66 (frequency) and q67
    * (distinct): at 100 TB the exact percentile needs a per-group sort
    * while the sketch is one map-side-combinable pass, and this table
    * is the evidence for when the swap is safe.
    *
    * No oracle: GK summary state depends on merge order (accuracy-
    * bounded, not bit-reproducible). SketchSpec gates the RANK error —
    * the fraction of group rows at or below each approx quantile must
    * sit within the sketch's ε guarantee of the target fraction. */
  val q86QuantileSketch = QueryDef(
    "q86_quantile_sketch",
    (s, d) => {
      val accuracy = 10000
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          expr(s"approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), $accuracy)")
            .as("approx"),
          expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").as("exact"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          col("approx")(0).as("ap50"), col("approx")(1).as("ap90"),
          col("approx")(2).as("ap99"),
          col("exact")(0).as("ex50"), col("exact")(1).as("ex90"),
          col("exact")(2).as("ex99"), col("n"))
        .orderBy("o_orderpriority")
    },
    None)

  // ---------------------------------------------------------------- q92
  /** Join-key skew audit — the diagnostic run BEFORE pointing a 100 TB
    * join or aggregation at a key: the 10 hottest user_id values with
    * their row share, cumulative share, and multiple-of-the-mean. This
    * is what decides between plain shuffle, q36-style salting, AQE skew
    * split, or pulling the hot keys into a broadcast side-channel; the
    * max key's share IS the lower bound on reducer imbalance.
    *
    * Scale shape: one map-side-combined hash-agg to the key domain, a
    * TakeOrdered(10) for the hot set, and a 2-row broadcast of the
    * (total, n_keys) summary — the counts table never re-shuffles and
    * nothing corpus-sized reaches the driver. */
  val q92SkewAudit = QueryDef(
    "q92_skew_audit",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // ONE pass: corpus → per-key counts → a single bounded typed
      // aggregate folding (total, n_keys, top-10) together, so the
      // counts subplan is never planned (and scanned) twice.
      val topk = udaf(new graft.functions.TopKByCount(10),
        Encoders.product[(Long, Long)])
      val summary = Tables.events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
        .agg(topk(col("user_id"), col("n")).as("s"))
        .select(col("s._1").as("total"), col("s._2").as("n_keys"),
          posexplode(col("s._3")))
        .select(col("total"), col("n_keys"),
          (col("pos") + 1).cast("int").as("rank"),
          col("col._2").as("user_id"), col("col._1").as("n"))
      val w = Window.orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      summary.select(col("rank"), col("user_id"), col("n"),
          r6(col("n").cast("double") / col("total")).as("share"),
          r6(sum("n").over(w).cast("double") / col("total")).as("cum_share"),
          r2(col("n") * col("n_keys").cast("double") / col("total"))
            .as("x_mean"))
        .orderBy("rank")
    },
    Some("""WITH counts AS (
           |  SELECT user_id, count(*) AS n FROM events GROUP BY 1),
           |tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM counts),
           |top AS (
           |  SELECT user_id, n,
           |    row_number() OVER (ORDER BY n DESC, user_id) AS rank
           |  FROM counts ORDER BY n DESC, user_id LIMIT 10)
           |SELECT rank, user_id, n,
           |  round(CAST(n AS DOUBLE) / total * 1000000) / 1000000 AS share,
           |  round(sum(n) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
           |    / CAST(total AS DOUBLE) * 1000000) / 1000000 AS cum_share,
           |  round(n * CAST(n_keys AS DOUBLE) / total * 100) / 100 AS x_mean
           |FROM top CROSS JOIN tot ORDER BY rank""".stripMargin))

  // ---------------------------------------------------------------- q93
  /** Sketch-based audience OVERLAP: distinct users who both clicked and
    * purchased per day, estimated by inclusion-exclusion over HLL
    * sketches — |A∩B| ≈ |A| + |B| − |A∪B| — computed in ONE pass with
    * three conditional approx_count_distinct aggregates (the union
    * sketch absorbs rows of either type; no join, no second scan).
    * The exact formulation needs a distinct-pair shuffle and a
    * self-join; the sketch form is one map-side-combined agg with O(1)
    * state per (day, sketch) — the only audience-overlap shape that
    * holds at 100 TB. Engine-specific estimates ⇒ rows-only; SketchSpec
    * gates the estimate against the exact overlap. */
  val q93SketchOverlap = QueryDef(
    "q93_sketch_overlap",
    (s, d) => {
      val DayUs = 86400000000L
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(expr(s"unix_micros(ts) div ${DayUs}L").as("day"),
          col("event_type"), col("user_id"))
        // rsd 0.02, not 0.01: Spark's HLL++ register count grows ~1/rsd²
        // and the dense buffers are allocated + merged PER (group ×
        // partial), so halving rsd cost 22× in agg wall-time at sf0.1
        // (measured: 4.4 s vs 0.2 s) for precision the differenced
        // overlap estimate cannot use anyway — the SketchSpec gate
        // (5% of the exact overlap) holds at either setting.
        .groupBy("day")
        .agg(
          approx_count_distinct(
            when(col("event_type") === "click", col("user_id")), 0.02)
            .as("est_click"),
          approx_count_distinct(
            when(col("event_type") === "purchase", col("user_id")), 0.02)
            .as("est_purchase"),
          approx_count_distinct(col("user_id"), 0.02).as("est_union"))
        .withColumn("est_both",
          greatest(col("est_click") + col("est_purchase") - col("est_union"),
            lit(0L)))
        .orderBy("day")
    },
    None)

  // --------------------------------------------------------------- q113
  /** Pareto / contribution curve: how concentrated is revenue across
    * parts — the 80/20 report behind assortment and capacity decisions.
    * Parts aggregate to exact BIGINT cents, collapse into fixed-width
    * revenue bands (the q59 value-histogram posture: the descending
    * cumulative runs over the band table, whose cardinality is bounded
    * by max-part-revenue / width, never by the part count), and each
    * band reports the cumulative part/revenue share from the top plus
    * the flag marking where the curve crosses 80 %.
    *
    * All-integer until the final share divisions of exact sums —
    * order-proof, bit-exact cross-engine. */
  val q113Pareto = QueryDef(
    "q113_pareto",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val BandCents = 25000000L
      val parts = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .groupBy("l_partkey").agg(sum("cents").as("rev"))
      val bands = parts
        .select(expr(s"rev div ${BandCents}L").as("band"),
          col("rev"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("band_cents"))
      val totals = bands.agg(sum("n_parts").as("tp"),
        sum("band_cents").as("tc"))
      val w = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bands.crossJoin(broadcast(totals))
        .withColumn("cum_parts", sum("n_parts").over(w))
        .withColumn("cum_cents", sum("band_cents").over(w))
        .select(col("band"), col("n_parts"),
          r2(col("band_cents") / 100.0).as("band_revenue"),
          col("cum_parts"),
          r6(col("cum_parts").cast("double") / col("tp")).as("part_share"),
          r6(col("cum_cents").cast("double") / col("tc")).as("rev_share"),
          (col("cum_cents") * 5L >= col("tc") * 4L).as("covers_80pct"))
        .orderBy(col("band").desc)
    },
    Some("""WITH parts AS (
           |  SELECT l_partkey,
           |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev
           |  FROM lineitem GROUP BY 1),
           |bands AS (
           |  SELECT CAST(rev // 25000000 AS BIGINT) AS band,
           |    CAST(count(*) AS BIGINT) AS n_parts,
           |    CAST(sum(rev) AS BIGINT) AS band_cents
           |  FROM parts GROUP BY 1),
           |tot AS (SELECT sum(n_parts) AS tp, sum(band_cents) AS tc
           |  FROM bands),
           |c AS (
           |  SELECT bands.*, tp, tc,
           |    sum(n_parts) OVER (ORDER BY band DESC
           |      ROWS UNBOUNDED PRECEDING) AS cum_parts,
           |    sum(band_cents) OVER (ORDER BY band DESC
           |      ROWS UNBOUNDED PRECEDING) AS cum_cents
           |  FROM bands CROSS JOIN tot)
           |SELECT band, n_parts,
           |  round(band_cents / 100.0 * 100) / 100 AS band_revenue,
           |  CAST(cum_parts AS BIGINT) AS cum_parts,
           |  round(CAST(cum_parts AS DOUBLE) / tp * 1000000) / 1000000
           |    AS part_share,
           |  round(CAST(cum_cents AS DOUBLE) / tc * 1000000) / 1000000
           |    AS rev_share,
           |  cum_cents * 5 >= tc * 4 AS covers_80pct
           |FROM c ORDER BY band DESC""".stripMargin))

  // --------------------------------------------------------------- q114
  /** Per-source Gini coefficient over document lengths — q113's
    * single-number twin, the inequality diagnostic a data-mix review
    * reads per domain (a source whose token mass sits in a few huge
    * docs behaves differently under packing/sampling than a uniform
    * one). Exact rank formula G = Σ(2i − n − 1)·xᵢ / (n·Σx) over
    * ascending lengths.
    *
    * Scale shape: ONE window partitioned by source (high cardinality —
    * one exchange, parallel across sources; the x07 posture) feeding a
    * same-key hash-agg; the numerator is an exact BIGINT sum with a
    * (n_chars, doc_id) total order so ranks are deterministic. */
  val q114SourceGini = QueryDef(
    "q114_source_gini",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy("source")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          sum((col("i") * 2L - col("n") - 1L) * col("n_chars")).as("num"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          r6(col("num").cast("double")
            / (col("n_docs") * col("total_chars"))).as("gini"))
        .orderBy("source")
    },
    Some("""WITH r AS (
           |  SELECT source, n_chars,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars, doc_id) AS i,
           |    count(*) OVER (PARTITION BY source) AS n
           |  FROM documents)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |  round(CAST(sum((2 * i - n - 1) * n_chars) AS DOUBLE)
           |    / (count(*) * sum(n_chars)) * 1000000) / 1000000 AS gini
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  // --------------------------------------------------------------- q117
  /** MAD-based robust outlier audit: per event_type, the median and the
    * median absolute deviation of `value`, and how many rows sit beyond
    * 3 robust sigmas (MAD × 1.4826 ≈ σ for a normal). The robust twin
    * of q60's z-score — a handful of billion-dollar rows can't drag the
    * center the way they drag a mean/stddev.
    *
    * Scale shape: three hash-agg passes over the same scan (median →
    * MAD → outlier count), each keyed by event_type with the grid-sized
    * per-type stats broadcast back — never a sort of the full log.
    * Values move as exact milli-unit BIGINTs so the percentile
    * interpolation is on integers (the established parity posture). */
  val q117MadOutliers = QueryDef(
    "q117_mad_outliers",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("cast(round(value * 1000) as bigint)").as("mv"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY mv)")
          .as("med_mv"))
        .withColumnRenamed("event_type", "et_m")
      val dev = ev.join(broadcast(med), col("event_type") === col("et_m"))
        .withColumn("adev", abs(col("mv").cast("double") - col("med_mv")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)")
          .as("mad_mv"))
        .withColumnRenamed("event_type", "et_d")
      dev.join(broadcast(mad), col("event_type") === col("et_d"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          r4(first(col("med_mv")) / 1000.0).as("median"),
          r4(first(col("mad_mv")) / 1000.0).as("mad"),
          sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad_mv"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_share",
          r6(col("n_outliers").cast("double") / col("n")))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
           |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS mv
           |  FROM events),
           |med AS (
           |  SELECT event_type, quantile_cont(mv, 0.5) AS med_mv
           |  FROM e GROUP BY 1),
           |dev AS (
           |  SELECT e.event_type, mv,
           |    abs(CAST(mv AS DOUBLE) - med_mv) AS adev, med_mv
           |  FROM e JOIN med USING (event_type)),
           |mad AS (
           |  SELECT event_type, quantile_cont(adev, 0.5) AS mad_mv
           |  FROM dev GROUP BY 1)
           |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(any_value(med_mv) / 1000.0 * 10000) / 10000 AS median,
           |  round(any_value(mad_mv) / 1000.0 * 10000) / 10000 AS mad,
           |  CAST(sum(CASE WHEN adev > 3.0 * 1.4826 * mad_mv
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           |  round(CAST(sum(CASE WHEN adev > 3.0 * 1.4826 * mad_mv
           |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 1000000)
           |    / 1000000 AS outlier_share
           |FROM dev JOIN mad USING (event_type)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // --------------------------------------------------------------- q130
  /** Leaderboard churn: the week-over-week stability of the top-20
    * parts by revenue — common members, Jaccard of consecutive weekly
    * top sets, and the entrant count. A stable leaderboard means the
    * heavy hitters q66/q77 cache is durable; high churn means
    * rank-based caching/buying decisions go stale in a week.
    *
    * Scale shape: one hash-agg to (week, part) exact cents, the top-20
    * cut as a rank window over that aggregate (WindowGroupLimit keeps
    * it a bounded heap), then a self equi-join of the 20-row-per-week
    * sets on (part, adjacent week) — set-bounded, never lineitem². */
  val q130LeaderboardChurn = QueryDef(
    "q130_leaderboard_churn",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val WeekUs = 604800000000L
      val weekly = Tables.lineitem(s, d)
        .select(
          expr(s"unix_micros(cast(l_shipdate as timestamp)) div $WeekUs")
            .as("week"),
          col("l_partkey"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("cc"))
        .groupBy("week", "l_partkey").agg(sum("cc").as("rev"))
      val w = Window.partitionBy("week")
        .orderBy(col("rev").desc, col("l_partkey"))
      val top = weekly.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("week"), col("l_partkey"))
      // fully-renamed right side: both branches derive from `top`, and
      // unrenamed self-join keys throw conflicting-references
      val nxt = top.select((col("week") - 1L).as("prev_week"),
        col("l_partkey").as("nxt_part"))
      val maxw = top.agg(max("week").as("maxw"))
      top.join(nxt,
          col("week") === col("prev_week") &&
            col("l_partkey") === col("nxt_part"), "left")
        .groupBy("week")
        .agg(sum(when(col("nxt_part").isNotNull, 1L).otherwise(0L))
          .as("n_common"))
        .crossJoin(broadcast(maxw))
        // only weeks that HAVE a next week: the last week's zero overlap
        // is an edge artifact, not churn
        .filter(col("week") < col("maxw"))
        .select(col("week"), col("n_common"),
          r4(col("n_common").cast("double")
            / (lit(40L) - col("n_common"))).as("jaccard"),
          (lit(20L) - col("n_common")).as("n_entrants"))
        .orderBy("week")
    },
    Some("""WITH weekly AS (
           |  SELECT epoch_us(l_shipdate) // 604800000000 AS week,
           |    l_partkey,
           |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           |      AS BIGINT) AS rev
           |  FROM lineitem GROUP BY 1, 2),
           |top AS (
           |  SELECT week, l_partkey FROM (
           |    SELECT week, l_partkey, row_number() OVER (
           |      PARTITION BY week ORDER BY rev DESC, l_partkey) AS rk
           |    FROM weekly)
           |  WHERE rk <= 20),
           |j AS (
           |  SELECT t.week, CAST(count(*) AS BIGINT) AS n_top,
           |    CAST(sum(CASE WHEN n.l_partkey IS NOT NULL THEN 1 ELSE 0
           |      END) AS BIGINT) AS n_common
           |  FROM top t LEFT JOIN top n
           |    ON n.week = t.week + 1 AND n.l_partkey = t.l_partkey
           |  GROUP BY 1)
           |SELECT week, n_common,
           |  round(CAST(n_common AS DOUBLE) / (40 - n_common) * 10000)
           |    / 10000 AS jaccard,
           |  20 - n_common AS n_entrants
           |FROM j WHERE week < (SELECT max(week) FROM top)
           |ORDER BY week""".stripMargin))

  // --------------------------------------------------------------- q182
  /** 2-D skyline (Pareto front): the parts no other part beats on BOTH
    * price and size — the multi-objective shortlist ("cheapest for its
    * size class") that single-key top-k can't express, and q113's
    * banded-Pareto discipline applied to DOMINANCE. The textbook form
    * is a quadratic NOT EXISTS self-join (the oracle states exactly
    * that semantics); the registered plan is the q59 histogram trick
    * applied to dominance pruning: dollar-wide price BANDS carry their
    * min size, a prefix-min over the ≤100-row band grid broadcasts
    * back, and any point with a strictly-cheaper band at ≤ its size is
    * dominated BEFORE any pairwise work — the exact check runs only
    * among same-band survivors (dominance is transitive, and a
    * surviving point's minimal dominator is provably same-band, so
    * the band-local anti-join is sufficient, not approximate).
    *
    * Scale shape: ONE corpus scan → band hash-agg; prefix-min over the
    * band GRID; broadcast back; the pairwise anti-join touches only
    * same-band survivors (a vanishing fraction — the skyline and its
    * shadow). All-integer dominance (exact cents, integer sizes), so
    * ties resolve identically in any engine. */
  val q182Skyline = QueryDef(
    "q182_skyline",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val BandC = 100L
      val pts = Tables.part(s, d)
        .select(col("p_partkey").as("part_key"),
          expr("cast(round(p_retailprice * 100) as bigint)").as("price_c"),
          col("p_size").cast("long").as("size"))
      val bands = pts.groupBy(expr(s"price_c div ${BandC}L").as("pb"))
        .agg(min("size").as("band_min"))
      val wPrefix = Window.orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = bands
        .withColumn("m_lower", min("band_min").over(wPrefix))
        .select("pb", "m_lower")
      val cand = pts
        .withColumn("pb", expr(s"price_c div ${BandC}L"))
        .join(broadcast(prefix), "pb")
        .filter(col("m_lower").isNull || col("m_lower") > col("size"))
      cand.as("p").join(cand.as("q"),
          col("q.pb") === col("p.pb") &&
            col("q.price_c") <= col("p.price_c") &&
            col("q.size") <= col("p.size") &&
            (col("q.price_c") < col("p.price_c") ||
              col("q.size") < col("p.size")),
          "left_anti")
        .select(col("part_key"), col("price_c"), col("size"))
        .orderBy("price_c", "part_key")
    },
    Some("""SELECT p.p_partkey AS part_key,
           |  CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_c,
           |  CAST(p.p_size AS BIGINT) AS size
           |FROM part p
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM part q
           |  WHERE CAST(round(q.p_retailprice * 100) AS BIGINT)
           |      <= CAST(round(p.p_retailprice * 100) AS BIGINT)
           |    AND q.p_size <= p.p_size
           |    AND (CAST(round(q.p_retailprice * 100) AS BIGINT)
           |        < CAST(round(p.p_retailprice * 100) AS BIGINT)
           |      OR q.p_size < p.p_size))
           |ORDER BY price_c, part_key""".stripMargin))

  val all: Seq[QueryDef] = Seq(q36SaltedAgg, q46HashSample, q50Histogram,
    q53Profile, q66HeavyHitters, q67SketchRollup, q77GroupHeavyHitters,
    q86QuantileSketch, q92SkewAudit, q93SketchOverlap, q113Pareto,
    q114SourceGini, q117MadOutliers, q130LeaderboardChurn, q182Skyline)
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions => T}
import graft.functions.Rounding.{r2, r4, r6}

/** Corpus-curation operators for large-scale training-data pipelines:
  * train/test decontamination, stratified sampling, domain-mix weighting,
  * PII redaction, and repetition detection. These are the operations run
  * over a raw crawl between ingest and training; all are formulated as
  * projections + equi-joins + window functions, so they hold their shape
  * at 100 TB (no all-pairs work, no driver-side state).
  */
object Curation {

  // ---------------------------------------------------------------- x01
  /** Train/test decontamination: flag training documents that share any
    * 8-token n-gram with a held-out benchmark set (the standard guard
    * against evaluation leakage in pretraining corpora). The benchmark
    * membership is a deterministic md5 sample (~1/16th) so both engines
    * — and any retry — pick the identical set.
    *
    * Scale shape: posting-list equi-join on the shingle (like d05), so
    * work is ∝ Σ matches, never |train| × |bench|. The benchmark n-gram
    * set is the join's build side; real benchmark suites are tiny
    * relative to a crawl, hence the broadcast hint — at 100 TB the train
    * side streams map-side with zero shuffle of the corpus itself. */
  val x01Decontaminate = QueryDef(
    "x01_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"),
          (substring(md5(col("doc_id").cast("string")), 1, 1) === "0").as("is_bench"))
      val sh = docs.select(col("doc_id"), col("is_bench"),
        explode(T.shingles(col("toks"), 8)).as("g"))
      val bench = sh.filter(col("is_bench")).select("g").distinct()
      val hits = sh.filter(!col("is_bench"))
        .join(broadcast(bench), Seq("g"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
      docs.filter(!col("is_bench")).select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).cast("int").as("contaminated"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS t,
           |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_bench
           |  FROM documents),
           |sh AS (SELECT doc_id, is_bench,
           |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-7, 0)+1),
           |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
           |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))) AS g
           |  FROM toks),
           |bench AS (SELECT DISTINCT g FROM sh WHERE is_bench),
           |hits AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
           |  FROM sh s JOIN bench USING (g) WHERE NOT s.is_bench GROUP BY 1)
           |SELECT t.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
           |  CAST(COALESCE(h.n_shared, 0) > 0 AS INT) AS contaminated
           |FROM toks t LEFT JOIN hits h USING (doc_id)
           |WHERE NOT t.is_bench ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x02
  /** Stratified deterministic sampling: keep ⌈20%⌉ of every
    * (lang, source) stratum, selected by md5 order — reproducible across
    * engines, retries, and partitionings (rand()/TABLESAMPLE are
    * neither), and guaranteed non-empty per stratum via the ceiling.
    * One window shuffle on the stratum key; at 100 TB the per-stratum
    * ordering is the only cost and AQE splits skewed strata. */
  val x02StratifiedSample = QueryDef(
    "x02_stratified_sample",
    (s, d) => {
      val byStratum = Window.partitionBy("lang", "source")
      val w = byStratum.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_grp", count(lit(1)).over(byStratum))
        .filter(col("rn") <= ceil(col("n_grp") * 0.2))
        .select(col("doc_id"), col("lang"), col("source"), col("rn").cast("int").as("rn"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, source, CAST(rn AS INT) AS rn FROM (
           |  SELECT doc_id, lang, source,
           |    row_number() OVER (PARTITION BY lang, source
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           |    count(*) OVER (PARTITION BY lang, source) AS n_grp
           |  FROM documents)
           |WHERE rn <= ceil(n_grp * 0.2) ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x03
  /** Domain-mix weighting: per-source resampling weight that would flatten
    * the corpus to a uniform source mix (the degenerate but standard
    * target; any target vector drops in). weight > 1 ⇒ upsample.
    * Two tiny aggregates + a scalar broadcast — no corpus shuffle. */
  val x03DomainMix = QueryDef(
    "x03_domain_mix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val totals = docs.agg(count(lit(1)).cast("double").as("n_total"),
        countDistinct("source").cast("double").as("n_sources"))
      docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs"),
          r6(col("n_docs") / col("n_total")).as("actual_frac"),
          r6((col("n_total") / col("n_sources")) / col("n_docs")).as("mix_weight"))
        .orderBy("source")
    },
    Some("""WITH tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total,
           |    CAST(count(DISTINCT source) AS DOUBLE) AS n_sources FROM documents)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  round(count(*) / n_total, 6) AS actual_frac,
           |  round((n_total / n_sources) / count(*), 6) AS mix_weight
           |FROM documents CROSS JOIN tot
           |GROUP BY source, n_total, n_sources ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- t06
  /** PII redaction: scrub emails and IPv4 addresses, report counts and
    * the redacted content hash. The corpus is synthetic (no real PII), so
    * the query plants deterministic PII spans for ~1/3 of docs first —
    * identically in both engines — then redacts them; the spec asserts
    * the redaction semantics on crafted literals. Regexes are in the
    * RE2 ∩ java.util.regex dialect (no lookaround, no backrefs) so Spark,
    * DuckDB, and any RE2-based engine agree. Pure per-row projection. */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val t06PiiRedact = QueryDef(
    "t06_pii_redact",
    (s, d) => {
      val id = col("doc_id").cast("string")
      val planted = concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), id, lit("@mail.example.com asap"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" via 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".17 gateway"))).otherwise(lit("")))
      Tables.documents(s, d)
        .withColumn("aug", planted)
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).cast("int").as("n_emails"),
          regexp_count(col("aug"), lit(ipRe)).cast("int").as("n_ips"),
          md5(regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            ipRe, "<IP>")).as("redacted_hash"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
            |  CAST(len(regexp_extract_all(aug, '$emailRe')) AS INT) AS n_emails,
            |  CAST(len(regexp_extract_all(aug, '$ipRe')) AS INT) AS n_ips,
            |  md5(regexp_replace(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g'),
            |    '$ipRe', '<IP>', 'g')) AS redacted_hash
            |FROM (SELECT doc_id, text ||
            |    (CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
            |      CAST(doc_id AS VARCHAR) || '@mail.example.com asap' ELSE '' END) ||
            |    (CASE WHEN doc_id % 5 = 0 THEN ' via 10.0.' ||
            |      CAST(doc_id % 256 AS VARCHAR) || '.17 gateway' ELSE '' END) AS aug
            |  FROM documents)
            |ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t07
  /** Repetition detection (the Gopher-style quality heuristics): duplicate
    * token fraction, most-frequent-token share, and most-frequent-bigram
    * share per document. High values mark boilerplate/spam for filtering.
    * Two explode→hash-agg passes + equi-joins back on doc_id — linear,
    * no cross-doc work at all. */
  val t07Repetition = QueryDef(
    "t07_repetition",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      val base = docs.select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(array_distinct(col("toks"))).as("n_distinct"))
      val topTok = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_tok"))
      // adjacent (non-distinct) bigrams: zip tokens with their successors
      val bigrams = docs.select(col("doc_id"),
        explode(filter(
          zip_with(col("toks"),
            slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
            (a, b) => when(b.isNull, lit(null)).otherwise(concat(a, lit(" "), b))),
          x => x.isNotNull)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_bg"))
      base.join(topTok, Seq("doc_id"), "left")
        .join(bigrams, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          r4(lit(1.0) - col("n_distinct") / col("n_toks").cast("double")).as("dup_tok_frac"),
          r4(coalesce(col("top_tok"), lit(0L)) / col("n_toks").cast("double")).as("top_tok_share"),
          when(col("n_toks") > 1,
            r4(coalesce(col("top_bg"), lit(0L)) / (col("n_toks") - 1).cast("double")))
            .otherwise(lit(0.0)).as("top_bigram_share"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           |base AS (SELECT doc_id, len(t) AS n_toks, len(list_distinct(t)) AS n_distinct
           |  FROM toks),
           |tc AS (SELECT doc_id, max(c) AS top_tok FROM (
           |    SELECT doc_id, tok, count(*) AS c
           |    FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2)
           |  GROUP BY 1),
           |bc AS (SELECT doc_id, max(c) AS top_bg FROM (
           |    SELECT doc_id, bg, count(*) AS c
           |    FROM (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 0)+1),
           |        i -> t[i] || ' ' || t[i+1])) AS bg FROM toks) GROUP BY 1, 2)
           |  GROUP BY 1)
           |SELECT b.doc_id, CAST(b.n_toks AS INT) AS n_toks,
           |  round(1.0 - b.n_distinct / CAST(b.n_toks AS DOUBLE), 4) AS dup_tok_frac,
           |  round(COALESCE(tc.top_tok, 0) / CAST(b.n_toks AS DOUBLE), 4) AS top_tok_share,
           |  CASE WHEN b.n_toks > 1 THEN
           |    round(COALESCE(bc.top_bg, 0) / CAST(b.n_toks - 1 AS DOUBLE), 4)
           |  ELSE 0.0 END AS top_bigram_share
           |FROM base b LEFT JOIN tc USING (doc_id) LEFT JOIN bc USING (doc_id)
           |ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x04
  /** Fuzzy decontamination: where x01 flags ANY shared 8-gram, this
    * scores how much of each training doc is covered by some benchmark
    * doc — containment(d, b) = |shingles(d) ∩ shingles(b)| / |shingles(d)|
    * — and reports the best-matching benchmark doc. Binary overlap
    * over-flags (one idiom in common); containment ≥ 0.5 is the usual
    * "this is substantially the eval document" cut.
    *
    * Scale shape: same posting-list equi-join as x01/d05 (work ∝ shingle
    * matches, never |train|×|bench|), then one window over the candidate
    * pairs — which are few by construction. Benchmark side broadcast. */
  val x04ContainmentScore = QueryDef(
    "x04_decontaminate_fuzzy",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"),
          (substring(md5(col("doc_id").cast("string")), 1, 1) === "0").as("is_bench"))
      val sh = docs.select(col("doc_id"), col("is_bench"),
        explode(T.shingles(col("toks"), 8)).as("g"))
      val nsh = sh.filter(!col("is_bench"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_g")) // shingles distinct per doc
      val bench = sh.filter(col("is_bench"))
        .select(col("doc_id").as("bench_id"), col("g"))
      val pairs = sh.filter(!col("is_bench"))
        .join(broadcast(bench), Seq("g"))
        .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("shared"))
        .join(nsh, Seq("doc_id"))
        .withColumn("containment", col("shared") / col("n_g"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("containment").desc, col("bench_id"))
      val best = pairs.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("bench_id"), col("shared"), col("containment"))
      docs.filter(!col("is_bench")).select("doc_id")
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("bench_id").as("best_bench"),
          coalesce(col("shared"), lit(0L)).as("n_shared"),
          r4(coalesce(col("containment"), lit(0.0))).as("containment"),
          (coalesce(col("containment"), lit(0.0)) >= 0.5).cast("int").as("flagged"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS t,
           |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_bench
           |  FROM documents),
           |sh AS (SELECT doc_id, is_bench,
           |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-7, 0)+1),
           |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
           |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))) AS g
           |  FROM toks),
           |nsh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_g
           |  FROM sh WHERE NOT is_bench GROUP BY 1),
           |pairs AS (
           |  SELECT s.doc_id, b.doc_id AS bench_id,
           |    CAST(count(*) AS BIGINT) AS shared
           |  FROM sh s JOIN sh b USING (g)
           |  WHERE NOT s.is_bench AND b.is_bench GROUP BY 1, 2),
           |scored AS (
           |  SELECT p.doc_id, p.bench_id, p.shared,
           |    p.shared / CAST(n.n_g AS DOUBLE) AS containment
           |  FROM pairs p JOIN nsh n USING (doc_id)),
           |best AS (
           |  SELECT *, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY containment DESC, bench_id) AS rk FROM scored)
           |SELECT t.doc_id, b.bench_id AS best_bench,
           |  COALESCE(b.shared, 0) AS n_shared,
           |  round(COALESCE(b.containment, 0), 4) AS containment,
           |  CAST(COALESCE(b.containment, 0) >= 0.5 AS INT) AS flagged
           |FROM toks t LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
           |WHERE NOT t.is_bench ORDER BY t.doc_id""".stripMargin))

  // ---------------------------------------------------------------- x05
  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis): each doc draws u ∈ (0,1) from its md5 (not rand() — the
    * draw replays identically across engines, retries, and
    * partitionings) and is ranked by ln(u)/w with weight w = n_chars;
    * the top-k by that key IS a weighted sample without replacement.
    * Length-weighting is the standard token-budget-proportional document
    * draw for corpus mixing.
    *
    * Scale shape: a pure projection + global top-k (TakeOrderedAndProject
    * — per-partition heaps, no full sort, no shuffle of the corpus); a
    * per-stratum variant swaps the limit for one row_number window. */
  val x05WeightedSample = QueryDef(
    "x05_weighted_sample",
    (s, d) => {
      val k = 100
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") + 0.5) / 4294967296.0
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").as("weight"),
          (log(u) / col("n_chars")).as("skey"))
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id"), col("weight"), r6(col("skey")).as("skey"))
        .orderBy("doc_id")
    },
    Some("""WITH keyed AS (
           |  SELECT doc_id, n_chars AS weight,
           |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           |        + 0.5) / 4294967296.0) / n_chars AS skey
           |  FROM documents),
           |topk AS (SELECT * FROM keyed ORDER BY skey DESC, doc_id LIMIT 100)
           |SELECT doc_id, weight, round(skey, 6) AS skey
           |FROM topk ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x06
  /** Sequence packing (token-offset sharding): lay the corpus out as a
    * contiguous token tape — per shard, in deterministic md5 order — and
    * assign each document to the fixed-size context window its first
    * token lands in. This is the planning step for training-sequence
    * packing: the per-bin doc/token counts and fill ratios are exactly
    * the packer's work manifest, and the md5 order is reproducible
    * across engines, retries, and repartitionings.
    *
    * Scale shape: a DISTRIBUTED PREFIX SUM. `source` has a handful of
    * values, so a window partitioned on it alone would make one task
    * sort and prefix-sum each source's entire corpus at 100 TB. Instead
    * the md5 ordering key is split on its first two hex chars into 256
    * range buckets (the bucket is a prefix of the ordering key, so
    * (bkt, h, doc_id) order == (h, doc_id) order): per-(source, bucket)
    * token subtotals are a tiny aggregate (card(source)×256 rows), the
    * carry — each bucket's base offset — is a window over that tiny
    * table, broadcast back, and the corpus-sized running sum is
    * partitioned by (source, bucket): parallelism card(source)×256
    * regardless of corpus size, output bit-identical to the single
    * running sum. */
  val x06PackSequences = QueryDef(
    "x06_pack_sequences",
    (s, d) => {
      val ctx = 2048.0
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(T.tokens(col("text"))).as("tok"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("bkt", substring(col("h"), 1, 2))
      // carry: tokens in all earlier buckets of the same source
      val wCarry = Window.partitionBy("source").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = docs.groupBy("source", "bkt")
        .agg(sum("tok").as("btok"))
        .withColumn("base", coalesce(sum("btok").over(wCarry), lit(0L)))
        .select("source", "bkt", "base")
      val wLocal = Window.partitionBy("source", "bkt")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.join(broadcast(offsets), Seq("source", "bkt"))
        .withColumn("cum", col("base") + sum("tok").over(wLocal))
        .select(col("source"),
          floor((col("cum") - col("tok")) / lit(ctx)).cast("long").as("bin"),
          col("tok"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("tokens"),
          r4(sum("tok") / lit(ctx)).as("fill_ratio"),
          sum(when(col("tok") > 2048, 1).otherwise(0)).as("n_overflow"))
        .orderBy("source", "bin")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source,
           |         len(string_split(text, ' ')) AS tok FROM documents),
           |c AS (
           |  SELECT source, tok, sum(tok) OVER (PARTITION BY source
           |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |    ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM d)
           |SELECT source, CAST(floor((cum - tok) / 2048.0) AS BIGINT) AS bin,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(tok) AS BIGINT) AS tokens,
           |  round(sum(tok) / 2048.0 * 10000) / 10000 AS fill_ratio,
           |  CAST(sum(CASE WHEN tok > 2048 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_overflow
           |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- x07
  /** Near-dup cluster representative selection — the resolution step
    * that turns d03's MinHash clusters into a deduplicated corpus: per
    * cluster keep the longest document (tie → lowest doc_id), and report
    * the cluster's member count and total chars so the kept/dropped
    * token budget is auditable. This is what "dedup the training set"
    * actually ships.
    *
    * Scale shape: the clustering is d03's iterated label propagation
    * (scale posture documented there); selection adds one window
    * partitioned by cluster_id — HIGH cardinality (≈ one per surviving
    * doc) — and a same-key hash-agg, so the resolution step itself is a
    * single exchange at any corpus size. The oracle replays d03's
    * recursive-CTE components and the same argmax. */
  val x07ClusterReps = QueryDef(
    "x07_cluster_reps",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val members = Dedup.minhashClustersCached(s, d)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      members.withColumn("rn", row_number().over(w))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rn") === 1, col("doc_id"))).as("rep_doc_id"),
          max(when(col("rn") === 1, col("n_chars"))).as("rep_n_chars"),
          sum("n_chars").as("total_chars"))
        .orderBy("cluster_id")
    },
    Some(Dedup.minhashCteSql + """
         |, jm AS (
         |  SELECT l.cluster_id, l.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY d.n_chars DESC, l.doc_id) AS rn
         |  FROM lbl l JOIN documents d USING (doc_id))
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
         |  max(CASE WHEN rn = 1 THEN n_chars END) AS rep_n_chars,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM jm GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- x08
  /** Temperature-smoothed domain mixing: per-source sampling weights
    * w_s ∝ p_s^τ with τ = 0.5 over TOKEN shares — the multilingual /
    * multi-domain sampling-alpha recipe (upweight small domains without
    * flattening to uniform, which is x03's degenerate target). `boost`
    * = w/p is the per-source up/down-sampling factor a mixer applies.
    * τ = 0.5 means the smoothing is `sqrt`, which IEEE-rounds
    * identically everywhere — no cross-engine pow() drift.
    *
    * Scale shape: one map-side-combined per-source aggregate over the
    * corpus; everything after runs on the card(source)-row table. */
  val x08TemperatureMix = QueryDef(
    "x08_temperature_mix",
    (s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"), size(T.tokens(col("text"))).cast("long").as("tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      val tot = per.agg(sum("n_tokens").cast("double").as("total"))
      per.crossJoin(broadcast(tot))
        .withColumn("p", col("n_tokens") / col("total"))
        .withColumn("sq", sqrt(col("p")))
        .withColumn("denom",
          sum("sq").over(Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          r6(col("p")).as("token_share"),
          r6(col("sq") / col("denom")).as("temp_weight"),
          r6((col("sq") / col("denom")) / col("p")).as("boost"))
        .orderBy("source")
    },
    Some("""WITH per AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY 1),
           |t AS (SELECT *, CAST(sum(n_tokens) OVER () AS DOUBLE) AS total
           |      FROM per),
           |u AS (SELECT *, n_tokens / total AS p,
           |             sqrt(n_tokens / total) AS sq FROM t),
           |v AS (SELECT *, sum(sq) OVER () AS denom FROM u)
           |SELECT source, n_docs, n_tokens,
           |  round(p * 1000000) / 1000000 AS token_share,
           |  round(sq / denom * 1000000) / 1000000 AS temp_weight,
           |  round((sq / denom) / p * 1000000) / 1000000 AS boost
           |FROM v ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- x09
  /** Leakage-free train/eval split: assign documents to train or eval
    * ATOMICALLY by near-dup cluster (d03's transitive MinHash clusters),
    * so no eval document has a near-duplicate sitting in train — the
    * contamination mode a doc-level random split cannot prevent, and the
    * reason eval splits must be drawn AFTER clustering, not before. The
    * split decision is a deterministic hash of the cluster id (md5 first
    * hex digit ∈ {0,1} → eval ≈ 2/16), so the assignment is reproducible
    * across runs, engines, and repartitionings — the q46 property, lifted
    * from rows to clusters.
    *
    * Scale shape: d03's label propagation (posture documented there);
    * the split itself is a pure projection on the cluster label — no
    * additional shuffle. CurationSpec gates cluster atomicity and the
    * eval fraction. */
  val x09LeakageSplit = QueryDef(
    "x09_leakage_split",
    (s, d) => {
      Dedup.minhashClustersCached(s, d)
        .withColumn("split",
          when(substring(md5(col("cluster_id").cast("string")), 1, 1)
            .isin("0", "1"), "eval").otherwise("train"))
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    },
    Some(Dedup.minhashCteSql + """
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
         |            IN ('0', '1') THEN 'eval' ELSE 'train' END AS split
         |FROM lbl ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x10
  /** The composed curation pipeline — what "prepare the corpus" actually
    * runs, as ONE query: near-dup resolution (d03 clusters → keep the
    * longest non-bench member, x07 semantics), then decontamination
    * (x01's any-shared-8-gram rule against the held-out bench split),
    * then the Gopher rule gate (t10's four hard filters) — emitting the
    * per-source work manifest: docs and tokens in, kept, and dropped by
    * reason (precedence: duplicate → contaminated → quality). This is
    * the integration test of the curation surface: every stage reuses
    * the exact semantics its standalone operator hash-matches under.
    *
    * Scale shape: the union of its parts, all documented at their
    * operators — label propagation moves (id, label) pairs, the
    * contamination join is a broadcast posting-list join, the rule gate
    * is a projection, and the final rollup is a card(source) hash-agg.
    * No stage is new; composition adds zero driver state. */
  val x10CurationPipeline = QueryDef(
    "x10_curation_pipeline",
    (s, d) => {
      val docsRaw = Tables.documents(s, d)
      val toksC = T.tokens(col("text"))
      val nW = size(toksC)
      val meanLen = T.meanTokenLen(col("text"))
      val numRatio = expr("size(filter(split(text, ' '), " +
        "x -> x RLIKE '^[0-9]+$'))").cast("double") / nW.cast("double")
      val dupRatio = lit(1.0) -
        size(array_distinct(toksC)).cast("double") / nW.cast("double")
      val qKeep = nW >= 50 && nW <= 100000 &&
        meanLen >= 3.0 && meanLen <= 10.0 && numRatio < 0.2 && dupRatio < 0.5
      val docs = docsRaw.select(col("doc_id"), col("source"),
        nW.cast("long").as("n_toks"), qKeep.as("q_keep"),
        (substring(md5(col("doc_id").cast("string")), 1, 1) === "0").as("is_bench"),
        toksC.as("toks"))
      val sh8 = docs.select(col("doc_id"), col("is_bench"),
        explode(T.shingles(col("toks"), 8)).as("g"))
      val bench = sh8.filter(col("is_bench")).select("g").distinct()
      val contam = sh8.filter(!col("is_bench"))
        .join(broadcast(bench), Seq("g"))
        .select("doc_id").distinct()
        .withColumn("contaminated", lit(true))
      // near-dup resolution: clusters over the FULL corpus (same label
      // space as d03/x07/x09), rep chosen among non-bench members only
      val wRep = Window.partitionBy("cluster_id")
        .orderBy(col("n_toks").desc, col("doc_id"))
      val reps = Dedup.minhashClustersCached(s, d)
        .join(docs.select("doc_id", "n_toks", "is_bench"), "doc_id")
        .filter(!col("is_bench"))
        .withColumn("rn", row_number().over(wRep))
        .select(col("doc_id"), (col("rn") === 1).as("is_rep"))
      val kept = col("is_rep") && !col("contaminated") && col("q_keep")
      docs.filter(!col("is_bench"))
        .join(reps, Seq("doc_id"))
        .join(contam, Seq("doc_id"), "left")
        .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(kept.cast("long")).as("n_kept"),
          sum((!col("is_rep")).cast("long")).as("n_drop_dup"),
          sum((col("is_rep") && col("contaminated")).cast("long"))
            .as("n_drop_contam"),
          sum((col("is_rep") && !col("contaminated") && !col("q_keep"))
            .cast("long")).as("n_drop_quality"),
          sum("n_toks").as("n_tokens"),
          sum(when(kept, col("n_toks")).otherwise(lit(0L))).as("n_tokens_kept"),
          r4(sum(when(kept, col("n_toks")).otherwise(lit(0L))) /
            sum("n_toks").cast("double")).as("token_keep_rate"))
        .orderBy("source")
    },
    Some(Dedup.minhashCteSql + """
         |, g AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t,
         |    len(string_split(text, ' ')) AS nw, length(text) AS lt,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_bench
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source, nw, is_bench,
         |    nw >= 50 AND nw <= 100000
         |    AND (lt - nw + 1) / CAST(nw AS DOUBLE) >= 3.0
         |    AND (lt - nw + 1) / CAST(nw AS DOUBLE) <= 10.0
         |    AND len(list_filter(t, x -> regexp_full_match(x, '[0-9]+')))
         |        / CAST(nw AS DOUBLE) < 0.2
         |    AND 1.0 - len(list_distinct(t)) / CAST(nw AS DOUBLE) < 0.5
         |      AS q_keep
         |  FROM g),
         |sh8 AS (
         |  SELECT doc_id, is_bench,
         |    unnest(list_distinct(list_transform(range(1, greatest(len(t)-7, 0)+1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]))) AS gg
         |  FROM g),
         |contam AS (
         |  SELECT DISTINCT s.doc_id
         |  FROM sh8 s JOIN (SELECT DISTINCT gg FROM sh8 WHERE is_bench) b
         |    USING (gg)
         |  WHERE NOT s.is_bench),
         |rep AS (
         |  SELECT l.doc_id,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY q.nw DESC, l.doc_id) = 1 AS is_rep
         |  FROM lbl l JOIN q USING (doc_id) WHERE NOT q.is_bench),
         |dec AS (
         |  SELECT q.doc_id, q.source, q.nw, r.is_rep,
         |    c.doc_id IS NOT NULL AS contaminated, q.q_keep,
         |    r.is_rep AND c.doc_id IS NULL AND q.q_keep AS kept
         |  FROM q JOIN rep r USING (doc_id)
         |  LEFT JOIN contam c USING (doc_id)
         |  WHERE NOT q.is_bench)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN NOT is_rep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_drop_dup,
         |  CAST(sum(CASE WHEN is_rep AND contaminated THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_drop_contam,
         |  CAST(sum(CASE WHEN is_rep AND NOT contaminated AND NOT q_keep
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_quality,
         |  CAST(sum(nw) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN kept THEN nw ELSE 0 END) AS BIGINT)
         |    AS n_tokens_kept,
         |  round(sum(CASE WHEN kept THEN nw ELSE 0 END)
         |    / CAST(sum(nw) AS DOUBLE), 4) AS token_keep_rate
         |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- x11
  /** Bloom-sketch decontamination — x01's scale path. x01 broadcasts the
    * benchmark's distinct-shingle SET to every probe task; at real scale
    * (10^9 bench shingles) that broadcast is tens of GB of strings. Here
    * the bench side folds into a Bloom sketch (bloom_filter_agg — the
    * expression Spark's own runtime-filter injection uses, a few bits
    * per key), and the probe tests membership per shingle. Bloom bits
    * are an OR over item hashes — order-independent, so the flags are
    * deterministic. False positives are possible BY DESIGN (never false
    * negatives): the flagged set always CONTAINS x01's exact set, which
    * a pipeline either accepts (over-drop is safe for decontamination)
    * or re-checks exactly on the tiny flagged remainder.
    *
    * No oracle — the sketch's bit layout is engine-specific; CurationSpec
    * gates flagged ⊇ x01-contaminated and bounds the false-positive
    * overshoot.
    *
    * Scale shape: one sketch aggregate over the bench shingles (scalar
    * result rides to every task), then a pure per-row probe + per-doc
    * hash-agg. Nothing corpus-sized ever crosses the cluster. */
  val x11BloomDecontaminate = QueryDef(
    "x11_bloom_decontaminate",
    (s, d) => {
      graft.GraftExtensions.register(s)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"),
          (substring(md5(col("doc_id").cast("string")), 1, 1) === "0").as("is_bench"))
      docs.select(col("doc_id"), col("is_bench"),
          explode(T.shingles(col("toks"), 8)).as("g"))
        .createOrReplaceTempView("x11_sh")
      // might_contain requires the sketch as a SCALAR SUBQUERY (the q49
      // shape) — it rides to every task as a broadcast scalar result
      s.sql("""SELECT doc_id,
              |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_maybe_shared,
              |  CAST(max(CASE WHEN hit THEN 1 ELSE 0 END) AS INT) AS flagged
              |FROM (SELECT doc_id,
              |        might_contain(
              |          (SELECT bloom_filter_agg(xxhash64(g))
              |           FROM x11_sh WHERE is_bench),
              |          xxhash64(g)) AS hit
              |      FROM x11_sh WHERE NOT is_bench)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },
    None)

  // ---------------------------------------------------------------- x12
  /** Compaction/layout planner — the writer-side half of the small-file
    * problem at corpus scale: given per-partition (source, lang) byte
    * totals, plan ceil(bytes/target) output files and assign every doc
    * to one. Assignment is HASH-based (md5(doc_id) mod n_files), not a
    * row_number window: no per-partition sort, no low-cardinality window
    * key, perfectly parallel — sizes even out in expectation exactly as
    * they do for Spark's own round-robin repartition; a writer that
    * needs exact byte balance swaps in the range-partitioned form on the
    * tiny flagged partitions only. Target is a demo constant (1 KiB);
    * production uses 128 MiB-1 GiB.
    *
    * Scale shape: one small agg (partition directory), broadcast back,
    * pure projection, one hash-agg — two exchanges, none corpus-wide. */
  val x12CompactionPlan = QueryDef(
    "x12_compaction_plan",
    (s, d) => {
      val Target = 1024L
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      val part = docs.groupBy("source", "lang")
        .agg(sum("n_chars").as("part_bytes"))
        .withColumn("n_files",
          greatest(lit(1L), expr(s"(part_bytes + ${Target - 1}) div $Target")))
      docs.join(broadcast(part.select("source", "lang", "n_files")),
          Seq("source", "lang"))
        .withColumn("file_id",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % col("n_files")).cast("int"))
        .groupBy("source", "lang", "file_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("file_bytes"))
        .orderBy("source", "lang", "file_id")
    },
    Some("""WITH docs AS (
           |  SELECT doc_id, source, lang, n_chars FROM documents),
           |part AS (
           |  SELECT source, lang,
           |    greatest(1, (CAST(sum(n_chars) AS BIGINT) + 1023) // 1024)
           |      AS n_files
           |  FROM docs GROUP BY 1, 2)
           |SELECT d.source, d.lang,
           |  CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
           |       % p.n_files AS INT) AS file_id,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(d.n_chars) AS BIGINT) AS file_bytes
           |FROM docs d JOIN part p USING (source, lang)
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  // ---------------------------------------------------------------- x13
  /** Epoch/repetition planner — the step after x08's temperature
    * weights: given a total token budget (one corpus-size epoch) and the
    * τ=0.5 mixture, how many EPOCHS of each source does the mixer
    * actually draw? target_s = T·w_s; epochs_s = target_s / tokens_s
    * (>1 = the source repeats, <1 = it is subsampled); repeats cap at 4
    * epochs — the data-constrained repetition ceiling — with the
    * shortfall reported per source so the mixer can see unfilled budget
    * instead of silently over-repeating small domains.
    *
    * Scale shape: identical to x08 — one map-side-combined per-source
    * aggregate, then card(source)-row arithmetic. sqrt smoothing
    * IEEE-rounds identically everywhere (the x08 precedent). */
  val x13EpochPlan = QueryDef(
    "x13_epoch_plan",
    (s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"), size(T.tokens(col("text"))).cast("long").as("tok"))
        .groupBy("source").agg(sum("tok").as("n_tokens"))
      val tot = per.agg(sum("n_tokens").cast("double").as("total"))
      val w = per.crossJoin(broadcast(tot))
        .withColumn("sq", sqrt(col("n_tokens") / col("total")))
        .withColumn("denom", sum("sq").over(Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("target_tokens", col("total") * col("sq") / col("denom"))
        .withColumn("epochs", col("target_tokens") / col("n_tokens"))
        .withColumn("eff_epochs", least(col("epochs"), lit(4.0)))
      w.select(col("source"), col("n_tokens"),
          r6(col("sq") / col("denom")).as("temp_weight"),
          r2(col("target_tokens")).as("target_tokens"),
          r4(col("epochs")).as("epochs"),
          r4(col("eff_epochs")).as("eff_epochs"),
          (col("epochs") > 4.0).cast("int").as("capped"),
          r2(greatest(col("target_tokens") - col("eff_epochs") * col("n_tokens"),
            lit(0.0))).as("shortfall_tokens"))
        .orderBy("source")
    },
    Some("""WITH per AS (
           |  SELECT source,
           |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY 1),
           |t AS (SELECT *, CAST(sum(n_tokens) OVER () AS DOUBLE) AS total
           |      FROM per),
           |u AS (SELECT *, sqrt(n_tokens / total) AS sq FROM t),
           |v AS (SELECT *, sum(sq) OVER () AS denom FROM u),
           |x AS (SELECT *, total * sq / denom AS target_tokens,
           |             (total * sq / denom) / n_tokens AS epochs FROM v)
           |SELECT source, n_tokens,
           |  round(sq / denom * 1000000) / 1000000 AS temp_weight,
           |  round(target_tokens * 100) / 100 AS target_tokens,
           |  round(epochs * 10000) / 10000 AS epochs,
           |  round(least(epochs, 4.0) * 10000) / 10000 AS eff_epochs,
           |  CAST(epochs > 4.0 AS INT) AS capped,
           |  round(greatest(target_tokens - least(epochs, 4.0) * n_tokens, 0.0)
           |    * 100) / 100 AS shortfall_tokens
           |FROM x ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- x14
  /** k-anonymity audit over quasi-identifiers — the privacy-governance
    * gate a corpus release runs beside t06's PII scrub: group documents
    * by their quasi-identifier tuple (lang, source, length bucket) and
    * flag equivalence classes smaller than k=5, whose members a linkage
    * attack could re-identify. Reports per-class size, the flag, and the
    * class's share of the corpus — the table a release review reads to
    * decide suppression/generalization.
    *
    * Scale shape: one map-side-combined hash-agg on a bounded-cardinality
    * tuple plus a scalar corpus count folded in as a broadcast scalar
    * subquery — no window, no join on data-sized keys. */
  val x14KAnonymity = QueryDef(
    "x14_k_anonymity",
    (s, d) => {
      val K = 5
      val docs = Tables.documents(s, d)
      val total = docs.select(count(lit(1)).as("total"))
      docs
        .select(col("lang"), col("source"),
          (col("n_chars") / 100).cast("int").as("len_bucket"))
        .groupBy("lang", "source", "len_bucket")
        .agg(count(lit(1)).as("class_size"))
        .crossJoin(broadcast(total))
        .select(col("lang"), col("source"), col("len_bucket"),
          col("class_size"),
          (col("class_size") < K).cast("int").as("at_risk"),
          r6(col("class_size") / col("total").cast("double")).as("share"))
        .orderBy("lang", "source", "len_bucket")
    },
    Some("""WITH cls AS (
           |  SELECT lang, source, CAST(n_chars // 100 AS INT) AS len_bucket,
           |    CAST(count(*) AS BIGINT) AS class_size
           |  FROM documents GROUP BY 1, 2, 3)
           |SELECT lang, source, len_bucket, class_size,
           |  CAST(class_size < 5 AS INT) AS at_risk,
           |  round(class_size / CAST((SELECT count(*) FROM documents) AS DOUBLE),
           |    6) AS share
           |FROM cls ORDER BY lang, source, len_bucket""".stripMargin))

  // ---------------------------------------------------------------- x15
  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every document by how much more
    * likely its hashed bag-of-words is under a TARGET domain's unigram
    * distribution than under the rest of the corpus — the principled
    * "select crawl data that looks like the high-quality domain" signal,
    * one step up from t17's fixed linear weights. Target here is the
    * `src0` source slice (a real deployment points this at its curated
    * domain); features are md5-prefix-hashed tokens into 4096 buckets
    * (t17's convention) with add-1 smoothing.
    *
    * Determinism: each bucket's log-likelihood-ratio is rounded to
    * integer MICRO-units once (4096 values), so the per-doc score is an
    * exact BIGINT sum — partial-agg order cannot perturb it (the
    * t17/q73 fixed-point trick). Scale shape: two bounded bucket aggs
    * (≤4096 rows each) broadcast back; corpus-side work is explode +
    * one map-side-combined hash-agg per doc. x05's weighted sampler
    * consumes these weights downstream. */
  val x15DsirWeights = QueryDef(
    "x15_dsir_weights",
    (s, d) => {
      val B = 4096
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(T.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), col("source"),
          (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % B)
            .as("b"))
      val tc = toks.filter(col("source") === "src0")
        .groupBy("b").agg(count(lit(1)).as("tc"))
      val rc = toks.filter(col("source") =!= "src0")
        .groupBy("b").agg(count(lit(1)).as("rc"))
      // every bucket that occurs anywhere appears in tc ∪ rc; add-1
      // smoothing covers the side where it is absent
      val counts = tc.join(rc, Seq("b"), "full_outer")
        .select(col("b"), coalesce(col("tc"), lit(0L)).as("tc"),
          coalesce(col("rc"), lit(0L)).as("rc"))
      val tots = counts.agg(sum("tc").cast("double").as("ttot"),
        sum("rc").cast("double").as("rtot"))
      val lr = counts.crossJoin(broadcast(tots))
        .select(col("b"),
          round((log((col("tc") + 1L) / (col("ttot") + B)) -
            log((col("rc") + 1L) / (col("rtot") + B))) * 1e6)
            .cast("long").as("lr_micro"))
      toks.groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
        .join(broadcast(lr), Seq("b"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_tokens"),
          sum(col("tf") * col("lr_micro")).as("weight_micro"))
        .select(col("doc_id"), col("n_tokens"), col("weight_micro"),
          r6(col("weight_micro") / (col("n_tokens") * 1e6))
            .as("weight"),
          (col("weight_micro") > 0L).cast("int").as("target_like"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, source,
           |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096 AS b
           |  FROM (SELECT doc_id, source,
           |          unnest(string_split(text, ' ')) AS tok
           |        FROM documents)),
           |tc AS (SELECT b, count(*) AS tc FROM toks
           |  WHERE source = 'src0' GROUP BY 1),
           |rc AS (SELECT b, count(*) AS rc FROM toks
           |  WHERE source <> 'src0' GROUP BY 1),
           |counts AS (SELECT coalesce(tc.b, rc.b) AS b,
           |    coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc
           |  FROM tc FULL OUTER JOIN rc ON tc.b = rc.b),
           |tots AS (SELECT CAST(sum(tc) AS DOUBLE) AS ttot,
           |    CAST(sum(rc) AS DOUBLE) AS rtot FROM counts),
           |lr AS (SELECT b,
           |    CAST(round((ln((tc + 1) / (ttot + 4096)) -
           |      ln((rc + 1) / (rtot + 4096))) * 1e6) AS BIGINT) AS lr_micro
           |  FROM counts CROSS JOIN tots),
           |tf AS (SELECT doc_id, b, count(*) AS tf FROM toks GROUP BY 1, 2)
           |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           |  CAST(sum(tf * lr_micro) AS BIGINT) AS weight_micro,
           |  round(sum(tf * lr_micro) / (sum(tf) * 1e6), 6) AS weight,
           |  CAST(sum(tf * lr_micro) > 0 AS INT) AS target_like
           |FROM tf JOIN lr USING (b)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x16
  /** Training-shard plan + shuffle-quality audit: assign every document
    * to one of 32 shards by deterministic md5 hash (the "global shuffle"
    * that decorrelates adjacent training examples — hash placement IS
    * the shuffle, reproducible across runs and engines), then emit the
    * per-shard manifest a dataloader consumes: doc/char totals, balance
    * against the mean shard size, source diversity, and the largest
    * single-source share (a shard dominated by one source defeats the
    * shuffle's decorrelation purpose).
    *
    * Scale shape: one hash-agg to (shard, source) — bounded at
    * 32 × card(source) rows — then a shards-sized rollup; no window ever
    * touches doc-sized data and the plan has no sort before the final
    * 32-row orderBy. */
  val x16ShardPlan = QueryDef(
    "x16_shard_plan",
    (s, d) => {
      val S = 32
      val perSrc = Tables.documents(s, d)
        .select(
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % S).cast("int").as("shard"),
          col("source"), col("n_chars"))
        .groupBy("shard", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      val shards = perSrc.groupBy("shard")
        .agg(sum("n_docs").as("n_docs"), sum("n_chars").as("n_chars"),
          count(lit(1)).as("n_sources"),
          (max("n_docs").cast("double")).as("top_src_docs"))
      val meanChars = shards.agg(avg(col("n_chars").cast("double")).as("mean_chars"))
      shards.crossJoin(broadcast(meanChars))
        .select(col("shard"), col("n_docs"), col("n_chars"), col("n_sources"),
          r4(col("n_chars") / col("mean_chars")).as("balance"),
          r4(col("top_src_docs") / col("n_docs")).as("top_source_share"))
        .orderBy("shard")
    },
    Some("""WITH assigned AS (
           |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           |      % 32 AS shard, source, n_chars
           |  FROM documents),
           |per_src AS (SELECT shard, source, count(*) AS n_docs,
           |    sum(n_chars) AS n_chars
           |  FROM assigned GROUP BY 1, 2),
           |shards AS (SELECT CAST(shard AS INT) AS shard,
           |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |    CAST(count(*) AS BIGINT) AS n_sources,
           |    CAST(max(n_docs) AS DOUBLE) AS top_src_docs
           |  FROM per_src GROUP BY 1),
           |m AS (SELECT avg(CAST(n_chars AS DOUBLE)) AS mean_chars FROM shards)
           |SELECT shard, n_docs, n_chars, n_sources,
           |  round(n_chars / mean_chars, 4) AS balance,
           |  round(top_src_docs / n_docs, 4) AS top_source_share
           |FROM shards CROSS JOIN m ORDER BY shard""".stripMargin))

  // ---------------------------------------------------------------- x17
  /** Cross-modal dedup agreement: the text near-dup pairs (d05's exact
    * n-gram Jaccard) set against the embedding near-dup pairs (d07's
    * exact cosine tail) over the SAME documents, classified into both /
    * text_only / embedding_only with each class's mean scores — the
    * audit a pipeline runs before trusting ONE modality's dedup to
    * subsume the other (surface-text dedup misses paraphrases;
    * embedding dedup misses short verbatim overlaps; the class sizes
    * quantify both gaps on this corpus).
    *
    * Scale shape: both inputs are candidate-bounded pair sets (posting
    * lists / LSH buckets at scale — d05 and d06/d08's documented
    * paths); the full-outer join and 3-row rollup are pair-bounded,
    * never corpus². */
  val x17ModalityAgreement = QueryDef(
    "x17_modality_agreement",
    (s, d) => {
      val t = Dedup.d05NgramJaccard.run(s, d)
        .select(col("a_id"), col("b_id"), col("jaccard"))
      val e = Dedup.d07EmbeddingPairs.run(s, d)
        .select(col("a_id"), col("b_id"), col("cos"))
      t.join(e, Seq("a_id", "b_id"), "full_outer")
        .withColumn("agreement",
          when(col("jaccard").isNotNull && col("cos").isNotNull, lit("both"))
            .when(col("jaccard").isNotNull, lit("text_only"))
            .otherwise(lit("embedding_only")))
        .groupBy("agreement")
        .agg(count(lit(1)).as("n_pairs"),
          r4(avg("jaccard")).as("mean_jaccard"),
          r4(avg("cos")).as("mean_cos"))
        .orderBy("agreement")
    },
    for {
      d05Sql <- Dedup.d05NgramJaccard.oracle
      d07Sql <- Dedup.d07EmbeddingPairs.oracle
    } yield s"""WITH tp AS (${d05Sql.replace("ORDER BY a_id, b_id", "")}),
       |ep AS (${d07Sql.replace("ORDER BY a_id, b_id", "")}),
       |j AS (
       |  SELECT coalesce(tp.a_id, ep.a_id) AS a_id,
       |    coalesce(tp.b_id, ep.b_id) AS b_id, jaccard, cos,
       |    CASE WHEN jaccard IS NOT NULL AND cos IS NOT NULL THEN 'both'
       |         WHEN jaccard IS NOT NULL THEN 'text_only'
       |         ELSE 'embedding_only' END AS agreement
       |  FROM tp FULL OUTER JOIN ep
       |    ON tp.a_id = ep.a_id AND tp.b_id = ep.b_id)
       |SELECT agreement, CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(avg(jaccard), 4) AS mean_jaccard,
       |  round(avg(cos), 4) AS mean_cos
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)

  // ---------------------------------------------------------------- x18
  /** Curriculum ordering plan: x16's 32 training shards scored by mean
    * t23 readability and assigned a serve phase (easy → medium → hard by
    * FIXED mean-Flesch bands — the q102 fixed-band posture, no global
    * window), yielding the shard serve order a curriculum-learning
    * dataloader follows. Per-doc Flesch is deterministic double math
    * from integer regex counts, rounded ONCE to integer micro-units so
    * the per-shard mean is an exact BIGINT sum — order-proof, bit-exact
    * cross-engine (the x15/t17 fixed-point trick).
    *
    * Scale shape: one projection + one 32-ary hash-agg; everything after
    * is shard-cardinality arithmetic. */
  val x18CurriculumPlan = QueryDef(
    "x18_curriculum_plan",
    (s, d) => {
      val S = 32
      val words = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
      val sents = greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
      val vg = size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0)))
      val flesch = lit(206.835) - lit(1.015) * words / sents -
        lit(84.6) * vg / words
      val perShard = Tables.documents(s, d)
        .filter(words > 0)
        .select(
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % S).cast("int").as("shard"),
          col("n_chars"),
          round(flesch * 1000000).cast("long").as("fl_micro"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
          sum("fl_micro").as("sfl"))
        .withColumn("mean_flesch",
          r4(col("sfl") / 1000000.0 / col("n_docs")))
      perShard
        .withColumn("phase",
          when(col("mean_flesch") >= 33.0, "1_easy")
            .when(col("mean_flesch") >= 28.0, "2_medium")
            .otherwise("3_hard"))
        .select("shard", "n_docs", "n_chars", "mean_flesch", "phase")
        .orderBy("phase", "shard")
    },
    Some("""WITH f AS (
           |  SELECT
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           |      % 32 AS shard,
           |    n_chars,
           |    CAST(round((206.835e0
           |      - 1.015e0 * len(regexp_extract_all(text, '\S+'))
           |        / greatest(1, len(regexp_extract_all(text, '[.!?]+')))
           |      - 84.6e0 * len(regexp_extract_all(lower(text), '[aeiouy]+'))
           |        / len(regexp_extract_all(text, '\S+'))) * 1000000)
           |      AS BIGINT) AS fl_micro
           |  FROM documents
           |  WHERE len(regexp_extract_all(text, '\S+')) > 0),
           |ps AS (
           |  SELECT CAST(shard AS INT) AS shard,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |    round(sum(fl_micro) / 1000000.0 / count(*) * 10000) / 10000
           |      AS mean_flesch
           |  FROM f GROUP BY 1)
           |SELECT shard, n_docs, n_chars, mean_flesch,
           |  CASE WHEN mean_flesch >= 33.0 THEN '1_easy'
           |       WHEN mean_flesch >= 28.0 THEN '2_medium'
           |       ELSE '3_hard' END AS phase
           |FROM ps ORDER BY phase, shard""".stripMargin))

  // ---------------------------------------------------------------- x19
  /** Token-budget waterfilling: allocate a training budget (40% of the
    * corpus's tokens) across sources so every source gets
    * min(supply, L) tokens for one shared water level L — small sources
    * are taken whole, big sources are capped at L, and Σ alloc = budget.
    * The fairness allocator behind "no domain may dominate the mix"
    * policies, solved in closed form: sort supplies ascending; for each
    * split point the candidate level is (budget − funded prefix) /
    * (#sources above), and exactly one candidate is consistent.
    *
    * Scale shape: ONE hash-agg to the per-source supply table (source
    * cardinality — a catalog stat, never data-sized), windows over that
    * bounded table, and a broadcast scalar for the level. The budget is
    * exact integer arithmetic (×2 div 5); only the level itself is a
    * double, computed from exact BIGINTs in one expression. */
  val x19TokenBudget = QueryDef(
    "x19_token_budget",
    (s, d) => {
      val perSrc = Tables.documents(s, d)
        .groupBy("source").agg(expr("sum(n_chars) div 4").as("supply"))
      val w = Window.orderBy(col("supply").asc, col("source").asc)
      val g = Window.partitionBy()
      val ranked = perSrc
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("prefix", sum("supply").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_supply", lag("supply", 1).over(w))
        .withColumn("n", count(lit(1)).over(g).cast("long"))
        .withColumn("b", expr("sum(supply) over () * 2 div 5"))
        .withColumn("lvl",
          (col("b") - (col("prefix") - col("supply"))).cast("double")
            / (col("n") - col("i") + 1L))
      val level = ranked.agg(
        min(when((col("i") === 1L || col("prev_supply") <= col("lvl"))
          && col("lvl") < col("supply"), col("lvl"))).as("level"))
      ranked.crossJoin(broadcast(level))
        .withColumn("alloc_tokens",
          when(col("level").isNull, col("supply"))
            .otherwise(least(col("supply"),
              floor(col("level")).cast("long"))))
        .select(col("source"), col("supply").as("supply_tokens"),
          col("alloc_tokens"),
          (col("alloc_tokens") === col("supply")).as("funded"),
          r6(col("alloc_tokens").cast("double") / col("supply"))
            .as("fill_ratio"))
        .orderBy("source")
    },
    Some("""WITH per_src AS (
           |  SELECT source, CAST(sum(n_chars) // 4 AS BIGINT) AS supply
           |  FROM documents GROUP BY 1),
           |rk AS (
           |  SELECT source, supply,
           |    CAST(row_number() OVER w AS BIGINT) AS i,
           |    CAST(sum(supply) OVER (ORDER BY supply, source
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
           |    lag(supply) OVER w AS prev_supply,
           |    CAST(count(*) OVER () AS BIGINT) AS n,
           |    CAST(sum(supply) OVER () * 2 // 5 AS BIGINT) AS b
           |  FROM per_src WINDOW w AS (ORDER BY supply, source)),
           |cand AS (
           |  SELECT *, CAST(b - (prefix - supply) AS DOUBLE)
           |    / (n - i + 1) AS lvl
           |  FROM rk),
           |lev AS (
           |  SELECT min(CASE WHEN (i = 1 OR prev_supply <= lvl)
           |    AND lvl < supply THEN lvl END) AS level FROM cand),
           |alloc AS (
           |  SELECT source, supply,
           |    CASE WHEN level IS NULL THEN supply
           |         ELSE least(supply, CAST(floor(level) AS BIGINT)) END
           |      AS alloc_tokens
           |  FROM cand CROSS JOIN lev)
           |SELECT source, supply AS supply_tokens, alloc_tokens,
           |  alloc_tokens = supply AS funded,
           |  round(CAST(alloc_tokens AS DOUBLE) / supply * 1000000)
           |    / 1000000 AS fill_ratio
           |FROM alloc ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- x20
  /** Dedup-aware sampling: draw a 40% budget so near-duplicate clusters
    * (d03's transitive MinHash components) contribute their members
    * round-robin — every cluster's rank-1 representative enters before
    * ANY cluster's rank-2 — with deterministic md5 priority inside each
    * rank tier. The sampler a curation pipeline wants after dedup
    * LABELING but before dedup DELETION: duplicates only enter once the
    * budget exceeds the distinct-content count.
    *
    * Scale shape: cluster labels are the d03 ingest artifact (parquet,
    * not a held persist); per-cluster rank is a window on the
    * high-cardinality cluster key. The global admission cut is exact
    * here (the oracle twin); at corpus scale the (rank, priority)
    * cutoff comes from a quantile sketch — x23 is that registered
    * scale twin, the q54↔q59 split. */
  val x20DedupAwareSample = QueryDef(
    "x20_dedup_aware_sample",
    (s, d) => {
      val lbl = Dedup.minhashClustersCached(s, d)
      val wc = Window.partitionBy("cluster_id")
        .orderBy(col("pri"), col("doc_id"))
      val wg = Window.orderBy(col("r"), col("pri"), col("doc_id"))
      lbl
        .withColumn("pri",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"))
        .withColumn("r", row_number().over(wc))
        .withColumn("total", count(lit(1)).over(Window.partitionBy()))
        .withColumn("g", row_number().over(wg))
        .select(col("doc_id"), col("cluster_id"),
          col("r").cast("int").as("cluster_rank"),
          (col("g") <= expr("total * 2 div 5")).as("sampled"))
        .orderBy("doc_id")
    },
    Some(Dedup.minhashCteSql +
      """
        |, pr AS (
        |  SELECT doc_id, cluster_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS pri
        |  FROM lbl),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY pri, doc_id) AS r,
        |    CAST(count(*) OVER () AS BIGINT) AS total
        |  FROM pr),
        |g AS (
        |  SELECT *, row_number() OVER (ORDER BY r, pri, doc_id) AS g
        |  FROM rk)
        |SELECT doc_id, cluster_id, CAST(r AS INT) AS cluster_rank,
        |  g <= total * 2 // 5 AS sampled
        |FROM g ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- x21
  /** Post-dedup mix rebalance: deduplication is not distribution-
    * neutral — a source whose docs are mostly near-duplicates loses
    * far more mass than a diverse one when clusters collapse to their
    * representatives. Per source: doc/char volumes before and after
    * keeping one (min-doc_id) representative per d03 cluster, both
    * char shares, the dedup loss, and the rebalance weight
    * (share_pre / share_post) that restores the pre-dedup mix when
    * applied to the surviving docs.
    *
    * Scale shape: labels are the d03 parquet ingest artifact; reps are
    * one min-agg on the cluster key; everything else is two hash-aggs
    * onto the source grid with the totals broadcast. Char sums are
    * exact BIGINTs; shares divide them once at the end. */
  val x21PostDedupRebalance = QueryDef(
    "x21_post_dedup_rebalance",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val reps = Dedup.minhashClustersCached(s, d)
        .groupBy("cluster_id").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val pre = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs_pre"),
          sum("n_chars").as("chars_pre"))
      val post = docs.join(reps, "doc_id").groupBy("source")
        .agg(count(lit(1)).as("n_docs_post"),
          sum("n_chars").as("chars_post"))
      val joined = pre.join(post, Seq("source"), "left")
        .na.fill(0L, Seq("n_docs_post", "chars_post"))
      val totals = joined.agg(sum("chars_pre").as("tot_pre"),
        sum("chars_post").as("tot_post"))
      joined.crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs_pre"), col("n_docs_post"),
          col("chars_pre"), col("chars_post"),
          r6(col("chars_pre").cast("double") / col("tot_pre"))
            .as("share_pre"),
          r6(col("chars_post").cast("double") / col("tot_post"))
            .as("share_post"),
          r6(lit(1.0) - col("n_docs_post").cast("double")
            / col("n_docs_pre")).as("dedup_loss"),
          when(col("chars_post") > 0L,
            r4((col("chars_pre").cast("double") / col("tot_pre"))
              / (col("chars_post").cast("double") / col("tot_post"))))
            .as("rebalance_weight"))
        .orderBy("source")
    },
    Some(Dedup.minhashCteSql +
      """
        |, reps AS (
        |  SELECT min(doc_id) AS doc_id FROM lbl GROUP BY cluster_id),
        |pre AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_pre,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_pre
        |  FROM documents GROUP BY 1),
        |post AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_post,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_post
        |  FROM documents JOIN reps USING (doc_id) GROUP BY 1),
        |j AS (
        |  SELECT source, n_docs_pre,
        |    coalesce(n_docs_post, 0) AS n_docs_post, chars_pre,
        |    coalesce(chars_post, 0) AS chars_post
        |  FROM pre LEFT JOIN post USING (source)),
        |tot AS (
        |  SELECT CAST(sum(chars_pre) AS BIGINT) AS tot_pre,
        |    CAST(sum(chars_post) AS BIGINT) AS tot_post FROM j)
        |SELECT source, n_docs_pre, n_docs_post, chars_pre, chars_post,
        |  round(CAST(chars_pre AS DOUBLE) / tot_pre * 1000000) / 1000000
        |    AS share_pre,
        |  round(CAST(chars_post AS DOUBLE) / tot_post * 1000000)
        |    / 1000000 AS share_post,
        |  round((1.0 - CAST(n_docs_post AS DOUBLE) / n_docs_pre)
        |    * 1000000) / 1000000 AS dedup_loss,
        |  CASE WHEN chars_post > 0 THEN
        |    round((CAST(chars_pre AS DOUBLE) / tot_pre)
        |      / (CAST(chars_post AS DOUBLE) / tot_post) * 10000) / 10000
        |    END AS rebalance_weight
        |FROM j CROSS JOIN tot ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- x22
  /** Context-length planning sweep: the table a training run reads
    * before fixing its sequence length. For each candidate context
    * C ∈ {512, 2048, 8192}: documents exceeding C (must truncate),
    * tokens lost to truncation, the sequence count under
    * boundary-packed streaming (⌈Σ min(t, C) / C⌉ — x06's continuous
    * fill), and mean docs per sequence. Long contexts waste nothing to
    * truncation but dilute short docs; the sweep shows both curves
    * from ONE scan.
    *
    * Scale shape: one projection to per-doc token counts, a constant
    * 3-way explode, ONE hash-agg onto the 3-row C grid — all-integer
    * (ceil as (a + C − 1) div C). */
  val x22ContextSweep = QueryDef(
    "x22_context_sweep",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(expr("n_chars div 4").as("toks"))
      docs
        .select(col("toks"),
          explode(array(lit(512), lit(2048), lit(8192))).as("context"))
        .withColumn("kept", least(col("toks"), col("context").cast("long")))
        .groupBy("context")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("toks") > col("context").cast("long"), 1L)
            .otherwise(0L)).as("n_truncated"),
          sum(col("toks") - col("kept")).as("tokens_lost"),
          sum("kept").as("tokens_kept"))
        .withColumn("n_seqs",
          expr("(tokens_kept + context - 1) div context"))
        .select(col("context"), col("n_docs"), col("n_truncated"),
          col("tokens_lost"), col("tokens_kept"), col("n_seqs"),
          r4(col("n_docs").cast("double") / col("n_seqs"))
            .as("docs_per_seq"),
          r6(col("tokens_lost").cast("double")
            / (col("tokens_kept") + col("tokens_lost")))
            .as("truncation_loss"))
        .orderBy("context")
    },
    Some("""WITH docs AS (
           |  SELECT n_chars // 4 AS toks FROM documents),
           |sweep AS (
           |  SELECT toks, unnest([512, 2048, 8192]) AS context
           |  FROM docs),
           |agg AS (
           |  SELECT context, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(CASE WHEN toks > context THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_truncated,
           |    CAST(sum(toks - least(toks, context)) AS BIGINT)
           |      AS tokens_lost,
           |    CAST(sum(least(toks, context)) AS BIGINT) AS tokens_kept
           |  FROM sweep GROUP BY 1)
           |SELECT context, n_docs, n_truncated, tokens_lost, tokens_kept,
           |  (tokens_kept + context - 1) // context AS n_seqs,
           |  round(CAST(n_docs AS DOUBLE)
           |    / ((tokens_kept + context - 1) // context) * 10000) / 10000
           |    AS docs_per_seq,
           |  round(CAST(tokens_lost AS DOUBLE)
           |    / (tokens_kept + tokens_lost) * 1000000) / 1000000
           |    AS truncation_loss
           |FROM agg ORDER BY context""".stripMargin))

  // ---------------------------------------------------------------- x23
  /** x20's SCALE twin: the same dedup-aware round-robin admission, but
    * the global cut comes from a quantile sketch instead of a corpus-
    * wide `row_number` — the q54↔q59 split applied to sampling. Each
    * doc gets one composite admission key `(cluster_rank << 32) | pri`
    * (rank dominates, md5 priority breaks ties inside a tier — the
    * exact twin's (r, pri, doc_id) order minus the final doc_id
    * tiebreak, which only matters on 2^-32-probability pri collisions);
    * `approx_percentile(key, 0.4)` yields the admission threshold in
    * ONE map-side-combined aggregate, and membership is a broadcast
    * threshold filter. No single-partition window anywhere — the only
    * window is the per-cluster rank on the high-cardinality cluster
    * key, so the shape holds at 100 TB. Sketch cutoff is engine-
    * specific ⇒ rows-only; CurationSpec gates the sampled set against
    * exact x20 (symmetric difference + budget tolerance) and PlanSpec
    * pins the no-global-window shape. */
  val x23DedupSampleSketch = QueryDef(
    "x23_dedup_sample_sketch",
    (s, d) => {
      val lbl = Dedup.minhashClustersCached(s, d)
      val wc = Window.partitionBy("cluster_id")
        .orderBy(col("pri"), col("doc_id"))
      val keyed = lbl
        .withColumn("pri",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"))
        .withColumn("r", row_number().over(wc))
        .withColumn("key", expr("shiftleft(cast(r as bigint), 32) + pri"))
      val cut = keyed.agg(
        expr("approx_percentile(key, 0.4, 10000)").as("cut"))
      keyed.crossJoin(broadcast(cut))
        .select(col("doc_id"), col("cluster_id"),
          col("r").cast("int").as("cluster_rank"),
          (col("key") <= col("cut")).as("sampled"))
        .orderBy("doc_id")
    },
    None)

  // ---------------------------------------------------------------- x24
  /** Largest-remainder budget allocation — proration that SUMS EXACTLY
    * to the budget, the property naive per-stratum rounding loses (5
    * strata × round(share·B) can land B±2, which breaks any downstream
    * contract that "exactly B sequences ship"). Hamilton's method on
    * exact integers: base_i = ⌊B·n_i/N⌋ via integer div, then the
    * shortfall B − Σbase (< #strata by construction) goes to the
    * largest remainders B·n_i mod N with a (remainder DESC, source)
    * total order — deterministic ties, Σalloc ≡ B as an arithmetic
    * identity, not a hope. The same primitive allocates sampling
    * quotas (x02), shard counts (x16), and epoch budgets (x13);
    * here it fixes a 10,000-doc curation budget across sources.
    *
    * Scale shape: ONE map-side hash-agg onto the source grid; every
    * window runs over that catalog-sized grid. 100 TB changes only the
    * counting scan. */
  /** Hamilton's method over an arbitrary strata table — factored out
    * so AllocationPropertySpec can drive it with random strata and
    * assert Σalloc ≡ B and the floor/ceil quota property hold for ANY
    * input, not just the documents fixture. `strata` columns: source,
    * n_docs. */
  def largestRemainder(strata: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    val tot = strata.agg(sum("n_docs").as("nn"))
    val based = strata.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(${budget}L * n_docs) div nn"))
      .withColumn("rem", expr(s"(${budget}L * n_docs) % nn"))
    val short = based.agg((lit(budget) - sum("base")).as("shortfall"))
    val w = Window.orderBy(col("rem").desc, col("source"))
    based.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(w))
      .withColumn("extra",
        when(col("rk") <= col("shortfall"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("base"), col("rem"),
        col("extra"), (col("base") + col("extra")).as("alloc"))
      .orderBy("source")
  }

  val x24LargestRemainder = QueryDef(
    "x24_largest_remainder",
    (s, d) =>
      largestRemainder(Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs")), 10000L),
    Some("""WITH strata AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM strata),
           |based AS (
           |  SELECT source, n_docs,
           |    (10000 * n_docs) // nn AS base,
           |    (10000 * n_docs) % nn AS rem
           |  FROM strata CROSS JOIN tot),
           |short AS (SELECT 10000 - CAST(sum(base) AS BIGINT)
           |  AS shortfall FROM based),
           |rk AS (
           |  SELECT *, row_number() OVER (ORDER BY rem DESC, source)
           |    AS r
           |  FROM based CROSS JOIN short)
           |SELECT source, n_docs, CAST(base AS BIGINT) AS base,
           |  CAST(rem AS BIGINT) AS rem,
           |  CASE WHEN r <= shortfall THEN CAST(1 AS BIGINT)
           |    ELSE CAST(0 AS BIGINT) END AS extra,
           |  CAST(base + CASE WHEN r <= shortfall THEN 1 ELSE 0 END
           |    AS BIGINT) AS alloc
           |FROM rk ORDER BY source""".stripMargin))

  // ---------------------------------------------------------------- x25
  /** Epoch-shuffle decorrelation audit: a training run re-shuffles the
    * corpus every epoch with the deterministic md5(epoch ‖ doc_id)
    * permutation (reproducible across engines, retries, and resumes —
    * the q46 convention applied to DATA ORDERING), and this query
    * PROVES the shuffles decorrelate: the Pearson correlation between
    * epoch 0's and epoch e's 256-band positions sits at ~0 for every
    * later epoch (a correlated shuffle re-feeds batches in similar
    * order and biases curricula / LR-schedule interactions). All sums
    * are exact integers over bands ≤255 (q63's explicit-sum Pearson);
    * the correlation is the only float, rounded to micro.
    *
    * Scale shape: ONE corpus scan projects all four epoch bands
    * row-locally (md5 + hex prefix — no shuffle of the corpus at all),
    * explodes 3 epoch pairs, and ONE map-side-combined agg produces
    * the five sufficient statistics per epoch. The audit never sorts
    * anything — it reasons about the permutation through its band
    * projection. */
  val x25EpochShuffleAudit = QueryDef(
    "x25_epoch_shuffle_audit",
    (s, d) => {
      def band(e: Int) =
        expr(s"cast(conv(substring(md5(concat('$e', ':'," +
          " cast(doc_id as string))), 1, 2), 16, 10) as bigint)")
      Tables.documents(s, d)
        .select(col("doc_id"), band(0).as("b0"),
          explode(array((1 to 3).map(e =>
            struct(lit(e).as("epoch"), band(e).as("be"))): _*)).as("p"))
        .select(col("p.epoch").as("epoch"), col("b0"),
          col("p.be").as("be"))
        .groupBy("epoch")
        .agg(count(lit(1)).as("n_docs"),
          sum("b0").as("sx"), sum(col("b0") * col("b0")).as("sxx"),
          sum("be").as("sy"), sum(col("be") * col("be")).as("syy"),
          sum(col("b0") * col("be")).as("sxy"))
        .select(col("epoch"), col("n_docs"),
          expr("cast(round(1e6 * (n_docs * sxy - sx * sy)" +
            " / sqrt(cast(n_docs * sxx - sx * sx as double)" +
            " * (n_docs * syy - sy * sy))) as bigint)").as("r_micro"))
        .orderBy("epoch")
    },
    Some("""WITH b AS (
           |  SELECT doc_id,
           |    ('0x' || substr(md5('0' || ':' || CAST(doc_id AS VARCHAR)),
           |      1, 2))::BIGINT AS b0,
           |    e.epoch,
           |    ('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || ':'
           |      || CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT AS be
           |  FROM documents
           |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS epoch)
           |    AS e),
           |st AS (
           |  SELECT epoch, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(b0) AS BIGINT) AS sx,
           |    CAST(sum(b0 * b0) AS BIGINT) AS sxx,
           |    CAST(sum(be) AS BIGINT) AS sy,
           |    CAST(sum(be * be) AS BIGINT) AS syy,
           |    CAST(sum(b0 * be) AS BIGINT) AS sxy
           |  FROM b GROUP BY 1)
           |SELECT epoch, n_docs,
           |  CAST(round(1e6 * (n_docs * sxy - sx * sy)
           |    / sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
           |      * (n_docs * syy - sy * sy))) AS BIGINT) AS r_micro
           |FROM st ORDER BY epoch""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(x01Decontaminate, x02StratifiedSample, x03DomainMix,
      t06PiiRedact, t07Repetition, x04ContainmentScore, x05WeightedSample,
      x06PackSequences, x07ClusterReps, x08TemperatureMix, x09LeakageSplit,
      x10CurationPipeline, x11BloomDecontaminate, x12CompactionPlan,
      x13EpochPlan, x14KAnonymity, x15DsirWeights, x16ShardPlan,
      x17ModalityAgreement, x18CurriculumPlan, x19TokenBudget,
      x20DedupAwareSample, x21PostDedupRebalance, x22ContextSweep,
      x23DedupSampleSketch, x24LargestRemainder, x25EpochShuffleAudit)
}

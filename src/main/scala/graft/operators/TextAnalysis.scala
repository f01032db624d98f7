package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions => T}
import graft.functions.Rounding.{r2, r4, r6}

/** Text-analysis operators over `documents` (north-star surface):
  * language ID (stopword n-gram heuristic), quality scoring, token
  * counting (whitespace + regex-lexer), and rolling-hash fingerprints.
  * All pure per-row projections — no shuffle, no model, perfectly
  * parallel at any scale.
  */
object TextAnalysis {

  private def sqlScore(words: Seq[String]): String =
    s"CAST(len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b')) AS INT)"

  // ---------------------------------------------------------------- t01
  /** Heuristic language ID: per-language stopword hit counts, winner =
    * first language (in list order) attaining the max score.
    *
    * Implemented as tokenize-once → explode → broadcast join against the
    * (word, lang) stopword table → pivot counts: one pass over the text
    * instead of one regex scan per language (5× fewer text traversals; at
    * corpus scale the join side is a broadcast of a few dozen rows).
    * Splitting on non-word chars makes token equality exactly equivalent
    * to the oracle's \b(w1|w2|…)\b regex counting. */
  val t01LangId = QueryDef(
    "t01_text_langid",
    (s, d) => {
      val langs = T.stopwords.map(_._1)
      val wordLang = s.createDataFrame(
        T.stopwords.flatMap { case (l, ws) => ws.map(w => (w, l)) })
        .toDF("tok", "sw_lang")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("lang_actual"), col("text"))
      val hits = docs
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9_]+")).as("tok"))
        .join(broadcast(wordLang), Seq("tok"))
        .groupBy("doc_id").pivot("sw_lang", langs).count()
      val joined = docs.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id") +: col("lang_actual") +:
          langs.map(l => coalesce(col(l), lit(0L)).cast("int").as(s"s_$l")): _*)
      val scores = langs.map(l => col(s"s_$l"))
      val m = greatest(scores: _*)
      val pred = langs.foldRight(lit("und")) {
        case (l, elseCol) => when(col(s"s_$l") === m, l).otherwise(elseCol)
      }
      // foldRight builds WHEN en THEN .. WHEN es THEN .. — first-match wins
      joined.withColumn("lang_pred", pred)
        .orderBy("doc_id")
    },
    Some {
      // DuckDB lateral column aliases let `m` reference the s_* aliases.
      val scoreExprs = T.stopwords.map { case (l, ws) => s"${sqlScore(ws)} AS s_$l" }
      val m = T.stopwords.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      val cases = T.stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }
      s"""SELECT doc_id, lang_actual, ${T.stopwords.map(x => "s_" + x._1).mkString(", ")},
         |  CASE ${cases.mkString(" ")} ELSE 'und' END AS lang_pred
         |FROM (SELECT doc_id, lang AS lang_actual, ${scoreExprs.mkString(", ")}, $m AS m
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    })

  // ---------------------------------------------------------------- t02
  /** Quality scoring: token count, mean token length, stopword ratio,
    * punctuation ratio, blended [0,1] score. */
  val t02Quality = QueryDef(
    "t02_text_quality",
    (s, d) => {
      // single source of truth: the TextFunctions quality-metric library
      val n = T.nTokens(col("text"))
      val meanLen = T.meanTokenLen(col("text"))
      val stopRatio = T.stopwordRatio(col("text"))
      val punctRatio = T.punctRatio(col("text"))
      val quality = least(lit(1.0), n.cast("double") / 100.0) * 0.5 +
        least(lit(1.0), stopRatio * 4) * 0.3 + (lit(1.0) - punctRatio) * 0.2
      Tables.documents(s, d)
        .select(col("doc_id"), n.as("n_tokens"),
          r4(meanLen).as("mean_tok_len"), r4(stopRatio).as("stop_ratio"),
          r4(punctRatio).as("punct_ratio"), r4(quality).as("quality"))
        .orderBy("doc_id")
    },
    Some {
      val allStops = T.stopwords.flatMap(_._2).distinct.mkString("|")
      s"""SELECT doc_id, CAST(n AS INT) AS n_tokens,
         |  round((length(text) - n + 1) / CAST(n AS DOUBLE), 4) AS mean_tok_len,
         |  round(stop_hits / CAST(n AS DOUBLE), 4) AS stop_ratio,
         |  round(punct / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
         |  round(least(1.0, n / 100.0) * 0.5 +
         |        least(1.0, (stop_hits / CAST(n AS DOUBLE)) * 4) * 0.3 +
         |        (1.0 - punct / CAST(length(text) AS DOUBLE)) * 0.2, 4) AS quality
         |FROM (SELECT doc_id, text,
         |        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
         |        CAST(len(regexp_extract_all(lower(text), '\\b($allStops)\\b')) AS DOUBLE) AS stop_hits,
         |        CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) AS punct
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    })

  // ---------------------------------------------------------------- t03
  /** Token counting three ways: whitespace split, [a-z]+ word lexer,
    * BPE-ish lexer (letter runs | digit runs | single symbols). */
  val t03TokenCount = QueryDef(
    "t03_text_tokens",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(T.tokens(col("text"))).as("n_ws"),
          T.wordCount(col("text")).as("n_words"),
          T.bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
           |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT) AS n_words,
           |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t04
  /** Rolling polynomial content hash (Rabin-Karp over md5-derived token
    * hashes, mod 2^31-1): order-sensitive doc fingerprint, cheap to extend
    * to windowed shingle hashing. The base hash (first 8 md5 hex chars as
    * int) and the fold are replayed exactly by the DuckDB oracle
    * (list_reduce seeds with the first element, which equals the
    * 0·B + h₁ first step of Spark's aggregate since h₁ < P). */
  val t04RollingHash = QueryDef(
    "t04_text_rolling_hash",
    (s, d) => {
      // modulus small enough that acc*B + h never overflows a long
      val P = lit(2147483647L) // 2^31 - 1
      val B = lit(1000003L)
      val rolled = aggregate(T.tokens(col("text")), lit(0L),
        (acc, t) => (acc * B +
          conv(substring(md5(t), 1, 8), 16, 10).cast("long") % P) % P)
      Tables.documents(s, d)
        .select(col("doc_id"), rolled.as("content_hash"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  list_reduce(
           |    list_transform(string_split(text, ' '),
           |      t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % 2147483647),
           |    (acc, x) -> (acc * 1000003 + x) % 2147483647) AS content_hash
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t05
  /** TF-IDF top terms per document: tf from explode+count, df from a
    * distinct doc-token count, idf = ln(N/df). Two hash-agg shuffles and
    * one key-equi-join — the scalable formulation (no per-doc vocabulary
    * maps on the driver). Top-3 terms per doc by (score, term) rank. */
  val t05TfIdf = QueryDef(
    "t05_text_tfidf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val nDf = docs.agg(countDistinct("doc_id").cast("double").as("n"))
      val tokens = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val tf = tokens.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("tok"))
      tf.join(df, Seq("tok"))
        .crossJoin(broadcast(nDf)) // scalar broadcast, no driver action
        .withColumn("score", col("tf") * log(col("n") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), r6(col("score")).as("score"))
        .orderBy("doc_id", "rank")
    },
    Some("""WITH tokens AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY 1, 2),
           |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
           |scored AS (
           |  SELECT doc_id, tok, tf * ln(n / df) AS score
           |  FROM tf JOIN df USING (tok) CROSS JOIN n),
           |ranked AS (
           |  SELECT doc_id, tok, score, row_number() OVER
           |    (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
           |  FROM scored)
           |SELECT doc_id, rank, tok, round(score, 6) AS score
           |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin))

  // ---------------------------------------------------------------- t08
  /** Unigram language-model scoring: per-document mean token
    * log-probability under the corpus's own unigram distribution —
    * the classic cheap fluency/quality signal (gibberish and boilerplate
    * both score low) used to filter pretraining corpora.
    *
    * mean_logprob(doc) = Σ_tok tf·ln(c_tok / total) / n_toks, computed
    * from the same (doc, tok) tf aggregate TF-IDF uses: two hash-agg
    * shuffles + one equi-join on the token. In production the unigram
    * table is a bounded artifact (top-k vocab + OOV floor) broadcast from
    * ingest; here it comes from the corpus itself in the same query. */
  val t08UnigramLm = QueryDef(
    "t08_unigram_logprob",
    (s, d) => {
      val tokens = Tables.documents(s, d).select(col("doc_id"),
        explode(T.tokens(col("text"))).as("tok"))
      val tf = tokens.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val uni = tf.groupBy("tok").agg(sum("tf").as("c"))
      val total = uni.agg(sum("c").cast("double").as("total"))
      tf.join(uni, Seq("tok"))
        .crossJoin(broadcast(total)) // scalar broadcast, no driver action
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"),
          r4(sum(col("tf") * log(col("c") / col("total"))) / sum("tf"))
            .as("mean_logprob"))
        .orderBy("doc_id")
    },
    Some("""WITH tokens AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY 1, 2),
           |uni AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
           |total AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni)
           |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
           |  round(sum(tf * ln(c / total)) / sum(tf), 4) AS mean_logprob
           |FROM tf JOIN uni USING (tok) CROSS JOIN total
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t09
  /** Token-distribution entropy per document:
    * H = -Σ (tf/n)·ln(tf/n) = ln(n) - Σ tf·ln(tf) / n — low entropy
    * flags repetitive/templated text, high entropy flags noise; the
    * complement of t07's explicit repetition ratios. The closed form
    * needs only sum(tf·ln tf) and sum(tf), so it is two hash-agg
    * shuffles — (doc, tok) then doc — with map-side combine. */
  val t09TokenEntropy = QueryDef(
    "t09_token_entropy",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"),
          r4(log(sum("tf")) - sum(col("tf") * log(col("tf"))) / sum("tf"))
            .as("entropy"))
        .orderBy("doc_id")
    },
    Some("""WITH tf AS (
           |  SELECT doc_id, tok, count(*) AS tf
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY 1, 2)
           |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
           |  round(ln(CAST(sum(tf) AS DOUBLE)) - sum(tf * ln(tf)) / sum(tf), 4)
           |    AS entropy
           |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------------------- t10
  /** Gopher-style quality RULE battery — the hard pass/fail filters that
    * complement t02's blended score: word-count bounds, mean-word-length
    * bounds, numeric-token ratio, and duplicate-word ratio, each emitted
    * as its own flag plus the conjunction (`keep`). This is the rule
    * gate a curation pipeline applies before any scoring model sees the
    * document.
    *
    * Scale shape: a pure per-row projection (array ops over the token
    * split) — no shuffle at all; the ORDER BY is presentation-only. */
  val t10GopherRules = QueryDef(
    "t10_gopher_rules",
    (s, d) => {
      val toks = T.tokens(col("text"))
      val nW = size(toks)
      val meanLen = T.meanTokenLen(col("text"))
      val numRatio = expr("size(filter(split(text, ' '), " +
        "x -> x RLIKE '^[0-9]+$'))").cast("double") / nW.cast("double")
      val dupRatio = lit(1.0) -
        size(array_distinct(toks)).cast("double") / nW.cast("double")
      val passWords = nW >= 50 && nW <= 100000
      val passLen = meanLen >= 3.0 && meanLen <= 10.0
      val passNum = numRatio < 0.2
      val passDup = dupRatio < 0.5
      Tables.documents(s, d)
        .select(col("doc_id"), nW.as("n_words"),
          r4(meanLen).as("mean_word_len"),
          r4(numRatio).as("numeric_ratio"),
          r4(dupRatio).as("dup_ratio"),
          passWords.cast("int").as("pass_nwords"),
          passLen.cast("int").as("pass_wordlen"),
          passNum.cast("int").as("pass_numeric"),
          passDup.cast("int").as("pass_dup"),
          (passWords && passLen && passNum && passDup).cast("int").as("keep"))
        .orderBy("doc_id")
    },
    Some("""WITH f AS (
           |  SELECT doc_id, string_split(text, ' ') AS t,
           |    CAST(len(string_split(text, ' ')) AS INT) AS nw,
           |    length(text) AS lt
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, nw,
           |    (lt - nw + 1) / CAST(nw AS DOUBLE) AS mean_len,
           |    len(list_filter(t, x -> regexp_full_match(x, '[0-9]+')))
           |      / CAST(nw AS DOUBLE) AS num_ratio,
           |    1.0 - len(list_distinct(t)) / CAST(nw AS DOUBLE) AS dup_ratio
           |  FROM f)
           |SELECT doc_id, nw AS n_words,
           |  round(mean_len * 10000) / 10000 AS mean_word_len,
           |  round(num_ratio * 10000) / 10000 AS numeric_ratio,
           |  round(dup_ratio * 10000) / 10000 AS dup_ratio,
           |  CAST(nw >= 50 AND nw <= 100000 AS INT) AS pass_nwords,
           |  CAST(mean_len >= 3.0 AND mean_len <= 10.0 AS INT) AS pass_wordlen,
           |  CAST(num_ratio < 0.2 AS INT) AS pass_numeric,
           |  CAST(dup_ratio < 0.5 AS INT) AS pass_dup,
           |  CAST(nw >= 50 AND nw <= 100000 AND mean_len >= 3.0
           |       AND mean_len <= 10.0 AND num_ratio < 0.2
           |       AND dup_ratio < 0.5 AS INT) AS keep
           |FROM g ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t11
  /** Bigram-LM mean log-probability per document: score each doc by
    * mean ln P(w_i | w_{i-1}) under an add-k-smoothed (k = 0.5) bigram
    * model fitted on the corpus itself — the next step up from t08's
    * unigram scorer, and the cheap stand-in for the perplexity filters
    * training pipelines run (low scores = disfluent/boilerplate-mangled
    * text; t08-vs-t11 divergence flags word-salad that unigram stats
    * can't see). Context counts c1(w1) sum the bigram table (so the
    * conditional distribution normalizes exactly); V is the unigram
    * vocabulary.
    *
    * Scale shape: posting-list equi-joins only — per-doc bigram tf joins
    * the corpus bigram table on gram and the context table on w1, both
    * map-side-combined hash-aggs first; V is a scalar broadcast. Same
    * shuffle skeleton as t08/t05. */
  val t11BigramLm = QueryDef(
    "t11_bigram_logprob",
    (s, d) => {
      val bg = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(T.shinglesAll(T.tokens(col("text")), 2)).as("gram"))
      val tf = bg.groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
      val c2 = tf.groupBy("gram").agg(sum("tf").as("c2"))
        .withColumn("w1", substring_index(col("gram"), " ", 1))
      val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
      val vocab = Tables.documents(s, d)
        .select(explode(T.tokens(col("text"))).as("tok"))
        .agg(countDistinct("tok").cast("double").as("v"))
      tf.join(c2, Seq("gram")).join(c1, Seq("w1"))
        .crossJoin(broadcast(vocab)) // scalar broadcast, no driver action
        .groupBy("doc_id")
        .agg(sum("tf").as("n_bigrams"),
          r4(sum(col("tf") *
              log((col("c2") + 0.5) / (col("c1") + col("v") * 0.5))) / sum("tf"))
            .as("mean_logprob"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           |bg AS (
           |  SELECT doc_id,
           |    unnest(list_transform(range(1, greatest(len(t)-1, 0)+1),
           |      i -> t[i] || ' ' || t[i+1])) AS gram
           |  FROM toks),
           |tf AS (SELECT doc_id, gram, count(*) AS tf FROM bg GROUP BY 1, 2),
           |c2 AS (SELECT gram, CAST(sum(tf) AS BIGINT) AS c2,
           |              string_split(gram, ' ')[1] AS w1
           |       FROM tf GROUP BY 1),
           |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
           |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
           |      FROM (SELECT unnest(string_split(text, ' ')) AS tok
           |            FROM documents))
           |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
           |  round(sum(tf * ln((c2 + 0.5) / (c1 + 0.5 * v))) / sum(tf)
           |        * 10000) / 10000 AS mean_logprob
           |FROM tf JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t12
  /** Collocation mining via pointwise mutual information: top-50 token
    * bigrams by PMI = ln(p(w1,w2) / (p(w1)·p(w2))) with a min-support
    * floor (c2 ≥ 5 — PMI without support degenerates to hapax pairs).
    * The standard phrase/term detector a tokenizer- or vocab-building
    * pass runs over a corpus. Ranking keys on the r6-ROUNDED pmi (tie →
    * gram), so cross-engine ulp drift in ln() cannot reorder the top-k
    * boundary.
    *
    * Scale shape: two map-side-combined vocab aggregates (unigram,
    * bigram), two equi-joins of the bigram vocab against the unigram
    * vocab, scalar total broadcasts, TakeOrdered(50) — nothing scales
    * with corpus size except the initial aggregates. */
  val t12Collocations = QueryDef(
    "t12_collocations",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      val uni = toks.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val nTok = uni.agg(sum("c1").cast("double").as("n"))
      val bg = toks.select(explode(T.shinglesAll(col("toks"), 2)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("c2"))
        .withColumn("w1", substring_index(col("gram"), " ", 1))
        .withColumn("w2", substring_index(col("gram"), " ", -1))
      val nBg = bg.agg(sum("c2").cast("double").as("nb"))
      bg.filter(col("c2") >= 5)
        .join(uni.select(col("tok").as("w1"), col("c1").as("ca")), "w1")
        .join(uni.select(col("tok").as("w2"), col("c1").as("cb")), "w2")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBg))
        .select(col("gram"), col("c2").as("n_pair"),
          r6(log((col("c2") / col("nb")) /
            ((col("ca") / col("n")) * (col("cb") / col("n"))))).as("pmi"))
        .orderBy(col("pmi").desc, col("gram"))
        .limit(50)
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           |uni AS (
           |  SELECT tok, count(*) AS c1
           |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
           |n AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM uni),
           |bg AS (
           |  SELECT gram, count(*) AS c2,
           |         string_split(gram, ' ')[1] AS w1,
           |         string_split(gram, ' ')[2] AS w2
           |  FROM (SELECT unnest(list_transform(range(1, greatest(len(t)-1, 0)+1),
           |          i -> t[i] || ' ' || t[i+1])) AS gram FROM toks)
           |  GROUP BY 1),
           |nb AS (SELECT CAST(sum(c2) AS DOUBLE) AS nb FROM bg),
           |j AS (
           |  SELECT bg.gram, bg.c2, u1.c1 AS ca, u2.c1 AS cb
           |  FROM bg JOIN uni u1 ON bg.w1 = u1.tok
           |          JOIN uni u2 ON bg.w2 = u2.tok
           |  WHERE bg.c2 >= 5)
           |SELECT gram, CAST(c2 AS BIGINT) AS n_pair,
           |  round(ln((c2 / nb) / ((ca / n) * (cb / n))) * 1000000) / 1000000
           |    AS pmi
           |FROM j CROSS JOIN n CROSS JOIN nb
           |ORDER BY pmi DESC, gram LIMIT 50""".stripMargin))

  // ---------------------------------------------------------------- t13
  /** Classifier evaluation as a corpus operator: the confusion matrix of
    * t01's language-ID predictions against the labeled `lang` column,
    * with per-cell recall share (n / actual-class total) and precision
    * share (n / predicted-class total). Curation pipelines run exactly
    * this to qualify their filters before trusting them at corpus scale
    * — the eval is itself a distributed query, not a notebook
    * afterthought. Reuses t01's scorer verbatim so the matrix audits the
    * SAME operator the pipeline ships.
    *
    * Scale shape: t01's projection+broadcast-join scorer, then hash-aggs
    * bounded by (languages)² — nothing after the per-doc score scales
    * with the corpus. */
  val t13LangidConfusion = QueryDef(
    "t13_langid_confusion",
    (s, d) => {
      val scored = t01LangId.run(s, d).select("lang_actual", "lang_pred")
      val conf = scored.groupBy("lang_actual", "lang_pred")
        .agg(count(lit(1)).as("n"))
      val act = conf.groupBy("lang_actual").agg(sum("n").as("n_act"))
      val prd = conf.groupBy("lang_pred").agg(sum("n").as("n_prd"))
      conf.join(act, "lang_actual").join(prd, "lang_pred")
        .select(col("lang_actual"), col("lang_pred"), col("n"),
          r4(col("n") / col("n_act")).as("recall_share"),
          r4(col("n") / col("n_prd")).as("precision_share"))
        .orderBy("lang_actual", "lang_pred")
    },
    t01LangId.oracle.map(t01Sql => s"""WITH scored AS (
         |${t01Sql.replace("ORDER BY doc_id", "")}),
         |conf AS (SELECT lang_actual, lang_pred,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM scored GROUP BY 1, 2),
         |act AS (SELECT lang_actual, CAST(sum(n) AS BIGINT) AS n_act
         |  FROM conf GROUP BY 1),
         |prd AS (SELECT lang_pred, CAST(sum(n) AS BIGINT) AS n_prd
         |  FROM conf GROUP BY 1)
         |SELECT c.lang_actual, c.lang_pred, c.n,
         |  round(c.n / CAST(a.n_act AS DOUBLE), 4) AS recall_share,
         |  round(c.n / CAST(p.n_prd AS DOUBLE), 4) AS precision_share
         |FROM conf c JOIN act a USING (lang_actual)
         |JOIN prd p USING (lang_pred)
         |ORDER BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- t14
  /** Sliding-window document chunking: whitespace tokens cut into
    * window-32 chunks at stride 24 (8-token overlap), the pre-tokenizer
    * pass every training pipeline runs to turn documents into
    * context-length training sequences. Chunk count is
    * 1 + ceil((n-W)/S) for n>W — every token is covered and no chunk is
    * fully contained in its predecessor (a start past n-W would add
    * only already-covered tokens).
    *
    * Scale shape: tokenize-once projection + per-row explode — zero
    * shuffles, fully codegen'd; the trailing orderBy is presentation
    * only (a corpus-scale run writes unsorted). */
  val t14Chunking = QueryDef(
    "t14_chunking",
    (s, d) => {
      val W = 32; val S = 24
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .withColumn("n", size(col("t")))
        .withColumn("n_chunks", when(col("n") <= W, lit(1))
          .otherwise(expr(s"cast((n - $W + ${S - 1}) div $S as int)") + 1))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          (col("chunk_id") * S).as("start_tok"),
          slice(col("t"), col("chunk_id") * S + 1, lit(W)).as("ct"))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"),
          size(col("ct")).as("n_tok"),
          concat_ws(" ", col("ct")).as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS t,
           |         len(string_split(text, ' ')) AS n
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, t, n,
           |    CASE WHEN n <= 32 THEN 1
           |         ELSE (n - 32 + 23) // 24 + 1 END AS n_chunks
           |  FROM toks),
           |e AS (
           |  SELECT doc_id, t, n,
           |    CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id
           |  FROM c)
           |SELECT doc_id, chunk_id,
           |  CAST(chunk_id * 24 AS INT) AS start_tok,
           |  CAST(len(list_slice(t, chunk_id*24 + 1,
           |       least(chunk_id*24 + 32, n))) AS INT) AS n_tok,
           |  array_to_string(list_slice(t, chunk_id*24 + 1,
           |       least(chunk_id*24 + 32, n)), ' ') AS chunk_text
           |FROM e
           |ORDER BY doc_id, chunk_id""".stripMargin))

  // ---------------------------------------------------------------- t15
  /** Per-source corpus datasheet — the "datasheets for datasets" summary
    * a corpus release ships: volume (docs/tokens/chars), length shape
    * (exact interpolated median + p95 token counts), and language mix
    * (distinct langs, modal lang with a total-order tie-break, Shannon
    * entropy of the lang distribution). Entropy uses the algebraic
    * identity H = ln T − (Σ n·ln n)/T so the lang-mix stats are ONE
    * map-side-combined aggregate over (source, lang) counts — no
    * self-join against a totals table.
    *
    * Scale shape: two hash-aggs (per-doc projection → per-source; per
    * (source, lang) → per-source) joined broadcast on the handful of
    * sources — nothing after the per-doc projection scales with the
    * corpus. */
  val t15CorpusDatasheet = QueryDef(
    "t15_corpus_datasheet",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).as("n_toks"))
      val vol = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        r2(expr("percentile(n_toks, 0.5)")).as("median_tokens"),
        r2(expr("percentile(n_toks, 0.95)")).as("p95_tokens"),
        r2(avg(col("n_chars"))).as("avg_chars"))
      val langs = docs.groupBy("source", "lang")
        .agg(count(lit(1)).as("n"))
        .groupBy("source").agg(
          countDistinct(col("lang")).as("n_langs"),
          max_by(col("lang"),
            concat(format_string("%09d", col("n")), lit("#"), col("lang")))
            .as("top_lang"),
          r4(log(sum(col("n"))) -
            sum(col("n") * log(col("n"))) / sum(col("n")))
            .as("lang_entropy"))
      vol.join(broadcast(langs), "source").orderBy("source")
    },
    Some("""WITH docs AS (
           |  SELECT source, lang, n_chars,
           |    len(string_split(text, ' ')) AS n_toks
           |  FROM documents),
           |vol AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           |    round(quantile_cont(n_toks, 0.5), 2) AS median_tokens,
           |    round(quantile_cont(n_toks, 0.95), 2) AS p95_tokens,
           |    round(avg(n_chars), 2) AS avg_chars
           |  FROM docs GROUP BY 1),
           |bylang AS (
           |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
           |  FROM docs GROUP BY 1, 2),
           |langs AS (
           |  SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |    arg_max(lang, printf('%09d', n) || '#' || lang) AS top_lang,
           |    round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 4) AS lang_entropy
           |  FROM bylang GROUP BY 1)
           |SELECT v.source, v.n_docs, v.n_tokens, v.median_tokens,
           |  v.p95_tokens, v.avg_chars, l.n_langs, l.top_lang,
           |  l.lang_entropy
           |FROM vol v JOIN langs l USING (source)
           |ORDER BY v.source""".stripMargin))

  // ---------------------------------------------------------------- t16
  /** Chunk-level exact dedup — d01's dedup dropped to SEQUENCE
    * granularity: fingerprint every t14 training chunk and surface
    * repeated ones, the pass that catches boilerplate spans and
    * partially-copied documents that survive doc-level dedup (their
    * containing docs differ, their training sequences don't). Composes
    * the shipped chunker verbatim, so what gets deduped is exactly what
    * would have been trained on.
    *
    * Scale shape: chunking is a zero-shuffle projection; the aggregate
    * groups on the 128-bit md5 fingerprint, so the one exchange moves
    * 32-byte keys, never chunk text; output is only the repeated tail. */
  val t16ChunkDedup = QueryDef(
    "t16_chunk_dedup",
    (s, d) => {
      t14Chunking.run(s, d)
        .select(col("doc_id"), md5(col("chunk_text")).as("fingerprint"))
        .groupBy("fingerprint")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_copies") > 1)
        .select(col("fingerprint"), col("n_copies"), col("n_docs"),
          col("first_doc"), (col("n_docs") > 1).cast("int").as("cross_doc"))
        .orderBy(col("n_copies").desc, col("fingerprint"))
    },
    t14Chunking.oracle.map(t14Sql => s"""WITH chunks AS (
         |${t14Sql.replace("ORDER BY doc_id, chunk_id", "")})
         |SELECT md5(chunk_text) AS fingerprint,
         |  CAST(count(*) AS BIGINT) AS n_copies,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc,
         |  CAST(count(DISTINCT doc_id) > 1 AS INT) AS cross_doc
         |FROM chunks GROUP BY 1 HAVING count(*) > 1
         |ORDER BY n_copies DESC, fingerprint""".stripMargin))

  // ---------------------------------------------------------------- t17
  /** Hashed-feature linear quality classifier — the fastText-style
    * model-based filter every pretraining pipeline runs (a linear model
    * over a hashed bag of words; CCNet/fastText quality scoring). The
    * feature hash is the corpus-wide md5-prefix convention (d03's), the
    * per-bucket weight is a deterministic integer in [-1000, 1000]
    * derived from the bucket id (a real deployment broadcasts a trained
    * weight vector — same plumbing, different constants), and the doc
    * score is Σ w(bucket(tok)) / (1000·n_tokens). The numerator is an
    * exact BIGINT sum — order-independent, so partial aggregation
    * cannot perturb it and the keep flag (Σ > 0) is bit-exact in any
    * engine; the ONE double division happens after aggregation.
    *
    * Scale shape: explode → per-doc hash-agg with map-side combine; the
    * weight "vector" is an expression, so nothing is broadcast and no
    * join exists. Pure two-exchange pipeline at any corpus size. */
  val t17QualityClassifier = QueryDef(
    "t17_quality_classifier",
    (s, d) => {
      val D = 4096
      Tables.documents(s, d)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % D)
            .as("b"))
        .select(col("doc_id"),
          ((col("b") * 2654435761L) % 2001L - 1000L).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("w").as("score_milli"))
        .select(col("doc_id"), col("n_tokens"), col("score_milli"),
          r6(col("score_milli") / (col("n_tokens") * 1000.0)).as("score"),
          (col("score_milli") > 0).cast("int").as("keep"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |w AS (SELECT doc_id,
           |    (('0x' || substr(md5(tok), 1, 8))::BIGINT % 4096)
           |      * 2654435761 % 2001 - 1000 AS w
           |  FROM toks),
           |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |    CAST(sum(w) AS BIGINT) AS score_milli
           |  FROM w GROUP BY 1)
           |SELECT doc_id, n_tokens, score_milli,
           |  round(score_milli / (n_tokens * 1000.0), 6) AS score,
           |  CAST(score_milli > 0 AS INT) AS keep
           |FROM sc ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t18
  /** CCNet-style perplexity bucketing: rank every document by its t08
    * unigram-LM mean log-probability WITHIN its language and split each
    * language into head / middle / tail tertiles — the standard
    * quality-stratified curation cut (CCNet keeps head+middle, samples
    * tail) that feeds x03/x08's mixture weighting per stratum.
    *
    * Scale shape: the corpus-sized work is t08's two hash-agg shuffles;
    * tertile assignment is q59's value-histogram trick on the r4-ROUNDED
    * score, whose cardinality is capped by the rounding grid (10^4 cells
    * per unit of score range — a domain bound independent of corpus
    * size), so the per-language cumulative window never sees doc-sized
    * data; assignments broadcast back by (lang, score) value. Higher
    * logprob = lower perplexity = head, matching the CCNet orientation. */
  val t18PplBuckets = QueryDef(
    "t18_ppl_buckets",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // lang rides through the tf aggregate (functionally dependent on
      // doc_id, so the extra key adds no cardinality) instead of being
      // re-joined onto the doc-sized score table afterwards — one fewer
      // corpus-sized shuffle join
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(T.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("tf"))
      val uni = tf.groupBy("tok").agg(sum("tf").as("c"))
      val total = uni.agg(sum("c").cast("double").as("total"))
      val scored = tf.join(uni, Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(r4(sum(col("tf") * log(col("c") / col("total"))) / sum("tf"))
          .as("score"))
      val wCum = Window.partitionBy("lang").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val terts = scored.groupBy("lang", "score").agg(count(lit(1)).as("freq"))
        .withColumn("cum", sum("freq").over(wCum))
        .withColumn("n_all", sum("freq").over(wAll))
        .select(col("lang"), col("score"),
          expr("CAST((3 * cum - 1) DIV n_all + 1 AS INT)").as("tert"))
      scored.join(broadcast(terts), Seq("lang", "score"))
        .select(col("doc_id"), col("lang"), col("score"),
          when(col("tert") === 3, lit("head"))
            .when(col("tert") === 2, lit("middle"))
            .otherwise(lit("tail")).as("ppl_bucket"))
        .orderBy("doc_id")
    },
    Some("""WITH tokens AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tokens GROUP BY 1, 2),
           |uni AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
           |total AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni),
           |sc AS (SELECT doc_id,
           |    round(sum(tf * ln(c / total)) / sum(tf), 4) AS score
           |  FROM tf JOIN uni USING (tok) CROSS JOIN total GROUP BY doc_id),
           |sl AS (SELECT sc.doc_id, lang, score
           |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
           |hist AS (SELECT lang, score, count(*) AS freq FROM sl GROUP BY 1, 2),
           |map AS (SELECT lang, score,
           |    CAST((3 * sum(freq) OVER (PARTITION BY lang ORDER BY score
           |        ROWS UNBOUNDED PRECEDING) - 1)
           |      // sum(freq) OVER (PARTITION BY lang) + 1 AS INT) AS tert
           |  FROM hist)
           |SELECT doc_id, lang, score,
           |  CASE tert WHEN 3 THEN 'head' WHEN 2 THEN 'middle'
           |    ELSE 'tail' END AS ppl_bucket
           |FROM sl JOIN map USING (lang, score)
           |ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t19
  /** BPE merge-pair counting — the inner loop of byte-pair-encoding
    * vocabulary induction (Sennrich et al. 2016): count adjacent symbol
    * pairs across word TYPES weighted by word frequency and surface the
    * top merge candidates. At iteration 0 every symbol is one character,
    * so a pair is a 2-char substring; production induction repeats this
    * op per merge round over the re-segmented vocab (the d03/q73
    * iterate-a-bounded-op shape — each round's input is the word-TYPE
    * table, not the corpus).
    *
    * Scale shape: the corpus collapses to the word-frequency table in
    * ONE map-side-combined hash-agg (vocabulary-sized, Heaps'-law
    * sublinear); pair explosion and the ranking window run over the
    * pair-vocabulary (charset²-bounded), never over corpus tokens. */
  val t19BpePairs = QueryDef(
    "t19_bpe_pairs",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val words = Tables.documents(s, d)
        .select(explode(T.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wc"))
      val wRank = Window.orderBy(col("n").desc, col("pair"))
      words.filter(length(col("w")) >= 2)
        .select(col("wc"), explode(
          expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(sum("wc").as("n"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("pair"), col("n"))
        .orderBy("rank")
    },
    Some("""WITH words AS (
           |  SELECT tok AS w, count(*) AS wc
           |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY 1),
           |pairs AS (
           |  SELECT unnest(list_transform(range(1, len(w)),
           |      i -> substr(w, i, 2))) AS pair, wc
           |  FROM words WHERE len(w) >= 2),
           |agg AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n
           |  FROM pairs GROUP BY 1),
           |ranked AS (SELECT pair, n,
           |    row_number() OVER (ORDER BY n DESC, pair) AS rank
           |  FROM agg)
           |SELECT rank, pair, n FROM ranked WHERE rank <= 20
           |ORDER BY rank""".stripMargin))

  // ---------------------------------------------------------------- t21
  /** Corpus text-stats drift report — the relational twin of s12's
    * embedding drift: carve the corpus into two deterministic md5
    * halves (a stand-in for "yesterday's crawl vs today's"; a real
    * deployment splits on ingest batch) and report, per language, the
    * share of each half it holds, the share drift, and the mean
    * document length drift. The monitoring table that catches a
    * scraper/filter regression shifting the language or length mix
    * before a model trains on it.
    *
    * Scale shape: the split flag is a pure expression on doc_id, so the
    * whole report is ONE map-side-combined hash-agg to the (lang, half)
    * domain plus a tiny pivot — no join against a snapshot, no second
    * scan. */
  val t21DriftReport = QueryDef(
    "t21_drift_report",
    (s, d) => {
      val half = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") % 2L)
      val agg = Tables.documents(s, d)
        .select(col("lang"), half.as("h"), col("n_chars"))
        .groupBy("lang")
        .agg(
          sum(when(col("h") === 0L, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("h") === 1L, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("h") === 0L, col("n_chars"))).as("ch_a"),
          sum(when(col("h") === 1L, col("n_chars"))).as("ch_b"))
      val tot = agg.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
      agg.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_a"), col("n_b"),
          r6(col("n_a").cast("double") / col("t_a")).as("share_a"),
          r6(col("n_b").cast("double") / col("t_b")).as("share_b"),
          r6(abs(col("n_a").cast("double") / col("t_a") -
            col("n_b").cast("double") / col("t_b"))).as("share_drift"),
          r2(col("ch_a").cast("double") / col("n_a")).as("mean_chars_a"),
          r2(col("ch_b").cast("double") / col("n_b")).as("mean_chars_b"))
        .orderBy("lang")
    },
    Some("""WITH docs AS (
           |  SELECT lang, n_chars,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2
           |      AS h
           |  FROM documents),
           |agg AS (
           |  SELECT lang,
           |    CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |    sum(CASE WHEN h = 0 THEN n_chars END) AS ch_a,
           |    sum(CASE WHEN h = 1 THEN n_chars END) AS ch_b
           |  FROM docs GROUP BY 1),
           |tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM agg)
           |SELECT lang, n_a, n_b,
           |  round(CAST(n_a AS DOUBLE) / t_a * 1000000) / 1000000 AS share_a,
           |  round(CAST(n_b AS DOUBLE) / t_b * 1000000) / 1000000 AS share_b,
           |  round(abs(CAST(n_a AS DOUBLE) / t_a - CAST(n_b AS DOUBLE) / t_b)
           |    * 1000000) / 1000000 AS share_drift,
           |  round(CAST(ch_a AS DOUBLE) / n_a * 100) / 100 AS mean_chars_a,
           |  round(CAST(ch_b AS DOUBLE) / n_b * 100) / 100 AS mean_chars_b
           |FROM agg CROSS JOIN tot ORDER BY lang""".stripMargin))

  // ---------------------------------------------------------------- t22
  /** Per-document n-gram NOVELTY: the fraction of a document's distinct
    * 5-gram shingles whose corpus-wide FIRST occurrence (minimum doc_id
    * — ingest order in this corpus) is this document. The curriculum /
    * marginal-value signal dedup doesn't give: d01–d11 ask "is this a
    * copy of something", novelty asks "how much does this document add
    * that the corpus before it didn't have" — the greedy-selection score
    * in data-pruning pipelines (what D4/DoReMi-style curation ranks by),
    * and near-zero novelty late in ingest is the drift alarm t21 reads
    * at corpus level.
    *
    * Scale shape: one explode to distinct per-doc shingles (array_distinct
    * row-local), one map-side-combined min-agg on the shingle key — the
    * d09 posting-list shape — then an equi-join back on the shingle and a
    * hash-agg to the doc domain. Only (shingle, doc_id) pairs ever
    * shuffle; novelty of an increment against a 100 TB corpus probes the
    * materialized shingle→first_doc table, the d10 incremental posture.
    * Docs shorter than 5 tokens have no shingles and drop out — the
    * documented domain. */
  val t22Novelty = QueryDef(
    "t22_ngram_novelty",
    (s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), T.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(T.shingles(col("toks"), 5)).as("sh"))
      val first = sh.groupBy("sh").agg(min("doc_id").as("first_doc"))
      sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          r6(col("n_novel").cast("double") / col("n_shingles"))
            .as("novelty"))
        .orderBy("doc_id")
    },
    Some("""WITH sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id,
           |      unnest(list_transform(range(1, greatest(len(t)-4, 0)+1),
           |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
           |             t[i+3] || ' ' || t[i+4])) AS sh
           |    FROM (SELECT doc_id, string_split(text, ' ') AS t
           |          FROM documents))),
           |first AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1)
           |SELECT s.doc_id,
           |  CAST(count(*) AS BIGINT) AS n_shingles,
           |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_novel,
           |  round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
           |    / CAST(count(*) AS DOUBLE) * 1000000) / 1000000 AS novelty
           |FROM sh s JOIN first f USING (sh)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- t23
  /** Flesch-style readability: words (non-space runs), sentences
    * (terminator runs, floored at 1), and a syllable proxy (vowel-group
    * runs — the standard dictionary-free estimator), combined as
    * 206.835 − 1.015·(words/sentences) − 84.6·(vgroups/words) and
    * banded easy/medium/hard. A pure per-row projection — zero
    * shuffles, fully codegen'd, embarrassingly parallel at any scale —
    * and a core training-data curation signal (readability-banded
    * mixing). */
  val t23Readability = QueryDef(
    "t23_readability",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val words = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
      val sents = greatest(lit(1),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
      val vg = size(regexp_extract_all(lower(col("text")),
        lit("[aeiouy]+"), lit(0)))
      doc.filter(words > 0)
        .select(col("doc_id"), col("lang"),
          words.cast("long").as("n_words"),
          sents.cast("long").as("n_sents"),
          vg.cast("long").as("n_vgroups"))
        .withColumn("flesch",
          r4(lit(206.835)
            - lit(1.015) * col("n_words") / col("n_sents")
            - lit(84.6) * col("n_vgroups") / col("n_words")))
        .withColumn("band",
          when(col("flesch") >= 60, "easy")
            .when(col("flesch") >= 30, "medium").otherwise("hard"))
        .orderBy("doc_id")
    },
    Some("""WITH f AS (
           |  SELECT doc_id, lang,
           |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
           |      AS n_words,
           |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
           |      AS BIGINT) AS n_sents,
           |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
           |      AS BIGINT) AS n_vgroups
           |  FROM documents),
           |sc AS (
           |  SELECT *,
           |    round((206.835e0 - 1.015e0 * n_words / n_sents
           |      - 84.6e0 * n_vgroups / n_words) * 10000) / 10000 AS flesch
           |  FROM f WHERE n_words > 0)
           |SELECT doc_id, lang, n_words, n_sents, n_vgroups, flesch,
           |  CASE WHEN flesch >= 60 THEN 'easy'
           |       WHEN flesch >= 30 THEN 'medium'
           |       ELSE 'hard' END AS band
           |FROM sc ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- t24
  /** Lexical richness per source: type-token ratio, hapax share (tokens
    * seen exactly once), and mean token frequency — the vocabulary-
    * diversity cut a data-mix review reads beside t15's volume numbers
    * (templated/boilerplate sources show low TTR and a thin hapax
    * tail; rich prose shows the opposite).
    *
    * Scale shape: explode → one (source, token) hash-agg (map-side
    * combined, vocabulary-sized output by Heaps' law) → one per-source
    * rollup. All-integer counts; ratios divide exact sums. */
  val t24LexicalRichness = QueryDef(
    "t24_lexical_richness",
    (s, d) => {
      val tokens = Tables.documents(s, d)
        .select(col("source"), explode(T.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok")
        .agg(count(lit(1)).as("n"))
      tokens.groupBy("source")
        .agg(count(lit(1)).as("n_types"), sum("n").as("n_tokens"),
          sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          col("n_hapax"),
          r6(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
          r6(col("n_hapax").cast("double") / col("n_types"))
            .as("hapax_share"),
          r4(col("n_tokens").cast("double") / col("n_types"))
            .as("mean_freq"))
        .orderBy("source")
    },
    Some("""WITH tok AS (
           |  SELECT source, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |tf AS (
           |  SELECT source, tok, count(*) AS n FROM tok GROUP BY 1, 2)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_types,
           |  CAST(sum(n) AS BIGINT) AS n_tokens,
           |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_hapax,
           |  round(CAST(count(*) AS DOUBLE) / sum(n) * 1000000) / 1000000
           |    AS ttr,
           |  round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / count(*) * 1000000) / 1000000 AS hapax_share,
           |  round(CAST(sum(n) AS DOUBLE) / count(*) * 10000) / 10000
           |    AS mean_freq
           |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- t25
  /** Zipf rank-frequency fit per language: least-squares slope of
    * ln(freq) vs ln(rank) over the top-200 token ranks. Natural text
    * sits near slope −1; templated or synthetic text bends away from
    * it, so the slope is a one-number corpus-naturalness check beside
    * t24's richness ratios.
    *
    * Scale shape: one (lang, tok) hash-agg (vocabulary-sized), one
    * window per lang for ranks (vocab-sized input, top-200 kept), then
    * a per-lang rollup of FIVE integer sums. ln values move as exact
    * micro-unit BIGINTs so every sum is order-proof; the regression
    * closed form divides exact integers only at the end. */
  val t25ZipfSlope = QueryDef(
    "t25_zipf_slope",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K = 200
      val freq = Tables.documents(s, d)
        .select(col("lang"), explode(T.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang")
        .orderBy(col("n").desc, col("tok").asc)
      val xy = freq.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("lang"),
          expr("cast(round(ln(rank) * 1000000) as bigint)").as("x"),
          expr("cast(round(ln(n) * 1000000) as bigint)").as("y"))
      xy.groupBy("lang")
        .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_raw",
          (col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .select(col("lang"), col("k"), r4(col("slope_raw")).as("slope"),
          r4((col("sy").cast("double") / 1000000.0
            - col("slope_raw") * col("sx") / 1000000.0) / col("k"))
            .as("intercept"))
        .orderBy("lang")
    },
    Some("""WITH freq AS (
           |  SELECT lang, tok, count(*) AS n
           |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
           |        FROM documents)
           |  GROUP BY 1, 2),
           |rk AS (
           |  SELECT lang, n, row_number() OVER (PARTITION BY lang
           |    ORDER BY n DESC, tok) AS rank
           |  FROM freq),
           |xy AS (
           |  SELECT lang,
           |    CAST(round(ln(rank) * 1000000) AS BIGINT) AS x,
           |    CAST(round(ln(n) * 1000000) AS BIGINT) AS y
           |  FROM rk WHERE rank <= 200),
           |agg AS (
           |  SELECT lang, CAST(count(*) AS BIGINT) AS k,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx
           |  FROM xy GROUP BY 1),
           |sl AS (
           |  SELECT lang, k, sx, sy,
           |    CAST(k * sxy - sx * sy AS DOUBLE)
           |      / CAST(k * sxx - sx * sx AS DOUBLE) AS slope_raw
           |  FROM agg)
           |SELECT lang, k, round(slope_raw * 10000) / 10000 AS slope,
           |  round((CAST(sy AS DOUBLE) / 1000000
           |    - slope_raw * sx / 1000000) / k * 10000) / 10000 AS intercept
           |FROM sl ORDER BY lang""".stripMargin))

  // ---------------------------------------------------------------- t26
  /** Quality-threshold ROI sweep: the d14 calibration pattern applied
    * to t08's unigram LM score — for four candidate cutoffs, how many
    * documents and how many tokens a "drop everything below τ" filter
    * costs. The table read before committing a quality bar: the doc
    * loss and the token loss diverge when low-quality docs are long.
    *
    * Scale shape: the per-doc score table is computed ONCE (t08's two
    * hash-aggs), then a constant 4-way explode + one hash-agg onto the
    * threshold grid; scores are t08's r4-rounded doubles, so the
    * cutoff comparisons are bit-identical cross-engine. */
  val t26QualitySweep = QueryDef(
    "t26_quality_threshold_sweep",
    (s, d) => {
      val tokens = Tables.documents(s, d).select(col("doc_id"),
        explode(T.tokens(col("text"))).as("tok"))
      val tf = tokens.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val uni = tf.groupBy("tok").agg(sum("tf").as("c"))
      val total = uni.agg(sum("c").cast("double").as("total"))
      val perDoc = tf.join(uni, Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"),
          r4(sum(col("tf") * log(col("c") / col("total"))) / sum("tf"))
            .as("score"))
      val taus = Seq(-3.45, -3.41, -3.40, -3.39)
      perDoc
        .select(col("n_toks"), col("score"),
          explode(array(taus.map(lit): _*)).as("tau"))
        .groupBy("tau")
        .agg(sum(when(col("score") >= col("tau"), 1L).otherwise(0L))
          .as("n_kept"),
          sum(when(col("score") < col("tau"), 1L).otherwise(0L))
            .as("n_removed"),
          sum(when(col("score") >= col("tau"), col("n_toks"))
            .otherwise(0L)).as("toks_kept"),
          sum(when(col("score") < col("tau"), col("n_toks"))
            .otherwise(0L)).as("toks_removed"))
        .select(col("tau"), col("n_kept"), col("n_removed"),
          col("toks_kept"), col("toks_removed"),
          r6(col("n_removed").cast("double")
            / (col("n_kept") + col("n_removed"))).as("doc_removal_share"),
          r6(col("toks_removed").cast("double")
            / (col("toks_kept") + col("toks_removed")))
            .as("token_removal_share"))
        .orderBy("tau")
    },
    Some("""WITH tokens AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           |  FROM documents),
           |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tokens
           |  GROUP BY 1, 2),
           |uni AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf
           |  GROUP BY 1),
           |total AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni),
           |per_doc AS (
           |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
           |    round(sum(tf * ln(c / total)) / sum(tf), 4) AS score
           |  FROM tf JOIN uni USING (tok) CROSS JOIN total
           |  GROUP BY doc_id),
           |sweep AS (
           |  SELECT unnest([CAST(-3.45 AS DOUBLE), -3.41, -3.40, -3.39])
           |    AS tau, n_toks, score
           |  FROM per_doc)
           |SELECT tau,
           |  CAST(sum(CASE WHEN score >= tau THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  CAST(sum(CASE WHEN score < tau THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_removed,
           |  CAST(sum(CASE WHEN score >= tau THEN n_toks ELSE 0 END)
           |    AS BIGINT) AS toks_kept,
           |  CAST(sum(CASE WHEN score < tau THEN n_toks ELSE 0 END)
           |    AS BIGINT) AS toks_removed,
           |  round(CAST(sum(CASE WHEN score < tau THEN 1 ELSE 0 END)
           |    AS DOUBLE) / count(*) * 1000000) / 1000000
           |    AS doc_removal_share,
           |  round(CAST(sum(CASE WHEN score < tau THEN n_toks ELSE 0 END)
           |      AS DOUBLE) / sum(n_toks) * 1000000) / 1000000
           |    AS token_removal_share
           |FROM sweep GROUP BY 1 ORDER BY 1""".stripMargin))

  // ---------------------------------------------------------------- t27
  /** Distinctive vocabulary per source — Monroe/Colaresi/Quinn's
    * log-odds-ratio with a Dirichlet prior, z-scored: the "what words
    * does THIS slice overuse" detector behind corpus datasheets and
    * domain-tagging (t05's TF-IDF ranks terms within a document; this
    * contrasts a SLICE against the rest of the corpus with variance-
    * aware smoothing, so rare-word flukes don't top the list). δ and
    * σ² derive from exact integer counts through identical double
    * expressions in both engines; z rounds to micro before the per-
    * source (z DESC, term) top-3 rank, so the cut is a deterministic
    * total order.
    *
    * Scale shape: tokenize-once explode → ONE map-side-combined
    * hash-agg onto the (source × word) vocab grid; corpus/source/word
    * marginals and the vocab size all come from windows OVER THE GRID
    * (the q169 posture), then one rank window on the per-source slice.
    * 100 TB of text reaches the statistics as vocabulary-bounded
    * counters. */
  val t27DistinctiveTerms = QueryDef(
    "t27_distinctive_terms",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byW = Window.partitionBy("w")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val byS = Window.partitionBy("source")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val full = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val grid = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("ysw"))
      val scored = grid
        .withColumn("yw", sum("ysw").over(byW))
        .withColumn("ns", sum("ysw").over(byS))
        .withColumn("n", sum("ysw").over(full))
        .withColumn("v", size(collect_set(col("w")).over(full)))
        .filter(col("ysw") >= 5)
        .withColumn("z_micro", expr(
          "cast(round(1e6 * (" +
            "ln((ysw + 0.5e0) / (ns + 0.5e0 * v - ysw - 0.5e0))" +
            " - ln((yw - ysw + 0.5e0)" +
            " / (n - ns + 0.5e0 * v - (yw - ysw) - 0.5e0))" +
          ") / sqrt(1e0 / (ysw + 0.5e0) + 1e0 / (yw - ysw + 0.5e0)))" +
          " as bigint)"))
      val rk = Window.partitionBy("source")
        .orderBy(col("z_micro").desc, col("w").asc)
      scored.withColumn("rank", row_number().over(rk))
        .filter(col("rank") <= 3)
        .select(col("source"), col("rank"), col("w").as("term"),
          col("ysw").as("n_in_source"), col("z_micro"))
        .orderBy("source", "rank")
    },
    Some("""WITH grid AS (
           |  SELECT source, unnest(string_split(text, ' ')) AS w
           |  FROM documents),
           |cnt AS (
           |  SELECT source, w, CAST(count(*) AS BIGINT) AS ysw
           |  FROM grid GROUP BY 1, 2),
           |marg AS (
           |  SELECT *,
           |    CAST(sum(ysw) OVER (PARTITION BY w) AS BIGINT) AS yw,
           |    CAST(sum(ysw) OVER (PARTITION BY source) AS BIGINT) AS ns,
           |    CAST(sum(ysw) OVER () AS BIGINT) AS n,
           |    (SELECT count(DISTINCT w) FROM cnt) AS v
           |  FROM cnt),
           |scored AS (
           |  SELECT *, CAST(round(1e6 * (
           |      ln((ysw + 0.5e0) / (ns + 0.5e0 * v - ysw - 0.5e0))
           |      - ln((yw - ysw + 0.5e0)
           |        / (n - ns + 0.5e0 * v - (yw - ysw) - 0.5e0))
           |    ) / sqrt(1e0 / (ysw + 0.5e0) + 1e0 / (yw - ysw + 0.5e0)))
           |    AS BIGINT) AS z_micro
           |  FROM marg WHERE ysw >= 5),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY source
           |    ORDER BY z_micro DESC, w ASC) AS rank
           |  FROM scored)
           |SELECT source, rank, w AS term, ysw AS n_in_source, z_micro
           |FROM ranked WHERE rank <= 3
           |ORDER BY source, rank""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(t01LangId, t02Quality, t03TokenCount, t04RollingHash, t05TfIdf,
      t08UnigramLm, t09TokenEntropy, t10GopherRules, t11BigramLm,
      t12Collocations, t13LangidConfusion, t14Chunking, t15CorpusDatasheet,
      t16ChunkDedup, t17QualityClassifier, t18PplBuckets, t19BpePairs,
      t21DriftReport, t22Novelty, t23Readability, t24LexicalRichness,
      t25ZipfSlope, t26QualitySweep, t27DistinctiveTerms)
}

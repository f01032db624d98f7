package graft

import org.apache.spark.sql.functions._

/** Semantics gates for the corpus-curation operators (Curation.scala).
  * The oracle rows prove cross-engine agreement; these tests prove the
  * operators do what a pipeline needs them to do — redact actual PII
  * spans, flag actual contamination/repetition, keep strata non-empty —
  * on inputs crafted to exercise the interesting paths. */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pii redaction scrubs emails and ipv4 and counts them") {
    import spark.implicits._
    val df = Seq(
      "reach me at jane.doe+spam@corp.example.org or on 192.168.0.12 today",
      "no pii here at all",
      "two mails a@b.io c@d.net and ips 10.1.2.3 8.8.8.8").toDF("text")
    val redacted = df.select(
      regexp_count(col("text"), lit(graft.operators.Curation.emailRe)).as("ne"),
      regexp_count(col("text"), lit(graft.operators.Curation.ipRe)).as("ni"),
      regexp_replace(regexp_replace(col("text"),
        graft.operators.Curation.emailRe, "<EMAIL>"),
        graft.operators.Curation.ipRe, "<IP>").as("red"))
      .collect()
    assert(redacted(0).getInt(0) == 1 && redacted(0).getInt(1) == 1)
    assert(redacted(0).getString(2) ==
      "reach me at <EMAIL> or on <IP> today")
    assert(redacted(1).getInt(0) == 0 && redacted(1).getInt(1) == 0)
    assert(redacted(1).getString(2) == "no pii here at all")
    assert(redacted(2).getInt(0) == 2 && redacted(2).getInt(1) == 2)
    assert(redacted(2).getString(2) == "two mails <EMAIL> <EMAIL> and ips <IP> <IP>")
  }

  test("registered pii query plants and redacts deterministically") {
    val out = SparkEntry.queries("t06_pii_redact")(spark, sf)
    val rows = out.collect()
    assert(rows.length > 0)
    // every doc_id % 15 == 0 has both an email and an ip planted
    val both = rows.filter(r => r.getLong(0) % 15 == 0)
    assert(both.nonEmpty && both.forall(r => r.getInt(1) >= 1 && r.getInt(2) >= 1))
    val neither = rows.filter(r => r.getLong(0) % 3 != 0 && r.getLong(0) % 5 != 0)
    assert(neither.nonEmpty && neither.forall(r => r.getInt(1) == 0 && r.getInt(2) == 0))
  }

  test("decontamination flags the planted near-duplicates of bench docs") {
    // ground truth: d05's verified near-dup pairs that straddle the bench
    // boundary (one side in the md5-sampled benchmark set) must be flagged
    val bench = Tables.documents(spark, sf)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nearDup = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.5).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .filter { case (train, b) => bench.contains(b) && !bench.contains(train) }
      .map(_._1).toSet
    val flagged = SparkEntry.queries("x01_decontaminate")(spark, sf)
      .filter(col("contaminated") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    info(s"straddling near-dup train docs: ${nearDup.size}, flagged: ${flagged.size}")
    assert(nearDup.subsetOf(flagged),
      s"unflagged contaminated docs: ${nearDup.diff(flagged)}")
    // and bench docs themselves never appear in the training output
    assert(flagged.intersect(bench).isEmpty)
  }

  test("fuzzy decontamination scores containment and flags true near-copies") {
    val bench = Tables.documents(spark, sf)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("x04_decontaminate_fuzzy")(spark, sf).collect()
    assert(rows.nonEmpty)
    // benchmark docs never appear on the training side; containment ∈ [0,1]
    assert(rows.forall(r => !bench.contains(r.getLong(0))))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // best_bench, when present, is an actual benchmark doc
    assert(rows.filter(!_.isNullAt(1)).forall(r => bench.contains(r.getLong(1))))
    // containment(d,b) = |∩|/|shingles(d)| ≥ jaccard(d,b), so every
    // verified near-dup (d05 jaccard ≥ 0.5) straddling the bench boundary
    // must come out flagged (containment ≥ 0.5)
    val nearDup = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.5).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .filter { case (train, b) => bench.contains(b) && !bench.contains(train) }
      .map(_._1).toSet
    val flagged = rows.filter(_.getInt(4) == 1).map(_.getLong(0)).toSet
    info(s"straddling near-dup train docs: ${nearDup.size}, fuzzy-flagged: ${flagged.size}")
    assert(nearDup.subsetOf(flagged),
      s"near-copies not flagged: ${nearDup.diff(flagged)}")
    // and the fuzzy flag is strictly more precise than x01's any-overlap
    // flag: flagged ⊆ contaminated
    val anyOverlap = SparkEntry.queries("x01_decontaminate")(spark, sf)
      .filter(col("contaminated") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.subsetOf(anyOverlap))
  }

  test("stratified sample keeps every stratum at ~20%, deterministically") {
    val docs = Tables.documents(spark, sf)
    val strata = docs.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val out1 = SparkEntry.queries("x02_stratified_sample")(spark, sf)
    val got = out1.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every stratum present, sized exactly ceil(n * 0.2)
    strata.foreach { case (k, n) =>
      assert(got.getOrElse(k, 0L) == math.ceil(n * 0.2).toLong,
        s"stratum $k: n=$n sampled=${got.getOrElse(k, 0L)}")
    }
    // deterministic: a second run picks the identical doc set
    val ids1 = out1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = SparkEntry.queries("x02_stratified_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("domain mix weights flatten the source distribution") {
    val rows = SparkEntry.queries("x03_domain_mix")(spark, sf).collect()
    assert(rows.length > 1)
    // resampling by mix_weight equalizes mass: n_docs * weight is constant
    val masses = rows.map(r => r.getLong(1) * r.getDouble(3))
    assert(masses.max / masses.min < 1.001,
      s"weighted masses not flat: ${masses.toSeq}")
    // actual fractions sum to ~1
    val fracSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(fracSum - 1.0) < 0.01)
  }

  test("x07 cluster reps: reps are the longest member, members account for the corpus") {
    val reps = SparkEntry.queries("x07_cluster_reps")(spark, sf).collect()
    val clusters = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val nChars = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = clusters.groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1) }

    assert(reps.map(_.getLong(1)).sum == clusters.length.toLong,
      "member counts must account for every document exactly once")
    assert(reps.map(_.getLong(0)).toSet == byCluster.keySet,
      "one rep row per d03 cluster")
    reps.foreach { r =>
      val (cluster, n, rep) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val members = byCluster(cluster)
      assert(members.length.toLong == n, s"cluster $cluster member count")
      assert(members.contains(rep), s"rep $rep must be a member of $cluster")
      // rep is the argmax under (n_chars desc, doc_id asc)
      val best = members.map(m => (-nChars(m), m)).min._2
      assert(rep == best, s"cluster $cluster rep $rep != argmax $best")
    }
  }

  test("x08 temperature weights sum to 1 and compress the mix toward uniform") {
    val rows = SparkEntry.queries("x08_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights sum to 1")
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "shares sum to 1")
    // temperature sampling boosts rarer sources relative to common ones:
    // boost must be antitone in token share
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((sa, pa, _, ba), (sb, pb, _, bb)) if pa < pb =>
        assert(ba >= bb, s"boost($sa, p=$pa)=$ba < boost($sb, p=$pb)=$bb")
      case _ => ()
    }
    // and never flattens all the way: ordering of shares is preserved
    val byShare = rows.sortBy(_._2).map(_._1).toSeq
    val byWeight = rows.sortBy(_._3).map(_._1).toSeq
    assert(byShare == byWeight, "smoothing must preserve the size ordering")
  }

  test("repetition metrics rank a degenerate doc above normal corpus docs") {
    import spark.implicits._
    // crafted: a spam doc (one token repeated) vs a all-distinct doc
    val crafted = Seq(
      (1L, Seq.fill(50)("buy").mkString(" ")),
      (2L, (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val dir = tmpDir("curation-rep")
    crafted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("t07_repetition")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) > 0.9)   // dup_tok_frac
    assert(out(1L).getDouble(3) == 1.0)  // top_tok_share
    assert(out(1L).getDouble(4) == 1.0)  // top_bigram_share
    assert(out(2L).getDouble(2) == 0.0)
    assert(out(2L).getDouble(3) < 0.05)
  }

  test("x09 split is cluster-atomic with a sane eval fraction") {
    val rows = SparkEntry.queries("x09_leakage_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // every doc assigned exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    // cluster-atomic: a cluster never straddles the split boundary —
    // so no eval doc can have a near-duplicate (same d03 cluster) in train
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cid straddles the train/eval split")
    }
    // md5 first-hex-digit ∈ {0,1} targets 2/16 = 12.5%; allow slack for
    // cluster granularity at this corpus size
    val evalFrac = rows.count(_._3 == "eval").toDouble / rows.length
    assert(evalFrac > 0.04 && evalFrac < 0.30, s"eval fraction $evalFrac")
  }

  test("x11 bloom decontamination contains x01's exact set, bounded overshoot") {
    val exact = SparkEntry.queries("x01_decontaminate")(spark, sf)
      .filter(col("contaminated") === 1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val bloomed = SparkEntry.queries("x11_bloom_decontaminate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val flagged = bloomed.filter(_._2 == 1).keySet
    // no false negatives, ever — the bloom guarantee
    val missed = exact -- flagged
    assert(missed.isEmpty, s"bloom missed exact contamination: $missed")
    // same probe universe
    assert(bloomed.size >= exact.size)
    // false positives bounded: at this corpus/bench size the default
    // sketch should add at most a few percent of clean docs
    val fp = flagged -- exact
    assert(fp.size <= math.max(2, bloomed.size / 20),
      s"bloom over-flagged ${fp.size} of ${bloomed.size} docs")
  }

  test("x23 sketch admission tracks x20's exact sample within tolerance") {
    val exact = SparkEntry.queries("x20_dedup_aware_sample")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val sketch = SparkEntry.queries("x23_dedup_sample_sketch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getBoolean(3)))
    // same doc universe
    assert(sketch.map(_._1).toSet == exact.keySet)
    val total = sketch.length
    val sampled = sketch.filter(_._3).map(_._1).toSet
    // budget: approx_percentile(0.4, acc=10000) must land within 2% of
    // the exact 40% cut at this corpus size
    val budget = total * 2 / 5
    assert(math.abs(sampled.size - budget) <= math.max(3, total / 50),
      s"sketch admitted ${sampled.size} vs budget $budget of $total")
    // set agreement: symmetric difference with the exact sample bounded
    // by the sketch rank-error (docs whose admission key straddles the
    // estimated threshold)
    val exactSampled = exact.filter(_._2).keySet
    val symDiff = (sampled -- exactSampled) ++ (exactSampled -- sampled)
    assert(symDiff.size <= math.max(3, total / 50),
      s"sketch/exact sample sets diverge on ${symDiff.size} of $total docs")
    // threshold semantics: admission is downward-closed in the
    // (cluster_rank, pri) key order, so every sampled doc's rank tier
    // is <= every unsampled doc's tier (the cut tier may be split)
    val maxSampledRank = sketch.filter(_._3).map(_._2).max
    val minUnsampledRank = sketch.filterNot(_._3).map(_._2).min
    assert(minUnsampledRank >= maxSampledRank,
      s"admission not round-robin: sampled up to rank $maxSampledRank " +
        s"while rank $minUnsampledRank unsampled")
  }
}

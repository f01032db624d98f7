package graft

import org.apache.spark.sql.functions._

/** Dedup quality gate: MinHash+LSH clustering must co-cluster the pairs
  * that exact n-gram Jaccard verification (d05, oracle-matched) proves
  * are near-duplicates. Catches silent regressions in the signature/
  * banding parameters that a rows-only check can't see. */
class DedupQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH co-clusters strong Jaccard near-duplicates") {
    // ground truth: block-verified pairs with jaccard >= 0.5
    val strong = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strong.nonEmpty, "corpus must contain planted near-duplicates")

    val cluster = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val caught = strong.count { case (a, b) => cluster(a) == cluster(b) }
    val rate = caught.toDouble / strong.length
    info(f"minhash catch rate on jaccard>=0.5 pairs: $rate%.2f (${strong.length} pairs)")
    assert(rate >= 0.8, f"minhash missed too many true near-dups: $rate%.2f")
  }

  test("d13 recovers a planted shared substring exactly (span + offsets)") {
    val s = spark
    import s.implicits._
    // 30 unique filler tokens per doc, with a 20-token run planted in
    // doc 1 at token position 6 and in doc 2 at position 11 — the span
    // finder must report exactly (20, 6, 11) and nothing longer.
    val shared = (1 to 20).map(i => s"shared$i").mkString(" ")
    def filler(doc: Int, n: Int, from: Int) =
      (from until from + n).map(i => s"f${doc}x$i").mkString(" ")
    val doc1 = filler(1, 5, 0) + " " + shared + " " + filler(1, 5, 5)
    val doc2 = filler(2, 10, 0) + " " + shared + " " + filler(2, 10, 10)
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val spans = operators.Dedup.lcsSpans(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(spans.toSeq == Seq((1L, 2L, 20L, 6L, 11L)),
      s"expected exactly the planted span, got ${spans.toSeq}")
  }

  test("simhash fingerprints of near-duplicates are Hamming-close") {
    val strong = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.5).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = SparkEntry.queries("d04_dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dists = strong.map { case (a, b) =>
      sh(a).zip(sh(b)).count { case (x, y) => x != y }
    }
    info(s"simhash hamming distances for near-dup pairs: ${dists.toSeq.sorted.mkString(",")}")
    assert(dists.forall(_ <= 16),
      s"near-dup pairs should be within 16/64 bits, got ${dists.toSeq}")
  }

  test("minhash cluster labels are transitive across a bucket chain") {
    // Build A~B~C where A and C share NO band bucket: the hash family is
    // deterministic, so search perturbation offsets until the premise
    // holds, then assert the fixpoint unites the full chain (a single
    // propagation pass would leave C labeled B).
    import spark.implicits._
    def doc(k: Int, changed: Map[Int, String]): String =
      Seq.tabulate(40)(i => changed.getOrElse(i, s"w${k}_$i")).mkString(" ")
    val found = (0 until 60).iterator.map { k =>
      val a = doc(k, Map.empty)
      val b = doc(k, (18 to 23).map(i => i -> s"x$i").toMap)
      val c = doc(k, ((18 to 23).map(i => i -> s"x$i") ++
        (6 to 11).map(i => i -> s"y$i")).toMap)
      val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      val bands = graft.operators.Dedup.minhashBands(docs)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val byDoc = bands.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (k, docs, byDoc(1L) & byDoc(2L), byDoc(2L) & byDoc(3L), byDoc(1L) & byDoc(3L))
    }.find { case (_, _, ab, bc, ac) => ab.nonEmpty && bc.nonEmpty && ac.isEmpty }
    assert(found.nonEmpty, "no offset produced an A~B~C chain with A,C disjoint")
    val (k, docs, _, _, _) = found.get
    info(s"chain premise satisfied at offset $k")
    val labels = graft.operators.Dedup.minhashClusters(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"chain must collapse to one cluster, got $labels")
  }

  test("d10 incremental matches agree with d03's clustering") {
    // sharing a band is an edge in d03's candidate graph, so every
    // (new doc, matched corpus doc) pair must land in the same connected
    // component — the incremental probe can never cross-match clusters
    val matches = SparkEntry.queries("d10_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cluster = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(matches.nonEmpty, "the sf0.001 corpus has near-dup band collisions")
    matches.foreach { case (doc, m) =>
      assert(doc % 7 == 0 && m % 7 != 0, s"batch split violated: ($doc, $m)")
      assert(cluster(doc) == cluster(m),
        s"new $doc matched $m across clusters ${cluster(doc)} vs ${cluster(m)}")
    }
  }

  test("d12: minhash estimate tracks exact Jaccard within the k=32 envelope") {
    val rows = operators.Dedup.d12MinhashCalibration
      .run(spark, sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (j, est, err) =>
      assert(est >= 0.0 && est <= 1.0, s"estimate out of range: $est")
      assert(math.abs(math.abs(est - j) - err) <= 1e-9,
        s"err column inconsistent: |$est - $j| vs $err")
      // per-pair bound: 4 std devs of the k=32 binomial estimator, floored
      // at one signature step (1/32) — catches a broken hash family or a
      // sign flip without being flaky on legitimate estimator variance
      val bound = math.max(4.0 * math.sqrt(j * (1 - j) / 32.0), 1.0 / 32.0 + 1e-9)
      assert(err <= bound, s"pair error $err exceeds envelope $bound (J=$j)")
    }
    // the planted strong near-dups (J ≳ 0.9) must estimate high too —
    // the calibration's whole point is that banding params derived from
    // these estimates would keep catching them
    rows.filter(_._1 >= 0.9).foreach { case (j, est, _) =>
      assert(est >= 0.75, s"strong pair J=$j estimated at only $est")
    }
  }
}

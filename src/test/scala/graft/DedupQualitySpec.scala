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

  test("simhash fingerprints of near-duplicates are Hamming-close") {
    val strong = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.5).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = SparkEntry.queries("d04_dedup_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dists = strong.map { case (a, b) =>
      java.lang.Long.bitCount(sh(a) ^ sh(b))
    }
    info(s"simhash hamming distances for near-dup pairs: ${dists.toSeq.sorted.mkString(",")}")
    assert(dists.forall(_ <= 16),
      s"near-dup pairs should be within 16/64 bits, got ${dists.toSeq}")
  }
}

package graft

import org.apache.spark.sql.functions._

/** ANN quality gate: the LSH and IVF approximate paths must reach a
  * minimum recall@10 against the exact brute-force ranking — catches
  * silent quality regressions in bucketing/probing parameters that a
  * rows-only correctness check can't see. */
class RecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def topk(name: String): Map[(Long, Long), Int] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> 1).toMap

  test("LSH and IVF ANN recall@10 vs exact brute force") {
    val exact = topk("s01_sim_topk")
    assert(exact.nonEmpty)
    val lsh = topk("s02_sim_ann_lsh")
    val ivf = topk("s03_sim_ann_ivf")
    val lshRecall = exact.keys.count(lsh.contains).toDouble / exact.size
    val ivfRecall = exact.keys.count(ivf.contains).toDouble / exact.size
    info(f"recall@10 — lsh: $lshRecall%.2f, ivf: $ivfRecall%.2f")
    // 8-bit LSH on 500 vectors is a coarse prefilter; IVF probes 4/16
    // cells. Floors are deliberately modest but non-trivial.
    assert(ivfRecall >= 0.5, f"IVF recall collapsed: $ivfRecall%.2f")
    assert(lshRecall >= 0.1, f"LSH recall collapsed: $lshRecall%.2f")
  }

  test("PQ+ADC ANN recall@10 vs exact brute force") {
    val exact = topk("s01_sim_topk")
    val pq = topk("s04_sim_ann_pq")
    val recall = exact.keys.count(pq.contains).toDouble / exact.size
    info(f"recall@10 — pq(adc, rerank=64): $recall%.2f")
    // 8×4-bit codes quantize hard, but the 64-candidate exact re-rank
    // recovers the true neighbors the ADC scan surfaces.
    assert(recall >= 0.5, f"PQ recall collapsed: $recall%.2f")
  }
}

package graft

import graft.operators.IngestArtifacts
import org.apache.spark.sql.functions._

/** The ingest-artifact contract (round 13): artifacts are keyed by a
  * corpus CONTENT fingerprint, not just its path — a corpus regenerated
  * in place recomputes instead of silently serving stale fits/labels —
  * and publication is crash-safe: a table dir without _SUCCESS (crashed
  * or non-atomic producer) is repaired, never read. */
class IngestArtifactsSpec extends SparkSpec {

  private def writeCorpus(dir: String, tag: String): Unit =
    spark.range(100)
      .select(col("id"), concat(lit(tag), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("unchanged corpus cache-hits; in-place mutation recomputes") {
    val corpus = tmpDir("ia-corpus")
    writeCorpus(corpus, "alpha-")
    var computes = 0
    def art() = IngestArtifacts.readOrCreate(spark, corpus, "probe.parquet") {
      computes += 1
      spark.read.parquet(s"$corpus/documents.parquet")
        .agg(sum(length(col("text"))).as("total_len")).coalesce(1)
    }
    val v1 = art().collect()(0).getLong(0)
    val v1Again = art().collect()(0).getLong(0)
    assert(computes == 1, "unchanged corpus must serve the cached artifact")
    assert(v1 == v1Again)

    // regenerate the corpus IN PLACE at the same path — different
    // content length guarantees a new (length, mtime) fingerprint even
    // on a coarse-mtime filesystem
    Thread.sleep(10)
    writeCorpus(corpus, "a-much-longer-beta-tag-")
    val v2 = art().collect()(0).getLong(0)
    assert(computes == 2,
      "mutated corpus must land at a new fingerprint and recompute")
    assert(v2 != v1, "recomputed artifact must reflect the new corpus")
    // and the refreshed corpus cache-hits from then on
    art()
    assert(computes == 2)
  }

  test("a table dir without _SUCCESS is repaired, not read") {
    val corpus = tmpDir("ia-crash")
    writeCorpus(corpus, "gamma-")
    var computes = 0
    def art() = IngestArtifacts.readOrCreate(spark, corpus, "probe.parquet") {
      computes += 1
      spark.range(3).select(col("id"), lit(computes).as("gen")).coalesce(1)
    }
    assert(art().agg(max("gen")).collect()(0).getInt(0) == 1)
    // simulate a crashed producer: the table exists but the marker is
    // gone (the shape a non-atomic s3a rename or a mid-write kill leaves)
    val marker = new java.io.File(
      IngestArtifacts.path(corpus, "probe.parquet"), "_SUCCESS")
    assert(marker.exists())
    assert(marker.delete())
    val repaired = art()
    assert(computes == 2, "a partial (no _SUCCESS) artifact must recompute")
    assert(marker.exists(), "repair must republish the _SUCCESS marker")
    assert(repaired.agg(max("gen")).collect()(0).getInt(0) == 2,
      "the repaired table must carry the fresh computation")
  }
}

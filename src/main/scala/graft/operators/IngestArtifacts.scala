package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared persistence for INGEST-TIME ARTIFACTS — the tables a corpus
  * carries beside its data: ANN fits (IVF centroids, PQ codebooks —
  * Similarity) and near-dup cluster labels (d03 — Dedup). Each is
  * computed once when data lands, written as a tiny parquet table, and
  * READ by every query-path consumer; per-JVM memo maps are only caches
  * over the table, so a second session (or a second driver on a
  * cluster) finds the artifact instead of re-computing.
  *
  * Every producer here is a PURE FUNCTION of the corpus (deterministic
  * integer k-means, md5-seeded minhash banding), so artifact and
  * re-compute are bit-identical — which is what lets the DuckDB oracles
  * keep replaying the computations from the raw corpus while the engine
  * serves from the table.
  *
  * In production the artifact root lives NEXT TO the corpus (s3a://…);
  * the sandbox corpus dirs are read-only, so the default root maps each
  * data dir to a stable sibling under java.io.tmpdir — override with
  * SPARK_GRAFT_ARTIFACTS. Producers encode their parameters in the
  * table name, so a constant bump can never read a stale layout.
  *
  * Publication is write-to-unique-temp + rename-into-place: concurrent
  * producers (two sessions in one JVM — serialized by the lock — or two
  * cold-starting JVMs) never write the same path; a loser deletes its
  * temp and reads the winner's table (harmless — same rows). */
object IngestArtifacts {
  private val lock = new Object

  def path(d: String, table: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
      s"${System.getProperty("java.io.tmpdir")}/graft-artifacts")
    s"$root/${d.replaceAll("[^A-Za-z0-9._-]", "_")}/$table"
  }

  /** Read `table` under `d`'s artifact dir; on a miss, materialize it
    * with `compute` (write-then-reread — consumers always read the
    * artifact, so the ingest and query paths cannot drift apart). */
  def readOrCreate(s: SparkSession, d: String, table: String)(
      compute: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path(d, table))
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    lock.synchronized {
      if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) {
        val tmp = new org.apache.hadoop.fs.Path(
          s"$p.tmp-${java.util.UUID.randomUUID}")
        compute.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(p) || !fs.rename(tmp, p)) fs.delete(tmp, true)
      }
    }
    s.read.parquet(p.toString)
  }
}

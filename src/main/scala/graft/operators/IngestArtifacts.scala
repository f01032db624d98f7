package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared persistence for INGEST-TIME ARTIFACTS — the tables a corpus
  * carries beside its data: ANN fits (IVF centroids, PQ codebooks, SQ8
  * min/max — Similarity) and near-dup cluster labels (d03 — Dedup).
  * Each is computed once when data lands, written as a tiny parquet
  * table, and READ by every query-path consumer; per-JVM memo maps are
  * only caches over the table, so a second session (or a second driver
  * on a cluster) finds the artifact instead of re-computing.
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
  * SPARK_GRAFT_ARTIFACTS. Staleness is impossible on BOTH axes: fit
  * parameters ride in the table name (a constant bump can never read a
  * stale layout), and a cheap corpus content fingerprint (file names +
  * lengths + mtimes, round 13) rides in the directory name — a corpus
  * regenerated IN PLACE lands at a new fingerprint and recomputes
  * instead of silently serving the old corpus's fits/labels. Consumers'
  * per-JVM memo maps key by [[memoKey]] (which folds in the same
  * fingerprint), so an in-place refresh also invalidates live sessions,
  * not just the on-disk path.
  *
  * Publication is write-to-unique-temp + rename-into-place, hardened
  * (round 13) against the cross-JVM failure shapes the per-JVM lock
  * cannot cover: (1) a table dir WITHOUT _SUCCESS (crashed producer, or
  * a non-atomic rename on the documented s3a prod target) is treated as
  * corrupt — deleted and re-published, not read; (2) a rename that
  * lands AFTER a concurrent winner published (HDFS rename onto an
  * existing dir nests the temp INSIDE it) is cleaned up by checking for
  * the nested path after every rename, and the attempt retried.
  * readOrCreate either returns a _SUCCESS-marked table or throws; it
  * never reads a partial. Residual documented divergence: two JVMs
  * racing the repair path have a microseconds-wide window where one can
  * delete the other's just-published table before republishing it —
  * producers are pure functions, so the content converges bit-identical
  * and the only exposure is a transient read failure in a third session
  * during the window; closing it entirely would need an external lock
  * service, which the reference (a single-process daemon) does not have
  * either. */
object IngestArtifacts {
  private val lock = new Object

  /** Cheap corpus content fingerprint: (relative path, length, mtime) of
    * every file under `d`, order-normalized and folded into 64 bits.
    * Catches in-place regeneration (new lengths/mtimes) without reading
    * any data bytes — one recursive listing, so it is safe to evaluate
    * on every artifact access rather than memoize (a memo would blind
    * the very staleness check this exists to provide). */
  private[graft] def fingerprint(
      d: String, conf: Configuration = new Configuration()): String = {
    val p = new Path(d)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return "absent"
    val base = fs.makeQualified(p).toString
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      entries += ((st.getPath.toString.stripPrefix(base),
        st.getLen, st.getModificationTime))
    }
    val h = entries.sortBy(_._1).foldLeft(1125899906842597L) {
      case (acc, (name, len, mtime)) =>
        ((acc * 31 + name.hashCode) * 31 + len) * 31 + mtime
    }
    f"$h%016x"
  }

  def path(d: String, table: String,
      conf: Configuration = new Configuration()): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
      s"${System.getProperty("java.io.tmpdir")}/graft-artifacts")
    s"$root/${d.replaceAll("[^A-Za-z0-9._-]", "_")}-${fingerprint(d, conf)}/$table"
  }

  /** Key for per-JVM memo maps layered over artifacts (Similarity's
    * fit caches, Dedup's label cache): folds in the corpus fingerprint
    * so an in-place corpus regeneration invalidates the live-session
    * memo too — the on-disk path alone only protects NEW sessions. */
  def memoKey(s: SparkSession, d: String): (SparkSession, String, String) =
    (s, d, fingerprint(d, s.sessionState.newHadoopConf()))

  /** Read `table` under `d`'s artifact dir; on a miss, materialize it
    * with `compute` (write-then-reread — consumers always read the
    * artifact, so the ingest and query paths cannot drift apart). */
  def readOrCreate(s: SparkSession, d: String, table: String)(
      compute: => DataFrame): DataFrame = {
    val conf = s.sessionState.newHadoopConf()
    val p = new Path(path(d, table, conf))
    val fs = p.getFileSystem(conf)
    def published() = fs.exists(new Path(p, "_SUCCESS"))
    lock.synchronized {
      var attempts = 0
      while (!published() && attempts < 3) {
        attempts += 1
        // exists-without-_SUCCESS is a corrupt partial (crashed or
        // non-atomic producer): repair by removal, never read it
        if (fs.exists(p)) fs.delete(p, true)
        val tmp = new Path(s"$p.tmp-${java.util.UUID.randomUUID}")
        compute.write.mode("overwrite").parquet(tmp.toString)
        if (!fs.rename(tmp, p)) {
          // lost a cross-JVM race (or FS refused): drop the temp; the
          // loop re-checks whether a winner published a valid table
          fs.delete(tmp, true)
        } else {
          // A rename that returns true can still have landed INSIDE a
          // concurrently-published p (HDFS renames onto an existing dir
          // by moving the source into it). Always sweep the nested
          // path: if our temp is inside the winner's table it would
          // corrupt their reads, whether or not their marker is up yet.
          val nested = new Path(p, tmp.getName)
          if (fs.exists(nested)) fs.delete(nested, true)
        }
      }
      if (!published())
        throw new IllegalStateException(
          s"artifact publication failed after $attempts attempts: $p")
    }
    s.read.parquet(p.toString)
  }
}

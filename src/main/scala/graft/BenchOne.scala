package graft

/** Times the named queries only (`runMain graft.BenchOne d08... q01...`) —
  * the single-operator feedback loop used while iterating on a plan, with
  * the same session config and noop-sink materialization as Bench.
  *
  * The pseudo-name `_fit_ivf` times the ingest-time IVF k-means fit
  * ITSELF (IntKMeans.fit, bypassing the artifact/memo caches): normal
  * query timings exclude `prepare`, so the fit's own corpus-linear cost
  * claim needs this dedicated row (docs/SCALE_PROBE.md).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.prepare(spark, sfDir)
    args.foreach {
      case "_calib" =>
        // the Bench calibration probe timed LIVE, so diff_bench --rerun
        // can normalize a re-timed query by the host load at rerun time
        // instead of the stale capture-time weather factor
        val t0 = System.nanoTime()
        spark.range(50000000L).selectExpr("id % 1000 as k", "id as v")
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
          .write.format("noop").mode("overwrite").save()
        println(f"[benchone] _calib ${(System.nanoTime() - t0) / 1e9}%.2fs")
      case "_fit_ivf" =>
        // the s03/s13/s15 coarse-quantizer fit (Gonzalez init = k-1
        // bounded argmaxes + exact-integer Lloyd rounds over the full
        // corpus) — timed fresh, not through the persisted artifact.
        // The configuration is read FROM Similarity's constants so the
        // probe always times the shipped fit, not a stale copy.
        import org.apache.spark.sql.functions._
        import graft.operators.Similarity.{Dim, LloydRounds, NList}
        val t0 = System.nanoTime()
        val sub = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), lit(0).as("m"),
            col("embedding").cast("array<double>").as("e"))
        graft.operators.IntKMeans.fit(sub, nSub = 1, k = NList,
          rounds = LloydRounds, dim = Dim)
        println(f"[benchone] _fit_ivf ${(System.nanoTime() - t0) / 1e9}%.2fs")
      case name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[benchone] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    // Warm the session (codegen compiler, shuffle machinery, FS client)
    // so per-query numbers measure the query, not JVM/session init.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    SparkEntry.prepare(spark, sfDir) // ingest-time artifacts (IVF model)
    // optional args = query-name prefixes for targeted local timing;
    // the driver passes none and benches everything
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    val results = wanted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Materialize through the noop sink, not count(): count() lets
      // Catalyst prune every projected column, so a pure-projection query
      // would be timed as "parquet scan + count" with the expressions it
      // claims to measure optimized away. The noop DSv2 sink evaluates
      // every output column and discards rows executor-side.
      // a failed query reports -1, not its (meaningless) time-to-failure
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

/** Times the named queries only (`runMain graft.BenchOne d08... q01...`) —
  * the single-operator feedback loop used while iterating on a plan, with
  * the same session config and noop-sink materialization as Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.prepare(spark, sfDir)
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[benchone] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}

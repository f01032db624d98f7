package graft

import org.apache.spark.sql.functions._

/** Scratch equivalence probe for the q91 histogram rewrite (r15) — not
  * part of the driver surface; deleted after use. */
object ScratchQ91 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.1)
    // raw forms
    val rawCols = count(lit(1)).as("n") +:
      ps.zipWithIndex.flatMap { case (p, i) => Seq(
        expr(s"percentile_cont($p) WITHIN GROUP (ORDER BY l_extendedprice)").as(s"c$i"),
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY l_extendedprice)").as(s"d$i")) }
    val raw = li.groupBy("l_returnflag").agg(rawCols.head, rawCols.tail: _*)
    // histogram forms
    val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val contCols = sum("cnt").as("n") +:
      ps.zipWithIndex.map { case (p, i) =>
        expr(s"percentile(v, $p, cnt)").as(s"c$i") }
    val contH = hist.groupBy("l_returnflag")
      .agg(contCols.head, contCols.tail: _*)
    val w = Window.partitionBy("l_returnflag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist.withColumn("rs", sum("cnt").over(w))
      .withColumn("tot", sum("cnt").over(wAll))
    val discH = cum.groupBy("l_returnflag").agg(
      ps.zipWithIndex.map { case (p, i) =>
        min(when(col("rs").cast("double") / col("tot").cast("double") >= p,
          col("v"))).as(s"d$i") }.head,
      ps.zipWithIndex.map { case (p, i) =>
        min(when(col("rs").cast("double") / col("tot").cast("double") >= p,
          col("v"))).as(s"d$i") }.tail: _*)
    println("=== RAW ===");   raw.orderBy("l_returnflag").show(false)
    println("=== CONT-HIST ==="); contH.orderBy("l_returnflag").show(false)
    println("=== DISC-HIST ==="); discH.orderBy("l_returnflag").show(false)

    // exact-boundary synthetic: values 1..10 once each, p=0.9 must hit 9
    import spark.implicits._
    val syn = (1 to 10).map(i => ("g", i.toDouble)).toDF("g", "v")
    syn.createOrReplaceTempView("syn")
    spark.sql("SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS d," +
      " percentile_cont(0.9) WITHIN GROUP (ORDER BY v) AS c FROM syn").show()
    val synHist = syn.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    synHist.withColumn("rs", sum("cnt").over(wc))
      .withColumn("tot", sum("cnt").over(wt))
      .groupBy("g")
      .agg(min(when(col("rs").cast("double") / col("tot").cast("double")
        >= 0.9, col("v"))).as("d_hist"),
        expr("percentile(v, 0.9, cnt)").as("c_hist"))
      .show()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Diagnostic: for the named queries, report whether repeated scan
  * subtrees in the printed plan actually EXECUTE repeatedly, or are
  * deduplicated by exchange/stage reuse at runtime. Prints per-query:
  * file-scan leaf count, ReusedExchange count, and each scan leaf's
  * numOutputRows metric after a collect(). */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      def finalPlan(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      var scans = List.empty[(String, Long)]
      var reused = 0
      def walk(p: SparkPlan): Unit = {
        p match {
          case r: ReusedExchangeExec => reused += 1
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case leaf if leaf.children.isEmpty
              && leaf.getClass.getSimpleName.contains("FileSourceScan") =>
            scans ::= (leaf.toString.linesIterator.next().take(80),
              leaf.metrics.get("numOutputRows").map(_.value).getOrElse(-1L))
          case _ =>
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(finalPlan(df.queryExecution.executedPlan))
      println(s"== $name: fileScans=${scans.size} reusedExchange=$reused")
      scans.reverse.foreach { case (s, n) => println(f"   rows=$n%8d  $s") }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant lab for the q73 PageRank loop: times the edge build and the
  * 8-round iteration under different join/agg shapes, and prints the
  * round-1 physical plan so exchange placement is visible.
  * Usage: runMain graft.GraphProbe [variant ...]   (default: all)
  */
object GraphProbe {
  private def materialize(s: SparkSession, df: DataFrame): DataFrame = {
    val out = s.createDataFrame(df.rdd, df.schema).persist()
    out.count()
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Bench.session()
    s.range(1000000).selectExpr("sum(id)").collect()
    val variants = if (args.nonEmpty) args.toSeq else Seq("edges", "v1", "v2")

    def buildEdges(): (DataFrame, DataFrame, Long) = {
      val li = Tables.lineitem(s, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst0"))
        .groupBy("src").agg(collect_set(col("dst0")).as("nbrs"))
        .select(col("src"), explode(col("nbrs")).as("dst"),
          size(col("nbrs")).cast("long").as("deg"))
        .persist()
      val nodes = e.select(col("src").as("node")).distinct().persist()
      val n = nodes.count()
      (e, nodes, n)
    }

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[graphprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.gc()
    }

    variants.foreach {
      case "edges" =>
        time("edge_build") {
          val (e, nodes, _) = buildEdges()
          e.unpersist(); nodes.unpersist()
        }
      case "join_only" =>
        val li = Tables.lineitem(s, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        time("join_only") {
          li.as("a").join(li.as("b"),
              col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
            .select(col("a.p").as("src"), col("b.p").as("dst0"))
            .write.format("noop").mode("overwrite").save()
        }
      case "join_agg" =>
        val li = Tables.lineitem(s, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        time("join_agg") {
          li.as("a").join(li.as("b"),
              col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
            .select(col("a.p").as("src"), col("b.p").as("dst0"))
            .groupBy("src").agg(collect_set(col("dst0")).as("nbrs"))
            .write.format("noop").mode("overwrite").save()
        }
      case "join_agg_explode" =>
        val li = Tables.lineitem(s, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        time("join_agg_explode") {
          li.as("a").join(li.as("b"),
              col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
            .select(col("a.p").as("src"), col("b.p").as("dst0"))
            .groupBy("src").agg(collect_set(col("dst0")).as("nbrs"))
            .select(col("src"), explode(col("nbrs")).as("dst"),
              size(col("nbrs")).cast("long").as("deg"))
            .write.format("noop").mode("overwrite").save()
        }
      case "ordersets" => // per-order sets -> directed pair explode -> adjacency
        val li = Tables.lineitem(s, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        time("ordersets") {
          li.groupBy("ok").agg(collect_set(col("p")).as("ps"))
            .select(explode(expr(
              "flatten(transform(ps, x -> transform(" +
                "filter(ps, y -> y != x), y -> struct(x as src, y as dst0))))"))
              .as("pr"))
            .select(col("pr.src").as("src"), col("pr.dst0").as("dst0"))
            .groupBy("src").agg(collect_set(col("dst0")).as("nbrs"))
            .select(col("src"), explode(col("nbrs")).as("dst"),
              size(col("nbrs")).cast("long").as("deg"))
            .write.format("noop").mode("overwrite").save()
        }
      case "arraysets" => // batch the agg: per-order neighbor arrays,
        // collect_list of arrays (600k items, not 2.4M), row-local
        // flatten + array_distinct
        val li = Tables.lineitem(s, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        time("arraysets") {
          li.groupBy("ok").agg(collect_set(col("p")).as("ps"))
            .select(explode(expr("transform(ps, x -> struct(x as src, " +
              "filter(ps, y -> y != x) as others))")).as("pr"))
            .select(col("pr.src").as("src"), col("pr.others").as("others"))
            .groupBy("src").agg(collect_list(col("others")).as("ls"))
            .select(col("src"),
              array_distinct(flatten(col("ls"))).as("nbrs"))
            .select(col("src"), explode(col("nbrs")).as("dst"),
              size(col("nbrs")).cast("long").as("deg"))
            .write.format("noop").mode("overwrite").save()
        }
      case "edges_hash" =>
        s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "16777216")
        time("edge_build_hash") {
          val (e, nodes, _) = buildEdges()
          e.unpersist(); nodes.unpersist()
        }
        s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          "128")
      case "v1" => // current shipped shape: shuffle_hash + broadcast join
        val (e, nodes, n) = buildEdges()
        time("v1_loop") {
          var ranks = materialize(s, nodes.select(col("node"),
            lit(1000000000000L / n).as("r")))
          var lastMat = ranks
          for (it <- 1 to 8) {
            val contrib = e.join(ranks.hint("shuffle_hash"),
                col("src") === col("node"))
              .select(col("dst"), expr("r div deg").as("c"))
              .groupBy("dst").agg(sum("c").as("in_sum"))
            val next = nodes.join(contrib.hint("broadcast"),
                col("node") === col("dst"), "left")
              .select(col("node"),
                (lit(150000000000L / n) +
                  expr("(85 * coalesce(in_sum, 0L)) div 100")).as("r"))
            if (it == 1) next.explain("formatted")
            if (it % 2 == 0 || it == 8) {
              ranks = materialize(s, next)
              lastMat.unpersist(); lastMat = ranks
            } else ranks = next
          }
          ranks.write.format("noop").mode("overwrite").save()
          lastMat.unpersist()
        }
        e.unpersist(); nodes.unpersist()
      case "v2" => // union + single agg: no broadcast, no per-round collect
        val (e, nodes, n) = buildEdges()
        time("v2_loop") {
          var ranks = materialize(s, nodes.select(col("node"),
            lit(1000000000000L / n).as("r")))
          var lastMat = ranks
          for (it <- 1 to 8) {
            val contrib = e.join(ranks.hint("shuffle_hash"),
                col("src") === col("node"))
              .select(col("dst"), expr("r div deg").as("c"))
            val next = contrib
              .unionByName(nodes.select(col("node").as("dst"),
                lit(0L).as("c")))
              .groupBy("dst").agg(sum("c").as("in_sum"))
              .select(col("dst").as("node"),
                (lit(150000000000L / n) +
                  expr("(85 * in_sum) div 100")).as("r"))
            if (it == 1) next.explain("formatted")
            if (it % 2 == 0 || it == 8) {
              ranks = materialize(s, next)
              lastMat.unpersist(); lastMat = ranks
            } else ranks = next
          }
          ranks.write.format("noop").mode("overwrite").save()
          lastMat.unpersist()
        }
        e.unpersist(); nodes.unpersist()
      case other => println(s"[graphprobe] unknown variant $other")
    }
    s.stop()
  }
}

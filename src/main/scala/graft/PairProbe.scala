package graft

import org.apache.spark.sql.functions._

/** A/B probe for the co-purchase pair builder that every Graph-family
  * query opens with: (A) the lineitem self-join on l_orderkey +
  * countDistinct, vs (B) per-order collect_set + row-local pair explode +
  * count. Same result set by construction (sets dedup (ok, p); per-order
  * pairs are then distinct, so count(*) == countDistinct(ok)).
  * Usage: runMain graft.PairProbe [reps]
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = Bench.session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))

    def a() = li.as("a").join(li.hint("shuffle_hash").as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(countDistinct(col("a.ok")).as("n_ord"))
      .filter(col("n_ord") >= 2)

    def b() = {
      val sets = li.groupBy("ok")
        .agg(sort_array(collect_set(col("p"))).as("ps"))
      val prs = sets.select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, " +
          "size(ps) - i - 1), y -> struct(x as u, y as v))))")).as("pr"))
      prs.groupBy(col("pr.u").as("u"), col("pr.v").as("v"))
        .agg(count(lit(1)).as("n_ord"))
        .filter(col("n_ord") >= 2)
    }

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[pairprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      System.gc()
    }
    // equality check first: same (u, v, n_ord) multiset
    val diff = a().unionByName(b()).groupBy("u", "v", "n_ord")
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    println(s"[pairprobe] rows-disagreeing=$diff")
    (1 to reps).foreach { _ => time("A_selfjoin", a _); time("B_sets", b _) }
    spark.stop()
  }
}

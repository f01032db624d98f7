package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.connectors.ArchiveSource

/** Generative end-to-end proof of the archive source's aggregate
  * pushdown (ArchiveAggScan's O(1) residue-class count/min/max per
  * split): for RANDOM table sizes, split counts, id-range bounds, and
  * type filters, the pushed aggregate must equal a brute-force fold of
  * the row FORMULA computed in plain Scala — a referee even more
  * independent than the row-scan path (which shares the source's
  * stepped readers; the formula itself is the thing oracle-verified by
  * q125's generate_series replay).
  *
  * LimitRangesSpec proves the limit PLANNER generatively at the
  * function level; this spec closes the remaining pushdown rungs
  * end-to-end, where an off-by-one in countLe/kthMatch range
  * intersection, a boundary split misread, or an invented empty group
  * would actually surface. The plan is asserted to contain
  * ArchiveAggScan each sample so a silent fallback to the row path
  * can't satisfy the property. */
class ArchiveAggPropertySpec extends SparkSpec {

  private def typeOf(id: Long): String =
    ArchiveSource.types(ArchiveSource.typeIdxOf(id))

  private val cfgGen = for {
    rows <- Gen.choose(1L, 4000L)
    parts <- Gen.choose(1, 9)
    lo <- Gen.choose(-100L, 4100L)
    len <- Gen.choose(0L, 4200L)
    tpe <- Gen.option(Gen.oneOf(ArchiveSource.types.toSeq))
  } yield (rows, parts, lo, lo + len, tpe)

  test("property: pushed grouped count/min/max == plain-Scala formula fold") {
    val s = spark
    val prop = Prop.forAllNoShrink(cfgGen) {
      case (rows, parts, lo, hi, tpe) =>
        var df = s.read.format("graft.connectors.ArchiveSource")
          .option("rows", rows.toString).option("parts", parts.toString)
          .load()
          .filter(col("event_id") >= lo && col("event_id") < hi)
        tpe.foreach(t => df = df.filter(col("event_type") === t))
        val agg = df.groupBy("event_type")
          .agg(count(lit(1)).as("n"), min("event_id").as("lo"),
            max("event_id").as("hi"))
        val plan = agg.queryExecution.executedPlan.toString
        val got = agg.collect()
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val ids = (math.max(0L, lo) until math.min(rows, hi))
          .filter(id => tpe.forall(_ == typeOf(id)))
        val want = ids.groupBy(typeOf)
          .map { case (t, xs) => t -> (xs.length.toLong, xs.min, xs.max) }
        val pushed = plan.contains("ArchiveAggScan")
        if (!pushed || got != want)
          println(s"agg mismatch rows=$rows parts=$parts [$lo,$hi) " +
            s"tpe=$tpe pushed=$pushed\n  got=$got\n  want=$want")
        pushed && got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: pushed top-N == plain-Scala formula order, end to end") {
    val s = spark
    val gen = for {
      (rows, parts, lo, hi, tpe) <- cfgGen
      n <- Gen.choose(1, 50)
      desc <- Gen.oneOf(true, false)
    } yield (rows, parts, lo, hi, tpe, n, desc)
    val prop = Prop.forAllNoShrink(gen) {
      case (rows, parts, lo, hi, tpe, n, desc) =>
        var df = s.read.format("graft.connectors.ArchiveSource")
          .option("rows", rows.toString).option("parts", parts.toString)
          .load()
          .filter(col("event_id") >= lo && col("event_id") < hi)
        tpe.foreach(t => df = df.filter(col("event_type") === t))
        val q = df.orderBy(if (desc) col("event_id").desc
          else col("event_id").asc).limit(n).select("event_id")
        val got = q.collect().map(_.getLong(0)).toSeq
        val ids = (math.max(0L, lo) until math.min(rows, hi))
          .filter(id => tpe.forall(_ == typeOf(id)))
        val want = (if (desc) ids.sorted.reverse else ids.sorted).take(n)
        if (got != want)
          println(s"topN mismatch rows=$rows parts=$parts [$lo,$hi) " +
            s"tpe=$tpe n=$n desc=$desc\n  got=$got\n  want=$want")
        got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}

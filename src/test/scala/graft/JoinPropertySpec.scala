package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.AsOf

/** Generative proof of the native custom joins (graft.plans
  * .AsOfJoinExec / BandJoinExec) — the riskiest code in the repo: a
  * hand-written co-partitioned merge inside a custom SparkPlan, where
  * an off-by-one in the two-pointer walk, a tie mishandled at a
  * partition-internal boundary, or a row dropped at a key change would
  * be invisible to the example-based edge tests if the example never
  * lands on the broken seam.
  *
  * AsOfNativeSpec pins parity on the real event log plus constructed
  * edges; this spec samples the contract space instead: random keyed
  * tables with duplicate timestamps, both directions, bounded and
  * unbounded tolerances, and RANDOM input partitionings (the exec's
  * requiredChildDistribution/Ordering must normalize whatever layout
  * arrives). The referee is a plain-Scala model of the documented
  * semantics — backward: latest rts ≤ lts (ties → highest seq);
  * forward: earliest rts ≥ lts (ties → lowest seq); left-outer, one
  * emission per left row; band: all equal-key pairs with
  * |rts − lts| ≤ tol — computed driver-side with no Spark machinery
  * shared with the implementation under test. */
class JoinPropertySpec extends SparkSpec {

  // (k, t, id) triples as plain tuples — Spark's tuple encoders work
  // from any scope, where an inner case class would need an outer ref
  private type Row3 = (Long, Long, Long)

  // small domains force key collisions, ts ties, empty keys on either
  // side, and tolerance boundaries to actually occur in most samples
  private val rowsGen: Gen[(List[Row3], List[Row3])] = for {
    nl <- Gen.choose(0, 30)
    nr <- Gen.choose(0, 30)
    lks <- Gen.listOfN(nl, Gen.choose(0L, 3L))
    lts <- Gen.listOfN(nl, Gen.choose(0L, 24L))
    rks <- Gen.listOfN(nr, Gen.choose(0L, 3L))
    rts <- Gen.listOfN(nr, Gen.choose(0L, 24L))
  } yield (
    lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
    rks.zip(rts).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

  private val tolGen = Gen.oneOf(-1L, 0L, 3L, 7L)
  private val partsGen = Gen.zip(Gen.choose(1, 5), Gen.choose(1, 5))

  private def refAsOf(ls: List[Row3], rs: List[Row3], fwd: Boolean,
      tol: Long): Map[Long, Option[Long]] =
    ls.map { case (lk, lt, lid) =>
      val cand = rs.filter { case (rk, rt, _) =>
        rk == lk &&
          (if (fwd) rt >= lt && (tol < 0L || rt - lt <= tol)
           else rt <= lt && (tol < 0L || lt - rt <= tol))
      }
      val pick =
        if (cand.isEmpty) None
        else if (fwd) Some(cand.minBy(r => (r._2, r._3))._3)
        else Some(cand.maxBy(r => (r._2, r._3))._3)
      lid -> pick
    }.toMap

  test("property: native as-of join == plain-Scala model on random tables") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAllNoShrink(rowsGen, tolGen, Gen.oneOf(true, false),
      partsGen) { (rows, tol, fwd, parts) =>
      val (ls, rs) = rows
      val left = ls.toDF("k", "t", "lid").repartition(parts._1, col("k"))
      val right = rs.toDF("k", "t", "rid")
        .select(col("k").as("rk"), col("t").as("rt"), col("rid"))
        .repartition(parts._2, col("rk"))
      val got = AsOf.join(left, right, "k", "rk", "t", "rt", "rid",
          forward = fwd, tolUs = tol)
        .select(col("lid"), col("rid")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val want = refAsOf(ls, rs, fwd, tol)
      if (got != want)
        println(s"asof mismatch fwd=$fwd tol=$tol parts=$parts\n" +
          s"  got-only:  ${got.toSet.diff(want.toSet).take(4)}\n" +
          s"  want-only: ${want.toSet.diff(got.toSet).take(4)}\n" +
          s"  L=$ls\n  R=$rs")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: native band join == plain-Scala pair model on random tables") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAllNoShrink(rowsGen, Gen.oneOf(0L, 2L, 6L),
      partsGen) { (rows, tol, parts) =>
      val (ls, rs) = rows
      val left = ls.toDF("k", "t", "lid").repartition(parts._1, col("k"))
      val right = rs.toDF("k", "t", "rid")
        .select(col("k").as("rk"), col("t").as("rt"), col("rid"))
        .repartition(parts._2, col("rk"))
      val got = AsOf.bandJoin(left, right, "k", "rk", "t", "rt", tol)
        .select(col("lid"), col("rid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // inner join: every equal-key pair within the band, as a SET —
      // lid/rid are unique per side so multiplicities are impossible
      val want = (for {
        (lk, lt, lid) <- ls; (rk, rt, rid) <- rs
        if rk == lk && math.abs(rt - lt) <= tol
      } yield (lid, rid)).toSet
      if (got != want)
        println(s"band mismatch tol=$tol parts=$parts\n" +
          s"  got-only:  ${got.diff(want).take(4)}\n" +
          s"  want-only: ${want.diff(got).take(4)}\n  L=$ls\n  R=$rs")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}

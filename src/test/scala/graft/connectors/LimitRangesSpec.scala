package graft.connectors

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, LessThan}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property gate for the limit/top-N pushdown planner: for ANY
  * (rows, parts, pushed filters, n, direction), the ids covered by the
  * truncated ranges — after applying the same row-level type filter the
  * reader applies — must equal the brute-force "filter everything, take
  * the first/last n" set. This is the exactness claim behind the TOTAL
  * limit push (isPartiallyPushed = false): a single off-by-one here
  * would silently drop or duplicate rows under Spark's dropped limit,
  * so the planner earns a generative proof, not just the two pinned
  * example queries (q191/q192). Pure arithmetic — no Spark session. */
class LimitRangesSpec extends AnyFunSuite {

  private def matches(id: Long, typeRes: Option[Long]): Boolean =
    typeRes.forall(r => id % 5L == r)

  private def bruteForce(rows: Long, pushed: Array[Filter], n: Long,
      fromEnd: Boolean): Seq[Long] = {
    var lo = 0L
    var hi = rows
    var typeRes: Option[Long] = None
    var impossible = false
    pushed.foreach {
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case EqualTo("event_type", t: String) =>
        val idx = ArchiveSource.types.indexOf(t)
        if (idx < 0) impossible = true
        else typeRes = Some((idx.toLong * 2L) % 5L)
      case _ =>
    }
    if (impossible) return Nil
    val all = (lo until hi).filter(matches(_, typeRes))
    if (fromEnd) all.takeRight(n.toInt) else all.take(n.toInt)
  }

  private def covered(ranges: Array[ArchiveRangePartition],
      pushed: Array[Filter]): Seq[Long] = {
    val typeRes = pushed.collectFirst {
      case EqualTo("event_type", t: String) =>
        (ArchiveSource.types.indexOf(t).toLong * 2L) % 5L
    }
    ranges.toSeq.flatMap(rg =>
      (rg.start until rg.end).filter(matches(_, typeRes)))
  }

  test("limitRanges == brute force for any rows/parts/filters/n/direction") {
    val gen = for {
      rows <- Gen.choose(1L, 3000L)
      parts <- Gen.choose(1, 12)
      n <- Gen.choose(0L, 3200L)
      fromEnd <- Gen.oneOf(true, false)
      useType <- Gen.option(Gen.oneOf(
        ArchiveSource.types.toSeq :+ "no_such_type"))
      loF <- Gen.option(Gen.choose(0L, 3200L))
      hiF <- Gen.option(Gen.choose(0L, 3200L))
    } yield (rows, parts, n, fromEnd, useType, loF, hiF)

    val prop = Prop.forAll(gen) {
      case (rows, parts, n, fromEnd, useType, loF, hiF) =>
        val pushed: Array[Filter] =
          (useType.map(t => EqualTo("event_type", t)).toSeq ++
            loF.map(v => GreaterThanOrEqual("event_id", v)).toSeq ++
            hiF.map(v => LessThan("event_id", v)).toSeq).toArray
        val pruned = ArchiveSource.prunedRanges(rows, parts, pushed)
        val limited = ArchiveSource.limitRanges(pruned, pushed, n, fromEnd)
        val got = covered(limited, pushed)
        val want = bruteForce(rows, pushed, n, fromEnd)
        val ordered = limited.toSeq
          .sliding(2).forall {
            case Seq(a, b) => a.end <= b.start
            case _ => true
          }
        (got == want) :| s"ids: got ${got.take(5)}... (${got.size}) " +
          s"want ${want.take(5)}... (${want.size})" &&
          ordered :| "ranges must stay ordered and disjoint"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MisraGries, TopKByCount}

/** Generative proof of the mergeable-summary guarantees the engine's
  * heavy-hitter path rides (functions/MisraGries.scala — the Agarwal
  * et al. PODS '12 invariants, cited in the scaladoc; q66 and the
  * streaming MG twin both assume them):
  *
  *  1. coverage — every item with true frequency > n/(k+1) survives
  *     in the summary, under ANY partitioning of the stream into
  *     partial aggregates and ANY merge order;
  *  2. one-sided error — estimates never overcount, and undercount by
  *     at most n/(k+1);
  *  3. bound — the summary never holds more than k counters.
  *
  * Pure driver-side properties over the Aggregator's own
  * zero/reduce/merge (no Spark jobs — ParitySpec already proves the
  * Spark wiring end-to-end on the event log); hundreds of samples run
  * in milliseconds, covering the skewed, uniform, and adversarial
  * all-distinct stream shapes with k from 1 to 24. */
class MisraGriesSpec extends AnyFunSuite {

  // zipf-ish skew: item i drawn with weight ~ 1/(i+1)
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 600)
    dom <- Gen.choose(1, 40)
    xs <- Gen.listOfN(n, Gen.frequency(
      (1 to dom).map(i => (dom - i + 1, Gen.const(s"w$i"))): _*))
  } yield xs

  private val kGen = Gen.choose(1, 24)

  // random partitioning into 1..6 partials, each reduced independently,
  // then merged in a random (shuffled) order — the distributed shape
  private def summarize(xs: List[String], k: Int, cuts: List[Int],
      mergeOrder: List[Int]): Map[String, Long] = {
    val mg = new MisraGries(k)
    val parts = {
      val bs = cuts.distinct.sorted.filter(c => c > 0 && c < xs.length)
      (0 +: bs :+ xs.length).sliding(2).map {
        case Seq(a, b) => xs.slice(a, b)
      }.toList
    }
    val partials = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
    val order =
      mergeOrder.take(partials.length).zipWithIndex
        .sortBy(_._1).map(t => partials(t._2))
    mg.finish(order.foldLeft(mg.zero)(mg.merge))
  }

  private val caseGen = for {
    xs <- streamGen
    k <- kGen
    cuts <- Gen.listOfN(5, Gen.choose(0, math.max(1, xs.length)))
    order <- Gen.listOfN(6, Gen.choose(0, 1000))
  } yield (xs, k, cuts, order)

  test("property: coverage, one-sided error, and size bound under any merge") {
    val prop = Prop.forAllNoShrink(caseGen) { case (xs, k, cuts, order) =>
      val summary = summarize(xs, k, cuts, order)
      val truth = xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val n = xs.length.toLong
      val maxLoss = n / (k + 1L) // floor((k+1)D <= n)
      val sizeOk = summary.size <= k
      val coverOk = truth.forall { case (w, c) =>
        c <= maxLoss || summary.contains(w)
      }
      val errOk = summary.forall { case (w, est) =>
        val c = truth.getOrElse(w, 0L)
        est <= c && c - est <= maxLoss
      }
      if (!(sizeOk && coverOk && errOk))
        println(s"MG violation k=$k n=$n size=${summary.size} " +
          s"coverOk=$coverOk errOk=$errOk\n  summary=$summary\n  truth=$truth")
      sizeOk && coverOk && errOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: TopKByCount is merge-order-invariant and exactly correct") {
    val entriesGen = for {
      n <- Gen.choose(0, 80)
      ks <- Gen.listOfN(n, Gen.choose(0L, 30L))
      cs <- Gen.listOfN(n, Gen.choose(1L, 50L))
    } yield ks.distinct.zip(cs) // each key arrives exactly once
    val gen = for {
      es <- entriesGen
      k <- Gen.choose(1, 10)
      cuts <- Gen.listOfN(3, Gen.choose(0, math.max(1, es.length)))
      order <- Gen.listOfN(4, Gen.choose(0, 1000))
    } yield (es, k, cuts, order)
    val prop = Prop.forAllNoShrink(gen) { case (es, k, cuts, order) =>
      val tk = new TopKByCount(k)
      val bs = cuts.distinct.sorted.filter(c => c > 0 && c < es.length)
      val parts = (0 +: bs :+ es.length).sliding(2).map {
        case Seq(a, b) => es.slice(a, b)
      }.toList
      val partials = parts.map(p => p.foldLeft(tk.zero)(tk.reduce))
      val shuffled = order.take(partials.length).zipWithIndex
        .sortBy(_._1).map(t => partials(t._2))
      val (tot, nk, top) = tk.finish(shuffled.foldLeft(tk.zero)(tk.merge))
      val wantTop = es.map { case (key, c) => (c, key) }
        .sortBy(t => (-t._1, t._2)).take(k)
      tot == es.map(_._2).sum && nk == es.length.toLong && top == wantTop
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}

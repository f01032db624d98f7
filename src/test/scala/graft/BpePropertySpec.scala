package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Bpe

/** Generative exactness proof of the distributed BPE TRAINER
  * (operators/Bpe.scala `train`): TextPropertySpec gates the
  * tokenizer's bounds (round-trip concat, planted-merge recovery,
  * monotone counts) but not that the trainer's merge SEQUENCE is
  * exactly right. This property trains on random word-type tables and
  * asserts the full (rank, a, b) sequence equals a plain-Scala model
  * of the documented semantics — per round: pair counts over adjacent
  * symbols weighted by type count, argmax broken by (count desc, a, b
  * lexicographic), then the left-to-right greedy fuse (the fold whose
  * tail can never re-merge, aaa under (a,a) → [aa, a]).
  *
  * The Spark side runs the real distributed loop (explode + hash-agg
  * + TakeOrdered(1) + aggregate-HOF fold + cache/checkpoint hygiene),
  * so an off-by-one in the pair window, a tie mishandled by the
  * orderBy, or a double-merge in the fold fails the property. The
  * alphabet stays ASCII so Spark's UTF8 binary ordering and Scala's
  * string ordering agree — the collation caveat is documented here,
  * not hidden. */
class BpePropertySpec extends SparkSpec {

  private def refTrain(types: Seq[(String, Long)], m: Int)
      : Seq[(Int, String, String)] = {
    var cur: Seq[(Vector[String], Long)] =
      types.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String)]
    var r = 0
    var done = false
    while (r < m && !done) {
      val counts = scala.collection.mutable
        .Map.empty[(String, String), Long]
      cur.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r, a, b))
        cur = cur.map { case (s, c) =>
          var acc = Vector.empty[String]
          s.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc = acc.init :+ (a + b)
            else acc = acc :+ x
          }
          (acc, c)
        }
      }
      r += 1
    }
    out.toList
  }

  test("property: distributed BPE merge sequence == plain-Scala trainer") {
    val s = spark
    import s.implicits._
    val wordGen = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val tableGen = for {
      k <- Gen.choose(1, 12)
      ws <- Gen.listOfN(k, wordGen)
      cs <- Gen.listOfN(k, Gen.choose(1L, 9L))
      m <- Gen.choose(1, 8)
    } yield (ws.zip(cs).groupBy(_._1).map { case (w, g) =>
      (w, g.map(_._2).sum) }.toSeq.sortBy(_._1), m)
    val prop = Prop.forAllNoShrink(tableGen) { case (types, m) =>
      val df = types.toDF("w", "wc")
      val got = Bpe.train(s, df, m).map(mg => (mg.rank, mg.a, mg.b))
      val want = refTrain(types, m)
      if (got != want)
        println(s"bpe mismatch m=$m types=$types\n  got=$got\n  want=$want")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{TextFunctions => T}

/** Property gates for the text column functions every dedup / text /
  * curation operator builds on (TextFunctions): shingle counts, shingle
  * structure, distinctness, and tokenizer agreement — checked over
  * generated corpora rather than the fixed testdata, so edge shapes
  * (single-token docs, repeated tokens, k > n) stay covered as the
  * operators evolve.
  */
class TextPropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  private val tokGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
  private val docGen: Gen[List[String]] =
    Gen.nonEmptyListOf(tokGen).map(_.take(40))

  /** Evaluate shinglesAll(k) for one token list via a 1-row DataFrame. */
  private def shinglesOf(toks: List[String], k: Int,
      distinct: Boolean): Seq[String] = {
    val s = spark
    import s.implicits._
    val col0 = T.tokens(col("text"))
    val expr0 = if (distinct) T.shingles(col0, k) else T.shinglesAll(col0, k)
    Seq(toks.mkString(" ")).toDF("text").select(expr0.as("sh"))
      .collect()(0).getSeq[String](0)
  }

  test("property: shinglesAll(k) emits exactly max(n-k+1, 0) ordered windows") {
    check(Prop.forAll(docGen, Gen.choose(1, 5)) { (toks, k) =>
      val got = shinglesOf(toks, k, distinct = false)
      val want = toks.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).toSeq
      got == want // count, order, and content all at once
    })
  }

  test("property: shingles(k) == distinct of shinglesAll(k), order-preserving") {
    check(Prop.forAll(docGen, Gen.choose(1, 4)) { (toks, k) =>
      val all = shinglesOf(toks, k, distinct = false)
      val dis = shinglesOf(toks, k, distinct = true)
      dis == all.distinct
    })
  }

  test("property: every shingle is k tokens drawn from the document") {
    check(Prop.forAll(docGen, Gen.choose(2, 4)) { (toks, k) =>
      val set = toks.toSet
      shinglesOf(toks, k, distinct = false).forall { sh =>
        val parts = sh.split(" ", -1).toSeq
        parts.length == k && parts.forall(set.contains)
      }
    })
  }

  test("property: wordCount equals the naive regex count on generated text") {
    check(Prop.forAll(docGen) { toks =>
      val s = spark
      import s.implicits._
      val text = toks.mkString(" ")
      val got = Seq(text).toDF("text")
        .select(T.wordCount(col("text")).as("n"))
        .collect()(0).getInt(0)
      got == T.wordPattern.r.findAllIn(text.toLowerCase).size
    })
  }

  // ------------------------------------------------------------- BPE
  import graft.operators.Bpe

  test("property: BPE apply round-trips — token concat reproduces the word") {
    check(Prop.forAll(tokGen, Gen.choose(0, 3)) { (w, nMerges) =>
      // learn merges from the word's own adjacent pairs, ranked by order
      val pairs = w.map(_.toString).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq.distinct.take(nMerges)
      val rank = pairs.zipWithIndex.toMap
      Bpe.applyMerges(w, rank).mkString == w
    })
  }

  test("property: zero merges tokenizes to characters; counts never increase") {
    check(Prop.forAll(tokGen) { w =>
      val zero = Bpe.applyMerges(w, Map.empty)
      val some = Bpe.applyMerges(w,
        Map((w.take(1), w.slice(1, 2)) -> 0).filter(_ => w.length >= 2))
      zero == w.map(_.toString).toVector && some.length <= zero.length
    })
  }

  test("BPE training recovers a planted dominant pair and fuses it on apply") {
    val s = spark
    import s.implicits._
    // "abab" dominates: round 1 must learn (a,b); round 2 then sees
    // [ab, ab] everywhere and must learn (ab, ab)
    val types = Seq(("abab", 50L), ("xy", 3L)).toDF("w", "wc")
    val merges = Bpe.train(s, types, 2)
    assert(merges.map(m => (m.a, m.b)) == Seq(("a", "b"), ("ab", "ab")),
      s"got $merges")
    val rank = merges.map(m => (m.a, m.b) -> m.rank).toMap
    assert(Bpe.applyMerges("abab", rank) == Vector("abab"))
    assert(Bpe.applyMerges("ababx", rank) == Vector("abab", "x"))
    assert(Bpe.applyMerges("xy", rank) == Vector("x", "y"))
  }

  test("t20_bpe_tokenize: compression bounds over the registered query") {
    // the rows-only registered query's own gate (the algorithm-level
    // properties above don't touch the query surface): BPE with 30
    // merges must compress every source — at least one token per word,
    // never more tokens than characters — and the report's ratio
    // columns must equal the exact-count columns they summarize
    val rows = SparkEntry.queries("t20_bpe_tokenize")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nToks) = (r.getLong(1), r.getLong(2))
      val (tpw, cpt) = (r.getDouble(3), r.getDouble(4))
      assert(nWords > 0L && nToks >= nWords,
        s"${r.getString(0)}: fewer tokens than words")
      assert(tpw >= 1.0, s"${r.getString(0)}: tokens/word $tpw < 1")
      assert(cpt >= 1.0, s"${r.getString(0)}: chars/token $cpt < 1")
      assert(math.abs(tpw - nToks.toDouble / nWords) < 5e-5,
        s"${r.getString(0)}: tokens_per_word inconsistent with counts")
    }
  }
}

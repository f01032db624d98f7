package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Unit checks for the column-function libraries (vector math, shingles,
  * fingerprints, language ID) on literal DataFrames. */
class FunctionsSpec extends SparkSpec {

  test("cosine similarity of known vectors") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f), math.sqrt(0.5))).toDF("a", "b", "want")
    val got = df.select(V.cosine(col("a"), col("b")).as("c"), col("want"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("srp bucket is deterministic and within range") {
    val s = spark
    import s.implicits._
    val planes = V.planesLit(8, 4)
    val df = Seq(Seq(0.5f, -0.2f, 0.1f, 0.9f), Seq(-0.5f, 0.2f, -0.1f, -0.9f))
      .toDF("e")
    val b = df.select(V.srpBucket(col("e"), planes).as("b")).as[Long].collect()
    assert(b.forall(x => x >= 0 && x < 256))
    // antipodal vectors land in complementary buckets
    assert(b(0) + b(1) == 255)
  }

  test("shingles: 3-grams with distinct + short-doc edge cases") {
    val s = spark
    import s.implicits._
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .withColumn("toks", T.tokens(col("text")))
    val got = df.select(T.shingles(col("toks"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("fingerprint canonicalizes case and whitespace") {
    val s = spark
    import s.implicits._
    val df = Seq(("Hello   World", "hello world"), ("  a  b ", "a b"))
      .toDF("x", "y")
    val got = df.select((T.fingerprint(col("x")) === T.fingerprint(col("y"))).as("eq"))
      .as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("language ID picks the language with most stopword hits") {
    val s = spark
    import s.implicits._
    val df = Seq("the cat and the dog of the house",
      "el perro y la casa de que el gato").toDF("text")
    val got = df.select(T.langId(col("text")).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "es"))
  }

  test("rolling token stats: word and bpe-ish counts") {
    val s = spark
    import s.implicits._
    val df = Seq("abc 123 x-y").toDF("text")
    val got = df.select(T.wordCount(col("text")).as("w"),
      T.bpeTokenCount(col("text")).as("b")).collect().head
    assert(got.getInt(0) == 3)     // abc, x, y
    assert(got.getInt(1) == 5)     // abc, 123, x, -, y
  }
  test("native cosine expression is bit-identical to the HOF formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(50)((Seq.fill(64)(rnd.nextFloat() - 0.5f),
      Seq.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("a", "b")
    val diff = df.select((V.cosine(col("a"), col("b")) -
      V.cosineHof(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).as[Double].collect().head
    assert(diff == 0.0, s"expected bitwise-equal cosine, max diff $diff")
  }
  test("pq encode/lut/adc invariants (integer grid)") {
    val s = spark
    import s.implicits._
    val E = graft.expressions.VectorExpressions
    val m = 4; val k = 4; val subDim = 2 // 8-dim vectors
    val scale = graft.operators.IntKMeans.Scale
    val rnd = new scala.util.Random(11)
    // codebook in micro-units, like an IntKMeans fit would produce
    val codebook: Seq[Seq[Long]] = Seq.fill(m * k)(Seq.fill(subDim)(
      math.floor((rnd.nextDouble() - 0.5) * scale + 0.5).toLong))
    val vecs = Seq.fill(40)(Seq.fill(8)(rnd.nextFloat() - 0.5f))
    val df = vecs.toDF("e")
    val out = df.select(
      E.pqEncodeInt(col("e"), codebook, m, k, subDim, scale).as("codes"),
      E.pqLutInt(col("e"), codebook, m, k, subDim, scale).as("lut"))
      .withColumn("adc", E.pqAdcInt(col("codes"), col("lut"), k))
      .collect()
    out.zip(vecs).foreach { case (r, v) =>
      val codes = r.getSeq[Int](0)
      val lut = r.getSeq[Long](1)
      assert(codes.length == m && codes.forall(c => c >= 0 && c < k))
      assert(lut.length == m * k && lut.forall(_ >= 0L))
      // encode picks the argmin of the vector's OWN lut per subspace,
      // ties to the LOWEST code (the oracle-replay contract)
      (0 until m).foreach { mi =>
        val sub = lut.slice(mi * k, (mi + 1) * k)
        assert(codes(mi) == sub.indexOf(sub.min))
      }
      // self-ADC = sum of per-subspace minimal distances, exactly
      val want = (0 until m).map(mi => lut.slice(mi * k, (mi + 1) * k).min).sum
      assert(r.getLong(2) == want)
      // lut entries equal an independent integer recomputation
      val q = v.map(x => math.floor(x.toDouble * scale + 0.5).toLong)
      (0 until m).foreach { mi =>
        (0 until k).foreach { ki =>
          val c = codebook(mi * k + ki)
          val d = (0 until subDim).map { i =>
            val diff = q(mi * subDim + i) - c(i); diff * diff
          }.sum
          assert(lut(mi * k + ki) == d)
        }
      }
    }
  }

  test("pq_adc is callable from SQL once extensions are registered") {
    val s = spark
    GraftExtensions.register(s)
    val got = s.sql(
      "SELECT pq_adc(array(1, 0), CAST(array(10, 20, 5, 7) AS ARRAY<BIGINT>), 2)")
      .collect().head.getLong(0)
    assert(got == 25L) // lut[0*2+1] + lut[1*2+0] = 20 + 5
  }

  test("scalar udf: registered, callable from SQL, equals the builtin") {
    val s = spark
    import s.implicits._
    val lenUdf = udf((x: String) => x.length)
    s.udf.register("my_len", lenUdf)
    val df = Seq("abc", "hello").toDF("x")
      .withColumn("a", lenUdf(col("x")))
      .withColumn("b", length(col("x")))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
    assert(s.sql("SELECT my_len('spark')").collect().head.getInt(0) == 5)
  }
}

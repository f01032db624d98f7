package graft

import org.apache.spark.sql.functions._

import graft.operators.IntKMeans

/** Pins the determinism contract behind the round-11 ANN oracle flips
  * (s03/s04/s13/s15): the integer k-means fit must be a pure function
  * of the DATA — same centroids at any partitioning, every value on the
  * micro-unit grid, init picks drawn from the corpus — because the
  * DuckDB oracle replays the fit from the parquet alone and
  * hash-compares everything downstream of it. */
class IntKMeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def corpus(nSub: Int) = {
    val emb = Tables.embeddings(spark, sf)
    if (nSub == 1)
      emb.select(col("vec_id"), lit(0).as("m"),
        col("embedding").cast("array<double>").as("e"))
    else
      emb.select(col("vec_id"), explode(array((0 until nSub).map { m =>
        struct(lit(m).as("m"),
          slice(col("embedding").cast("array<double>"),
            m * (64 / nSub) + 1, 64 / nSub).as("e"))
      }: _*)).as("s"))
        .select(col("vec_id"), col("s.m").as("m"), col("s.e").as("e"))
  }

  test("fit is invariant to partitioning — the order-proof-sums claim") {
    val base = corpus(1)
    val a = IntKMeans.fit(base.repartition(1), 1, 16, 3, 64)
    val b = IntKMeans.fit(base.repartition(13, col("vec_id")), 1, 16, 3, 64)
    val c = IntKMeans.fit(base.orderBy(col("vec_id").desc), 1, 16, 3, 64)
    def flat(r: IndexedSeq[IndexedSeq[Array[Long]]]): Seq[Seq[Long]] =
      r.flatMap(_.map(_.toSeq))
    assert(flat(a) == flat(b), "centroids changed under repartition")
    assert(flat(a) == flat(c), "centroids changed under input order")
  }

  test("fit lands on the micro-unit grid, k centroids per subspace, distinct") {
    val cents = IntKMeans.fit(corpus(4), 4, 8, 2, 16)
    assert(cents.length == 4)
    cents.foreach { cb =>
      assert(cb.length == 8)
      assert(cb.map(_.toSeq).distinct.length == 8,
        "duplicate centroid — Gonzalez must pick distinct seeds")
      cb.foreach(c => assert(c.length == 16))
    }
    // values are plausible micro-units of the [-0.6, 0.6] embedding range
    cents.flatten.flatten.foreach(v => assert(math.abs(v) <= 2000000L))
  }

  test("Gonzalez seed = quantized vector of the lowest vec_id") {
    val emb = Tables.embeddings(spark, sf)
      .orderBy("vec_id").limit(1)
      .select(IntKMeans.quantize(col("embedding").cast("array<double>")))
      .collect()(0).getSeq[Long](0)
    val cents = IntKMeans.fit(corpus(1), 1, 16, 0, 64)
    assert(cents(0)(0).toSeq == emb,
      "cell 0 with zero Lloyd rounds must be the seed data point")
  }
}

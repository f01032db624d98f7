package graft

import org.apache.spark.sql.functions._

/** Quality gate for d08 (banded-SRP bucketed exact pair verification):
  *   1. containment — every d08 pair appears in d07's exact all-pairs
  *      result with the identical cosine (precision 1.0 by construction);
  *   2. recall floor at the corpus' own 0.42 tail (moderate-similarity
  *      pairs are the hard case for sign-LSH — the floor documents the
  *      honest recall, it does not pretend the tail is free);
  *   3. planted-near-dup recall — the regime the operator exists for:
  *      perturbed copies at cosine ≥ 0.9 must essentially all be caught.
  */
class BucketedPairsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("d08 pairs are contained in d07 exact pairs with identical cosine") {
    val exact = SparkEntry.queries("d07_embedding_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = SparkEntry.queries("d08_dedup_pairs_bucketed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(bucketed.nonEmpty, "bucketed pass must return candidate pairs")
    bucketed.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"pair $pair not in exact result")
      assert(exact(pair) == cos, s"cosine mismatch for $pair")
    }
    val recall = bucketed.length.toDouble / exact.size
    info(f"recall at the 0.42 tail: $recall%.2f (${bucketed.length}/${exact.size})")
    assert(recall >= 0.4, f"tail recall regressed: $recall%.2f")
  }

  test("planted near-duplicates (cos >= 0.9) are essentially all caught") {
    import scala.collection.JavaConverters._
    val rnd = new scala.util.Random(7L)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 60 random base vectors + a perturbed copy of each; noise norm
    // ~0.04*sqrt(64)=0.32 of the unit base -> cosine ~0.95; the planted
    // pair ids are (i, 1000+i)
    val base = (0 until 60).map(i => i.toLong -> unit(Array.fill(64)(rnd.nextGaussian())))
    val planted = base.map { case (i, v) =>
      (1000L + i) -> unit(v.zip(Array.fill(64)(rnd.nextGaussian() * 0.04)).map { case (x, e) => x + e })
    }
    val rows = (base ++ planted).map { case (id, v) =>
      org.apache.spark.sql.Row(id, v.map(_.toFloat).toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val emb = spark.createDataFrame(rows.asJava, schema)

    val found = graft.operators.Dedup.bucketedPairs(emb, minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = (0 until 60).count(i => found.contains((i.toLong, 1000L + i)))
    val recall = caught.toDouble / 60
    info(f"planted near-dup recall: $recall%.2f ($caught/60)")
    assert(recall >= 0.95, f"planted near-dup recall too low: $recall%.2f")
  }
}

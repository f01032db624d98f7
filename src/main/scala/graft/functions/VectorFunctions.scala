package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * Spark higher-order functions (`zip_with`/`aggregate`/`transform`) — no
  * UDFs, so everything stays inside Tungsten row processing and is usable
  * in any expression context (joins, windows, filters).
  *
  * All math is done in double after an explicit elementwise cast: the fold
  * runs in index order, which makes results bit-identical to a sequential
  * C++ implementation (e.g. the DuckDB oracle) on the same values.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (no-op on array<double>). */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity = dot / (|a| * |b|) — native codegen'd expression
    * (one fused loop; see graft.expressions.CosineSimilarity). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine(a, b)

  /** HOF formulation of cosine — numerically identical to `cosine`, kept
    * as the pure-builtin fallback and for differential testing. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Sign-random-projection LSH bucket id: one bit per hyperplane, packed
    * into a long. `planes` must be a literal array<array<double>> column
    * (the projection matrix — small, deterministic, effectively broadcast
    * to every task as part of the serialized plan; at cluster scale this
    * is the standard "ship the codebook, shuffle nothing" pattern). */
  def srpBucket(emb: Column, planes: Column): Column =
    aggregate(planes, lit(0L),
      (acc, plane) => acc * 2 + when(dot(emb, plane) >= 0, 1L).otherwise(0L))

  /** Codegen'd SRP bucket: one native dot-product loop per plane, Horner
    * bit-packing — identical buckets to `srpBucket` (same plane order,
    * same sequential fold) but stays in whole-stage codegen instead of
    * interpreted HOF eval (~10× on wide fan-ins). */
  def srpBucketFast(emb: Column, planes: Seq[Seq[Double]]): Column = {
    val e = toDouble(emb)
    planes.foldLeft(lit(0L)) { (acc, p) =>
      acc * 2 + when(graft.expressions.VectorExpressions.dot(e, typedlit(p)) >= 0, 1L)
        .otherwise(0L)
    }
  }

  /** Deterministic ±1 hyperplane matrix (nPlanes × dim), seeded. */
  def planesSeq(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Same matrix as a literal column (HOF path). */
  def planesLit(nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    typedlit(planesSeq(nPlanes, dim, seed))
}

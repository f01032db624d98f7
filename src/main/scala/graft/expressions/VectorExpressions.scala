package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over array<double>.
  *
  * Why not higher-order functions: `aggregate(zip_with(...))` evaluates
  * through interpreted lambda dispatch with per-element boxing, and the
  * cosine needs three folds (dot, |a|², |b|²). This expression fuses all
  * three into ONE primitive loop and participates in whole-stage codegen,
  * so the brute-force similarity scan stays in generated code end to end —
  * the difference between an ANN pre-filter being scan-bound vs
  * eval-bound at 100 TB. Numerically identical to the HOF formulation
  * (same sequential fold order, same dot/(√na·√nb) formula), so oracle
  * hash parity is preserved.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // float arrays are consumed NATIVELY (widened per element inside the
  // loop): a cast-to-array<double> wrapper would allocate a converted
  // array per evaluation — per PAIR inside a nested-loop verify join,
  // which is exactly the hot path this expression exists for. Widening
  // float→double is exact, so accepting both types changes nothing
  // numerically.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<double|float> inputs, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over array<double> — same rationale as
  * CosineSimilarity: one primitive loop in whole-stage codegen. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** All LSH band hashes of one embedding in a single fused loop.
  *
  * `planes` is the (nTables·bits) × dim hyperplane matrix; band t is the
  * Horner-packed sign pattern of its `bits` planes — bit-identical to
  * folding `VectorFunctions.srpBucketFast` per band, but the matrix rides
  * along as ONE codegen reference object instead of thousands of literal
  * doubles unrolled into the expression tree. The literal-unroll version
  * spent ~10s in analysis + janino per query at 128 planes; this is O(1)
  * plan size no matter how many tables/bits, which is what a 100 TB scan
  * wants (ship the codebook, loop in generated code). */
case class SrpBands(child: Expression, planes: Seq[Seq[Double]],
    nTables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (planes.length == nTables * bits) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"srp_bands needs ${nTables * bits} planes, got ${planes.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bands expects array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val p = mat(t * bits + b)
        val n = math.min(x.numElements(), p.length)
        var d = 0.0
        var i = 0
        while (i < n) { d += x.getDouble(i) * p(i); i += 1 }
        acc = acc * 2 + (if (d >= 0) 1L else 0L)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("srpPlanes", mat, "double[][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $acc = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double[] $p = $m[$t * $bits + $b];
         |    int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $d += $a.getDouble($i) * $p[$i]; }
         |    $acc = $acc * 2 + ($d >= 0 ? 1L : 0L);
         |  }
         |  $out[$t] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

/** Product-quantization encode on the micro-unit integer grid: quantize
  * the vector to exact integers (floor(x*scale + 0.5) per dimension, the
  * engine-wide fixed-point convention shared with `IntKMeans`), split it
  * into `m` contiguous subvectors of `subDim` dims, and emit per
  * subvector the index of the nearest (integer L2-squared) of its `k`
  * codebook centroids, ties to the lowest index.
  *
  * All distance arithmetic is exact BIGINT math — no float-sum order
  * dependence — so the codes are reproducible at any partitioning AND
  * replayable by the DuckDB oracle as plain integer SQL (the round-11
  * flip that moved s04/s13 from spec-gated to hash-matched; same
  * fixed-point trick as x15/t17/q73). Integer ADC is also the
  * production layout: int8/int16 LUT scans are what SIMD PQ kernels
  * (FAISS) run, not float math.
  *
  * At 100 TB this runs ONCE at ingest: the persisted code table is
  * m bytes/vector vs 4*dim for the floats (32x smaller at m=8, dim=64),
  * which is what makes exhaustive candidate scans affordable. The
  * codebook rides along as one codegen reference object (same reasoning
  * as SrpBands — O(1) plan size). */
case class PqEncodeInt(child: Expression, codebook: Seq[Seq[Long]],
    m: Int, k: Int, subDim: Int, scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val cb: Array[Array[Long]] =
    codebook.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (codebook.length == m * k) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pq_encode_int needs ${m * k} codebook rows, got ${codebook.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_int expects array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_int"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Long.MaxValue
      var ki = 0
      while (ki < k) {
        val c = cb(mi * k + ki)
        var dist = 0L; var i = 0
        while (i < subDim) {
          val q = math.floor(x.getDouble(mi * subDim + i) * scale.toDouble
            + 0.5).toLong
          val diff = q - c(i)
          dist += diff * diff; i += 1
        }
        if (dist < bestD) { bestD = dist; best = ki }
        ki += 1
      }
      out(mi) = best; mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.addReferenceObj("pqCodebookInt", cb, "long[][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist")
      val q = ctx.freshName("q")
      val diff = ctx.freshName("diff")
      val i = ctx.freshName("i")
      s"""
         |int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0; long $bestD = Long.MAX_VALUE;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    long[] $cent = $c[$mi * $k + $ki];
         |    long $dist = 0L;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      long $q = (long) java.lang.Math.floor(
         |        $a.getDouble($mi * $subDim + $i) * (double) ${scale}L + 0.5);
         |      long $diff = $q - $cent[$i];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $ki; }
         |  }
         |  $out[$mi] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeInt =
    copy(child = newChild)
}

/** Per-query ADC lookup table on the integer grid: exact BIGINT
  * L2-squared distance from each of the query's quantized subvectors to
  * every codebook centroid, flattened as array<long> of length m*k
  * (entry mi*k + ki). Computed once per QUERY row — the whole point of
  * asymmetric distance computation: the per-candidate cost collapses to
  * `m` array lookups (PqAdcInt) instead of `dim` multiplies. Exact
  * integer entries make the downstream ADC ranking order-proof and
  * oracle-replayable. */
case class PqLutInt(child: Expression, codebook: Seq[Seq[Long]],
    m: Int, k: Int, subDim: Int, scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val cb: Array[Array[Long]] =
    codebook.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (codebook.length == m * k) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pq_lut_int needs ${m * k} codebook rows, got ${codebook.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut_int expects array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "pq_lut_int"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Long](m * k)
    var mi = 0
    while (mi < m) {
      var ki = 0
      while (ki < k) {
        val c = cb(mi * k + ki)
        var dist = 0L; var i = 0
        while (i < subDim) {
          val q = math.floor(x.getDouble(mi * subDim + i) * scale.toDouble
            + 0.5).toLong
          val diff = q - c(i)
          dist += diff * diff; i += 1
        }
        out(mi * k + ki) = dist; ki += 1
      }
      mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.addReferenceObj("pqCodebookInt", cb, "long[][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist")
      val q = ctx.freshName("q")
      val diff = ctx.freshName("diff")
      val i = ctx.freshName("i")
      s"""
         |long[] $out = new long[$m * $k];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    long[] $cent = $c[$mi * $k + $ki];
         |    long $dist = 0L;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      long $q = (long) java.lang.Math.floor(
         |        $a.getDouble($mi * $subDim + $i) * (double) ${scale}L + 0.5);
         |      long $diff = $q - $cent[$i];
         |      $dist += $diff * $diff;
         |    }
         |    $out[$mi * $k + $ki] = $dist;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutInt =
    copy(child = newChild)
}

/** Asymmetric-distance scan step: approximate integer L2-squared between
  * a query (via its LUT) and a PQ-coded vector = sum over mi of
  * lut[mi*k + codes[mi]] — `m` array lookups per candidate, no vector
  * math at all. Exact BIGINT addition (commutative, order-proof), so
  * the candidate ordering is deterministic and the DuckDB oracle can
  * replay it as a plain integer SUM. This is the inner loop of every
  * PQ index scan. */
case class PqAdcInt(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_int expects (array<int> codes, array<long> lut), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "pq_adc_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var acc = 0L; var mi = 0
    val m = codes.numElements()
    while (mi < m) { acc += lut.getLong(mi * k + codes.getInt(mi)); mi += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      s"""
         |long $acc = 0L;
         |int $m = $a.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $acc += $b.getLong($mi * $k + $a.getInt($mi));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcInt =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for the native dot product. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** Column API for the native cosine. No cast wrapper: CosineSimilarity consumes float arrays natively
    * (exact per-element widening), so raw embedding columns feed the
    * loop without a per-evaluation converted-array allocation. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  /** Column API for the fused all-bands LSH hash: array<long> of length
    * nTables, band t = sign bits of planes[t*bits ..< (t+1)*bits]. */
  def srpBands(emb: Column, planes: Seq[Seq[Double]],
      nTables: Int, bits: Int): Column =
    Bridge.column(SrpBands(
      Bridge.expression(emb.cast("array<double>")), planes, nTables, bits))

  /** Column API for integer-grid PQ encoding: array<int> of m codebook
    * indices (codebook in micro-units — see IntKMeans.Scale). */
  def pqEncodeInt(emb: Column, codebook: Seq[Seq[Long]],
      m: Int, k: Int, subDim: Int, scale: Long): Column =
    Bridge.column(PqEncodeInt(
      Bridge.expression(emb.cast("array<double>")), codebook, m, k, subDim,
      scale))

  /** Column API for the integer ADC lookup table (array<long>, m*k). */
  def pqLutInt(emb: Column, codebook: Seq[Seq[Long]],
      m: Int, k: Int, subDim: Int, scale: Long): Column =
    Bridge.column(PqLutInt(
      Bridge.expression(emb.cast("array<double>")), codebook, m, k, subDim,
      scale))

  /** Column API for the integer ADC distance: sum of lut[mi*k + codes[mi]]. */
  def pqAdcInt(codes: Column, lut: Column, k: Int): Column =
    Bridge.column(PqAdcInt(
      Bridge.expression(codes), Bridge.expression(lut), k))
}

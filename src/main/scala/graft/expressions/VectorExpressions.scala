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

/** Product-quantization encode: split the vector into `m` contiguous
  * subvectors of `subDim` dims and emit, per subvector, the index of the
  * nearest (L2) of its `k` codebook centroids — the 4-bit/8-bit code
  * word every PQ-based vector index stores instead of the raw floats.
  *
  * At 100 TB this runs ONCE at ingest: the persisted code table is
  * m bytes/vector vs 4·dim for the floats (32× smaller at m=8, dim=64),
  * which is what makes exhaustive candidate scans affordable. The
  * codebook rides along as one codegen reference object (same reasoning
  * as SrpBands — O(1) plan size). */
case class PqEncode(child: Expression, codebook: Seq[Seq[Double]],
    m: Int, k: Int, subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val cb: Array[Array[Double]] =
    codebook.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (codebook.length == m * k) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs ${m * k} codebook rows, got ${codebook.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val c = cb(mi * k + ki)
        var dist = 0.0; var i = 0
        while (i < subDim) {
          val diff = x.getDouble(mi * subDim + i) - c(i)
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
      val c = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val i = ctx.freshName("i")
      s"""
         |int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    double[] $cent = $c[$mi * $k + $ki];
         |    double $dist = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $diff = $a.getDouble($mi * $subDim + $i) - $cent[$i];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $ki; }
         |  }
         |  $out[$mi] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: L2² distance from each of the query's
  * subvectors to every codebook centroid, flattened as array<double> of
  * length m·k (entry mi·k + ki). Computed once per QUERY row — the whole
  * point of asymmetric distance computation: the per-candidate cost
  * collapses to `m` table lookups (PqAdc) instead of `dim` multiplies. */
case class PqLut(child: Expression, codebook: Seq[Seq[Double]],
    m: Int, k: Int, subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val cb: Array[Array[Double]] =
    codebook.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) =>
      if (codebook.length == m * k) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pq_lut needs ${m * k} codebook rows, got ${codebook.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      var ki = 0
      while (ki < k) {
        val c = cb(mi * k + ki)
        var dist = 0.0; var i = 0
        while (i < subDim) {
          val diff = x.getDouble(mi * subDim + i) - c(i)
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
      val c = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val i = ctx.freshName("i")
      s"""
         |double[] $out = new double[$m * $k];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    double[] $cent = $c[$mi * $k + $ki];
         |    double $dist = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $diff = $a.getDouble($mi * $subDim + $i) - $cent[$i];
         |      $dist += $diff * $diff;
         |    }
         |    $out[$mi * $k + $ki] = $dist;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric-distance scan step: approximate L2² between a query (via
  * its LUT) and a PQ-coded vector = Σ_mi lut[mi·k + codes[mi]] — `m`
  * array lookups per candidate, no floating-point vector math at all.
  * This is the inner loop of every PQ index scan. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int> codes, array<double> lut), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var acc = 0.0; var mi = 0
    val m = codes.numElements()
    while (mi < m) { acc += lut.getDouble(mi * k + codes.getInt(mi)); mi += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      s"""
         |double $acc = 0.0;
         |int $m = $a.numElements();
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $acc += $b.getDouble($mi * $k + $a.getInt($mi));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
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

  /** Column API for PQ encoding: array<int> of m codebook indices. */
  def pqEncode(emb: Column, codebook: Seq[Seq[Double]],
      m: Int, k: Int, subDim: Int): Column =
    Bridge.column(PqEncode(
      Bridge.expression(emb.cast("array<double>")), codebook, m, k, subDim))

  /** Column API for the per-query ADC lookup table (array<double>, m·k). */
  def pqLut(emb: Column, codebook: Seq[Seq[Double]],
      m: Int, k: Int, subDim: Int): Column =
    Bridge.column(PqLut(
      Bridge.expression(emb.cast("array<double>")), codebook, m, k, subDim))

  /** Column API for the ADC distance: Σ lut[mi·k + codes[mi]]. */
  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    Bridge.column(PqAdc(
      Bridge.expression(codes), Bridge.expression(lut), k))
}

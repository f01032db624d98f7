package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, DotProduct, PqAdc}

/** SparkSessionExtensions entry point: makes the native vector expressions
  * available to pure-SQL users as `cosine_similarity(a, b)` and
  * `dot_product(a, b)`.
  *
  * Deployment: `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * `GraftExtensions.register(spark)` on an existing session (the
  * programmatic path, used by tests — builder extensions are ignored by
  * getOrCreate on an already-running session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def twoArg(name: String, f: (Expression, Expression) => Expression): Builder = {
    case Seq(a, b) => f(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      twoArg("cosine_similarity", CosineSimilarity(_, _))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      twoArg("dot_product", DotProduct(_, _))),
    // pq_adc(codes, lut, k): k must be a literal (it shapes the generated
    // loop). The encode/LUT builders stay Column-API-only — they close
    // over an ingest-time codebook, which SQL literals can't express.
    ("pq_adc",
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      {
        case Seq(a, b, k) if k.foldable =>
          PqAdc(a, b, k.eval(null).asInstanceOf[Number].intValue())
        case other => throw new IllegalArgumentException(
          s"pq_adc expects (codes, lut, <literal k>), got ${other.size} args")
      }))

  /** Register on a live session (temp functions in its registry). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

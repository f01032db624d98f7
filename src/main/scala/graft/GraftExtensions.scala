package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.expressions.{CosineSimilarity, DotProduct, PqAdcInt}

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the custom-join filter pushdown (plans.PushFilterThroughGraftJoins)
    // and the plan strategies ride along for --conf deployments; live
    // sessions get them via Bridge.addStrategy/addOptimization in AsOf
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughGraftJoins)
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => new graft.plans.BandJoinStrategy)
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
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // own runtime join pruning but leaves them out of the SQL registry;
    // exposing them lets a query build the semi-join pruning plan
    // EXPLICITLY when the optimizer can't inject it (e.g. the dim keys
    // come from a pipeline the filter-injection rule can't see through).
    // bloom_filter_agg(xxhash64(k) [, est_items [, num_bits]]) → binary;
    // might_contain(<scalar-subquery bloom>, xxhash64(k)) → boolean.
    ("bloom_filter_agg",
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, est) => new BloomFilterAggregate(child, est)
        case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
        case other => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1-3 arguments, got ${other.size}")
      }),
    ("might_contain",
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      twoArg("might_contain", BloomFilterMightContain(_, _))),
    ("pq_adc",
      new ExpressionInfo(classOf[PqAdcInt].getName, "pq_adc"),
      {
        case Seq(a, b, k) if k.foldable =>
          PqAdcInt(a, b, k.eval(null).asInstanceOf[Number].intValue())
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

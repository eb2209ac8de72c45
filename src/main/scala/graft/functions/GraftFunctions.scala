package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the custom kernels, so `spark.sql` users get the same
  * operators as the Column API (the reference's query surface is SQL-first).
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions` /
  *    `spark.sql.extensions=graft.functions.GraftExtensions` — the canonical
  *    plugin route;
  *  - [[GraftFunctions.register]] for an already-built session.
  */
object GraftFunctions {

  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product_f",
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      (es: Seq[Expression]) => DotProductF(es(0), es(1))),
    ("quantize_f",
      new ExpressionInfo(classOf[QuantizeF].getName, "quantize_f"),
      (es: Seq[Expression]) => QuantizeF(es(0), es(1))),
    ("dot_product_q",
      new ExpressionInfo(classOf[DotProductQ].getName, "dot_product_q"),
      (es: Seq[Expression]) => DotProductQ(es(0), es(1))),
    ("minhash_agg",
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (es: Seq[Expression]) => MinHashAgg(es.head).toAggregateExpression()),
    ("simhash_agg",
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (es: Seq[Expression]) => SimHashAgg(es.head).toAggregateExpression()),
    ("vector_mean_agg",
      new ExpressionInfo(classOf[VectorMeanAgg].getName, "vector_mean_agg"),
      (es: Seq[Expression]) => VectorMeanAgg(es.head).toAggregateExpression()),
    ("freq_sketch",
      new ExpressionInfo(classOf[FreqAgg].getName, "freq_sketch"),
      (es: Seq[Expression]) => FreqAgg(es(0),
        foldableInt(es(1), "freq_sketch(key, k)")).toAggregateExpression()),
    ("topk_agg",
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      (es: Seq[Expression]) => TopKAgg(es(0), es(1),
        foldableInt(es(2), "topk_agg(score, id, k)"))
        .toAggregateExpression()),
    ("ppm_dim",
      new ExpressionInfo(classOf[PpmDim].getName, "ppm_dim"),
      (es: Seq[Expression]) => PpmDim(es(0),
        foldableInt(es(1), "ppm_dim(content, idx)"))),
    ("png_dim",
      new ExpressionInfo(classOf[PngDim].getName, "png_dim"),
      (es: Seq[Expression]) => PngDim(es(0),
        foldableInt(es(1), "png_dim(content, idx)"))),
    ("normalize_nfc",
      new ExpressionInfo(classOf[NormalizeNfc].getName, "normalize_nfc"),
      (es: Seq[Expression]) => NormalizeNfc(es.head)))

  /** Sketch sizes must be plan-time constants (they shape the buffer). */
  private def foldableInt(e: Expression, usage: String): Int = {
    require(e.foldable, s"$usage: k must be a literal")
    e.eval().asInstanceOf[Number].intValue
  }

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}

/** `spark.sql.extensions`-loadable plugin registering the graft functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    Seq[(String, Seq[Expression] => Expression)](
      ("dot_product_f", es => DotProductF(es(0), es(1))),
      ("quantize_f", es => QuantizeF(es(0), es(1))),
      ("dot_product_q", es => DotProductQ(es(0), es(1))),
      ("minhash_agg", es => MinHashAgg(es.head).toAggregateExpression()),
      ("simhash_agg", es => SimHashAgg(es.head).toAggregateExpression()),
      ("vector_mean_agg",
        es => VectorMeanAgg(es.head).toAggregateExpression()),
      ("freq_sketch", es => FreqAgg(es(0),
        es(1).eval().asInstanceOf[Number].intValue).toAggregateExpression()),
      ("topk_agg", es => TopKAgg(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue).toAggregateExpression()),
      ("ppm_dim", es => PpmDim(es(0),
        es(1).eval().asInstanceOf[Number].intValue)),
      ("png_dim", es => PngDim(es(0),
        es(1).eval().asInstanceOf[Number].intValue)),
      ("normalize_nfc", es => NormalizeNfc(es.head))
    ).foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name), builder))
    }
}

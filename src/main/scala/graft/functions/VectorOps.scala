package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd vector kernels for the similarity operators.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are interpreted —
  * each call allocates per-element and boxes, which dominates ANN workloads
  * (millions of 64-dim dot products). [[DotProductF]] is a native Catalyst
  * `BinaryExpression` with `doGenCode` emitting a tight primitive loop over
  * the two float arrays (double accumulation), keeping the whole similarity
  * pipeline inside whole-stage codegen. Preference order per the build
  * guide: compose built-ins < custom Expression < custom operator; dot
  * product is exactly the "scalar function Spark lacks" case.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product_f expects (array<float>, array<float>), got " +
            s"(${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductF = copy(newLeft, newRight)
}

object VectorOps {
  /** Dot product of two array<float> columns as double (codegen'd). */
  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductF(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** L2 norm of an array<float> column (codegen'd). */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))
}

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
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductF = copy(newLeft, newRight)
}

/** Int8 quantization: `array<float> → array<byte>`, each element
  * `round(x * 127 / scale)` (half away from zero, matching SQL ROUND)
  * clamped to [-127, 127]. At 100 TB this is the shuffle-width lever for
  * ANN: a quantized corpus broadcasts/shuffles at a quarter of the float
  * width and the int dot product stays exact (≤ dim·127² fits an int). */
case class QuantizeF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.ByteType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_f expects (array<float>, double scale), got " +
            s"(${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mult = 127.0 / b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble * mult
      var r = if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
      if (r > 127) r = 127 else if (r < -127) r = -127
      out(i) = r.toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val r = ctx.freshName("r")
      val mult = ctx.freshName("mult")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |double $mult = 127.0d / $s;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ((double) $a.getFloat($i)) * $mult;
         |  double $r = $v >= 0 ? java.lang.Math.floor($v + 0.5d)
         |                      : java.lang.Math.ceil($v - 0.5d);
         |  if ($r > 127d) $r = 127d; else if ($r < -127d) $r = -127d;
         |  $out[$i] = (byte) $r;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QuantizeF = copy(newLeft, newRight)
}

/** Int dot product over two int8-quantized vectors (`array<byte>`),
  * exact integer accumulation. */
case class DotProductQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.ByteType, _),
            ArrayType(org.apache.spark.sql.types.ByteType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product_q expects (array<byte>, array<byte>), got " +
            s"(${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toInt * y.getByte(i).toInt
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((int) $a.getByte($i)) * ((int) $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductQ = copy(newLeft, newRight)
}

object VectorOps {
  /** Dot product of two array<float> columns as double (codegen'd). */
  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductF(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** L2 norm of an array<float> column (codegen'd). */
  def normF(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotF(a, a))

  /** Int8-quantize an array<float> column (codegen'd): round(x·127/scale)
    * clamped to [-127, 127]. */
  def quantize(a: Column, scale: Double): Column =
    GraftSqlBridge.column(QuantizeF(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(scale))))

  /** Exact int dot product of two quantized array<byte> columns
    * (codegen'd). */
  def dotQ(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductQ(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

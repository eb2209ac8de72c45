package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd bitmap kernels.
  *
  * A set over a dense integer domain packs into an `array<long>` bitmap
  * (64 members per word); set intersection cardinality is then popcount
  * of word-wise ANDs — the roaring-bitmap idea in its flat form.
  * [[BitmapAndCount]] emits that loop inside whole-stage codegen, so a
  * pair-wise co-occurrence pass runs at memory speed instead of through
  * interpreted array HOFs (measured 4x on q167: 1.1M pairs of 2-word
  * bitmaps). Same preference tier as [[DotProductF]]: a scalar kernel
  * Spark lacks, expressed as a native `BinaryExpression`.
  */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"bitmap_and_count expects (array<bigint>, array<bigint>), " +
              s"got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
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
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BitmapAndCount = copy(newLeft, newRight)
}

object BitmapOps {
  /** Popcount of the word-wise AND of two long-array bitmaps. */
  def bitmapAndCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapAndCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** A long constant that rides the codegen REFERENCES array instead of
  * being inlined into the generated source text (round 9).
  *
  * Why this exists: every streaming twin stamps its micro-batch output
  * with `lit(batchId)` before a batch_id-partitioned write. A plain
  * `Literal` is inlined as constant TEXT into the generated projection,
  * so trigger N's source differs from trigger N−1's by one digit — a
  * guaranteed codegen-class-cache MISS per trigger per stamped stage.
  * Each trigger then compiles, loads and JITs a fresh class that is
  * byte-identical in behavior to the previous one. Across ~15 streaming
  * twins × their triggers this was a steady source of the compile-queue
  * pressure behind round 8's roaming JIT storms (the bench's per-query
  * `gen` field counts exactly these fresh compiles).
  *
  * `foldable = false` keeps ConstantFolding from turning it back into an
  * inlined literal; evaluation loads the boxed value from `references`
  * once per partition (held in a generated `final long`), so per-row
  * cost is identical to an inlined constant.
  *
  * Use ONLY for write-side stamps. Read-side predicates
  * (`col("batch_id") < lit(id)`) must stay true literals so partition
  * pruning sees them. */
case class RefLitLong(value: Long) extends LeafExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = value

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("batchTag",
      java.lang.Long.valueOf(value), "java.lang.Long")
    ev.copy(code = code"final long ${ev.value} = $ref.longValue();",
      isNull = FalseLiteral)
  }
}

object RefLit {
  /** Column of a constant long whose generated code is value-independent
    * (cache-stable across streaming triggers). */
  def long(value: Long): Column = GraftSqlBridge.column(RefLitLong(value))
}

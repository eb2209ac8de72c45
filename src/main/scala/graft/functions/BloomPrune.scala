package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the explicit form of the runtime-filter
  * optimization: build a compact membership sketch of the (already
  * filtered) build side's join keys, drop probe-side rows that cannot
  * match BEFORE they reach the shuffle, then run the exact join on the
  * survivors. False positives only cost work; the exact join keeps the
  * result correct, so the filter needs no coordination with the oracle.
  *
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling the ~selectivity fraction that can possibly join:
  * the sketch is a few MB regardless of fact size, ships once per
  * executor (broadcast-style reference object inside the codegen'd
  * predicate), and the probe is a branchless bit test inside whole-stage
  * codegen.
  */
object BloomPrune {

  /** Build a bloom filter of a long key column. Distributed build:
    * per-partition filters OR-merged treewise; the result is a bounded
    * O(bits) structure on the driver (like the IVF centroid fetch — a
    * sketch, not the data). */
  def buildLong(df: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter = {
    import df.sparkSession.implicits._
    // null keys can't join anyway, and putLong can't encode them
    df.where(col(key).isNotNull).select(col(key).cast("long")).as[Long].rdd
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (bf, v) => { bf.putLong(v); bf },
        (a, b) => a.mergeInPlace(b))
  }

  /** `might_contain_long(bloom, key)` as a codegen'd predicate Column. */
  def mightContainLong(bloom: BloomFilter, key: Column): Column =
    GraftSqlBridge.column(BloomContainsLong(
      GraftSqlBridge.expression(key), bloom))

  /** Equi-join `fact ⋈ dim` on long keys with bloom pre-pruning of the
    * fact side. `dim` is assumed small post-filter (it is also
    * broadcast); the win is fact rows dropped at scan speed. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = buildLong(dim, dimKey, expectedItems, fpp)
    fact.where(mightContainLong(bf, col(factKey)))
      .join(broadcast(dim), col(factKey) === col(dimKey))
  }
}

/** `bloom.mightContainLong(child)` as a native Catalyst expression. The
  * filter rides along as a plan reference object (serialized once per
  * executor), and the generated code is a direct virtual call — no UDF
  * boxing, stays inside whole-stage codegen. */
case class BloomContainsLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"might_contain_long expects bigint, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      c: Expression): BloomContainsLong = copy(child = c)
}

package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items sketch as a mergeable aggregate.
  *
  * Keeps at most `k` counters per buffer; any key whose true frequency
  * exceeds n/(k+1) is guaranteed to survive, and every kept counter
  * undercounts by at most n/(k+1). The merge (sum counters, then subtract
  * the (k+1)-th largest and drop non-positives) preserves that bound
  * (Agarwal et al., "Mergeable Summaries", PODS 2012) — so partial
  * aggregation applies and each map task ships at most k entries, the same
  * shuffle-width story as [[TopKAgg]].
  *
  * This is the candidate-generation half of the scalable heavy-hitters
  * pattern: sketch → candidate keys → one exact counting pass restricted
  * to the candidates. The second pass makes the final counts exact, which
  * is what the correctness gate checks (the sketch's own counts are
  * estimates and are deliberately not exposed through the gate).
  *
  * Output: `array<bigint>` — the kept keys, ordered by estimated count
  * descending then key ascending (deterministic).
  */
case class FreqAgg(
    keyExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val key = keyExpr.eval(input)
    if (key != null) offer(buf, key.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(a: mutable.LongMap[Long],
      b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreach { case (key, cnt) => a(key) = a.getOrElse(key, 0L) + cnt }
    shrink(a)
    a
  }

  /** Increment `key` by `w`; if that would exceed k counters, decrement
    * all instead (the classic MG step, batched as a shrink). */
  private def offer(buf: mutable.LongMap[Long], key: Long, w: Long): Unit = {
    buf(key) = buf.getOrElse(key, 0L) + w
    if (buf.size > k) shrink(buf)
  }

  /** Restore the ≤ k-counter invariant: subtract the (k+1)-th largest
    * count from every counter and drop the non-positive ones. */
  private def shrink(buf: mutable.LongMap[Long]): Unit = {
    if (buf.size <= k) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
    val keep = buf.iterator.filter(_._2 > sub).toArray
    buf.clear()
    keep.foreach { case (key, cnt) => buf(key) = cnt - sub }
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray.sortBy { case (key, cnt) => (-cnt, key) }
    new GenericArrayData(entries.map(_._1))
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (key, cnt) => bb.putLong(key); bb.putLong(cnt) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    (0 until n).foreach(_ => buf(bb.getLong) = bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqAgg =
    copy(keyExpr = c(0))
}

object FreqAgg {

  /** `freq_sketch(key, k)` as a Column: candidate heavy-hitter keys. */
  def freqSketch(key: Column, k: Int): Column =
    GraftSqlBridge.column(FreqAgg(
      GraftSqlBridge.expression(key), k).toAggregateExpression())
}

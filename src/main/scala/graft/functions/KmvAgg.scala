package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct sketch as a
  * mergeable bounded aggregate.
  *
  * [[TopKAgg]] keeps the k best (score, id) entries but counts
  * DUPLICATE inserts, so building a KMV sketch through it needs a
  * `(key, value) DISTINCT` upstream — a universe-sized shuffle, which
  * is exactly what a sketch exists to avoid. This aggregate is
  * duplicate-IDEMPOTENT (state is a sorted SET of the k smallest
  * values): the raw value stream feeds it directly, partial
  * aggregation combines map-side, and each map task ships at most
  * k longs + 1 bit per group. Union of sketches = sketch of the union,
  * so the same state also powers pairwise set-overlap estimates
  * (q291): merge two sketches, read |A∪B| off the k-th smallest, and
  * Jaccard off the shared-membership count.
  *
  * Output: `struct<sat: boolean, mins: array<bigint>>` — `mins` is
  * ascending and duplicate-free; `sat` records whether any insert was
  * ever rejected/evicted, i.e. whether the true distinct count exceeds
  * k. When `sat` is false the sketch IS the complete value set and
  * every downstream estimate degenerates to the exact answer.
  */
case class KmvAgg(
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buffer] {

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sat", BooleanType, nullable = false),
    StructField("mins", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): KmvAgg.Buffer =
    new KmvAgg.Buffer(k)

  override def update(buf: KmvAgg.Buffer, input: InternalRow): KmvAgg.Buffer = {
    val v = valueExpr.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvAgg.Buffer, b: KmvAgg.Buffer): KmvAgg.Buffer = {
    a.absorb(b)
    a
  }

  override def eval(buf: KmvAgg.Buffer): Any =
    InternalRow(buf.saturated, new GenericArrayData(buf.ascending))

  override def serialize(buf: KmvAgg.Buffer): Array[Byte] = {
    val vs = buf.ascending
    val bb = ByteBuffer.allocate(1 + 4 + vs.length * 8)
    bb.put(if (buf.saturated) 1.toByte else 0.toByte)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val sat = bb.get() == 1
    val n = bb.getInt
    val buf = new KmvAgg.Buffer(k)
    (0 until n).foreach(_ => buf.offer(bb.getLong))
    if (sat) buf.markSaturated()
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvAgg =
    copy(valueExpr = c(0))
}

object KmvAgg {

  /** Sorted duplicate-free set of the k smallest values offered, plus
    * the saturation flag (true iff some value beyond the kept k ever
    * arrived — i.e. the true distinct count exceeds k). */
  final class Buffer(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()
    private var sat = false

    def offer(v: Long): Unit = {
      if (set.contains(v)) return
      if (set.size < k) { set.add(v); () }
      else if (v < set.last()) {
        set.add(v); set.pollLast(); sat = true
      } else sat = true
    }

    def absorb(b: Buffer): Unit = {
      val it = b.set.iterator()
      while (it.hasNext) offer(it.next())
      if (b.sat) sat = true
    }

    def markSaturated(): Unit = sat = true
    def saturated: Boolean = sat
    def ascending: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** `kmv_agg(value, k)` as a Column. */
  def kmvAgg(value: Column, k: Int): Column =
    GraftSqlBridge.column(KmvAgg(
      GraftSqlBridge.expression(value), k).toAggregateExpression())
}

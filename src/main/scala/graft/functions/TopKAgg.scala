package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate.
  *
  * The standard per-key top-k formulation — `row_number().over(Window
  * .partitionBy(k).orderBy(s.desc)) <= n` — shuffles and SORTS every row of
  * every group. This aggregate keeps a k-sized min-heap per group instead:
  * partial aggregation means each map task ships at most k entries per
  * group, and no sort of the full group ever happens. At 100 TB that is the
  * difference between shuffling k rows and shuffling (and sorting) the whole
  * fact table.
  *
  * Concrete element type: (score: Double, id: Long), descending by score
  * with ascending id tie-break — the (measure, key) shape of "top N orders
  * per customer" queries. Output: `array<struct<score:double,id:bigint>>`
  * sorted descending, ready to explode.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buffer, b: TopKAgg.Buffer): TopKAgg.Buffer = {
    b.foreach((s, i) => a.offer(s, i))
    a
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val entries = buf.sortedDesc
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buffer(k)
    (0 until n).foreach(_ => buf.offer(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = c(0), idExpr = c(1))
}

object TopKAgg {

  /** k-bounded min-heap over (score, id) with total order:
    * better = higher score, then lower id (deterministic tie-break). */
  final class Buffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    /** true iff (s1,i1) ranks WORSE than (s2,i2) (lower score or same score
      * with higher id) — the heap root is the worst kept entry. */
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) / 2
        if (worse(scores(c), ids(c), scores(p), ids(p))) {
          swap(c, p); c = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1; val r = l + 1
        var m = p
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == p) return
        swap(p, m); p = m
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      (0 until n).foreach(j => f(scores(j), ids(j)))

    /** Entries best-first (score desc, id asc). */
    def sortedDesc: Array[(Double, Long)] =
      (0 until n).map(j => (scores(j), ids(j))).toArray
        .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
  }

  /** `topk_agg(score, id, k)` as a Column. */
  def topkAgg(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKAgg(
      GraftSqlBridge.expression(score), GraftSqlBridge.expression(id),
      k).toAggregateExpression())
}

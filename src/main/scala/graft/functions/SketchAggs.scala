package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sketch aggregates for the dedup operators, as native Catalyst
  * `TypedImperativeAggregate`s.
  *
  * The naive formulation — 64 separate `min(xxhash64(i, sh))` /
  * `sum(when(bit_j))` aggregate columns — generates enormous whole-stage
  * code whose janino compilation alone costs ~20 s per plan (measured at
  * sf0.1) and stresses the JIT code cache. One imperative aggregate with a
  * primitive-array buffer replaces 64 codegen'd buffers: tiny plan, tiny
  * code, same result, and partial aggregation (map-side combine) still
  * applies — at 100 TB the per-doc signature shuffles as one 512-byte array
  * per group instead of 64 agg columns.
  */

/** XXH64 single-long path (standard public xxHash algorithm) — used as the
  * per-function remix family for MinHash (Spark's XxHash64Function.hashLong
  * is protected). */
private[functions] object XxH64 {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L
  def hashLong(l: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    val k1 = java.lang.Long.rotateLeft(l * P2, 31) * P1
    h ^= k1
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }
}

/** MinHash signature: per group, `minhash_agg(shingle_hash)` returns
  * `array<long>` of NUM_HASHES minima of per-function remixes
  * (XXH64(shingle_hash, seed = i)). */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sh = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = XxH64.hashLong(sh, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}

/** SimHash: per group, `simhash_agg(token_hash)` returns the 64-bit
  * fingerprint long — bit j set iff Σ(±1 by bit j of each token hash) > 0. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val th = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((th >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashAgg = copy(child = c.head)
}

/** Element-wise mean of `array<float>` vectors: per group one
  * `[count, sum_0..sum_{d-1}]` double buffer — the centroid-update step of
  * distributed k-means as a single partial-aggregating buffer (the naive
  * alternative, posexplode + groupBy(cell, dim), shuffles n×dim rows
  * before partial aggregation collapses them; this never explodes). */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  // dimension is data-driven: allocate lazily on the first vector
  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toFloatArray()
      val b = if (buf.isEmpty) new Array[Double](arr.length + 1) else buf
      require(arr.length == b.length - 1,
        s"vector_mean_agg: dimension mismatch in group — saw " +
          s"${b.length - 1}-dim and ${arr.length}-dim vectors")
      b(0) += 1.0
      var i = 0
      while (i < arr.length) { b(i + 1) += arr(i); i += 1 }
      b
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"vector_mean_agg: dimension mismatch across partitions — " +
          s"${a.length - 1} vs ${b.length - 1}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty || buf(0) == 0.0) null
    else new GenericArrayData(
      Array.tabulate(buf.length - 1)(i => (buf(i + 1) / buf(0)).toFloat))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): VectorMeanAgg = copy(child = c.head)
}

object SketchAggs {
  /** minhash_agg(shingleHash): array<long> of 64 minima. */
  def minhashAgg(c: Column): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** simhash_agg(tokenHash): 64-bit fingerprint. */
  def simhashAgg(c: Column): Column =
    GraftSqlBridge.column(
      SimHashAgg(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** vector_mean_agg(vec): element-wise mean of array<float> vectors. */
  def vectorMeanAgg(c: Column): Column =
    GraftSqlBridge.column(
      VectorMeanAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}

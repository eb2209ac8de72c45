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

/** Product-quantization ADC scan kernel: for one micro-quantized vector
  * (array<bigint>), compute struct(est: the asymmetric-distance estimate —
  * per sub-space squared-L2 argmin against the codebook, summed over the
  * precomputed query→centroid table; exact: the full squared L2 to the
  * query). The column-algebra equivalent needs nested `aggregate`/
  * `transform` lambdas, which never enter whole-stage codegen (the q231
  * lesson: interpreted HOF evaluators dominate scan-shaped workloads); this
  * kernel runs the codes-and-distances loop in compiled Java inside the
  * scan stage. Codebook, query, and distance table ride along as
  * broadcast-style reference objects in the generated class — the plan
  * carries three small arrays, not 2 KB of literal text.
  */
case class PqAdc(child: Expression, cents: Array[Array[Long]],
    qv: Array[Long], qd: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("est", LongType, nullable = false),
    StructField("exact", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"pq_adc expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    PqAdc.compute(input.asInstanceOf[ArrayData], cents, qv, qd)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "long[][]")
    val qvRef = ctx.addReferenceObj("pqQv", qv, "long[]")
    val qdRef = ctx.addReferenceObj("pqQd", qd, "long[][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.PqAdc.compute($s, $centsRef, $qvRef, $qdRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAdc = copy(child = newChild)
}

object PqAdc {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Row kernel: codes by per-sub-space argmin (strict <, so the lowest
    * centroid id wins ties — the oracle's MIN(cid) convention), estimate
    * from the query-side distance table, exact squared L2. Called from
    * generated code. */
  def compute(ev: ArrayData, cents: Array[Array[Long]], qv: Array[Long],
      qd: Array[Array[Long]]): InternalRow = {
    val n = qv.length
    val nSub = qd.length
    val dims = n / nSub
    var est = 0L
    var s = 0
    while (s < nSub) {
      var best = Long.MaxValue
      var bc = 0
      var c = 0
      while (c < cents.length) {
        var d = 0L
        var j = 0
        while (j < dims) {
          val diff = ev.getLong(s * dims + j) - cents(c)(s * dims + j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bc = c }
        c += 1
      }
      est += qd(s)(bc)
      s += 1
    }
    var exact = 0L
    var j = 0
    while (j < n) {
      val diff = ev.getLong(j) - qv(j)
      exact += diff * diff
      j += 1
    }
    new GenericInternalRow(Array[Any](est, exact))
  }

  /** Column API entry point. */
  def apply(c: Column, cents: Array[Array[Long]], qv: Array[Long],
      qd: Array[Array[Long]]): Column =
    GraftSqlBridge.column(
      PqAdc(GraftSqlBridge.expression(c), cents, qv, qd))

  /** Micro-quantize (×1000, floor) + ADC in one pass — the raw-float
    * fast path that keeps the interpreted `transform(floor(x*1000))`
    * lambda off the hot scan (it halved q250's sf1 wall by itself).
    * Mirrors `CAST(floor(x * 1000) AS BIGINT)` exactly — which means
    * the product MUST be computed in SINGLE precision: both Spark SQL
    * (float > int in numeric precedence) and DuckDB (typeof FLOAT *
    * 1000 = FLOAT) multiply in FLOAT, and a double-precision product
    * here would floor differently near integer boundaries (e.g.
    * -0.29600000381469727f × 1000: FLOAT product → -296, double
    * product → -297). */
  def computeF(ev: ArrayData, cents: Array[Array[Long]], qv: Array[Long],
      qd: Array[Array[Long]]): InternalRow = {
    val n = qv.length
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val p: Float = ev.getFloat(i) * 1000.0f
      q(i) = math.floor(p.toDouble).toLong
      i += 1
    }
    compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
      cents, qv, qd)
  }
}

/** All LSH hyperplane buckets of one vector in ONE compact kernel:
  * `array<long>`, element t = the bucket of table t — bit b set iff
  * dot(vec, planes(t)(b)) ≥ 0 with the exact [[DotProductF]] arithmetic
  * (double accumulation, ascending index, min-length bound).
  *
  * Why an Expression and not 48 composed `dotF(vec, typedlit(plane))`
  * columns (round 8): the composed form inlines nTables × bits 64-float
  * literals into one generated projection — multi-thousand-line janino
  * methods that HotSpot's C2 chews on for SECONDS each (the bench's
  * per-query `jit` field measured 175 s of compile time inside one
  * 60 s HNSW query window; the storm roamed to a different victim every
  * full-board run) and megabyte task binaries (8.4 MiB broadcast
  * warnings). Here the plane matrix rides ONCE as a codegen reference
  * object and the generated call site is three lines. */
case class HyperplaneBuckets(child: Expression,
    planes: Array[Array[Array[Float]]], bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"hyperplane_buckets expects array<float>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes, bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hpPlanes", planes, "float[][][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.HyperplaneBuckets.compute($s, $planesRef, $bits)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}

object HyperplaneBuckets {
  /** Row kernel, called from generated code. Bit-for-bit the composed
    * `dotF(vec, plane) >= 0` semantics: double accumulation in ascending
    * index order over min(|vec|, |plane|) elements. */
  def compute(v: ArrayData, planes: Array[Array[Array[Float]]],
      bits: Int): ArrayData = {
    val nT = planes.length
    val out = new Array[Long](nT)
    var t = 0
    while (t < nT) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t)(b)
        val n = math.min(v.numElements(), plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v.getFloat(i).toDouble * plane(i).toDouble
          i += 1
        }
        if (acc >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column API entry point. */
  def apply(c: Column, planes: Array[Array[Array[Float]]],
      bits: Int): Column =
    GraftSqlBridge.column(
      HyperplaneBuckets(GraftSqlBridge.expression(c), planes, bits))
}

/** [[PqAdc]] over the raw float embedding: quantization happens inside the
  * kernel, so the scan needs no interpreted transform() at all. */
case class PqAdcF(child: Expression, cents: Array[Array[Long]],
    qv: Array[Long], qd: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("est", LongType, nullable = false),
    StructField("exact", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"pq_adc_f expects array<float>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    PqAdc.computeF(input.asInstanceOf[ArrayData], cents, qv, qd)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "long[][]")
    val qvRef = ctx.addReferenceObj("pqQv", qv, "long[]")
    val qdRef = ctx.addReferenceObj("pqQd", qd, "long[][]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.PqAdc.computeF($s, $centsRef, $qvRef, $qdRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAdcF = copy(child = newChild)
}

object PqAdcF {
  def apply(c: Column, cents: Array[Array[Long]], qv: Array[Long],
      qd: Array[Array[Long]]): Column =
    GraftSqlBridge.column(
      PqAdcF(GraftSqlBridge.expression(c), cents, qv, qd))
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

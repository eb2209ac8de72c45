package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * A crawl corpus mixes composed ("é") and decomposed ("e" + U+0301)
  * encodings of the same text; every downstream exact operation — dedup
  * fingerprints, token counts, vocabulary joins, PII patterns — silently
  * fragments unless the corpus is normalized first, so normalization is
  * the FIRST pass of a text pipeline and must run at scan speed. The JDK
  * normalizer (`java.text.Normalizer`, pure JDK public API) does the work;
  * wrapping it as an Expression keeps the pass inside whole-stage codegen
  * (no UDF boundary, no extra row copy).
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"normalize_nfc expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormalizeNfc.nfc(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"UTF8String.fromString(graft.functions.NormalizeNfc.nfc($s.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeNfc = copy(child = newChild)
}

object NormalizeNfc {
  /** Fast path: `isNormalized` is a cheap scan that avoids allocating for
    * the (overwhelmingly common) already-composed input. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column API entry point. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(NormalizeNfc(GraftSqlBridge.expression(c)))
}

/** Per-document shingle set + MinHash signature as ONE codegen'd kernel:
  * struct(shs: the distinct n-word shingles of the single-space-split
  * text, sigs: k MinHash components, component j = min md5("j:" ++
  * shingle) as lowercase hex).
  *
  * Shingling and signing are row-local, but expressed in column algebra
  * they need either interpreted `transform` lambdas (higher-order
  * functions never enter whole-stage codegen — measured 4-8 s of
  * lambda overhead per pass at sf0.1) or an explode → 16-aggregate
  * groupBy that shuffles the whole shingle stream. The kernel does the
  * n-gram walk and the k×|shingles| MD5 loop in compiled Java inside the
  * scan's codegen stage: no lambda evaluator, no explode, no shuffle.
  * Split semantics match `split(text, " ")` exactly (Java regex, -1
  * limit); md5 hex and its lexicographic min match both engines (hex
  * min ⇔ unsigned digest-byte min).
  */
case class MinHashShingles(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("shs", ArrayType(StringType, containsNull = false)),
    StructField("sigs", ArrayType(StringType, containsNull = false))))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"minhash_shingles expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashShingles.compute(input.asInstanceOf[UTF8String].toString, n, k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.MinHashShingles.compute($s.toString(), $n, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashShingles = copy(child = newChild)
}

object MinHashShingles {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(i * 2) = HEX((b(i) >> 4) & 0xf)
      out(i * 2 + 1) = HEX(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Row kernel: distinct n-word shingles (first-occurrence order) and the
    * k min-md5 signature components. Called from generated code. */
  def compute(text: String, n: Int, k: Int): InternalRow = {
    val parts = text.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= parts.length) {
      val sb = new java.lang.StringBuilder(parts(i))
      var j = 1
      while (j < n) { sb.append(' ').append(parts(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val digest = md.get()
    val mins = new Array[String](k)
    val it = seen.iterator()
    while (it.hasNext) {
      val sh = it.next()
      var s = 0
      while (s < k) {
        val h = hex(digest.digest(
          (s + ":" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
        s += 1
      }
    }
    val shs = new Array[AnyRef](seen.size)
    val sit = seen.iterator()
    var p = 0
    while (sit.hasNext) { shs(p) = UTF8String.fromString(sit.next()); p += 1 }
    val sigs: Array[AnyRef] =
      if (seen.isEmpty) Array.empty
      else mins.map(UTF8String.fromString(_): AnyRef)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(shs), new GenericArrayData(sigs)))
  }

  /** Column API entry point (3-word shingles, 16 components by default —
    * q30/q231's MinHash configuration). */
  def apply(c: Column, n: Int = 3, k: Int = 16): Column =
    GraftSqlBridge.column(MinHashShingles(GraftSqlBridge.expression(c), n, k))
}

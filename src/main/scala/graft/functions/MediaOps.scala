package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Codegen'd media metadata peek.
  *
  * Pruning a multimodal corpus by image dimensions must NOT decode pixels:
  * at 100 TB the difference between "parse 15 header bytes" and "copy
  * w·h·3 pixel bytes per row" is the scan budget. [[PpmDim]] reads the
  * P6 header (magic, whitespace, `#` comments, two ASCII ints) inside
  * whole-stage codegen — a tight byte loop with no allocation — so a
  * dimension filter over binary content stays a codegen'd scan predicate,
  * same tier as [[DotProductF]].
  */
case class PpmDim(child: Expression, idx: Int) extends UnaryExpression {

  require(idx == 1 || idx == 2, s"idx must be 1 (width) or 2 (height)")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"ppm_dim expects binary, got $t")
    }

  /** -1 when the bytes are not a parseable P6 header — malformed media
    * routes to quarantine (q122 pattern) by filtering on the sentinel,
    * not by throwing mid-scan. */
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var res = -1
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      var p = 2; var cur = 0; var in = false; var seen = 0
      while (res == -1 && p < b.length) {
        val c = (b(p) & 0xff).toChar
        if (c == '#') { while (p < b.length && b(p) != '\n') p += 1 }
        else if (c >= '0' && c <= '9') { cur = cur * 10 + (c - '0'); in = true }
        else if (in) {
          seen += 1
          if (seen == idx) res = cur
          cur = 0; in = false
        }
        p += 1
      }
      if (res == -1 && in && seen + 1 == idx) res = cur
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, b => {
      val p = ctx.freshName("p")
      val cur = ctx.freshName("cur")
      val in = ctx.freshName("in")
      val seen = ctx.freshName("seen")
      val res = ctx.freshName("res")
      val c = ctx.freshName("c")
      s"""
         |int $res = -1;
         |if ($b.length >= 2 && $b[0] == (byte) 'P' && $b[1] == (byte) '6') {
         |  int $p = 2; int $cur = 0; boolean $in = false; int $seen = 0;
         |  while ($res == -1 && $p < $b.length) {
         |    char $c = (char) ($b[$p] & 0xff);
         |    if ($c == '#') {
         |      while ($p < $b.length && $b[$p] != (byte) '\\n') $p++;
         |    } else if ($c >= '0' && $c <= '9') {
         |      $cur = $cur * 10 + ($c - '0'); $in = true;
         |    } else if ($in) {
         |      $seen++;
         |      if ($seen == $idx) $res = $cur;
         |      $cur = 0; $in = false;
         |    }
         |    $p++;
         |  }
         |  if ($res == -1 && $in && $seen + 1 == $idx) $res = $cur;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PpmDim =
    copy(child = newChild)
}

/** PNG dimension peek — same tier as [[PpmDim]], simpler layout: after the
  * 8-byte signature the IHDR chunk is mandatory and first, so width and
  * height sit at fixed offsets 16..19 and 20..23 as big-endian u32. Eight
  * byte reads inside whole-stage codegen prune a PNG corpus by dimension
  * without inflating a single scanline. */
case class PngDim(child: Expression, idx: Int) extends UnaryExpression {

  require(idx == 1 || idx == 2, s"idx must be 1 (width) or 2 (height)")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"png_dim expects binary, got $t")
    }

  /** -1 when the bytes are not a PNG with a leading IHDR — malformed media
    * filters on the sentinel (q122 quarantine pattern), never throws
    * mid-scan. */
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var res = -1
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val o = if (idx == 1) 16 else 20
      res = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val off = if (idx == 1) 16 else 20
    nullSafeCodeGen(ctx, ev, b => {
      val res = ctx.freshName("res")
      s"""
         |int $res = -1;
         |if ($b.length >= 24 &&
         |    ($b[0] & 0xff) == 0x89 && $b[1] == (byte) 'P' &&
         |    $b[2] == (byte) 'N' && $b[3] == (byte) 'G' &&
         |    $b[12] == (byte) 'I' && $b[13] == (byte) 'H' &&
         |    $b[14] == (byte) 'D' && $b[15] == (byte) 'R') {
         |  $res = (($b[$off] & 0xff) << 24) | (($b[$off + 1] & 0xff) << 16) |
         |    (($b[$off + 2] & 0xff) << 8) | ($b[$off + 3] & 0xff);
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PngDim =
    copy(child = newChild)
}

/** JPEG dimension peek — the header-walk tier for the lossy mainstream
  * format: segments are walked by their big-endian length fields until a
  * start-of-frame marker (SOF0..SOF15 minus DHT/JPG/DAC), whose payload
  * carries height then width at fixed offsets. A few dozen byte reads
  * inside whole-stage codegen, never an entropy-decode — dimension pruning
  * over a JPEG corpus stays a scan predicate. */
case class JpegDim(child: Expression, idx: Int) extends UnaryExpression {

  require(idx == 1 || idx == 2, s"idx must be 1 (width) or 2 (height)")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"jpeg_dim expects binary, got $t")
    }

  /** -1 when the bytes are not a JPEG with a locatable SOF segment —
    * malformed media filters on the sentinel (q122 quarantine pattern),
    * never throws mid-scan. */
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var res = -1
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var p = 2
      var done = false
      while (!done && p + 9 < b.length) {
        if ((b(p) & 0xff) != 0xff) { done = true }
        else {
          val m = b(p + 1) & 0xff
          if (m == 0xff) { p += 1 } // fill byte
          else if (m >= 0xc0 && m <= 0xcf &&
              m != 0xc4 && m != 0xc8 && m != 0xcc) {
            val o = if (idx == 1) p + 7 else p + 5
            res = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
            done = true
          } else if (m == 0xda || m == 0xd9) { done = true } // SOS / EOI
          else {
            p += 2 + (((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff))
          }
        }
      }
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, b => {
      val res = ctx.freshName("res")
      val p = ctx.freshName("p")
      val m = ctx.freshName("m")
      val o = ctx.freshName("o")
      val done = ctx.freshName("done")
      val off = if (idx == 1) 7 else 5
      s"""
         |int $res = -1;
         |if ($b.length >= 4 && ($b[0] & 0xff) == 0xff &&
         |    ($b[1] & 0xff) == 0xd8) {
         |  int $p = 2; boolean $done = false;
         |  while (!$done && $p + 9 < $b.length) {
         |    if (($b[$p] & 0xff) != 0xff) { $done = true; }
         |    else {
         |      int $m = $b[$p + 1] & 0xff;
         |      if ($m == 0xff) { $p += 1; }
         |      else if ($m >= 0xc0 && $m <= 0xcf &&
         |          $m != 0xc4 && $m != 0xc8 && $m != 0xcc) {
         |        int $o = $p + $off;
         |        $res = (($b[$o] & 0xff) << 8) | ($b[$o + 1] & 0xff);
         |        $done = true;
         |      } else if ($m == 0xda || $m == 0xd9) { $done = true; }
         |      else {
         |        $p += 2 + ((($b[$p + 2] & 0xff) << 8) | ($b[$p + 3] & 0xff));
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JpegDim =
    copy(child = newChild)
}

object MediaOps {
  /** Header-peeked PPM width (-1 if not P6). */
  def ppmWidth(content: Column): Column =
    GraftSqlBridge.column(PpmDim(GraftSqlBridge.expression(content), 1))

  /** Header-peeked PPM height (-1 if not P6). */
  def ppmHeight(content: Column): Column =
    GraftSqlBridge.column(PpmDim(GraftSqlBridge.expression(content), 2))

  /** Header-peeked PNG width (-1 if not PNG/IHDR). */
  def pngWidth(content: Column): Column =
    GraftSqlBridge.column(PngDim(GraftSqlBridge.expression(content), 1))

  /** Header-peeked PNG height (-1 if not PNG/IHDR). */
  def pngHeight(content: Column): Column =
    GraftSqlBridge.column(PngDim(GraftSqlBridge.expression(content), 2))

  /** Header-peeked JPEG width (-1 if no SOF segment found). */
  def jpegWidth(content: Column): Column =
    GraftSqlBridge.column(JpegDim(GraftSqlBridge.expression(content), 1))

  /** Header-peeked JPEG height (-1 if no SOF segment found). */
  def jpegHeight(content: Column): Column =
    GraftSqlBridge.column(JpegDim(GraftSqlBridge.expression(content), 2))
}

package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("GraftExtensions registers SQL functions via withExtensions") {
    val orig = TestSession.spark // ensure the shared context exists
    // getOrCreate would return the existing default session and skip the
    // extensions — clear, build a sibling session on the same context,
    // restore. (Never stop s2: the SparkContext is shared suite-wide.)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
    val r = s2.sql(
      "SELECT dot_product_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
    val mh = s2.sql(
      "SELECT minhash_agg(x) AS sig FROM VALUES (1L), (2L), (3L) t(x)")
      .collect()(0).getSeq[Long](0)
    assert(mh.length == 64)
    // int8 kernels round-trip through SQL: quantize then integer dot
    val dq = s2.sql(
      "SELECT dot_product_q(" +
        "quantize_f(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 1.0D)," +
        "quantize_f(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)), 1.0D))")
      .collect()(0).getInt(0)
    assert(dq == 64 - 64) // round(0.5*127)=64, round(-0.5*127)=-64
    val vm = s2.sql(
      "SELECT vector_mean_agg(v) FROM VALUES " +
        "(array(CAST(1.0 AS FLOAT))), (array(CAST(3.0 AS FLOAT))) t(v)")
      .collect()(0).getSeq[Float](0)
    assert(vm == Seq(2.0f))
  }

  test("freq_sketch and topk_agg are SQL-callable after register()") {
    graft.functions.GraftFunctions.register(spark)
    val hh = spark.sql(
      "SELECT freq_sketch(x, 4) AS cand FROM VALUES " +
        "(1L), (1L), (1L), (2L), (3L) t(x)")
      .collect()(0).getSeq[Long](0)
    assert(hh.contains(1L), s"heavy key missing from $hh")
    val tk = spark.sql(
      "SELECT topk_agg(s, i, 2) AS top FROM VALUES " +
        "(1.0D, 10L), (3.0D, 30L), (2.0D, 20L) t(s, i)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(_.getLong(1)) == Seq(30L, 20L))
  }

  test("normalize_nfc and media dims are SQL-callable after register()") {
    graft.functions.GraftFunctions.register(spark)
    val decomposed = "cafe\u0301" // 'e' + combining acute: 5 code points
    val composed = "caf\u00e9"    // one precomposed code point: 4
    val n = spark.sql(
      s"SELECT length(normalize_nfc('$decomposed')) AS l, " +
        s"length('$decomposed') AS l0")
      .collect()(0)
    assert(n.getInt(0) == 4 && n.getInt(1) == 5,
      s"NFC composition failed: ${n.toString}")
    // interpreted path agrees with codegen
    val e = graft.functions.NormalizeNfc(
      org.apache.spark.sql.catalyst.expressions.Literal(decomposed))
    assert(e.eval(null).toString == composed)
    val png = graft.multimodal.Multimodal.PngCodec.encode(7, 9,
      (_, _) => (1, 2, 3))
    val dims = spark.createDataset(Seq(png))(
        org.apache.spark.sql.Encoders.BINARY).toDF("c")
      .selectExpr("png_dim(c, 1) AS w", "png_dim(c, 2) AS h")
      .collect()(0)
    assert((dims.getInt(0), dims.getInt(1)) == (7, 9))
  }

  test("PngCodec fast-path decode equals per-pixel getRGB on PNG and JPEG") {
    // reference implementation: the pre-optimization per-pixel getRGB loop
    def refDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Byte](w * h * 3)
      var i = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          px(i) = ((rgb >> 16) & 0xff).toByte
          px(i + 1) = ((rgb >> 8) & 0xff).toByte
          px(i + 2) = (rgb & 0xff).toByte
          i += 3; x += 1
        }
        y += 1
      }
      (w, h, px)
    }
    val M = graft.multimodal.Multimodal
    // varied gradient so every channel and position is discriminating
    def pix(x: Int, y: Int) = ((x * 7 + y) % 256, (y * 5 + x) % 256,
      (x * y + 3) % 256)
    val png = M.PngCodec.encode(13, 11, pix)
    val jpg = M.JpegCodec.encode(16, 16, pix)
    for (bytes <- Seq(png, jpg, png, jpg)) { // twice: exercises reader reuse
      val (rw, rh, rp) = refDecode(bytes)
      val (fw, fh, fp) = M.PngCodec.decode(bytes)
      assert((fw, fh) == (rw, rh))
      assert(java.util.Arrays.equals(fp, rp),
        s"fast-path pixels diverge from per-pixel getRGB (${bytes.length}B)")
    }
  }

  test("salted join equals plain join on skewed data") {
    // heavy skew: 90% of rows share key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "row_id")
    val dim = (1L to 1000L).map(k => (k, s"v$k")).toDF("k", "v")
    val plain = big.join(dim, "k").select("row_id", "v").collect().toSet
    val salted = SkewJoin.saltedInnerJoin(big, dim, "k", 8, col("row_id"))
      .select("row_id", "v").collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level checks for the corpus-statistics layer (StatsQueries). */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q256 octiles partition the corpus and the dup total matches the " +
    "exact-dedup summary") {
    val rows = run("q256_dup_growth").collect()
    assert(rows.length == 8)
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "octile doc counts must partition the corpus")
    // cumulative coherence
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) == a.getLong(3) + b.getLong(1))
      assert(b.getLong(4) == a.getLong(4) + b.getLong(2))
    }
    assert(rows.last.getLong(3) == total)
    // total duplicate occurrences = docs − distinct fingerprints (each
    // group of size c contributes c − 1 repeats after its first)
    val s = graft.dedup.Dedup.exactSummary(
      Tables.documents(spark, sf)).head()
    assert(rows.map(_.getLong(2)).sum == s.getLong(2),
      "octile dup totals must equal the exact-dedup dup count")
  }

  test("q258 Zipf head fit: negative slope, bounded R², exact top word") {
    val r = run("q258_zipf_fit").head()
    val (n, slope, r2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n >= 2 && n <= 64)
    assert(slope < 0, s"frequency must fall with rank: slope $slope")
    assert(r2 >= 0 && r2 <= 1000)
    val top = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), " ")).as("w"))
      .groupBy(col("w")).count()
      .orderBy(col("count").desc, col("w")).head()
    assert(r.getString(3) == top.getString(0) &&
      r.getLong(4) == top.getLong(1),
      "top word must match an independent recount")
  }

  test("q259 kappa cells partition the corpus and kappa stays bounded") {
    val r = run("q259_filter_kappa").head()
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(n == Tables.documents(spark, sf).count())
    assert(n11 + n10 + n01 + n00 == n, "2x2 cells must partition")
    val (po, pe, kappa) = (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(po >= 0 && po <= 1000000 && pe >= 0 && pe <= 1000000)
    assert(kappa >= -1000 && kappa <= 1000)
    // independent recount of filter A's marginal
    val aPass = Tables.documents(spark, sf)
      .where(expr("(1000 * size(array_distinct(split(trim(lower(text))," +
        " ' ')))) div size(split(trim(lower(text)), ' '))") >= 500)
      .count()
    assert(n11 + n10 == aPass, "filter-A marginal must match")
  }

  test("q257 integer fit tracks a double-precision recomputation") {
    val r = run("q257_ols_fit").head()
    val (n, slope, r2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0)
    assert(r2 >= 0 && r2 <= 1000, s"R² permille out of range: $r2")
    // independent double-precision recomputation from raw rows
    val xs = Tables.documents(spark, sf).select(
      col("n_chars"),
      expr("(1000 * size(array_distinct(split(trim(lower(text)), ' '))))" +
        " div size(split(trim(lower(text)), ' '))").cast("long"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val nn = xs.length.toDouble
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val cov = nn * sxy - sx * sy
    val vx = nn * sxx - sx * sx
    val vy = nn * syy - sy * sy
    val slopeD = 1e6 * cov / vx
    assert(math.abs(slope - slopeD) <= 1,
      s"slope_micro $slope vs double $slopeD")
    val r2D = 1000.0 * cov * cov / (vx * vy)
    assert(math.abs(r2 - r2D) <= 1, s"r2_permille $r2 vs double $r2D")
  }
}

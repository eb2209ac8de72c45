package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring dedup (SpanQueries q261): the reported longest shared
  * span must equal a brute-force longest-common-token-substring computed
  * directly on the pair's token arrays — the islands arithmetic (run +
  * W − 1) is only correct if window hits really chain on the diagonal. */
class SpanSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def lcsTokens(a: Array[String], b: Array[String]): Int = {
    // O(|a|·|b|) dynamic program — fine for spec-sized inputs
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  test("q261 max span equals the brute-force longest common token run") {
    val rows = SparkEntry.queries("q261_substring_dedup")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "corpus has natural substring dups at sf0.01")
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(lower(col("text"))), " "))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    rows.take(8).foreach { r =>
      val (a, b, span) = (r.getLong(0), r.getLong(1), r.getLong(4))
      val want = lcsTokens(texts(a), texts(b))
      assert(span == want,
        s"pair ($a, $b): reported span $span != brute-force LCS $want")
    }
    // pair set sanity: every reported pair meets the 2W floor and the
    // windows/islands accounting is internally consistent
    rows.foreach { r =>
      val (nWin, nIsl, span) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(span >= 16)
      assert(nWin >= nIsl, "each island holds at least one window")
      assert(span - 7 <= nWin, "max island can't exceed total windows")
    }
  }

  test("q264 increment equals q261 restricted to pairs touching the batch") {
    val full = SparkEntry.queries("q261_substring_dedup")(spark, sf)
      .collect().map(_.toSeq)
      .filter(r => r(0).asInstanceOf[Long] % 10 == 0 ||
        r(1).asInstanceOf[Long] % 10 == 0)
    val incr = SparkEntry.queries("q264_incremental_substring")(spark, sf)
      .collect().map(_.toSeq)
    assert(incr.nonEmpty, "batch must touch at least one span pair")
    assert(incr.toSeq == full.toSeq,
      "the O(batch) increment must find exactly the full-corpus pairs " +
        "that involve a batch document")
  }

  test("q292 suffix classes equal definitional 50-gram string grouping") {
    // Recompute the truth the dumb way: materialize every 50-token gram
    // as a string, group globally, mark positions whose gram repeats.
    // The prefix-doubling class machinery must reproduce it EXACTLY —
    // same marked positions, same coverage union.
    val L = 50
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val planted =
          if (r.getLong(0) % 17 == 0)
            r.getString(1).trim + " " + operators.SpanQueries.SuffixBoiler
          else r.getString(1).trim
        r.getLong(0) -> planted.toLowerCase.split(" ", -1)
      }
    val grams = docs.flatMap { case (did, w) =>
      (0 to w.length - L).map(p => (did, p.toLong, w.slice(p, p + L)
        .mkString(" ")))
    }
    val dupGrams = grams.groupBy(_._3).filter(_._2.length >= 2).keySet
    val marked = grams.filter(g => dupGrams.contains(g._3))
    val expected = docs.map { case (did, w) =>
      val m = marked.filter(_._1 == did)
      val cover = m.flatMap(g => g._2 to (g._2 + L - 1)).toSet
      did -> ((math.max(w.length - L + 1, 0).toLong, m.length.toLong,
        cover.size.toLong))
    }.toMap
    val got = SparkEntry.queries("q292_suffix_dedup")(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // the planted boiler must be FOUND: every 17th doc carries ≥ 11
    // duplicated 50-gram starts and ≥ 60 covered tokens
    val planted = got.filter(_._1 % 17 == 0)
    assert(planted.nonEmpty)
    planted.foreach { case (did, (_, nDup, nCov)) =>
      assert(nDup >= 11 && nCov >= 60,
        s"planted doc $did: nDup=$nDup nCov=$nCov — boiler span missed")
    }
  }
}

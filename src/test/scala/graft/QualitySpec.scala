package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value- and plan-level checks for the model-based quality filters
  * (QualityQueries): the DuckDB gate proves engine equivalence, these prove
  * the SEMANTICS (independent recomputation of a rule, internal coherence
  * of the stats) and the scale shape (broadcast model join, TakeOrdered
  * top-k — never a global sort or a token-stream SMJ). */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSession.sfDir)

  test("q204 per-language surprisal stats are internally coherent") {
    val rows = run("q204_lm_surprisal").collect()
    assert(rows.nonEmpty)
    val langs = rows.map(_.getString(0))
    assert(langs.sameElements(langs.sorted) && langs.contains("en"))
    rows.foreach { r =>
      val (n, avg, mn, mx, fl) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(mn <= avg && avg <= mx, s"stat ordering broken: $r")
      assert(mn >= 1000, s"a smoothed unigram surprisal is >= 1 bit: $r")
      assert(fl >= 0 && fl <= n)
    }
  }

  test("q204 scores through a broadcast model join, never an SMJ") {
    val p = run("q204_lm_surprisal")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream must not sort-merge join:\n$p")
  }

  test("q205 resamples exactly 100 documents, deterministically") {
    val a = run("q205_dsir_resample").collect()
    val b = run("q205_dsir_resample").collect()
    assert(a.map(_.getLong(1)).sum == 100L)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("q205 top-k is a bounded TakeOrdered, not a global sort") {
    val p = run("q205_dsir_resample")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered for the deterministic top-100:\n$p")
  }

  test("q206 bigram backoff stats are coherent and the rate is a permille") {
    val rows = run("q206_bigram_backoff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avg, mn, mx, bk) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(mn <= avg && avg <= mx, s"stat ordering broken: $r")
      assert(bk >= 0 && bk <= 1000, s"backoff rate not a permille: $r")
    }
    // the reference language scores against its own model: every one of
    // its bigrams is seen, so en's backoff rate is exactly zero
    val en = rows.find(_.getString(0) == "en").get
    assert(en.getLong(5) == 0L, s"en backed off against its own model: $en")
  }

  test("q206 scoring joins broadcast both models, never an SMJ") {
    val p = run("q206_bigram_backoff")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bigram stream must not sort-merge join:\n$p")
  }

  test("q208 pipeline funnel is monotone and agrees with q29's dedup") {
    val r = run("q208_pipeline_e2e").collect()(0)
    val (ing, surv, kept, toks, seqs) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(ing >= surv && surv >= kept, s"funnel not monotone: $r")
    assert(seqs == (toks + 2047) / 2048, s"chunk count wrong: $r")
    // the exact-dedup stage must keep exactly q29's distinct count
    val q29 = run("q29_dedup_exact").collect()(0)
    assert(surv == q29.getLong(1),
      s"survivors $surv != q29 n_distinct ${q29.getLong(1)}")
  }

  test("quality queries prune the documents scan to the used columns") {
    // documents has 5 columns; none of these queries touches n_chars, and
    // the rule battery needs ONLY text — Catalyst must push the pruned
    // schema into the parquet scan or a 100 TB corpus reads its metadata
    // columns for nothing.
    val p3 = run("q203_gopher_rules").queryExecution.executedPlan.toString
    assert(p3.contains("ReadSchema: struct<text:string>"),
      s"q203 must scan only text:\n$p3")
    Seq("q204_lm_surprisal", "q205_dsir_resample", "q206_bigram_backoff")
      .foreach { q =>
        val p = run(q).queryExecution.executedPlan.toString
        assert(!p.contains("n_chars"), s"$q reads the unused n_chars:\n$p")
      }
  }

  test("q203 word-count rule matches an independent recomputation") {
    val row = run("q203_gopher_rules").collect()(0)
    val docs = Tables.documents(spark, TestSession.sfDir)
    val nw = size(split(trim(col("text")), " ")).cast("long")
    val expected = docs.where(nw < 50 || nw > 100000).count()
    assert(row.getLong(1) == expected,
      s"fail_word_count ${row.getLong(1)} != independent $expected")
    val nDocs = row.getLong(0)
    val fails = (1 to 5).map(row.getLong)
    assert(row.getLong(6) >= nDocs - fails.sum && row.getLong(6) <= nDocs,
      s"pass count outside the inclusion-exclusion envelope: $row")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value- and plan-level checks for the calibration + curriculum layer
  * (CalibrationQueries). The DuckDB gate proves engine equivalence; these
  * prove the SEMANTICS (logit bounds, estimate-vs-exact coherence, graph
  * degree arithmetic, anneal endpoints, streaming-equals-batch) and the
  * scale shape (broadcast weight table, no cartesian products).
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q230 covers every document and logits stay in the weight range") {
    val rows = run("q230_fasttext_score").collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "per-source doc counts must partition the corpus")
    // w ∈ [0, 14] ⇒ mean-milli ∈ [0, 14000] ⇒ centered logit ∈ ±7000
    assert(rows.forall(r => r.getLong(4) >= -7000 && r.getLong(5) <= 7000))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "kept must not exceed docs")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000)
    }
  }

  test("q230 weight table joins as a broadcast, never SMJ") {
    val p = run("q230_fasttext_score").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"256-row weight table must not SMJ:\n$p")
  }

  test("q231 estimates track exact Jaccard on LSH-surfaced pairs") {
    val rows = run("q231_minhash_calibration").collect()
    assert(rows.nonEmpty, "the band index must surface candidate pairs")
    rows.foreach { r =>
      val (bucket, n, est, exact) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0)
      assert(est >= 0 && est <= 1000 && exact >= 0 && exact <= 1000)
      // bucket b holds pairs with |est − exact| ∈ [100b, 100b+99]; means
      // of the two sides can differ by at most the bucket ceiling
      assert(math.abs(est - exact) <= 100 * bucket + 99)
    }
    // band collision ⇒ 4 matching components ⇒ est ≥ 250 permille
    val minEst = rows.map(_.getLong(2)).min
    assert(minEst >= 250,
      s"banded pairs must share ≥ 4/16 components, got est $minEst")
  }

  test("q232 graph degrees follow the top-3 contract per cell") {
    val rows = run("q232_knn_graph").collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, sf).count(),
      "cells must partition the vector set")
    rows.foreach { r =>
      val (nv, ne, nr, pm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val expectedEdges = nv * math.min(3L, math.max(nv - 1L, 0L))
      assert(ne == expectedEdges,
        s"cell ${r.getLong(0)}: $nv vecs should emit $expectedEdges edges" +
          s", got $ne")
      assert(nr <= ne && pm >= 0 && pm <= 1000)
      // a top-1-of-each-other pair always exists in a non-trivial cell
      if (nv >= 2) assert(nr >= 2, "mutual nearest pair must be reciprocal")
    }
  }

  test("q233 anneal endpoints: uniform at epoch 1, quality at epoch 4") {
    val rows = run("q233_curriculum").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val epochs = rows.map(_._1).distinct.sorted
    assert(epochs.sameElements(Seq(1L, 2L, 3L, 4L)))
    assert(rows.filter(_._1 == 1L).forall(_._3 == 1000L),
      "epoch 1 must be the uniform schedule")
    // within an epoch the shares must sum to ~1000 (floor rounding loses
    // at most one permille per source)
    epochs.foreach { e =>
      val shares = rows.filter(_._1 == e).map(_._5)
      assert(shares.sum <= 1000 &&
        shares.sum > 1000 - shares.length,
        s"epoch $e shares sum ${shares.sum}")
    }
    // epoch-4 weight is exactly the per-source quality score: a source
    // with higher quality must never get a lower epoch-4 weight
    val e4 = rows.filter(_._1 == 4L).sortBy(_._2)
    assert(e4.map(_._3).forall(w => w >= 0 && w <= 1000))
  }

  test("q234 streaming increments merge to exactly the batch M-step") {
    val stream = run("q234_stream_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = SparkEntry.queries("q216_lloyd_round")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch,
      "streamed decimal increments must reproduce the one-shot M-step")
  }

  test("q235 confusion counts are coherent and monotone in threshold") {
    val rows = run("q235_threshold_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).sameElements(Seq(500L, 600L, 700L, 800L, 900L)))
    val nCand = rows.head._2
    assert(rows.forall(_._2 == nCand), "every threshold sees every pair")
    rows.foreach { case (_, n, tp, fp, fn) =>
      assert(tp + fp <= n && tp + fn <= n)
    }
    // predicted-positive count (tp+fp) can only shrink as t rises
    val predPos = rows.map(r => r._3 + r._4)
    assert(predPos.sameElements(predPos.sortBy(-_)),
      s"predicted positives must be antitone in threshold: ${predPos.toSeq}")
    val actPos = rows.map(r => r._3 + r._5)
    assert(actPos.sameElements(actPos.sortBy(-_)),
      s"actual positives must be antitone in threshold: ${actPos.toSeq}")
  }

  test("q236 entropy is bounded by log2(types) and TTR is coherent") {
    val rows = run("q236_source_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp, ttr, hUni) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTyp <= nTok && ttr <= 1000)
      // count-weighted floor-log2 surprisal can't exceed ceil(log2 nTok)
      val cap = 1000L * (64 - java.lang.Long.numberOfLeadingZeros(nTok))
      assert(hUni >= 0 && hUni <= cap, s"h_uni $hUni vs cap $cap")
      assert(r.getLong(5) >= 0, "bigram entropy nonnegative")
    }
  }

  test("q237 stability accounting is internally consistent") {
    val r = run("q237_vocab_stability").collect().head
    val (na, nb, ov, jac, disp) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(na <= 200 && nb <= 200 && ov <= math.min(na, nb))
    assert(jac == 1000L * ov / (na + nb - ov))
    // each shared bigram's rank displacement is < head size
    assert(disp <= ov * 199)
  }

  test("q238 S-curve: volume antitone, recall antitone, superset full") {
    val rows = run("q238_lsh_curve").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(rows.map(_._1).sameElements(Seq(1L, 2L, 4L, 8L)))
    val nTruth = rows.head._3
    assert(rows.forall(_._3 == nTruth), "one shared truth denominator")
    // every config's candidates are a subset of the 16×1 superset
    val sup = rows.head._2
    assert(rows.forall(_._2 <= sup))
    // more rows per band = stricter buckets: candidates and recall
    // can only shrink
    val cands = rows.map(_._2)
    assert(cands.sameElements(cands.sortBy(-_)),
      s"candidate volume must be antitone in rows/band: ${cands.toSeq}")
    val recalls = rows.map(_._5)
    assert(recalls.sameElements(recalls.sortBy(-_)),
      s"recall must be antitone in rows/band: ${recalls.toSeq}")
    // the superset surfaces every truth pair by construction
    assert(rows.head._5 == 1000L && rows.head._4 == nTruth)
    rows.foreach { r => assert(r._4 <= nTruth && r._4 <= r._2) }
  }

  test("q239 language-pair totals recount from the raw dup groups") {
    import spark.implicits._
    val rows = run("q239_lang_copy_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty, "fixture plants cross-language dup groups")
    rows.foreach { case (a, b, n) => assert(a < b && n > 0) }
    // independent recount: sum over groups of C(|langs|, 2) must equal
    // the matrix total
    val fp = md5(concat_ws(",",
      array_sort(array_distinct(split(trim(lower(col("text"))), " ")))))
    val ks = Tables.documents(spark, sf)
      .select(fp.as("fp"), col("lang"))
      .groupBy(col("fp"))
      .agg(size(collect_set(col("lang"))).as("k"), count(lit(1)).as("n"))
      .where(col("n") > 1).select(col("k")).as[Int].collect()
    val expected = ks.map(k => k.toLong * (k - 1) / 2).sum
    assert(rows.map(_._3).sum == expected,
      s"matrix total ${rows.map(_._3).sum} vs C(k,2) recount $expected")
  }

  test("q240 water-filling: feasible, fair, and budget-exhausting") {
    val rows = run("q240_budget_waterfill").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val cap = 6 * total / 10
    val alloc = rows.map(_._3).sum
    assert(rows.forall(r => r._3 <= r._2), "allocation never exceeds demand")
    assert(alloc <= cap, s"allocated $alloc over cap $cap")
    // floor rounding loses less than one token per clipped source
    val nClipped = rows.count(_._4 == 1L)
    assert(cap - alloc < math.max(nClipped, 1),
      s"budget left on the table: cap $cap alloc $alloc")
    // max-min fairness: every clipped source gets the same level, and
    // that level is >= every unclipped demand
    val levels = rows.filter(_._4 == 1L).map(_._3).distinct
    assert(levels.length <= 1, s"clipped sources at levels $levels")
    if (levels.nonEmpty) {
      val funded = rows.filter(_._4 == 0L).map(_._2)
      assert(funded.forall(_ <= levels.head),
        "an unclipped demand exceeds the clip level")
    }
  }

  test("MinHashShingles kernel matches the column-algebra construction") {
    import spark.implicits._
    val docs = Seq("a b c d e", "x y", "dup dup dup dup", "", "a  b c d")
      .toDF("text")
    val kernel = docs.select(
      graft.functions.MinHashShingles(trim(lower(col("text")))).as("mh"))
      .select(col("mh.shs").as("shs"), col("mh.sigs").as("sigs"))
      .collect()
      .map(r => (r.getSeq[String](0).toSet, r.getSeq[String](1)))
    val algebra = docs
      .select(split(trim(lower(col("text"))), " ").as("ws"))
      .select(when(size(col("ws")) >= 3,
        expr("array_distinct(transform(sequence(3, size(ws)), i -> " +
          "concat_ws(' ', element_at(ws, i - 2), " +
          "element_at(ws, i - 1), element_at(ws, i))))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")).as("shs"))
      .select(col("shs"), array((0 until 16).map(k =>
        array_min(transform(col("shs"),
          x => md5(concat(lit(s"$k:"), x))))): _*).as("sigs"))
      .collect()
      .map(r => (r.getSeq[String](0).toSet,
        Option(r.getSeq[String](1)).getOrElse(Seq.empty[String])
          .filter(_ != null)))
    kernel.zip(algebra).foreach { case ((ks, ksig), (as_, asig)) =>
      assert(ks == as_, "shingle sets must agree")
      assert(ksig == asig, "signature components must agree in k order")
    }
  }

  test("q267 isotonic fit equals brute-force PAV, floored to permille") {
    val rows = run("q267_isotonic_calibration").collect()
      .sortBy(_.getLong(0))
    val iso = rows.map(_.getLong(4))
    // non-decreasing by construction of the minimax
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // classic pool-adjacent-violators on the same (weight, positives)
    // bins: merge any adjacent pool whose mean drops, left to right
    val pools = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Int)] // (w, pos, members)
    rows.foreach { r =>
      pools += ((r.getLong(1), r.getLong(2), 1))
      while (pools.length >= 2 && {
        val (w2, p2, _) = pools(pools.length - 1)
        val (w1, p1, _) = pools(pools.length - 2)
        // mean(last) < mean(prev) compared exactly by cross-mult
        p2 * w1 < p1 * w2
      }) {
        val (w2, p2, m2) = pools.remove(pools.length - 1)
        val (w1, p1, m1) = pools.remove(pools.length - 1)
        pools += ((w1 + w2, p1 + p2, m1 + m2))
      }
    }
    val pav = pools.flatMap { case (w, p, m) =>
      Seq.fill(m)(1000L * p / w) // floor(1000 · pool mean)
    }
    assert(iso.toSeq == pav.toSeq,
      s"minimax ${iso.toSeq} != PAV ${pav.toSeq}")
    // and the fit genuinely changed something: raw rates are NOT
    // monotone on this corpus (otherwise the test proves nothing)
    val raw = rows.map(_.getLong(3))
    assert(raw.zip(raw.tail).exists { case (a, b) => a > b },
      "planted noise should produce at least one raw-rate inversion")
  }

  test("no cartesian products anywhere in the calibration layer") {
    Seq("q230_fasttext_score", "q231_minhash_calibration",
      "q232_knn_graph", "q233_curriculum").foreach { n =>
      val p = run(n).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
    }
  }
}

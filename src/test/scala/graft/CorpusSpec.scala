package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value- and plan-level checks for the corpus retrieval + curation queries
  * (CorpusQueries). The DuckDB gate proves engine equivalence; these prove
  * the SEMANTICS (BM25 monotonicity, assignment optimality, quantile-gate
  * arithmetic, growth-curve coherence) and the scale shape (broadcast
  * model/centroid joins, TakeOrdered top-k). */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSession.sfDir)

  test("q211 BM25 scores are nonnegative, sorted, and capped at 20 rows") {
    val rows = run("q211_bm25").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getLong(1))
    assert(scores.forall(_ >= 0))
    assert(scores.sameElements(scores.sortBy(-_)),
      "top-20 must come back score-descending")
  }

  test("q211 rare-term docs outrank common-term-only docs") {
    // 'dup' is the only query term with positive floor-log2 idf on the
    // fixture (df 25/500 vs ~385/500 for spark/vector), so every doc
    // containing it must beat every doc without it.
    val sf = "/root/testdata/sf0.01"
    val top = SparkEntry.queries("q211_bm25")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val dupDocs = Tables.documents(spark, sf)
      .where(expr("array_contains(split(trim(lower(text)), ' '), 'dup')"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top.subsetOf(dupDocs),
      s"non-'dup' docs in the top-20: ${top.diff(dupDocs)}")
  }

  test("q211 top-k is TakeOrdered and the df/stats joins broadcast") {
    val p = run("q211_bm25").queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered for the top-20:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"df join must broadcast, never SMJ:\n$p")
  }

  test("q212 assignment is exhaustive and the E-step is cosine-optimal") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q212_kmeans_assign")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.embeddings(spark, sf).count(),
      "every vector is assigned exactly once")
    // independent optimality check on a slice: the chosen centroid's
    // cosine is the max over all 8 for each of the first 50 vectors
    val emb = Tables.embeddings(spark, sf).where(col("vec_id") < 58)
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val best = emb.crossJoin(broadcast(cents))
      .withColumn("cos",
        graft.similarity.Similarity.cosine(col("embedding"), col("cvec")))
      .groupBy(col("vec_id")).agg(max(col("cos")).as("mx"))
    val chosen = emb.crossJoin(broadcast(cents))
      .withColumn("cos",
        graft.similarity.Similarity.cosine(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") === 1).select(col("vec_id"), col("cos"))
    val j = chosen.join(best, "vec_id")
      .where(col("cos") < col("mx")).count()
    assert(j == 0, "a vector was assigned to a non-optimal centroid")
  }

  test("q212/q214 assignment is a projection: no join, no window, no 8x") {
    Seq("q212_kmeans_assign", "q214_prototypes").foreach { n =>
      val plan = run(n).queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => W}
      assert(plan.collect { case j: Join => j }.isEmpty,
        s"$n: assignment must not join the centroid table")
      assert(plan.collect { case w: W => w }.isEmpty,
        s"$n: assignment must not rank through a window")
    }
  }

  test("q214 per-cluster top-3 goes through the bounded-heap TopKAgg") {
    val p = run("q214_prototypes").queryExecution.executedPlan.toString
    assert(p.contains("topkagg") || p.contains("TopKAgg"),
      s"expected the bounded-heap aggregate, not a sort:\n$p")
  }

  test("q213 windows over the bounded score histogram, not raw documents") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => W}
    val plan = run("q213_quantile_gate").queryExecution.optimizedPlan
    val wins = plan.collect { case w: W => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.size == 2 => a
      }.nonEmpty,
        s"q213 window must sit on the (source, score) histogram:\n$w")
    }
  }

  test("q213 per-source gate keeps exactly floor(3n/10) docs per source") {
    val rows = run("q213_quantile_gate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == n * 3 / 10, s"gate arithmetic broken: $r")
      if (kept > 0)
        assert(r.getLong(3) <= r.getLong(4),
          s"threshold above max score: $r")
    }
  }

  test("q214 emits at most 3 non-seed prototypes per cluster") {
    val rows = run("q214_prototypes").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (cid, rs) =>
      assert(rs.length <= 3, s"cluster $cid has ${rs.length} prototypes")
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length),
        s"cluster $cid ranks not contiguous")
    }
    assert(rows.forall(_.getLong(2) >= 8), "a seed leaked into prototypes")
  }

  test("q216 emits all 8x64 centroid components, means independently right") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q216_lloyd_round")(spark, sf).collect()
    assert(rows.length == 8 * 64)
    rows.groupBy(_.getLong(0)).foreach { case (cid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(0L until 64L),
        s"cluster $cid missing dims")
    }
    // independent mean probe: cluster of vec 0's dim 0 via plain doubles
    // must land within one micro-unit of the decimal-routed value
    // (the decimal route differs from naive double sums only in ulps)
    val emb = Tables.embeddings(spark, sf)
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val all = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val members0 = all.filter { case (_, v) =>
      val best = cents.map { case (c, cv) => (cos(v, cv), -c) }.max
      -best._2 == 0L
    }
    val mean0 = members0.map(_._2.head.toDouble).sum / members0.length
    val got = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 0L)
      .get.getLong(2)
    assert(math.abs(got - math.floor(mean0 * 1e6).toLong) <= 1,
      s"dim-0 mean of cluster 0: got $got micro, probe ${mean0 * 1e6}")
  }

  test("q217 incremental merge equals a from-scratch rebuild") {
    val sf = "/root/testdata/sf0.01"
    val merged = SparkEntry.queries("q217_incremental_index")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rebuilt = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), " ")).as("word"))
      .distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .orderBy(col("word"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(merged.sameElements(rebuilt))
  }

  test("q218 picks exactly 2 docs per cluster, window-free and stable") {
    val a = run("q218_cluster_sample").collect()
    val b = run("q218_cluster_sample").collect()
    assert(a.length == 16, s"expected 8 clusters x 2 picks, got ${a.length}")
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    a.groupBy(_.getLong(0)).foreach { case (cid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(Seq(1L, 2L)),
        s"cluster $cid ranks: ${rs.map(_.getLong(1)).toSeq}")
      assert(rs.map(_.getLong(2)).distinct.length == 2,
        s"cluster $cid picked the same doc twice")
    }
    import org.apache.spark.sql.catalyst.plans.logical.{Window => W}
    val plan = run("q218_cluster_sample").queryExecution.optimizedPlan
    assert(plan.collect { case w: W => w }.isEmpty,
      "q218 must pick through bounded aggregates, not a per-cluster window")
  }

  test("q219 qualified pairs satisfy the exact integer cosine bound") {
    val rows = run("q219_tfidf_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, dot, na, nb) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(a < b, s"pair not ordered: $r")
      assert(4 * dot * dot >= na * nb, s"cos >= 0.5 bound violated: $r")
      val cos = dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      assert(cos >= 0.5 && cos <= 1.0 + 1e-9,
        s"double probe disagrees: cos=$cos for $r")
    }
  }

  test("q219 candidates come only from rare-term postings") {
    // every emitted pair must share at least one term with df <= N/10 —
    // recomputed independently from the raw corpus
    val sf = TestSession.sfDir
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val tf = docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val rare = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .where(col("df") <= math.min(n / 10, 100L)).select(col("w"))
      .collect().map(_.getString(0)).toSet
    val byDoc = tf.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    run("q219_tfidf_pairs").collect().foreach { r =>
      val shared = byDoc(r.getLong(0)).intersect(byDoc(r.getLong(1)))
      assert(shared.exists(rare), s"pair $r shares no rare term")
    }
  }

  test("q220 RRF fusion is rank-coherent and window-free") {
    val rows = run("q220_hybrid_rrf").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val lr = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val vr = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lr.nonEmpty || vr.nonEmpty, s"doc in neither head: $r")
      val expect = lr.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        vr.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"rrf arithmetic broken: $r")
      (lr.toSeq ++ vr.toSeq).foreach(x => assert(x >= 1 && x <= 20))
    }
    val scores = rows.map(_.getLong(3))
    assert(scores.sameElements(scores.sortBy(-_)), "not rrf-descending")
    // a doc present in BOTH heads must outrank any single-arm doc of
    // equal-or-worse ranks; at minimum the fused list is window-free
    import org.apache.spark.sql.catalyst.plans.logical.{Window => W}
    val plan = run("q220_hybrid_rrf").queryExecution.optimizedPlan
    assert(plan.collect { case w: W => w }.isEmpty,
      "q220 must derive ranks from bounded triangle joins, not windows")
  }

  test("q221 streamed quantile gate equals the one-shot batch gate") {
    val batch = run("q213_quantile_gate").collect().map(_.toString)
    val streamed = run("q221_stream_quantile").collect().map(_.toString)
    assert(streamed.sameElements(batch),
      "streaming histogram increments must merge to the batch result")
  }

  test("q222 split is exhaustive and no duplicate group straddles splits") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q222_group_split")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count(),
      "every document lands in exactly one split")
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    // independent leakage probe: per-group split assignment recomputed
    // from raw text must be single-valued per group
    val fp = md5(concat_ws(",",
      array_sort(array_distinct(split(trim(lower(col("text"))), " ")))))
    val perGroup = Tables.documents(spark, sf)
      .select(fp.as("fp"))
      .select(col("fp"),
        substring(md5(concat(lit("split:"), col("fp"))), 1, 1).as("nib"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("nib")).as("k")).where(col("k") > 1).count()
    assert(perGroup == 0)
    // the grouping is non-trivial on this corpus (real multi-member groups)
    val nGroups = rows.map(_.getLong(1)).sum
    assert(nGroups < total, s"expected multi-member groups: $nGroups/$total")
  }

  test("q223 packing account is internally consistent") {
    val r = run("q223_packing_efficiency").collect()(0)
    val (n, tot, concat, perdoc, pad, waste) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(concat <= perdoc, "concat packing never uses more sequences")
    assert(concat == (tot + 2047) / 2048)
    assert(pad == perdoc * 2048 - tot && pad >= 0)
    assert(waste == pad * 1000 / (perdoc * 2048))
    assert(perdoc >= n, "each doc needs at least one block")
  }

  test("q224 CM estimates upper-bound the exact join size") {
    val r = run("q224_join_size_estimate").collect()(0)
    val (exact, e1, e2, emin, err) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(e1 >= exact && e2 >= exact,
      s"CM inner products must only over-count: $r")
    assert(emin == math.min(e1, e2))
    assert(err == (emin - exact) * 1000 / exact && err >= 0)
    // independent exact probe through a real join
    val sf = TestSession.sfDir
    val real = Tables.events(spark, sf).select(col("user_id").as("k"))
      .join(Tables.orders(spark, sf).select(col("o_custkey").as("k")), "k")
      .count()
    val got = SparkEntry.queries("q224_join_size_estimate")(spark, sf)
      .collect()(0).getLong(0)
    assert(got == real, s"exact side $got != real join count $real")
  }

  test("q225 matrix accounts every document and rates are permille") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q225_quality_dup_matrix")(spark, sf)
      .collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, dup, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dup >= 0 && dup <= n)
      assert(pm == dup * 1000 / n, s"permille arithmetic broken: $r")
    }
    // the corpus-level signal: duplicated docs exist and concentrate
    // somewhere (the matrix is not all zeros)
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("q226 matrix pairs are ordered and bounded by the group count") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q226_source_copy_matrix")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) < r.getString(1),
      s"pair not ordered: $r"))
    // each group of k distinct sources contributes C(k,2) pairs; with
    // sources distinct per pair row, total pairs >= number of
    // multi-source groups (independent recount)
    val fp = md5(concat_ws(",",
      array_sort(array_distinct(split(trim(lower(col("text"))), " ")))))
    val multi = Tables.documents(spark, sf)
      .select(fp.as("fp"), col("source"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("source")).as("k"), count(lit(1)).as("n"))
      .where(col("n") > 1)
      .agg(sum(expr("k * (k - 1) div 2"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == multi,
      "matrix total must equal sum of per-group C(k,2)")
  }

  test("q227 per-bucket account: ceilings, totals, and global dominance") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q227_length_buckets")(spark, sf)
      .collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (c, n, tok, pb, pg) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(c % 32 == 0 && c > 0)
      assert(pb == c * n - tok, s"bucket padding identity broken: $r")
      assert(pg >= pb, s"global padding must dominate bucketed: $r")
    }
  }

  test("q228 boilerplate grams really span 5+ sources") {
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q228_boilerplate")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum > 0,
      "fixture must surface real boilerplate trigram mass")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1))
    }
    // independent probe: recompute the boilerplate set and check one
    // gram's source span
    val grams = Tables.documents(spark, sf)
      .select(col("source"), split(trim(lower(col("text"))), " ").as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(3, size(ws)), i -> concat_ws(' ', " +
          "element_at(ws, i - 2), element_at(ws, i - 1), " +
          "element_at(ws, i)))")).as("g"))
    val spans = grams.distinct().groupBy(col("g"))
      .agg(countDistinct(col("source")).as("ns"))
    assert(spans.where(col("ns") >= 5).count() > 0)
  }

  test("q229 streamed index deltas merge to q217's batch index") {
    val streamed = run("q229_stream_index").collect().map(_.toString)
    val batch = run("q217_incremental_index").collect().map(_.toString)
    assert(streamed.sameElements(batch),
      "streaming df deltas must merge to the one-shot index")
  }

  test("q215 growth curve is cumulative-coherent over all 8 octiles") {
    val rows = run("q215_vocab_growth").collect()
    assert(rows.length == 8, "empty octiles must still report")
    assert(rows.map(_.getLong(0)).sameElements(0L until 8L))
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum, s"cum_vocab mismatch at $r")
    }
    assert(cum > 0)
  }

  test("q215 bigram growth matches an independent distinct-count probe") {
    val sf = "/root/testdata/sf0.01"
    val last = SparkEntry.queries("q215_vocab_growth")(spark, sf)
      .collect().last.getLong(2)
    val total = Tables.documents(spark, sf)
      .select(split(trim(lower(col("text"))), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(explode(expr("transform(sequence(2, size(ws)), i -> " +
        "concat(element_at(ws, i - 1), ' ', element_at(ws, i)))")).as("g"))
      .distinct().count()
    assert(last == total,
      s"cumulative vocab $last != corpus bigram types $total")
  }
}

package graft

import graft.functions.{BloomPrune, FreqAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 operators: Misra–Gries heavy hitters, bloom join pruning, ORC
  * ingest, bin-bucketed range join, flatMapGroupsWithState sessions. */
class ExtendedSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def sf = TestSession.sfDir

  // ---- FreqAgg (Misra–Gries) --------------------------------------------

  test("freq sketch nominates every key above the n/(k+1) guarantee") {
    import spark.implicits._
    // 10k rows: keys 0..4 get 1k each (10%), the rest spread over 5k keys
    val rows = (0 until 10000).map { i =>
      if (i % 2 == 0) (i / 1000).toLong else (100L + i % 5000)
    }
    val cands = rows.toDF("hk").repartition(8)
      .agg(FreqAgg.freqSketch(col("hk"), 32))
      .collect()(0).getSeq[Long](0)
    (0L to 4L).foreach { k =>
      assert(cands.contains(k), s"heavy key $k missing from $cands")
    }
    assert(cands.length <= 32, s"sketch overflowed: ${cands.length}")
  }

  test("freq sketch merge is partition-layout independent") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => (i % 7).toLong)
    def run(parts: Int) = rows.toDF("hk").repartition(parts)
      .agg(FreqAgg.freqSketch(col("hk"), 8))
      .collect()(0).getSeq[Long](0).toSet
    // all 7 keys fit in 8 counters — every layout must return exactly them
    assert(run(1) == (0L to 6L).toSet)
    assert(run(13) == (0L to 6L).toSet)
  }

  test("q76 sketch pass partial-aggregates before the exchange") {
    val p = SparkEntry.queries("q76_heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    // the FreqAgg sketch must combine map-side (≤ k entries per task
    // cross the shuffle), not ship raw rows to one reducer
    assert(p.contains("partial_freqagg") || p.contains("partial_FreqAgg")
      || p.toLowerCase.contains("partial_freqagg"),
      s"freq sketch lost map-side partial aggregation:\n$p")
  }

  // ---- BloomPrune -------------------------------------------------------

  test("bloom prune keeps all matches and drops most non-matches") {
    val li = Tables.lineitem(spark, sf)
    val dim = Tables.part(spark, sf)
      .where(col("p_type") === "PROMO" && col("p_size") <= 10)
    val bf = BloomPrune.buildLong(dim, "p_partkey", 100000L)
    val total = li.count()
    val pruned = li.where(
      BloomPrune.mightContainLong(bf, col("l_partkey"))).count()
    val matches = li.join(dim, col("l_partkey") === col("p_partkey"))
      .count()
    assert(pruned >= matches, "bloom dropped a true match")
    // dim keeps ~1/25 of parts; pruned should be well under half the fact
    assert(pruned < total / 2,
      s"bloom pruned nothing: $pruned of $total (matches $matches)")
  }

  test("q74 plan: bloom predicate runs before the join, join broadcasts") {
    val p = SparkEntry.queries("q74_bloom_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("bloomcontainslong"),
      s"bloom predicate missing from plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  // ---- ORC ingest -------------------------------------------------------

  test("q75 plan: predicate reaches the ORC scan") {
    val p = SparkEntry.queries("q75_ingest_orc")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Format: ORC"), s"not an ORC scan:\n$p")
    assert(p.contains("PushedFilters: [") &&
      p.contains("l_quantity"), s"filter not pushed to ORC scan:\n$p")
  }

  // ---- range join -------------------------------------------------------

  test("q78 plan: bin-bucketed range join is hash, not nested-loop") {
    val p = SparkEntry.queries("q78_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    // the events↔windows join must be a hash join on the bin key (the
    // only nested-loop joins allowed are the single-row origin-scalar
    // cross joins feeding both sides)
    assert(p.contains("BroadcastHashJoin [ebin"),
      s"range join did not bucket to an equi-join on bin:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin BuildRight, Inner"),
      s"range predicate fell back to a nested-loop join:\n$p")
  }

  test("q78 result equals the naive range join") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("t"), col("value"))
    val origin = ev.agg(min(col("t")).as("o"))
    val H6 = 21600000000L
    val H9 = 32400000000L
    val windows = spark.range(0, 100).select(col("id").as("w"))
      .crossJoin(broadcast(origin))
      .select(col("w"), (col("o") + col("w") * H6).as("ws"),
        (col("o") + col("w") * H6 + H9).as("we"))
    val naive = ev.join(windows,
        col("t") >= col("ws") && col("t") < col("we"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("w")).collect()
    val bucketed = SparkEntry.queries("q78_range_join")(spark, sf)
      .collect()
    assert(bucketed.toSeq == naive.toSeq)
  }

  // ---- grouping sets ----------------------------------------------------

  test("q79 plan: grouping sets is one Expand, no re-scan union") {
    val p = SparkEntry.queries("q79_grouping_sets")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"no Expand in grouping-sets plan:\n$p")
    assert(!p.contains("Union"), s"grouping sets fell back to union:\n$p")
  }

  // ---- unpivot / stream-static enrich -----------------------------------

  test("q81 plan: unpivot is one Expand, no union of re-scans") {
    val p = SparkEntry.queries("q81_unpivot")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"no Expand in unpivot plan:\n$p")
    assert(!p.contains("Union"), s"unpivot fell back to union:\n$p")
  }

  test("q80 stream-static enrichment equals the batch join") {
    val streamed = SparkEntry.queries("q80_stream_enrich")(spark, sf)
      .collect()
    val batch = Tables.events(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type")).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  // ---- bucketed join / partition overwrite ------------------------------

  test("q87 bucketed join subtree has no shuffle and no sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // plan statically with AQE off so every exchange is visible
    val sp = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries("q87_bucketed_join")(spark, sf)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val smj = sp.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"bucketed join is not a sort-merge join:\n$sp")
    smj.foreach { j =>
      val shuffles = j.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffles:\n$sp")
      val sorts =
        j.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.isEmpty,
        s"bucketed+sorted tables should not re-sort:\n$sp")
    }
  }

  test("q185 key-equality scan prunes to one bucket file") {
    val p = SparkEntry.queries("q185_bucket_pruning")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"scan did not prune buckets:\n$p")
  }

  test("q86 partition-pruned read after dynamic overwrite") {
    // run the query once so the partitioned layout exists with the
    // overwritten purchase partition
    SparkEntry.queries("q86_partition_overwrite")(spark, sf).collect()
    // q86 writes per-run scratch (round 8: it rewrites its table by
    // design, and fixture-tree writes would trip Bench's
    // fixture_writes_during_queries flag) — locate the newest run dir
    val parent = new java.io.File(Scratch.root, "graft_q86_bytype")
    val out = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).maxBy(_.lastModified).getAbsolutePath
    val pruned = spark.read.parquet(out)
      .where(col("event_type") === "purchase")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning on the partitioned layout:\n$p")
    // the overwritten partition carries doubled values
    val doubled = pruned.agg(Det.dsum(col("value"))).collect()(0)
      .getDouble(0)
    val base = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .agg(Det.dsum(col("value") * 2)).collect()(0).getDouble(0)
    assert(doubled == base, s"overwrite lost the doubling: $doubled vs $base")
  }

  // ---- variant / lateral ------------------------------------------------

  test("q88 variant extraction equals string-path get_json_object") {
    val viaVariant = SparkEntry.queries("q88_variant_json")(spark, sf)
      .collect()
    val viaString = Tables.events(spark, sf)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"),
        Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("k_mod")).collect()
    assert(viaVariant.toSeq == viaString.toSeq)
  }

  test("q90 lateral top-k decorrelates — no per-row cartesian loop") {
    val p = SparkEntry.queries("q90_lateral_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"lateral subquery executed as a cartesian product:\n$p")
    assert(p.contains("Window") || p.contains("TakeOrdered"),
      s"expected a decorrelated ranked join:\n$p")
  }

  // ---- IVF index lifecycle ----------------------------------------------

  test("q91 persisted-index probe reads only the probed cell partitions") {
    import graft.operators.ExtendedQueries
    import graft.similarity.Similarity
    val dir = ExtendedQueries.ivfIndexFixture(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val one = emb.where(col("vec_id") === 0)
    val probe = Similarity.ivfTopKIndexed(one, dir, k = 3, nProbe = 2)
    val p = probe.queryExecution.executedPlan.toString
    // literal partition filter on the assignment scan — not a full read
    assert(p.contains("PartitionFilters: [cell#") ||
      p.contains("PartitionFilters: [(cell#") ||
      p.contains("cell IN") || p.contains("cell#"),
      s"no partition filter on the index scan:\n$p")
    assert(probe.count() == 3)
  }

  test("q91 full-probe over the reloaded index equals in-memory IVF") {
    val fromIndex = SparkEntry.queries("q91_ivf_index")(spark, sf)
      .collect()
    val inMemory = SparkEntry.queries("q45_ann_ivf_fullprobe")(spark, sf)
      .collect()
    assert(fromIndex.toSeq == inMemory.toSeq)
  }

  // ---- stateful queries are idempotent -----------------------------------

  // queries with side effects (fixtures, saveAsTable, registry mutation,
  // JDBC, scoped confs) must return the same result when invoked twice in
  // one session — the Verify/Bench harnesses and any real caller rely on it
  for (name <- Seq("q24_collect_job", "q39_catalog_tables",
      "q41_query_registry", "q53_jdbc_sink", "q54_nosql_put",
      "q74_bloom_join", "q86_partition_overwrite", "q87_bucketed_join",
      "q90_lateral_topk", "q91_ivf_index", "q210_stream_neardup",
      "q221_stream_quantile", "q253_stream_frontier",
      "q255_orc_roundtrip")) {
    test(s"$name is idempotent across two invocations") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect()
      val b = fn(spark, sf).collect()
      assert(a.toSeq == b.toSeq, s"$name changed between invocations")
    }
  }

  // ---- transformWithState -----------------------------------------------

  test("q85 transformWithState equals batch totals, conf restored") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val streamed = SparkEntry.queries("q85_transform_with_state")(
      spark, sf).collect()
    assert(spark.conf.getOption(key) == before,
      "RocksDB provider conf leaked out of q85")
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .orderBy(col("user_id")).collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  // ---- flatMapGroupsWithState sessions ----------------------------------

  test("q73 custom-state sessions equal q56 built-in session windows") {
    val a = SparkEntry.queries("q73_sessions_flatmap")(spark, sf).collect()
    val b = SparkEntry.queries("q56_stream_sessions")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
  }
}

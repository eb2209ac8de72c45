package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these queries scale
  * must be visible in the executed plan, not assumed. */
class ExplainSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSession.sfDir)
      .queryExecution.executedPlan.toString

  test("q02 selective filters are pushed to the parquet scan") {
    val p = plan("q02_selective_agg")
    // plan toString truncates long filter lists — match the stable prefix
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected shipdate pushdown in:\n$p")
  }

  test("q05 star join broadcasts the dimension tables") {
    val p = plan("q05_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dims should not sort-merge join:\n$p")
  }

  test("q19 view projection prunes the parquet read schema") {
    val p = plan("q19_view_projection")
    // documents has 5 columns; the Default view reads 3 — `text` must not
    // be scanned.
    assert(p.contains("ReadSchema") && !p.contains("text"),
      s"text column not pruned from scan:\n$p")
  }

  test("q266 identity-sync cascades broadcast the changed-key sets") {
    // auto-broadcast off: at test scale every side fits Spark's own
    // 10 MB threshold, so only the query's explicit broadcast() hints
    // can produce these joins — the channel this test exists to pin
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(abtKey)
    spark.conf.set(abtKey, "-1")
    try {
      val p = plan("q266_identity_sync")
      assert(p.contains("BroadcastHashJoin"),
        s"cascade key sets should broadcast by hint, not shuffle:\n$p")
    } finally spark.conf.set(abtKey, prev)
  }

  test("q33 ANN uses the codegen'd dot-product kernel, not HOFs") {
    val p = plan("q33_ann_brute")
    assert(p.contains("dotproductf") || p.contains("DotProductF"),
      s"custom kernel missing from plan:\n$p")
    assert(!p.contains("zip_with"), s"interpreted HOF in hot path:\n$p")
  }

  test("q01 aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("q16 find-DSL predicate reaches the scan as pushed filters") {
    val p = plan("q16_find_dsl")
    assert(p.contains("PushedFilters:") && p.contains("o_totalprice"),
      s"find-DSL predicate not pushed:\n$p")
  }

  /** The candidate-pair distinct is the corpus-sized shuffle in the
    * similarity pipelines; it must carry bare id pairs, never
    * `array<float>` vector payloads (vectors re-join after the distinct). */
  private def idPairShufflesCarryNoArrays(name: String,
      aCol: String, bCol: String): Unit = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    // sparkPlan predates EnsureRequirements (no exchanges yet) and under
    // AQE the executed plan hides inside AdaptiveSparkPlanExec — so plan
    // statically with AQE off to make every exchange visible.
    val sp = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries(name)(spark, TestSession.sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val pairShuffles = sp.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains(aCol) &&
            e.outputPartitioning.toString.contains(bCol) => e
    }
    assert(pairShuffles.nonEmpty, s"no ($aCol, $bCol) exchange in:\n$sp")
    pairShuffles.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"pair exchange carries an array column: ${e.output}\n$sp")
    }
  }

  test("q59 quantized ANN uses the codegen'd int8 kernels, not HOFs") {
    val p = plan("q59_ann_quantized")
    assert(p.contains("dotproductq") || p.contains("DotProductQ"),
      s"int8 dot kernel missing from plan:\n$p")
    assert(p.contains("quantizef") || p.contains("QuantizeF"),
      s"quantize kernel missing from plan:\n$p")
    assert(!p.contains("transform("), s"interpreted HOF in hot path:\n$p")
  }

  test("q32 embedding near-dup pair shuffle carries no vector payload") {
    idPairShufflesCarryNoArrays("q32_embed_neardup", "id_a", "id_b")
  }

  test("q34 LSH top-k candidate shuffle carries no vector payload") {
    idPairShufflesCarryNoArrays("q34_ann_lsh_exhaustive", "query_id",
      "neighbor_id")
  }

  test("q67 cube runs as one Expand feeding one partial+final aggregate") {
    val p = plan("q67_cube")
    assert(p.contains("Expand"), s"grouping sets should Expand:\n$p")
    assert(p.contains("partial_"),
      s"cube aggregate lost map-side combine:\n$p")
    // one pass over the fact table, not one job per grouping set
    assert("Expand".r.findAllIn(p).size == 1, s"multiple Expands in:\n$p")
  }

  test("q68 pivot with declared values is a single aggregate, no join") {
    val p = plan("q68_pivot")
    assert(!p.contains("Join"), s"pivot should not plan a join:\n$p")
    assert(p.contains("partial_"), s"pivot lost partial aggregation:\n$p")
  }

  test("q66 HLL sketches partial-aggregate before both exchanges") {
    val p = plan("q66_sketch_distinct")
    assert(p.contains("hll_sketch_agg") || p.contains("hll_union_agg"),
      s"sketch aggregates missing from plan:\n$p")
    assert(p.contains("partial_"),
      s"sketch build lost map-side combine:\n$p")
  }

  test("q69 sequence packing shuffles once (the shard window)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sp =
      try SparkEntry.queries("q69_sequence_pack")(spark, TestSession.sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // every hash exchange is keyed by shard alone — the window, the
    // (shard, chunk) and per-shard aggregates all reuse that clustering
    // without re-keying (the only other exchange is the final orderBy's
    // range partitioning)
    val hashExchanges = sp.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical
            .HashPartitioning] => e
    }
    assert(hashExchanges.nonEmpty, s"no hash exchange in:\n$sp")
    assert(hashExchanges.forall(
        _.outputPartitioning.toString.contains("shard")),
      s"an exchange re-keys by something other than shard:\n$sp")
    // and the corpus is scanned exactly once (shard totals roll up from
    // the per-chunk aggregate, not from a second pass over the table)
    val scans = sp.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"corpus scanned ${scans.size}x:\n$sp")
  }

  // ---- round-3 additions ---------------------------------------------------

  test("q110 outlier screen broadcasts the per-type stats, never shuffles") {
    val p = plan("q110_outlier_screen")
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stats join sort-merged:\n$p")
  }

  test("q118 OOV marking is a broadcast anti-join against the tiny vocab") {
    val p = plan("q118_vocab_coverage")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"vocab anti-join not broadcast in:\n$p")
  }

  test("q126 retention reduces the activity matrix before the cohort join") {
    val p = plan("q126_retention")
    // the distinct (user, week) aggregate must sit below the join — a
    // plan joining raw events would shuffle the corpus twice
    val aggIdx = p.indexOf("partial_")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"),
      p.indexOf("BroadcastHashJoin"))
    assert(aggIdx >= 0 && joinIdx >= 0,
      s"expected both agg and join in:\n$p")
  }

  test("q146 winsorize broadcasts rank cutoffs back onto the scan") {
    val p = plan("q146_winsorize")
    assert(p.contains("BroadcastHashJoin"), s"cutoffs not broadcast:\n$p")
  }

  // ---- round-4 additions ---------------------------------------------------

  test("q150 bucket id is value-derived; exactly one range exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sp =
      try SparkEntry.queries("q150_token_shards")(spark, TestSession.sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // the bucket id must be a pure function of doc_id — a
    // spark_partition_id() bucket only matches between the offsets
    // aggregate and the main join when exchange reuse happens to kick in
    assert(!sp.toString.toLowerCase.contains("spark_partition_id"),
      s"q150 bucket derived from physical partition id:\n$sp")
    // the only range exchange is the final orderBy(shard) — the two-pass
    // cumsum itself never range-partitions (its buckets hash on pid)
    val ranges = sp.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(ranges.size == 1,
      s"expected exactly the final sort's range exchange, got " +
        s"${ranges.size}:\n$sp")
  }

  test("q178 span dedup is explode + partial aggregate, no windows") {
    val p = plan("q178_span_dedup")
    assert(p.contains("partial_"),
      s"gram aggregation lost map-side combine:\n$p")
    assert(!p.contains("Window"), s"span dedup should never window:\n$p")
  }

  test("q175 PNG dimension pruning stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q175_png_peek")(spark, TestSession.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter .*pngdim""".r.findFirstIn(p).isDefined,
      s"pngdim filter not codegen'd in:\n$p")
    assert(!p.contains("mapPartitions"),
      "peek must not fall back to a decode pass")
  }

  test("q99 deletion-neighborhood candidates: id-only pair exchange, no cartesian") {
    // The fuzzy join must never plan a product, and the candidate-pair
    // distinct must exchange bare ids — the name payload re-joins only
    // for the bounded verify.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val sp = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries("q99_fuzzy_pairs")(spark, TestSession.sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val p = sp.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"fuzzy join planned a product:\n$p")
    val pairShuffles = sp.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("a_gid") &&
            e.outputPartitioning.toString.contains("b_gid") => e
    }
    assert(pairShuffles.nonEmpty, s"no (a_gid, b_gid) exchange in:\n$sp")
    pairShuffles.foreach { e =>
      assert(!e.output.exists(_.dataType == StringType),
        s"candidate pair exchange carries a string payload: ${e.output}")
    }
  }

  test("q196 tokenizer application broadcasts the vocab, never shuffles it") {
    val df = SparkEntry.queries("q196_bpe_fertility")(spark, TestSession.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"vocab join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side words must not sort-merge against the tiny vocab:\n$p")
  }

  test("q197 epoch shuffle runs as a partial aggregate, no global sort") {
    val df = SparkEntry.queries("q197_epoch_shuffle")(spark, TestSession.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_topk") || p.contains("ObjectHashAggregate"),
      s"TopKAgg must partial-aggregate map-side:\n$p")
    // the only sort is the 15-row final presentation sort; the corpus
    // itself is never globally sorted
    assert(!p.contains("rank(") && !p.contains("row_number("),
      s"no window ranking over the corpus:\n$p")
  }

  test("q193 JPEG dimension pruning stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q193_jpeg_peek")(spark, TestSession.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter .*jpegdim""".r.findFirstIn(p).isDefined,
      s"jpegdim filter not codegen'd in:\n$p")
    assert(!p.contains("mapPartitions"),
      "peek must not fall back to a decode pass")
  }

  test("q191 AUC joins only the bounded score-bucket table, broadcast") {
    val df = SparkEntry.queries("q191_auc_quality")(spark, TestSession.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"AUC must be rank-free (no windows):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bucket-level range join must broadcast, never sort-merge:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the bucket range join as a broadcast NL join:\n$p")
  }

  test("q173 pareto rank/cumsum windows are partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    val lp = SparkEntry.queries("q173_pareto")(spark, TestSession.sfDir)
      .queryExecution.optimizedPlan
    val wins = lp.collect { case w: Window => w }
    assert(wins.exists(_.partitionSpec.nonEmpty),
      s"no partitioned window — the per-bucket rank pass is gone:\n$lp")
    // the only global windows run over the ≤32-row per-bucket offsets
    // aggregate, never over the customer set
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.exists(
            _.toString.contains("pid")) => a
      }.nonEmpty, s"global window not over the pid offsets aggregate:\n$w")
    }
  }

  test("CostModel join strategy flips with the registered stats") {
    import org.apache.spark.sql.functions.col
    val dir = Scratch.runDir("graft_cbostats")
    val cust = Tables.customer(spark, TestSession.sfDir)
      .select(col("c_custkey"), col("c_nationkey").as("nk"))
    val nat = Tables.nation(spark, TestSession.sfDir)
      .select(col("n_nationkey").as("nk"), col("n_name"))
    plans.CostModel.analyze(spark, dir, "customer", cust, Seq("nk"))
    plans.CostModel.analyze(spark, dir, "nation", nat, Seq("nk"))
    // Spark's own byte-size heuristic off: the ONLY broadcast channel
    // left is our stats-driven hint, so the flip below is genuinely the
    // registered stats deciding
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(abtKey)
    spark.conf.set(abtKey, "-1")
    try {
      def planOf(rightName: String) = plans.CostModel
        .planJoin(spark, dir, cust, "customer", nat, rightName, Seq("nk"))
        .queryExecution.executedPlan.toString
      // analyzed 25-row dim under the default 100k budget -> broadcast
      val p1 = planOf("nation")
      assert(p1.contains("BroadcastHashJoin"),
        s"analyzed small dim must broadcast:\n$p1")
      // budget below both analyzed cardinalities -> no hint, sort-merge
      spark.conf.set(plans.CostModel.BroadcastRowsKey, "10")
      val p2 = planOf("nation")
      assert(!p2.contains("BroadcastHashJoin") &&
        p2.contains("SortMergeJoin"),
        s"over-budget stats must fall back to SMJ:\n$p2")
      spark.conf.unset(plans.CostModel.BroadcastRowsKey)
      // (the finally below also unsets it: an assertion failure above
      // must not leak the 10-row budget into the shared session)
      // UNANALYZED sides never broadcast — unknown cardinality must
      // fail safe to the shuffle, not gamble every executor's heap
      val p3 = plans.CostModel
        .planJoin(spark, dir, cust, "no_stats_l", nat, "no_stats_r",
          Seq("nk"))
        .queryExecution.executedPlan.toString
      assert(!p3.contains("BroadcastHashJoin") &&
        p3.contains("SortMergeJoin"),
        s"unanalyzed sides must not broadcast:\n$p3")
    } finally {
      spark.conf.set(abtKey, prev)
      spark.conf.unset(plans.CostModel.BroadcastRowsKey)
    }
  }

  test("CostModel filtered-join plan flips when ONLY the histogram " +
      "changes") {
    import org.apache.spark.sql.functions.col
    val dir = Scratch.runDir("graft_cbo_histflip")
    // Same key distribution (id % 100) in both analyzed shapes, so rows
    // and NDV come out IDENTICAL; only the measured column's
    // distribution — hence only the equi-depth histogram — differs:
    // uniform over [0,1000) vs concentrated in [0,100).
    val factUniform = spark.range(10000).select(
      (col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    val factConcentrated = spark.range(10000).select(
      (col("id") % 100).as("k"),
      (col("id") % 100).cast("double").as("v"))
    plans.CostModel.analyze(spark, dir, "fact_uniform",
      factUniform, Seq("k"), Seq("v"))
    plans.CostModel.analyze(spark, dir, "fact_concentrated",
      factConcentrated, Seq("k"), Seq("v"))
    val su = plans.CostModel.statsOf(spark, dir, "fact_uniform").get
    val sc = plans.CostModel.statsOf(spark, dir, "fact_concentrated").get
    assert(su.rows == sc.rows && su.ndv == sc.ndv,
      s"precondition: rows+ndv must match ($su vs $sc)")
    assert(su.hist("v") != sc.hist("v"),
      "precondition: histograms must differ")
    val dim = spark.range(100).select(col("id").as("k"))
    val pred = Seq(plans.CostModel.RangePred("v", 0, 99.5))
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(abtKey)
    spark.conf.set(abtKey, "-1")
    // budget between the two effective-row estimates: ~1000 (uniform,
    // sel 0.1) vs ~10000 (concentrated, sel 1.0)
    spark.conf.set(plans.CostModel.BroadcastRowsKey, "2000")
    try {
      // the SAME frame both times — the only input that changes between
      // the two plans is which histogram prices the predicate
      def planUnder(statsName: String) = plans.CostModel
        .planFilteredJoin(spark, dir, factUniform, statsName, pred,
          dim, "dim_unanalyzed", Nil, Seq("k"))
      val pU = planUnder("fact_uniform")
      val pC = planUnder("fact_concentrated")
      val sU = pU.queryExecution.executedPlan.toString
      val sC = pC.queryExecution.executedPlan.toString
      assert(sU.contains("BroadcastHashJoin"),
        s"uniform histogram prices the range at ~10% -> under budget " +
          s"-> broadcast:\n$sU")
      assert(!sC.contains("BroadcastHashJoin") &&
        sC.contains("SortMergeJoin"),
        s"concentrated histogram prices the range at ~100% -> over " +
          s"budget -> sort-merge:\n$sC")
      // the decision changed, the answer must not
      assert(pU.count() == pC.count())
    } finally {
      spark.conf.set(abtKey, prev)
      spark.conf.unset(plans.CostModel.BroadcastRowsKey)
    }
  }

  test("q307 prices the range through the fixture histogram and pushes " +
      "the filter to the scan") {
    val p = plan("q307_cbo_filtered_join")
    // the RangePred lands in the parquet scan, not a post-join filter
    assert(p.contains("GreaterThanOrEqual(o_totalprice") ||
      p.contains("PushedFilters: [IsNotNull(o_totalprice)"),
      s"expected o_totalprice pushdown in:\n$p")
    // both sides under the default 100k-row budget at gate scale ->
    // the stats-driven hint must produce a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast in:\n$p")
  }

  test("q309 HNSW adjacency store reads prune to one layer partition") {
    import org.apache.spark.sql.functions.col
    // the persisted graph is layer-partitioned so each descent round
    // reads exactly its layer — the same literal-partition-filter
    // discipline as the IVF cell store (q91)
    val dir = operators.ScaleQueries.hnswIndexFixture(
      spark, TestSession.sfDir)
    val p = spark.read.parquet(s"$dir/adjacency")
      .where(col("layer") === 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(layer") ||
      p.contains("PartitionFilters: [(layer"),
      s"expected layer partition pruning in:\n$p")
  }

  test("q276 TV pair layer joins census rows, totals broadcast, no " +
      "cartesian") {
    val p = plan("q276_source_divergence")
    assert(!p.contains("CartesianProduct"),
      s"vocabulary join went cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"per-source totals should broadcast:\n$p")
  }

  test("q279/q280/q281 share the broadcast pair-grid shape") {
    for (q <- Seq("q279_ks_test", "q280_wasserstein", "q281_mannwhitney")) {
      val p = plan(q)
      // the census joins against the tiny pair frame broadcast-side and
      // the per-pair window is partitioned — no corpus-keyed sort-merge
      assert(!p.contains("SortMergeJoin"),
        s"$q census join sort-merged:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q expected broadcast census joins:\n$p")
    }
  }

  test("q285 attribution resolves as one user_id equi-join, no " +
      "nested loop over events") {
    val p = plan("q285_attribution")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"lookback predicate must ride the equi-join, not a NLJ:\n$p")
  }

  test("q284 resolves both ring layouts broadcast-side, no key shuffle " +
      "join") {
    // the 1088-interval ring and the wrap rows broadcast; the key scan
    // must never enter a shuffled join — at 100 TB of keys a sort-merge
    // here would shuffle the whole corpus twice (once per layout)
    val p = plan("q284_shard_rebalance")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q284 key assignments crossed a shuffled join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast interval joins in:\n$p")
  }

  test("CostModel star join ORDER reorders with the registered stats") {
    import org.apache.spark.sql.functions.col
    val dir = Scratch.runDir("graft_cbo_order")
    val fact = Tables.orders(spark, TestSession.sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, TestSession.sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    // a GROWING "dim": 3 rows per key, so its System-R multiplier
    // (rows / max ndv) prices at ~3 where customer's unique-key join
    // prices at ~1 — the stats must move customer's join FIRST
    val grower = cust.crossJoin(
        spark.range(3).select(col("id").as("g_copy")))
      .select(col("o_custkey"), col("c_name").as("g_name"), col("g_copy"))
    val dims = Seq(
      (grower, "grower", Seq("o_custkey")),
      (cust, "customer", Seq("o_custkey")))
    def treeOf = plans.CostModel.planStarJoin(spark, s"$dir/stats",
        fact, "fact", dims).queryExecution.executedPlan.toString
    // UNANALYZED: both dims unpriceable -> caller order (grower first).
    // The first-joined dim sits in the LEFT (deeper) subtree, printed
    // before the second dim's subtree; grower's subtree leads with its
    // g_name projection.
    assert(plans.CostModel.starJoinOrder(spark, s"$dir/stats", "fact",
      dims.map(d => (d._2, d._3))) == Seq("grower", "customer"))
    val p0 = treeOf
    assert(p0.indexOf("g_name") >= 0 && p0.indexOf("c_name") >= 0)
    assert(p0.indexOf("g_name") < p0.indexOf("c_name"),
      s"without stats the caller's dim order must hold:\n$p0")
    // ANALYZED: the multiplier estimate must flip the order
    plans.CostModel.analyze(spark, s"$dir/stats", "fact", fact,
      Seq("o_custkey"))
    plans.CostModel.analyze(spark, s"$dir/stats", "customer", cust,
      Seq("o_custkey"))
    plans.CostModel.analyze(spark, s"$dir/stats", "grower", grower,
      Seq("o_custkey"))
    assert(plans.CostModel.starJoinOrder(spark, s"$dir/stats", "fact",
      dims.map(d => (d._2, d._3))) == Seq("customer", "grower"))
    val p1 = treeOf
    assert(p1.indexOf("c_name") < p1.indexOf("g_name"),
      s"with stats the selective dim must join first:\n$p1")
    // the reordered star still computes the same rows
    val a = plans.CostModel.planStarJoin(spark, s"$dir/stats", fact,
      "fact", dims).groupBy().count().head().getLong(0)
    val b = fact.join(grower, Seq("o_custkey"))
      .join(cust, Seq("o_custkey")).groupBy().count().head().getLong(0)
    assert(a == b, s"reorder changed the result: $a vs $b")
  }

  test("q294 bootstrap replicate partials combine map-side below the " +
      "exchange") {
    // the 32x explode must feed a PARTIAL (source, r) HashAggregate on
    // the map side — the property that keeps the bootstrap's shuffle at
    // 32x|sources| partial rows instead of 32x the corpus
    val p = plan("q294_poisson_bootstrap")
    val partial = "HashAggregate\\(keys=\\[source[^\\]]*, r[^\\]]*\\]," +
      " functions=\\[partial_sum"
    assert(partial.r.findFirstIn(p).nonEmpty,
      s"no map-side partial (source, r) aggregate in:\n$p")
  }

  test("q298 builds both layouts' zone maps from bounded scans, one " +
      "grouped exchange") {
    // one scan feeds the min/max range aggregate and one the coded rows
    // (layout-key explode doubles ROWS, not scans); the (layout, file)
    // zone-map build is a single grouped exchange pair
    val p = plan("q298_zorder_layout")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <= 2 orders scans, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"unexpected cartesian in:\n$p")
  }

  test("q299 ANF propagates sketches by partial bit_or over hash " +
      "exchanges keyed by vertex") {
    // the per-round sketch merge must be a (v, t)-keyed hash aggregate
    // with map-side partial bit_or — constant-space union, |E|*T-long
    // shuffles. (The final 1-row readout assembly legitimately
    // cross-joins 1x1 frames, so no blanket cartesian assertion here.)
    val p = plan("q299_anf_sketch")
    assert(p.contains("partial_bit_or"),
      s"no map-side partial bit_or in:\n$p")
    assert(p.contains("Exchange hashpartitioning(v"),
      s"sketch rounds must exchange on the vertex key:\n$p")
  }
}

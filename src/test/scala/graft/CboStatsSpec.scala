package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer statistics: ANALYZE TABLE must feed Catalyst real
  * row counts/sizes, and those stats must drive the join strategy — the
  * planner-integration check behind q224's sketch-based estimates. On a
  * 1000-executor cluster this is the difference between a 10 MB broadcast
  * and a full shuffle of the fact table; the spec pins that the stats
  * pipeline actually works end to end in this engine build.
  */
class CboStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Catalyst only propagates rowCount/column stats into plan Statistics
    * when the cost-based optimizer is on (default off — sizeInBytes
    * only). Run `body` with CBO enabled, restoring the previous setting. */
  private def withCbo[A](body: => A): A = {
    val key = "spark.sql.cbo.enabled"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ANALYZE TABLE produces exact row counts in catalog stats and a " +
    "stats-sized table broadcasts under the threshold") {
    spark.sql("DROP TABLE IF EXISTS cbo_nation")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    Tables.nation(spark, sf).write.mode("overwrite")
      .saveAsTable("cbo_nation")
    Tables.orders(spark, sf).write.mode("overwrite")
      .saveAsTable("cbo_orders")
    try withCbo {
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
      val nStats = spark.table("cbo_nation")
        .queryExecution.optimizedPlan.stats
      assert(nStats.rowCount.contains(BigInt(25)),
        s"ANALYZE must record the exact 25-nation row count: $nStats")
      val oStats = spark.table("cbo_orders")
        .queryExecution.optimizedPlan.stats
      val oCount = Tables.orders(spark, sf).count()
      assert(oStats.rowCount.contains(BigInt(oCount)),
        s"ANALYZE must record the orders row count: $oStats")
      // the 25-row dimension is far under the broadcast threshold; the
      // stats must let the planner pick a broadcast join with NO hint
      val joined = spark.table("cbo_orders")
        .join(spark.table("cbo_nation"),
          col("o_custkey") % 25 === col("n_nationkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"stats-sized dimension must broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"a 25-row dimension must never SMJ:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_nation")
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
    }
  }

  test("column-level ANALYZE records NDV the planner can see") {
    spark.sql("DROP TABLE IF EXISTS cbo_lang")
    Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .write.mode("overwrite").saveAsTable("cbo_lang")
    try withCbo {
      spark.sql(
        "ANALYZE TABLE cbo_lang COMPUTE STATISTICS FOR COLUMNS lang")
      val stats = spark.table("cbo_lang")
        .queryExecution.optimizedPlan.stats
      val langStat = stats.attributeStats.find(_._1.name == "lang")
      assert(langStat.nonEmpty, s"lang column stats missing: $stats")
      val ndv = langStat.get._2.distinctCount
      val exact = Tables.documents(spark, sf)
        .select(col("lang")).distinct().count()
      assert(ndv.contains(BigInt(exact)),
        s"NDV must be the exact language count $exact: $ndv")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_lang")
    }
  }

  test("equi-depth histogram selectivity tracks the exact range count " +
      "within a bucket of resolution") {
    import org.apache.spark.sql.functions.col
    val dir = Scratch.runDir("graft_cbohist")
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").as("nk"))
    plans.CostModel.analyze(spark, dir, "customer", cust, Seq("nk"),
      histCols = Seq("c_custkey"))
    val stats = plans.CostModel.statsOf(spark, dir, "customer").get
    val n = cust.count()
    // three ranges of very different widths
    // customer at sf0.001 spans c_custkey 1..150
    for ((lo, hi) <- Seq((1.0, 15.0), (30.0, 90.0), (120.0, 150.0))) {
      val exact = cust.where(col("c_custkey") >= lo &&
        col("c_custkey") <= hi).count().toDouble / n
      val est = plans.CostModel.selectivity(stats,
        plans.CostModel.RangePred("c_custkey", lo, hi)).get
      // equi-depth error bound: one bucket of mass on each boundary
      val tol = 2.0 / plans.CostModel.HistBuckets + 0.01
      assert(math.abs(est - exact) <= tol,
        s"[$lo,$hi]: est $est vs exact $exact (tol $tol)")
    }
    // un-histogrammed column -> None (planner must not guess)
    assert(plans.CostModel.selectivity(stats,
      plans.CostModel.RangePred("nk", 0, 5)).isEmpty)
  }

  test("planFilteredJoin broadcasts on POST-FILTER cardinality, and " +
      "only when the predicate column carries a histogram") {
    import org.apache.spark.sql.functions.col
    val dir = Scratch.runDir("graft_cbohist2")
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").as("nk"))
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey").as("nk"), col("n_name"))
    // customer analyzed twice: once without and once with the histogram
    plans.CostModel.analyze(spark, dir, "cust_nohist", cust, Seq("nk"))
    plans.CostModel.analyze(spark, dir, "cust_hist", cust, Seq("nk"),
      histCols = Seq("c_custkey"))
    val abtKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(abtKey)
    spark.conf.set(abtKey, "-1")
    // budget below the full 150-row customer cardinality but above the
    // ~10% post-filter estimate
    spark.conf.set(plans.CostModel.BroadcastRowsKey, "50")
    try {
      val pred = Seq(plans.CostModel.RangePred("c_custkey", 1, 15))
      def planOf(name: String) = plans.CostModel
        .planFilteredJoin(spark, dir, nat, "nation_unanalyzed", Nil,
          cust, name, pred, Seq("nk"))
        .queryExecution.executedPlan.toString
      // no histogram: the filtered side keeps its full 150-row price
      // -> over budget -> sort-merge
      val p0 = planOf("cust_nohist")
      assert(!p0.contains("BroadcastHashJoin") &&
        p0.contains("SortMergeJoin"),
        s"without a histogram the filter must not be priced:\n$p0")
      // histogram: ~150 effective rows -> under budget -> broadcast
      val p1 = planOf("cust_hist")
      assert(p1.contains("BroadcastHashJoin"),
        s"histogrammed selective filter must flip to broadcast:\n$p1")
      // and the filtered-broadcast join computes the same rows as the
      // plain filter-then-join
      val a = plans.CostModel.planFilteredJoin(spark, dir,
        nat, "nation_unanalyzed", Nil, cust, "cust_hist", pred,
        Seq("nk")).count()
      val b = nat.join(cust.where(col("c_custkey").between(1, 15)),
        Seq("nk")).count()
      assert(a == b, s"filtered join changed the result: $a vs $b")
    } finally {
      spark.conf.set(abtKey, prev)
      spark.conf.unset(plans.CostModel.BroadcastRowsKey)
    }
  }
}

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
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Every registered query runs and yields rows on the smoke-scale data, and
  * every oracle entry points at a registered query. Each query's optimized
  * plan is also linted against the one pattern that silently breaks at
  * cluster scale: an unpartitioned Window over unbounded input (Spark runs
  * it in ONE task — fine at sf0.1, fatal at 100 TB). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Queries allowed to carry an unpartitioned Window: their global window
    * runs over a per-bucket offsets aggregate of ≤ 32 rows (the two-pass
    * prefix-sum pattern), which the lint verifies structurally below. */
  private val boundedGlobalWindow = Set("q150_token_shards", "q173_pareto")

  private def lintWindows(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    val unpart = df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    if (boundedGlobalWindow(name)) {
      // the global window must sit on the tiny pid-grouped offsets
      // aggregate, never on raw rows
      unpart.foreach { w =>
        val onOffsets = w.child.collectFirst {
          case a: Aggregate if a.groupingExpressions.exists(
              _.toString.contains("pid")) => a
        }.nonEmpty
        assert(onOffsets,
          s"$name: global window not over the pid offsets aggregate:\n$w")
      }
    } else {
      assert(unpart.isEmpty,
        s"$name: unpartitioned Window over unbounded input — one task " +
          s"would own every row at scale:\n${unpart.headOption.getOrElse("")}")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, TestSession.sfDir)
      lintWindows(name, df)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

import graft.plans.{AsofJoin, AsofJoinExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  test("as-of join: handcrafted truth table, left-outer and inner") {
    val trades = Seq( // (key, t, trade_id)
      ("A", 10L, 1L), ("A", 20L, 2L), ("A", 35L, 3L),
      ("B", 15L, 4L), ("C", 5L, 5L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq( // (key, t, px)
      ("A", 8L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 99L, 9.0))
      .toDF("qsym", "qt", "px")
    val out = AsofJoin.asof(trades, quotes,
        Seq("sym"), Seq("qsym"), "t", "qt")
      .select($"trade_id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    // A@10 → quote@8; A@20 → quote@20 (ties take ts-equal row);
    // A@35 → quote@30; B@15 → none (only future quote); C → no key
    assert(out == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0),
      4L -> None, 5L -> None))
    val inner = AsofJoin.asof(trades, quotes,
        Seq("sym"), Seq("qsym"), "t", "qt", inner = true)
      .select($"trade_id").as[Long].collect().toSet
    assert(inner == Set(1L, 2L, 3L))
  }

  test("as-of join matches an independent brute-force on real events") {
    val ev = Tables.events(spark, TestSession.sfDir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("t"))
    val cp = Tables.events(spark, TestSession.sfDir)
      .where($"event_type" === "purchase")
      .groupBy($"user_id".as("cp_user"), unix_micros($"ts").as("cp_t"))
      .agg(max($"value").as("pval"))
    val fast = AsofJoin.asof(ev, cp,
        Seq("user_id"), Seq("cp_user"), "t", "cp_t")
      .select($"event_id", $"cp_t", $"pval")
    // brute force: range join + keep the latest checkpoint per event
    val w = Window.partitionBy($"event_id").orderBy($"cp_t".desc)
    val brute = ev.join(cp,
        ev("user_id") === cp("cp_user") && cp("cp_t") <= ev("t"), "left")
      .withColumn("__rn", row_number().over(w))
      .where($"__rn" === 1)
      .select($"event_id", $"cp_t", $"pval")
    assert(fast.count() == ev.count())
    val diff = fast.exceptAll(brute).count() + brute.exceptAll(fast).count()
    assert(diff == 0, s"as-of exec diverges from brute force on $diff rows")
  }

  test("null keys and times match nothing (SQL join semantics)") {
    val trades = Seq(
      (Option("A"), Option(10L), 1L),
      (None: Option[String], Option(10L), 2L), // null key
      (Option("A"), None: Option[Long], 3L))   // null time
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(
      (Option("A"), Option(8L), 1.0),
      (None: Option[String], Option(5L), 9.0)) // null-keyed quote: inert
      .toDF("qsym", "qt", "px")
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), Seq("qsym"),
        "t", "qt")
      .select($"trade_id", $"px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
    val inner = AsofJoin.asof(trades, quotes, Seq("sym"), Seq("qsym"),
        "t", "qt", inner = true)
      .select($"trade_id").as[Long].collect().toSet
    assert(inner == Set(1L))
  }

  test("null-rejecting filter converts left-outer as-of to inner") {
    import graft.plans.AsofJoinPlan
    val trades = Seq(("A", 10L, 1L), ("B", 15L, 4L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 8L, 1.0)).toDF("qsym", "qt", "px")
    val outer = AsofJoin.asof(trades, quotes, Seq("sym"), Seq("qsym"),
      "t", "qt")
    // filter on a right-side column's non-nullness → optimizer flips to
    // inner, and the result equals the explicit inner join
    val filtered = outer.where($"px".isNotNull)
    val nodes = filtered.queryExecution.optimizedPlan.collect {
      case a: AsofJoinPlan => a
    }
    assert(nodes.nonEmpty && nodes.forall(_.inner),
      s"rule did not flip to inner:\n${filtered.queryExecution.optimizedPlan}")
    val inner = AsofJoin.asof(trades, quotes, Seq("sym"), Seq("qsym"),
      "t", "qt", inner = true)
    assert(filtered.collect().toSet == inner.collect().toSet)
    // a left-side-only filter must NOT flip the join
    val leftOnly = AsofJoin.asof(trades, quotes, Seq("sym"), Seq("qsym"),
        "t", "qt").where($"trade_id".isNotNull)
    val kept = leftOnly.queryExecution.optimizedPlan.collect {
      case a: AsofJoinPlan => a
    }
    assert(kept.nonEmpty && kept.forall(!_.inner))
    assert(leftOnly.count() == 2)
  }

  test("as-of plan: custom exec with clustered+sorted children, no cartesian") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ev = Tables.events(spark, TestSession.sfDir)
        .select($"event_id", $"user_id", unix_micros($"ts").as("t"))
      val cp = ev.groupBy($"user_id".as("cp_user"))
        .agg(min($"t").as("cp_t"))
      val plan = AsofJoin.asof(ev, cp,
          Seq("user_id"), Seq("cp_user"), "t", "cp_t")
        .queryExecution.executedPlan
      assert(plan.collect { case e: AsofJoinExec => e }.nonEmpty,
        s"AsofJoinExec missing:\n$plan")
      val s = plan.toString
      assert(!s.contains("Cartesian") && !s.contains("BroadcastNestedLoop"),
        s"as-of join must not plan a product:\n$s")
      assert(s.contains("Exchange hashpartitioning") && s.contains("Sort "),
        s"expected clustered+sorted children:\n$s")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}

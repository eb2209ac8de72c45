package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frontier operators: recursive CTE walk, deterministic hash split,
  * blocked fuzzy pairs, SCD2 history, calendar gap-fill. */
class FrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def sf = TestSession.sfDir

  // ---- q96 recursive CTE ------------------------------------------------

  test("recursive walk depth equals floor(log2(custkey))") {
    // parent(k) = k div 2 with root 1 means depth(k) = floor(log2(k));
    // key 0 never reaches the root and is excluded (matches the oracle)
    val byDepth = SparkEntry.queries("q96_recursive_cte")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = Tables.customer(spark, sf)
      .where(col("c_custkey") >= 1)
      .select(floor(log2(col("c_custkey"))).cast("int").as("d"))
      .groupBy("d").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDepth == expected)
  }

  test("recursive CTE plans as a UnionLoop, not a driver loop") {
    Tables.customer(spark, sf).createOrReplaceTempView("q96_customer")
    val plan = spark.sql(
      """WITH RECURSIVE r(k) AS (
        |  SELECT c_custkey FROM q96_customer
        |  UNION ALL SELECT k div 2 FROM r WHERE k > 1)
        |SELECT count(*) FROM r""".stripMargin)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop"), s"no UnionLoop in:\n$plan")
  }

  // ---- q98 hash split ---------------------------------------------------

  test("hash split is exhaustive, disjoint, and layout-independent") {
    val docs = Tables.documents(spark, sf)
    def splits(parts: Int): Map[String, Long] =
      SparkEntry.queries("q98_hash_split")(
          spark, sf) // registry query reads the table itself
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = splits(2)
    assert(a.values.sum == docs.count(), "split lost or duplicated rows")
    // md5 is uniform: train should dominate (12/16 of the key space)
    assert(a("train") > a.getOrElse("val", 0L) &&
      a("train") > a.getOrElse("test", 0L))
    assert(a == splits(7), "split changed under repartitioning")
  }

  // ---- q99 fuzzy pairs --------------------------------------------------

  test("blocked levenshtein finds planted near-name and skips far ones") {
    import spark.implicits._
    val rows = Seq(
      (1L, 7, "Customer#000000001"),
      (2L, 7, "Customer#000000002"), // dist 1 from #1 → pair
      (3L, 7, "Customer#000099999"), // dist 5 from #1 → no pair
      (4L, 8, "Customer#000000001")  // other nation → no pair with #1
    ).toDF("c_custkey", "c_nationkey", "c_name")
    val a = rows.select(col("c_custkey").as("a_key"),
      col("c_nationkey").as("nat"), col("c_name").as("a_name"),
      length(col("c_name")).as("len"))
    val b = rows.select(col("c_custkey").as("b_key"),
      col("c_nationkey").as("nat"), col("c_name").as("b_name"),
      length(col("c_name")).as("len"))
    val pairs = a.join(b, Seq("nat", "len"))
      .where(col("a_key") < col("b_key") &&
        levenshtein(col("a_name"), col("b_name")) <= 2)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    // #3 is 5 edits from both #1 and #2; #4 is blocked out by nation
    assert(pairs == Set((1L, 2L)))
  }

  test("q99 deletion-neighborhood candidates reproduce the naive blocked join") {
    // The FastSS candidate superset + thresholded verify must yield
    // EXACTLY the (nation, len)-blocked levenshtein ≤ 2 pair accounting
    // the oracle computes — no recall loss, no phantom pairs.
    val c = Tables.customer(spark, TestSession.sfDir).select(
      col("c_custkey"), col("c_nationkey"),
      col("c_name"), length(col("c_name")).as("len"))
    val a = c.toDF("a_key", "nat", "a_name", "len")
    val b = c.toDF("b_key", "nat", "b_name", "len")
    val naive = a.join(b, Seq("nat", "len"))
      .where(col("a_key") < col("b_key") &&
        levenshtein(col("a_name"), col("b_name"), 2) >= 0)
      .groupBy(col("nat"))
      .agg(count(lit(1)).as("n_pairs"), min(col("a_key")).as("min_key"))
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    val got = SparkEntry.queries("q99_fuzzy_pairs")(spark, TestSession.sfDir)
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == naive, s"neighborhood join diverged:\ngot   $got\nnaive $naive")
  }

  // ---- q100 SCD2 --------------------------------------------------------

  test("SCD2 build: planted change log yields expected versions") {
    import spark.implicits._
    // user 1: a a b a → 3 versions, open = 'a'; user 2: b → 1 version
    val log = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "a"),
      (1L, 12L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "b"),
      (1L, 13L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), "a"),
      (2L, 14L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val dir = s"${Scratch.root}/frontier_scd2_${java.util.UUID.randomUUID}"
    log.write.parquet(dir)
    // run the same pipeline shape as q100 over the planted log
    val out = scd2(spark, dir)
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(m(1L) == ((3L, "a")))
    assert(m(2L) == ((1L, "b")))
  }

  private def scd2(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val e = s.read.parquet(dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("t"), col("event_type"))
    val marked = e.withColumn("chg",
      when(lag(col("event_type"), 1).over(byUser) === col("event_type"), 0)
        .otherwise(1))
    val versions = marked
      .withColumn("ver", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("ver"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("t")).as("valid_from"), count(lit(1)).as("n_events"))
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ver"))))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        sum(col("n_events")).as("n_events"),
        max(when(col("valid_to").isNull, col("event_type")))
          .as("open_type"))
  }

  test("q100 plans one shuffle for all three user_id window passes") {
    val plan = SparkEntry.queries("q100_scd2_history")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    // lag + cumsum share (user_id) sort order; groupBy(user_id, ver) and
    // the final groupBy(user_id) reuse the same hash partitioning — the
    // plan must not re-shuffle per window function
    assert(exchanges <= 2, s"$exchanges user_id exchanges in:\n$plan")
  }

  // ---- q97 XML ingest ---------------------------------------------------

  test("XML round trip is lossless row-for-row") {
    import spark.implicits._
    val dir = operators.FrontierQueries.xmlFixture(spark, sf)
    val back = spark.read
      .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderpriority STRING")
      .option("rowTag", "order").format("xml").load(dir)
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "XML round trip changed rows")
  }

  // ---- q102 z-order -----------------------------------------------------

  test("zValue interleaves bits (Morton order)") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(operators.FrontierQueries.zValue(col("x"), col("y")))
      .as[Long].collect()
    // z(5,3) = interleave(101, 011) = y2x2 y1x1 y0x0 = 0 1 | 1 0 | 1 1
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("z-order layout scans fewer rows than the unclustered table") {
    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    }
    val dir = operators.FrontierQueries.zorderFixture(spark, sf)
    val box = (df: org.apache.spark.sql.DataFrame) => df
      .where(col("l_partkey").between(100, 300) &&
        col("l_suppkey").between(2, 5))
      .select(col("l_extendedprice"))
    val clustered = scannedRows(box(spark.read.parquet(dir)))
    val flat = scannedRows(box(Tables.lineitem(spark, sf)))
    // row-group stats on (partkey, suppkey) must prune most of the
    // clustered files; the single-file source table can't skip anything
    assert(clustered < flat,
      s"z-order skipped nothing: clustered=$clustered flat=$flat")
    assert(clustered.toDouble / flat < 0.7,
      s"weak skipping: clustered=$clustered flat=$flat")
  }

  // ---- q105 foreachBatch fan-out ----------------------------------------

  test("foreachBatch multi-sink: batches land once and totals match") {
    val out = SparkEntry.queries("q105_foreach_batch")(spark, sf)
    out.cache()
    try {
      // the query itself cross-checks landing vs snapshot per row
      assert(out.where(!col("sinks_agree")).count() == 0,
        "landing zone and incremental snapshot disagree")
      val expected = Tables.events(spark, sf)
        .groupBy(col("event_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, "incremental totals drifted from batch agg")
    } finally out.unpersist()
  }

  test("multi-batch stream really ran more than one batch") {
    val dir = operators.FrontierQueries.eventsSplitFixture(spark, sf)
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 4, s"split fixture has only $files files")
  }

  // ---- q106 stream-stream left outer join --------------------------------

  test("stream outer join emits both matches and watermark-closed orphans") {
    val out = SparkEntry.queries("q106_stream_outer_join")(spark, sf)
    out.cache()
    try {
      val agg = out.agg(sum("n_rows"), sum("n_matched"), sum("n_orphans"))
        .collect()(0)
      val (rows, matched, orphans) =
        (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      assert(rows == matched + orphans, "rows != matched + orphans")
      assert(orphans > 0, "no null-extended rows — watermark never closed")
      assert(matched > 0, "no matched pairs")
    } finally out.unpersist()
  }

  // ---- q101 gap-fill ----------------------------------------------------

  test("gap-fill emits a complete calendar and zero rows for gaps") {
    val out = SparkEntry.queries("q101_gapfill")(spark, sf)
    out.cache()
    try {
      val o = Tables.orders(spark, sf)
        .select(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
      val Array(days, prios) = o
        .agg(datediff(max(col("day")), min(col("day"))) + 1,
          countDistinct(col("prio")))
        .collect()(0) match {
        case r => Array(r.getInt(0).toLong, r.getLong(1))
      }
      assert(out.count() == days * prios, "incomplete calendar spine")
      val filled = out.where(col("filled"))
      assert(filled.where(col("n") =!= 0 ||
        col("revenue") =!= 0.0).count() == 0,
        "filled rows must be exactly zero")
      val real = out.where(!col("filled")).count()
      assert(real == o.distinct().count(), "real (prio, day) slots wrong")
    } finally out.unpersist()
  }

  test("q268 linkage separates planted matches: high-precision link " +
    "class, bounded leakage") {
    val d = TestSession.sfDir
    val rows = SparkEntry.queries("q268_record_linkage")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (lp, lt, lf) = rows.getOrElse("link", (0L, 0L, 0L))
    val (_, pt, _) = rows.getOrElse("possible", (0L, 0L, 0L))
    val (_, nt, _) = rows.getOrElse("nonlink", (0L, 0L, 0L))
    val truth = Tables.customer(spark, d)
      .where(col("c_custkey") % 3 =!= 0).count() // one match per B row
    assert(lt + pt + nt == truth, "true pairs must partition by class")
    // total classified pairs must equal an INDEPENDENTLY computed
    // blocked-join candidate count — no pair dropped or duplicated
    // between blocking and classification
    val blocked = Tables.customer(spark, d)
      .select(expr("substr(c_name, 10, 7)").as("blk")).as("a")
      .join(Tables.customer(spark, d)
        .where(col("c_custkey") % 3 =!= 0)
        .select(expr("substr(c_name, 10, 7)").as("blk")).as("bb"),
        col("a.blk") === col("bb.blk"))
      .count()
    val allPairs = rows.values.map(_._1).sum
    assert(allPairs == blocked,
      s"classified $allPairs pairs but blocking generates $blocked")
    // the likelihood-ratio gate must genuinely separate: >=90% of the
    // link class true, and <=10% of all true matches lost to nonlink
    assert(lt * 10L >= lp * 9L, s"link precision too low: $lt/$lp")
    assert(nt * 10L <= truth, s"too many true matches in nonlink: $nt")
  }

  // ---- q272 golden-record survivorship ---------------------------------

  test("q272 golden records match an independent survivorship recompute") {
    val d = sf
    case class Src(prio: Int, nm: String, sg: String, bal: Double)
    val base = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    val expected = base.map { case (ck, nm, sg, bal) =>
      val srcs = Seq(Some(Src(1, nm, sg, bal)),
        if (ck % 3 != 0) Some(Src(2,
          if (ck % 11 == 0) nm + "X" else nm,
          if (ck % 5 == 0) "MOVED" else sg,
          if (ck % 7 == 0) bal + 5.0 else bal)) else None,
        if (ck % 4 != 0) Some(Src(3,
          if (ck % 9 == 0) nm.toUpperCase else nm,
          if (ck % 5 == 0) "MOVED"
          else if (ck % 6 == 0) "ONLINE" else sg,
          if (ck % 8 == 0) bal - 3.0 else bal)) else None).flatten
      val gName = srcs.map(_.nm).minBy(n => (-n.length, n))
      val gSeg = srcs
        .map(s => (-srcs.count(_.sg == s.sg), s.prio, s.sg))
        .min._3
      val gBal = srcs.map(_.bal).max
      val mask = srcs.map(s => 1L << s.prio).distinct.sum
      ck -> ((gName, gSeg, gBal, mask, srcs.size.toLong))
    }.toMap
    val got = SparkEntry.queries("q272_golden_record")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expected.keySet, "entity key sets differ")
    expected.foreach { case (ck, e) =>
      assert(got(ck) == e, s"ck=$ck: engine ${got(ck)} vs reference $e")
    }
    // the vote genuinely overturns the base source somewhere: keys seen
    // as MOVED by two sources (B and C) must surface MOVED, not A's value
    val overturned = expected.filter { case (ck, e) =>
      ck % 3 != 0 && ck % 4 != 0 && ck % 5 == 0 && e._2 == "MOVED"
    }
    assert(overturned.nonEmpty, "no key exercises majority-over-base")
    val moved = base.count { case (ck, _, _, _) =>
      ck % 3 != 0 && ck % 4 != 0 && ck % 5 == 0
    }
    assert(overturned.size == moved,
      "every doubly-observed move must win the vote")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Analytics surface: IP enrichment, funnels, retention, histograms,
  * transitions, drift. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def sf = TestSession.sfDir

  test("funnel stages are monotonically shrinking and ordered") {
    import spark.implicits._
    val rows = SparkEntry.queries("q125_funnel")(spark, sf)
      .select("stage", "n_users").as[(Int, Long)].collect().toMap
    assert(rows(1) >= rows(2) && rows(2) >= rows(3),
      s"funnel not monotone: $rows")
    assert(rows(3) > 0, "no user completed the funnel")
  }

  test("funnel ordering is strict: purchase before click does not count") {
    import spark.implicits._
    val us = 60000000L
    // user 1 completes in order; user 2 purchases BEFORE clicking
    val dir = s"${Scratch.root}/an_funnel_${java.util.UUID.randomUUID}"
    Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", us), (1L, 3L, "purchase", 2 * us),
      (2L, 4L, "view", 0L), (2L, 5L, "purchase", us), (2L, 6L, "click", 2 * us)
    ).toDF("user_id", "event_id", "event_type", "t")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_micros(col("t")).as("ts"))
      .write.parquet(dir)
    val e = spark.read.parquet(dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val s1 = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
    val s2 = e.join(s1, "user_id")
      .where(col("event_type") === "click" && col("t") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("t")).as("t2"))
    val s3 = e.join(s2, "user_id")
      .where(col("event_type") === "purchase" && col("t") > col("t2"))
      .select("user_id").as[Long].collect().toSet
    assert(s3 == Set(1L), s"strict ordering violated: $s3")
  }

  test("retention offset zero covers every cohort member") {
    val out = SparkEntry.queries("q126_retention")(spark, sf)
    out.cache()
    try {
      val atZero = out.where(col("week_offset") === 0)
        .agg(sum(col("n_users"))).collect()(0).getLong(0)
      val users = Tables.events(spark, sf)
        .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
      assert(atZero == users,
        s"offset-0 retention $atZero != $users distinct users")
    } finally out.unpersist()
  }

  test("histogram buckets partition every event exactly once") {
    val out = SparkEntry.queries("q127_histogram")(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(out == Tables.events(spark, sf).count())
  }

  test("transition count equals sum of per-user (n_events - 1)") {
    val got = SparkEntry.queries("q128_transitions")(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val expected = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg((count(lit(1)) - 1).as("m"))
      .agg(sum(col("m"))).collect()(0).getLong(0)
    assert(got == expected, s"transitions $got != $expected")
  }

  test("drift halves partition each event type") {
    val out = SparkEntry.queries("q129_drift")(spark, sf)
    out.cache()
    try {
      val byType = out.collect()
        .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(2))).toMap
      val expected = Tables.events(spark, sf)
        .groupBy(col("event_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == expected)
      // both halves are populated (the time range is dense)
      assert(out.where(col("n_early") === 0 || col("n_late") === 0)
        .count() == 0)
    } finally out.unpersist()
  }

  test("mode per group breaks ties lexicographically") {
    import spark.implicits._
    // user 1: a x2, b x2 (tie -> 'a'); user 2: b x2, a x1
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "b"), (2L, "b"), (2L, "a")).toDF("user_id", "event_type")
    val got = df.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(min_by(col("event_type"),
        struct((-col("n")).as("neg"), col("event_type"))).as("top"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b"))
  }

  test("event sequences are in strict (t, event_id) order") {
    val row = SparkEntry.queries("q132_event_sequences")(spark, sf)
      .orderBy(col("user_id")).limit(1).collect()(0)
    // head5 crosses the gate comma-joined; splitting it back pins the
    // element-wise order semantics of the underlying array
    val head5 = row.getString(2).split(",").toSeq
    val expected = Tables.events(spark, sf)
      .where(col("user_id") === row.getLong(0))
      .select(col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(0)))
      .sortBy(x => (x._1, x._2)).take(5).map(_._3).toSeq
    assert(head5 == expected, s"$head5 != $expected")
  }

  test("dataset diff of identical snapshots is all-unchanged") {
    val base = Tables.orders(spark, sf).select(col("o_orderkey"),
      md5(concat_ws("|", col("o_orderkey"), col("o_orderstatus"))).as("h"))
    val r = base.toDF("o_orderkey", "h_old")
      .join(base.toDF("o_orderkey", "h_new"), Seq("o_orderkey"), "full_outer")
      .agg(sum(when(col("h_old").isNull || col("h_new").isNull ||
        col("h_old") =!= col("h_new"), 1L).otherwise(0L)))
      .collect()(0).getLong(0)
    assert(r == 0L, "identity diff must report zero differences")
  }

  test("triangle count matches brute force on the derived graph") {
    import spark.implicits._
    val keys = Tables.customer(spark, sf).select(col("c_custkey"))
      .as[Long].collect()
    val edges = keys.flatMap(k => Seq(k -> (k / 2), k -> (k / 3)))
      .filter { case (k, p) => p >= 1 && k != p }
      .map { case (k, p) => (math.min(k, p), math.max(k, p)) }.toSet
    val adj = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val brute = (for {
      (a, bs) <- adj.toSeq; b <- bs; c <- adj.getOrElse(b, Set.empty)
      if edges.contains((a, c))
    } yield (a, b, c)).size.toLong
    val got = SparkEntry.queries("q141_triangles")(spark, sf)
      .collect()(0).getLong(0)
    assert(got == brute, s"triangles $got != brute $brute")
    assert(got > 0, "degenerate test: graph has no triangles")
  }

  test("HHI stays within its analytic bounds") {
    val bad = SparkEntry.queries("q142_hhi")(spark, sf)
      .where(col("hhi") <= 0.0 || col("hhi") > 1.0)
    assert(bad.count() == 0, "HHI out of (0, 1]")
  }

  test("CDC apply preserves the delete/update/insert row accounting") {
    val r = SparkEntry.queries("q143_cdc_apply")(spark, sf).collect()(0)
    val o = Tables.orders(spark, sf)
    val kept = o.where(col("o_orderkey") % 97 =!= 0).count()
    val ins = o.where(col("o_orderkey") % 101 === 0).count()
    assert(r.getLong(0) == kept + ins,
      s"${r.getLong(0)} != $kept kept + $ins inserted")
  }

  test("LOCF forward-fills exactly from the last non-null observation") {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val byU = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val filled = Seq((1L, 1L, Some(1.0)), (1L, 2L, None), (1L, 3L, None),
      (1L, 4L, Some(4.0)), (1L, 5L, None))
      .toDF("u", "t", "v")
      .withColumn("f", last(col("v").cast(dec), ignoreNulls = true).over(byU))
      .orderBy(col("t"))
      .select(col("f").cast("double")).as[Double].collect().toSeq
    assert(filled == Seq(1.0, 1.0, 1.0, 4.0, 4.0), s"got $filled")
  }

  test("weekly leaderboard keeps at most three ranked users per week") {
    val out = SparkEntry.queries("q139_weekly_top")(spark, sf)
    out.cache()
    try {
      val bad = out.groupBy(col("week")).agg(count(lit(1)).as("c"),
          max(col("rank")).as("mr"))
        .where(col("c") > 3 || col("mr") > 3 || col("c") =!= col("mr"))
      assert(bad.count() == 0, "week with bad rank structure")
    } finally out.unpersist()
  }

  test("union alignment null-pads exactly the source lacking the column") {
    val rows = SparkEntry.queries("q140_union_align")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows("event")._1 == rows("event")._2,
      "every event row must have null priority")
    assert(rows("order")._2 == 0L, "no order row may lose its priority")
  }

  test("bitmap AND-count kernel agrees between codegen and interpreted") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(0xFFL, 0x0FL), Seq(0x0FL, 0xFFL)), // 4 + 4 shared bits
      (2L, Seq(0L, 0L), Seq(-1L, -1L)), // empty ∩ full = 0
      (3L, Seq(-1L), Seq(-1L, -1L)) // length mismatch: min-length prefix
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"),
        functions.BitmapOps.bitmapAndCount(col("a"), col("b")).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 8, 2L -> 0, 3L -> 64), s"$got")
    val e = functions.BitmapAndCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0xFFL, 0x0FL), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0x0FL, 0xFFL), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 8, "interpreted path disagrees")
  }

  test("TWAP weights each reading by its holding time") {
    import spark.implicits._
    // 10 at t=0 held 30s, 40 at t=30 held 10s -> (10*30+40*10)/40 = 17.5
    val us = 1000000L
    val dec = org.apache.spark.sql.types.DecimalType(20, 6)
    val rows = Seq((1L, 1L, 0L, 10.0), (1L, 2L, 30 * us, 40.0),
      (1L, 3L, 40 * us, 99.0)).toDF("user_id", "event_id", "t", "v")
    val got = rows
      .select(col("user_id"), col("event_id"), col("t"),
        col("v").cast(dec).as("v"))
      .withColumn("dur_s",
        expr("(lead(t, 1) OVER (PARTITION BY user_id " +
          "ORDER BY t, event_id) - t) div 1000000"))
      .where(col("dur_s").isNotNull && col("dur_s") > 0)
      .groupBy(col("user_id"))
      .agg((sum(col("v") * col("dur_s")).cast("double") /
        sum(col("dur_s"))).as("twap"))
      .collect()(0).getDouble(1)
    assert(got == 17.5, s"TWAP $got != 17.5")
  }

  test("pseudonym join preserves every raw-key pair") {
    val r = SparkEntry.queries("q159_pseudonymize")(spark, sf).collect()(0)
    assert(r.getBoolean(3), "pseudonym join disagreed with the raw join")
    assert(r.getLong(0) > 0, "degenerate: no joined pairs")
  }

  test("quality rules count a planted violation exactly once") {
    import spark.implicits._
    val df = Seq((10.0, 5.0, "A"), (60.0, -1.0, "A"), (3.0, 2.0, "X"))
      .toDF("l_quantity", "l_extendedprice", "l_returnflag")
    val badQty = sum(when(!col("l_quantity").between(1, 50), 1L)
      .otherwise(0L))
    val badPrice = sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
    val badFlag = sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
      .otherwise(0L))
    val r = df.agg(badQty, badPrice, badFlag).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
  }

  test("breach runs: a broken streak does not alert") {
    import spark.implicits._
    // user 1: 4 consecutive breaches -> one alert of length 4;
    // user 2: 2 breaches, dip, 2 breaches -> no alert (runs of 2)
    val us = 1000000L
    val rows = (1 to 4).map(i => (1L, i.toLong, i * us, 80.0)) ++
      Seq((2L, 11L, us, 80.0), (2L, 12L, 2 * us, 80.0),
        (2L, 13L, 3 * us, 10.0), (2L, 14L, 4 * us, 80.0),
        (2L, 15L, 5 * us, 80.0))
    val df = rows.toDF("user_id", "event_id", "t", "value")
    val byU = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val got = df.withColumn("rn", row_number().over(byU))
      .where(col("value") > 75.0)
      .withColumn("rnb", row_number().over(byU))
      .withColumn("island", col("rn") - col("rnb"))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("run_len"))
      .where(col("run_len") >= 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 4L), s"got $got")
  }

  test("rollup cascade equals the direct monthly aggregate") {
    val cascade = SparkEntry.queries("q162_rollup_cascade")(spark, sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val direct = Tables.orders(spark, sf)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("m"))
      .count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(cascade == direct)
  }

  test("ip enrichment joins only /24 blocks passing the ownership filter") {
    val out = SparkEntry.queries("q124_ip_enrich")(spark, sf)
    out.cache()
    try {
      assert(out.count() <= 25, "owner_nation space is mod 25")
      val joined = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
      val total = Tables.events(spark, sf).count()
      assert(joined > 0 && joined < total,
        s"block filter should keep a strict subset: $joined of $total")
    } finally out.unpersist()
  }

  test("markov transitions: pair accounting and row-normalization bounds") {
    val rows = SparkEntry.queries("q275_markov_transitions")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // every user with k events contributes exactly k-1 transitions
    val perUser = Tables.events(spark, sf)
      .groupBy(col("user_id")).count().collect().map(_.getLong(1))
    val expectedPairs = perUser.map(_ - 1).sum
    assert(rows.map(_._3).sum == expectedPairs,
      s"transition total ${rows.map(_._3).sum} != $expectedPairs")
    // integer row-normalization: each src row's permilles sum to 1000
    // minus at most (fanout - 1) floor losses, never over
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 1000 && s >= 1000 - (rs.length - 1),
        s"$src permille sum $s out of bounds")
      rs.foreach { case (_, dst, n, pm) =>
        val tot = rs.map(_._3).sum
        assert(pm == 1000L * n / tot, s"$src->$dst permille mismatch")
      }
    }
  }

  test("q285 attribution matches an independent lookback recomputation") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val dayUs = 24L * 3600000000L
    // BigDecimal.decimal == valueOf(double) (shortest repr) — the same
    // route Spark's double→DecimalType cast takes
    def money(d: Double): BigDecimal =
      BigDecimal.decimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case class Touch(model: String, hour: Long, v: BigDecimal)
    val touches = ev.filter(_._4 == "purchase").flatMap {
      case (_, uid, pts, _, value) =>
        val v = money(value)
        val cs = clicksByUser.getOrElse(uid, Array.empty)
          .filter(c => c._3 < pts && c._3 >= pts - dayUs)
        if (cs.isEmpty) Seq(Touch("none", -1L, v))
        else {
          val f = cs.minBy(c => (c._3, c._1))
          val l = cs.maxBy(c => (c._3, c._1))
          Seq(Touch("first", (f._3 / 3600000000L) % 24, v),
            Touch("last", (l._3 / 3600000000L) % 24, v))
        }
    }
    val want = touches.groupBy(t => (t.model, t.hour)).map {
      case (k, ts) => k -> ((ts.length.toLong,
        ts.map(_.v).sum.toDouble))
    }
    val got = SparkEntry.queries("q285_attribution")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === want)
    // every purchase is credited exactly once per applicable model
    val nP = ev.count(_._4 == "purchase").toLong
    val byModel = touches.groupBy(_.model).map { case (m, ts) =>
      m -> ts.length.toLong
    }
    assert(byModel.getOrElse("first", 0L) ===
      byModel.getOrElse("last", 0L))
    assert(byModel.getOrElse("first", 0L) +
      byModel.getOrElse("none", 0L) === nP)
  }
}

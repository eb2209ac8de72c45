package graft.operators

import scala.collection.mutable.ArrayBuffer

import graft.{Det, Tables => T}
import graft.functions.{BloomPrune, FreqAgg}
import graft.streaming.StreamingCollect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Round-3 operator surface: custom-state streaming sessionization,
  * bloom-pruned joins, ORC ingest, sketch-then-exact heavy hitters, URL
  * curation, bin-bucketed range join, grouping sets.
  */
object ExtendedQueries {

  /** Per-user state for q73: the currently-open session. */
  final case class SessState(start: Long, last: Long, n: Long)

  /** 12 h in microseconds — q56/q73 share the gap so both check against
    * the same gaps-and-islands oracle. */
  private val GapUs = 43200000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Custom-state sessionization via flatMapGroupsWithState — the typed
    // escape hatch where q56's built-in session_window is the declarative
    // form. State = the one open session per user; a closed session is
    // emitted the moment a ≥ 12 h gap appears, which is what Append-mode
    // flatMapGroupsWithState allows without any watermark coupling. Same
    // two-batch fixture as q56 (real events, then a far-future flush per
    // user): the flush closes every real session; the flush's own
    // singleton session stays open in state and is never emitted. Rows
    // within a batch arrive unordered, so each invocation sorts its
    // group's timestamps — memory is bounded by one user's events per
    // micro-batch (a real deployment bounds that via maxFilesPerTrigger /
    // source admission, same as here).
    "q73_sessions_flatmap" -> ((s, d) => {
      import s.implicits._
      val dir = StreamCatalogQueries.sessionFixture(s, d)
      val schema = s.read.parquet(dir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .select(col("user_id").cast("long").as("uid"),
          unix_micros(col("ts")).as("t"))
        .as[(Long, Long)]
      val closed = stream.groupByKey(_._1)
        .flatMapGroupsWithState[SessState, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (uid, rows, state) =>
            val ts = rows.map(_._2).toArray
            java.util.Arrays.sort(ts)
            var st = state.getOption.getOrElse(SessState(0L, 0L, 0L))
            val out = ArrayBuffer.empty[(Long, Long)]
            ts.foreach { t =>
              if (st.n == 0L) st = SessState(t, t, 1L)
              else if (t - st.last >= GapUs) {
                out += ((uid, st.n)); st = SessState(t, t, 1L)
              } else st = SessState(st.start, t, st.n + 1)
            }
            state.update(st)
            out.iterator
        }.toDF("user_id", "n_events")
      StreamingCollect.runBounded(s, closed, "q73_sessions_flatmap_sink",
          outputMode = "append")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).cast("long").as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Bloom-pruned dimension join: the filtered dim's keys become a
    // compact membership sketch, fact rows that cannot match are dropped
    // at scan speed before any join/shuffle, then the exact broadcast
    // join runs on the survivors. The pruning is correctness-transparent
    // (false positives die in the exact join), so the oracle is the
    // plain join.
    "q74_bloom_join" -> ((s, d) => {
      val dim = T.part(s, d)
        .where(col("p_type") === "PROMO" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_retailprice"))
      BloomPrune.prunedJoin(T.lineitem(s, d), dim,
          "l_partkey", "p_partkey", expectedItems = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // ORC ingest (columnar source beyond parquet/CSV/JSON/ZIP): the
    // fixture round-trips lineitem through ORC files, and the query
    // reads them back with a pushable predicate — ExplainSpec asserts
    // the filter reaches the ORC scan just like the parquet paths.
    "q75_ingest_orc" -> ((s, d) => {
      val dir = orcFixture(s, d)
      s.read.orc(dir)
        .where(col("l_quantity") <= 25 && col("l_discount") > 0.02)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Heavy hitters, sketch-then-exact: a mergeable Misra–Gries pass
    // nominates candidate keys (≤ k per map task cross the shuffle — see
    // [[graft.functions.FreqAgg]]), then one exact counting pass
    // restricted to the candidates. Any key above n/(k+1) of the mass is
    // guaranteed nominated, and the synthesized key column puts ~10 % of
    // all rows on each of 5 keys (k = 32), so the exact top-5 is
    // provably inside the candidate set — which is why the plain SQL
    // top-5 is a valid oracle for the two-pass pipeline.
    "q76_heavy_hitters" -> ((s, d) => {
      val keyed = T.lineitem(s, d).select(
        when(col("l_orderkey") % 2 === 0, col("l_orderkey") % 5)
          .otherwise(lit(100) + (col("l_orderkey") % 100000))
          .cast("long").as("hk"))
      val cands = keyed
        .agg(FreqAgg.freqSketch(col("hk"), 32).as("cand"))
        .select(explode(col("cand")).as("hk"))
      keyed.join(broadcast(cands), "hk")
        .groupBy(col("hk")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("hk"))
        .limit(5)
    }),

    // URL/domain extraction over planted URLs (the raw corpus has none —
    // checked): the Spark side finds the URL with a regexp, parses the
    // host with parse_url (codegen'd built-in), and reduces it to the
    // registrable domain; the oracle derives the same domain
    // analytically from the planting schedule, so any extraction bug
    // breaks the hash.
    "q77_url_extract" -> ((s, d) => {
      val planted = T.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" see https://www"),
            (col("doc_id") % 7).cast("string"), lit(".example"),
            (col("doc_id") % 50).cast("string"),
            lit(".org/a/b?x=1&y=2 next")))
          .otherwise(col("text")).as("text"))
      planted
        .select(regexp_extract(col("text"), "https://[^ ]+", 0).as("url"))
        .where(col("url") =!= "")
        .select(parse_url(col("url"), lit("HOST")).as("host"))
        .select(regexp_extract(col("host"), "[^.]+\\.[^.]+$", 0)
          .as("domain"))
        .groupBy(col("domain")).agg(count(lit(1)).as("n"))
        .orderBy(col("domain"))
    }),

    // Bin-bucketed range join: overlapping 9 h windows on a 6 h stride
    // vs the event stream. The naive plan is a broadcast-nested-loop on
    // the range predicate; bucketing both sides to 6 h bins (each window
    // covers exactly two bins) turns it into an equi-join on bin with a
    // residual range filter — the shape that scales to 100 TB because
    // the join explodes by windows-per-bin (2), not by windows (100).
    "q78_range_join" -> ((s, d) => {
      val H6 = 21600000000L
      val H9 = 32400000000L
      val ev = T.events(s, d)
        .select(unix_micros(col("ts")).as("t"), col("value"))
      val origin = ev.agg(min(col("t")).as("o"))
      val windows = s.range(0, 100).select(col("id").as("w"))
        .crossJoin(broadcast(origin))
        .select(col("w"), (col("o") + col("w") * H6).as("ws"),
          (col("o") + col("w") * H6 + H9).as("we"))
      val wBins = windows.select(col("w"), col("ws"), col("we"),
        explode(sequence(col("w"), col("w") + 1)).as("wbin"))
      val evBins = ev.crossJoin(broadcast(origin))
        .select(col("t"), col("value"),
          ((col("t") - col("o")) / H6).cast("long").as("ebin"))
      evBins.join(broadcast(wBins),
          col("ebin") === col("wbin") &&
            col("t") >= col("ws") && col("t") < col("we"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("w"))
    }),

    // Stream-static enrichment join: the streaming event feed joined to
    // a static dimension (broadcast per micro-batch, no state store —
    // Spark re-plans the static side into each batch). The §2.9 pattern
    // q37-q73 didn't cover: enrichment, not correlation, so no
    // watermarks and no join state to evict.
    "q80_stream_enrich" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
      val dim = T.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = stream
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      StreamingCollect.runBounded(s, enriched, "q80_stream_enrich_sink")
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),

    // Unpivot (melt): wide per-flag aggregates back to long form — the
    // inverse of q68's pivot, through the dedicated Dataset API (a
    // single Expand over the value columns, no union of re-scans).
    "q81_unpivot" -> ((s, d) => {
      T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"),
          Det.dsum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist
    // over a unique total order (price, orderkey) so every rank is
    // deterministic — rounding out q06/q07's rank/running-sum coverage.
    "q82_window_ntile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_orderkey"))
        .limit(500)
    }),

    // Grouping sets — the general form behind q10's rollup and q67's
    // cube, through the dedicated Dataset API (one Expand, no union of
    // re-scans).
    "q79_grouping_sets" -> ((s, d) => {
      T.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    })
  )

  /** ORC round-trip fixture: lineitem re-landed as 8 ORC files. */
  private def orcFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "lineitem_orc")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.lineitem(s, d).repartition(8).write.mode("overwrite").orc(out)
    }
    out
  }

  def oracleSql: Map[String, String] = Map(
    // same sessionization oracle as q56 — deliberately: two independent
    // implementations (built-in session_window vs custom state machine)
    // must land on the same answer.
    "q73_sessions_flatmap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |m AS (
        |  SELECT user_id, t,
        |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |      >= 43200000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, COUNT(DISTINCT sid) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q74_bloom_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Det.sqlSum("l_quantity")} AS sum_qty,
         |  ${Det.sqlSum("p_retailprice")} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_type = 'PROMO' AND p_size <= 10
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q75_ingest_orc" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${Det.sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_quantity <= 25 AND l_discount > 0.02
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q76_heavy_hitters" ->
      """SELECT hk, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN l_orderkey % 2 = 0 THEN l_orderkey % 5
        |              ELSE 100 + (l_orderkey % 100000) END AS hk
        |  FROM lineitem)
        |GROUP BY hk ORDER BY n DESC, hk LIMIT 5""".stripMargin,

    "q77_url_extract" ->
      """SELECT 'example' || CAST(doc_id % 50 AS VARCHAR) || '.org'
        |    AS domain,
        |  COUNT(*) AS n
        |FROM documents WHERE doc_id % 3 = 0
        |GROUP BY domain ORDER BY domain""".stripMargin,

    "q78_range_join" ->
      s"""WITH o AS (SELECT MIN(epoch_us(ts)) AS o FROM events),
         |w AS (SELECT g.w, o.o + g.w * 21600000000 AS ws,
         |        o.o + g.w * 21600000000 + 32400000000 AS we
         |      FROM generate_series(0, 99) g(w), o)
         |SELECT w.w AS w, COUNT(*) AS n,
         |  ${Det.sqlSum("e.value")} AS sum_value
         |FROM w JOIN events e
         |  ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
         |GROUP BY w.w ORDER BY w.w""".stripMargin,

    "q80_stream_enrich" ->
      s"""SELECT c_mktsegment, event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment, event_type
         |ORDER BY c_mktsegment, event_type""".stripMargin,

    "q81_unpivot" ->
      s"""WITH agg AS (
         |  SELECT l_returnflag,
         |    ${Det.sqlSum("l_quantity")} AS sum_qty,
         |    ${Det.sqlSum("l_extendedprice")} AS sum_price,
         |    ${Det.sqlSum("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, val FROM (
         |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val
         |    FROM agg
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_price', sum_price FROM agg
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_disc', sum_disc FROM agg)
         |ORDER BY l_returnflag, metric""".stripMargin,

    "q82_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey LIMIT 500""".stripMargin,

    "q79_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  GROUPING(l_returnflag, l_linestatus) AS gid,
         |  COUNT(*) AS n, ${Det.sqlSum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |  (l_returnflag), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin
  )
}

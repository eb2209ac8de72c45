package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rate-anomaly detection over the event stream — the monitoring layer a
  * log-analytics deployment runs on its own ingest. The reference consumes
  * CloudWatch rate series and makes threshold decisions on them
  * (`/root/reference/sources/scale/scale.js:124-132,506` RDS metrics →
  * desired-state verdicts; `controller/controller.js:280-301` connection/
  * memory/CPU gates); the engine-side generalization is detecting
  * anomalous rates in the collected logs themselves. Three classic
  * detectors share one substrate:
  *
  *  - q269: EWMA spike flags — per-type hourly counts against an
  *    exponentially-weighted baseline (α = 1/8 in exact milli-units:
  *    ew' = (7·ew + 1000·n) div 8); an hour is anomalous when its count
  *    more than doubles the pre-update baseline AND n ≥ 3 (the absolute
  *    floor keeps sparse low-SF series from flagging single stray
  *    events). A spike is planted mid-series (8n+40 on one 'error' hour)
  *    so detection has ground truth at every SF.
  *  - q270: median/MAD robust outliers — lower median m of the hourly
  *    counts, MAD = lower median of |n − m|, outlier iff |n − m| > 3·MAD.
  *    Rank-based lower medians (position (H+1) div 2, 1-indexed) are
  *    integer-exact on both engines — no interpolation, no floats.
  *  - q271: CUSUM changepoint — S_t = Σ_{i≤t}(H·n_i − T) (the classic
  *    cumulative deviation-from-mean, pre-scaled by H so it stays an
  *    exact integer; S_H = 0 identically), changepoint = earliest argmax
  *    of |S_t|, direction = sign there. A level shift of (mean + 5) is
  *    planted on the final third of the 'click' series.
  *
  * Substrate and scale shape (all three): the per-(type, hour) census is
  * ONE map-side-combined groupBy whose shuffle carries |types| × |hours|
  * count rows — bounded by the time range and the (tiny) type vocabulary,
  * NOT by event volume; a 100 TB ingest shuffles the same few thousand
  * rows. The dense hour grid (zero-count hours are real signal: outages
  * must pull the baseline down) explodes a guarded
  * sequence(0, greatest(0, span)) per type from a broadcast 1-row bounds
  * aggregate. Each detector then folds the per-type series (≤ |hours|
  * elements, years of hourly data fit comfortably in one array) with an
  * `aggregate` HOF — windowless, collect-free, per-key state bounded by
  * the calendar. All arithmetic is non-negative-integer div (Spark `div`
  * truncates, DuckDB `//` floors — equal on non-negatives) except q271's
  * signed S_t, which is never divided. Overflow bounds: 1000·n and H·n
  * at int64 need n ≤ 9.2e15 per type-hour and |S| ≤ H·T ≤ 9.2e18 —
  * at 100 TB (T ~ 1e12/type, H ~ 1e5 hours) H·T ~ 1e17, in bounds.
  */
object AnomalyQueries {

  /** Sparse per-(event_type, absolute-hour) counts — the only
    * corpus-sized pass; map-side-combined. */
  private def eventsHourCounts(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(
        (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("h"),
        col("event_type"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("cn"))

  /** Densify sparse (event_type, h, cn) counts into (event_type,
    * i ∈ [0, span], n ≥ 0, span): every hour of [min, max] present for
    * every type. */
  private def densify(counts0: DataFrame): DataFrame = {
    val bounds = counts0.agg(min(col("h")).as("h0"),
      (max(col("h")) - min(col("h"))).as("span"))
    val counts = counts0.crossJoin(broadcast(bounds))
      .select(col("event_type"), (col("h") - col("h0")).as("i"),
        col("cn"))
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), col("span"),
        explode(expr("sequence(CAST(0 AS BIGINT), " +
          "greatest(CAST(0 AS BIGINT), span))")).as("i"))
    grid.join(counts, Seq("event_type", "i"), "left")
      .select(col("event_type"), col("i"),
        coalesce(col("cn"), lit(0L)).as("n"), col("span"))
  }

  /** Dense per-(event_type, hour-offset) census straight off the events
    * table. */
  private def hourlyCensus(s: SparkSession, d: String): DataFrame =
    densify(eventsHourCounts(s, d))

  /** q269's detector tail — sparse hour counts → dense planted census →
    * EWMA fold — shared verbatim with the streaming twin q273 so the
    * twins can only diverge in how the census was accumulated. */
  private def ewmaFromHourCounts(counts: DataFrame): DataFrame =
    plantSpike(densify(counts))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("i"), col("n"))))
        .as("ser"))
      .select(col("event_type"),
        size(col("ser")).cast("long").as("n_hours"),
        expr("""aggregate(ser,
          named_struct('ew', CAST(-1 AS BIGINT),
                       'an', CAST(0 AS BIGINT),
                       'mx', CAST(0 AS BIGINT)),
          (a, x) -> named_struct(
            'ew', CASE WHEN a.ew < 0 THEN 1000 * x.n
                       ELSE (7 * a.ew + 1000 * x.n) div 8 END,
            'an', a.an + CASE WHEN a.ew >= 0 AND 1000 * x.n > 2 * a.ew
                               AND x.n >= 3 THEN CAST(1 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END,
            'mx', CASE WHEN a.ew >= 0 AND 1000 * x.n > 2 * a.ew
                        AND x.n >= 3
                  THEN greatest(a.mx, (1000000 * x.n)
                    div greatest(a.ew, CAST(1 AS BIGINT)))
                  ELSE a.mx END))""").as("st"))
      .select(col("event_type"), col("n_hours"),
        col("st.an").as("n_anom"),
        col("st.mx").as("max_excess_permille"),
        col("st.ew").as("ewma_final_milli"))
      .orderBy(col("event_type"))

  /** The q269/q270 planted spike: one mid-series 'error' hour at 8n+40. */
  private def plantSpike(census: DataFrame): DataFrame =
    census.withColumn("n",
      expr("CASE WHEN event_type = 'error' AND i = span div 2 " +
        "THEN 8 * n + 40 ELSE n END"))

  /** Shared oracle CTE prologue: dense census + mid-series spike. */
  private val censusSql: String =
    """ev AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
      |b AS (SELECT MIN(h) AS h0, MAX(h) - MIN(h) AS span FROM ev),
      |c AS (SELECT event_type, h - (SELECT h0 FROM b) AS i,
      |        CAST(COUNT(*) AS BIGINT) AS cn
      |      FROM ev GROUP BY 1, 2),
      |g AS (SELECT t.event_type, CAST(u.i AS BIGINT) AS i
      |      FROM (SELECT DISTINCT event_type FROM ev) t,
      |           (SELECT unnest(generate_series(0, span)) AS i FROM b) u),
      |d AS (SELECT g.event_type, g.i,
      |        CAST(COALESCE(c.cn, 0) AS BIGINT) AS n
      |      FROM g LEFT JOIN c
      |        ON c.event_type = g.event_type AND c.i = g.i),
      |p AS (SELECT event_type, i,
      |        CAST(CASE WHEN event_type = 'error'
      |                   AND i = (SELECT span FROM b) // 2
      |             THEN 8 * n + 40 ELSE n END AS BIGINT) AS n
      |      FROM d)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q269_ewma_anomaly" -> ((s, d) =>
      ewmaFromHourCounts(eventsHourCounts(s, d))),

    // Streaming twin of q269: the corpus-sized census pass runs
    // INSIDE the streaming engine — each micro-batch reduces its own
    // events to (event_type, hour, count) partials (O(batch) work,
    // map-side combined before anything persists) written under its
    // batch_id with dynamic-partition overwrite, so a replayed batch
    // rewrites its own partition and the merge can never double-count
    // (the q210/q253 exactly-once discipline). Counts are additive and
    // arrival-order-independent, so the merged cells equal the batch
    // census at ANY split; the calendar-sized EWMA fold (shared
    // verbatim with q269) then runs once over the merged cells. Gated
    // row-for-row to q269 — same oracle.
    "q273_stream_ewma" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      val dir = FrontierQueries.eventsSplitFixture(s, d)
      val base = graft.Scratch.runDir("graft_streamewma")
      val schema = s.read.parquet(dir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("ts"), col("event_type"))
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          batch.select(
              (unix_micros(col("ts")) / lit(3600000000L)).cast("long")
                .as("h"), col("event_type"))
            .groupBy(col("event_type"), col("h"))
            .agg(count(lit(1)).as("cn"))
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/cells")
          ()
        }
        .start()
      q.awaitTermination()
      ewmaFromHourCounts(
        s.read.parquet(s"$base/cells")
          .groupBy(col("event_type"), col("h"))
          .agg(sum(col("cn")).as("cn")))
    }),

    // Seasonal-profile outliers — q270's robust gate with the baseline
    // conditioned on hour-of-day: per (type, i mod 24) cell, the lower
    // median of that cell's ~|days| samples is the seasonal level and
    // MAD its spread; a residual is anomalous iff |n − med| > 3·MAD
    // WITHIN its own hour-of-day. The planted contrast is the point:
    // a PERIODIC +20 on every (error, hod 7) hour raises that cell's
    // median — so the recurring load is absorbed into the baseline and
    // contributes zero outliers — while q269's spike plant (one
    // aperiodic mid-series error burst) still trips its cell. Same
    // calendar-bounded substrate; the per-cell algebra runs inside
    // ≤|days|-element arrays, 120 output rows.
    "q274_seasonal_outliers" -> ((s, d) => {
      plantSpike(hourlyCensus(s, d))
        .withColumn("n",
          expr("CASE WHEN event_type = 'error' AND i % 24 = 7 " +
            "THEN n + 20 ELSE n END"))
        .withColumn("hod", expr("i % 24"))
        .groupBy(col("event_type"), col("hod"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .withColumn("med",
          expr("element_at(ns, CAST((size(ns) + 1) div 2 AS INT))"))
        .withColumn("mad",
          expr("element_at(array_sort(transform(ns, v -> abs(v - med))), " +
            "CAST((size(ns) + 1) div 2 AS INT))"))
        .select(col("event_type"), col("hod"),
          size(col("ns")).cast("long").as("n_samples"),
          col("med"), col("mad"),
          expr("CAST(size(filter(ns, v -> abs(v - med) > 3 * mad)) " +
            "AS BIGINT)").as("n_out"))
        .orderBy(col("event_type"), col("hod"))
    }),

    "q270_mad_outliers" -> ((s, d) => {
      plantSpike(hourlyCensus(s, d))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("i"), col("n"))))
          .as("ser"))
        .select(col("event_type"),
          expr("transform(ser, x -> x.n)").as("ns"))
        .withColumn("med",
          expr("element_at(array_sort(ns), " +
            "CAST((size(ns) + 1) div 2 AS INT))"))
        .withColumn("mad",
          expr("element_at(array_sort(transform(ns, v -> abs(v - med))), " +
            "CAST((size(ns) + 1) div 2 AS INT))"))
        .select(col("event_type"),
          size(col("ns")).cast("long").as("n_hours"),
          col("med"), col("mad"),
          expr("CAST(size(filter(ns, v -> abs(v - med) > 3 * mad)) " +
            "AS BIGINT)").as("n_out"),
          expr("array_max(transform(ns, v -> abs(v - med)))")
            .as("max_abs_dev"))
        .orderBy(col("event_type"))
    }),

    // Token-bucket rate-limiter audit — the engine-side twin of the
    // reference's admission gates (`controller/controller.js:280-301`
    // connection/memory caps; the S10 sink is connection-capacity-
    // bounded): replay every (user, event_type) stream through a
    // bucket of burst 3 tokens refilled 1 token/32 h (milli-token
    // integer arithmetic, refill floored per step) and report how much
    // traffic a production throttle WOULD have dropped. One shuffle
    // keyed by (user, type); the fold runs inside a per-stream array
    // bounded by that user's activity (the q73 session bound); refill
    // products (Δt_µs · 1000) stay ≤ ~3e17 at decade spans — int64.
    "q287_rate_limit_audit" -> ((s, d) => {
      val refill = "least(3000L, a.tok + ((v - a.lt) * 1000L) " +
        "div 115200000000L)"
      T.events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"), col("event_id"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(sort_array(collect_list(struct(col("t"), col("event_id"))))
          .as("ser"))
        .select(col("event_type"), size(col("ser")).cast("long")
            .as("n_events"),
          expr(s"""aggregate(transform(ser, x -> x.t),
            named_struct('tok', CAST(0 AS BIGINT),
                         'dr', CAST(0 AS BIGINT),
                         'lt', CAST(-1 AS BIGINT)),
            (a, v) -> CASE WHEN a.lt < 0
              THEN named_struct('tok', 2000L, 'dr', 0L, 'lt', v)
              ELSE named_struct(
                'tok', CASE WHEN $refill >= 1000L
                            THEN $refill - 1000L ELSE $refill END,
                'dr', a.dr + CASE WHEN $refill >= 1000L
                                  THEN 0L ELSE 1L END,
                'lt', v) END)""").as("st"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_streams"),
          sum(col("n_events")).as("n_events"),
          sum(col("st.dr")).as("n_dropped"))
        .select(col("event_type"), col("n_streams"), col("n_events"),
          col("n_dropped"),
          expr("(1000 * n_dropped) div n_events").as("drop_permille"))
        .orderBy(col("event_type"))
    }),

    "q271_cusum_changepoint" -> ((s, d) => {
      val census = hourlyCensus(s, d)
      val tot = census.groupBy(col("event_type"))
        .agg(sum(col("n")).as("tt"))
      census.join(broadcast(tot), "event_type")
        .withColumn("n",
          expr("CASE WHEN event_type = 'click' AND 3 * i >= 2 * span " +
            "THEN n + tt div (span + 1) + 5 ELSE n END"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("i"), col("n"))))
          .as("ser"))
        .select(col("event_type"),
          expr("transform(ser, x -> x.n)").as("ns"))
        .withColumn("nh", size(col("ns")).cast("long"))
        .withColumn("t2",
          expr("aggregate(ns, CAST(0 AS BIGINT), (a, v) -> a + v)"))
        .withColumn("st",
          expr("""aggregate(ns,
            named_struct('s', CAST(0 AS BIGINT),
                         'bs', CAST(-1 AS BIGINT),
                         'bi', CAST(0 AS BIGINT),
                         'dr', CAST(0 AS BIGINT),
                         't', CAST(0 AS BIGINT)),
            (a, v) -> named_struct(
              's', a.s + nh * v - t2,
              'bs', CASE WHEN abs(a.s + nh * v - t2) > a.bs
                         THEN abs(a.s + nh * v - t2) ELSE a.bs END,
              'bi', CASE WHEN abs(a.s + nh * v - t2) > a.bs
                         THEN a.t ELSE a.bi END,
              'dr', CASE WHEN abs(a.s + nh * v - t2) > a.bs
                         THEN CAST(sign(a.s + nh * v - t2) AS BIGINT)
                         ELSE a.dr END,
              't', a.t + CAST(1 AS BIGINT)))"""))
        .select(col("event_type"), col("nh").as("n_hours"),
          col("t2").as("total"), col("st.bi").as("cp_i"),
          col("st.bs").as("max_abs_s"), col("st.dr").as("dir"))
        .orderBy(col("event_type"))
    }))

  /** One oracle for both EWMA twins: the streaming variant must equal
    * the batch fold exactly. */
  private val ewmaOracle: String =
    s"""WITH RECURSIVE $censusSql,
         |r AS (
         |  SELECT event_type, i, 1000 * n AS ew,
         |         CAST(0 AS BIGINT) AS an, CAST(0 AS BIGINT) AS mx
         |  FROM p WHERE i = 0
         |  UNION ALL
         |  SELECT p.event_type, p.i,
         |    (7 * r.ew + 1000 * p.n) // 8 AS ew,
         |    r.an + CASE WHEN 1000 * p.n > 2 * r.ew AND p.n >= 3
         |                THEN 1 ELSE 0 END AS an,
         |    CASE WHEN 1000 * p.n > 2 * r.ew AND p.n >= 3
         |         THEN GREATEST(r.mx, (1000000 * p.n) // GREATEST(r.ew, 1))
         |         ELSE r.mx END AS mx
         |  FROM r JOIN p ON p.event_type = r.event_type AND p.i = r.i + 1)
         |SELECT event_type,
         |  CAST((SELECT span FROM b) + 1 AS BIGINT) AS n_hours,
         |  CAST(an AS BIGINT) AS n_anom,
         |  CAST(mx AS BIGINT) AS max_excess_permille,
         |  CAST(ew AS BIGINT) AS ewma_final_milli
         |FROM r WHERE i = (SELECT span FROM b)
         |ORDER BY event_type""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q269_ewma_anomaly" -> ewmaOracle,

    "q273_stream_ewma" -> ewmaOracle,

    "q287_rate_limit_audit" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_type, rn, t,
        |    CAST(2000 AS BIGINT) AS tok, CAST(0 AS BIGINT) AS dropped
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_type, e.rn, e.t,
        |    CASE WHEN LEAST(3000, r.tok
        |             + ((e.t - r.t) * 1000) // 115200000000) >= 1000
        |         THEN LEAST(3000, r.tok
        |             + ((e.t - r.t) * 1000) // 115200000000) - 1000
        |         ELSE LEAST(3000, r.tok
        |             + ((e.t - r.t) * 1000) // 115200000000) END,
        |    r.dropped + CASE WHEN LEAST(3000, r.tok
        |             + ((e.t - r.t) * 1000) // 115200000000) >= 1000
        |         THEN 0 ELSE 1 END
        |  FROM r JOIN ev e ON e.user_id = r.user_id
        |   AND e.event_type = r.event_type AND e.rn = r.rn + 1),
        |fin AS (
        |  SELECT user_id, event_type, MAX(rn) AS n_events,
        |    MAX_BY(dropped, rn) AS dropped
        |  FROM r GROUP BY 1, 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_streams,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(dropped) AS BIGINT) AS n_dropped,
        |  CAST((1000 * SUM(dropped)) // SUM(n_events) AS BIGINT)
        |    AS drop_permille
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "q274_seasonal_outliers" ->
      s"""WITH $censusSql,
         |p2 AS (SELECT event_type, i,
         |        CAST(CASE WHEN event_type = 'error' AND i % 24 = 7
         |             THEN n + 20 ELSE n END AS BIGINT) AS n,
         |        i % 24 AS hod
         |       FROM p),
         |l AS (SELECT event_type, hod, list(n ORDER BY n) AS ns
         |      FROM p2 GROUP BY 1, 2),
         |m AS (SELECT event_type, hod, ns,
         |        ns[(len(ns) + 1) // 2] AS med FROM l),
         |m2 AS (SELECT event_type, hod, ns, med,
         |        list_sort(list_transform(ns, v -> abs(v - med)))
         |          [(len(ns) + 1) // 2] AS mad FROM m)
         |SELECT event_type, CAST(hod AS BIGINT) AS hod,
         |  CAST(len(ns) AS BIGINT) AS n_samples,
         |  CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
         |  CAST(len(list_filter(ns, v -> abs(v - med) > 3 * mad))
         |    AS BIGINT) AS n_out
         |FROM m2 ORDER BY event_type, hod""".stripMargin,

    "q270_mad_outliers" ->
      s"""WITH $censusSql,
         |l AS (SELECT event_type, list(n ORDER BY i) AS ns
         |      FROM p GROUP BY 1),
         |m AS (SELECT event_type, ns,
         |        list_sort(ns)[(len(ns) + 1) // 2] AS med FROM l),
         |m2 AS (SELECT event_type, ns, med,
         |        list_sort(list_transform(ns, v -> abs(v - med)))
         |          [(len(ns) + 1) // 2] AS mad FROM m)
         |SELECT event_type, CAST(len(ns) AS BIGINT) AS n_hours,
         |  CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
         |  CAST(len(list_filter(ns, v -> abs(v - med) > 3 * mad))
         |    AS BIGINT) AS n_out,
         |  CAST(list_max(list_transform(ns, v -> abs(v - med)))
         |    AS BIGINT) AS max_abs_dev
         |FROM m2 ORDER BY event_type""".stripMargin,

    "q271_cusum_changepoint" ->
      s"""WITH $censusSql,
         |tt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot
         |       FROM d GROUP BY 1),
         |p2 AS (SELECT d.event_type, d.i,
         |        CAST(CASE WHEN d.event_type = 'click'
         |              AND 3 * d.i >= 2 * (SELECT span FROM b)
         |             THEN d.n + tt.tot // ((SELECT span FROM b) + 1) + 5
         |             ELSE d.n END AS BIGINT) AS n
         |       FROM d JOIN tt ON tt.event_type = d.event_type),
         |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh,
         |         CAST(SUM(n) AS BIGINT) AS t2 FROM p2 GROUP BY 1),
         |cs AS (SELECT p2.event_type, p2.i,
         |         CAST(SUM(st.nh * p2.n - st.t2)
         |           OVER (PARTITION BY p2.event_type ORDER BY p2.i)
         |           AS BIGINT) AS s
         |       FROM p2 JOIN st ON st.event_type = p2.event_type),
         |best AS (SELECT event_type, i, s, abs(s) AS a,
         |           ROW_NUMBER() OVER (PARTITION BY event_type
         |             ORDER BY abs(s) DESC, i ASC) AS rk FROM cs)
         |SELECT bst.event_type, st.nh AS n_hours, st.t2 AS total,
         |  CAST(bst.i AS BIGINT) AS cp_i,
         |  CAST(bst.a AS BIGINT) AS max_abs_s,
         |  CAST(CASE WHEN bst.s > 0 THEN 1 WHEN bst.s < 0 THEN -1
         |       ELSE 0 END AS BIGINT) AS dir
         |FROM best bst JOIN st ON st.event_type = bst.event_type
         |WHERE bst.rk = 1 ORDER BY bst.event_type""".stripMargin)
}

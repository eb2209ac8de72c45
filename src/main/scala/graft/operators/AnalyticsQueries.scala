package graft.operators

import graft.{Det, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log/product-analytics surface: the classic reporting operators a log
  * engine's users run daily — CIDR-prefix IP enrichment, funnel analysis,
  * retention cohorts, fixed-width histograms, behavioral transition
  * matrices, and train/serve distribution drift.
  *
  * All arithmetic is integer/decimal-exact (or single IEEE ops that every
  * engine computes identically), so each query gates against the DuckDB
  * oracle bit-for-bit.
  */
object AnalyticsQueries {

  /** Events with epoch-micro timestamps (shared projection). */
  private def ev(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("t"))

  /** Cohorting convention shared by retention (q126) and LTV (q168):
    * ISO-week truncation, cohort = min week per user, offset =
    * datediff/7 capped at 4 — ONE definition so the two surfaces can
    * never report incompatible cohorts. Input must carry (user_id,
    * week) plus any payload columns; output adds (cohort_week,
    * week_offset) filtered to the 4-week frame. */
  private def cohorted(e: DataFrame): DataFrame = {
    val cohort = e.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    e.join(cohort, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .where(col("week_offset") <= 4)
  }

  /** Ownership-graph edge CTE (k — k div 2, k — k div 3, id-oriented,
    * deduped) over a customer relation — ONE definition shared by the
    * triangle count (q141) and the degree census (q166), Spark and
    * oracle sides alike: the two families must describe the SAME graph. */
  private[operators] def edgeCte(rel: String,
      divOp: String = "div"): String =
    s"""raw AS (
       |  SELECT c_custkey AS k, c_custkey $divOp 2 AS p FROM $rel
       |  WHERE c_custkey $divOp 2 >= 1
       |  UNION ALL
       |  SELECT c_custkey, c_custkey $divOp 3 FROM $rel
       |  WHERE c_custkey $divOp 3 >= 1),
       |e AS (
       |  SELECT DISTINCT least(k, p) AS a, greatest(k, p) AS b
       |  FROM raw WHERE k <> p)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CIDR /24 IP enrichment: client IPs (synthesized from event ids —
    // the parse/derive step is the point) joined to an ownership table
    // keyed by /24 prefix. Containment-in-a-/24 becomes an EQUI-join on
    // the (b, c) octet prefix — the scale form of IP enrichment: a
    // prefix hash join, never a per-row range probe. The dotted string
    // is built and re-parsed to exercise the parse path.
    "q124_ip_enrich" -> ((s, d) => {
      val e = T.events(s, d).select(col("event_id"))
        .withColumn("ip", concat_ws(".", lit(10),
          expr("event_id div 65536") % 256,
          expr("event_id div 256") % 256,
          col("event_id") % 256))
      val parsed = e.select(col("ip"), split(col("ip"), "\\.").as("oct"))
        .select(col("ip"),
          element_at(col("oct"), 2).cast("long").as("b"),
          element_at(col("oct"), 3).cast("long").as("c"))
      val blocks = parsed.select(col("b"), col("c")).distinct()
        .where((col("b") + col("c")) % 3 === 0)
        .withColumn("owner_nation", (col("b") * 256 + col("c")) % 25)
      parsed.join(broadcast(blocks), Seq("b", "c"))
        .groupBy(col("owner_nation"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("ip")).as("n_ips"))
        .orderBy(col("owner_nation"))
    }),

    // Funnel analysis (view -> click -> purchase, strictly ordered):
    // each stage is min(t) AFTER the previous stage's time, computed as
    // aggregate + re-join — three narrow shuffles on user_id (the same
    // key every round, so exchanges line up), never a per-user sort of
    // the corpus. Durations stay integer micros.
    // Behavioral transition matrix (first-order Markov counts): per
    // user, events ordered by the unique (t, event_id) key; consecutive
    // (src → dst) type pairs counted, then row-normalized to integer
    // permilles. The ordering window is PARTITIONED by user_id (the
    // bounded-history key — parallel across users, and the exchange
    // carries only (user, t, id, type) slim rows, never props/value);
    // transition counts reduce map-side to ≤ |types|² rows and the
    // row totals are a broadcast. The next-event distribution this
    // yields is the classic session-model input beside q125's funnel.
    "q275_markov_transitions" -> ((s, d) => {
      val e = ev(s, d).select(col("user_id"), col("t"),
        col("event_id"), col("event_type"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      val pairs = e
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("src")).agg(sum(col("n")).as("tot"))
      pairs.join(broadcast(totals), "src")
        .select(col("src"), col("dst"), col("n"),
          expr("CAST((1000 * n) div tot AS BIGINT)").as("permille"))
        .orderBy(col("src"), col("dst"))
    }),

    // Revenue attribution — the marketing-analytics classic beside
    // q125's funnel: each purchase credits the user's FIRST and LAST
    // click inside a 24-hour lookback (tie-broken by event_id via
    // struct min/max — one deterministic total order, no per-purchase
    // window), bucketed by the touch click's hour-of-day; purchases
    // with no qualifying click land in the 'none' row. Money stays
    // DECIMAL(38,6) through every sum (the q168 discipline) and only
    // the final per-bucket totals surface as doubles — exact-decimal →
    // nearest-double is engine-independent. Scale shape: ONE equi-join
    // on user_id (clicks within the lookback bound per-purchase fanout
    // by the user's 24 h activity; AQE skew-split handles hot users),
    // ONE per-purchase aggregate, and the first/last/none fan-out is a
    // per-row array explode — no recomputation, no second corpus pass.
    "q285_attribution" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val e = T.events(s, d)
      val p = e.where(col("event_type") === "purchase").select(
        col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"), col("value").cast(dec).as("v"))
      val c = e.where(col("event_type") === "click").select(
        col("event_id").as("cid"), col("user_id").as("cuid"),
        col("ts").as("cts"))
      val agg = p.join(c,
          col("user_id") === col("cuid") &&
            col("cts") < col("pts") &&
            col("cts") >= col("pts") - expr("INTERVAL 24 HOURS"),
          "left")
        .groupBy(col("pid"))
        .agg(max(col("v")).as("v"),
          min(when(col("cid").isNotNull,
            struct(col("cts"), col("cid")))).as("f"),
          max(when(col("cid").isNotNull,
            struct(col("cts"), col("cid")))).as("l"))
      agg.select(col("v"), explode(when(col("f").isNotNull,
          array(
            struct(lit("first").as("model"),
              hour(col("f.cts")).cast("long").as("touch_hour")),
            struct(lit("last").as("model"),
              hour(col("l.cts")).cast("long").as("touch_hour"))))
          .otherwise(array(
            struct(lit("none").as("model"),
              lit(-1L).as("touch_hour"))))).as("m"))
        .groupBy(col("m.model").as("model"),
          col("m.touch_hour").as("touch_hour"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("v")).cast("double").as("revenue"))
        .orderBy(col("model"), col("touch_hour"))
    }),

    "q125_funnel" -> ((s, d) => {
      val e = ev(s, d)
      val s1 = e.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
      val s2 = e.join(s1, "user_id")
        .where(col("event_type") === "click" && col("t") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("t")).as("t2"),
          min(col("t1")).as("t1"))
      val s3 = e.join(s2, "user_id")
        .where(col("event_type") === "purchase" && col("t") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("t")).as("t3"),
          min(col("t1")).as("t1"))
      s1.select(lit(1).as("stage"), col("user_id"),
          lit(null).cast("long").as("dur_us"))
        .unionByName(s2.select(lit(2).as("stage"), col("user_id"),
          lit(null).cast("long").as("dur_us")))
        .unionByName(s3.select(lit(3).as("stage"), col("user_id"),
          (col("t3") - col("t1")).as("dur_us")))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("dur_us")).as("sum_dur_us"))
        .orderBy(col("stage"))
    }),

    // Retention cohorts: users grouped by first-seen ISO week; for each
    // (cohort_week, week_offset <= 4) the distinct users active that
    // week. Cohorting is one min-aggregate; the activity matrix is a
    // distinct over (user, week) BEFORE the cohort join, so the join
    // input is already reduced.
    "q126_retention" -> ((s, d) => {
      val e = T.events(s, d).select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      cohorted(e.distinct())
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Fixed-width histogram: value bucketed into [0,10) deciles of width
    // 10, clamped to [0, 9]. floor(value/10) is a single IEEE divide —
    // bit-identical in any engine — and everything after is integer.
    // Map-side partial aggregation collapses each partition to at most
    // types x 10 rows before the shuffle.
    "q127_histogram" -> ((s, d) => {
      T.events(s, d)
        .withColumn("bucket",
          greatest(least(floor(col("value") / 10.0), lit(9.0)), lit(0.0))
            .cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // Behavioral transition matrix: per-user event_type bigrams in
    // (t, event_id) order (a unique total order, so lag() is
    // deterministic), counted globally — the input for a Markov model of
    // user behavior. One shuffle on user_id for the lag, then a partial
    // agg on the (from, to) pairs.
    "q128_transitions" -> ((s, d) => {
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      ev(s, d)
        .withColumn("prev", lag(col("event_type"), 1).over(byU))
        .where(col("prev").isNotNull)
        .groupBy(col("prev").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Deterministic mode per group: the most frequent event_type per
    // user, ties broken by lexicographic order — min_by over a
    // (-count, type) struct, which partial-aggregates (each partition
    // reduces to one candidate per user before the shuffle) where the
    // row_number-window form would sort every (user, type) row.
    "q131_mode_per_group" -> ((s, d) => {
      T.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(min_by(col("event_type"),
            struct((-col("n")).as("neg"), col("event_type"))).as("top_type"),
          max(col("n")).as("max_n"))
        .orderBy(col("user_id"))
    }),

    // Ordered event-sequence construction (behavioral-model input): per
    // user, the full event_type sequence in (t, event_id) order as an
    // array — sort_array over collected (t, id, type) structs, so the
    // order is part of the data, not an accident of partitioning. The
    // output keeps the length and the first five steps; the head
    // crosses the gate comma-joined (element order still binds — a
    // reordered sequence is a different string — but the column stays
    // scalar; AnalyticsSpec pins the element-wise array semantics).
    "q132_event_sequences" -> ((s, d) => {
      ev(s, d)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("t"), col("event_id"), col("event_type")))).as("s"))
        .select(col("user_id"), size(col("s")).as("n_events"),
          concat_ws(",",
            transform(slice(col("s"), 1, 5), x => x.getField("event_type")))
            .as("head5"))
        .orderBy(col("user_id"))
    }),

    // Surrogate keys: a stable 16-hex-digit dimension key from the
    // natural key via md5 — reproducible across engines and re-runs
    // (monotonically_increasing_id is neither). The query builds the
    // dim, re-joins it to the facts by natural key, and audits for
    // collisions (distinct surrogate count must equal dim cardinality).
    "q133_surrogate_keys" -> ((s, d) => {
      val nat = concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))
      val dim = T.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
        .withColumn("sk", substring(md5(nat), 1, 16))
      val joined = T.orders(s, d).join(broadcast(dim),
        Seq("o_orderstatus", "o_orderpriority"))
      // the collision check compares the DIM's natural-key cardinality
      // with its distinct surrogate count — comparing counts of a frame
      // already grouped by sk is true by construction and would never
      // catch a real hash collision
      val g = joined.groupBy(col("sk")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"))
      val dimStats = dim.agg(count(lit(1)).as("n_nat"),
        countDistinct(col("sk")).as("n_distinct"))
      g.crossJoin(dimStats)
        .select(col("n_keys"), col("n_distinct"), col("n_rows"),
          (col("n_nat") === col("n_distinct")).as("collision_free"))
    }),

    // Dataset diff (snapshot reconciliation): old vs new snapshot keyed
    // by o_orderkey, rows compared by an md5 over engine-stable fields
    // (money routed through integer cents — double-to-string formatting
    // is NOT engine-stable). One full-outer join on the key partitions
    // the union into added / removed / changed / unchanged — the audit
    // that runs after every backfill or migration.
    "q134_dataset_diff" -> ((s, d) => {
      val cents = org.apache.spark.sql.types.DecimalType(30, 2)
      def withHash(df: DataFrame): DataFrame = df.withColumn("h",
        md5(concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("cents"))))
      val base = T.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        (col("o_totalprice").cast(cents) * 100).cast("long").as("cents"))
      val old = withHash(base).select(col("o_orderkey"), col("h").as("h_old"))
      val newer = withHash(
        base.where(col("o_orderkey") % 97 =!= 0)
          .withColumn("cents", col("cents") + 100)
          .withColumn("cents", when(col("o_orderkey") % 13 === 0,
            col("cents")).otherwise(col("cents") - 100))
          .unionByName(base.where(col("o_orderkey") % 101 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + 10000000L)))
        .select(col("o_orderkey"), col("h").as("h_new"))
      old.join(newer, Seq("o_orderkey"), "full_outer")
        .agg(
          sum(when(col("h_old").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("h_new").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("h_old").isNotNull && col("h_new").isNotNull &&
            col("h_old") =!= col("h_new"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(when(col("h_old") === col("h_new"), 1L).otherwise(0L))
            .as("n_unchanged"))
    }),

    // Triangle counting on the ownership graph (k—k div 2, k—k div 3
    // undirected): orient every edge low-id -> high-id, join oriented
    // edge lists on the middle vertex, close with a third join — each
    // triangle counted exactly once. At 100 TB the orientation key is
    // (degree, id) instead of id so high-degree hubs sit on the few-
    // out-edges side (the classic bound that keeps the wedge join
    // near-linear); id-orientation here keeps the oracle trivially
    // identical.
    "q141_triangles" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("q141_customer")
      s.sql(
        s"""WITH ${edgeCte("q141_customer")},
          |wedge AS (
          |  SELECT e1.a, e1.b, e2.b AS c
          |  FROM e e1 JOIN e e2 ON e1.b = e2.a)
          |SELECT COUNT(*) AS n_triangles,
          |  COALESCE(MIN(w.a), -1) AS min_vertex
          |FROM wedge w JOIN e e3 ON w.a = e3.a AND w.c = e3.b""".stripMargin)
    }),

    // Market concentration (HHI) of per-user activity within each event
    // type: Σ n_u² stays integer-exact, the final share normalization is
    // ONE IEEE divide by N² — so the concentration index gates exactly.
    // The squared terms route through DECIMAL(38,0) (q257's rule: n_u²
    // sums overflow int64 at corpus scale, and N² overflows past ~3e9
    // events per type — DuckDB's HUGEINT never crashes, Spark ANSI
    // would); N² forms in double, which bit-matches DuckDB's
    // HUGEINT→double rounding because double(N) is exact below 2^53.
    // Two partial-aggregated passes, no window.
    "q142_hhi" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      T.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_u"))
        .groupBy(col("event_type"))
        .agg(sum(col("n_u").cast(dec) * col("n_u")).as("ssq"),
          sum(col("n_u")).as("n"))
        .select(col("event_type"),
          col("ssq").cast("long").as("sum_sq"),
          (col("ssq").cast("double") /
            (col("n").cast("double") * col("n").cast("double")))
            .as("hhi"))
        .orderBy(col("event_type"))
    }),

    // CDC apply (MERGE semantics in batch): a change log of
    // deletes / updates / inserts applied to a snapshot with ONE
    // full-outer join on the key — deletes drop, updates replace,
    // inserts append, untouched rows pass through. The change log is
    // derived deterministically (delete %97, update %13, insert %101
    // under shifted keys) so the oracle can compute the final state
    // analytically. Money stays integer cents.
    "q143_cdc_apply" -> ((s, d) => {
      val cents = org.apache.spark.sql.types.DecimalType(30, 2)
      val snap = T.orders(s, d).select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(cents) * 100).cast("long").as("c"))
      val changes = snap.where(col("k") % 97 === 0)
          .select(col("k"), lit("D").as("op"),
            lit(null).cast("long").as("new_c"))
        .unionByName(snap.where(col("k") % 97 =!= 0 && col("k") % 13 === 0)
          .select(col("k"), lit("U").as("op"),
            (col("c") + 100).as("new_c")))
        .unionByName(snap.where(col("k") % 101 === 0)
          .select((col("k") + 10000000L).as("k"), lit("I").as("op"),
            col("c").as("new_c")))
      snap.join(changes, Seq("k"), "full_outer")
        .where(col("op").isNull || col("op") =!= "D")
        .select(coalesce(col("new_c"), col("c")).as("c"))
        .agg(count(lit(1)).as("n_rows"), sum(col("c")).as("sum_cents"))
    }),

    // Longest consecutive-day streak per user (the engagement metric):
    // distinct active days, then the classic date-islands trick — a run
    // of consecutive days satisfies day - rank = constant — and the max
    // run length per user. All date/integer arithmetic; one shuffle on
    // user_id.
    "q172_streaks" -> ((s, d) => {
      val byU = Window.partitionBy(col("user_id")).orderBy(col("day"))
      T.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .withColumn("grp",
          date_sub(col("day"), row_number().over(byU)))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum(col("len")).as("active_days"))
        .orderBy(col("user_id"))
    }),

    // Pareto / ABC curve: what share of revenue the top-k% of customers
    // produce — rank customers by decimal-exact revenue (ties broken by
    // key), cumulative decimal sums at each decile boundary, and ONE
    // double division per emitted row (exact casts: the magnitudes sit
    // far below 2^53). The global rank/cumsum is the TWO-PASS form
    // (the q150 machinery): range-partition the customer aggregate by
    // the sort key, per-partition row_number/running-sum, broadcast the
    // tiny per-partition (count, revenue) offsets — no task ever owns
    // more than 1/nb of the customers, where a bare
    // Window.orderBy would drag every customer through ONE task.
    // The partitioned frame materializes once (localCheckpoint): it
    // feeds three consumers, and spark_partition_id() must be read off
    // a single physical layout — two evaluations of a range exchange
    // sample boundaries independently.
    "q173_pareto" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val nb = 32
      val perCust = T.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(dec)).as("rev"))
      val parts = perCust
        .repartitionByRange(nb, col("rev").desc, col("o_custkey"))
        .sortWithinPartitions(col("rev").desc, col("o_custkey"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val prior = Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1) // ≤ nb rows: bounded
      val offsets = parts.groupBy(col("pid"))
        .agg(count(lit(1)).as("pn"), sum(col("rev")).as("prev"))
        .withColumn("rn_off", coalesce(sum(col("pn")).over(prior), lit(0L)))
        .withColumn("cum_off",
          coalesce(sum(col("prev")).over(prior), lit(0).cast(dec)))
        .select(col("pid"), col("rn_off"), col("cum_off"))
      val byKey = Window.partitionBy(col("pid"))
        .orderBy(col("rev").desc, col("o_custkey"))
      val n = parts.count() // bounded scalar for the decile ranks
      parts.join(broadcast(offsets), "pid")
        .withColumn("rn", col("rn_off") + row_number().over(byKey))
        .withColumn("cum", col("cum_off") + sum(col("rev")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("rn").isin((1 to 10).map(k =>
          math.ceil(n * k / 10.0).toLong): _*))
        .crossJoin(broadcast(parts.agg(sum(col("rev")).as("tot"))))
        .select(col("rn").as("rank"),
          (col("cum").cast("double") / col("tot").cast("double"))
            .as("cum_share"))
        .orderBy(col("rank"))
    }),

    // Cohort LTV curve: cumulative revenue per cohort by cohort age —
    // the product-analytics metric behind every retention chart. Events
    // reduce to (cohort_week, week_offset, decimal revenue) FIRST; the
    // cumulative sum then runs over that tiny matrix (cohorts x
    // offsets), not raw events, and stays decimal so the cumsum is
    // exact in any engine.
    "q168_ltv" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val e = T.events(s, d).select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"),
        col("value").cast(dec).as("v"))
      val matrix = cohorted(e)
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(sum(col("v")).as("rev"))
      matrix
        .withColumn("cum_revenue",
          sum(col("rev")).over(Window.partitionBy(col("cohort_week"))
            .orderBy(col("week_offset"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select(col("cohort_week"), col("week_offset"), col("cum_revenue"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Duplicate-cluster size histogram: the dedup REPORT — how many
    // fingerprint groups exist at each size, i.e. the shape of the
    // duplication in the corpus (a heavy tail here is what the LSH
    // bucket caps defend against). Two partial-aggregated passes over
    // the fingerprint groups.
    "q169_dup_histogram" -> ((s, d) => {
      // planted copies (one per doc_id < 20, two for doc_id < 5) give
      // the histogram its tail — the corpus itself has no exact dups
      val docs = T.documents(s, d)
      val planted = docs.where(col("doc_id") < 20)
        .unionByName(docs.where(col("doc_id") < 5))
      docs.unionByName(planted)
        .groupBy(graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_groups"))
        .orderBy(col("sz"))
    }),

    // Degree distribution of the ownership graph — the first diagnostic
    // on any large graph (skew in the degree histogram predicts which
    // joins need capping). Two partial-aggregated passes: per-node
    // degree, then nodes per degree. Completes the graph family
    // (components q65, triangles q141, PageRank q113).
    "q166_degree_dist" -> ((s, d) => {
      T.customer(s, d).createOrReplaceTempView("q166_customer")
      s.sql(
        s"""WITH ${edgeCte("q166_customer")},
          |deg AS (
          |  SELECT node, COUNT(*) AS degree FROM (
          |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
          |  GROUP BY node)
          |SELECT degree, COUNT(*) AS n_nodes, MIN(node) AS min_node
          |FROM deg GROUP BY degree ORDER BY degree""".stripMargin)
    }),

    // Windowed co-occurrence mining (collaborative-filtering prep):
    // weight user pairs by shared 6-hour activity buckets. Two exact
    // duals exist — join on the bucket key (cost Σ per-bucket pairs;
    // right when entities are many and buckets sparse) or intersect
    // per-entity bucket BITMAPS over an entity-pair join (cost
    // |entities|² × words; right when entities are few and the bucket
    // domain is dense). This corpus is the dense case: the bucket-key
    // join emits 24.5M rows where the bitmap form compares ~1.1M pairs
    // of 2-word bitmaps through the codegen'd BitmapAndCount kernel
    // (13.9s → see bench). A production operator picks the side from
    // cardinality stats.
    "q167_cooccurrence" -> ((s, d) => {
      val m = T.events(s, d)
        .select(expr("unix_micros(ts) div 21600000000").as("bucket"),
          col("user_id"))
        .distinct()
      // dense bitmap domain: bucket ids rebased to [0, range) — the
      // bounds are a one-row aggregate (bounded driver fetch)
      val r = m.agg(min(col("bucket")), max(col("bucket"))).collect()(0)
      // empty input ⇒ null bounds; degrade to a [0, 0] domain (the
      // pair join below is then empty) instead of an NPE on getLong
      val (bmin, bmax) =
        if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
      val nWords = ((bmax - bmin) / 64 + 1).toInt
      val bitmaps = m
        .select(col("user_id"), (col("bucket") - bmin).as("i"))
        .groupBy(col("user_id"), expr("i div 64").as("w"))
        .agg(expr("bit_or(shiftleft(1L, cast(i % 64 as int)))").as("bits"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
          .as("mp"))
        .select(col("user_id"), expr(
          s"transform(sequence(0L, ${nWords - 1}L), " +
            "w -> coalesce(element_at(mp, w), 0L))").as("bm"))
      bitmaps.toDF("id_a", "ba")
        .join(broadcast(bitmaps.toDF("id_b", "bb")),
          col("id_a") < col("id_b"))
        .select(graft.functions.BitmapOps
          .bitmapAndCount(col("ba"), col("bb")).as("shared_buckets"))
        .where(col("shared_buckets") > 0)
        .groupBy(col("shared_buckets"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("shared_buckets"))
    }),

    // Hopping (sliding) window aggregation in batch: 1-hour windows
    // every 15 minutes, so each event lands in exactly 4 windows —
    // Spark's window() generates the covering set in the map stage
    // (an Expand, no self-join), then a normal partial-aggregated
    // groupBy. The oracle regenerates the same 4 hops per event with
    // integer arithmetic.
    "q163_hopping_window" -> ((s, d) => {
      T.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Rolling 7-day actives (WAU): the day x user activity matrix is
    // reduced FIRST (distinct per day), then a short band join against
    // the day spine counts distinct users per trailing week — the
    // rolling-distinct metric that cannot be computed by a running sum
    // (distinct does not decompose). The join input is |days| x
    // |daily actives|, never raw events.
    "q164_rolling_actives" -> ((s, d) => {
      val du = T.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val spine = du.select(col("day")).distinct().toDF("d")
      spine.join(du, datediff(col("d"), col("day")).between(0, 6))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("wau"),
          countDistinct(col("day")).as("n_days_seen"))
        .orderBy(col("d"))
    }),

    // Data-quality rule engine (the dbt-test / Deequ product shape):
    // scalar rules compile to Column predicates and evaluate in ONE
    // scan (a sum(when) per rule — no per-rule pass), referential
    // integrity is a broadcast anti-join; the report is one row per
    // rule with its violation count. At 100 TB the single-scan property
    // is the whole point of a rule engine.
    "q160_quality_rules" -> ((s, d) => {
      val li = T.lineitem(s, d)
      val scalarRules = Seq(
        "quantity_in_range" -> !col("l_quantity").between(1, 50),
        "price_positive" -> (col("l_extendedprice") <= 0),
        "discount_in_range" -> !col("l_discount").between(0.0, 0.1),
        "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"))
      val aggs = scalarRules.map { case (n, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(n) }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val scalarReport = one.select(expr(
        s"stack(${scalarRules.length}, " + scalarRules.map { case (n, _) =>
          s"'$n', $n" }.mkString(", ") + ") as (rule, violations)"))
      val orphanOrders = T.orders(s, d)
        .join(broadcast(T.customer(s, d).select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_customer_fk").as("rule"), col("violations"))
      scalarReport.unionByName(orphanOrders)
        .withColumn("passed", col("violations") === 0)
        .orderBy(col("rule"))
    }),

    // Alerting-style breach-run detection: runs of >= 3 CONSECUTIVE
    // above-threshold readings per user (the gaps-and-islands trick:
    // island id = global row_number minus breach-only row_number, both
    // over the unique (t, event_id) order). One shuffle on user_id
    // serves both window passes and the run aggregate.
    "q161_breach_runs" -> ((s, d) => {
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val e = T.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t"), col("value"))
        .withColumn("rn", row_number().over(byU))
        .where(col("value") > 75.0)
        .withColumn("rnb", row_number().over(byU))
        .withColumn("island", col("rn") - col("rnb"))
      e.groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("run_len"))
        .where(col("run_len") >= 3)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_alerts"), max(col("run_len")).as("max_run"))
        .orderBy(col("user_id"))
    }),

    // Rollup cascade (aggregate navigator): monthly revenue computed
    // FROM the daily pre-aggregate, never from raw rows — the
    // warehouse pattern that makes coarse rollups O(|daily|). Decimal
    // sums compose exactly (unlike floats), so the cascaded result
    // must hash-match the direct monthly aggregate the oracle runs.
    "q162_rollup_cascade" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val daily = T.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).as("rev"))
      daily
        .groupBy(date_trunc("month", col("day")).cast("date").as("month"))
        .agg(sum(col("n")).as("n"),
          sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("month"))
    }),

    // Deterministic pseudonymization with preserved joinability: both
    // tables replace the entity key with md5(key) INDEPENDENTLY, and
    // the pseudonym join must produce exactly the pairs the raw-key
    // join does — the privacy-preserving-linkage contract (tables can
    // be pseudonymized by different jobs, even different engines, and
    // still link). Pure column algebra; the salt would be a config
    // secret in production, constant here so the oracle can replay it.
    "q159_pseudonymize" -> ((s, d) => {
      def pseud(c: org.apache.spark.sql.Column) =
        md5(concat(lit("salt|"), c.cast("string")))
      val e = T.events(s, d)
        .select(pseud(col("user_id")).as("pk"), col("user_id").as("raw"))
      val c = T.customer(s, d).where(col("c_custkey") < 150)
        .select(pseud(col("c_custkey")).as("pk"),
          col("c_custkey").as("raw_c"))
      val viaPseud = e.join(c, "pk")
      viaPseud.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("raw") === col("raw_c"), 1L).otherwise(0L))
          .as("n_raw_agree"),
        countDistinct(col("pk")).as("n_entities"))
        .withColumn("linkage_exact", col("n_pairs") === col("n_raw_agree"))
    }),

    // Time-weighted average (TWAP): each reading holds until the next
    // one, so its weight is the gap to the successor (lead over the
    // unique (t, event_id) order; the final open reading contributes
    // nothing). value x duration products and their sums stay in
    // decimal — exact in any engine — and only the final normalization
    // divides. The metering/billing primitive plain AVG gets wrong
    // whenever readings are unevenly spaced.
    "q156_twap" -> ((s, d) => {
      // (20,6): wide enough for the readings, and the value x micros
      // product stays inside DuckDB's 38-digit decimal cap
      val dec = org.apache.spark.sql.types.DecimalType(20, 6)
      T.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t"), col("value").cast(dec).as("v"))
        // whole-second weights: value x micros sums reach 20 significant
        // digits, where DuckDB's two-step decimal->double cast can differ
        // from a correctly-rounded cast by 1 ulp; second-granularity
        // products stay under 2^53 and cast identically everywhere
        .withColumn("dur_s",
          expr("(lead(t, 1) OVER (PARTITION BY user_id " +
            "ORDER BY t, event_id) - t) div 1000000"))
        .where(col("dur_s").isNotNull && col("dur_s") > 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dur_s")).as("covered_s"),
          sum(col("v") * col("dur_s")).cast("double").as("weighted_sum"))
        .withColumn("twap", col("weighted_sum") / col("covered_s"))
        .orderBy(col("user_id"))
    }),

    // LOCF imputation (last observation carried forward): forward-fill
    // nulled readings per user with last(_, ignoreNulls) over the unique
    // (t, event_id) order — the standard time-series gap repair, one
    // shuffle on the entity key. Nulls are planted deterministically
    // (event_id % 5) so the oracle can replay the fill exactly; sums
    // stay decimal-exact.
    "q138_locf" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val byU = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t"), col("value"))
        .withColumn("v", when(col("event_id") % 5 === 0,
          lit(null).cast(dec)).otherwise(col("value").cast(dec)))
        .withColumn("f", last(col("v"), ignoreNulls = true).over(byU))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulled"),
          sum(when(col("f").isNull, 1L).otherwise(0L)).as("n_still_null"),
          sum(col("f")).cast("double").as("sum_filled"))
        .orderBy(col("user_id"))
    }),

    // Grouped top-k over time buckets (weekly leaderboard): per ISO
    // week, the three most active users — count-reduce FIRST, then a
    // window over the already-aggregated (week, user) rows, so the sort
    // never sees raw events. Deterministic tie-break on user_id.
    "q139_weekly_top" -> ((s, d) => {
      val weekly = T.events(s, d)
        .groupBy(date_trunc("week", col("ts")).cast("date").as("week"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
      weekly
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("week"))
            .orderBy(col("n").desc, col("user_id"))))
        .where(col("rank") <= 3)
        .orderBy(col("week"), col("rank"))
    }),

    // Schema-aligned multi-source union: two feeds with different
    // columns land in one activity table via unionByName with missing
    // columns null-padded — the everyday heterogeneous-landing-zone
    // merge. The aggregate proves both feeds land and the padding is
    // null exactly where the source lacks the column.
    "q140_union_align" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val a = T.events(s, d).select(col("event_id").as("id"),
        lit("event").as("kind"), col("value").cast(dec).as("amount"))
      val b = T.orders(s, d).select(col("o_orderkey").as("id"),
        lit("order").as("kind"), col("o_totalprice").cast(dec).as("amount"),
        col("o_orderpriority").as("priority"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("priority").isNull, 1L).otherwise(0L))
            .as("n_null_priority"),
          sum(col("amount")).cast("double").as("sum_amount"))
        .orderBy(col("kind"))
    }),

    // Distribution drift between the first and second half of the time
    // range (integer midpoint split): per event_type, early/late counts,
    // decimal-exact sums, and the mean shift (two IEEE divides and a
    // subtract — deterministic). The drift screen a training pipeline
    // runs before trusting a new data slice.
    "q129_drift" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 6)
      val e = T.events(s, d).select(col("event_type"),
        unix_micros(col("ts")).as("t"), col("value").cast(dec).as("v"))
      // integer midpoint: epoch micros are ~1.7e18, so the average MUST
      // stay in 64-bit integer arithmetic (a double round-trip loses the
      // low bits and can disagree with the oracle's floor division)
      val mid = e.agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      e.crossJoin(broadcast(mid))
        .withColumn("early", col("t") < col("mid"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("early"), 1L).otherwise(0L)).as("n_early"),
          sum(when(!col("early"), 1L).otherwise(0L)).as("n_late"),
          sum(when(col("early"), col("v"))).cast("double").as("sum_early"),
          sum(when(!col("early"), col("v"))).cast("double").as("sum_late"))
        .withColumn("mean_shift",
          col("sum_late") / col("n_late") - col("sum_early") / col("n_early"))
        .orderBy(col("event_type"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q124_ip_enrich" ->
      """WITH e AS (
        |  SELECT concat_ws('.', 10,
        |    CAST(event_id // 65536 AS BIGINT) % 256,
        |    CAST(event_id // 256 AS BIGINT) % 256,
        |    event_id % 256) AS ip
        |  FROM events
        |), parsed AS (
        |  SELECT ip,
        |    CAST(string_split(ip, '.')[2] AS BIGINT) AS b,
        |    CAST(string_split(ip, '.')[3] AS BIGINT) AS c
        |  FROM e
        |), blocks AS (
        |  SELECT b, c, (b * 256 + c) % 25 AS owner_nation
        |  FROM (SELECT DISTINCT b, c FROM parsed)
        |  WHERE (b + c) % 3 = 0)
        |SELECT k.owner_nation, COUNT(*) AS n_events,
        |  COUNT(DISTINCT p.ip) AS n_ips
        |FROM parsed p JOIN blocks k ON p.b = k.b AND p.c = k.c
        |GROUP BY k.owner_nation ORDER BY k.owner_nation""".stripMargin,

    // identical window pairing on the unique (t, event_id) order
    "q275_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, event_type
        |  FROM events),
        |x AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS dst
        |  FROM e),
        |c AS (
        |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM x WHERE dst IS NOT NULL GROUP BY 1, 2),
        |tt AS (SELECT src, CAST(SUM(n) AS BIGINT) AS tot
        |       FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.n,
        |  CAST((1000 * c.n) // tt.tot AS BIGINT) AS permille
        |FROM c JOIN tt ON tt.src = c.src
        |ORDER BY c.src, c.dst""".stripMargin,

    "q285_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS pid, user_id, ts AS pts,
        |         CAST(value AS DECIMAL(38,6)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS cid, user_id, ts AS cts FROM events
        |  WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.pid, p.v, c.cts,
        |    ROW_NUMBER() OVER (PARTITION BY p.pid
        |      ORDER BY c.cts, c.cid) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY p.pid
        |      ORDER BY c.cts DESC, c.cid DESC) AS rl
        |  FROM p JOIN c ON p.user_id = c.user_id
        |   AND c.cts < p.pts AND c.cts >= p.pts - INTERVAL 24 HOURS),
        |un AS (
        |  SELECT p.pid, p.v FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM c
        |    WHERE c.user_id = p.user_id
        |      AND c.cts < p.pts AND c.cts >= p.pts - INTERVAL 24 HOURS)),
        |allm AS (
        |  SELECT 'first' AS model,
        |    CAST(date_part('hour', cts) AS BIGINT) AS touch_hour, v
        |  FROM j WHERE rf = 1
        |  UNION ALL
        |  SELECT 'last', CAST(date_part('hour', cts) AS BIGINT), v
        |  FROM j WHERE rl = 1
        |  UNION ALL
        |  SELECT 'none', -1, v FROM un)
        |SELECT model, touch_hour, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(v) AS DOUBLE) AS revenue
        |FROM allm GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q125_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
        |), s1 AS (
        |  SELECT user_id, MIN(t) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, MIN(e.t) AS t2, MIN(s1.t1) AS t1
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.t > s1.t1
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, MIN(e.t) AS t3, MIN(s2.t1) AS t1
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.t > s2.t2
        |  GROUP BY e.user_id
        |), stages AS (
        |  SELECT 1 AS stage, user_id, CAST(NULL AS BIGINT) AS dur_us FROM s1
        |  UNION ALL
        |  SELECT 2, user_id, CAST(NULL AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT 3, user_id, t3 - t1 FROM s3)
        |SELECT stage, COUNT(*) AS n_users,
        |  CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us
        |FROM stages GROUP BY stage ORDER BY stage""".stripMargin,

    "q126_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(week) AS cohort_week
        |  FROM active GROUP BY user_id)
        |SELECT c.cohort_week,
        |  CAST(datediff('day', c.cohort_week, a.week) // 7 AS BIGINT)
        |    AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |WHERE datediff('day', c.cohort_week, a.week) // 7 <= 4
        |GROUP BY c.cohort_week, week_offset
        |ORDER BY c.cohort_week, week_offset""".stripMargin,

    "q127_histogram" ->
      """SELECT event_type,
        |  CAST(GREATEST(LEAST(FLOOR(value / 10.0), 9.0), 0.0) AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    "q128_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id
        |  FROM events
        |), lagged AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS from_type
        |  FROM o)
        |SELECT from_type, to_type, COUNT(*) AS n
        |FROM lagged WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,

    "q172_streaks" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), g AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY day) AS INTEGER) AS grp
        |  FROM du
        |), runs AS (
        |  SELECT user_id, grp, COUNT(*) AS len
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
        |  COUNT(*) AS n_streaks, CAST(SUM(len) AS BIGINT) AS active_days
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q173_pareto" ->
      """WITH pc AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(38,6)))
        |    AS rev
        |  FROM orders GROUP BY o_custkey
        |), nn AS (SELECT COUNT(*) AS n FROM pc),
        |r AS (
        |  SELECT o_custkey, rev,
        |    row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn,
        |    SUM(rev) OVER (ORDER BY rev DESC, o_custkey
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM pc
        |), t AS (SELECT SUM(rev) AS tot FROM pc)
        |SELECT rn AS rank,
        |  CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
        |FROM r, t
        |WHERE rn IN (
        |  SELECT CAST(CEIL(nn.n * ks.k / 10.0) AS BIGINT)
        |  FROM (SELECT unnest(generate_series(1, 10)) AS k) ks, nn)
        |ORDER BY rank""".stripMargin,

    "q168_ltv" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    CAST(value AS DECIMAL(38,6)) AS v
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
        |), matrix AS (
        |  SELECT c.cohort_week,
        |    CAST(datediff('day', c.cohort_week, e.week) // 7 AS BIGINT)
        |      AS week_offset,
        |    SUM(e.v) AS rev
        |  FROM e JOIN cohort c ON e.user_id = c.user_id
        |  WHERE datediff('day', c.cohort_week, e.week) // 7 <= 4
        |  GROUP BY c.cohort_week, week_offset)
        |SELECT cohort_week, week_offset,
        |  CAST(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY week_offset
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
        |FROM matrix ORDER BY cohort_week, week_offset""".stripMargin,

    "q169_dup_histogram" ->
      """WITH all_docs AS (
        |  SELECT text FROM documents
        |  UNION ALL SELECT text FROM documents WHERE doc_id < 20
        |  UNION ALL SELECT text FROM documents WHERE doc_id < 5
        |), g AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      AS fp,
        |    COUNT(*) AS sz
        |  FROM all_docs GROUP BY fp)
        |SELECT sz, COUNT(*) AS n_groups
        |FROM g GROUP BY sz ORDER BY sz""".stripMargin,

    "q166_degree_dist" ->
      s"""WITH ${edgeCte("customer", "//")},
        |deg AS (
        |  SELECT node, COUNT(*) AS degree FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY node)
        |SELECT degree, COUNT(*) AS n_nodes, MIN(node) AS min_node
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,

    "q167_cooccurrence" ->
      """WITH b AS (
        |  SELECT DISTINCT epoch_us(ts) // 21600000000 AS bucket, user_id
        |  FROM events
        |), p AS (
        |  SELECT a.user_id AS id_a, c.user_id AS id_b,
        |    COUNT(*) AS shared_buckets
        |  FROM b a JOIN b c
        |    ON a.bucket = c.bucket AND a.user_id < c.user_id
        |  GROUP BY id_a, id_b)
        |SELECT shared_buckets, COUNT(*) AS n_pairs
        |FROM p GROUP BY shared_buckets
        |ORDER BY shared_buckets""".stripMargin,

    "q163_hopping_window" ->
      """WITH hops AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 900000000 - k.k) * 900000000 AS ws
        |  FROM events,
        |    (SELECT unnest(generate_series(0, 3)) AS k) k)
        |SELECT make_timestamp(ws) AS window_start, event_type,
        |  COUNT(*) AS n
        |FROM hops GROUP BY ws, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "q164_rolling_actives" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), spine AS (SELECT DISTINCT day AS d FROM du)
        |SELECT s.d, COUNT(DISTINCT a.user_id) AS wau,
        |  COUNT(DISTINCT a.day) AS n_days_seen
        |FROM spine s JOIN du a
        |  ON datediff('day', a.day, s.d) BETWEEN 0 AND 6
        |GROUP BY s.d ORDER BY s.d""".stripMargin,

    "q160_quality_rules" -> {
      def rule(n: String, bad: String) =
        s"""SELECT '$n' AS rule,
           |  CAST(SUM(CASE WHEN $bad THEN 1 ELSE 0 END) AS BIGINT)
           |    AS violations
           |FROM lineitem""".stripMargin
      Seq(
        rule("quantity_in_range", "NOT (l_quantity BETWEEN 1 AND 50)"),
        rule("price_positive", "l_extendedprice <= 0"),
        rule("discount_in_range", "NOT (l_discount BETWEEN 0.0 AND 0.1)"),
        rule("returnflag_domain", "l_returnflag NOT IN ('A', 'N', 'R')"),
        """SELECT 'orders_customer_fk' AS rule,
          |  CAST((SELECT COUNT(*) FROM orders o
          |        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          |        WHERE c.c_custkey IS NULL) AS BIGINT) AS violations"""
          .stripMargin)
        .mkString("SELECT rule, violations, violations = 0 AS passed FROM (",
          "\nUNION ALL\n", ") ORDER BY rule")
    },

    "q161_breach_runs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events
        |), b AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY t, event_id) AS rnb
        |  FROM e WHERE value > 75.0
        |), runs AS (
        |  SELECT user_id, rn - rnb AS island, COUNT(*) AS run_len
        |  FROM b GROUP BY user_id, island)
        |SELECT user_id, COUNT(*) AS n_alerts,
        |  CAST(MAX(run_len) AS BIGINT) AS max_run
        |FROM runs WHERE run_len >= 3
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q162_rollup_cascade" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,

    "q159_pseudonymize" ->
      """SELECT COUNT(*) AS n_pairs,
        |  CAST(COUNT(*) AS BIGINT) AS n_raw_agree,
        |  COUNT(DISTINCT e.user_id) AS n_entities,
        |  TRUE AS linkage_exact
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE c.c_custkey < 150""".stripMargin,

    "q156_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(value AS DECIMAL(20,6)) AS v
        |  FROM events
        |), g AS (
        |  SELECT user_id, v,
        |    (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t)
        |      // 1000000 AS dur_s
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |  CAST(SUM(dur_s) AS BIGINT) AS covered_s,
        |  CAST(SUM(v * dur_s) AS DOUBLE) AS weighted_sum,
        |  CAST(SUM(v * dur_s) AS DOUBLE) / CAST(SUM(dur_s) AS BIGINT)
        |    AS twap
        |FROM g WHERE dur_s IS NOT NULL AND dur_s > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q141_triangles" ->
      s"""WITH ${edgeCte("customer", "//")},
        |wedge AS (
        |  SELECT e1.a, e1.b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a)
        |SELECT COUNT(*) AS n_triangles,
        |  CAST(COALESCE(MIN(w.a), -1) AS BIGINT) AS min_vertex
        |FROM wedge w JOIN e e3 ON w.a = e3.a AND w.c = e3.b""".stripMargin,

    "q142_hhi" ->
      """WITH c AS (
        |  SELECT event_type, user_id, COUNT(*) AS n_u
        |  FROM events GROUP BY event_type, user_id)
        |SELECT event_type, CAST(SUM(n_u * n_u) AS BIGINT) AS sum_sq,
        |  CAST(SUM(n_u * n_u) AS DOUBLE) / (SUM(n_u) * SUM(n_u)) AS hhi
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q143_cdc_apply" ->
      """WITH snap AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c
        |  FROM orders)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM snap WHERE k % 97 <> 0) +
        |       (SELECT COUNT(*) FROM snap WHERE k % 101 = 0) AS BIGINT)
        |    AS n_rows,
        |  CAST((SELECT SUM(CASE WHEN k % 13 = 0 THEN c + 100 ELSE c END)
        |          FROM snap WHERE k % 97 <> 0) +
        |       (SELECT SUM(c) FROM snap WHERE k % 101 = 0) AS BIGINT)
        |    AS sum_cents""".stripMargin,

    "q138_locf" ->
      """WITH src AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN event_id % 5 = 0 THEN NULL
        |      ELSE CAST(value AS DECIMAL(38,6)) END AS v
        |  FROM events
        |), filled AS (
        |  SELECT user_id, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS f
        |  FROM src)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulled,
        |  CAST(SUM(CASE WHEN f IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_still_null,
        |  CAST(SUM(f) AS DOUBLE) AS sum_filled
        |FROM filled GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q139_weekly_top" ->
      """WITH weekly AS (
        |  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, user_id,
        |    COUNT(*) AS n
        |  FROM events GROUP BY week, user_id)
        |SELECT week, user_id, n, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY week
        |    ORDER BY n DESC, user_id) AS rank
        |  FROM weekly)
        |WHERE rank <= 3 ORDER BY week, rank""".stripMargin,

    "q140_union_align" ->
      """WITH u AS (
        |  SELECT event_id AS id, 'event' AS kind,
        |    CAST(value AS DECIMAL(38,6)) AS amount,
        |    CAST(NULL AS VARCHAR) AS priority
        |  FROM events
        |  UNION ALL
        |  SELECT o_orderkey, 'order', CAST(o_totalprice AS DECIMAL(38,6)),
        |    o_orderpriority
        |  FROM orders)
        |SELECT kind, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_priority,
        |  CAST(SUM(amount) AS DOUBLE) AS sum_amount
        |FROM u GROUP BY kind ORDER BY kind""".stripMargin,

    "q131_mode_per_group" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY n DESC, event_type) AS rn
        |  FROM c
        |), m AS (SELECT user_id, MAX(n) AS max_n FROM c GROUP BY user_id)
        |SELECT r.user_id, r.event_type AS top_type,
        |  CAST(m.max_n AS BIGINT) AS max_n
        |FROM r JOIN m ON r.user_id = m.user_id
        |WHERE rn = 1 ORDER BY r.user_id""".stripMargin,

    "q132_event_sequences" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  array_to_string(
        |    (list(event_type ORDER BY epoch_us(ts), event_id))[1:5], ',')
        |    AS head5
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q133_surrogate_keys" ->
      """WITH dim AS (
        |  SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |), d2 AS (
        |  SELECT *, substr(md5(concat_ws('|', o_orderstatus,
        |    o_orderpriority)), 1, 16) AS sk
        |  FROM dim
        |), j AS (
        |  SELECT d2.sk FROM orders o JOIN d2
        |    ON o.o_orderstatus = d2.o_orderstatus
        |   AND o.o_orderpriority = d2.o_orderpriority
        |), g AS (SELECT sk, COUNT(*) AS n FROM j GROUP BY sk),
        |gs AS (SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT)
        |         AS n_rows FROM g),
        |ds AS (SELECT COUNT(*) AS n_nat, COUNT(DISTINCT sk)
        |         AS n_distinct FROM d2)
        |SELECT gs.n_keys, ds.n_distinct, gs.n_rows,
        |  ds.n_nat = ds.n_distinct AS collision_free
        |FROM gs, ds""".stripMargin,

    "q134_dataset_diff" ->
      """SELECT
        |  CAST(SUM(CASE WHEN o_orderkey % 101 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_added,
        |  CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_removed,
        |  CAST(SUM(CASE WHEN o_orderkey % 97 <> 0 AND o_orderkey % 13 = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(CASE WHEN o_orderkey % 97 <> 0 AND o_orderkey % 13 <> 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM orders""".stripMargin,

    "q129_drift" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS t,
        |    CAST(value AS DECIMAL(38,6)) AS v
        |  FROM events
        |), m AS (
        |  SELECT CAST((MIN(t) + MAX(t)) // 2 AS BIGINT) AS mid FROM e)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN t < mid THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_early,
        |  CAST(SUM(CASE WHEN t >= mid THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(SUM(CASE WHEN t < mid THEN v END) AS DOUBLE) AS sum_early,
        |  CAST(SUM(CASE WHEN t >= mid THEN v END) AS DOUBLE) AS sum_late,
        |  CAST(SUM(CASE WHEN t >= mid THEN v END) AS DOUBLE)
        |      / SUM(CASE WHEN t >= mid THEN 1 ELSE 0 END)
        |    - CAST(SUM(CASE WHEN t < mid THEN v END) AS DOUBLE)
        |      / SUM(CASE WHEN t < mid THEN 1 ELSE 0 END) AS mean_shift
        |FROM e, m GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}

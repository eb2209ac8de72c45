package graft.operators

import graft.{Tables => T}
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-statistics layer — the two measurements a data engine feeds back
  * into planning and scaling decisions:
  *
  *  - q256: duplicate-growth curve — per doc_id-order octile, the share of
  *    documents whose exact fingerprint already appeared earlier in the
  *    corpus. The scaling-law input beside q215's vocabulary growth: how
  *    fast novel content decays as the crawl grows decides how much more
  *    crawling is worth buying. Window-free (octile of the fingerprint's
  *    first occurrence via a min() aggregate; cumulative from the 8×8
  *    triangle join).
  *  - q257: distributed OLS fit — closed-form linear regression of the
  *    q213 structural quality score on document length via the five
  *    classic sums (n, Σx, Σy, Σxy, Σx², Σy²), all map-side-combined in
  *    ONE aggregate pass. Slope/intercept in micro-units with explicit
  *    sign-split divisions (Spark's `div` truncates toward zero, DuckDB's
  *    `//` floors — they agree only on non-negative operands, so every
  *    division here is arranged over non-negatives). The moment
  *    combinations n·Σxy − Σx·Σy carry n²·σ terms that overflow int64
  *    near ~1e6 docs, and the squared covariance far earlier (~50k) — so
  *    every combination is formed in DECIMAL(38,0) on the Spark side and
  *    HUGEINT on DuckDB's, both exact; only bounded BIGINT ratios are
  *    surfaced.
  */
object StatsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q256_dup_growth" -> ((s, d) => {
      val f = T.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      val st = f.agg(count(lit(1)).as("n"))
        .select(expr("(n + 7) div 8").as("step"))
      val firsts = f.groupBy(col("fp")).agg(min(col("doc_id")).as("fd"))
      val o = f.join(firsts, "fp")
        .crossJoin(broadcast(st))
        .select(least(expr("doc_id div step"), lit(7L)).as("octile"),
          when(col("doc_id") > col("fd"), 1L).otherwise(0L).as("dup"))
        .groupBy(col("octile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dup")).as("n_dup"))
      val frame = s.range(0, 8).select(col("id").as("octile"))
      val filled = frame.join(broadcast(o), Seq("octile"), "left")
        .select(col("octile"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      filled.as("a")
        .join(broadcast(filled.as("b")),
          col("b.octile") <= col("a.octile"))
        .groupBy(col("a.octile").as("octile"))
        .agg(max(col("a.n_docs")).as("n_docs"),
          max(col("a.n_dup")).as("n_dup"),
          sum(col("b.n_docs")).as("cum_docs"),
          sum(col("b.n_dup")).as("cum_dup"))
        .select(col("octile"), col("n_docs"), col("n_dup"),
          col("cum_docs"), col("cum_dup"),
          expr("CASE WHEN n_docs > 0 THEN (1000 * n_dup) div n_docs " +
            "ELSE 0 END").as("dup_permille"),
          expr("CASE WHEN cum_docs > 0 THEN (1000 * cum_dup) div cum_docs " +
            "ELSE 0 END").as("cum_dup_permille"))
        .orderBy(col("octile"))
    }),

    // Zipf fit over the frequency head: top-64 words by (freq desc, word
    // asc) via TakeOrdered (never a vocabulary-wide sort), ranks from
    // the bounded 64×64 triangle join (q237's rank-without-window
    // pattern), log-log regression in floor-log2 bits with q257's
    // sign-split arithmetic. Heaps (q215) + OLS (q257) + Zipf close the
    // corpus-statistics trio.
    "q258_zipf_fit" -> ((s, d) => {
      val freq = T.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val top = freq.orderBy(col("c").desc, col("w")).limit(64)
      val ranked = top.as("a")
        .join(broadcast(top.as("b")),
          col("b.c") > col("a.c") ||
            (col("b.c") === col("a.c") && col("b.w") < col("a.w")),
          "left")
        .groupBy(col("a.w").as("w"), col("a.c").as("c"))
        .agg((count(col("b.w")) + 1L).as("rnk"))
      val xy = ranked.select(
        col("w"), col("c"), col("rnk"),
        (length(bin(col("rnk"))) - 1).cast("long").as("x"),
        (length(bin(col("c"))) - 1).cast("long").as("y"))
      val sums = xy.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val fit = sums.select(
        col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("var_x_n"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("var_y_n"))
        .select(col("n"),
          // var_x_n = 0 on a degenerate (single-word) vocabulary:
          // Spark ANSI div throws where DuckDB // yields NULL — guard
          // both sides to 0 (q224 err_permille divergence class)
          expr("CASE WHEN var_x_n <= 0 THEN 0 WHEN cov_n >= 0 " +
            "THEN (1000000 * cov_n) div var_x_n " +
            "ELSE -((1000000 * (-cov_n)) div var_x_n) END")
            .as("slope_micro"),
          expr("CASE WHEN var_x_n * var_y_n > 0 " +
            "THEN (1000 * cov_n * cov_n) div (var_x_n * var_y_n) " +
            "ELSE 0 END")
            .as("r2_permille"))
      val tw = xy.where(col("rnk") === 1)
        .select(col("w").as("top_word"), col("c").as("top_freq"))
      fit.crossJoin(tw)
    }),

    // Quality-filter agreement (Cohen's kappa): the structural
    // distinct-word gate (q213's score ≥ 500) vs the repetition screen
    // (q64's max trigram count < 2), chance-corrected in integer
    // milli-units. The calibration audit that tells a pipeline whether
    // two filters measure the same thing or genuinely complement; pe's
    // marginal products overflow int64 at corpus scale, so they route
    // through DECIMAL(38)/HUGEINT like q257's R². One doc-keyed join of
    // two per-doc screens, then a single 2×2 aggregate.
    "q259_filter_kappa" -> ((s, d) => {
      val docs = T.documents(s, d)
      // filter A = the canonical structural gate (ONE score definition,
      // CorpusQueries.permilleScore, shared with q213/q221)
      val a = docs.select(col("doc_id"),
        (CorpusQueries.permilleScore >= 500).as("fa"))
      val rep = graft.curation.Screening.repetition(docs)
        .select(col("id").as("doc_id"), col("max_rep"))
      val b = docs.select(col("doc_id"))
        .join(rep, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (coalesce(col("max_rep"), lit(1L)) < 2).as("fb"))
      val cells = a.join(b, "doc_id").agg(
        count(lit(1)).as("n"),
        sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("fa") && !col("fb"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("fa") && col("fb"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("fa") && !col("fb"), 1L).otherwise(0L)).as("n00"))
      cells.select(
        col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("(1000000 * (n11 + n00)) div n").as("po_ppm"),
        expr("CAST((1000000 * (CAST((n11 + n10) AS DECIMAL(38,0)) " +
          "* CAST((n11 + n01) AS DECIMAL(38,0)) " +
          "+ CAST((n01 + n00) AS DECIMAL(38,0)) " +
          "* CAST((n10 + n00) AS DECIMAL(38,0)))) div " +
          "(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("pe_ppm"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          col("po_ppm"), col("pe_ppm"),
          expr("CASE WHEN po_ppm >= pe_ppm " +
            "THEN (1000 * (po_ppm - pe_ppm)) div (1000000 - pe_ppm) " +
            "ELSE -((1000 * (pe_ppm - po_ppm)) div (1000000 - pe_ppm)) " +
            "END").as("kappa_milli"))
    }),

    "q257_ols_fit" -> ((s, d) => {
      // y = CorpusQueries.permilleScore: ONE definition shared with the
      // q213/q221 gates so this fit always regresses the score those
      // filters actually apply
      val xy = T.documents(s, d).select(
        col("n_chars").as("x"),
        CorpusQueries.permilleScore.as("y"))
      // Per-row products are small (x·y ≤ 1e7) but their SUMS cross
      // int64 past ~1e10 docs, so the five classic sums ACCUMULATE in
      // DECIMAL(38,0) — mirroring DuckDB's silent HUGEINT widening.
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val sums = xy.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      // The moment combinations n·Σxy − Σx·Σy carry n²·σ terms that
      // overflow int64 near ~1e6 docs (x ≈ 1e4 chars, y ≤ 1000), so they
      // are formed in DECIMAL(38,0) and never surfaced raw; only the
      // bounded ratios (slope, R²) reach the output, back in BIGINT via
      // integral div.
      sums.select(
        col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy " +
          "- CAST(sx AS DECIMAL(38,0)) * sy").as("cov_n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx " +
          "- CAST(sx AS DECIMAL(38,0)) * sx").as("var_x_n"),
        expr("CAST(n AS DECIMAL(38,0)) * syy " +
          "- CAST(sy AS DECIMAL(38,0)) * sy").as("var_y_n"))
        .select(col("n"),
          // slope sign-split so truncating div == flooring // (operands
          // are non-negative in both branches); var_x_n = 0 (all docs
          // equal length) guarded to 0 on both engines
          expr("CAST(CASE WHEN var_x_n <= 0 THEN 0 WHEN cov_n >= 0 " +
            "THEN (1000000 * cov_n) div var_x_n " +
            "ELSE -((1000000 * (-cov_n)) div var_x_n) END AS BIGINT)")
            .as("slope_micro"),
          expr("CAST(CASE WHEN var_x_n * var_y_n > 0 " +
            "THEN (1000 * cov_n * cov_n) div (var_x_n * var_y_n) " +
            "ELSE 0 END AS BIGINT)")
            .as("r2_permille"))
    }),

    // q307: the THIRD stats-driven planner decision live on the
    // registry — broadcast-by-post-filter-cardinality. The join runs
    // through CostModel.planFilteredJoin: the o_totalprice range is
    // priced against the fixture-persisted equi-depth histogram (the
    // ANALYZE analog), and the broadcast-vs-shuffle choice runs on the
    // EFFECTIVE (post-filter) row count, not the relation size Spark's
    // own byte heuristic sees. Result is plan-invariant (the oracle is
    // a plain filtered join), so the gate checks the machinery end to
    // end while ExplainSpec asserts the decision itself flips when ONLY
    // the histogram changes.
    "q307_cbo_filtered_join" -> ((s, d) => {
      val statsDir = cboStatsFixture(s, d)
      val j = graft.plans.CostModel.planFilteredJoin(s, statsDir,
        ordersCbo(s, d), "orders_cbo",
        Seq(graft.plans.CostModel.RangePred(
          "o_totalprice", PriceLo, PriceHi)),
        customerCbo(s, d), "customer_cbo", Nil,
        Seq("ck"))
      j.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("ck")).as("n_custs"))
        .orderBy(col("c_mktsegment"))
    })
  )

  /** Range used by q307 on both the frame and the histogram estimate —
    * top ~10% of the TPC-H-ish o_totalprice domain. */
  private[graft] val PriceLo = 450000.0
  private[graft] val PriceHi = 500000.0

  /** q307's join shapes: shared key name (planFilteredJoin joins USING)
    * + only the columns the query needs. */
  private[graft] def ordersCbo(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).select(col("o_custkey").as("ck"), col("o_totalprice"))
  private[graft] def customerCbo(s: SparkSession, d: String): DataFrame =
    T.customer(s, d).select(col("c_custkey").as("ck"), col("c_mktsegment"))

  /** ANALYZE-once fixture for q307: row counts + key NDVs for both join
    * sides and the o_totalprice equi-depth histogram for the fact side,
    * persisted per sf (the metastore-stats analog; queries read it, the
    * bench prebuilds it). */
  private[graft] def cboStatsFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "cbo_stats")
    if (!new java.io.File(s"$out/customer_cbo/_SUCCESS").exists()) {
      graft.plans.CostModel.analyze(s, out, "orders_cbo",
        ordersCbo(s, d), Seq("ck"), Seq("o_totalprice"))
      graft.plans.CostModel.analyze(s, out, "customer_cbo",
        customerCbo(s, d), Seq("ck"))
    }
    out
  }

  def oracleSql: Map[String, String] = Map(

    "q307_cbo_filtered_join" ->
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE o_totalprice >= $PriceLo AND o_totalprice <= $PriceHi
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q256_dup_growth" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |st AS (SELECT (COUNT(*) + 7) // 8 AS step FROM f),
        |fs AS (SELECT fp, MIN(doc_id) AS fd FROM f GROUP BY 1),
        |o AS (
        |  SELECT least(f.doc_id // st.step, 7) AS octile,
        |    COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN f.doc_id > fs.fd THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_dup
        |  FROM f JOIN fs ON f.fp = fs.fp, st GROUP BY 1),
        |frame AS (SELECT unnest(range(0, 8)) AS octile),
        |filled AS (
        |  SELECT frame.octile, COALESCE(o.n_docs, 0) AS n_docs,
        |    COALESCE(o.n_dup, 0) AS n_dup
        |  FROM frame LEFT JOIN o ON frame.octile = o.octile)
        |SELECT a.octile, CAST(MAX(a.n_docs) AS BIGINT) AS n_docs,
        |  CAST(MAX(a.n_dup) AS BIGINT) AS n_dup,
        |  CAST(SUM(b.n_docs) AS BIGINT) AS cum_docs,
        |  CAST(SUM(b.n_dup) AS BIGINT) AS cum_dup,
        |  CAST(CASE WHEN MAX(a.n_docs) > 0
        |    THEN (1000 * MAX(a.n_dup)) // MAX(a.n_docs) ELSE 0 END
        |    AS BIGINT) AS dup_permille,
        |  CAST(CASE WHEN SUM(b.n_docs) > 0
        |    THEN (1000 * SUM(b.n_dup)) // SUM(b.n_docs) ELSE 0 END
        |    AS BIGINT) AS cum_dup_permille
        |FROM filled a JOIN filled b ON b.octile <= a.octile
        |GROUP BY a.octile ORDER BY a.octile""".stripMargin,

    // same values as the triangle-join rank, different plan class
    "q258_zipf_fit" ->
      """WITH f AS (
        |  SELECT w, COUNT(*) AS c FROM (
        |    SELECT unnest(string_split(trim(lower(text)), ' ')) AS w
        |    FROM documents)
        |  GROUP BY 1),
        |top AS (SELECT w, c FROM f ORDER BY c DESC, w LIMIT 64),
        |r AS (SELECT w, c,
        |        ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk
        |      FROM top),
        |xy AS (
        |  SELECT w, c, rnk,
        |    CAST(length(bin(rnk)) - 1 AS BIGINT) AS x,
        |    CAST(length(bin(c)) - 1 AS BIGINT) AS y
        |  FROM r),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM xy),
        |c AS (
        |  SELECT n, n * sxy - sx * sy AS cov_n,
        |    n * sxx - sx * sx AS var_x_n,
        |    n * syy - sy * sy AS var_y_n
        |  FROM s),
        |tw AS (SELECT w AS top_word, c AS top_freq FROM r WHERE rnk = 1)
        |SELECT n,
        |  CAST(CASE WHEN var_x_n <= 0 THEN 0 WHEN cov_n >= 0
        |    THEN (1000000 * cov_n) // var_x_n
        |    ELSE -((1000000 * (-cov_n)) // var_x_n) END AS BIGINT)
        |    AS slope_micro,
        |  CAST(CASE WHEN var_x_n * var_y_n > 0
        |    THEN (1000 * cov_n * cov_n) // (var_x_n * var_y_n)
        |    ELSE 0 END AS BIGINT)
        |    AS r2_permille,
        |  top_word, CAST(top_freq AS BIGINT) AS top_freq
        |FROM c, tw""".stripMargin,

    "q259_filter_kappa" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    (1000 * len(list_distinct(string_split(trim(lower(text)),
        |      ' ')))) // len(string_split(trim(lower(text)), ' ')) >= 500
        |      AS fa
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    for i in range(1, len(w) - 1)] AS s
        |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS sh FROM g),
        |cnt AS (SELECT doc_id, sh, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |m AS (SELECT doc_id, MAX(c) AS max_rep FROM cnt GROUP BY 1),
        |b AS (
        |  SELECT d.doc_id, COALESCE(m.max_rep, 1) < 2 AS fb
        |  FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id),
        |cells AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n11,
        |    CAST(SUM(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10,
        |    CAST(SUM(CASE WHEN NOT fa AND fb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(SUM(CASE WHEN NOT fa AND NOT fb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM a JOIN b ON a.doc_id = b.doc_id),
        |p AS (
        |  SELECT n, n11, n10, n01, n00,
        |    (1000000 * (n11 + n00)) // n AS po_ppm,
        |    CAST((1000000 * (CAST(n11 + n10 AS HUGEINT)
        |      * CAST(n11 + n01 AS HUGEINT)
        |      + CAST(n01 + n00 AS HUGEINT) * CAST(n10 + n00 AS HUGEINT)))
        |      // (CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS BIGINT)
        |      AS pe_ppm
        |  FROM cells)
        |SELECT n, n11, n10, n01, n00,
        |  CAST(po_ppm AS BIGINT) AS po_ppm, pe_ppm,
        |  CAST(CASE WHEN po_ppm >= pe_ppm
        |    THEN (1000 * (po_ppm - pe_ppm)) // (1000000 - pe_ppm)
        |    ELSE -((1000 * (pe_ppm - po_ppm)) // (1000000 - pe_ppm)) END
        |    AS BIGINT) AS kappa_milli
        |FROM p""".stripMargin,

    "q257_ols_fit" ->
      """WITH xy AS (
        |  SELECT n_chars AS x,
        |    (1000 * len(list_distinct(string_split(trim(lower(text)), ' '))))
        |      // len(string_split(trim(lower(text)), ' ')) AS y
        |  FROM documents),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx,
        |    SUM(y * y) AS syy
        |  FROM xy),
        |c AS (
        |  SELECT n,
        |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_n,
        |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |      AS var_x_n,
        |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
        |      AS var_y_n
        |  FROM s)
        |SELECT n,
        |  CAST(CASE WHEN var_x_n <= 0 THEN 0 WHEN cov_n >= 0
        |    THEN (1000000 * cov_n) // var_x_n
        |    ELSE -((1000000 * (-cov_n)) // var_x_n) END AS BIGINT)
        |    AS slope_micro,
        |  CAST(CASE WHEN var_x_n * var_y_n > 0
        |    THEN (1000 * cov_n * cov_n) // (var_x_n * var_y_n)
        |    ELSE 0 END AS BIGINT) AS r2_permille
        |FROM c""".stripMargin
  )
}

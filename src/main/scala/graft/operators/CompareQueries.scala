package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source comparison layer — the measurements an engine ingesting
  * many collections needs before mixing them: the reference maintains one
  * DB table per collection run and its users query across those tables
  * (`/root/reference/sources/collection/collection.js:358-365` — per-
  * collection table create; `worker` fans queries over them), so "how do
  * two collected sources differ, and which records are the same entity"
  * are first-class questions. All instruments integer/decimal-exact and
  * DuckDB-gated bit-for-bit:
  *
  *  - q276: pairwise total-variation distance between per-source token
  *    distributions — the mixture-weighting input (how redundant are two
  *    crawls?). TV = ½·Σ_w |p_a(w) − p_b(w)| stays RATIONAL with counts:
  *    1000·Σ|c_a·n_b − c_b·n_a| / (2·n_a·n_b), split into a common-token
  *    inner join plus exact one-sided mass corrections (n − Σ_common c),
  *    so no full-outer join over the vocabulary is ever built.
  *  - q277: sorted-neighborhood blocking (Hernández & Stolfo 1995) for
  *    the q268 linkage family — rank records within fixed-width blocks
  *    by sort key, candidates = rank distance ≤ w, reported as a
  *    window-size recall CURVE (w ∈ 1,2,4,8,16) against planted truth.
  *    Two planted error classes: suffix typos (stay sort-adjacent,
  *    found at w=1) and trailing-digit transpositions (move ~2·9 ranks,
  *    recovered only as w grows) — the classic SNM tradeoff, measured.
  *  - q278: Johnson–Lindenstrauss sign projection (Achlioptas 2003) of
  *    the embedding corpus, 64 → 16 dims, with the distance-preservation
  *    histogram over a bounded probe set as the gate. Signs come from a
  *    Lehmer chain (square mod 1000003, × 48271 mod 2³¹−1, parity) —
  *    measured 97% of probe pairs within [0.5, 2)× vs 94% for ideal
  *    i.i.d. signs (a raw LCG parity measured 60%: correlated signs are
  *    a real failure mode, so the hash choice is load-bearing). All
  *    intermediates bounded: quantized coords ≤ 5.3e5, projected ≤
  *    64·5.3e5, squared-diff sums ≤ 7.4e16 — int64-safe under ANSI;
  *    only the final 1000× numerator routes through DECIMAL(38,0).
  *  - q279: Kolmogorov–Smirnov two-sample statistic between per-source
  *    document-length distributions — D = max_v |F_a(v) − F_b(v)| kept
  *    rational as max |cum_a·n_b − cum_b·n_a| over the merged value
  *    grid (a windowed cumsum per pair), / (n_a·n_b) in permille.
  *  - q280: 1-D Wasserstein distance on the same grid — the KS max
  *    swapped for a gap-weighted integral of the CDF difference
  *    (millichars). KS answers "do they differ", W1 answers "by how
  *    much mass must move how far" — both off ONE shared pair grid.
  *  - q281: Mann–Whitney probability of superiority P(A>B) + ½P(A=B)
  *    in permille from the same cumsums — 2U_a = Σ c_a·(2·cum_b(<v) +
  *    c_b(v)), no cross-pair rank materialization, ties at ×2 exact.
  *  - q282: streaming twin of q276 — per-trigger token-census partials
  *    under batch_id-partitioned exactly-once overwrite, merged, then
  *    the SAME TV tail; gated row-for-row to the batch oracle.
  *  - q283: multi-pass SNM — a second pass whose sort key canonicalizes
  *    the transposition error class, unioned with the name pass;
  *    measured union recall 100% where one pass reaches 88%.
  *  - q284: shard-rebalance cost — mod-N vs 64-vnode consistent-hash
  *    ring on a 16 → 17 grow: mod reassigns ~16/17 of all keys, the
  *    ring ~1/17; both layouts resolved in one corpus scan against the
  *    broadcast generated ring.
  *  - q288: Hamilton largest-remainder sample quotas — per-source
  *    budgets that sum to B EXACTLY, each within one unit of its
  *    fractional share; remainder rank via a broadcast self-join over
  *    the |sources|-row aggregate.
  *  - q289: KMV distinct sketch priced against the exact shingle
  *    cardinality — mergeable 64-entry bounded-heap state vs a
  *    universe-sized COUNT(DISTINCT) shuffle; codepoint-fold hash
  *    identical in both engines.
  *  - q291: KMV sketch INTERSECTION — the pairwise source-overlap
  *    matrix (|A∪B|, |A∩B|, Jaccard) estimated from merged 64-entry
  *    sketches alone, priced against the exact pair matrix; the
  *    sketch path shuffles 64 longs/source (duplicate-idempotent
  *    [[graft.functions.KmvAgg]], no distinct anywhere), the exact
  *    path shuffles the shingle universe.
  *
  * Scale shape: every corpus-sized pass is ONE map-side-combined census
  * (per-source token counts, per-source length counts, a per-row
  * projection map); the pairwise layers operate on census rows, never
  * documents — q276's join fans each vocabulary row to ≤ |source pairs|
  * partners and q279's window partitions are |pair| × |distinct values|,
  * both bounded by vocabulary/value range, NOT corpus size. Source
  * totals are tiny broadcast frames. q277 ranks inside fixed-width
  * 100-key name blocks (the q268 lesson: block width must not grow with
  * the corpus), so per-block work is constant and blocks grow linearly;
  * the w-curve is read off ONE candidate materialization aggregated to
  * ≤ 17 rank-distance rows before the window sweep. q278's projection
  * is a narrow per-row map over the corpus; only the deterministic
  * 40-vector probe set (780 pairs, broadcast NLJ) pays a quadratic —
  * the corpus-side cost at 100 TB is the map stage.
  */
object CompareQueries {

  /** Ordered source pairs (src_a < src_b) with both totals, from a
    * per-source totals frame (source, n) — the broadcast pair skeleton
    * shared by the TV tail and the length-distribution grid. */
  private def sourcePairs(tot: DataFrame): DataFrame =
    broadcast(tot.as("ta"))
      .join(broadcast(tot.as("tb")), col("ta.source") < col("tb.source"))
      .select(col("ta.source").as("src_a"), col("tb.source").as("src_b"),
        col("ta.n").as("na"), col("tb.n").as("nb"))

  /** Per-source whitespace-token census — the q136/q64 tokenization
    * (split(trim(lower(text)), " ")), map-side combined. */
  private def tokenCensus(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(split(trim(lower(col("text"))), " ")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))

  /** Pairwise total-variation distance (permille) between per-source
    * token distributions; exposed for CompareSpec's planted-source
    * assertion. Input needs (source, text). */
  private[graft] def tvDistance(docs: DataFrame): DataFrame =
    tvFromCensus(tokenCensus(docs))

  /** The TV tail over an already-accumulated (source, w, c) census —
    * shared verbatim between q276 and its streaming twin q282, so the
    * twins can only diverge in how the census was accumulated. */
  private[graft] def tvFromCensus(cen: DataFrame): DataFrame = {
    val tot = cen.groupBy(col("source")).agg(sum(col("c")).as("n"))
    // Common-token mass: inner join on the word — tokens present in only
    // one source are corrected from the totals below, so the vocabulary
    // never needs a full-outer join.
    val common = cen.as("a")
      .join(cen.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .join(broadcast(tot.as("ta")), col("a.source") === col("ta.source"))
      .join(broadcast(tot.as("tb")), col("b.source") === col("tb.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(
        sum(abs(col("a.c").cast("decimal(38,0)") * col("tb.n")
          - col("b.c").cast("decimal(38,0)") * col("ta.n"))).as("num_c"),
        sum(col("a.c")).as("ca"), sum(col("b.c")).as("cb"))
    sourcePairs(tot).join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        expr("CAST((1000 * (COALESCE(num_c, CAST(0 AS DECIMAL(38,0)))" +
          " + CAST(na - COALESCE(ca, 0) AS DECIMAL(38,0)) * nb" +
          " + CAST(nb - COALESCE(cb, 0) AS DECIMAL(38,0)) * na)) div" +
          " (2 * CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)")
          .as("tv_permille"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Paired per-source length-distribution grid — ONE definition shared
    * by q279 (KS), q280 (Wasserstein) and q281 (Mann-Whitney), so the
    * three two-sample statistics can never disagree about the
    * distributions they compare. Output: (src_a, src_b, na, nb, v, ca,
    * cb), one row per source pair × distinct n_chars value; the census
    * is the only corpus-sized pass (map-side combined), the pair frame
    * is a broadcast of the tiny per-source totals. */
  private def lengthPairGrid(s: SparkSession, d: String): DataFrame = {
    val cen = T.documents(s, d)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val tot = cen.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val pairs = sourcePairs(tot)
    val ea = pairs.join(cen.as("e"), col("e.source") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("na"), col("nb"),
        col("e.v").as("v"), col("e.c").as("ca"), lit(0L).as("cb"))
    val eb = pairs.join(cen.as("e"), col("e.source") === col("src_b"))
      .select(col("src_a"), col("src_b"), col("na"), col("nb"),
        col("e.v").as("v"), lit(0L).as("ca"), col("e.c").as("cb"))
    ea.unionByName(eb)
      .groupBy(col("src_a"), col("src_b"), col("na"), col("nb"),
        col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
  }

  /** A ∪ B linkage files shared by q277 and q283 — file A is customer
    * verbatim; file B drops 1/3 of entities and perturbs names with two
    * planted error classes: 1/11 suffix typo (sort-adjacent) and 1/7
    * trailing-digit transposition (moves the sort rank ~2·9 places).
    * Output: (k, nm, blk, side) with blk the fixed-width 100-key name
    * block (the q268 lesson: block width must not grow with the
    * corpus). */
  private def linkageUnion(s: SparkSession, d: String): DataFrame = {
    val base = T.customer(s, d)
    val a = base.select(col("c_custkey").as("k"),
      col("c_name").as("nm"),
      expr("substr(c_name, 10, 7)").as("blk"), lit(0).as("side"))
    val b = base.where(col("c_custkey") % 3 =!= 0).select(
      col("c_custkey").as("k"),
      expr("CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X'" +
        " WHEN c_custkey % 7 = 0 THEN substr(c_name, 1, 16)" +
        " || substr(c_name, 18, 1) || substr(c_name, 17, 1)" +
        " ELSE c_name END").as("nm"),
      expr("substr(c_name, 10, 7)").as("blk"), lit(1).as("side"))
    a.unionByName(b)
  }

  /** Documents (source, text) split into three parquet files so
    * `maxFilesPerTrigger = 1` yields a genuinely multi-batch bounded
    * stream for q282. Token counts are arrival-order-independent, so
    * the file order needs no pinning. */
  private[graft] def docsSourceSplitFixture(s: SparkSession, d: String)
      : String = {
    val out = graft.Scratch.fixtureDir(d, "docs_split3_source")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.documents(s, d).select(col("source"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(out)
    }
    out
  }

  /** 64 → k sign-projection of the quantized embedding (micro-units);
    * shared by q278 and CompareSpec's exact recompute. The Lehmer-chain
    * sign for (row r, dim j) is
    * parity(((r·8191+j)² mod 1000003) · 48271 mod (2³¹−1)). */
  /** Distinct per-source 3-word shingles (source, t) — the exact-side
    * universe shared by q289's COUNT(DISTINCT) pricing and q291's exact
    * overlap matrix. Universe-sized by design: it exists to PRICE the
    * sketches, the sketches exist to replace it. */
  private def sourceShingles(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("source"),
        split(trim(lower(col("text"))), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(w) - 3)," +
          " i -> concat_ws(' ', slice(w, i + 1, 3)))")).as("t"))
      .distinct()

  /** Deterministic polynomial codepoint-fold hash of string column `c`
    * — (a·131 + code) mod 2³¹−1, identical in both engines (Spark
    * `aggregate` HOF / DuckDB `list_reduce`, both codepoint-based).
    * Shared by q289 and q291. */
  private def shingleHash(c: String): Column = expr(
    s"aggregate(sequence(1, length($c)), CAST(0 AS BIGINT)," +
      s" (a, j) -> (a * 131 + ascii(substr($c, j, 1))) % 2147483647)")

  /** Per-source 64-entry KMV sketch over the RAW shingle-hash stream —
    * ONE scan, map-side combined, duplicate-idempotent state
    * ([[graft.functions.KmvAgg]]): no distinct, no universe shuffle
    * anywhere on this path (ShuffleBudgetSpec pins the measured bytes).
    * Output: (source, sat, mins ascending). */
  private[graft] def kmvSketches(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("source"),
        split(trim(lower(col("text"))), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(w) - 3)," +
          " i -> concat_ws(' ', slice(w, i + 1, 3)))")).as("t"))
      .select(col("source"), shingleHash("t").as("hv"))
      .groupBy(col("source"))
      .agg(graft.functions.KmvAgg.kmvAgg(col("hv"), 64).as("sk"))
      .select(col("source"), col("sk.sat").as("sat"),
        col("sk.mins").as("mins"))

  /** Pairwise source-overlap estimates from the sketches ALONE — the
    * q291 sketch path. merged = the 64 smallest distinct values of the
    * two sketches' union (a valid KMV sketch of A∪B, because each input
    * holds the 64 smallest of its set or the whole set); every merged
    * value is ≤ both sketches' thresholds, so sketch membership IS set
    * membership and Ĵ = |merged ∩ A ∩ B| / 64. Unsaturated sketches
    * are complete sets: the estimates degenerate to exact values. */
  private[graft] def kmvOverlapEst(sk: DataFrame): DataFrame =
    broadcast(sk.select(col("source").as("src_a"),
        col("sat").as("sat_a"), col("mins").as("mins_a")))
      .join(broadcast(sk.select(col("source").as("src_b"),
        col("sat").as("sat_b"), col("mins").as("mins_b"))),
        col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        (!col("sat_a") && !col("sat_b")).as("small"),
        col("mins_a"), col("mins_b"),
        expr("array_sort(array_distinct(concat(mins_a, mins_b)))")
          .as("mrg"))
      .select(col("src_a"), col("src_b"), col("small"),
        expr("CASE WHEN small" +
          " THEN CAST(size(array_intersect(mins_a, mins_b)) AS BIGINT)" +
          " ELSE CAST(size(array_intersect(array_intersect(" +
          "slice(mrg, 1, 64), mins_a), mins_b)) AS BIGINT) END")
          .as("nboth"),
        expr("CASE WHEN small THEN CAST(size(mrg) AS BIGINT)" +
          " ELSE CAST((63 * CAST(2147483647 AS DECIMAL(38,0)))" +
          " div element_at(mrg, 64) AS BIGINT) END").as("d_union_est"))
      .select(col("src_a"), col("src_b"), col("d_union_est"),
        expr("CASE WHEN small THEN nboth" +
          " ELSE (nboth * d_union_est) div 64 END").as("d_inter_est"),
        expr("CASE WHEN small THEN (1000 * nboth) div d_union_est" +
          " ELSE (1000 * nboth) div 64 END").as("jac_est_permille"))

  private[graft] def jlProjected(emb: DataFrame, k: Int): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x ->" +
          " CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("qv"))
      .select(col("vec_id"), col("qv"),
        expr(s"transform(sequence(1, $k), r ->" +
          " aggregate(sequence(1, 64), CAST(0 AS BIGINT), (acc, j) ->" +
          " acc + IF(((((CAST(r AS BIGINT) * 8191 + j)" +
          " * (CAST(r AS BIGINT) * 8191 + j)) % 1000003) * 48271)" +
          " % 2147483647 % 2 = 0," +
          " element_at(qv, j), -element_at(qv, j))))").as("p"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q276_source_divergence" -> ((s, d) =>
      tvDistance(T.documents(s, d))),

    "q277_sorted_neighborhood" -> ((s, d) => {
      import s.implicits._
      val ranked = linkageUnion(s, d).withColumn("r",
        row_number().over(Window.partitionBy(col("blk"))
          .orderBy(col("nm"), col("side"), col("k"))))
      val cand = ranked.where(col("side") === 0).as("x")
        .join(ranked.where(col("side") === 1).as("y"),
          col("x.blk") === col("y.blk") &&
            abs(col("x.r") - col("y.r")) <= 16)
        .select(col("x.k").as("ka"), col("y.k").as("kb"),
          abs(col("x.r") - col("y.r")).as("dr"))
      // Collapse to <= 17 rank-distance rows BEFORE the w sweep: the
      // curve costs nothing beyond the one candidate pass.
      val byDr = cand.groupBy(col("dr")).agg(
        count(lit(1)).as("nc"),
        sum(when(col("ka") === col("kb"), 1L).otherwise(0L)).as("ntr"))
      val nt = linkageUnion(s, d).where(col("side") === 1)
        .agg(count(lit(1)).as("n_truth"))
      val ws = Seq(1L, 2L, 4L, 8L, 16L).toDF("w")
      // ws on the LEFT of an outer join: a window with zero candidates
      // must still emit its (w, 0, 0, n_truth) row — the oracle builds
      // the same unconditional w grid (ws CROSS JOIN nt LEFT JOIN cand),
      // so the two sides agree even on a degenerate corpus where the
      // candidate set is EMPTY (a plain cand-x-ws cross join would
      // return zero rows there)
      broadcast(ws).join(byDr, col("dr") <= col("w"), "left")
        .crossJoin(broadcast(nt))
        .groupBy(col("w"), col("n_truth"))
        .agg(coalesce(sum(col("nc")), lit(0L)).as("n_cand"),
          coalesce(sum(col("ntr")), lit(0L)).as("n_true"))
        .select(col("w"), col("n_cand"), col("n_true"),
          (col("n_truth") - col("n_true")).as("n_missed"))
        .orderBy(col("w"))
    }),

    "q278_jl_projection" -> ((s, d) => {
      val proj = jlProjected(
        T.embeddings(s, d).where(col("vec_id") < 40), k = 16)
      proj.as("a").join(broadcast(proj.as("b")),
          col("a.vec_id") < col("b.vec_id"))
        .select(
          expr("aggregate(zip_with(a.p, b.p, (x, y) -> (x - y) * (x - y))," +
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("dp"),
          expr("aggregate(zip_with(a.qv, b.qv," +
            " (x, y) -> (x - y) * (x - y))," +
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("dd"))
        .where(col("dd") > 0)
        .select(expr("CAST((1000 * CAST(dp AS DECIMAL(38,0)))" +
          " div (16 * dd) AS BIGINT)").as("rp"))
        .select(expr("rp div 200").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("bucket"))
    }),

    "q279_ks_test" -> ((s, d) => {
      val win = Window.partitionBy(col("src_a"), col("src_b"))
        .orderBy(col("v"))
      lengthPairGrid(s, d)
        .select(col("src_a"), col("src_b"), col("na"), col("nb"),
          sum(col("ca")).over(win).as("cca"),
          sum(col("cb")).over(win).as("ccb"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(expr("CAST((1000 * MAX(ABS(CAST(cca AS DECIMAL(38,0)) * nb" +
          " - CAST(ccb AS DECIMAL(38,0)) * na)))" +
          " div (CAST(MAX(na) AS DECIMAL(38,0)) * MAX(nb)) AS BIGINT)")
          .as("ks_permille"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // 1-D Wasserstein (earth mover's) distance between the same paired
    // length distributions — W1 = ∫|F_a − F_b| dv, the KS max swapped
    // for a gap-weighted sum over the same cumulative grid. Reported in
    // millichars: 1000·Σ|cum_a·n_b − cum_b·n_a|·(v_next − v) / (n_a·n_b).
    "q280_wasserstein" -> ((s, d) => {
      val win = Window.partitionBy(col("src_a"), col("src_b"))
        .orderBy(col("v"))
      lengthPairGrid(s, d)
        .select(col("src_a"), col("src_b"), col("na"), col("nb"),
          col("v"),
          sum(col("ca")).over(win).as("cca"),
          sum(col("cb")).over(win).as("ccb"),
          lead(col("v"), 1).over(win).as("vnext"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(expr("CAST((1000 * SUM(ABS(CAST(cca AS DECIMAL(38,0)) * nb" +
          " - CAST(ccb AS DECIMAL(38,0)) * na)" +
          " * (COALESCE(vnext, v) - v)))" +
          " div (CAST(MAX(na) AS DECIMAL(38,0)) * MAX(nb)) AS BIGINT)")
          .as("w1_millichars"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Mann-Whitney probability of superiority P(A > B) + ½P(A = B) in
    // permille — the rank-based effect size beside q279's KS gate,
    // computed from the SAME census cumsums without materializing any
    // cross-pair ranks: 2U_a = Σ_v c_a(v)·(2·cum_b(<v) + c_b(v)), so
    // ps = 1000·2U_a / (2·n_a·n_b) stays a non-negative exact rational
    // (ties carried at ×2, no midrank floats; non-negative operands
    // keep Spark div == DuckDB //).
    "q281_mannwhitney" -> ((s, d) => {
      val win = Window.partitionBy(col("src_a"), col("src_b"))
        .orderBy(col("v"))
      lengthPairGrid(s, d)
        .select(col("src_a"), col("src_b"), col("na"), col("nb"),
          col("ca"), col("cb"),
          sum(col("cb")).over(win).as("ccb"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(expr("CAST((1000 * SUM(CAST(ca AS DECIMAL(38,0))" +
          " * (2 * (ccb - cb) + cb)))" +
          " div (2 * CAST(MAX(na) AS DECIMAL(38,0)) * MAX(nb))" +
          " AS BIGINT)").as("ps_permille"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Multi-pass sorted neighborhood (the second half of the Hernández
    // & Stolfo design): one SNM pass per error-tailored sort key — pass
    // 1 the raw name, pass 2 a transposition-CANONICAL key (last two
    // digits sorted, suffix beyond position 18 truncated) that makes
    // both planted error classes sort-adjacent — then the UNION of the
    // candidate sets. Measured at sf0.01: pass 1 recall 884/1000,
    // pass 2 1000/1000, union 1000/1000 at ~1.5x one pass's
    // candidates. Same fixed-width blocks, same linear rows·w bound
    // per pass.
    "q283_multipass_linkage" -> ((s, d) => {
      val u = linkageUnion(s, d).withColumn("nm2",
        expr("substr(nm, 1, 16)" +
          " || least(substr(nm, 17, 1), substr(nm, 18, 1))" +
          " || greatest(substr(nm, 17, 1), substr(nm, 18, 1))"))
      def pass(key: String): DataFrame = {
        val ranked = u.withColumn("r",
          row_number().over(Window.partitionBy(col("blk"))
            .orderBy(col(key), col("side"), col("k"))))
        ranked.where(col("side") === 0).as("x")
          .join(ranked.where(col("side") === 1).as("y"),
            col("x.blk") === col("y.blk") &&
              abs(col("x.r") - col("y.r")) <= 2)
          .select(col("x.k").as("ka"), col("y.k").as("kb"))
          .distinct()
      }
      val c1 = pass("nm")
      val c2 = pass("nm2")
      val cu = c1.unionByName(c2).distinct()
      val nt = u.where(col("side") === 1)
        .agg(count(lit(1)).as("n_truth"))
      def stats(name: String, c: DataFrame): DataFrame =
        c.agg(count(lit(1)).as("n_cand"),
            sum(when(col("ka") === col("kb"), 1L).otherwise(0L))
              .as("n_true"))
          .select(lit(name).as("pass"), col("n_cand"), col("n_true"))
      stats("pass1_name", c1)
        .unionByName(stats("pass2_canon", c2))
        .unionByName(stats("union_multipass", cu))
        .crossJoin(broadcast(nt))
        .select(col("pass"), col("n_cand"), col("n_true"),
          (col("n_truth") - col("n_true")).as("n_missed"))
        .orderBy(col("pass"))
    }),

    // Shard-rebalance cost: mod-N vs consistent-hash ring (Karger et
    // al. 1997) assignment when a 16-shard layout grows to 17. The mod
    // layout reassigns ~16/17 of all keys (a full 100 TB reshuffle);
    // the 64-vnode ring moves ~1/17 (only the slice the new shard
    // claims). Key and vnode hashes are Lehmer-chain integers exact in
    // both engines; ring intervals come from the ~1088-row generated
    // vnode relation (bounded by construction — the one global window
    // here is over that generated table, never over keys), and each
    // key resolves its interval against the broadcast ring in ONE scan
    // pass — both layouts' assignments and the moved census in a
    // single corpus read, no key-key shuffle.
    "q284_shard_rebalance" -> ((s, d) => {
      val keys = T.customer(s, d).select(col("c_custkey").as("k"),
        expr("((c_custkey % 2147483647) * 48271) % 2147483647").as("h"))
      val vn = s.range(0, 17).select(col("id").as("shard"))
        .crossJoin(s.range(0, 64).select(col("id").as("vnode")))
        .select(col("shard"),
          expr("((((shard * 64 + vnode) * 8191 + 12345)" +
            " * ((shard * 64 + vnode) * 8191 + 12345)) % 1000003)" +
            " * 48271 % 2147483647").as("pos"))
      def intervals(ring: DataFrame): DataFrame =
        ring.select(col("shard"), col("pos").as("lo"),
          coalesce(
            lead(col("pos"), 1).over(
              Window.orderBy(col("pos"), col("shard"))),
            lit(Long.MaxValue)).as("hi"))
      // predecessor-interval semantics: the vnode at pos owns [pos,
      // next_pos), so the wrap region below the global minimum belongs
      // to the HIGHEST-position vnode (the ring's last interval wraps
      // through zero)
      def wrap(ring: DataFrame): DataFrame =
        ring.orderBy(col("pos").desc, col("shard").desc).limit(1)
          .select(col("shard").as("wrap_shard"))
      val r16 = vn.where(col("shard") < 16)
      val a = keys
        .join(broadcast(intervals(r16)).as("i16"),
          col("h") >= col("i16.lo") && col("h") < col("i16.hi"), "left")
        .join(broadcast(intervals(vn)).as("i17"),
          col("h") >= col("i17.lo") && col("h") < col("i17.hi"), "left")
        .crossJoin(broadcast(wrap(r16).as("w16")))
        .crossJoin(broadcast(wrap(vn)
          .select(col("wrap_shard").as("wrap17"))))
        .select(col("h"),
          coalesce(col("i16.shard"), col("wrap_shard")).as("s16"),
          coalesce(col("i17.shard"), col("wrap17")).as("s17"))
      // ONE aggregate carries both layouts' moved counters — the key
      // scan and its interval resolution run once, then a 2-row unpivot
      a.agg(count(lit(1)).as("n_keys"),
          sum(when(col("h") % 16 =!= col("h") % 17, 1L).otherwise(0L))
            .as("mod_moved"),
          sum(when(col("s16") =!= col("s17"), 1L).otherwise(0L))
            .as("ring_moved"))
        .select(explode(array(
          struct(lit("mod").as("strategy"), col("n_keys"),
            col("mod_moved").as("n_moved")),
          struct(lit("ring").as("strategy"), col("n_keys"),
            col("ring_moved").as("n_moved")))).as("r"))
        .select(col("r.strategy").as("strategy"),
          col("r.n_keys").as("n_keys"), col("r.n_moved").as("n_moved"),
          expr("(1000 * r.n_moved) div r.n_keys").as("moved_permille"))
        .orderBy(col("strategy"))
    }),

    // Exact stratified sample allocation — Hamilton's largest-remainder
    // apportionment of a 10% document budget across sources: base
    // quota floor(B·n_i/N), then the B − Σfloor leftover units go to
    // the largest scaled remainders (ties to the lexicographically
    // first source). The property a float allocation cannot give: the
    // quotas SUM TO B EXACTLY and each is within 1 of its real share —
    // what a sampling pipeline needs before it hands per-source row
    // budgets to q158's samplers. One census pass; the apportionment
    // algebra runs on the |sources|-row aggregate with the leftover as
    // a 1-row broadcast and the remainder rank as a broadcast
    // self-join (≤ |sources|² comparisons — no global window). B·n
    // routes through DECIMAL(38,0) (≤ N²/10 overflows int64 past ~1e9
    // docs).
    "q288_sample_quota" -> ((s, d) => {
      val cen = T.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val tot = cen.agg(sum(col("n")).as("nn"),
        expr("sum(n) div 10").as("b"))
      val base = cen.crossJoin(broadcast(tot))
        .select(col("source"), col("n"), col("b"), col("nn"),
          expr("CAST((CAST(b AS DECIMAL(38,0)) * n) div nn AS BIGINT)")
            .as("q0"),
          expr("CAST(CAST(b AS DECIMAL(38,0)) * n" +
            " - ((CAST(b AS DECIMAL(38,0)) * n) div nn)" +
            " * CAST(nn AS DECIMAL(38,0)) AS BIGINT)").as("rem"))
      val left = base.agg((max(col("b")) - sum(col("q0")))
        .as("left_over"))
      val rank = base.as("x")
        .join(broadcast(base.as("y")),
          col("y.rem") > col("x.rem") ||
            (col("y.rem") === col("x.rem") &&
              col("y.source") < col("x.source")),
          "left")
        .groupBy(col("x.source").as("source"), col("x.n").as("n_docs"),
          col("x.q0").as("q0"))
        .agg(count(col("y.source")).as("nahead"))
      rank.crossJoin(broadcast(left))
        .select(col("source"), col("n_docs"),
          (col("q0") + when(col("nahead") < col("left_over"), 1L)
            .otherwise(0L)).as("quota"))
        .orderBy(col("source"))
    }),

    // KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct sketch,
    // priced against the exact count like q249's Bloom pricing: the
    // per-source distinct-shingle cardinality from only the k = 64
    // smallest hash values — (k−1)·SPACE / h_k — next to the exact
    // COUNT(DISTINCT). The sketch side's aggregation state is the
    // bounded heap ([[graft.functions.TopKAgg]], k entries per source,
    // partial-aggregable and MERGEABLE — union of sketches = sketch of
    // union), which is the whole 100 TB story: exact distinct shuffles
    // the shingle universe, the sketch shuffles 64 longs per source.
    // Every arithmetic step is deterministic in both engines — the
    // shingle hash is a Lehmer-free polynomial fold over codepoints
    // ((a·131 + code) mod 2³¹−1, fold = Spark `aggregate` HOF, DuckDB
    // `list_reduce`), so est and err gate bit-for-bit. Measured err at
    // k=64: median ~6-9%, the 1/√k ≈ 12.5% KMV band.
    "q289_kmv_distinct" -> ((s, d) => {
      val sh = sourceShingles(s, d)
      val h = sh.select(col("source"), shingleHash("t").as("hv"))
        .distinct()
      val kmv = h.groupBy(col("source")).agg(
        count(lit(1)).as("nh"),
        graft.functions.TopKAgg.topkAgg(
          -col("hv").cast("double"), col("hv"), 64).as("mins"))
      val ex = sh.groupBy(col("source"))
        .agg(countDistinct(col("t")).as("d_exact"))
      ex.join(kmv, "source")
        .select(col("source"), col("d_exact"),
          expr("CASE WHEN nh < 64 THEN nh" +
            " ELSE CAST((63 * CAST(2147483647 AS DECIMAL(38,0)))" +
            " div element_at(mins, 64).id AS BIGINT) END").as("d_est"))
        .select(col("source"), col("d_exact"), col("d_est"),
          expr("(1000 * abs(d_exact - d_est)) div d_exact")
            .as("err_permille"))
        .orderBy(col("source"))
    }),

    // KMV/theta-sketch INTERSECTION — the 100 TB twin of the exact
    // cross-source overlap matrix (q226's provenance question asked of
    // shingle SETS): pairwise |A∪B|, |A∩B| and Jaccard per source pair,
    // estimated from the merged 64-entry sketches alone and priced
    // against the exact matrix computed beside it. The exact side needs
    // the shingle universe in a pair equi-join; the sketch side needs
    // 64 longs + 1 bit per source — and because [[graft.functions
    // .KmvAgg]] is duplicate-idempotent, the RAW (unDISTINCTed) hash
    // stream feeds it in one map-side-combined scan with no universe
    // shuffle anywhere on the sketch path (ShuffleBudgetSpec pins the
    // bytes). Estimators (Bar-Yossef 2002 / theta-sketch folklore):
    // merged = 64 smallest of the sketch union (valid KMV of A∪B);
    // D̂(A∪B) = 63·SPACE / merged[64]; Ĵ = |merged ∩ A ∩ B|/64 (merged
    // values sit under both thresholds, so sketch membership IS set
    // membership); D̂(A∩B) = (Ĵ-numerator · D̂(A∪B)) div 64. Unsaturated
    // sketches are complete sets and every estimate degenerates to the
    // exact value. All-integer, bit-identical in DuckDB (HUGEINT-floor
    // discipline); CompareSpec gates the error band vs exact.
    "q291_kmv_overlap" -> ((s, d) => {
      val sh = sourceShingles(s, d)
      val ex = sh.groupBy(col("source")).agg(count(lit(1)).as("d_exact"))
      val inter = sh.select(col("source").as("src_a"), col("t"))
        .join(sh.select(col("source").as("src_b"), col("t")), "t")
        .where(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("d_inter"))
      val exact = broadcast(ex.select(col("source").as("src_a"),
          col("d_exact").as("da")))
        .join(broadcast(ex.select(col("source").as("src_b"),
          col("d_exact").as("db"))), col("src_a") < col("src_b"))
        .join(inter, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"),
          (col("da") + col("db") - coalesce(col("d_inter"), lit(0L)))
            .as("d_union"),
          coalesce(col("d_inter"), lit(0L)).as("d_inter"))
      kmvOverlapEst(kmvSketches(s, d))
        .join(exact, Seq("src_a", "src_b"))
        .select(col("src_a"), col("src_b"), col("d_union"),
          col("d_inter"),
          expr("(1000 * d_inter) div d_union").as("jac_exact_permille"),
          col("d_union_est"), col("d_inter_est"), col("jac_est_permille"))
        .withColumn("err_permille",
          abs(col("jac_est_permille") - col("jac_exact_permille")))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Kendall rank correlation between two source ORDERINGS — are the
    // sources that score well on q213's structural quality (type-token
    // permille, CorpusQueries.permilleScore — ONE definition shared
    // with the gate) the same sources that produce long documents? All
    // integer: per-source aggregates (milli-avg quality, avg length),
    // the |sources|² pair census on the broadcast 20-row frame, and
    // tau_a = 1000·(C − D)/n₀ with the SIGN-SPLIT division (C − D is
    // signed, and Spark div truncates toward zero where DuckDB //
    // floors — they only agree on non-negatives, the q257 discipline).
    // tau-b's tie-corrected denominator needs a sqrt, so the raw tie
    // counts surface instead and the caller applies the correction.
    // Measured: tau_a ≈ −0.85 — the Heaps'-law signal (longer docs,
    // lower type-token ratio), which is exactly the kind of
    // mixture-confounder this diagnostic exists to expose.
    "q290_rank_correlation" -> ((s, d) => {
      val per = T.documents(s, d)
        .select(col("source"), CorpusQueries.permilleScore.as("score"),
          col("n_chars"))
        .groupBy(col("source"))
        .agg(expr("(1000 * sum(score)) div count(1)").as("qa"),
          expr("sum(n_chars) div count(1)").as("qb"))
      per.as("x").join(broadcast(per.as("y")),
          col("x.source") < col("y.source"))
        .select((col("x.qa") - col("y.qa")).as("da"),
          (col("x.qb") - col("y.qb")).as("db"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("da") * col("db") > 0, 1L).otherwise(0L))
            .as("concordant"),
          sum(when(col("da") * col("db") < 0, 1L).otherwise(0L))
            .as("discordant"),
          sum(when(col("da") === 0, 1L).otherwise(0L)).as("ties_a"),
          sum(when(col("db") === 0, 1L).otherwise(0L)).as("ties_b"))
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          col("ties_a"), col("ties_b"),
          expr("CASE WHEN concordant >= discordant" +
            " THEN (1000 * (concordant - discordant)) div n_pairs" +
            " ELSE -((1000 * (discordant - concordant)) div n_pairs)" +
            " END").as("tau_a_permille"))
    }),

    // Streaming twin of q276: the corpus-sized token-census pass runs
    // INSIDE the streaming engine — each micro-batch reduces its own
    // documents to (source, token, count) partials (O(batch) work,
    // map-side combined before anything persists) written under its
    // batch_id with dynamic-partition overwrite, so a replayed batch
    // rewrites its own partition and the merge can never double-count
    // (the q210/q253/q273 exactly-once discipline). Token counts are
    // additive and arrival-order-independent, so the merged census
    // equals the batch census at ANY file split; the vocabulary-sized
    // TV tail (shared verbatim with q276) then runs once over the
    // merged cells. Gated row-for-row to q276 — same oracle.
    "q282_stream_divergence" -> ((s, d) =>
      streamDivergenceRun(s, d, graft.Scratch.runDir("graft_streamtv"),
        failAfter = None))
  )

  /** One bounded run of the q282 streaming TV-divergence twin against
    * the shared state under `base` (checkpoint + batch-partitioned
    * census cells). `failAfter = Some(k)` throws once batch id reaches
    * k — a planned mid-run death; re-invoking with the SAME base
    * resumes from the committed prefix, and StreamingSpec gates that
    * the recovered result equals an uninterrupted run bit-for-bit. */
  private[graft] def streamDivergenceRun(s: SparkSession, d: String,
      base: String, failAfter: Option[Int]): DataFrame =
    graft.Confs.dynamicOverwrite(s) {
      val dir = docsSourceSplitFixture(s, d)
      val schema = s.read.parquet(dir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("source"), col("text"))
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          if (failAfter.exists(bid >= _))
            graft.streaming.PlannedStop.fail()
          batch.select(col("source"),
              explode(split(trim(lower(col("text"))), " ")).as("w"))
            .groupBy(col("source"), col("w"))
            .agg(count(lit(1)).as("c"))
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/cells")
          ()
        }
        .start()
      graft.streaming.PlannedStop.await(q, failAfter.nonEmpty)
      tvFromCensus(
        s.read.parquet(s"$base/cells")
          .groupBy(col("source"), col("w"))
          .agg(sum(col("c")).as("c")))
    }

  /** q276's truth — and q282's: the streaming twin is gated to equal
    * the batch TV exactly, so they share one oracle string. */
  private val tvOracle: String =
    """WITH tok AS (
        |  SELECT source, unnest(string_split(trim(lower(text)), ' ')) AS w
        |  FROM documents),
        |cen AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM tok GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
        |        FROM cen GROUP BY 1),
        |common AS (
        |  SELECT a.source AS ca_src, b.source AS cb_src,
        |    CAST(SUM(ABS(CAST(a.c AS DECIMAL(38,0)) * tb.n
        |              - CAST(b.c AS DECIMAL(38,0)) * ta.n))
        |      AS DECIMAL(38,0)) AS num_c,
        |    CAST(SUM(a.c) AS BIGINT) AS ca, CAST(SUM(b.c) AS BIGINT) AS cb
        |  FROM cen a JOIN cen b ON a.w = b.w AND a.source < b.source
        |  JOIN tot ta ON ta.source = a.source
        |  JOIN tot tb ON tb.source = b.source
        |  GROUP BY 1, 2)
        |SELECT ta.source AS src_a, tb.source AS src_b,
        |  CAST(CAST(1000 * (COALESCE(c.num_c, 0)
        |      + CAST(ta.n - COALESCE(c.ca, 0) AS DECIMAL(38,0)) * tb.n
        |      + CAST(tb.n - COALESCE(c.cb, 0) AS DECIMAL(38,0)) * ta.n)
        |      AS HUGEINT)
        |    // (2 * CAST(ta.n AS HUGEINT) * tb.n) AS BIGINT)
        |    AS tv_permille
        |FROM tot ta JOIN tot tb ON ta.source < tb.source
        |LEFT JOIN common c ON c.ca_src = ta.source AND c.cb_src = tb.source
        |ORDER BY src_a, src_b""".stripMargin

  /** Shared CTE prefix of the three two-sample oracles — the SQL twin
    * of [[lengthPairGrid]]. */
  private val pairGridCte: String =
    """WITH cen AS (
      |  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
      |        FROM cen GROUP BY 1),
      |tagged AS (
      |  SELECT ta.source AS src_a, tb.source AS src_b,
      |         ta.n AS na, tb.n AS nb, e.v,
      |         CASE WHEN e.source = ta.source THEN e.c ELSE 0 END AS ca,
      |         CASE WHEN e.source = tb.source THEN e.c ELSE 0 END AS cb
      |  FROM tot ta JOIN tot tb ON ta.source < tb.source
      |  JOIN cen e ON e.source IN (ta.source, tb.source)),
      |m AS (
      |  SELECT src_a, src_b, na, nb, v, SUM(ca) AS ca, SUM(cb) AS cb
      |  FROM tagged GROUP BY 1, 2, 3, 4, 5)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q276_source_divergence" -> tvOracle,

    "q282_stream_divergence" -> tvOracle,

    "q280_wasserstein" -> (pairGridCte +
      """,
        |cum AS (
        |  SELECT src_a, src_b, na, nb, v,
        |    SUM(ca) OVER w AS cca, SUM(cb) OVER w AS ccb,
        |    LEAD(v) OVER w AS vnext
        |  FROM m
        |  WINDOW w AS (PARTITION BY src_a, src_b ORDER BY v))
        |SELECT src_a, src_b,
        |  CAST(CAST(1000 * SUM(ABS(CAST(cca AS DECIMAL(38,0)) * nb
        |                         - CAST(ccb AS DECIMAL(38,0)) * na)
        |            * (COALESCE(vnext, v) - v)) AS HUGEINT)
        |       // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT)
        |    AS w1_millichars
        |FROM cum GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin),

    "q281_mannwhitney" -> (pairGridCte +
      """,
        |cum AS (
        |  SELECT src_a, src_b, na, nb, ca, cb,
        |    SUM(cb) OVER (PARTITION BY src_a, src_b ORDER BY v) AS ccb
        |  FROM m)
        |SELECT src_a, src_b,
        |  CAST(CAST(1000 * SUM(CAST(ca AS DECIMAL(38,0))
        |          * (2 * (ccb - cb) + cb)) AS HUGEINT)
        |       // (2 * CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT)
        |    AS ps_permille
        |FROM cum GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin),

    "q277_sorted_neighborhood" ->
      """WITH a AS (
        |  SELECT c_custkey AS k, c_name AS nm,
        |         substr(c_name, 10, 7) AS blk, 0 AS side
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X'
        |         WHEN c_custkey % 7 = 0 THEN substr(c_name, 1, 16)
        |           || substr(c_name, 18, 1) || substr(c_name, 17, 1)
        |         ELSE c_name END AS nm,
        |    substr(c_name, 10, 7) AS blk, 1 AS side
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY blk
        |    ORDER BY nm, side, k) AS r
        |  FROM u),
        |cand AS (
        |  SELECT x.k AS ka, y.k AS kb, ABS(x.r - y.r) AS dr
        |  FROM ranked x JOIN ranked y
        |    ON x.blk = y.blk AND x.side = 0 AND y.side = 1
        |   AND ABS(x.r - y.r) <= 16),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM b),
        |ws AS (SELECT CAST(UNNEST([1, 2, 4, 8, 16]) AS BIGINT) AS w)
        |SELECT w,
        |  CAST(COUNT(cand.dr) AS BIGINT) AS n_cand,
        |  CAST(SUM(CASE WHEN cand.ka = cand.kb THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_true,
        |  nt.n_truth - CAST(SUM(CASE WHEN cand.ka = cand.kb
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
        |FROM ws CROSS JOIN nt
        |LEFT JOIN cand ON cand.dr <= ws.w
        |GROUP BY w, nt.n_truth ORDER BY w""".stripMargin,

    "q290_rank_correlation" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST((1000 * len(list_distinct(string_split(trim(lower(text)),
        |      ' ')))) // len(string_split(trim(lower(text)), ' '))
        |      AS BIGINT) AS score,
        |    n_chars
        |  FROM documents),
        |s AS (
        |  SELECT source,
        |    CAST((1000 * SUM(score)) // COUNT(*) AS BIGINT) AS qa,
        |    CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS qb
        |  FROM m GROUP BY 1),
        |p AS (
        |  SELECT (x.qa - y.qa) AS da, (x.qb - y.qb) AS db
        |  FROM s x JOIN s y ON x.source < y.source),
        |c AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN da * db > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS concordant,
        |    CAST(SUM(CASE WHEN da * db < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS discordant,
        |    CAST(SUM(CASE WHEN da = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_a,
        |    CAST(SUM(CASE WHEN db = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_b
        |  FROM p)
        |SELECT n_pairs, concordant, discordant, ties_a, ties_b,
        |  CASE WHEN concordant >= discordant
        |       THEN CAST((1000 * (concordant - discordant)) // n_pairs
        |            AS BIGINT)
        |       ELSE -CAST((1000 * (discordant - concordant)) // n_pairs
        |            AS BIGINT)
        |  END AS tau_a_permille
        |FROM c""".stripMargin,

    "q289_kmv_distinct" ->
      """WITH g AS (
        |  SELECT source, [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    for i in range(1, len(w) - 1)] AS s
        |  FROM (SELECT source, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |tok AS (SELECT DISTINCT source, unnest(s) AS t FROM g),
        |h AS (
        |  SELECT DISTINCT source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(substr(t, i, 1)) AS BIGINT)
        |       for i in range(1, len(t) + 1)]),
        |      (a, b) -> (a * 131 + b) % 2147483647) AS hv
        |  FROM tok),
        |ex AS (SELECT source, CAST(COUNT(DISTINCT t) AS BIGINT) AS d_exact
        |       FROM tok GROUP BY 1),
        |rk AS (SELECT source, hv,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS r,
        |         COUNT(*) OVER (PARTITION BY source) AS nh
        |       FROM h),
        |kth AS (SELECT source, MAX(nh) AS nh,
        |          MAX(CASE WHEN r = 64 THEN hv END) AS hk
        |        FROM rk WHERE r <= 64 GROUP BY source),
        |est AS (
        |  SELECT e.source, e.d_exact,
        |    CASE WHEN k.nh < 64 THEN k.nh
        |         ELSE CAST(63 * CAST(2147483647 AS HUGEINT) // k.hk
        |              AS BIGINT) END AS d_est
        |  FROM ex e JOIN kth k ON k.source = e.source)
        |SELECT source, d_exact, d_est,
        |  CAST((1000 * ABS(d_exact - d_est)) // d_exact AS BIGINT)
        |    AS err_permille
        |FROM est ORDER BY source""".stripMargin,

    "q291_kmv_overlap" ->
      """WITH g AS (
        |  SELECT source, [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    for i in range(1, len(w) - 1)] AS s
        |  FROM (SELECT source, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |tok AS (SELECT DISTINCT source, unnest(s) AS t FROM g),
        |h AS (
        |  SELECT DISTINCT source,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(ascii(substr(t, i, 1)) AS BIGINT)
        |       for i in range(1, len(t) + 1)]),
        |      (a, b) -> (a * 131 + b) % 2147483647) AS hv
        |  FROM tok),
        |sk AS (SELECT source, COUNT(*) > 64 AS sat,
        |         (list_sort(list(hv)))[1:64] AS mins
        |       FROM h GROUP BY source),
        |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS d_exact
        |       FROM tok GROUP BY 1),
        |ix AS (SELECT a.source AS src_a, b.source AS src_b,
        |         CAST(COUNT(*) AS BIGINT) AS d_inter
        |       FROM tok a JOIN tok b
        |         ON a.t = b.t AND a.source < b.source
        |       GROUP BY 1, 2),
        |px AS (SELECT ea.source AS src_a, eb.source AS src_b,
        |         CAST(ea.d_exact + eb.d_exact - COALESCE(i.d_inter, 0)
        |           AS BIGINT) AS d_union,
        |         CAST(COALESCE(i.d_inter, 0) AS BIGINT) AS d_inter
        |       FROM ex ea JOIN ex eb ON ea.source < eb.source
        |       LEFT JOIN ix i
        |         ON i.src_a = ea.source AND i.src_b = eb.source),
        |m AS (SELECT p.src_a, p.src_b, p.d_union, p.d_inter,
        |        NOT sa.sat AND NOT sb.sat AS small,
        |        sa.mins AS mins_a, sb.mins AS mins_b,
        |        list_sort(list_distinct(list_concat(sa.mins, sb.mins)))
        |          AS mrg
        |      FROM px p JOIN sk sa ON sa.source = p.src_a
        |      JOIN sk sb ON sb.source = p.src_b),
        |e AS (SELECT src_a, src_b, d_union, d_inter, small,
        |        CASE WHEN small
        |          THEN CAST(len(list_intersect(mins_a, mins_b))
        |            AS BIGINT)
        |          ELSE CAST(len(list_intersect(list_intersect(
        |            mrg[1:64], mins_a), mins_b)) AS BIGINT) END AS nboth,
        |        CASE WHEN small THEN CAST(len(mrg) AS BIGINT)
        |          ELSE CAST(63 * CAST(2147483647 AS HUGEINT) // mrg[64]
        |            AS BIGINT) END AS d_union_est
        |      FROM m)
        |SELECT src_a, src_b, d_union, d_inter,
        |  CAST((1000 * d_inter) // d_union AS BIGINT)
        |    AS jac_exact_permille,
        |  d_union_est,
        |  CAST(CASE WHEN small THEN nboth
        |    ELSE (nboth * d_union_est) // 64 END AS BIGINT)
        |    AS d_inter_est,
        |  CAST(CASE WHEN small THEN (1000 * nboth) // d_union_est
        |    ELSE (1000 * nboth) // 64 END AS BIGINT)
        |    AS jac_est_permille,
        |  CAST(ABS(CAST(CASE WHEN small THEN (1000 * nboth) // d_union_est
        |      ELSE (1000 * nboth) // 64 END AS BIGINT)
        |    - CAST((1000 * d_inter) // d_union AS BIGINT)) AS BIGINT)
        |    AS err_permille
        |FROM e ORDER BY src_a, src_b""".stripMargin,

    "q288_sample_quota" ->
      """WITH cen AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |             FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |               CAST(SUM(n) // 10 AS BIGINT) AS b FROM cen),
        |base AS (
        |  SELECT source, n, tot.b, tot.nn,
        |    CAST(CAST(tot.b AS HUGEINT) * n // tot.nn AS BIGINT) AS q0,
        |    CAST(CAST(tot.b AS HUGEINT) * n
        |      - (CAST(tot.b AS HUGEINT) * n // tot.nn) * tot.nn
        |      AS BIGINT) AS rem
        |  FROM cen, tot),
        |lft AS (SELECT MAX(b) - CAST(SUM(q0) AS BIGINT) AS left_over
        |        FROM base),
        |rk AS (
        |  SELECT source, n, q0, rem,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS r
        |  FROM base)
        |SELECT rk.source, rk.n AS n_docs,
        |  rk.q0 + CASE WHEN rk.r <= lft.left_over THEN 1 ELSE 0 END
        |    AS quota
        |FROM rk, lft ORDER BY rk.source""".stripMargin,

    "q283_multipass_linkage" ->
      """WITH a AS (
        |  SELECT c_custkey AS k, c_name AS nm,
        |         substr(c_name, 10, 7) AS blk, 0 AS side
        |  FROM customer),
        |b AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 11 = 0 THEN c_name || 'X'
        |         WHEN c_custkey % 7 = 0 THEN substr(c_name, 1, 16)
        |           || substr(c_name, 18, 1) || substr(c_name, 17, 1)
        |         ELSE c_name END AS nm,
        |    substr(c_name, 10, 7) AS blk, 1 AS side
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |u AS (SELECT k, nm, blk, side,
        |        substr(nm, 1, 16)
        |          || least(substr(nm, 17, 1), substr(nm, 18, 1))
        |          || greatest(substr(nm, 17, 1), substr(nm, 18, 1)) AS nm2
        |      FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
        |r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY blk
        |         ORDER BY nm, side, k) AS r FROM u),
        |r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY blk
        |         ORDER BY nm2, side, k) AS r FROM u),
        |c1 AS (SELECT DISTINCT x.k AS ka, y.k AS kb
        |       FROM r1 x JOIN r1 y ON x.blk = y.blk
        |        AND x.side = 0 AND y.side = 1 AND ABS(x.r - y.r) <= 2),
        |c2 AS (SELECT DISTINCT x.k AS ka, y.k AS kb
        |       FROM r2 x JOIN r2 y ON x.blk = y.blk
        |        AND x.side = 0 AND y.side = 1 AND ABS(x.r - y.r) <= 2),
        |cu AS (SELECT * FROM c1 UNION SELECT * FROM c2),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM b),
        |st AS (
        |  SELECT 'pass1_name' AS pass, COUNT(*) AS nc,
        |    SUM(CASE WHEN ka = kb THEN 1 ELSE 0 END) AS ntr FROM c1
        |  UNION ALL
        |  SELECT 'pass2_canon', COUNT(*),
        |    SUM(CASE WHEN ka = kb THEN 1 ELSE 0 END) FROM c2
        |  UNION ALL
        |  SELECT 'union_multipass', COUNT(*),
        |    SUM(CASE WHEN ka = kb THEN 1 ELSE 0 END) FROM cu)
        |SELECT pass, CAST(nc AS BIGINT) AS n_cand,
        |  CAST(ntr AS BIGINT) AS n_true,
        |  nt.n_truth - CAST(ntr AS BIGINT) AS n_missed
        |FROM st, nt ORDER BY pass""".stripMargin,

    "q284_shard_rebalance" ->
      """WITH keys AS (
        |  SELECT c_custkey AS k,
        |    ((c_custkey % 2147483647) * 48271) % 2147483647 AS h
        |  FROM customer),
        |vn AS (
        |  SELECT s.s AS shard, v.v AS vnode,
        |    ((((s.s * 64 + v.v) * 8191 + 12345)
        |      * ((s.s * 64 + v.v) * 8191 + 12345)) % 1000003)
        |      * 48271 % 2147483647 AS pos
        |  FROM (SELECT UNNEST(range(0, 17)) AS s) s,
        |       (SELECT UNNEST(range(0, 64)) AS v) v),
        |ring16 AS (SELECT shard, pos FROM vn WHERE shard < 16),
        |iv16 AS (
        |  SELECT shard, pos AS lo,
        |    COALESCE(LEAD(pos) OVER (ORDER BY pos, shard),
        |             9223372036854775807) AS hi
        |  FROM ring16),
        |iv17 AS (
        |  SELECT shard, pos AS lo,
        |    COALESCE(LEAD(pos) OVER (ORDER BY pos, shard),
        |             9223372036854775807) AS hi
        |  FROM vn),
        |w16 AS (SELECT shard AS wrap16 FROM ring16
        |        ORDER BY pos DESC, shard DESC LIMIT 1),
        |w17 AS (SELECT shard AS wrap17 FROM vn
        |        ORDER BY pos DESC, shard DESC LIMIT 1),
        |a AS (
        |  SELECT k.h,
        |    COALESCE(i16.shard, w16.wrap16) AS s16,
        |    COALESCE(i17.shard, w17.wrap17) AS s17
        |  FROM keys k
        |  LEFT JOIN iv16 i16 ON k.h >= i16.lo AND k.h < i16.hi
        |  LEFT JOIN iv17 i17 ON k.h >= i17.lo AND k.h < i17.hi,
        |  w16, w17)
        |SELECT 'mod' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved,
        |  CAST((1000 * SUM(CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END))
        |    // COUNT(*) AS BIGINT) AS moved_permille
        |FROM a
        |UNION ALL
        |SELECT 'ring', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST((1000 * SUM(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END))
        |    // COUNT(*) AS BIGINT)
        |FROM a
        |ORDER BY strategy""".stripMargin,

    "q278_jl_projection" ->
      """WITH q AS (
        |  SELECT vec_id, i.i AS j,
        |    CAST(round(CAST(embedding[i.i] AS DOUBLE) * 1000000)
        |      AS BIGINT) AS qv
        |  FROM embeddings, (SELECT UNNEST(range(1, 65)) AS i) i
        |  WHERE vec_id < 40),
        |proj AS (
        |  SELECT vec_id, r.r AS r,
        |    CAST(SUM(CASE WHEN ((((r.r * 8191 + j) * (r.r * 8191 + j))
        |        % 1000003) * 48271) % 2147483647 % 2 = 0
        |      THEN qv ELSE -qv END) AS BIGINT) AS p
        |  FROM q, (SELECT UNNEST(range(1, 17)) AS r) r
        |  GROUP BY 1, 2),
        |dproj AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |    CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS dp
        |  FROM proj a JOIN proj b ON a.r = b.r AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |dorig AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |    CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS dd
        |  FROM q a JOIN q b ON a.j = b.j AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |ratio AS (
        |  SELECT CAST((1000 * CAST(p.dp AS HUGEINT))
        |      // (16 * CAST(o.dd AS HUGEINT)) AS BIGINT) AS rp
        |  FROM dproj p JOIN dorig o ON p.ia = o.ia AND p.ib = o.ib
        |  WHERE o.dd > 0)
        |SELECT CAST(rp // 200 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM ratio GROUP BY 1 ORDER BY 1""".stripMargin,

    "q279_ks_test" ->
      (pairGridCte +
      """,
        |cum AS (
        |  SELECT src_a, src_b, na, nb,
        |    SUM(ca) OVER (PARTITION BY src_a, src_b ORDER BY v) AS cca,
        |    SUM(cb) OVER (PARTITION BY src_a, src_b ORDER BY v) AS ccb
        |  FROM m)
        |SELECT src_a, src_b,
        |  CAST(CAST(1000 * MAX(ABS(CAST(cca AS DECIMAL(38,0)) * nb
        |                         - CAST(ccb AS DECIMAL(38,0)) * na))
        |         AS HUGEINT)
        |       // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT)
        |    AS ks_permille
        |FROM cum GROUP BY src_a, src_b
        |ORDER BY src_a, src_b""".stripMargin)
  )
}

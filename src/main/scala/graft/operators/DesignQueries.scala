package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-design layer — the instruments a pipeline team reaches for
  * once the measurements exist (q276-q291 told them how sources differ;
  * these decide what to DO about it, with quantified uncertainty and
  * privacy): the reference's users run recurring collection+query jobs
  * over ever-growing per-collection tables
  * (`/root/reference/sources/collection/collection.js:358-365`), so
  * "how sure are we about this corpus statistic", "can we publish these
  * per-tenant counts", "which exact rows make up a size-B sample", and
  * "how should the table be laid out for 2-D predicates" are the
  * operational questions this family answers. Every query is
  * integer/decimal-exact and DuckDB-gated bit-for-bit; randomness is
  * always a deterministic md5 draw compared AS A HEX STRING against
  * precomputed CDF cutoffs (fixed-width lowercase hex is
  * order-isomorphic to the underlying 60-bit integer, so both engines
  * branch identically with no float inverse-CDF anywhere):
  *
  *  - q294: Poisson bootstrap (Chamandy et al. 2012 — THE bootstrap that
  *    works on streams/shards: resample weights are per-row iid
  *    Poisson(1), no global n needed) for the per-source mean document
  *    length — 32 replicates in ONE corpus scan, CI read off the sorted
  *    replicate means. At 100 TB a classical bootstrap would re-shuffle
  *    the corpus 32×; this shuffles 32·|sources| partial rows.
  *  - q295: differentially-private count release via the truncated
  *    two-sided geometric mechanism (Ghosh-Roughgarden-Sundararajan
  *    2009, the discrete Laplace; α = 1/2 ⇒ ε = ln 2, support ±20,
  *    clipped tail mass < 4e-7): per-event-type user counts with
  *    sensitivity-1 contribution bounding (each user counted once, at
  *    their modal type). α = 1/2 makes every CDF cutoff an exact dyadic
  *    rational — both engines draw the SAME noise from the same cutoff
  *    table, no transcendental anywhere.
  *  - q296: systematic PPS sampling (Madow 1949) — the exact row set a
  *    size-50 probability-proportional-to-length draw selects, via a
  *    two-phase distributed prefix sum (256 md5 buckets: per-bucket
  *    window cumsum + a broadcast 256-row bucket-prefix table — no
  *    global single-partition window over the corpus) and a CLOSED-FORM
  *    integer hit count per row: #points in (lo,hi] =
  *    f(hi)−f(lo) with f(x) = (2k·x + W) div (2W) — no join against an
  *    offset table at all, every row decides its own multiplicity.
  *  - q297: Neyman allocation (Neyman 1934) — the variance-optimal
  *    refinement of q288's proportional Hamilton quotas: stratum budget
  *    ∝ N_h·σ_h, with N_h·σ_h = isqrt(n·Σx² − (Σx)²) kept EXACT by a
  *    Newton-corrected integer sqrt (floor(sqrt(double)) ±1 fixed by
  *    two DECIMAL(38) comparisons — correct for any SS up to ~1e28,
  *    far past 100 TB census magnitudes), then the same
  *    largest-remainder apportionment so quotas still sum to B exactly.
  *  - q298: Z-order layout audit (Morton 1966; the Delta/Iceberg
  *    OPTIMIZE ZORDER question): quantize (custkey, orderdate) to an
  *    8+8-bit grid, bit-interleave, cut 64 files by z-range vs 64 files
  *    by single-column range, and measure zone-map pruning for a 2-D
  *    box predicate — files_scanned/rows_scanned per layout from the
  *    files' min/max stats. The interleave is plain div/mod-by-powers
  *    arithmetic so both engines compute identical z values.
  *  - q299: ANF / neighborhood function (Palmer-Gibbons-Faloutsos KDD
  *    2002) on the q251 nation trade graph — per-node Flajolet-Martin
  *    bitmask sketches (16 trials, bit position drawn geometrically
  *    from dyadic md5 cutoffs), propagated 3 rounds by bit_or over
  *    out-edges; gate readout is the integer Σ lowest-zero-bit index
  *    next to the EXACT reachable-pair count per radius. OR-merge is
  *    the whole scale story: each round shuffles |E|·T longs (sketches
  *    union in constant space), where exact multi-hop reachability
  *    shuffles the frontier product.
  *  - q300: streaming twin of q294 — per-trigger Poisson partials +
  *    census rows under batch_id dynamic overwrite, merged by
  *    summation into the same CI assembly; the mergeable-bootstrap
  *    property gated bit-for-bit against the batch oracle.
  *  - q301: chi-square homogeneity of the sources × length-bin
  *    contingency + Cramér's V — the binned-frequency classic beside
  *    the q279 KS / q280 W1 / q281 MW family. Kept engine-exact by
  *    DEFINING the statistic with a per-cell milli-floor (each cell
  *    contributes floor(1000·(o·n − r·c)²/(n·r·c)); zero cells
  *    included via the K×C grid), so both engines sum identical
  *    integers; V = isqrt(1000·χ²_milli div (n·min(K−1,C−1))) with the
  *    argument provably ≤ 1e6 (exact in double sqrt).
  *  - q302: Benford first-significant-digit audit of order totals —
  *    the data-quality forensic: digit census vs the floored Benford
  *    permille constants (301,176,…,45). First digit extracted with
  *    string-length arithmetic (v div 10^(len−1) built as
  *    '1' ++ repeat('0')), never float log10.
  *  - q303: Gini concentration of document length within each source
  *    (is a crawl dominated by a few giant documents?) — the sorted-
  *    index formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) in exact permille;
  *    tie order cannot change Σi·x over equal x, so the windowed rank
  *    is deterministic-equivalent in both engines.
  *
  * Scale shape: every corpus-sized pass is one scan with map-side
  * combine (q294's replicate partials, q296's bucket sums, q297's
  * moment census, q298's per-file stats); the post-census algebra runs
  * on |sources|-, 256-, or 64-row aggregates with 1-row broadcast
  * totals. q295's window ranks per-user rows (shuffle keyed by
  * user_id, the q118 sessionize shape); q299's per-round shuffle is
  * edge-count-sized sketch longs, never frontier pairs. Nothing here
  * collects, cross-joins, or windows over an unbounded partition.
  */
object DesignQueries {

  private def hex15(v: BigInt): String = {
    val s = v.toString(16)
    ("0" * (15 - s.length)) + s
  }

  /** Poisson(1) CDF cutoffs as floor(P(K ≤ k)·16^15) in 15-digit hex —
    * computed once from the exact alternating-series e^{-1} rational
    * (60 terms) and embedded as literals so both engines branch on the
    * same constants. u < cut(k) ⟺ K ≤ k; ELSE arm truncates at 6
    * (P(K > 6|u uniform) handled exactly: every u ≥ cut(5) draws 6). */
  private val PoissonCuts = Seq(
    "5e2d58d8b3bcdf1", "bc5ab1b16779be3", "eb715e1dc1582dc",
    "fb23979734a252f", "ff1025f59174dc3", "ffd90f3ba4055e1")

  private def poissonCase(u: String): String =
    PoissonCuts.zipWithIndex
      .map { case (c, k) => s"WHEN $u < '$c' THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")

  /** Truncated two-sided geometric CDF rows, α = 1/2, support −20..20,
    * as [lo, hi) cutoffs on the first 15 md5 hex digits. All exact
    * dyadic rationals: unnormalized weight of k is 2^(20−|k|), total
    * 3·2^20 − 2. The top bound is 'g' — lexicographically above every
    * hex string, the closed upper sentinel. */
  private[operators] val GeomRows: Seq[(Int, String, String)] = {
    val total = (BigInt(3) << 20) - 2
    val scale = BigInt(16).pow(15)
    var cum = BigInt(0)
    var lo = "0" * 15
    (-20 to 20).map { k =>
      cum += BigInt(1) << (20 - k.abs)
      val hi = if (k == 20) "g" else hex15(cum * scale / total)
      val row = (k, lo, hi)
      lo = hi
      row
    }
  }

  /** FM bit-position cutoffs: P(pos = k) = 2^{-(k+1)}, i.e. pos ≤ k ⟺
    * u < 1 − 2^{-(k+1)} — cutoff hex is exactly 2^60 − 2^{59−k}. The
    * CASE emits the MASK (1 << pos) directly as a literal so neither
    * engine needs a shift operator. Truncated at pos = 20. */
  private def fmMaskCase(u: String): String =
    (0 until 20).map { k =>
      val cut = hex15((BigInt(1) << 60) - (BigInt(1) << (59 - k)))
      s"WHEN $u < '$cut' THEN ${1L << k}"
    }.mkString("CASE ", " ", s" ELSE ${1L << 20} END")

  /** Index of the single set bit of y ∈ {2^0..2^21} — the lowest-zero-
    * bit readout after y = (mask+1) & −(mask+1). A literal CASE, not
    * log2: float log of a power of two is *probably* exact in both
    * engines, but a 22-arm integer CASE is *certainly* exact. */
  private def bitIndexCase(y: String): String =
    (0 to 21).map(i => s"WHEN $y = ${1L << i} THEN $i")
      .mkString("CASE ", " ", " ELSE -1 END")

  /** 8+8-bit Morton interleave of two 0..255 codes as div/mod-by-power
    * arithmetic — `divOp` is `div` (Spark) or `//` (DuckDB); everything
    * else is engine-shared syntax, so both sides compute the identical
    * z value. */
  private def interleave(cx: String, cy: String, divOp: String): String =
    (0 until 8).map { i =>
      s"((($cx $divOp ${1 << i}) % 2) * ${1L << (2 * i)}" +
        s" + (($cy $divOp ${1 << i}) % 2) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Floored Benford permille for first digit 1..9:
    * floor(1000·log10(1 + 1/d)) — sums to 995 (5 permille floor loss,
    * the deviation column absorbs it identically in both engines). */
  private[operators] val BenfordPermille: Seq[(Int, Long)] =
    Seq(1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
      6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)

  // Z-order probe box on the 0..255 grid: a 96×96 window (~14% of the
  // plane) off-origin so neither layout trivially prunes everything.
  private val Bx0 = 64
  private val Bx1 = 159
  private val By0 = 32
  private val By1 = 127

  /** Per-(source, replicate) Poisson partials of a (doc_id, source,
    * n_chars) frame: (source, r, sw = Σk·x, sk = Σk) — additive, so
    * partials from disjoint corpus slices merge by summation (the
    * mergeability that makes the bootstrap streamable). */
  private def bootstrapPartials(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(expr("sequence(0, 31)")).as("r"))
      .withColumn("u", expr("substring(md5(concat(" +
        "cast(doc_id as string), ':', cast(r as string))), 1, 15)"))
      .withColumn("k", expr(poissonCase("u")))
      .groupBy(col("source"), col("r"))
      .agg(sum(expr("k * n_chars")).as("sw"), sum(col("k")).as("sk"))

  /** CI assembly from merged partials (source, r, sw, sk) + the point
    * census (source, n_docs, sx): replicate means in exact permille,
    * CI = 2nd/31st of the sorted replicate means. Empty replicates
    * (Σk = 0, probability e^{-n} per source) are dropped and n_reps
    * reports the survivors. */
  private def bootstrapAssemble(rm0: DataFrame, cen: DataFrame)
      : DataFrame = {
    val point = cen.select(col("source"), col("n_docs"),
      expr("CAST((1000 * CAST(sx AS DECIMAL(38,0)))" +
        " div n_docs AS BIGINT)").as("mean_permille"))
    val ci = rm0.where(col("sk") > 0)
      .select(col("source"),
        expr("CAST((1000 * CAST(sw AS DECIMAL(38,0))) div sk" +
          " AS BIGINT)").as("m"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_reps"),
        expr("sort_array(collect_list(m))").as("a"))
      .select(col("source"), col("n_reps"),
        expr("element_at(a, least(2, cast(size(a) as int)))")
          .as("ci_lo_permille"),
        expr("element_at(a, greatest(cast(size(a) as int) - 1, 1))")
          .as("ci_hi_permille"))
    point.join(ci, "source")
      .select(col("source"), col("n_docs"), col("mean_permille"),
        col("n_reps"), col("ci_lo_permille"), col("ci_hi_permille"))
      .orderBy(col("source"))
  }

  /** documents as 3 parquet files of (doc_id, source, n_chars) — the
    * micro-batch fixture for q300; built once per sf. */
  private[graft] def docsBootSplitFixture(s: SparkSession, d: String)
      : String = {
    val out = graft.Scratch.fixtureDir(d, "docs_split3_boot")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.documents(s, d).select(col("doc_id"), col("source"),
          col("n_chars"))
        .repartition(3).write.mode("overwrite").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Poisson bootstrap CI for the per-source mean document length.
    // One corpus scan fans each row to 32 (source, replicate) partials
    // with weight k ~ Poisson(1) drawn from md5(doc_id ':' r); partial
    // aggregation combines map-side, so the shuffle is 32·|sources|
    // rows however big the corpus is. Replicate means are exact
    // permille rationals; the CI is the 2nd/31st of the 32 sorted
    // replicate means (a ~94% percentile interval).
    "q294_poisson_bootstrap" -> ((s, d) => {
      val docs = T.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      bootstrapAssemble(
        bootstrapPartials(docs),
        docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sx")))
    }),

    // STREAMING bootstrap twin — the mergeability claim made concrete:
    // each micro-batch reduces ITS OWN slice to (source, r, sw, sk)
    // Poisson partials plus a (source, n, sx) census row set — O(batch)
    // work, 32·|sources| + |sources| state rows per trigger — persisted
    // under batch_id with dynamic overwrite (replay-idempotent,
    // exactly-once); the final CI reads the merged sums through the
    // SAME assembly as q294. Additive partials merge arrival-order-
    // independently, so the stream must equal the batch run
    // bit-for-bit — same oracle.
    "q300_stream_bootstrap" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
        val dir = docsBootSplitFixture(s, d)
        val base = graft.Scratch.runDir("graft_streamboot")
        val schema = s.read.parquet(dir).schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        val q = stream.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            bootstrapPartials(batch)
              .withColumn("batch_id", graft.functions.RefLit.long(bid))
              .write.mode("overwrite").partitionBy("batch_id")
              .parquet(s"$base/partials")
            batch.groupBy(col("source"))
              .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"))
              .withColumn("batch_id", graft.functions.RefLit.long(bid))
              .write.mode("overwrite").partitionBy("batch_id")
              .parquet(s"$base/census")
            ()
          }
          .start()
        q.awaitTermination()
        bootstrapAssemble(
          s.read.parquet(s"$base/partials")
            .groupBy(col("source"), col("r"))
            .agg(sum(col("sw")).as("sw"), sum(col("sk")).as("sk")),
          s.read.parquet(s"$base/census")
            .groupBy(col("source"))
            .agg(sum(col("n_docs")).as("n_docs"), sum(col("sx")).as("sx")))
      }),

    // ε-DP release (ε = ln 2) of per-event-type user counts under the
    // truncated geometric mechanism. Contribution bounding first: each
    // user is counted at exactly ONE type (their modal type, ties to
    // the lexicographically first), so the per-type histogram has L1
    // sensitivity 1 and a single noise draw per cell suffices. The
    // noise join is a 41-row broadcast range probe on the hex draw;
    // `released` floors at 0 (post-processing preserves DP). The gate
    // deliberately exposes n_users and the noise value — it gates the
    // MECHANISM's determinism, not a production release.
    "q295_dp_release" -> ((s, d) => {
      import s.implicits._
      val modal = T.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("c").desc, col("event_type").asc)))
        .where(col("rn") === 1)
      val counts = modal.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"))
        .withColumn("u",
          expr("substring(md5(concat('dp|', event_type)), 1, 15)"))
      val cuts = GeomRows.toDF("noise", "lo", "hi")
      counts.join(broadcast(cuts),
          col("u") >= col("lo") && col("u") < col("hi"))
        .select(col("event_type"), col("n_users"),
          col("noise").cast("bigint").as("noise"),
          greatest(col("n_users") + col("noise"), lit(0L)).as("released"))
        .orderBy(col("event_type"))
    }),

    // Systematic PPS sample, k = 50 points proportional to n_chars.
    // Global char-cumsum order is (md5, doc_id); computed scalably as
    // 256 bucket-local window cumsums (bucket = first 2 md5 hex chars,
    // a PREFIX of the sort key, so bucket order ⊂ global order) plus a
    // broadcast bucket-prefix table — the 256-row prefix window is the
    // only unpartitioned window and it is fixed-size forever. Each row
    // then computes its own sample multiplicity in closed form:
    // f(x) = (2k·x + W) div (2W) counts the odd-multiple-of-W/(2k)
    // sample points ≤ x, so mult = f(hi) − f(lo), all nonneg integer
    // div (no engine floor/truncate divergence). Rows heavier than the
    // W/k step report mult > 1 — the PPS certainty-inclusion case.
    "q296_pps_sample" -> ((s, d) => {
      val k = 50
      val docs = T.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars").as("weight"))
        .withColumn("m",
          md5(concat(lit("pps|"), col("doc_id").cast("string"))))
        .withColumn("pid", substring(col("m"), 1, 2))
      val pre = docs.groupBy(col("pid")).agg(sum(col("weight")).as("wb"))
        .withColumn("pre", coalesce(
          sum(col("wb")).over(Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid"), col("pre"))
      val tot = docs.agg(sum(col("weight")).as("w_total"))
      docs.join(broadcast(pre), "pid")
        .withColumn("loc", sum(col("weight")).over(
          Window.partitionBy(col("pid")).orderBy(col("m"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("hi", col("pre") + col("loc"))
        .withColumn("lo", col("hi") - col("weight"))
        .crossJoin(broadcast(tot))
        .withColumn("mult", expr(
          s"CAST((2 * $k * CAST(hi AS DECIMAL(38,0)) + w_total)" +
            s" div (2 * w_total)" +
            s" - (2 * $k * CAST(lo AS DECIMAL(38,0)) + w_total)" +
            s" div (2 * w_total) AS BIGINT)"))
        .where(col("mult") >= 1)
        .select(col("doc_id"), col("source"), col("weight"), col("mult"))
        .orderBy(col("doc_id"))
    }),

    // Neyman (variance-optimal) allocation of a 200-row sample budget:
    // weight_h = N_h·σ_h = isqrt(n·Σx² − (Σx)²), exact via a Newton-
    // corrected floor-sqrt (the double rounding is at most ±1 here and
    // the two DECIMAL comparisons repair it), then q288's Hamilton
    // largest-remainder so the integer quotas sum to exactly B. One
    // moment census; the apportionment runs on the |sources|-row
    // aggregate with the remainder rank as a broadcast self-join.
    // Constant strata (σ = 0) legitimately draw quota 0.
    "q297_neyman_allocation" -> ((s, d) => {
      val b = 200
      val cen = T.documents(s, d).groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0))")).as("sx"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sxx"))
        .withColumn("ss", expr("n_docs * sxx - sx * sx"))
        .withColumn("g", expr(
          "CAST(CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT)" +
            " AS DECIMAL(38,0))"))
        .withColumn("nsigma", expr(
          "CAST(g + (CASE WHEN (g + 1) * (g + 1) <= ss THEN 1 ELSE 0 END)" +
            " - (CASE WHEN g * g > ss THEN 1 ELSE 0 END) AS BIGINT)"))
        .select(col("source"), col("n_docs"), col("nsigma"))
      val tot = cen.agg(sum(col("nsigma")).as("wsum"))
      val base = cen.crossJoin(broadcast(tot)).select(
        col("source"), col("n_docs"), col("nsigma"),
        expr(s"CASE WHEN wsum = 0 THEN 0 ELSE CAST(($b *" +
          s" CAST(nsigma AS DECIMAL(38,0))) div wsum AS BIGINT) END")
          .as("q0"),
        expr(s"CASE WHEN wsum = 0 THEN 0 ELSE CAST($b *" +
          s" CAST(nsigma AS DECIMAL(38,0)) - (($b *" +
          s" CAST(nsigma AS DECIMAL(38,0))) div wsum)" +
          s" * CAST(wsum AS DECIMAL(38,0)) AS BIGINT) END").as("rem"))
      val left = base.agg((lit(b.toLong) - sum(col("q0")))
        .as("left_over"))
      val rank = base.as("x")
        .join(broadcast(base.as("y")),
          col("y.rem") > col("x.rem") ||
            (col("y.rem") === col("x.rem") &&
              col("y.source") < col("x.source")),
          "left")
        .groupBy(col("x.source").as("source"), col("x.n_docs").as("n_docs"),
          col("x.nsigma").as("nsigma"), col("x.q0").as("q0"))
        .agg(count(col("y.source")).as("nahead"))
      rank.crossJoin(broadcast(left))
        .select(col("source"), col("n_docs"), col("nsigma"),
          (col("q0") + when(col("nahead") < col("left_over"), 1L)
            .otherwise(0L)).as("quota"))
        .orderBy(col("source"))
    }),

    // Z-order vs single-column layout, measured: quantize orders to an
    // 8-bit (custkey, orderdate-day) grid, cut 64 files per layout
    // (z div 1024 vs cx div 4), and read the 2-D box predicate's cost
    // off each file's zone map (min/max of both codes). One fact scan
    // builds both layouts' file stats; the pruning math runs on 64-row
    // aggregates. The headline at 100 TB: z-range files bound BOTH
    // dimensions, single-column files bound one, so the z layout scans
    // a fraction where the linear layout scans everything that matches
    // on x alone.
    "q298_zorder_layout" -> ((s, d) => {
      val ord = T.orders(s, d).select(col("o_custkey").as("ck"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01')")
          .as("dy"))
      val rng = ord.agg(min(col("ck")).as("ck0"), max(col("ck")).as("ck1"),
        min(col("dy")).as("dy0"), max(col("dy")).as("dy1"))
      val coded = ord.crossJoin(broadcast(rng))
        .withColumn("cx",
          expr("CAST(((ck - ck0) * 256) div (ck1 - ck0 + 1) AS BIGINT)"))
        .withColumn("cy",
          expr("CAST(((dy - dy0) * 256) div (dy1 - dy0 + 1) AS BIGINT)"))
        .withColumn("z", expr(interleave("cx", "cy", "div")))
        .withColumn("hit",
          (col("cx").between(Bx0, Bx1) && col("cy").between(By0, By1))
            .cast("bigint"))
      // Both layouts' file stats off ONE scan: each row contributes a
      // (layout, file) pair per layout, then a single (layout, file)
      // grouping builds all 128 zone maps together.
      coded
        .select(col("cx"), col("cy"), col("hit"),
          explode(array(
            struct(lit("linear").as("layout"),
              expr("cx div 4").as("f")),
            struct(lit("zorder").as("layout"),
              expr("z div 1024").as("f")))).as("lf"))
        .select(col("cx"), col("cy"), col("hit"),
          col("lf.layout").as("layout"), col("lf.f").as("f"))
        .groupBy(col("layout"), col("f")).agg(
          min(col("cx")).as("x0"), max(col("cx")).as("x1"),
          min(col("cy")).as("y0"), max(col("cy")).as("y1"),
          count(lit(1)).as("nrows"), sum(col("hit")).as("hits"))
        .withColumn("scanned",
          (col("x1") >= Bx0 && col("x0") <= Bx1 &&
            col("y1") >= By0 && col("y0") <= By1).cast("bigint"))
        .groupBy(col("layout")).agg(
          count(lit(1)).as("files_total"),
          sum(col("scanned")).as("files_scanned"),
          sum(col("scanned") * col("nrows")).as("rows_scanned"),
          sum(col("hits")).as("rows_match"))
        .orderBy(col("layout"))
    }),

    // Chi-square homogeneity of sources × 8 length bins, plus Cramér's
    // V. One census pass (the K×C contingency is the ONLY corpus-sized
    // aggregate); the test statistic runs on the ≤ K·C-row grid with
    // broadcast margins — zero cells included via the margins' cross
    // join. The statistic is DEFINED with a per-cell milli-floor so
    // both engines sum identical integers; V's isqrt argument is
    // bounded by 1e6 (V ≤ 1), where double sqrt is exact.
    "q301_chisq_homogeneity" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("source"), col("n_chars"))
      val mx = docs.agg(max(col("n_chars")).as("mx"))
      val o = docs.crossJoin(broadcast(mx))
        .withColumn("b", expr("CAST((n_chars * 8) div (mx + 1) AS BIGINT)"))
        .groupBy(col("source"), col("b")).agg(count(lit(1)).as("o"))
      val rm = o.groupBy(col("source")).agg(sum(col("o")).as("r"))
      val cm = o.groupBy(col("b")).agg(sum(col("o")).as("c"))
      val nn = o.agg(sum(col("o")).as("n"),
        countDistinct(col("source")).as("k"),
        countDistinct(col("b")).as("cb"))
      val grid = broadcast(rm).crossJoin(broadcast(cm))
        .join(o, Seq("source", "b"), "left")
        .withColumn("oo", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(nn))
        .withColumn("contrib_milli", expr(
          "CAST((1000 * (CAST(oo AS DECIMAL(38,0)) * n - CAST(r AS" +
            " DECIMAL(38,0)) * c) * (CAST(oo AS DECIMAL(38,0)) * n -" +
            " CAST(r AS DECIMAL(38,0)) * c)) div (CAST(n AS" +
            " DECIMAL(38,0)) * r * c) AS BIGINT)"))
      grid.groupBy(col("n"), col("k"), col("cb"))
        .agg(sum(col("contrib_milli")).as("chi2_milli"))
        .select(col("n"), col("k").as("k_sources"), col("cb").as("c_bins"),
          expr("(k - 1) * (cb - 1)").as("dof"), col("chi2_milli"),
          expr("CAST(FLOOR(SQRT(CAST((1000 * chi2_milli) div" +
            " (n * least(k - 1, cb - 1)) AS DOUBLE))) AS BIGINT)")
            .as("cramers_v_permille"))
    }),

    // Benford first-digit audit of floor(o_totalprice): digit census
    // vs the floored Benford permille expectation — the classic
    // fabricated-data / unit-mixup forensic. First digit comes from
    // string-LENGTH arithmetic (v div 10^(len−1), the power built as
    // '1' ++ zeros), never float log10; one map-side-combined census,
    // the 9-row expectation broadcast.
    "q302_benford_audit" -> ((s, d) => {
      import s.implicits._
      val obs = T.orders(s, d)
        .select(expr("CAST(FLOOR(o_totalprice) AS BIGINT)").as("v"))
        .where(col("v") >= 1)
        .withColumn("digit", expr("v div CAST(concat('1'," +
          " repeat('0', length(CAST(v AS STRING)) - 1)) AS BIGINT)"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum(col("n_obs")).as("n"))
      val exp = BenfordPermille.toDF("digit", "benford_permille")
      exp.withColumn("digit", col("digit").cast("bigint"))
        .join(broadcast(obs), Seq("digit"), "left")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n_obs"),
          expr("(1000 * n_obs) div n").as("obs_permille"),
          col("benford_permille"),
          expr("abs((1000 * n_obs) div n - benford_permille)")
            .as("dev_permille"))
        .orderBy(col("digit"))
    }),

    // Gini concentration of document length within each source — the
    // "is this crawl a few giant documents" instrument. Sorted-index
    // formula over a PARTITIONED rank window (slim rows), moments to
    // DECIMAL(38) (Σi·x ~ n²·x̄/2 passes int64 near 1e8 docs/source);
    // equal lengths contribute the same Σi·x under any tie order, so
    // the rank is deterministic-equivalent across engines.
    "q303_gini_concentration" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      T.documents(s, d).select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("i", row_number().over(w))
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(expr("CAST(i AS DECIMAL(38,0)) * n_chars")).as("six"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          expr("CAST((1000 * (2 * six - (n_docs + 1) *" +
            " CAST(total_chars AS DECIMAL(38,0)))) div" +
            " (n_docs * CAST(total_chars AS DECIMAL(38,0))) AS BIGINT)")
            .as("gini_permille"))
        .orderBy(col("source"))
    }),

    // ANF neighborhood function on the nation trade graph: 16 FM
    // bitmask trials per node, 3 bit_or propagation rounds over
    // directed out-edges, readout = Σ_{v,t} lowest-zero-bit index —
    // next to the exact reachable-pair count per radius from an
    // iterated distinct join. The sketch column is ONE long per
    // (node, trial) whatever the neighborhood size; that constant-
    // space OR-merge is why ANF scales where exact frontier expansion
    // explodes.
    "q299_anf_sketch" -> ((s, d) => {
      // localCheckpoint the ≤|V|²-row edge aggregate ONCE (q251/q286's
      // round convention): the 4 sketch rounds + 4 exact-hop frames
      // otherwise each re-evaluate the fact-table edge-extraction joins
      // inside one big plan — measured 12x super-linear at ScaleUp-sf10
      // before the checkpoint, linear-in-|E| after.
      val edges = GraphQueries.tradeEdges(s, d)
        .select(col("src"), col("dst")).localCheckpoint()
      val nodes = edges.select(col("src").as("v"))
        .union(edges.select(col("dst").as("v"))).distinct()
        .localCheckpoint()
      val s0 = nodes
        .select(col("v"), explode(expr("sequence(0, 15)")).as("t"))
        .withColumn("u", expr("substring(md5(concat('anf|', " +
          "cast(t as string), '|', cast(v as string))), 1, 15)"))
        .select(col("v"), col("t"),
          expr(fmMaskCase("u")).cast("bigint").as("mask"))
      def readout(sk: DataFrame, h: Int): DataFrame =
        sk.select(expr("(mask + 1) & (-(mask + 1))").as("y"))
          .select(expr(bitIndexCase("y")).as("r"))
          .agg(sum(col("r")).cast("bigint").as("sum_r"))
          .select(lit(h).as("h"), col("sum_r"))
      val sketches = Iterator.iterate(s0) { sk =>
        edges.join(sk.withColumnRenamed("v", "dst"), "dst")
          .select(col("src").as("v"), col("t"), col("mask"))
          .unionAll(sk.select(col("v"), col("t"), col("mask")))
          .groupBy(col("v"), col("t"))
          .agg(expr("bit_or(mask)").as("mask"))
      }.take(4).toSeq
      val pairs = Iterator.iterate(
        nodes.select(col("v").as("a"), col("v").as("b"))) { p =>
        p.join(edges.withColumnRenamed("src", "b"), "b")
          .select(col("a"), col("dst").as("b"))
          .union(p).distinct()
      }.take(4).toSeq
      (0 to 3).map { h =>
        readout(sketches(h), h).crossJoin(
          pairs(h).agg(count(lit(1)).as("n_pairs")))
      }.reduce(_ unionAll _).orderBy(col("h"))
    })
  )

  private def geomValues: String =
    GeomRows.map { case (k, lo, hi) => s"($k, '$lo', '$hi')" }
      .mkString(", ")

  private val bootstrapOracle =
    s"""WITH reps AS (
        |  SELECT d.source, d.n_chars, r.r,
        |    substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
        |      CAST(r.r AS VARCHAR)), 1, 15) AS u
        |  FROM documents d
        |  CROSS JOIN (SELECT range AS r FROM range(32)) r),
        |kk AS (SELECT source, r, n_chars,
        |         ${poissonCase("u")} AS k FROM reps),
        |rm AS (SELECT source, r, SUM(k * n_chars) AS sw, SUM(k) AS sk
        |       FROM kk GROUP BY 1, 2),
        |m AS (SELECT source,
        |        CAST((1000 * CAST(sw AS HUGEINT)) // sk AS BIGINT) AS m
        |      FROM rm WHERE sk > 0),
        |ci AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_reps,
        |         list_sort(list(m)) AS a
        |       FROM m GROUP BY 1),
        |pt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST((1000 * CAST(SUM(n_chars) AS HUGEINT)) // COUNT(*)
        |           AS BIGINT) AS mean_permille
        |       FROM documents GROUP BY 1)
        |SELECT pt.source, pt.n_docs, pt.mean_permille, ci.n_reps,
        |  a[CAST(least(2, len(a)) AS BIGINT)] AS ci_lo_permille,
        |  a[CAST(greatest(len(a) - 1, 1) AS BIGINT)] AS ci_hi_permille
        |FROM pt JOIN ci USING (source) ORDER BY pt.source""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q294_poisson_bootstrap" -> bootstrapOracle,

    // the stream merges additive partials, so it must equal the batch
    // run bit-for-bit — the batch oracle IS the streaming oracle
    "q300_stream_bootstrap" -> bootstrapOracle,

    "q295_dp_release" ->
      s"""WITH modal AS (
        |  SELECT user_id, event_type FROM (
        |    SELECT user_id, event_type, COUNT(*) AS c
        |    FROM events GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY c DESC, event_type) = 1),
        |cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |          substr(md5('dp|' || event_type), 1, 15) AS u
        |        FROM modal GROUP BY 1),
        |cuts(noise, lo, hi) AS (VALUES $geomValues)
        |SELECT event_type, n_users, CAST(noise AS BIGINT) AS noise,
        |  GREATEST(n_users + noise, 0) AS released
        |FROM cnt JOIN cuts ON u >= lo AND u < hi
        |ORDER BY event_type""".stripMargin,

    "q296_pps_sample" ->
      """WITH c AS (
        |  SELECT doc_id, source, n_chars AS weight,
        |    SUM(n_chars) OVER (
        |      ORDER BY md5('pps|' || CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        |  FROM documents),
        |t AS (SELECT SUM(n_chars) AS w_total FROM documents),
        |mm AS (
        |  SELECT doc_id, source, weight,
        |    CAST((100 * CAST(hi AS HUGEINT) + w_total) // (2 * w_total)
        |      - (100 * CAST(hi - weight AS HUGEINT) + w_total)
        |        // (2 * w_total) AS BIGINT) AS mult
        |  FROM c, t)
        |SELECT doc_id, source, weight, mult FROM mm
        |WHERE mult >= 1 ORDER BY doc_id""".stripMargin,

    "q297_neyman_allocation" ->
      """WITH cen AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
        |      AS sxx
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, n_docs, n_docs * sxx - sx * sx AS ss,
        |    CAST(FLOOR(SQRT(CAST(n_docs * sxx - sx * sx AS DOUBLE)))
        |      AS HUGEINT) AS g
        |  FROM cen),
        |ns AS (
        |  SELECT source, n_docs,
        |    CAST(g + (CASE WHEN (g + 1) * (g + 1) <= ss THEN 1 ELSE 0 END)
        |      - (CASE WHEN g * g > ss THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nsigma
        |  FROM w),
        |tot AS (SELECT CAST(SUM(nsigma) AS BIGINT) AS wsum FROM ns),
        |base AS (
        |  SELECT source, n_docs, nsigma,
        |    CASE WHEN tot.wsum = 0 THEN 0
        |      ELSE CAST((200 * CAST(nsigma AS HUGEINT)) // tot.wsum
        |        AS BIGINT) END AS q0,
        |    CASE WHEN tot.wsum = 0 THEN 0
        |      ELSE CAST(200 * CAST(nsigma AS HUGEINT)
        |        - ((200 * CAST(nsigma AS HUGEINT)) // tot.wsum)
        |          * tot.wsum AS BIGINT) END AS rem
        |  FROM ns, tot),
        |lft AS (SELECT 200 - CAST(SUM(q0) AS BIGINT) AS left_over
        |        FROM base),
        |rk AS (SELECT source, n_docs, nsigma, q0,
        |         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS r
        |       FROM base)
        |SELECT rk.source, rk.n_docs, rk.nsigma,
        |  rk.q0 + CASE WHEN rk.r <= lft.left_over THEN 1 ELSE 0 END
        |    AS quota
        |FROM rk, lft ORDER BY rk.source""".stripMargin,

    "q298_zorder_layout" -> {
      val scanned = s"(x1 >= $Bx0 AND x0 <= $Bx1 AND" +
        s" y1 >= $By0 AND y0 <= $By1)"
      s"""WITH ord AS (
        |  SELECT o_custkey AS ck,
        |    date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS dy
        |  FROM orders),
        |rng AS (SELECT MIN(ck) AS ck0, MAX(ck) AS ck1,
        |          MIN(dy) AS dy0, MAX(dy) AS dy1 FROM ord),
        |coded AS (
        |  SELECT ((ck - ck0) * 256) // (ck1 - ck0 + 1) AS cx,
        |         ((dy - dy0) * 256) // (dy1 - dy0 + 1) AS cy
        |  FROM ord, rng),
        |zc AS (SELECT cx, cy, ${interleave("cx", "cy", "//")} AS z,
        |         CASE WHEN cx BETWEEN $Bx0 AND $Bx1
        |           AND cy BETWEEN $By0 AND $By1 THEN 1 ELSE 0 END AS hit
        |       FROM coded),
        |fz AS (SELECT z // 1024 AS f, MIN(cx) AS x0, MAX(cx) AS x1,
        |         MIN(cy) AS y0, MAX(cy) AS y1,
        |         COUNT(*) AS nrows, SUM(hit) AS hits
        |       FROM zc GROUP BY 1),
        |fx AS (SELECT cx // 4 AS f, MIN(cx) AS x0, MAX(cx) AS x1,
        |         MIN(cy) AS y0, MAX(cy) AS y1,
        |         COUNT(*) AS nrows, SUM(hit) AS hits
        |       FROM zc GROUP BY 1),
        |az AS (SELECT 'zorder' AS layout,
        |         CAST(COUNT(*) AS BIGINT) AS files_total,
        |         CAST(SUM(CASE WHEN $scanned THEN 1 ELSE 0 END)
        |           AS BIGINT) AS files_scanned,
        |         CAST(SUM(CASE WHEN $scanned THEN nrows ELSE 0 END)
        |           AS BIGINT) AS rows_scanned,
        |         CAST(SUM(hits) AS BIGINT) AS rows_match
        |       FROM fz),
        |ax AS (SELECT 'linear' AS layout,
        |         CAST(COUNT(*) AS BIGINT) AS files_total,
        |         CAST(SUM(CASE WHEN $scanned THEN 1 ELSE 0 END)
        |           AS BIGINT) AS files_scanned,
        |         CAST(SUM(CASE WHEN $scanned THEN nrows ELSE 0 END)
        |           AS BIGINT) AS rows_scanned,
        |         CAST(SUM(hits) AS BIGINT) AS rows_match
        |       FROM fx)
        |SELECT * FROM ax UNION ALL SELECT * FROM az
        |ORDER BY layout""".stripMargin
    },

    "q301_chisq_homogeneity" ->
      """WITH docs AS (SELECT source, n_chars FROM documents),
        |mx AS (SELECT MAX(n_chars) AS mx FROM docs),
        |o AS (SELECT source,
        |        CAST((n_chars * 8) // (mx + 1) AS BIGINT) AS b,
        |        CAST(COUNT(*) AS BIGINT) AS o
        |      FROM docs, mx GROUP BY 1, 2),
        |rm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r
        |       FROM o GROUP BY 1),
        |cm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |         CAST(COUNT(DISTINCT source) AS BIGINT) AS k,
        |         CAST(COUNT(DISTINCT b) AS BIGINT) AS cb FROM o),
        |grid AS (
        |  SELECT rm.source, cm.b, rm.r, cm.c,
        |    COALESCE(o.o, 0) AS oo
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN o ON o.source = rm.source AND o.b = cm.b),
        |cells AS (
        |  SELECT CAST((1000 * (CAST(oo AS HUGEINT) * nn.n
        |        - CAST(r AS HUGEINT) * c)
        |      * (CAST(oo AS HUGEINT) * nn.n - CAST(r AS HUGEINT) * c))
        |      // (CAST(nn.n AS HUGEINT) * r * c) AS BIGINT)
        |      AS contrib_milli,
        |    nn.n, nn.k, nn.cb
        |  FROM grid, nn)
        |SELECT n, k AS k_sources, cb AS c_bins,
        |  (k - 1) * (cb - 1) AS dof,
        |  CAST(SUM(contrib_milli) AS BIGINT) AS chi2_milli,
        |  CAST(FLOOR(SQRT(CAST((1000 * CAST(SUM(contrib_milli) AS
        |      BIGINT)) // (n * least(k - 1, cb - 1)) AS DOUBLE)))
        |    AS BIGINT) AS cramers_v_permille
        |FROM cells GROUP BY n, k, cb""".stripMargin,

    "q302_benford_audit" -> {
      val vals = BenfordPermille
        .map { case (dd, pp) => s"($dd, $pp)" }.mkString(", ")
      s"""WITH src AS (
        |  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS v FROM orders),
        |obs AS (
        |  SELECT v // CAST('1' || repeat('0',
        |      CAST(length(CAST(v AS VARCHAR)) AS INTEGER) - 1)
        |      AS BIGINT) AS digit,
        |    CAST(COUNT(*) AS BIGINT) AS n_obs
        |  FROM src WHERE v >= 1 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
        |e(digit, benford_permille) AS (VALUES $vals)
        |SELECT CAST(e.digit AS BIGINT) AS digit,
        |  COALESCE(obs.n_obs, 0) AS n_obs,
        |  (1000 * COALESCE(obs.n_obs, 0)) // tot.n AS obs_permille,
        |  CAST(e.benford_permille AS BIGINT) AS benford_permille,
        |  abs((1000 * COALESCE(obs.n_obs, 0)) // tot.n
        |    - e.benford_permille) AS dev_permille
        |FROM e LEFT JOIN obs ON obs.digit = e.digit, tot
        |ORDER BY digit""".stripMargin
    },

    "q303_gini_concentration" ->
      """WITH rk AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS i
        |  FROM documents),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    CAST(SUM(CAST(i AS HUGEINT) * n_chars) AS HUGEINT) AS six
        |  FROM rk GROUP BY 1)
        |SELECT source, n_docs, total_chars,
        |  CAST((1000 * (2 * six - (n_docs + 1)
        |      * CAST(total_chars AS HUGEINT)))
        |    // (CAST(n_docs AS HUGEINT) * total_chars) AS BIGINT)
        |    AS gini_permille
        |FROM agg ORDER BY source""".stripMargin,

    "q299_anf_sketch" -> {
      def prop(prev: String, cur: String): String =
        s"""$cur AS (
          |  SELECT v, t, BIT_OR(mask) AS mask FROM (
          |    SELECT e2.src AS v, m.t, m.mask
          |    FROM e2 JOIN $prev m ON m.v = e2.dst
          |    UNION ALL SELECT v, t, mask FROM $prev)
          |  GROUP BY 1, 2)""".stripMargin
      def hop(prev: String, cur: String): String =
        s"""$cur AS (
          |  SELECT DISTINCT a, b FROM (
          |    SELECT p.a, e2.dst AS b FROM $prev p
          |    JOIN e2 ON p.b = e2.src
          |    UNION ALL SELECT a, b FROM $prev))""".stripMargin
      def rout(h: Int): String =
        s"""SELECT $h AS h,
          |  (SELECT CAST(SUM(${bitIndexCase("y")}) AS BIGINT)
          |   FROM (SELECT (mask + 1) & (-(mask + 1)) AS y FROM s$h))
          |    AS sum_r,
          |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p$h) AS n_pairs""".stripMargin
      s"""WITH ${GraphQueries.edgeCte},
        |e2 AS (SELECT src, dst FROM e),
        |nodes AS (SELECT DISTINCT v FROM (
        |  SELECT src AS v FROM e2 UNION ALL SELECT dst FROM e2)),
        |s0 AS (
        |  SELECT v, t, ${fmMaskCase("u")} AS mask FROM (
        |    SELECT v, r.t,
        |      substr(md5('anf|' || CAST(r.t AS VARCHAR) || '|' ||
        |        CAST(v AS VARCHAR)), 1, 15) AS u
        |    FROM nodes CROSS JOIN
        |      (SELECT range AS t FROM range(16)) r)),
        |${prop("s0", "s1")},
        |${prop("s1", "s2")},
        |${prop("s2", "s3")},
        |p0 AS (SELECT v AS a, v AS b FROM nodes),
        |${hop("p0", "p1")},
        |${hop("p1", "p2")},
        |${hop("p2", "p3")}
        |${rout(0)} UNION ALL ${rout(1)} UNION ALL
        |${rout(2)} UNION ALL ${rout(3)}
        |ORDER BY h""".stripMargin
    }
  )
}

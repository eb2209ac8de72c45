package graft.operators

import graft.{Scratch, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication — the token-span twin of MinHash dedup
  * (q30): find pairs of documents sharing a LITERAL run of ≥ W+k tokens,
  * and the length of the longest shared run. This is the "exact substring
  * dedup" pass of modern LLM corpus curation (dedup spans, not just
  * whole near-identical documents — boilerplate headers, license blocks,
  * quoted passages survive document-level dedup and still memorize).
  *
  * Shape: every W-token window reduces to an 8-byte rolling fingerprint
  * IN the scan projection (HOF over the token array — windows never
  * materialize as strings off the executor); windows shared by 2..cap
  * documents become (a, b, pa, pb) anchor pairs; runs of consecutive
  * shared windows collapse by the gaps-and-islands identity on the
  * (pa − pb) diagonal — a PARTITIONED window (pair × diagonal), never a
  * global one. A shared run of L ≥ W tokens appears as L − W + 1
  * consecutive window hits, so max-island + W − 1 recovers L exactly.
  * The df cap (64) drops boilerplate windows the way q219's caps drop
  * stop-words: fan-out per window is bounded C(64,2) no matter the
  * corpus.
  *
  * q292 is the EXHAUSTIVE member: distributed suffix ordering (prefix
  * doubling with equivalence-class-representative ids — pure equi-joins,
  * no global sort) detects every ≥50-token exact repeat definitionally,
  * where the fingerprint path is window-quantized and probabilistic by
  * hash; its oracle materializes the 50-gram strings outright.
  *
  * q264 is the INCREMENTAL contract (q117's shape for spans): history
  * window fingerprints persist as an index, a new batch fingerprints
  * only itself, the df census merges stored history counts with batch
  * counts, and anchors join the batch against index + itself — O(batch)
  * tokenization per increment, history text never re-read. The
  * increment must equal the full-corpus q261 restricted to pairs
  * touching the batch.
  */
object SpanQueries {

  /** Window width in tokens. 8 keeps the fixture's natural shared spans
    * detectable; production uses 50 (Lee et al.) — the plan is
    * width-independent. */
  private val W = 8

  /** Windows with this many or more holding documents are boilerplate;
    * dropping them bounds per-hash pair fan-out. */
  private val DfCap = 64

  /** (doc_id, pos, h): one 8-byte fingerprint per W-token window,
    * computed inside the scan projection. ONE definition shared by the
    * batch query, the index builder, and the increment — an index built
    * with different window geometry than the probe silently misses every
    * span (the bandKeys lesson).
    *
    * greatest(, 1) makes the sequence bound ascending BY SHAPE (the repo
    * lint's provable form): the WHERE excludes size(w) < W rows, so the
    * clamp never changes a surviving row — it exists because callers
    * localCheckpoint this frame, truncating the lineage a Filter-guard
    * whitelist would need to re-verify. */
  private def windows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(trim(lower(col("text"))), " ").as("w"))
      .where(size(col("w")) >= W)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(size(w) - ${W - 1}, 1)), " +
            s"i -> xxhash64(array_join(slice(w, i, $W), ' ')))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("h"))

  /** Anchor pairs → islands → per-pair span account. `anchors` must
    * carry (a, b, pa, pb) with each unordered pair exactly once. */
  private def spanAccount(anchors: DataFrame): DataFrame = {
    // gaps-and-islands per (pair, diagonal): consecutive window hits
    // have consecutive pa AND pb, i.e. the same pa − pb; the window is
    // partitioned by (a, b, d) — per-pair-bounded input, lint-clean
    val d2 = anchors.withColumn("d", col("pa") - col("pb"))
    val rn = row_number().over(
      Window.partitionBy(col("a"), col("b"), col("d"))
        .orderBy(col("pa")))
    val runs = d2.withColumn("grp", col("pa") - rn)
      .groupBy(col("a"), col("b"), col("d"), col("grp"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("a"), col("b"))
      .agg(sum(col("run")).as("n_shared_windows"),
        count(lit(1)).as("n_islands"),
        (max(col("run")) + (W - 1)).as("max_span_tokens"))
      .where(col("max_span_tokens") >= 2 * W)
      .orderBy(col("a"), col("b"))
  }

  /** History-side window-fingerprint index (doc_id % 10 != 0), persisted
    * once per sf: the raw (doc_id, pos, h) windows plus the per-hash df
    * census — the increment must never re-tokenize or re-count history. */
  private[graft] def spanIndexFixture(s: SparkSession, d: String): String = {
    val out = Scratch.fixtureDir(d, "span_index")
    if (!new java.io.File(s"$out/dfs/_SUCCESS").exists()) {
      val hist = windows(
        T.documents(s, d).where(col("doc_id") % 10 =!= 0))
        .localCheckpoint()
      hist.write.mode("overwrite").parquet(s"$out/wins")
      hist.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$out/dfs")
    }
    out
  }

  /** q292 span width: the published exact-substring threshold (Lee et
    * al. 2022 use 50 tokens). */
  private val SuffixL = 50

  /** Shared 60-token span planted on every 17th document so the fixture
    * corpus provably contains cross-document ≥50-token exact repeats
    * (the natural corpus may or may not). The literal is embedded in
    * the oracle SQL verbatim — one definition. */
  private[graft] val SuffixBoiler: String =
    (0 until 60).map(i => "qz" + i).mkString(" ")

  /** Position-packing base for suffix-class representative ids:
    * did·2²⁰ + p is unique while docs stay under 2²⁰ tokens (the
    * longest fixture doc is orders of magnitude shorter; a corpus with
    * megatoken documents raises the constant). */
  private val PosCap = 1L << 20

  /** Planted corpus tokenized to (did, p, w) — per-document positions:
    * suffix classes never cross documents, exactly like the reference
    * concatenation-with-separators construction. */
  private[graft] def suffixTokens(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id").as("did"),
        when(col("doc_id") % 17 === 0,
          concat_ws(" ", trim(col("text")), lit(SuffixBoiler)))
          .otherwise(trim(col("text"))).as("t2"))
      .select(col("did"), split(lower(col("t2")), " ").as("w"))
      // documents without a single full 50-token window contribute no
      // 50-gram and no class EQUALITY information for anyone else —
      // dropping them up front shrinks every round (class ids shift to
      // different representatives; equality structure is untouched)
      .where(size(col("w")) >= SuffixL)
      .select(col("did"), posexplode(col("w")))
      .select(col("did"), col("pos").cast("long").as("p"),
        col("col").as("w"))

  /** One prefix-doubling round (Manber–Myers distributed): positions p
    * and p' land in the same 2k-class iff their k-classes agree at p
    * and p+k. The class id is the EQUIVALENCE-CLASS REPRESENTATIVE
    * (min packed position in the class) — equality-preserving and
    * injective, which is all span detection needs, so each round is
    * two equi-shuffles: the pair join, then ONE exchange keyed on the
    * class pair with the min computed as a whole-partition window
    * aggregate (round 8; previously a groupBy + join-back, which
    * exchanged the corpus-sized frame a third time to re-attach the
    * representative — a window partitioned by the same key computes
    * the identical min on the aggregation's own exchange, guide §2.4).
    * No global sort, no single-partition window anywhere. The inner
    * shift join doubles as the boundary filter: a position without a
    * full 2k-token window simply drops out of the round. */
  private[graft] def doubling(r: DataFrame, k: Int): DataFrame =
    doublingPlan(r, k).localCheckpoint()

  /** The round's un-checkpointed frame — split out (round 9) so the plan
    * evidence (PlanDump "internals": the window-keyed representative min
    * vs the old groupBy + join-back) dumps the REAL round body, not a
    * reconstruction; q292 executes exactly this via [[doubling]]. */
  private[graft] def doublingPlan(r: DataFrame, k: Int): DataFrame = {
    val paired = r.select(col("did"), col("p"), col("r").as("ra"))
      .join(r.select(col("did"), (col("p") - k).as("p"),
        col("r").as("rb")), Seq("did", "p"))
    val wRep = Window.partitionBy(col("ra"), col("rb"))
    paired
      .withColumn("r2", min(col("did") * PosCap + col("p")).over(wRep))
      .select(col("did"), col("p"), col("r2").as("r"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Suffix-ordering exact-substring dedup — the EXHAUSTIVE published
    // method beside q261's windowed fingerprints (Lee et al. 2022:
    // suffix-array the corpus, remove every ≥50-token span that occurs
    // twice). Fingerprints (q261) are probabilistic-by-hash and
    // window-quantized; this path is exact on token content: log₂(L)
    // prefix-doubling rounds build 32-token suffix CLASSES (min-
    // representative ids, pure equi-joins — see [[doubling]]), the
    // 50-gram key is the classic (class[p], class[p+L−32]) overlap
    // pair, and a class with ≥2 members marks every position whose
    // 50-token span occurs elsewhere (same or other doc). Output is
    // the per-document removal account: 50-gram positions, duplicated
    // positions, and the token-coverage union a dedup pass would cut.
    // Round 0 groups on raw token STRINGS (exact, not hashed — this is
    // the exactness-over-speed member of the family); every later
    // round shuffles only (did, p, class, class) longs. At 100 TB:
    // 6 corpus-sized narrow shuffles/round × log₂(50) rounds, each
    // map-side combinable, no all-pairs stage anywhere — the ScaleUp
    // probe pins near-linear wall in corpus size.
    "q292_suffix_dedup" -> ((s, d) => {
      val toks = suffixTokens(s, d).localCheckpoint()
      // round 0 groups on raw token strings; window-min over the same
      // key = one token-keyed exchange, not groupBy + join-back (round 8)
      val r1 = toks
        .withColumn("r", min(col("did") * PosCap + col("p")).over(
          Window.partitionBy(col("w"))))
        .select(col("did"), col("p"), col("r"))
        .localCheckpoint()
      val r32 = Seq(1, 2, 4, 8, 16).foldLeft(r1)(doubling)
      // 50-gram identity = (32-class at p, 32-class at p+18); the
      // inner shift join IS the p+49 ≤ doc-end validity filter
      val keyed = r32.select(col("did"), col("p"), col("r").as("ra"))
        .join(r32.select(col("did"),
          (col("p") - (SuffixL - 32)).as("p"), col("r").as("rb")),
          Seq("did", "p"))
        .localCheckpoint()
      // shared-50-gram mark: a window count over the same key instead of
      // a groupBy + join-back — one exchange of the corpus-sized keyed
      // frame, not two (round 8, same rewrite as doubling's min)
      val marked = keyed
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("ra"), col("rb"))))
        .where(col("n") >= 2)
        .select(col("did"), col("p"))
        .localCheckpoint()
      val nPos = keyed.groupBy(col("did"))
        .agg(count(lit(1)).as("n_pos"))
      val nDup = marked.groupBy(col("did"))
        .agg(count(lit(1)).as("n_dup50"))
      // coverage union WITHOUT materializing tokens: the union of
      // [p, p+49] intervals over sorted marked positions is
      // Σ min(next_p − p, 50) + 50 for the last — a per-document
      // window (partitioned, bounded by doc length), not a 50×-explode
      // + corpus-sized distinct (measured 14.3× wall at the sf10 probe
      // before this; the interval identity removes the blow-up while
      // computing the identical value)
      val covW = Window.partitionBy(col("did")).orderBy(col("p"))
      val cov = marked
        .withColumn("nxt", lead(col("p"), 1).over(covW))
        .select(col("did"),
          when(col("nxt").isNull, lit(SuffixL.toLong))
            .otherwise(least(col("nxt") - col("p"),
              lit(SuffixL.toLong))).as("c"))
        .groupBy(col("did")).agg(sum(col("c")).as("n_dup_tokens"))
      T.documents(s, d).select(col("doc_id"))
        .join(nPos.withColumnRenamed("did", "doc_id"), Seq("doc_id"),
          "left")
        .join(nDup.withColumnRenamed("did", "doc_id"), Seq("doc_id"),
          "left")
        .join(cov.withColumnRenamed("did", "doc_id"), Seq("doc_id"),
          "left")
        .select(col("doc_id"),
          coalesce(col("n_pos"), lit(0L)).as("n_pos"),
          coalesce(col("n_dup50"), lit(0L)).as("n_dup50"),
          coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q261_substring_dedup" -> ((s, d) => {
      // The fingerprint table feeds the df census AND both sides of the
      // anchor self-join; materialize it once (q30's shingle-table
      // pattern — without the checkpoint the tokenize+hash scan runs
      // three times)
      val win = windows(T.documents(s, d)).localCheckpoint()
      val keep = win.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .where(col("df") >= 2 && col("df") < DfCap)
        .select(col("h"))
      val shared = win.join(keep, Seq("h"), "left_semi")
      val anchors = shared.select(col("h"), col("doc_id").as("a"),
          col("pos").as("pa"))
        .join(shared.select(col("h"), col("doc_id").as("b"),
          col("pos").as("pb")), "h")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"), col("pa"), col("pb"))
      spanAccount(anchors)
    }),

    // Incremental substring dedup: the q117 contract for spans. The
    // batch (doc_id % 10 == 0) fingerprints ONLY itself; the df gate
    // merges the persisted history census with batch counts (equal to
    // the full-corpus census by construction); anchors = batch×batch +
    // history×batch, each unordered pair exactly once (the history side
    // splits by which member holds the larger id). Output must equal
    // q261 on the full corpus restricted to pairs touching the batch —
    // the oracle IS that restriction.
    "q264_incremental_substring" -> ((s, d) => {
      val idx = spanIndexFixture(s, d)
      val histWins = s.read.parquet(s"$idx/wins")
      val histDfs = s.read.parquet(s"$idx/dfs")
        .select(col("h"), col("df").as("df_hist"))
      val bwin = windows(
        T.documents(s, d).where(col("doc_id") % 10 === 0))
        .localCheckpoint()
      val bdf = bwin.groupBy(col("h")).agg(count(lit(1)).as("df_batch"))
      val keep = bdf.join(histDfs, Seq("h"), "full_outer")
        .select(col("h"),
          (coalesce(col("df_batch"), lit(0L)) +
            coalesce(col("df_hist"), lit(0L))).as("df"))
        .where(col("df") >= 2 && col("df") < DfCap)
        .select(col("h"))
      val bShared = bwin.join(keep, Seq("h"), "left_semi")
      val hShared = histWins.join(keep, Seq("h"), "left_semi")
      // batch×batch plus history×batch; larger id decides the side so
      // each unordered pair appears exactly once across the three arms
      val intra = bShared.select(col("h"), col("doc_id").as("a"),
          col("pos").as("pa"))
        .join(bShared.select(col("h"), col("doc_id").as("b"),
          col("pos").as("pb")), "h")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"), col("pa"), col("pb"))
      val histLo = hShared.select(col("h"), col("doc_id").as("a"),
          col("pos").as("pa"))
        .join(bShared.select(col("h"), col("doc_id").as("b"),
          col("pos").as("pb")), "h")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"), col("pa"), col("pb"))
      val histHi = bShared.select(col("h"), col("doc_id").as("a"),
          col("pos").as("pa"))
        .join(hShared.select(col("h"), col("doc_id").as("b"),
          col("pos").as("pb")), "h")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"), col("pa"), col("pb"))
      spanAccount(intra.unionByName(histLo).unionByName(histHi))
    })
  )

  private def oracleChain(finalSelect: String) =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
      |  FROM documents WHERE len(string_split(trim(lower(text)), ' '))
      |    >= $W),
      |win AS (
      |  SELECT doc_id, u.s.pos AS pos, u.s.h AS h
      |  FROM toks, LATERAL unnest([{'pos': i,
      |      'h': hash(array_to_string(w[i:i + ${W - 1}], ' '))}
      |    for i in range(1, len(w) - ${W - 2})]) u(s)),
      |keep AS (
      |  SELECT h FROM win GROUP BY h
      |  HAVING COUNT(*) >= 2 AND COUNT(*) < $DfCap),
      |sh AS (SELECT win.* FROM win JOIN keep USING (h)),
      |anch AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
      |  FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id),
      |isl AS (
      |  SELECT a, b, pa - pb AS d, pa,
      |    pa - ROW_NUMBER() OVER (PARTITION BY a, b, pa - pb
      |      ORDER BY pa) AS grp
      |  FROM anch),
      |runs AS (
      |  SELECT a, b, d, grp, COUNT(*) AS run
      |  FROM isl GROUP BY a, b, d, grp)
      |$finalSelect""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // The truth is definitional: materialize every 50-token gram as a
    // STRING, group, keep grams seen twice — exactly what the suffix
    // classes must reproduce. (DuckDB zipped unnest pairs each gram
    // with its 0-based position.)
    "q292_suffix_dedup" ->
      s"""WITH docs AS (
        |  SELECT doc_id, CASE WHEN doc_id % 17 = 0
        |      THEN trim(text) || ' ' || '$SuffixBoiler'
        |      ELSE trim(text) END AS t2
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split(lower(t2), ' ') AS w
        |        FROM docs),
        |g AS (SELECT doc_id,
        |        unnest(range(0, greatest(len(w) - ${SuffixL - 1}, 0)))
        |          AS p,
        |        unnest([array_to_string(w[i:i + ${SuffixL - 1}], ' ')
        |          for i in range(1, greatest(len(w) - ${SuffixL - 2},
        |            1))]) AS gram
        |      FROM tok),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
        |m AS (SELECT doc_id, p FROM g JOIN dup USING (gram)),
        |np AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos
        |       FROM g GROUP BY 1),
        |nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup50
        |       FROM m GROUP BY 1),
        |cv AS (SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT)
        |         AS n_dup_tokens
        |       FROM (SELECT doc_id, p + u AS t
        |             FROM m, range(0, $SuffixL) u(u)) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(np.n_pos, 0) AS BIGINT) AS n_pos,
        |  CAST(COALESCE(nd.n_dup50, 0) AS BIGINT) AS n_dup50,
        |  CAST(COALESCE(cv.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN np USING (doc_id)
        |LEFT JOIN nd USING (doc_id)
        |LEFT JOIN cv USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Same construction; DuckDB list comprehension for the windows and a
    // window-function islands pass (different plan class, same values —
    // hash functions differ across engines but only their equality
    // classes matter, and both are collision-free at corpus scale).
    "q261_substring_dedup" -> oracleChain(
      s"""SELECT a, b, CAST(SUM(run) AS BIGINT) AS n_shared_windows,
        |  COUNT(*) AS n_islands,
        |  CAST(MAX(run) + ${W - 1} AS BIGINT) AS max_span_tokens
        |FROM runs GROUP BY a, b
        |HAVING MAX(run) + ${W - 1} >= ${2 * W}
        |ORDER BY a, b""".stripMargin),

    // the full-corpus result restricted to pairs touching the batch —
    // the increment must find exactly these
    "q264_incremental_substring" -> oracleChain(
      s"""SELECT a, b, CAST(SUM(run) AS BIGINT) AS n_shared_windows,
        |  COUNT(*) AS n_islands,
        |  CAST(MAX(run) + ${W - 1} AS BIGINT) AS max_span_tokens
        |FROM runs
        |WHERE a % 10 = 0 OR b % 10 = 0
        |GROUP BY a, b
        |HAVING MAX(run) + ${W - 1} >= ${2 * W}
        |ORDER BY a, b""".stripMargin)
  )
}

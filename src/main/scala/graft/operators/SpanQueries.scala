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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

package graft.operators

import graft.{Tables => T}
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
  */
object SpanQueries {

  /** Window width in tokens. 8 keeps the fixture's natural shared spans
    * detectable; production uses 50 (Lee et al.) — the plan is
    * width-independent. */
  private val W = 8

  /** Windows with this many or more holding documents are boilerplate;
    * dropping them bounds per-hash pair fan-out. */
  private val DfCap = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q261_substring_dedup" -> ((s, d) => {
      val toks = T.documents(s, d)
        .select(col("doc_id"), split(trim(lower(col("text"))), " ").as("w"))
        .where(size(col("w")) >= W)
      // 8-byte window fingerprints computed inside the projection — the
      // token array never leaves the scan side as window TEXT. The
      // fingerprint table feeds the df census AND both sides of the
      // anchor self-join; materialize it once (q30's shingle-table
      // pattern — without the checkpoint the tokenize+hash scan runs
      // three times)
      // greatest(, 1) makes the sequence bound ascending BY SHAPE (the
      // repo lint's provable form): the WHERE above already excludes
      // size(w) < W rows, so the clamp never changes a surviving row —
      // it exists because the localCheckpoint below truncates lineage
      // and a Filter-guard whitelist entry could not be re-verified
      // structurally behind it
      val win = toks.select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(1, greatest(size(w) - ${W - 1}, 1)), " +
              s"i -> xxhash64(array_join(slice(w, i, $W), ' ')))")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("h"))
        .localCheckpoint()
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
    })
  )

  def oracleSql: Map[String, String] = Map(

    // Same construction; DuckDB list comprehension for the windows and a
    // window-function islands pass (different plan class, same values —
    // hash functions differ across engines but only their equality
    // classes matter, and both are collision-free at corpus scale).
    "q261_substring_dedup" ->
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
        |SELECT a, b, CAST(SUM(run) AS BIGINT) AS n_shared_windows,
        |  COUNT(*) AS n_islands,
        |  CAST(MAX(run) + ${W - 1} AS BIGINT) AS max_span_tokens
        |FROM runs GROUP BY a, b
        |HAVING MAX(run) + ${W - 1} >= ${2 * W}
        |ORDER BY a, b""".stripMargin
  )
}

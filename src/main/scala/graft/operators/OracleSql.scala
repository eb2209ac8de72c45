package graft.operators

/** Shared DuckDB SQL fragments for the near-dup truth oracles.
  *
  * The original oracles computed pair truth with an ALL-PAIRS self-join
  * (`sh a JOIN sh b ON a.doc_id < b.doc_id` + `list_intersect`) — the
  * definitionally-obvious construction, but O(n²) in the document count:
  * fine at the sf0.01 gate (500 docs), >120 s per query in DuckDB at
  * sf0.1 (5,000 docs), which forced the full-board sf0.1 sweep to skip
  * the five queries using it (round-7 VERDICT demand #2).
  *
  * This blocked formulation is EXACTLY equivalent and near-linear:
  * every pair any of these oracles can emit has `common >= 1` shared
  * shingle (Jaccard >= 0.8 > 0, or containment >= 0.9 > 0), so
  * enumerating only co-occurring pairs through an inverted shingle
  * index loses nothing; and `|A ∩ B|` is the exact group-by count of
  * shared shingles — no list materialization per pair at all. Jaccard
  * then follows from the identity `|A ∪ B| = |A| + |B| - |A ∩ B|`.
  * Equivalence is additionally regression-pinned by OracleParitySpec,
  * which runs old-vs-new SQL side by side at the gate scale.
  *
  * CTE names are nd_-prefixed so the fragment composes into oracles
  * that define their own `sz`/`lab`/`e` members. `nd_sh` is
  * MATERIALIZED: it is referenced twice (sizes + inverted index) and
  * DuckDB would otherwise inline-recompute the shingle extraction.
  */
private[operators] object OracleSql {

  /** 3-gram shingle SET per doc — identical tokenization to the Spark
    * side (`Dedup.shingles`): lowercase, trim, single-space split. */
  def shingleSql(rel: String): String =
    s"""SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |    for i in range(1, len(w) - 1)]) AS s
       |FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
       |      FROM $rel)
       |WHERE len(w) >= 3""".stripMargin

  /** WITH-fragment defining `pairs(id_a, id_b, sz_a, sz_b, common,
    * jaccard)` over all co-occurring doc pairs of `rel` (id_a < id_b,
    * common >= 1). Callers apply their own threshold predicate. */
  def blockedPairs(rel: String): String =
    s"""nd_sh AS MATERIALIZED (${shingleSql(rel)}),
       |nd_sz AS (SELECT doc_id, len(s) AS n FROM nd_sh WHERE len(s) > 0),
       |nd_inv AS (SELECT doc_id, unnest(s) AS g FROM nd_sh),
       |pairs AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(sa.n AS BIGINT) AS sz_a, CAST(sb.n AS BIGINT) AS sz_b,
       |    CAST(c.c AS BIGINT) AS common,
       |    CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c) AS jaccard
       |  FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |    FROM nd_inv a JOIN nd_inv b
       |      ON a.g = b.g AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) c
       |  JOIN nd_sz sa ON sa.doc_id = c.id_a
       |  JOIN nd_sz sb ON sb.doc_id = c.id_b)""".stripMargin
}

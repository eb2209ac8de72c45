#!/usr/bin/env python3
"""Old-vs-new oracle parity pin for the blocked near-dup truth rewrite.

Round 7 skipped seven queries in the sf0.1 sweep because their DuckDB
truth oracles were the definitionally-obvious but O(n^2) constructions
(all-pairs shingle self-join / correlated-EXISTS wedge closure). Round 8
replaced them with exactly-equivalent near-linear forms
(`OracleSql.blockedPairs`: inverted-index candidate generation + exact
group-by intersection counts; q252: MATERIALIZED CTEs + hash-join
closure). The equivalence argument is one line each — any emitted pair
shares >= 1 shingle, |A ∩ B| is the group-by count, EXISTS on a DISTINCT
pair set == inner join — but this tool PINS it empirically: it runs the
ORIGINAL quadratic SQL (kept verbatim below) and the committed new SQL
from the verify dump's oracle_sql.json side by side at the gate scale
(sf0.01, where the quadratic forms finish in seconds) and fails on any
value or dtype divergence.

Usage: python3 tools/oracle_parity.py <verify_out_dir> <sf_dir>
  (verify_out_dir must contain oracle_sql.json from graft.Verify)
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SH = """SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
    for i in range(1, len(w) - 1)]) AS s
FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
      FROM {rel})
WHERE len(w) >= 3"""

PAIR_COLS = """a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(len(a.s) AS BIGINT) AS sz_a, CAST(len(b.s) AS BIGINT) AS sz_b,
  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS common,
  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard"""

JACC = """CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"""

EDGE = """  SELECT c.c_nationkey AS src, su.s_nationkey AS dst, COUNT(*) AS w
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  JOIN supplier su ON l.l_suppkey = su.s_suppkey
  GROUP BY 1, 2"""

# The round-7 quadratic originals, verbatim.
OLD = {
    "q30_dedup_minhash": f"""
WITH sh AS ({SH.format(rel='documents')})
SELECT {PAIR_COLS}
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0 AND {JACC} >= 0.8
ORDER BY id_a, id_b""",

    "q210_stream_neardup": f"""
WITH sh AS ({SH.format(rel='documents')})
SELECT {PAIR_COLS}
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0 AND {JACC} >= 0.8
ORDER BY id_a, id_b""",

    "q135_containment": f"""
WITH sh AS ({SH.format(rel='documents')})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS common,
  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS cont_a,
  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s) AS cont_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0
  AND (CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.9
    OR CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s) >= 0.9)
ORDER BY id_a, id_b""",

    "q65_dedup_clusters": f"""
WITH RECURSIVE
docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT doc_id + 20000000, text FROM documents WHERE doc_id < 20),
sh AS ({SH.format(rel='docs2')}),
e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.s) > 0 AND len(b.s) > 0 AND {JACC} >= 0.8),
sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
cc AS (
  SELECT u AS id, u AS comp FROM sym
  UNION
  SELECT s.v AS id, c.comp FROM cc c JOIN sym s ON s.u = c.id
  WHERE c.comp < s.v),
lab AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id)
SELECT comp, COUNT(*) AS n_members,
  CAST(SUM(CASE WHEN id = comp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  MAX(id) AS max_id
FROM lab GROUP BY comp HAVING COUNT(*) > 1 ORDER BY comp""",

    "q209_soft_dedup": f"""
WITH RECURSIVE
sh AS ({SH.format(rel='documents')}),
e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.s) > 0 AND len(b.s) > 0 AND {JACC} >= 0.8),
sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
cc AS (
  SELECT u AS id, u AS comp FROM sym
  UNION
  SELECT s.v AS id, c.comp FROM cc c JOIN sym s ON s.u = c.id
  WHERE c.comp < s.v),
lab AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id),
labeled AS (
  SELECT d.doc_id, d.source, COALESCE(l.comp, d.doc_id) AS comp
  FROM documents d LEFT JOIN lab l ON d.doc_id = l.id),
sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS csz
       FROM labeled GROUP BY comp)
SELECT f.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(SUM(1000000 // s.csz) AS BIGINT) AS ess_micro,
  CAST(SUM(CASE WHEN s.csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_in_clusters
FROM labeled f JOIN sz s USING (comp)
GROUP BY f.source ORDER BY f.source""",

    "q207_split_leakage": f"""
WITH sh AS ({SH.format(rel='documents')}),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(a.s) > 0 AND len(b.s) > 0 AND {JACC} >= 0.8),
sp AS (
  SELECT doc_id,
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
      THEN 'train'
      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
      THEN 'val' ELSE 'test' END AS split
  FROM documents),
lab AS (
  SELECT p.id_a, p.id_b,
    least(x.split, y.split) AS sa, greatest(x.split, y.split) AS sb
  FROM p JOIN sp x ON p.id_a = x.doc_id
         JOIN sp y ON p.id_b = y.doc_id),
e AS (
  SELECT sa, sb, id_a AS doc FROM lab
  UNION ALL SELECT sa, sb, id_b AS doc FROM lab)
SELECT sa, sb, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT doc) AS BIGINT) AS n_docs_involved
FROM e GROUP BY sa, sb ORDER BY sa, sb""",

    "q252_triangles": f"""
WITH e AS (
{EDGE}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst),
deg AS (
  SELECT v, COUNT(*) AS dg FROM (
    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
  GROUP BY 1),
ori AS (
  SELECT CASE WHEN da.dg < db.dg
      OR (da.dg = db.dg AND und.a < und.b)
    THEN und.a ELSE und.b END AS lo,
    CASE WHEN da.dg < db.dg
      OR (da.dg = db.dg AND und.a < und.b)
    THEN und.b ELSE und.a END AS hi
  FROM und JOIN deg da ON da.v = und.a
    JOIN deg db ON db.v = und.b),
wed AS (
  SELECT w1.lo AS c, w1.hi AS x, w2.hi AS y
  FROM ori w1 JOIN ori w2 ON w1.lo = w2.lo AND w1.hi < w2.hi),
tri AS (
  SELECT COUNT(*) AS n_triangles FROM wed
  WHERE EXISTS (SELECT 1 FROM und
    WHERE und.a = wed.x AND und.b = wed.y)),
uw AS (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
nv AS (SELECT COUNT(*) AS n_vertices FROM deg),
ne AS (SELECT COUNT(*) AS n_edges FROM und)
SELECT n_vertices, n_edges, n_wedges, n_triangles,
  CAST(CASE WHEN n_wedges > 0
    THEN (3000 * n_triangles) // n_wedges ELSE 0 END AS BIGINT)
    AS clustering_permille
FROM nv, ne, uw, tri""",
}


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    new_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    n_fail = 0
    for name, old in sorted(OLD.items()):
        new = new_sql.get(name)
        if new is None:
            print(f"  {name}: FAIL (no committed oracle)")
            n_fail += 1
            continue
        od = con.sql(old).df()
        nd = con.sql(new).df()
        ok = (list(od.columns) == list(nd.columns)
              and [str(t) for t in od.dtypes] == [str(t) for t in nd.dtypes]
              and od.equals(nd))
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} rows={len(nd)}")
        if not ok:
            n_fail += 1
    print(f"{len(OLD) - n_fail}/{len(OLD)} parity")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Storage-layout layer — the physical-design advisors and compressed-index
  * operators a 100 TB lake runs between ingestion and query serving. The
  * reference delegates physical layout to its object store + RDS
  * (`/root/reference/sources/worker/worker.js` bulk-loads and moves on); at
  * Spark scale the layout IS the performance model, so these are
  * first-class:
  *
  *  - q241: zone-map data skipping — per-block min/max over the predicate
  *    column, blocks-scanned vs blocks-skipped for a range predicate, and
  *    the exact row count the surviving blocks must contain. The row-group
  *    statistics walk every parquet reader does before touching pages,
  *    surfaced as a measurable plan: the skip ratio is the number that
  *    justifies sort-on-write.
  *  - q242: compaction planning — AQE's CoalesceShufflePartitions algorithm
  *    (adjacent running-sum bins against a target size) applied to a
  *    small-files inventory; bins, fill factor, and the small-file count
  *    before/after. The exact prefix-sum shape is q150's two-pass global
  *    cumsum — per-bucket subtotals + broadcast offsets — so the plan has
  *    no unpartitioned window.
  *  - q243: dictionary-encoding audit — per low-cardinality column:
  *    cardinality, code width (floor-log2+1), encoded vs plain bits, and
  *    the compression ratio the writer would get. Vocabulary-bounded
  *    groupBys only.
  *  - q250: product-quantization ANN — 8 sub-spaces × 8 dims, 16-centroid
  *    codebook per sub-space seeded from the first sixteen vectors,
  *    asymmetric-distance (ADC) scan: quantization, per-sub-space argmin
  *    codes, the table-driven estimate, and the exact distance all run in
  *    ONE codegen'd Catalyst kernel ([[graft.functions.PqAdc]]/`PqAdcF`
  *    — no join, no fan-out), then a bounded TakeOrdered top-10. Element
  *    values are micro-quantized (FLOAT ×1000, floor — single-precision
  *    product, matching both engines' native arithmetic) so every
  *    distance is integer-exact. PQ is the memory story that makes
  *    billion-vector ANN fit: 64 floats → 8 codes per vector; the scan
  *    reads codes, not vectors.
  *  - q254: trigram substring index; q255: ORC round-trip gate.
  */
object StorageQueries {

  /** q254's search pattern and its distinct character trigrams — shared
    * by the Spark plan and the oracle SQL so both intersect the same
    * posting lists. */
  private val TriPattern = "scan slow fast"
  private val triSet: Seq[String] =
    TriPattern.sliding(3).toSeq.distinct.sorted

  /** A second snapshot of the documents table with a planted change
    * schedule — the "yesterday vs today" pair every lakehouse diff runs
    * against. Removal wins over change when a doc_id matches both rules;
    * added docs carry ids above every v1 key. */
  private[graft] def docsV2Fixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "docs_v2")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      val v1 = T.documents(s, d)
      val kept = v1.where(col("doc_id") % 17 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      val added = v1.where(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L))
      kept.unionByName(added).write.mode("overwrite").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Snapshot diff — the table-lifecycle audit between two versions of
    // a lake table (the engine analog of the reference's
    // drop-and-replace load surface, sources/worker/worker.js:324
    // `sequelize.sync({force: true})`: what actually CHANGED between
    // loads): a doc_id-keyed full outer
    // join of content fingerprints classifies every key as
    // added/removed/changed/unchanged, aggregated to one bounded status
    // account. Scale shape: both sides reduce to (key, md5) IN the scan
    // projection — text never crosses an exchange — and the join is
    // co-partitioned on the table key; output is 4 rows.
    "q263_snapshot_diff" -> ((s, d) => {
      val v1 = T.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h1"),
          col("n_chars").as("c1"))
      val v2 = s.read.parquet(docsV2Fixture(s, d))
        .select(col("doc_id"), md5(col("text")).as("h2"),
          length(col("text")).cast("long").as("c2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("c1")).as("n_chars_v1"),
          sum(col("c2")).as("n_chars_v2"))
        .orderBy(col("status"))
    }),

    // Zone-map skipping, insertion layout vs clustered layout: per-block
    // min/max(n_chars) + the range predicate n_chars BETWEEN 200 AND 260.
    // Insertion blocks = 50 docs by doc_id order (row groups as written);
    // clustered blocks = equal-width n_chars ranges (what sort-on-write /
    // range-partitioning produces). A block is scanned iff its [mn, mx]
    // overlaps the predicate. The side-by-side is THE sort-on-write
    // justification: on random insertion order every block straddles the
    // predicate (skip ≈ 0); on the clustered layout only the blocks whose
    // value range intersects it survive. Scale shape: both zone maps are
    // map-side-combined groupBys over |corpus|/50-ish block rows; the
    // global [lo, hi] span joins in as a broadcast 1-row aggregate.
    "q241_zonemap_prune" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"), col("n_chars"))
      def zoneAgg(blocked: DataFrame, pre: String): DataFrame =
        blocked.groupBy(col("bid"))
          .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
            count(lit(1)).as("rws"))
          .agg(count(lit(1)).as(s"${pre}_blocks"),
            sum(when(col("mx") >= 200 && col("mn") <= 260, 1L)
              .otherwise(0L)).as(s"${pre}_scanned"),
            sum(when(col("mx") >= 200 && col("mn") <= 260, col("rws"))
              .otherwise(0L)).as(s"${pre}_rows_scanned"))
      val ins = zoneAgg(
        docs.withColumn("bid", expr("doc_id div 50")), "ins")
      val bounds = docs.agg(min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      val srt = zoneAgg(
        docs.crossJoin(broadcast(bounds))
          .withColumn("bid",
            expr("(n_chars - lo) div ((hi - lo + 10) div 10)")),
        "srt")
      val e = docs.agg(count(lit(1)).as("rows_total"),
        sum(when(col("n_chars").between(200, 260), 1L).otherwise(0L))
          .as("rows_matching"))
      ins.crossJoin(srt).crossJoin(e).select(
        col("ins_blocks"), col("ins_scanned"), col("srt_blocks"),
        col("srt_scanned"), col("rows_total"), col("rows_matching"),
        col("ins_rows_scanned"), col("srt_rows_scanned"),
        expr("(1000 * (ins_blocks - ins_scanned)) div ins_blocks")
          .as("ins_skip_permille"),
        expr("(1000 * (srt_blocks - srt_scanned)) div srt_blocks")
          .as("srt_skip_permille"))
    }),

    // Compaction planning: files = lineitem in 16-order chunks (fid),
    // synthetic-but-deterministic byte sizes, then AQE's adjacent
    // coalesce: global running sum over fid order, bin = floor(prefix /
    // 16 MB). Two-pass prefix sum (q150's value-derived buckets +
    // broadcast offsets) — never a single-partition window.
    "q242_compaction_plan" -> ((s, d) => {
      val target = 16000000L
      val nb = 8
      val files = T.lineitem(s, d)
        .groupBy(expr("l_orderkey div 16").as("fid"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT) * 91 + 137"))
          .as("bytes"))
      val bounds = files.agg(min(col("fid")), max(col("fid"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val chunk = math.max(1L, (hi - lo + nb) / nb)
      val parts = files
        .withColumn("pid", expr(s"(fid - $lo) div $chunk"))
        .repartition(nb, col("pid"))
      val offsets = parts.groupBy(col("pid"))
        .agg(sum(col("bytes")).as("psum"))
        .withColumn("offset",
          coalesce(sum(col("psum")).over(
            Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid"), col("offset"))
      val byFile = Window.partitionBy(col("pid")).orderBy(col("fid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val binned = parts.join(broadcast(offsets), "pid")
        .withColumn("cum", col("offset") + sum(col("bytes")).over(byFile))
        .withColumn("bin", expr(s"(cum - bytes) div $target"))
      val bins = binned.groupBy(col("bin"))
        .agg(sum(col("bytes")).as("bin_bytes"))
      val a = binned.agg(
        count(lit(1)).as("n_files"),
        sum(col("bytes")).as("total_bytes"),
        sum(when(col("bytes") < 1600000L, 1L).otherwise(0L))
          .as("n_small_before"))
      val b = bins.agg(
        count(lit(1)).as("n_bins"),
        max(col("bin_bytes")).as("max_bin_bytes"),
        sum(when(col("bin_bytes") < 1600000L, 1L).otherwise(0L))
          .as("n_small_after"))
      a.crossJoin(b).select(
        col("n_files"), col("n_bins"), col("total_bytes"),
        col("max_bin_bytes"), col("n_small_before"), col("n_small_after"),
        expr(s"(1000 * total_bytes) div (n_bins * $target)")
          .as("fill_permille"))
    }),

    // Dictionary-encoding audit over the four low-cardinality string
    // columns: encoded = rows × code-width + dictionary payload, plain =
    // 8 bits/char. Each column is one vocabulary-bounded groupBy
    // collapsing to a single row; the union is 4 rows.
    "q243_dictionary_audit" -> ((s, d) => {
      def audit(df: DataFrame, c: String): DataFrame =
        df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_distinct"),
            sum(col("cnt") * length(col("v"))).as("n_chars"),
            sum(length(col("v"))).as("dict_chars"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_distinct"),
            length(bin(col("n_distinct"))).cast("long").as("code_bits"),
            (col("n_rows") * length(bin(col("n_distinct"))).cast("long")
              + col("dict_chars") * 8L).as("encoded_bits"),
            (col("n_chars") * 8L).as("plain_bits"))
      val li = T.lineitem(s, d)
      val o = T.orders(s, d)
      audit(li, "l_returnflag")
        .unionByName(audit(li, "l_linestatus"))
        .unionByName(audit(o, "o_orderstatus"))
        .unionByName(audit(o, "o_orderpriority"))
        .select(col("col_name"), col("n_rows"), col("n_distinct"),
          col("code_bits"), col("encoded_bits"), col("plain_bits"),
          expr("(1000 * encoded_bits) div plain_bits")
            .as("ratio_permille"))
        .orderBy(col("col_name"))
    }),

    // ORC round-trip: the corpus written to ORC (fixture, once per sf)
    // and read back must aggregate byte-identically to the parquet the
    // oracle reads — content checksum included, so any encoding loss,
    // string mangling, or row drop in the second columnar format fails
    // the hash gate. The engine's source surface is format-plural; this
    // gates it.
    "q255_orc_roundtrip" -> ((s, d) => {
      val out = graft.Scratch.fixtureDir(d, "docs_orc")
      if (!new java.io.File(s"$out/_SUCCESS").exists()) {
        T.documents(s, d).write.mode("overwrite").orc(out)
      }
      // per-row digests reduce mod 1e6 before the sum: a raw 48-bit
      // term would overflow the int64 sum (ANSI-mode crash) at ~65k
      // rows; the bounded term keeps the exact sum good past 9e12 rows
      s.read.orc(out).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        count_distinct(col("lang")).as("n_langs"),
        sum(expr("CAST(conv(substring(md5(concat_ws('|', " +
          "CAST(doc_id AS STRING), text, lang, source)), 1, 12), 16, 10)" +
          " AS BIGINT) % 1000000")).as("content_crc"))
    }),

    // Trigram substring index (the pg_trgm LIKE-acceleration shape): a
    // candidate doc must contain EVERY character trigram of the search
    // pattern, so the index answers '%scan slow fast%' by intersecting
    // its 12 posting lists and only the survivors pay the exact contains()
    // verify. Scale shape: exactly q211's term-filter discipline — the
    // per-doc trigram stream filters to the pattern's trigrams BEFORE
    // any shuffle (the groupBy sees ≤ |pattern| rows per doc), postings
    // intersection is a count(distinct)=k having clause, and the verify
    // touches candidates only. The reduction/precision permilles price
    // the index against the full scan it replaces.
    "q254_trigram_index" -> ((s, d) => {
      val pattern = TriPattern
      val tris = triSet
      val docs = T.documents(s, d)
        .select(col("doc_id"), lower(col("text")).as("t"))
      val cand = docs
        .select(col("doc_id"),
          explode(when(length(col("t")) >= 3,
            expr("transform(sequence(3, length(t)), i -> " +
              "substring(t, i - 2, 3))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("tri"))
        .where(col("tri").isin(tris: _*))
        .select(col("doc_id"), col("tri")).distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
        .where(col("nt") === tris.length)
        .select(col("doc_id"))
      val verified = cand.join(docs, "doc_id")
        .where(col("t").contains(pattern))
        .select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val nc = cand.agg(count(lit(1)).as("n_candidates"))
      val nv = verified.agg(count(lit(1)).as("n_verified"))
      n.crossJoin(nc).crossJoin(nv).select(
        lit(tris.length.toLong).as("n_pattern_trigrams"),
        col("n_docs"), col("n_candidates"), col("n_verified"),
        expr("(1000 * (n_docs - n_candidates)) div n_docs")
          .as("scan_saved_permille"),
        expr("(1000 * n_verified) div n_candidates")
          .as("precision_permille"))
    }),

    // Product quantization: micro-quantize every element (×1000, floor →
    // BIGINT), codebook per 8-dim sub-space = the sub-vectors of vec_id
    // 0..15 (deterministic seeds, the q212/q91 convention), encode each
    // vector to 8 codes by per-sub-space squared-L2 argmin (ties → lowest
    // centroid id), ADC estimate vs query vec_id 20 = Σ per-sub-space
    // table distance, exact = full squared L2. Retrieval ground truth is
    // PLANTED (the q63/q186 schedule pattern — the raw embeddings are
    // near-random, so every true distance concentrates around the mean
    // and no quantizer could rank them): vec_id % 50 == 30 rows become
    // the query vector perturbed on one coordinate by 1 + vec_id/50, so
    // their exact distances ((1+vec_id/50)²) sit 4 orders of magnitude
    // below the ~2e6 background and PQ MUST surface them. The scan is
    // ONE per-row projection: seeds + query are a bounded documented
    // collect (17 rows) shipped into the PqAdc kernel as reference
    // objects, codes come from the kernel's strict-< argmin loop
    // (first win = lowest centroid id, the oracle's MIN(cid)
    // tie-break), and the only wide op is the bounded TakeOrdered(10).
    // At a billion vectors this plan reads 8 bytes of codes per vector
    // where brute force reads 256 bytes of floats — the PQ memory
    // story.
    "q250_pq_ann" -> ((s, d) => {
      val emb = T.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT))")
            .as("ev"))
      // Bounded collect: 16 seed codebook vectors + 1 query vector (none
      // of which are planted ids).
      def arrLit(a: Seq[Long]): String =
        a.mkString("array(", "L, ", "L)")
      val cents = emb.where(col("vec_id") <= 15).orderBy(col("vec_id"))
        .collect().map(_.getSeq[Long](1))
      val qv = emb.where(col("vec_id") === 20).head().getSeq[Long](1)
      val qLit = arrLit(qv)
      // est = Σ_s qd[s][code_s]: the 8×16 query→centroid sub-distances
      // are precomputed constants shipped into the PqAdc kernel.
      val qd: Array[Array[Long]] = (0 until 8).map { sp =>
        cents.map { cv =>
          (0 until 8).map { j =>
            val dd = qv(8 * sp + j) - cv(8 * sp + j)
            dd * dd
          }.sum
        }.toArray
      }.toArray
      val centsArr = cents.map(_.toArray)
      val qvArr = qv.toArray
      // quantize + codes + ADC estimate + exact distance in ONE
      // codegen'd kernel (graft.functions.PqAdc/PqAdcF): the
      // column-algebra equivalent needs nested HOF lambdas, which
      // evaluate interpreted — the q231 MinHashShingles lesson applied
      // to the vector scan (HOF pipeline measured 10.5 s at the sf1
      // probe, kernel 6.3 s). The planted branch (1/50 rows) builds its
      // integer array column-side and takes the long-input kernel; the
      // hot path reads raw floats straight off the parquet scan.
      T.embeddings(s, d).select(col("vec_id"), col("embedding"))
        .where(col("vec_id") > 15 && col("vec_id") =!= 20)
        .withColumn("adc",
          when(col("vec_id") % 50 === 30,
            graft.functions.PqAdc(
              expr(s"transform(sequence(1, 64), j -> " +
                s"element_at($qLit, j) + " +
                s"CASE WHEN j = 1 + ((vec_id div 50) % 64) " +
                s"THEN 1 + vec_id div 50 ELSE 0L END)"),
              centsArr, qvArr, qd))
            .otherwise(graft.functions.PqAdcF(col("embedding"),
              centsArr, qvArr, qd)))
        .select(col("vec_id"), col("adc.est").as("est_dist"),
          col("adc.exact").as("exact_dist"))
        .orderBy(col("est_dist"), col("vec_id")).limit(10)
    })
  )

  def oracleSql: Map[String, String] = Map(

    // v2 reconstructed virtually from the same planted rules
    "q263_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS h1, n_chars AS c1 FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
        |      ELSE text END) AS h2,
        |    CAST(length(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
        |      ELSE text END) AS BIGINT) AS c2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000, md5(text),
        |    CAST(length(text) AS BIGINT)
        |  FROM documents WHERE doc_id % 13 = 0),
        |j AS (
        |  SELECT CASE WHEN h1 IS NULL THEN 'added'
        |    WHEN h2 IS NULL THEN 'removed'
        |    WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END AS status,
        |    COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
        |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT status, COUNT(*) AS n_docs,
        |  CAST(SUM(c1) AS BIGINT) AS n_chars_v1,
        |  CAST(SUM(c2) AS BIGINT) AS n_chars_v2
        |FROM j GROUP BY status ORDER BY status""".stripMargin,

    "q241_zonemap_prune" ->
      """WITH bounds AS (
        |  SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents),
        |zi AS (
        |  SELECT doc_id // 50 AS bid, MIN(n_chars) AS mn,
        |    MAX(n_chars) AS mx, COUNT(*) AS rws
        |  FROM documents GROUP BY 1),
        |zs AS (
        |  SELECT (n_chars - lo) // ((hi - lo + 10) // 10) AS bid,
        |    MIN(n_chars) AS mn, MAX(n_chars) AS mx, COUNT(*) AS rws
        |  FROM documents, bounds GROUP BY 1),
        |ai AS (
        |  SELECT COUNT(*) AS ins_blocks,
        |    CAST(SUM(CASE WHEN mx >= 200 AND mn <= 260 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ins_scanned,
        |    CAST(SUM(CASE WHEN mx >= 200 AND mn <= 260 THEN rws ELSE 0 END)
        |      AS BIGINT) AS ins_rows_scanned
        |  FROM zi),
        |as_ AS (
        |  SELECT COUNT(*) AS srt_blocks,
        |    CAST(SUM(CASE WHEN mx >= 200 AND mn <= 260 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS srt_scanned,
        |    CAST(SUM(CASE WHEN mx >= 200 AND mn <= 260 THEN rws ELSE 0 END)
        |      AS BIGINT) AS srt_rows_scanned
        |  FROM zs),
        |e AS (
        |  SELECT COUNT(*) AS rows_total,
        |    CAST(SUM(CASE WHEN n_chars BETWEEN 200 AND 260 THEN 1 ELSE 0
        |      END) AS BIGINT) AS rows_matching
        |  FROM documents)
        |SELECT ins_blocks, ins_scanned, srt_blocks, srt_scanned,
        |  rows_total, rows_matching, ins_rows_scanned, srt_rows_scanned,
        |  CAST((1000 * (ins_blocks - ins_scanned)) // ins_blocks AS BIGINT)
        |    AS ins_skip_permille,
        |  CAST((1000 * (srt_blocks - srt_scanned)) // srt_blocks AS BIGINT)
        |    AS srt_skip_permille
        |FROM ai, as_, e""".stripMargin,

    "q242_compaction_plan" ->
      """WITH f AS (
        |  SELECT l_orderkey // 16 AS fid,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * 91 + 137) AS BIGINT)
        |      AS bytes
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT fid, bytes,
        |    CAST(SUM(bytes) OVER (ORDER BY fid ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM f),
        |b AS (
        |  SELECT CAST((cum - bytes) // 16000000 AS BIGINT) AS bin,
        |    bytes FROM c),
        |bins AS (
        |  SELECT bin, CAST(SUM(bytes) AS BIGINT) AS bin_bytes
        |  FROM b GROUP BY 1),
        |a AS (
        |  SELECT COUNT(*) AS n_files, CAST(SUM(bytes) AS BIGINT)
        |      AS total_bytes,
        |    CAST(SUM(CASE WHEN bytes < 1600000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_small_before
        |  FROM f),
        |g AS (
        |  SELECT COUNT(*) AS n_bins, MAX(bin_bytes) AS max_bin_bytes,
        |    CAST(SUM(CASE WHEN bin_bytes < 1600000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_small_after
        |  FROM bins)
        |SELECT n_files, n_bins, total_bytes, max_bin_bytes,
        |  n_small_before, n_small_after,
        |  CAST((1000 * total_bytes) // (n_bins * 16000000) AS BIGINT)
        |    AS fill_permille
        |FROM a, g""".stripMargin,

    "q243_dictionary_audit" ->
      """WITH u AS (
        |  SELECT 'l_returnflag' AS col_name, l_returnflag AS v
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders),
        |g AS (
        |  SELECT col_name, v, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
        |a AS (
        |  SELECT col_name, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    COUNT(*) AS n_distinct,
        |    CAST(SUM(cnt * length(v)) AS BIGINT) AS n_chars,
        |    CAST(SUM(length(v)) AS BIGINT) AS dict_chars
        |  FROM g GROUP BY 1)
        |SELECT col_name, n_rows, n_distinct,
        |  CAST(length(bin(n_distinct)) AS BIGINT) AS code_bits,
        |  n_rows * CAST(length(bin(n_distinct)) AS BIGINT) + dict_chars * 8
        |    AS encoded_bits,
        |  n_chars * 8 AS plain_bits,
        |  CAST((1000 * (n_rows * CAST(length(bin(n_distinct)) AS BIGINT)
        |    + dict_chars * 8)) // (n_chars * 8) AS BIGINT)
        |    AS ratio_permille
        |FROM a ORDER BY col_name""".stripMargin,

    // the oracle reads the PARQUET corpus — ORC must round-trip to the
    // identical aggregate, checksum included
    "q255_orc_roundtrip" ->
      """SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(CAST('0x' || substr(md5(
        |    CAST(doc_id AS VARCHAR) || '|' || text || '|' || lang || '|'
        |    || source), 1, 12) AS BIGINT) % 1000000) AS BIGINT)
        |    AS content_crc
        |FROM documents""".stripMargin,

    "q254_trigram_index" -> {
      val triIn = triSet.map(t => s"'$t'").mkString("(", ", ", ")")
      s"""WITH docs AS (
        |  SELECT doc_id, lower(text) AS t FROM documents),
        |tri AS (
        |  SELECT DISTINCT doc_id, substr(t, i - 2, 3) AS tri
        |  FROM docs, unnest(range(3, length(t) + 1)) AS u(i)
        |  WHERE substr(t, i - 2, 3) IN $triIn),
        |cand AS (
        |  SELECT doc_id FROM tri GROUP BY 1
        |  HAVING COUNT(*) = ${triSet.length}),
        |ver AS (
        |  SELECT c.doc_id FROM cand c JOIN docs d ON c.doc_id = d.doc_id
        |  WHERE contains(d.t, '$TriPattern')),
        |n AS (SELECT COUNT(*) AS n_docs FROM docs),
        |nc AS (SELECT COUNT(*) AS n_candidates FROM cand),
        |nv AS (SELECT COUNT(*) AS n_verified FROM ver)
        |SELECT CAST(${triSet.length} AS BIGINT) AS n_pattern_trigrams,
        |  n_docs, n_candidates, n_verified,
        |  CAST((1000 * (n_docs - n_candidates)) // n_docs AS BIGINT)
        |    AS scan_saved_permille,
        |  CAST((1000 * n_verified) // n_candidates AS BIGINT)
        |    AS precision_permille
        |FROM n, nc, nv""".stripMargin
    },

    "q250_pq_ann" ->
      """WITH quant AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(floor(x * 1000) AS BIGINT)) AS ev
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cid, ev FROM quant WHERE vec_id <= 15),
        |q AS (SELECT ev AS qv FROM quant WHERE vec_id = 20),
        |base AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 50 = 30 THEN
        |      list_transform(range(1, 65), j -> q.qv[j] +
        |        CASE WHEN j = 1 + ((vec_id // 50) % 64)
        |        THEN 1 + vec_id // 50 ELSE 0 END)
        |    ELSE ev END AS ev
        |  FROM quant, q
        |  WHERE vec_id > 15 AND vec_id <> 20),
        |sub AS (
        |  SELECT b.vec_id, s.s, c.cid,
        |    CAST(list_sum(list_transform(range(1, 9), j ->
        |      (b.ev[8 * s.s + j] - c.ev[8 * s.s + j])
        |      * (b.ev[8 * s.s + j] - c.ev[8 * s.s + j]))) AS BIGINT)
        |      AS dist
        |  FROM base b, (SELECT unnest(range(0, 8)) AS s) s, cents c),
        |dmin AS (
        |  SELECT vec_id, s, MIN(dist) AS md FROM sub GROUP BY 1, 2),
        |codes AS (
        |  SELECT sub.vec_id, sub.s, MIN(sub.cid) AS code
        |  FROM sub JOIN dmin ON sub.vec_id = dmin.vec_id
        |    AND sub.s = dmin.s AND sub.dist = dmin.md
        |  GROUP BY 1, 2),
        |qd AS (
        |  SELECT s.s, c.cid,
        |    CAST(list_sum(list_transform(range(1, 9), j ->
        |      (q.qv[8 * s.s + j] - c.ev[8 * s.s + j])
        |      * (q.qv[8 * s.s + j] - c.ev[8 * s.s + j]))) AS BIGINT)
        |      AS qdist
        |  FROM q, (SELECT unnest(range(0, 8)) AS s) s, cents c),
        |est AS (
        |  SELECT codes.vec_id, CAST(SUM(qd.qdist) AS BIGINT) AS est_dist
        |  FROM codes JOIN qd ON codes.s = qd.s AND codes.code = qd.cid
        |  GROUP BY 1),
        |ex AS (
        |  SELECT b.vec_id,
        |    CAST(list_sum(list_transform(range(1, 65), j ->
        |      (b.ev[j] - q.qv[j]) * (b.ev[j] - q.qv[j]))) AS BIGINT)
        |      AS exact_dist
        |  FROM base b, q)
        |SELECT est.vec_id, est.est_dist, ex.exact_dist
        |FROM est JOIN ex ON est.vec_id = ex.vec_id
        |ORDER BY est.est_dist, est.vec_id LIMIT 10""".stripMargin
  )
}

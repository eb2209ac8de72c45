package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus curation layer — the crawl-specific operators between raw
  * HTML/WARC ingestion and the language-agnostic pipeline (Quality/Pipeline/
  * Corpus queries). The reference ingests structured logs; a pretraining
  * crawl adds exactly these:
  *
  *  - q244: line-level exact dedup (the CCNet paragraph dedup: hash each
  *    10-word block, count across the corpus, drop repeated blocks). The
  *    sub-document granularity between q29 (whole-doc) and q178/q195
  *    (character spans).
  *  - q245: URL canonicalization + dedup — strip tracking query params,
  *    lowercase the host, fold www.; the crawl-frontier dedup that runs
  *    BEFORE any content is fetched. Planted on a deterministic schedule
  *    (the corpus has no URL column) so canonical collisions are real.
  *  - q246: encoding-health census — mojibake (double-encoded UTF-8)
  *    detection and ASCII-ratio per source, with deterministic planted
  *    corruption (q63's planting pattern).
  *  - q247: sliding-window RAG chunking — fixed 64-token windows, stride
  *    48, per-chunk provenance hash; the overlap/tail accounting that
  *    dimensions a retrieval index build.
  *  - q248: source-affinity matrix — exact 3-gram shingle-set Jaccard
  *    between sources (the corpus-level counterpart of q30's per-doc
  *    near-dup; q226 counts shared dup GROUPS, this measures shared
  *    VOCABULARY). Gram streams collapse to distinct (source, gram)
  *    rows, pairs expand from per-gram sorted source sets (≤|sources|²).
  *  - q249: Bloom-filter decontamination — the broadcast-bitset variant
  *    of q62's benchmark-overlap join: build a k=2 filter SIZED to the
  *    benchmark (m = 16 bits/member — the sf1 probe measured a fixed-m
  *    filter saturating at 10× data) over the benchmark 5-grams, probe
  *    every corpus gram, and MEASURE the false-positive cost against
  *    the exact join. At 100 TB the filter (|bench|·2 bytes) broadcasts
  *    where the benchmark join would shuffle; the fp rate is the price,
  *    and this query prices it.
  *
  * Same engine-parity conventions as the rest of the board: permille
  * integers, md5-derived hashes via conv/'0x' casts, planted schedules
  * replayed identically in the oracle SQL.
  */
object WebCurationQueries {

  /** q25's tokenization convention (single-space split of trimmed lower). */
  private def words: org.apache.spark.sql.Column =
    split(trim(lower(col("text"))), " ")

  /** q245/q253's planted URL (path bucket doc_id % 40 per source ⇒ real
    * canonical collisions). The lang param only exists when the frame
    * carries it; it lives in the stripped query string either way, so
    * both variants canonicalize identically — ONE definition so the
    * streaming frontier can never drift from the batch account. */
  private[operators] def plantedUrl(withLang: Boolean)
      : org.apache.spark.sql.Column = {
    val base = concat(lit("https://WWW."), col("source"),
      lit(".Example.COM/p/"), (col("doc_id") % 40).cast("string"),
      lit("?utm_source=feed&sid="), col("doc_id").cast("string"))
    if (withLang) concat(base, lit("&lang="), col("lang")) else base
  }

  /** Canonical form: query string stripped, lowercased, www. folded. */
  private[operators] def canonicalize(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    regexp_replace(
      lower(regexp_replace(url, "\\?.*$", "")),
      "^https://www\\.", "https://")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CCNet-style line dedup at 10-word-block granularity: block key =
    // md5 of the joined block, counts across the corpus, keep-one
    // accounting. Scale shape: the block stream shuffles (key, doc_id)
    // pairs only; the dup-key set joins back as a semi join keyed on the
    // block hash; stats are one map-side-combined aggregate over the
    // key counts.
    "q244_line_dedup" -> ((s, d) => {
      val blocks = T.documents(s, d)
        .select(col("doc_id"), words.as("ws"))
        .select(col("doc_id"),
          explode(when(size(col("ws")) >= 10,
            expr("transform(sequence(0, size(ws) div 10 - 1), i -> " +
              "md5(concat_ws(' ', slice(ws, 10 * i + 1, 10))))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("k"))
      val g = blocks.groupBy(col("k")).agg(count(lit(1)).as("c"))
      val stats = g.agg(
        sum(col("c")).as("n_blocks"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L))
          .as("n_dup_occurrences"))
      val hit = blocks
        .join(g.where(col("c") >= 2).select(col("k")), Seq("k"),
          "left_semi")
        .agg(count_distinct(col("doc_id")).as("n_docs_hit"))
      stats.crossJoin(hit).select(
        col("n_blocks"), col("n_distinct"), col("n_dup_occurrences"),
        col("n_docs_hit"),
        expr("(1000 * (n_blocks - n_distinct)) div n_blocks")
          .as("drop_permille"))
    }),

    // URL canonicalization: planted URLs (path bucket doc_id % 40 per
    // source ⇒ real collisions), canonical form = query string stripped,
    // lowercased, www. folded. One projection + one groupBy on the
    // canonical key.
    "q245_url_canon" -> ((s, d) => {
      val canon = T.documents(s, d)
        .select(plantedUrl(withLang = true).as("url"))
        .select(col("url"), canonicalize(col("url")).as("cu"))
      val g = canon.groupBy(col("cu")).agg(count(lit(1)).as("c"))
      g.agg(
        sum(col("c")).as("n_urls"),
        count(lit(1)).as("n_canonical"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L))
          .as("n_colliding_urls"),
        max(col("c")).as("max_group"))
        .select(col("n_urls"), col("n_canonical"),
          col("n_colliding_urls"), col("max_group"),
          expr("(1000 * (n_urls - n_canonical)) div n_urls")
            .as("frontier_saved_permille"))
    }),

    // Encoding-health census: deterministic mojibake planting (every
    // 7th doc gets 'a' → 'Ã©', the classic UTF-8-read-as-Latin-1 pair),
    // detector = 'Ã' occurrence count + printable-ASCII check. One
    // projection + a |sources|-row groupBy.
    "q246_mojibake" -> ((s, d) => {
      val planted = T.documents(s, d).select(
        col("source"),
        when(col("doc_id") % 7 === 0,
          regexp_replace(col("text"), "a", "Ã©"))
          .otherwise(col("text")).as("t"))
      planted.select(
        col("source"),
        (length(col("t")) - length(regexp_replace(col("t"), "Ã", "")))
          .as("moji"),
        when(col("t").rlike("^[ -~]*$"), 1L).otherwise(0L).as("ascii"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("moji") > 0, 1L).otherwise(0L)).as("n_flagged"),
          sum(col("moji")).as("moji_chars"),
          sum(col("ascii")).as("n_ascii_docs"))
        .select(col("source"), col("n_docs"), col("n_flagged"),
          col("moji_chars"), col("n_ascii_docs"),
          expr("(1000 * n_flagged) div n_docs").as("flagged_permille"))
        .orderBy(col("source"))
    }),

    // RAG chunking: 64-token windows at stride 48 (full windows + the
    // short-doc singleton), per-chunk md5 provenance. The explode feeds
    // straight into one map-side-combined global aggregate — the token
    // arrays never shuffle.
    "q247_rag_chunks" -> ((s, d) => {
      val docs = T.documents(s, d)
        .select(col("doc_id"), words.as("ws"))
        .select(col("doc_id"), col("ws"), size(col("ws")).as("nw"))
      val chunks = docs.select(
        col("doc_id"), col("ws"), col("nw"),
        explode(expr(
          "sequence(1, greatest(1, nw - 63), 48)")).as("st"))
        .select(col("nw"),
          least(lit(64), col("nw") - col("st") + 1).as("ct"),
          // mod 1e6 per chunk BEFORE the sum: raw 48-bit terms overflow
          // the int64 checksum sum (ANSI crash) at ~65k chunks
          expr("CAST(conv(substring(md5(concat_ws(' ', " +
            "slice(ws, st, 64))), 1, 12), 16, 10) AS BIGINT) % 1000000")
            .as("h"))
      // last emitted window start is stride-quantized: 1 + 48·⌊(stop−1)/48⌋
      val perDoc = docs.select(col("nw"),
        least(col("nw"),
          expr("1 + 48 * ((greatest(1, nw - 63) - 1) div 48) + 63"))
          .as("covered"))
      val a = chunks.agg(
        count(lit(1)).as("n_chunks"),
        sum(col("ct")).as("chunk_tokens"),
        sum(col("h")).as("chunk_checksum"))
      val b = perDoc.agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw")).as("total_tokens"),
        sum(col("covered")).as("covered_tokens"))
      a.crossJoin(b).select(
        col("n_docs"), col("n_chunks"), col("total_tokens"),
        col("chunk_tokens"), col("covered_tokens"),
        (col("chunk_tokens") - col("covered_tokens")).as("overlap_tokens"),
        (col("total_tokens") - col("covered_tokens")).as("tail_tokens"),
        col("chunk_checksum"))
    }),

    // Source-affinity matrix: exact 3-gram shingle-set Jaccard per source
    // pair. Distinct (source, gram) first (the only corpus-sized shuffle,
    // id-width rows); per-gram sorted source sets expand to ≤ C(20,2)
    // pair keys; sizes broadcast back in.
    "q248_source_affinity" -> ((s, d) => {
      val grams = T.documents(s, d)
        .select(col("source"), words.as("ws"))
        .select(col("source"),
          explode(when(size(col("ws")) >= 3,
            expr("transform(sequence(3, size(ws)), i -> " +
              "concat_ws(' ', slice(ws, i - 2, 3)))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("g"))
        .distinct()
      val sizes = grams.groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val pairs = grams.groupBy(col("g"))
        .agg(array_sort(collect_set(col("source"))).as("ss"))
        .where(size(col("ss")) >= 2)
        .select(explode(
          CorpusQueries.sortedPairs("ss", "sa", "sb")).as("p"))
        .groupBy(col("p.sa").as("src_a"), col("p.sb").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(broadcast(sizes.withColumnRenamed("source", "src_a")
          .withColumnRenamed("n", "na")), "src_a")
        .join(broadcast(sizes.withColumnRenamed("source", "src_b")
          .withColumnRenamed("n", "nb")), "src_b")
        .select(col("src_a"), col("src_b"), col("inter"), col("na"),
          col("nb"),
          expr("(1000 * inter) div (na + nb - inter)")
            .as("jaccard_permille"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // URL-frontier dedup INSIDE the streaming engine (q245's canonical
    // key + the q210/q221/q229 trigger mechanics): each micro-batch
    // reduces to its own (canonical, n) count delta — O(batch) work —
    // persisted under its batch_id with dynamic overwrite so replays
    // rewrite, never double-count; the merged deltas must equal the
    // one-shot batch frontier account bit for bit (the oracle IS q245's).
    // This is the crawl-frontier contract: the frontier state is a
    // mergeable count table, arrival order never matters.
    "q253_stream_frontier" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      val src = CorpusQueries.docsSourceSplitFixture(s, d)
      val base = graft.Scratch.runDir("graft_frontier")
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          // the fixture carries (doc_id, text, source); the lang param
          // lives in the stripped query string, so the lang-free URL
          // canonicalizes identically (shared plantedUrl/canonicalize)
          batch.select(
              canonicalize(plantedUrl(withLang = false)).as("cu"))
            .groupBy(col("cu")).agg(count(lit(1)).as("n"))
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/delta")
          ()
        }
        .start()
      q.awaitTermination()
      val g = s.read.parquet(s"$base/delta")
        .groupBy(col("cu")).agg(sum(col("n")).as("c"))
      g.agg(
        sum(col("c")).as("n_urls"),
        count(lit(1)).as("n_canonical"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L))
          .as("n_colliding_urls"),
        max(col("c")).as("max_group"))
        .select(col("n_urls"), col("n_canonical"),
          col("n_colliding_urls"), col("max_group"),
          expr("(1000 * (n_urls - n_canonical)) div n_urls")
            .as("frontier_saved_permille"))
    }),

    // Bloom decontamination: k=2 hashes from ONE md5 per gram (double
    // hashing: hex digits 1-12 and 13-24 of the same digest) over the
    // benchmark
    // (source src0) 5-gram set, filter SIZED TO THE BENCHMARK — m = 16
    // bits per member (the sf1 probe measured the fixed-m variant
    // saturating at 10× data: every bit set, every gram flagged, 18×
    // wall). Probe = two semi joins against the broadcast bit set;
    // priced against the exact gram join. At scale the bit set is a
    // |bench|/4-byte broadcast where the exact join shuffles the corpus
    // gram stream — the whole point.
    "q249_bloom_decontaminate" -> ((s, d) => {
      def grams(df: DataFrame): DataFrame = df
        .select(col("doc_id"), words.as("ws"))
        .select(col("doc_id"),
          explode(when(size(col("ws")) >= 5,
            expr("transform(sequence(5, size(ws)), i -> " +
              "concat_ws(' ', slice(ws, i - 4, 5)))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("g"))
        .distinct()
      val docs = T.documents(s, d)
      val bench = grams(docs.where(col("source") === "src0"))
        .select(col("g")).distinct()
      // bounded collect: one scalar — the benchmark cardinality sizes m
      val m = 16L * bench.count()
      val bits = bench
        .select(explode(array(
          expr("CAST(conv(substring(md5(g), 1, 12), 16, " +
            s"10) AS BIGINT) % $m"),
          expr("CAST(conv(substring(md5(g), 13, 12), 16, " +
            s"10) AS BIGINT) % $m"))).as("b"))
        .distinct()
      val corpus = grams(docs.where(col("source") =!= "src0"))
        .withColumn("h1",
          expr("CAST(conv(substring(md5(g), 1, 12), 16, " +
            s"10) AS BIGINT) % $m"))
        .withColumn("h2",
          expr("CAST(conv(substring(md5(g), 13, 12), 16, " +
            s"10) AS BIGINT) % $m"))
      val flagged = corpus
        .join(broadcast(bits.withColumnRenamed("b", "h1")), Seq("h1"),
          "left_semi")
        .join(broadcast(bits.withColumnRenamed("b", "h2")), Seq("h2"),
          "left_semi")
        .select(col("doc_id")).distinct()
      val truly = corpus.join(bench, Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
      // the benchmark cardinality is already on the driver (it sized m)
      // — re-deriving it would pay a fourth scan/explode/distinct pass
      val nBench = docs.sparkSession.range(1)
        .select(lit(m / 16L).as("n_bench_grams"))
      val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
      val nCorpus = docs.where(col("source") =!= "src0")
        .agg(count_distinct(col("doc_id")).as("n_corpus_docs"))
      val joined = flagged.withColumn("f", lit(1L))
        .join(truly.withColumn("t", lit(1L)), Seq("doc_id"), "full_outer")
        .agg(
          sum(when(col("f").isNotNull, 1L).otherwise(0L))
            .as("n_flagged_docs"),
          sum(when(col("t").isNotNull, 1L).otherwise(0L))
            .as("n_true_docs"),
          sum(when(col("f").isNotNull && col("t").isNull, 1L)
            .otherwise(0L)).as("n_fp_docs"))
      nBench.crossJoin(nBits).crossJoin(nCorpus).crossJoin(joined)
        .select(col("n_bench_grams"), col("n_bits_set"),
          col("n_corpus_docs"), col("n_flagged_docs"), col("n_true_docs"),
          col("n_fp_docs"),
          expr("(1000 * n_fp_docs) div (n_corpus_docs - n_true_docs)")
            .as("fp_permille"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q244_line_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    md5(array_to_string(ws[10 * i + 1:10 * i + 10], ' ')) AS k
        |  FROM w, unnest(range(0, len(ws) // 10)) AS t(i)),
        |g AS (SELECT k, COUNT(*) AS c FROM b GROUP BY 1),
        |stats AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n_blocks,
        |    COUNT(*) AS n_distinct,
        |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |      AS n_dup_occurrences
        |  FROM g),
        |hit AS (
        |  SELECT COUNT(DISTINCT b.doc_id) AS n_docs_hit
        |  FROM b JOIN g ON b.k = g.k WHERE g.c >= 2)
        |SELECT n_blocks, n_distinct, n_dup_occurrences, n_docs_hit,
        |  CAST((1000 * (n_blocks - n_distinct)) // n_blocks AS BIGINT)
        |    AS drop_permille
        |FROM stats, hit""".stripMargin,

    "q245_url_canon" ->
      """WITH u AS (
        |  SELECT 'https://WWW.' || source || '.Example.COM/p/' ||
        |    CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&sid=' ||
        |    CAST(doc_id AS VARCHAR) || '&lang=' || lang AS url
        |  FROM documents),
        |c AS (
        |  SELECT regexp_replace(
        |      lower(regexp_replace(url, '\?.*$', '')),
        |      '^https://www\.', 'https://') AS cu
        |  FROM u),
        |g AS (SELECT cu, COUNT(*) AS c FROM c GROUP BY 1)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_urls,
        |  COUNT(*) AS n_canonical,
        |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_colliding_urls,
        |  CAST(MAX(c) AS BIGINT) AS max_group,
        |  CAST((1000 * (SUM(c) - COUNT(*))) // SUM(c) AS BIGINT)
        |    AS frontier_saved_permille
        |FROM g""".stripMargin,

    // streaming must equal the one-shot batch frontier: q245's oracle
    "q253_stream_frontier" ->
      """WITH u AS (
        |  SELECT 'https://WWW.' || source || '.Example.COM/p/' ||
        |    CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&sid=' ||
        |    CAST(doc_id AS VARCHAR) || '&lang=' || lang AS url
        |  FROM documents),
        |c AS (
        |  SELECT regexp_replace(
        |      lower(regexp_replace(url, '\?.*$', '')),
        |      '^https://www\.', 'https://') AS cu
        |  FROM u),
        |g AS (SELECT cu, COUNT(*) AS c FROM c GROUP BY 1)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_urls,
        |  COUNT(*) AS n_canonical,
        |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_colliding_urls,
        |  CAST(MAX(c) AS BIGINT) AS max_group,
        |  CAST((1000 * (SUM(c) - COUNT(*))) // SUM(c) AS BIGINT)
        |    AS frontier_saved_permille
        |FROM g""".stripMargin,

    "q246_mojibake" ->
      """WITH p AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN regexp_replace(text, 'a', 'Ã©', 'g')
        |      ELSE text END AS t
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    length(t) - length(regexp_replace(t, 'Ã', '', 'g')) AS moji,
        |    CASE WHEN regexp_matches(t, '^[ -~]*$') THEN 1 ELSE 0 END
        |      AS ascii
        |  FROM p)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN moji > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(SUM(moji) AS BIGINT) AS moji_chars,
        |  CAST(SUM(ascii) AS BIGINT) AS n_ascii_docs,
        |  CAST((1000 * SUM(CASE WHEN moji > 0 THEN 1 ELSE 0 END))
        |    // COUNT(*) AS BIGINT) AS flagged_permille
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "q247_rag_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws,
        |    len(string_split(trim(lower(text)), ' ')) AS nw
        |  FROM documents),
        |ch AS (
        |  SELECT nw, least(64, nw - st + 1) AS ct,
        |    CAST('0x' || substr(md5(
        |      array_to_string(ws[st:st + 63], ' ')), 1, 12) AS BIGINT)
        |      % 1000000 AS h
        |  FROM w, unnest(generate_series(1, greatest(1, nw - 63), 48))
        |    AS t(st)),
        |a AS (
        |  SELECT COUNT(*) AS n_chunks, CAST(SUM(ct) AS BIGINT)
        |      AS chunk_tokens,
        |    CAST(SUM(h) AS BIGINT) AS chunk_checksum
        |  FROM ch),
        |b AS (
        |  SELECT COUNT(*) AS n_docs, CAST(SUM(nw) AS BIGINT)
        |      AS total_tokens,
        |    CAST(SUM(least(nw,
        |      1 + 48 * ((greatest(1, nw - 63) - 1) // 48) + 63))
        |      AS BIGINT) AS covered_tokens
        |  FROM w)
        |SELECT n_docs, n_chunks, total_tokens, chunk_tokens,
        |  covered_tokens, chunk_tokens - covered_tokens AS overlap_tokens,
        |  total_tokens - covered_tokens AS tail_tokens, chunk_checksum
        |FROM a, b""".stripMargin,

    "q248_source_affinity" ->
      """WITH w AS (
        |  SELECT source, string_split(trim(lower(text)), ' ') AS ws
        |  FROM documents),
        |ds AS (
        |  SELECT DISTINCT source,
        |    array_to_string(ws[i - 2:i], ' ') AS g
        |  FROM w, unnest(range(3, len(ws) + 1)) AS t(i)),
        |sz AS (SELECT source, COUNT(*) AS n FROM ds GROUP BY 1),
        |pr AS (
        |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
        |  FROM ds a JOIN ds b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT pr.src_a, pr.src_b, pr.inter,
        |  x.n AS na, y.n AS nb,
        |  CAST((1000 * pr.inter) // (x.n + y.n - pr.inter) AS BIGINT)
        |    AS jaccard_permille
        |FROM pr JOIN sz x ON pr.src_a = x.source
        |  JOIN sz y ON pr.src_b = y.source
        |ORDER BY pr.src_a, pr.src_b""".stripMargin,

    "q249_bloom_decontaminate" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(trim(lower(text)), ' ')
        |    AS ws
        |  FROM documents),
        |gr AS (
        |  SELECT DISTINCT doc_id, source,
        |    array_to_string(ws[i - 4:i], ' ') AS g
        |  FROM w, unnest(range(5, len(ws) + 1)) AS t(i)),
        |bench AS (SELECT DISTINCT g FROM gr WHERE source = 'src0'),
        |mm AS (SELECT 16 * COUNT(*) AS m FROM bench),
        |bits AS (
        |  SELECT DISTINCT b FROM (
        |    SELECT CAST('0x' || substr(md5(g), 1, 12) AS BIGINT)
        |      % mm.m AS b FROM bench, mm
        |    UNION ALL
        |    SELECT CAST('0x' || substr(md5(g), 13, 12) AS BIGINT)
        |      % mm.m FROM bench, mm)),
        |corpus AS (
        |  SELECT doc_id, g,
        |    CAST('0x' || substr(md5(g), 1, 12) AS BIGINT) % mm.m
        |      AS h1,
        |    CAST('0x' || substr(md5(g), 13, 12) AS BIGINT) % mm.m
        |      AS h2
        |  FROM gr, mm WHERE source <> 'src0'),
        |flagged AS (
        |  SELECT DISTINCT doc_id FROM corpus
        |  WHERE h1 IN (SELECT b FROM bits) AND h2 IN (SELECT b FROM bits)),
        |truly AS (
        |  SELECT DISTINCT doc_id FROM corpus
        |  WHERE g IN (SELECT g FROM bench)),
        |nb AS (SELECT COUNT(*) AS n_bench_grams FROM bench),
        |nbit AS (SELECT COUNT(*) AS n_bits_set FROM bits),
        |nc AS (
        |  SELECT COUNT(DISTINCT doc_id) AS n_corpus_docs FROM documents
        |  WHERE source <> 'src0'),
        |j AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_flagged_docs,
        |    CAST(SUM(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_true_docs,
        |    CAST(SUM(CASE WHEN f.doc_id IS NOT NULL AND t.doc_id IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_fp_docs
        |  FROM flagged f FULL OUTER JOIN truly t ON f.doc_id = t.doc_id)
        |SELECT n_bench_grams, n_bits_set, n_corpus_docs, n_flagged_docs,
        |  n_true_docs, n_fp_docs,
        |  CAST((1000 * n_fp_docs) // (n_corpus_docs - n_true_docs)
        |    AS BIGINT) AS fp_permille
        |FROM nb, nbit, nc, j""".stripMargin
  )
}

package graft.operators

import graft.{Det, Tables => T}
import graft.curation.{Sampling, Screening}
import graft.dedup.{Clusters, Dedup}
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators as registry queries: text analysis,
  * deduplication, similarity search, multimodal plumbing. Oracles cover
  * everything SQL-expressible — including an exhaustive-pairwise DuckDB
  * oracle for the MinHash-LSH near-dup path (the LSH result must equal the
  * exact O(n²) answer on the planted near-dup data).
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis ---------------------------------------------------
    "q25_text_tokens" -> ((s, d) => {
      val t = col("text")
      T.documents(s, d)
        .select(col("lang"), TextAnalysis.tokenCount(t).as("n_tok"),
          TextAnalysis.meanTokenLen(t).as("mtl"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("total_tokens"),
          min(col("n_tok")).as("min_tokens"),
          max(col("n_tok")).as("max_tokens"),
          Det.davg(col("mtl")).as("avg_token_len"))
        .orderBy(col("lang"))
    }),

    "q26_text_quality" -> ((s, d) => {
      val t = col("text")
      T.documents(s, d)
        .select(col("source"),
          TextAnalysis.qualityScore(t).as("q"),
          TextAnalysis.alphaRatio(t).as("ar"),
          TextAnalysis.stopwordRatio(t).as("sr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("q")).as("sum_quality"),
          Det.davg(col("ar")).as("avg_alpha"),
          sum(when(col("q") >= 0.8, 1).otherwise(0)).cast("long")
            .as("n_high_quality"))
        .orderBy(col("source"))
    }),

    "q27_text_langid" -> ((s, d) => {
      T.documents(s, d)
        .withColumn("pred_lang", TextAnalysis.langId(col("text")))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    "q28_text_fingerprint" -> ((s, d) => {
      T.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
        .limit(200)
    }),

    // ---- dedup -----------------------------------------------------------
    "q29_dedup_exact" -> ((s, d) =>
      Dedup.exactSummary(T.documents(s, d))),

    "q30_dedup_minhash" -> ((s, d) => {
      Dedup.minhashNearDups(T.documents(s, d), threshold = 0.8)
        .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
          col("common"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Gate configuration: maxDist = 0 over the corpus plus 20 planted
    // copies, restricted to source↔copy pairs. A SimHash fingerprint is a
    // pure function of the token multiset, so every copy must pair with
    // exactly its source at distance 0 — a broken fingerprint, chunk
    // table, or verify drops rows here. The restriction matters: natural
    // near-dup pairs (and near-dups of a copied source) can legitimately
    // collide at hamming 0 too — one extra token among ~72 flips none of
    // the 64 bit-sums — which is correct SimHash behavior but not
    // SQL-derivable; corpus-wide maxDist > 0 behavior is covered by
    // PipelineSpec's overlap-with-minhash property. The fingerprint +
    // chunk-table candidate machinery still runs over the full corpus.
    "q31_dedup_simhash" -> ((s, d) => {
      val docs = T.documents(s, d)
      val planted = docs.where(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + lit(10000000L))
      Dedup.simhashNearDups(docs.unionByName(planted), maxDist = 0)
        .where(col("id_b") - col("id_a") === 10000000L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity search ----------------------------------------------
    "q33_ann_brute" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Gate configuration: one 0-bit table puts every vector in a single
    // bucket, so the LSH candidate join is exhaustive and the top-k must
    // equal brute force (the q33 oracle). This proves the bucket-join +
    // id-pair-distinct + vector-re-join + re-rank machinery exactly;
    // recall of the real multi-table config is PipelineSpec property
    // territory.
    "q34_ann_lsh_exhaustive" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.lshTopK(emb.where(col("vec_id") < 10), emb, k = 5,
        nTables = 1, bitsPerTable = 0)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Gate configuration: threshold 0.999 over the corpus plus 20 planted
    // copies. Identical vectors share every LSH bucket, so recall on them
    // is structurally 1.0; the oracle is the exhaustive O(n²) DuckDB
    // cosine join over the same unioned relation (measured: the nearest
    // natural pair is at cos 0.513, so the planted pairs are exactly the
    // expected set, derived — not hard-coded — by the oracle).
    "q32_embed_neardup" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      val planted = emb.where(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + lit(10000000L))
      Similarity.embeddingNearDups(emb.unionByName(planted),
        threshold = 0.999)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Deterministic curation sampling: three sources at different rates,
    // the rest dropped; decisions are md5-bucket functions of doc_id, so
    // the oracle replays the identical sample and the per-source
    // counts/content hashes must match exactly.
    "q60_curation_sample" -> ((s, d) => {
      Sampling.stratifiedSample(T.documents(s, d), "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.2))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy(col("source"))
    }),

    // Dataset mixing toward target weights: sample each source at
    // min(1, target·w/n); with 25 docs per source, a 60/30/10 mix over a
    // 50-row target gives per-source rates 1.0/0.6/0.2 — the oracle
    // derives the same rates from the same counts.
    "q61_dataset_mix" -> ((s, d) => {
      Sampling.mixToWeights(T.documents(s, d), "doc_id", "source",
          Map("src3" -> 0.6, "src4" -> 0.3, "src5" -> 0.1),
          targetRows = 50)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"))
    }),

    // Int8-quantized exact top-k — the 4×-narrower ANN path; the oracle
    // replicates the quantization (round half away from zero, clamp ±127)
    // and the integer dot product in SQL, so ranking must match exactly.
    "q59_ann_quantized" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.quantizedTopK(emb.where(col("vec_id") < 10), emb, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Benchmark-contamination screen: every 25th doc is the "benchmark",
    // the rest the training corpus; flag corpus docs sharing ≥ 20 % of
    // their shingles with the benchmark (integer threshold, no floats).
    // The planted near-dup clusters straddle the split, so real hits
    // exist at every scale; the oracle recomputes overlap from the same
    // shingle definition.
    "q62_contamination" -> ((s, d) => {
      val docs = T.documents(s, d)
      Screening.contamination(
          docs.where(col("doc_id") % 25 =!= 0),
          docs.where(col("doc_id") % 25 === 0))
        .where(col("n_hit") * 5 >= col("n_shingles"))
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_hit"))
        .orderBy(col("doc_id"))
    }),

    // PII scrub: deterministic synthetic emails/IPs planted on a schedule
    // (the raw corpus has none), conservative Java/RE2-agreeing patterns,
    // and the oracle replays the identical planting + scrub in SQL — so
    // replacement counts and the exact character delta must match.
    "q63_pii_scrub" -> ((s, d) => {
      val planted = T.documents(s, d).withColumn("t2",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".5"))).otherwise(lit(""))))
      planted.withColumn("clean", Screening.scrubPii(col("t2")))
        .agg(
          sum(when(col("clean").contains("<EMAIL>"), 1).otherwise(0))
            .cast("long").as("n_email_docs"),
          sum(when(col("clean").contains("<IP>"), 1).otherwise(0))
            .cast("long").as("n_ip_docs"),
          sum(length(col("t2")) - length(col("clean"))).cast("long")
            .as("chars_removed"))
    }),

    // Within-document repetition screen: docs containing any repeated
    // trigram (integer counts, no float thresholds).
    "q64_repetition" -> ((s, d) => {
      Screening.repetition(T.documents(s, d))
        .where(col("max_rep") >= 2)
        .select(col("id").as("doc_id"), col("n_shingles"), col("max_rep"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal plumbing --------------------------------------------
    "q35_multimodal_decode" -> ((s, d) => {
      Multimodal.decodeMeta(Multimodal.pack(T.documents(s, d)))
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          sum(col("width")).cast("long").as("sum_width"),
          sum(col("height")).cast("long").as("sum_height"))
        .orderBy(col("format"))
    }),

    "q36_frame_sample" -> ((s, d) => {
      Multimodal.sampleFrames(
        Multimodal.pack(T.documents(s, d).where(col("doc_id") < 50)))
        .select(col("doc_id"), col("frame_idx"), col("duration_s"),
          col("frame_offset_s"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // ---- sequence packing (GPT-style concat-then-chunk) -----------------
    // Pack each shard's documents, in deterministic doc_id order, into
    // fixed 2048-token training sequences: concatenate and cut every 2048
    // tokens, documents spanning chunk boundaries (the standard
    // pretraining packing — no padding, fill ratio 1 except each shard's
    // last chunk). The operator shape at 100 TB: deterministic shard
    // assignment (embarrassingly parallel), a per-shard window running
    // sum (one shuffle, sorted within shard), integer division for the
    // chunk id — no driver involvement, no cross-shard coordination.
    "q69_sequence_pack" -> ((s, d) => {
      val budget = 2048
      val toks = T.documents(s, d).select(col("doc_id"),
        (col("doc_id") % 8).as("shard"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"))
      val packed = toks
        .withColumn("cum_excl", sum(col("tok")).over(w) - col("tok"))
        .withColumn("chunk", floor(col("cum_excl") / budget))
      // Shard totals roll up FROM the per-chunk aggregate (not from a
      // second pass over the docs): one scan, one window, two chained
      // aggregates that both reuse the shard clustering — otherwise
      // Catalyst computes the totals straight off the table and scans
      // the 100 TB corpus twice.
      packed.groupBy(col("shard"), col("chunk"))
        .agg(count(lit(1)).as("docs_in_chunk"),
          sum(col("tok")).as("chunk_tok"))
        .groupBy(col("shard"))
        .agg(sum(col("docs_in_chunk")).as("n_docs"),
          sum(col("chunk_tok")).as("total_tokens"),
          (floor((sum(col("chunk_tok")) - 1) / budget) + 1).as("n_chunks"),
          max(col("docs_in_chunk")).as("max_docs_in_chunk"))
        .orderBy(col("shard"))
    }),

    // ---- near-dup cluster formation (connected components) --------------
    // Two planted copies of the first 20 docs force multi-member clusters
    // {source, copy1, copy2} on top of the corpus's natural near-dup
    // pairs; the verified MinHash pairs (the q30 pipeline, whose pair set
    // is oracle-proven equal to exhaustive pairwise Jaccard) feed
    // alternating large-star/small-star connected components, and the
    // lowest-id member of each cluster is kept. The oracle recomputes the
    // exhaustive edge set in SQL and resolves components with a recursive
    // min-label CTE — a fully independent CC implementation.
    // SEMANTIC dedup end-to-end (the SemDeDup-style pass: embedding
    // near-dup pairs → connected components → survivor selection) — the
    // composition of q32's LSH-bucketed cosine pair generation with
    // q65's alternating large-star/small-star CC, over vectors instead
    // of shingles. Two planted copy generations of the same 20 vectors
    // must resolve into 20 three-member clusters keeping one survivor
    // each; the oracle recomputes the exhaustive O(n²) cosine edge set
    // and resolves components with an independent recursive min-label
    // CTE. Every stage is the scale shape: id-only pair shuffles,
    // bucket caps, edge-sized CC rounds.
    //
    // GATE EQUIVALENCE IS FIXTURE-DEPENDENT BY DESIGN: the Spark side
    // generates candidates via LSH (probabilistic recall, bucket-capped)
    // while the oracle's edge set is the exhaustive O(n²) cosine scan at
    // >= 0.999. At that threshold the only qualifying pairs in this
    // corpus are the planted BYTE-IDENTICAL vectors, whose LSH
    // signatures are identical in every table — so LSH recall on the
    // gated edge set is exactly 1 and the hash gate is deterministic.
    // The probabilistic-recall claim for non-identical near-dups is
    // gated separately: q176 measures recall against production LSH
    // configs, and PipelineSpec asserts the planted components directly.
    "q194_semantic_dedup" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      def copy(off: Long) = emb.where(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + lit(off))
      val all = emb.unionByName(copy(10000000L))
        .unionByName(copy(20000000L))
      val pairs = Similarity.embeddingNearDups(all, threshold = 0.999)
      Clusters.survivors(all.select(col("vec_id")),
          pairs.select(col("id_a"), col("id_b")), idCol = "vec_id")
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("kept"), 1).otherwise(0)).cast("long").as("n_kept"),
          max(col("vec_id")).as("max_id"))
        .where(col("n_members") > 1)
        .orderBy(col("comp"))
    }),

    "q65_dedup_clusters" -> ((s, d) => {
      val docs = T.documents(s, d)
      def copy(off: Long) = docs.where(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + lit(off))
      val all = docs.unionByName(copy(10000000L))
        .unionByName(copy(20000000L))
      val pairs = Dedup.minhashNearDups(all, threshold = 0.8)
      Clusters.survivors(all, pairs)
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("kept"), 1).otherwise(0)).cast("long").as("n_kept"),
          max(col("doc_id")).as("max_id"))
        .where(col("n_members") > 1)
        .orderBy(col("comp"))
    }),

    // Split-leakage audit: near-dup pairs crossing the q98 hash-split
    // boundary — the eval-hygiene gate a pipeline runs BEFORE publishing
    // a split (a test doc whose near-dup sits in train leaks the answer
    // into evaluation; q62 checks contamination against an EXTERNAL
    // benchmark, this checks the split's own internal leakage). Pairs
    // come from the gate-proven LSH pipeline (q30 pins it equal to the
    // exhaustive pairwise scan at j >= 0.8 on this corpus); splits are
    // q98's content-stable md5 buckets, so the audit is deterministic
    // under re-partitioning and append. Scale: the labeled frame is
    // near-dup-pair-sized, both split joins shuffle bare (id, split)
    // rows, and the output is the 6-row split matrix.
    "q207_split_leakage" -> ((s, d) => {
      val ch = substring(md5(col("doc_id").cast("string")), 1, 1)
      val sdf = T.documents(s, d).select(col("doc_id"),
        when(ch < "c", "train").when(ch < "e", "val")
          .otherwise("test").as("split"))
      val pairs = Dedup.minhashNearDups(T.documents(s, d), threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      pairs
        .join(sdf.select(col("doc_id").as("id_a"),
          col("split").as("spl_a")), "id_a")
        .join(sdf.select(col("doc_id").as("id_b"),
          col("split").as("spl_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          least(col("spl_a"), col("spl_b")).as("sa"),
          greatest(col("spl_a"), col("spl_b")).as("sb"))
        .select(col("sa"), col("sb"),
          explode(array(col("id_a"), col("id_b"))).as("doc"))
        .groupBy(col("sa"), col("sb"))
        .agg(expr("count(*) div 2").as("n_pairs"),
          count_distinct(col("doc")).as("n_docs_involved"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Soft dedup: instead of dropping near-duplicates, weight every
    // document by 1/|its near-dup cluster| (integer micro-units) so a
    // 10-copy boilerplate page contributes ONE document of training
    // signal spread across its copies — the modern alternative to hard
    // dedup when provenance diversity matters. Per-source effective
    // sample size = sum of weights; the gap between n_docs and
    // ess_micro/1e6 is exactly each source's duplication burden. Gate
    // equivalence is fixture-dependent the same way q30/q65 are (LSH
    // candidate recall = 1 at j >= 0.8 on this corpus). Scale: CC over
    // the sparse pair graph (edge-sized rounds), one comp-keyed size
    // aggregate, and id-only (doc, comp, source) rows in every exchange.
    "q209_soft_dedup" -> ((s, d) => {
      val docs = T.documents(s, d)
      val pairs = Dedup.minhashNearDups(docs, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val labeled = Clusters.survivors(
        docs.select(col("doc_id"), col("source")), pairs)
      val sizes = labeled.groupBy(col("comp")).agg(count(lit(1)).as("csz"))
      labeled.join(sizes, "comp")
        .select(col("source"), col("csz"),
          expr("1000000 div csz").as("w_micro"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w_micro")).as("ess_micro"),
          sum(when(col("csz") > 1, 1L).otherwise(0L)).as("n_in_clusters"))
        .orderBy(col("source"))
    })
  )

  private def sqlShingles(rel: String): String = OracleSql.shingleSql(rel)

  def oracleSql: Map[String, String] = Map(
    "q25_text_tokens" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
         |    AS total_tokens,
         |  CAST(MIN(len(string_split(trim(text), ' '))) AS INTEGER)
         |    AS min_tokens,
         |  CAST(MAX(len(string_split(trim(text), ' '))) AS INTEGER)
         |    AS max_tokens,
         |  ${Det.sqlAvg("CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / len(string_split(trim(text), ' '))")}
         |    AS avg_token_len
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q26_text_quality" -> {
      val nTok = "len(string_split(trim(text), ' '))"
      val alpha = "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)"
      val sw = TextAnalysis.sqlStopwordHits(TextAnalysis.langProfiles.head._2)
      val q = s"round((least(CAST($nTok AS DOUBLE) / 100.0, 1.0) + " +
        s"least(CAST($sw AS DOUBLE) / $nTok * 10.0, 1.0) + $alpha) / 3.0, 6)"
      s"""SELECT source, COUNT(*) AS n,
         |  ${Det.sqlSum(q)} AS sum_quality,
         |  ${Det.sqlAvg(alpha)} AS avg_alpha,
         |  CAST(SUM(CASE WHEN $q >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_high_quality
         |FROM documents GROUP BY source ORDER BY source""".stripMargin
    },

    "q27_text_langid" ->
      s"""SELECT lang, ${TextAnalysis.sqlLangId} AS pred_lang, COUNT(*) AS n
         |FROM documents
         |GROUP BY lang, pred_lang
         |ORDER BY lang, pred_lang""".stripMargin,

    "q28_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,

    "q29_dedup_exact" ->
      """SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |    AS n_distinct,
        |  COUNT(*) - COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        |    AS n_dups
        |FROM documents""".stripMargin,

    "q207_split_leakage" ->
      s"""WITH ${OracleSql.blockedPairs("documents")},
         |p AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.8),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
         |      THEN 'train'
         |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
         |      THEN 'val' ELSE 'test' END AS split
         |  FROM documents),
         |lab AS (
         |  SELECT p.id_a, p.id_b,
         |    least(x.split, y.split) AS sa, greatest(x.split, y.split) AS sb
         |  FROM p JOIN sp x ON p.id_a = x.doc_id
         |         JOIN sp y ON p.id_b = y.doc_id),
         |e AS (
         |  SELECT sa, sb, id_a AS doc FROM lab
         |  UNION ALL SELECT sa, sb, id_b AS doc FROM lab)
         |SELECT sa, sb, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT doc) AS BIGINT) AS n_docs_involved
         |FROM e GROUP BY sa, sb ORDER BY sa, sb""".stripMargin,

    // Exhaustive oracle — the LSH path must find exactly the pairs the
    // full pairwise scan finds (LSH miss probability at j≥0.8 is
    // ~2e-4/pair). Truth via OracleSql.blockedPairs: exactly the all-
    // pairs result (any emitted pair shares >= 1 shingle) but near-
    // linear, so the sf0.1 sweep runs it instead of skipping
    // (tools/oracle_parity.py pins old-vs-new equality at sf0.01).
    "q30_dedup_minhash" ->
      s"""WITH ${OracleSql.blockedPairs("documents")}
         |SELECT id_a, id_b, sz_a, sz_b, common, jaccard
         |FROM pairs WHERE jaccard >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // Token-multiset equality derived independently of any hash function:
    // SimHash is a pure function of the token multiset, so hamming-0 pairs
    // touching a planted copy must be exactly these rows.
    "q31_dedup_simhash" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 20
        |), t AS (
        |  SELECT doc_id, list_sort(string_split(trim(lower(text)), ' ')) AS tk
        |  FROM d)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(0 AS INTEGER) AS hamming
        |FROM t a JOIN t b
        |  ON b.doc_id = a.doc_id + 10000000 AND a.tk = b.tk
        |ORDER BY id_a, id_b""".stripMargin,

    // Exhaustive O(n²) cosine join over the same planted union — the LSH
    // path must find exactly the pairs the full pairwise scan finds.
    "q32_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000, embedding FROM embeddings
        |  WHERE vec_id < 20
        |), v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM e)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.999
        |ORDER BY id_a, id_b""".stripMargin,

    // Single-bucket LSH is exhaustive, so the answer is exact top-k — the
    // same oracle as brute force.
    "q34_ann_lsh_exhaustive" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q33_ann_brute" ->
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])) DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q64_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |    for i in range(1, len(w) - 1)] AS s
        |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS sh FROM g),
        |cnt AS (SELECT doc_id, sh, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |m AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_shingles,
        |        CAST(MAX(c) AS BIGINT) AS max_rep
        |      FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_shingles, max_rep FROM m
        |WHERE max_rep >= 2 ORDER BY doc_id""".stripMargin,

    "q62_contamination" -> {
      s"""WITH sh AS (${sqlShingles("documents")}),
         |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 25 = 0),
         |c AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 25 <> 0),
         |tot AS (SELECT doc_id, COUNT(*) AS n FROM c GROUP BY doc_id),
         |hit AS (SELECT c.doc_id, COUNT(*) AS nh FROM c JOIN b USING (g)
         |        GROUP BY c.doc_id)
         |SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_shingles,
         |  CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_hit
         |FROM tot t LEFT JOIN hit h USING (doc_id)
         |WHERE COALESCE(h.nh, 0) * 5 >= t.n
         |ORDER BY doc_id""".stripMargin
    },

    "q63_pii_scrub" ->
      """WITH planted AS (
        |  SELECT text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |      THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.5'
        |      ELSE '' END AS t2
        |  FROM documents),
        |s AS (
        |  SELECT t2, regexp_replace(
        |    regexp_replace(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS clean
        |  FROM planted)
        |SELECT
        |  CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_email_docs,
        |  CAST(SUM(CASE WHEN clean LIKE '%<IP>%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_ip_docs,
        |  CAST(SUM(length(t2) - length(clean)) AS BIGINT) AS chars_removed
        |FROM s""".stripMargin,

    "q60_curation_sample" ->
      """WITH b AS (
        |  SELECT *, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |    AS INTEGER) % 65536 AS bk
        |  FROM documents)
        |SELECT source, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM b
        |WHERE (source = 'src0' AND bk < 65536)
        |   OR (source = 'src1' AND bk < 32768)
        |   OR (source = 'src2' AND bk < 13107)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q61_dataset_mix" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n FROM documents
        |  WHERE source IN ('src3', 'src4', 'src5') GROUP BY source),
        |t AS (
        |  SELECT source, CAST(round(LEAST(1.0,
        |    50 * (CASE source WHEN 'src3' THEN 0.6 WHEN 'src4' THEN 0.3
        |          ELSE 0.1 END) / n) * 65536) AS INTEGER) AS thr
        |  FROM c),
        |b AS (
        |  SELECT d.*, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |    AS INTEGER) % 65536 AS bk
        |  FROM documents d)
        |SELECT b.source, COUNT(*) AS n
        |FROM b JOIN t ON b.source = t.source AND b.bk < t.thr
        |GROUP BY b.source ORDER BY b.source""".stripMargin,

    "q59_ann_quantized" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> greatest(-127, least(127, round(x * 127.0)))) AS qv
        |  FROM embeddings)
        |SELECT query_id, rank, neighbor_id, dq FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_inner_product(q.qv, c.qv) AS INTEGER) AS dq,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.qv, c.qv) DESC, c.vec_id) AS rank
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q35_multimodal_decode" ->
      """SELECT CASE strlen(text) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |       ELSE 'webp' END AS format,
        |  COUNT(*) AS n,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(SUM(64 + (strlen(text) * 7 + ascii(substr(text, 1, 1))) % 577)
        |    AS BIGINT) AS sum_width,
        |  CAST(SUM(64 + (strlen(text) * 13 + ascii(substr(text, -1, 1))) % 385)
        |    AS BIGINT) AS sum_height
        |FROM documents GROUP BY format ORDER BY format""".stripMargin,

    "q36_frame_sample" ->
      """SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(strlen(text) % 3600 + 1 AS INTEGER) AS duration_s,
        |  CAST(floor(frame_idx * (strlen(text) % 3600 + 1) / 4.0) AS INTEGER)
        |    AS frame_offset_s
        |FROM documents, (SELECT unnest(range(4)) AS frame_idx)
        |WHERE doc_id < 50
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q69_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |p AS (
        |  SELECT shard, tok,
        |    SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - tok AS cum_excl
        |  FROM t),
        |c AS (
        |  SELECT shard, CAST(floor(cum_excl / 2048) AS BIGINT) AS chunk,
        |    COUNT(*) AS dic
        |  FROM p GROUP BY shard, chunk)
        |SELECT a.shard, a.n_docs, a.total_tokens, a.n_chunks,
        |  m.max_docs_in_chunk
        |FROM (SELECT shard, COUNT(*) AS n_docs,
        |        CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |        CAST(floor((SUM(tok) - 1) / 2048) + 1 AS BIGINT) AS n_chunks
        |      FROM p GROUP BY shard) a
        |JOIN (SELECT shard, MAX(dic) AS max_docs_in_chunk
        |      FROM c GROUP BY shard) m USING (shard)
        |ORDER BY shard""".stripMargin,

    // Independent connected-components implementation: exhaustive pairwise
    // Exhaustive O(n²) cosine edges over the planted union (q32's
    // derivation, three generations), components resolved by the same
    // independent recursive min-label CTE as q65.
    "q194_semantic_dedup" ->
      """WITH RECURSIVE
        |gens AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000, embedding FROM embeddings
        |  WHERE vec_id < 20
        |  UNION ALL
        |  SELECT vec_id + 20000000, embedding FROM embeddings
        |  WHERE vec_id < 20),
        |vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM gens),
        |e AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v
        |  FROM vv a JOIN vv b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.x, b.x) >= 0.999),
        |sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
        |cc AS (
        |  SELECT u AS id, u AS comp FROM sym
        |  UNION
        |  SELECT s.v AS id, c.comp FROM cc c JOIN sym s ON s.u = c.id
        |  WHERE c.comp < s.v),
        |lab AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id)
        |SELECT comp, COUNT(*) AS n_members,
        |  CAST(SUM(CASE WHEN id = comp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  MAX(id) AS max_id
        |FROM lab GROUP BY comp HAVING COUNT(*) > 1 ORDER BY comp"""
      .stripMargin,

    // Jaccard edges (same derivation as q30's oracle, over the corpus +
    // two planted copy generations), components resolved by a recursive
    // min-label-propagation CTE, survivors = id == component min.
    "q65_dedup_clusters" ->
      s"""WITH RECURSIVE
         |docs2 AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 20
         |  UNION ALL
         |  SELECT doc_id + 20000000, text FROM documents WHERE doc_id < 20),
         |${OracleSql.blockedPairs("docs2")},
         |e AS (SELECT id_a AS u, id_b AS v FROM pairs
         |      WHERE jaccard >= 0.8),
         |sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
         |cc AS (
         |  SELECT u AS id, u AS comp FROM sym
         |  UNION
         |  SELECT s.v AS id, c.comp FROM cc c JOIN sym s ON s.u = c.id
         |  WHERE c.comp < s.v),
         |lab AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id)
         |SELECT comp, COUNT(*) AS n_members,
         |  CAST(SUM(CASE WHEN id = comp THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  MAX(id) AS max_id
         |FROM lab GROUP BY comp HAVING COUNT(*) > 1 ORDER BY comp""".stripMargin,

    "q209_soft_dedup" ->
      s"""WITH RECURSIVE
         |${OracleSql.blockedPairs("documents")},
         |e AS (SELECT id_a AS u, id_b AS v FROM pairs
         |      WHERE jaccard >= 0.8),
         |sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
         |cc AS (
         |  SELECT u AS id, u AS comp FROM sym
         |  UNION
         |  SELECT s.v AS id, c.comp FROM cc c JOIN sym s ON s.u = c.id
         |  WHERE c.comp < s.v),
         |lab AS (SELECT id, MIN(comp) AS comp FROM cc GROUP BY id),
         |labeled AS (
         |  SELECT d.doc_id, d.source, COALESCE(l.comp, d.doc_id) AS comp
         |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.id),
         |sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS csz
         |       FROM labeled GROUP BY comp)
         |SELECT f.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(1000000 // s.csz) AS BIGINT) AS ess_micro,
         |  CAST(SUM(CASE WHEN s.csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_in_clusters
         |FROM labeled f JOIN sz s USING (comp)
         |GROUP BY f.source ORDER BY f.source""".stripMargin
  )
}

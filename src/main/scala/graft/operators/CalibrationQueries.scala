package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-calibration + curriculum layer — the audits and schedules that sit
  * ON TOP of the corpus operators: once a pipeline has filters (Quality),
  * dedup (Pipeline/Scale), and indexes (Corpus), it needs to know how well
  * the approximations track ground truth and how to schedule what survives:
  *
  *  - q230: hashed linear classifier scoring (the fastText shape CCNet /
  *    FineWeb-Edu deploy as the model-based quality filter: bag of hashed
  *    unigram+bigram features × a bucketed weight vector, threshold at
  *    logit 0). The weight table is a 256-row broadcast — the same join
  *    shape a trained .bin's quantized embedding matrix would use.
  *  - q231: MinHash calibration — for exactly the candidate pairs the LSH
  *    band index surfaces (q30's config: 16 hashes, 4 bands × 4 rows),
  *    the signature-estimated Jaccard vs the exact shingle-set Jaccard,
  *    bucketed by absolute error. The "measure, don't guess" audit that
  *    justifies the dedup thresholds.
  *  - q232: within-cell exact k-NN graph over the quantized index (q212's
  *    8-cell assignment): per cell, each vector's top-3 neighbors and the
  *    reciprocal-edge rate — the graph-connectivity audit behind
  *    agglomerative semantic clustering and kNN-recall debugging.
  *  - q233: annealed curriculum schedule — per-epoch per-source sampling
  *    weights interpolating uniform (epoch 1) → quality-proportional
  *    (epoch 4), the multi-epoch mixture account that turns q213/q61's
  *    static mixes into a training schedule.
  *  - q234: the k-means M-step INSIDE the streaming engine (q216's
  *    decimal-exact centroid means as per-trigger mergeable increments,
  *    q221/q229's replay-idempotent trigger mechanics) — merged must
  *    equal the one-shot batch M-step bit for bit.
  *  - q235: dedup-threshold confusion sweep — tp/fp/fn + precision/
  *    recall of the signature estimate against exact Jaccard at
  *    thresholds 500..900, over the same LSH-surfaced pairs as q231;
  *    the sweep that picks a production dedup threshold from data.
  *  - q236: per-source lexical-diversity census — type-token ratio and
  *    unigram/bigram Shannon entropy in floor-log2 millibits; the
  *    template-detection signal beside q228's boilerplate share.
  *  - q237: vocabulary stability across corpus halves — top-200 bigram
  *    overlap, Jaccard, and rank displacement; the snapshot-drift probe.
  *  - q238: LSH banding S-curve — candidate volume, recall, and purity
  *    for the four 16-component band configs against the exact-Jaccard
  *    truth on the single-component superset; with q235 this closes the
  *    full (bands × rows, threshold) dedup design space over data.
  *  - q239: cross-language duplication flow — q226's provenance matrix
  *    keyed by language; the translated-boilerplate/leakage audit.
  *  - q240: token-budget water-filling — max-min fair allocation of a
  *    60% token budget across sources, integer-exact, window-free.
  *
  * Same quantization conventions as Quality/CorpusQueries: integer
  * milli/permille units via `div` over positive operands, floor-log2 where
  * log-shaped, decimal-routed sums where real-valued — so every gate
  * hash-matches DuckDB exactly.
  */
object CalibrationQueries {

  /** q25's tokenization convention (single-space split of trimmed lower). */
  private def words: org.apache.spark.sql.Column =
    split(trim(lower(col("text"))), " ")

  /** Per-document MinHash index: distinct 3-word shingle set, 16-component
    * signature (component k = min md5(k ':' shingle)), and set size — one
    * shuffle-free projection through the codegen'd [[graft.functions
    * .MinHashShingles]] kernel, materialized ONCE (localCheckpoint, the
    * persisted-index contract q117/q157 use) before field extraction so
    * the kernel runs exactly one pass. Column-algebra equivalents
    * measured 7-12 s at sf0.1 (interpreted transform() lambdas, or an
    * explode + 16-aggregate groupBy shuffling the whole shingle stream);
    * the kernel does the n-gram walk and MD5 loop inside the scan's
    * codegen stage. */
  private[operators] def shingleFeat(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"),
        graft.functions.MinHashShingles(trim(lower(col("text")))).as("mh"))
      .localCheckpoint()
      .where(size(col("mh.shs")) > 0)
      .select(col("doc_id"), col("mh.shs").as("shs"),
        col("mh.sigs").as("sigs"),
        size(col("mh.shs")).cast("long").as("nsh"))

  /** The (band, digest) rows for a (bands × rowsPerBand) LSH config over
    * [[shingleFeat]]'s signature arrays: band j digests components
    * j·r..j·r+r−1 in k order — identical to the oracle's GROUP BY k div r
    * + string_agg(sig ORDER BY k). */
  private def bandsOf(feat: DataFrame, bands: Int, r: Int): DataFrame =
    feat.select(col("doc_id"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), j -> struct(" +
        s"j AS band, md5(array_join(slice(sigs, j * $r + 1, $r), '|')) " +
        "AS bkey))")).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bkey").as("bkey"))

  /** Distinct candidate (a, b) id pairs sharing any band bucket. */
  private def candOf(feat: DataFrame, bands: Int, r: Int): DataFrame = {
    val bs = bandsOf(feat, bands, r)
    bs.as("x").join(bs.as("y"), Seq("band", "bkey"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Estimated-vs-exact Jaccard for exactly the pairs the production LSH
    * band index surfaces (q30's config: 4 bands × 4 rows) — the shared
    * core of q231 (error histogram) and q235 (threshold confusion sweep).
    * Nothing shuffles until the band join, which carries (doc, 4 band
    * digests); the candidate exchange carries bare (a, b) ids; the
    * feature re-join touches only candidate docs. ONE pair-join pass
    * computes the signature agreement AND the exact set Jaccard
    * (array_intersect over the distinct shingle arrays). */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val feat = shingleFeat(s, d)
    val cand = candOf(feat, 4, 4)
    cand
      .join(feat.select(col("doc_id").as("a"), col("sigs").as("sa"),
        col("shs").as("xa"), col("nsh").as("na")), "a")
      .join(feat.select(col("doc_id").as("b"), col("sigs").as("sb"),
        col("shs").as("xb"), col("nsh").as("nb")), "b")
      .select(col("a"), col("b"),
        expr("(1000 * size(filter(zip_with(sa, sb, (x, y) -> x = y), " +
          "v -> v))) div 16").as("est_permille"),
        expr("(1000 * size(array_intersect(xa, xb))) div " +
          "(na + nb - size(array_intersect(xa, xb)))")
          .as("exact_permille"))
  }

  /** embeddings as 3 parquet files — the streaming fixture for q234's
    * per-file triggers; built once per sf. */
  private[graft] def embSplitFixture(s: SparkSession, d: String): String = {
    val out = graft.Scratch.fixtureDir(d, "emb_split3")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.embeddings(s, d).repartition(3).write.mode("overwrite").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hashed linear classifier (fastText shape): features = unigrams +
    // joined bigrams, hashed to 256 buckets (md5 first hex pair — q224's
    // bucketing); the weight vector is a deterministic 256-row table
    // (w(b) = (37b + 11) mod 15, centered at 7) standing in for trained
    // weights — the BROADCAST JOIN is the real shape (a trained vector
    // ships the same way); the fixture function just keeps the oracle
    // able to rebuild it. Per doc: logit_milli = mean feature weight in
    // milli-units, centered (− 7000); keep at logit ≥ 0. Scale shape:
    // the feature stream never shuffles raw — groupBy(doc) partial-
    // aggregates (count, Σw) within scan partitions; the per-source
    // rollup moves 1 row per doc.
    "q230_fasttext_score" -> ((s, d) => {
      val feats = T.documents(s, d)
        .select(col("doc_id"), col("source"), words.as("ws"))
        .select(col("doc_id"), col("source"),
          explode(concat(col("ws"),
            when(size(col("ws")) >= 2,
              expr("transform(sequence(2, size(ws)), i -> " +
                "concat(element_at(ws, i - 1), '_', element_at(ws, i)))"))
              .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))).as("f"))
        .select(col("doc_id"), col("source"),
          substring(md5(col("f")), 1, 2).as("b"))
      val weights = s.range(0, 256)
        .select(format_string("%02x", col("id")).as("b"),
          ((col("id") * 37 + 11) % 15).cast("long").as("w"))
      feats.join(broadcast(weights), "b")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("nf"), sum(col("w")).as("sw"))
        .select(col("source"),
          (expr("(sw * 1000) div nf") - lit(7000L)).as("logit_milli"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("logit_milli") >= 0, 1L).otherwise(0L)).as("n_kept"),
          expr("(sum(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) * 1000)" +
            " div count(*)").as("kept_permille"),
          min(col("logit_milli")).as("min_logit"),
          max(col("logit_milli")).as("max_logit"))
        .orderBy(col("source"))
    }),

    // MinHash calibration: candidate pairs = docs sharing an LSH band
    // key (4 bands × 4 signature rows, band key = md5 of the '|'-joined
    // components in k order); for each pair, estimated Jaccard =
    // matching components / 16 vs exact shingle-set Jaccard, both in
    // permille; output = pair count + mean est/exact per absolute-error
    // centile bucket. Scale shape: band keys aggregate map-side (4 rows
    // per doc), the candidate exchange carries bare (a, b) id pairs, and
    // the exact-Jaccard re-join touches only candidate docs' shingle
    // streams — the same id-only contract as q30/q32, now auditing it.
    "q231_minhash_calibration" -> ((s, d) => {
      minhashPairs(s, d)
        .select(col("est_permille"), col("exact_permille"),
          expr("abs(est_permille - exact_permille) div 100").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(est_permille) div count(*)").as("avg_est_permille"),
          expr("sum(exact_permille) div count(*)").as("avg_exact_permille"))
        .orderBy(col("bucket"))
    }),

    // Dedup-threshold confusion sweep: for the same LSH-surfaced pairs,
    // classify each pair at thresholds 500..900 permille by the
    // signature ESTIMATE vs the exact Jaccard truth — tp/fp/fn counts
    // and the resulting precision/recall (conditional on the band index;
    // pairs the bands never surface are outside both sides). This is the
    // sweep that picks q30's production threshold from measured error,
    // not guesswork. Scale shape: rides minhashPairs; the 5× threshold
    // expansion happens on the bounded pair frame.
    "q235_threshold_sweep" -> ((s, d) => {
      minhashPairs(s, d)
        .crossJoin(broadcast(s.range(5, 10)
          .select((col("id") * 100).as("threshold"))))
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("est_permille") >= col("threshold") &&
            col("exact_permille") >= col("threshold"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("est_permille") >= col("threshold") &&
            col("exact_permille") < col("threshold"), 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("est_permille") < col("threshold") &&
            col("exact_permille") >= col("threshold"), 1L).otherwise(0L))
            .as("fn"))
        .select(col("threshold"), col("n_cand"), col("tp"), col("fp"),
          col("fn"),
          when(col("tp") + col("fp") > 0,
            expr("(1000 * tp) div (tp + fp)")).otherwise(lit(0L))
            .as("precision_permille"),
          when(col("tp") + col("fn") > 0,
            expr("(1000 * tp) div (tp + fn)")).otherwise(lit(0L))
            .as("recall_permille"))
        .orderBy(col("threshold"))
    }),

    // Within-cell exact k-NN graph over the quantized index: q212's
    // 8-cell assignment partitions the corpus; inside each cell, every
    // vector's top-3 cosine neighbors (TopKAgg's score-desc/id-asc
    // contract) form the directed graph; the reciprocal-edge rate per
    // cell is the connectivity audit. Scale shape: pair generation is
    // CELL-BLOCKED (the IVF contract bounds cell populations — at 100 TB
    // cells subshard the same way q30 caps buckets), the per-vector
    // top-3 is the bounded-heap aggregate so each map task ships ≤ 3
    // edges per vector, and the reciprocity join moves bare id pairs.
    "q232_knn_graph" -> ((s, d) => {
      // materialize the 8-cosine-per-vector assignment once: mx, my and
      // the cell census all read it, and the differing projections
      // defeat exchange reuse — without the checkpoint the E-step runs
      // three times
      val m = CorpusQueries.assign(T.embeddings(s, d))
        .select(col("cid"), col("vec_id"), col("embedding"))
        .localCheckpoint()
      val mx = m.select(col("cid"), col("vec_id").as("src"),
        col("embedding").as("ex"))
      val my = m.select(col("cid"), col("vec_id").as("dst"),
        col("embedding").as("ey"))
      val edges = mx.join(my, Seq("cid"))
        .where(col("src") =!= col("dst"))
        .select(col("cid"), col("src"), col("dst"),
          (graft.functions.VectorOps.dotF(col("ex"), col("ey")) /
            (graft.functions.VectorOps.normF(col("ex")) *
              graft.functions.VectorOps.normF(col("ey")))).as("cos"))
        .groupBy(col("cid"), col("src"))
        .agg(graft.functions.TopKAgg.topkAgg(col("cos"), col("dst"), 3)
          .as("top"))
        .select(col("cid"), col("src"), explode(col("top")).as("e"))
        .select(col("cid"), col("src"), col("e.id").as("dst"))
        // 3 bounded rows per vector, referenced by both reciprocity sides
        // and the per-cell stats — materialize once or the within-cell
        // cosine workload runs three times
        .localCheckpoint()
      val recip = edges.as("e1")
        .join(edges.as("e2"),
          col("e1.src") === col("e2.dst") && col("e1.dst") === col("e2.src"),
          "left_semi")
        .groupBy(col("e1.cid").as("cid")).agg(count(lit(1)).as("n_recip"))
      val cells = m.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      val estats = edges.groupBy(col("cid")).agg(count(lit(1)).as("n_edges"))
      cells.join(estats, Seq("cid"), "left")
        .join(recip, Seq("cid"), "left")
        .select(col("cid"), col("n_vecs"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          coalesce(col("n_recip"), lit(0L)).as("n_recip"))
        .withColumn("recip_permille",
          when(col("n_edges") > 0,
            expr("(1000 * n_recip) div n_edges")).otherwise(lit(0L)))
        .orderBy(col("cid"))
    }),

    // Annealed curriculum schedule: per-source quality q_s = mean
    // distinct-word permille (q213's score); epoch e ∈ 1..4 samples
    // source s with weight w(s,e) = ((4−e)·1000 + (e−1)·q_s) div 3 —
    // uniform at epoch 1, quality-proportional at epoch 4 (the "anneal
    // the high-quality upweighting toward the end of training" schedule).
    // tokens_drawn = corpus tokens × w div 1000; share is within-epoch.
    // Scale shape: ONE corpus aggregate to |sources| rows; the epoch
    // cross product and per-epoch totals live on bounded frames.
    "q233_curriculum" -> ((s, d) => {
      val perSrc = T.documents(s, d)
        .select(col("source"),
          size(split(trim(col("text")), " ")).cast("long").as("nw"),
          CorpusQueries.permilleScore.as("score"))
        .groupBy(col("source"))
        .agg(sum(col("nw")).as("toks"),
          expr("sum(score) div count(*)").as("qs"))
      // carry toks through the cross product instead of re-joining
      // perSrc (which would re-run the corpus aggregate a second time)
      val sched = s.range(1, 5).select(col("id").as("epoch"))
        .crossJoin(broadcast(perSrc))
        .select(col("epoch"), col("source"),
          expr("((4 - epoch) * 1000 + (epoch - 1) * qs) div 3")
            .as("w_milli"),
          col("toks"))
        .select(col("epoch"), col("source"), col("w_milli"),
          expr("(toks * w_milli) div 1000").as("tokens_drawn"))
      val tot = sched.groupBy(col("epoch"))
        .agg(sum(col("tokens_drawn")).as("etot"))
      sched.join(broadcast(tot), "epoch")
        .select(col("epoch"), col("source"), col("w_milli"),
          col("tokens_drawn"),
          expr("(tokens_drawn * 1000) div etot").as("share_permille"))
        .orderBy(col("epoch"), col("source"))
    }),

    // The k-means M-step INSIDE the streaming engine: each micro-batch
    // assigns ITS vectors against the full table's 8 seed centroids
    // (collected once, bounded) and reduces to its own (cid, dim,
    // decimal Σv, count) increment — 512 rows per trigger — persisted
    // under its batch_id with dynamic overwrite (replays rewrite, never
    // double-count). Decimal partial sums are exact and order-free, so
    // the merged centroid means must equal q216's one-shot batch M-step
    // bit for bit — which is exactly what the oracle computes.
    "q234_stream_kmeans" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      val cents = CorpusQueries.centroidsOf(T.embeddings(s, d))
      val src = embSplitFixture(s, d)
      val base = graft.Scratch.runDir("graft_streamkm")
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          CorpusQueries.assignWith(batch, cents)
            .select(col("cid"), posexplode(col("embedding")))
            .select(col("cid"), col("pos").cast("long").as("dim"),
              col("col").cast("double").as("v"))
            .groupBy(col("cid"), col("dim"))
            .agg(sum(col("v").cast(
              org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))
              .as("sdec"), count(col("v")).as("cnt"))
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/inc")
          ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/inc")
        .groupBy(col("cid"), col("dim"))
        .agg(floor((sum(col("sdec")).cast("double") / sum(col("cnt"))) *
          lit(1000000L)).as("comp_micro"))
        .orderBy(col("cid"), col("dim"))
    }),

    // Per-source lexical-diversity census: token count, unigram type
    // count, type-token ratio, and Shannon entropy of the unigram AND
    // bigram distributions in floor-log2 millibits (surprisal of a type
    // with count c out of N = ilog2(N div c) whole bits — the engine-
    // exact quantization q204/q206 established; entropy = count-weighted
    // mean). The diversity drop that flags template-heavy or looping
    // sources before any model-based score. Scale shape: two vocabulary-
    // bounded (source, gram) groupBys with map-side combine; the
    // per-source rollup aggregates vocabulary-sized frames.
    "q236_source_entropy" -> ((s, d) => {
      def gramEntropy(grams: DataFrame, outCol: String): DataFrame = {
        val cnt = grams.groupBy(col("source"), col("g"))
          .agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
        cnt.join(broadcast(tot), "source")
          .select(col("source"), col("c"),
            ((length(bin(expr("n div c"))) - lit(1)).cast("long"))
              .as("bits"))
          .groupBy(col("source"))
          .agg(expr("(1000 * sum(c * bits)) div sum(c)").as(outCol))
      }
      val toks = T.documents(s, d)
        .select(col("source"), words.as("ws"))
      val uni = toks.select(col("source"), explode(col("ws")).as("g"))
      val bi = toks.select(col("source"),
        explode(CorpusQueries.bigramsOfWs).as("g"))
      val stats = uni.groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("g")).as("n_types"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("(1000 * n_types) div n_tokens").as("ttr_permille"))
      stats
        .join(gramEntropy(uni, "h_uni_millibits"), "source")
        .join(gramEntropy(bi, "h_bi_millibits"), "source")
        .orderBy(col("source"))
    }),

    // Vocabulary stability across corpus halves (the drift probe a
    // pipeline runs between crawl snapshots): split by doc_id parity,
    // take each half's top-200 bigrams (count desc, bigram asc), and
    // compare — overlap, set Jaccard, and total rank displacement over
    // the shared head. Scale shape: one vocabulary-bounded (half, gram)
    // groupBy; each head is TakeOrdered (per-partition heaps, no global
    // sort); ranks come from the bounded 200×200 triangle join (q220's
    // rank-without-window pattern); output is one row.
    "q237_vocab_stability" -> ((s, d) => {
      val bi = T.documents(s, d)
        .select((col("doc_id") % 2).as("half"), words.as("ws"))
        .select(col("half"), explode(CorpusQueries.bigramsOfWs).as("g"))
        .groupBy(col("half"), col("g")).agg(count(lit(1)).as("c"))
      def top(h: Int): DataFrame = {
        val t = bi.where(col("half") === h)
          .orderBy(col("c").desc, col("g")).limit(200)
        t.as("x").join(broadcast(t.as("y")),
            col("y.c") > col("x.c") ||
              (col("y.c") === col("x.c") && col("y.g") < col("x.g")),
            "left")
          .groupBy(col("x.g").as("g"))
          .agg((count(col("y.g")) + 1L).as("rnk"))
      }
      val a = top(0)
      val b = top(1)
      a.select(col("g"), col("rnk").as("ra"))
        .join(b.select(col("g"), col("rnk").as("rb")), Seq("g"),
          "full_outer")
        .agg(sum(when(col("ra").isNotNull, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("rb").isNotNull, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("ra").isNotNull && col("rb").isNotNull, 1L)
            .otherwise(0L)).as("n_overlap"),
          sum(when(col("ra").isNotNull && col("rb").isNotNull,
            abs(col("ra") - col("rb"))).otherwise(0L)).as("rank_disp"))
        .select(col("n_a"), col("n_b"), col("n_overlap"),
          expr("(1000 * n_overlap) div (n_a + n_b - n_overlap)")
            .as("jaccard_permille"),
          col("rank_disp"))
    }),

    // LSH banding S-curve audit: candidate volume and recall for the
    // four 16-component band configs (16×1, 8×2, 4×4, 2×8). "Truth" =
    // pairs with exact Jaccard ≥ 1/2 among the 16×1 SUPERSET (a pair
    // surfaced by any banding shares ≥ 1 component, so every config's
    // candidates are a subset of 16×1's — the denominator is exact
    // relative to that superset and deterministic in both engines; the
    // truly-unsurfaceable remainder has per-pair probability (1−J)^16 ≤
    // 2^−16 at J ≥ 1/2). The config sweep that picks bands×rows from
    // measured recall/volume, completing q235's threshold sweep.
    // Scale shape: all candidate exchanges carry bare id pairs; the
    // superset's exact-Jaccard verify joins features only for surfaced
    // pairs; J ≥ 1/2 is the cross-multiplied 3·|∩| ≥ na+nb — no
    // division; per-config stats are 1-row aggregates unioned.
    "q238_lsh_curve" -> ((s, d) => {
      // One band join builds the 16×1 superset; ONE pair-join pass then
      // decides everything per pair: the 16-component equality vector
      // (zip_with) gives each stricter config's membership (a pair is in
      // the (b, r) candidate set iff some contiguous r-run of components
      // is all-equal — digest equality on the band join is exactly
      // component-tuple equality), and the exact-Jaccard truth flag is
      // the cross-multiplied 3·|∩| ≥ na+nb. The per-config band
      // self-joins + semi-joins this replaces measured 10.6 s; all
      // curve rows fall out of a single 1-row aggregate, unpivoted.
      val feat = shingleFeat(s, d)
      val sup = candOf(feat, 16, 1)
      val flags = sup
        .join(feat.select(col("doc_id").as("a"), col("sigs").as("sa"),
          col("shs").as("xa"), col("nsh").as("na")), "a")
        .join(feat.select(col("doc_id").as("b"), col("sigs").as("sb"),
          col("shs").as("xb"), col("nsh").as("nb")), "b")
        .select(expr("zip_with(sa, sb, (x, y) -> x = y)").as("eq"),
          (lit(3) * size(array_intersect(col("xa"), col("xb"))) >=
            col("na") + col("nb")).as("tr"))
        .select(col("tr"),
          expr("exists(sequence(0, 7), j -> " +
            "element_at(eq, 2 * j + 1) AND element_at(eq, 2 * j + 2))")
            .as("m2"),
          expr("exists(sequence(0, 3), j -> " +
            "forall(slice(eq, 4 * j + 1, 4), v -> v))").as("m4"),
          expr("exists(sequence(0, 1), j -> " +
            "forall(slice(eq, 8 * j + 1, 8), v -> v))").as("m8"))
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      flags.agg(count(lit(1)).as("c1"), cnt(col("m2")).as("c2"),
          cnt(col("m4")).as("c4"), cnt(col("m8")).as("c8"),
          cnt(col("tr")).as("nt"),
          cnt(col("tr") && col("m2")).as("h2"),
          cnt(col("tr") && col("m4")).as("h4"),
          cnt(col("tr") && col("m8")).as("h8"))
        .select(explode(array(
          struct(lit(16L).as("bands"), lit(1L).as("rows_per_band"),
            col("c1").as("n_cand"), col("nt").as("n_truth"),
            col("nt").as("n_hit")),
          struct(lit(8L).as("bands"), lit(2L).as("rows_per_band"),
            col("c2").as("n_cand"), col("nt").as("n_truth"),
            col("h2").as("n_hit")),
          struct(lit(4L).as("bands"), lit(4L).as("rows_per_band"),
            col("c4").as("n_cand"), col("nt").as("n_truth"),
            col("h4").as("n_hit")),
          struct(lit(2L).as("bands"), lit(8L).as("rows_per_band"),
            col("c8").as("n_cand"), col("nt").as("n_truth"),
            col("h8").as("n_hit")))).as("r"))
        .select(col("r.bands").as("bands"),
          col("r.rows_per_band").as("rows_per_band"),
          col("r.n_cand").as("n_cand"), col("r.n_truth").as("n_truth"),
          col("r.n_hit").as("n_hit"),
          when(col("n_truth") > 0,
            expr("(1000 * n_hit) div n_truth")).otherwise(lit(0L))
            .as("recall_permille"),
          when(col("n_cand") > 0,
            expr("(1000 * n_hit) div n_cand")).otherwise(lit(0L))
            .as("purity_permille"))
        .orderBy(col("rows_per_band"))
    }),

    // Isotonic calibration of a quality-classifier score (PAV class —
    // the monotone fit behind every "keep docs above score t" filter
    // threshold: raw per-bin positive rates are noisy and need not be
    // monotone in the score, the isotonic fit is the best monotone
    // regression, and its value at t is the calibrated precision the
    // threshold actually buys). Score = n_chars binned into 16
    // equal-width buckets; labels = a deterministic noisy-threshold rule
    // (hash noise of amplitude 400 around the range midpoint) so bin
    // rates rise with score but wiggle. The fit uses the PAV minimax
    // identity iso(k) = max_{i<=k} min_{j>=k} mean(i..j) on bin prefix
    // sums — floor(1000·x) commutes with min/max, so the integer
    // permille minimax IS the floored exact PAV value. Scale shape: the
    // ONLY corpus pass is the 16-group map-side-combined binning agg;
    // prefix sums, the B² segment means, and the B³ minimax all live on
    // ≤16-row frames (no window, no collect) — corpus size never touches
    // the fit.
    "q267_isotonic_calibration" -> ((s, d) => {
      val docs = T.documents(s, d).select(col("doc_id"), col("n_chars"))
      val bounds = docs.agg(min(col("n_chars")).as("lo"),
        max(col("n_chars")).as("hi"))
      val labeled = docs.crossJoin(broadcast(bounds)).select(
        expr("((n_chars - lo) * 16) div (hi - lo + 1)").as("bin"),
        // per-doc hash noise (amplitude 400) + a per-BIN pseudo-random
        // threshold shift (amplitude 500): the shift plants genuine
        // rate inversions (4 at every tested SF) on top of the rising
        // trend, so the isotonic fit has actual pooling to do
        expr("CASE WHEN 2 * (n_chars - lo) " +
          "+ ((doc_id % 100000) * 2654435761) % 400 - 200 > hi - lo " +
          "+ ((((n_chars - lo) * 16) div (hi - lo + 1)) " +
          "* 1103515245) % 500 - 250 " +
          "THEN 1 ELSE 0 END").as("label"))
      val bins = labeled.groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("label")).as("n_pos"))
      // inclusive (p, w) and exclusive (ep, ew) prefixes via a B² self
      // join over the observed bins — bounded, windowless
      val pref = bins.as("a")
        .join(bins.as("b"), col("b.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("bin"))
        .agg(sum(col("b.n_pos")).as("p"), sum(col("b.n_docs")).as("w"),
          sum(when(col("b.bin") < col("a.bin"), col("b.n_pos"))
            .otherwise(0L)).as("ep"),
          sum(when(col("b.bin") < col("a.bin"), col("b.n_docs"))
            .otherwise(0L)).as("ew"))
      val pairs = pref.select(col("bin").as("i"), col("ep"), col("ew"))
        .join(pref.select(col("bin").as("j"), col("p"), col("w")),
          col("i") <= col("j"))
        .select(col("i"), col("j"),
          expr("(1000 * (p - ep)) div (w - ew)").as("seg_permille"))
      val ks = bins.select(col("bin").as("k"))
      val minj = pairs
        .join(ks, col("i") <= col("k") && col("k") <= col("j"))
        .groupBy(col("k"), col("i"))
        .agg(min(col("seg_permille")).as("mn"))
      val iso = minj.groupBy(col("k"))
        .agg(max(col("mn")).as("iso_permille"))
      bins.join(iso, col("bin") === col("k"))
        .select(col("bin"), col("n_docs"), col("n_pos"),
          expr("(1000 * n_pos) div n_docs").as("raw_permille"),
          col("iso_permille"))
        .orderBy(col("bin"))
    }),

    // Cross-language duplication flow (q226's provenance matrix keyed by
    // LANGUAGE): for every bag-of-words duplicate group spanning more
    // than one language, the unordered language-pair incidence — the
    // translated-boilerplate / cross-lingual-leakage audit (a dup group
    // straddling languages defeats per-language dedup and can leak eval
    // text across language splits). Scale shape: groups collapse to
    // distinct language sets map-side; pair expansion is per group over
    // ≤ |langs| members; the matrix is a bounded |langs|² aggregate.
    "q239_lang_copy_matrix" -> ((s, d) => {
      T.documents(s, d)
        .select(CorpusQueries.bowFingerprint.as("fp"), col("lang"))
        .groupBy(col("fp"))
        .agg(collect_set(col("lang")).as("ls"), count(lit(1)).as("n"))
        .where(col("n") > 1)
        .select(array_sort(col("ls")).as("ls"))
        .select(explode(
          CorpusQueries.sortedPairs("ls", "lang_a", "lang_b")).as("p"))
        .select(col("p.lang_a"), col("p.lang_b"))
        .groupBy(col("lang_a"), col("lang_b"))
        .agg(count(lit(1)).as("n_groups"))
        .orderBy(col("lang_a"), col("lang_b"))
    }),

    // Token-budget water-filling: allocate a 60%-of-corpus token budget
    // across sources — small sources keep their full demand, large ones
    // clip at the common level L chosen so the budget is exhausted (the
    // classic max-min fair allocator; the budget-constrained counterpart
    // to q233's weight schedule). Integer-exact: rank sources by demand
    // (asc, ties by name), j = last rank fully fundable
    // (prefix_r + d_r·(n−r) ≤ cap), L = (cap − prefix_j) div (n − j).
    // Scale shape: ONE corpus aggregate to |sources| rows; rank and
    // prefix come from a bounded triangle join (no window); every later
    // step is arithmetic on broadcast scalars.
    "q240_budget_waterfill" -> ((s, d) => {
      // materialize the |sources|-row demand frame ONCE: it feeds both
      // triangle-join sides, st, and the final projection — without the
      // checkpoint each reference re-scans the corpus (the "ONE corpus
      // aggregate" claim made literal)
      val dem = T.documents(s, d)
        .select(col("source"),
          size(split(trim(col("text")), " ")).cast("long").as("nw"))
        .groupBy(col("source")).agg(sum(col("nw")).as("d"))
        .localCheckpoint()
      val st = dem.agg(sum(col("d")).as("total"), count(lit(1)).as("n"))
        .select(col("total"), col("n"),
          expr("(6 * total) div 10").as("cap"))
      val ranked = dem.as("x")
        .join(broadcast(dem.as("y")),
          col("y.d") < col("x.d") ||
            (col("y.d") === col("x.d") &&
              col("y.source") <= col("x.source")))
        .groupBy(col("x.source").as("source"), col("x.d").as("d"))
        .agg(count(lit(1)).as("r"), sum(col("y.d")).as("prefix"))
      val jrow = ranked.crossJoin(broadcast(st))
        .agg(coalesce(max(when(
            col("prefix") + col("d") * (col("n") - col("r")) <= col("cap"),
            col("r"))), lit(0L)).as("j"),
          coalesce(max(when(
            col("prefix") + col("d") * (col("n") - col("r")) <= col("cap"),
            col("prefix"))), lit(0L)).as("prefj"))
      ranked.crossJoin(broadcast(st)).crossJoin(broadcast(jrow))
        .select(col("source"), col("d").as("demand_tokens"),
          when(col("r") <= col("j"), col("d"))
            .otherwise(expr("(cap - prefj) div (n - j)"))
            .as("alloc_tokens"),
          when(col("r") <= col("j"), 0L).otherwise(1L).as("clipped"))
        .orderBy(col("source"))
    })
  )

  /** Shared oracle CTE chain producing (est_permille, exact_permille) for
    * the LSH-surfaced pairs — the DuckDB mirror of [[minhashPairs]],
    * used by both the q231 histogram and the q235 threshold sweep. */
  private val pairsCte: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([w[i - 2] || ' ' || w[i - 1] || ' ' || w[i]
      |      for i in range(3, len(w) + 1)]) AS sh
      |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |sig AS (
      |  SELECT doc_id, k,
      |    MIN(md5(CAST(k AS VARCHAR) || ':' || sh)) AS sig
      |  FROM sh CROSS JOIN range(0, 16) t(k)
      |  GROUP BY doc_id, k),
      |bands AS (
      |  SELECT doc_id, k // 4 AS band,
      |    md5(string_agg(sig, '|' ORDER BY k)) AS bkey
      |  FROM sig GROUP BY doc_id, k // 4),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bands x JOIN bands y
      |    ON x.band = y.band AND x.bkey = y.bkey
      |    AND x.doc_id < y.doc_id),
      |agree AS (
      |  SELECT c.a, c.b,
      |    CAST((1000 * SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END))
      |      // 16 AS BIGINT) AS est_permille
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.a
      |  JOIN sig sb ON sb.doc_id = c.b AND sb.k = sa.k
      |  GROUP BY c.a, c.b),
      |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.a, c.b, COUNT(*) AS ni
      |  FROM cand c
      |  JOIN sh xa ON xa.doc_id = c.a
      |  JOIN sh xb ON xb.doc_id = c.b AND xb.sh = xa.sh
      |  GROUP BY c.a, c.b),
      |pairs AS (
      |  SELECT agree.est_permille,
      |    CAST((1000 * i.ni) // (na.nsh + nb.nsh - i.ni) AS BIGINT)
      |      AS exact_permille
      |  FROM agree
      |  JOIN inter i ON i.a = agree.a AND i.b = agree.b
      |  JOIN sizes na ON na.doc_id = agree.a
      |  JOIN sizes nb ON nb.doc_id = agree.b)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // same minimax-on-prefix-sums construction; all operands
    // non-negative so DuckDB's flooring // equals Spark's truncating div
    "q267_isotonic_calibration" ->
      """WITH bounds AS (
        |  SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents),
        |lab AS (
        |  SELECT ((n_chars - lo) * 16) // (hi - lo + 1) AS bin,
        |    CASE WHEN 2 * (n_chars - lo)
        |         + ((doc_id % 100000) * 2654435761) % 400 - 200
        |         > hi - lo
        |           + ((((n_chars - lo) * 16) // (hi - lo + 1))
        |              * 1103515245) % 500 - 250
        |      THEN 1 ELSE 0 END AS label
        |  FROM documents, bounds),
        |bins AS (SELECT bin, COUNT(*) AS n_docs, SUM(label) AS n_pos
        |         FROM lab GROUP BY bin),
        |pref AS (
        |  SELECT a.bin, SUM(b.n_pos) AS p, SUM(b.n_docs) AS w,
        |    SUM(CASE WHEN b.bin < a.bin THEN b.n_pos ELSE 0 END) AS ep,
        |    SUM(CASE WHEN b.bin < a.bin THEN b.n_docs ELSE 0 END) AS ew
        |  FROM bins a JOIN bins b ON b.bin <= a.bin GROUP BY a.bin),
        |pairs AS (
        |  SELECT i.bin AS i, j.bin AS j,
        |    (1000 * (j.p - i.ep)) // (j.w - i.ew) AS seg_permille
        |  FROM pref i JOIN pref j ON i.bin <= j.bin),
        |minj AS (
        |  SELECT k.bin AS k, pairs.i, MIN(seg_permille) AS mn
        |  FROM pairs JOIN bins k ON pairs.i <= k.bin AND k.bin <= pairs.j
        |  GROUP BY k.bin, pairs.i),
        |iso AS (SELECT k, CAST(MAX(mn) AS BIGINT) AS iso_permille
        |        FROM minj GROUP BY k)
        |SELECT b.bin, b.n_docs, CAST(b.n_pos AS BIGINT) AS n_pos,
        |  CAST((1000 * b.n_pos) // b.n_docs AS BIGINT) AS raw_permille,
        |  iso_permille
        |FROM bins b JOIN iso ON bin = k
        |ORDER BY bin""".stripMargin,

    "q230_fasttext_score" ->
      """WITH ws AS (
        |  SELECT doc_id, source,
        |    string_split(trim(lower(text)), ' ') AS w FROM documents),
        |f AS (
        |  SELECT doc_id, source, unnest(w) AS f FROM ws
        |  UNION ALL
        |  SELECT doc_id, source,
        |    unnest([w[i - 1] || '_' || w[i]
        |      for i in range(2, len(w) + 1)]) AS f
        |  FROM ws WHERE len(w) >= 2),
        |wt AS (
        |  SELECT printf('%02x', i) AS b, CAST((i * 37 + 11) % 15 AS BIGINT)
        |    AS w
        |  FROM range(0, 256) t(i)),
        |doc AS (
        |  SELECT doc_id, MAX(source) AS source, COUNT(*) AS nf,
        |    CAST(SUM(w) AS BIGINT) AS sw
        |  FROM (SELECT doc_id, source, substr(md5(f), 1, 2) AS b FROM f)
        |  JOIN wt USING (b) GROUP BY doc_id),
        |sc AS (
        |  SELECT source, (sw * 1000) // nf - 7000 AS logit_milli FROM doc)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  (CAST(SUM(CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000) // COUNT(*) AS kept_permille,
        |  MIN(logit_milli) AS min_logit, MAX(logit_milli) AS max_logit
        |FROM sc GROUP BY source ORDER BY source""".stripMargin,

    "q231_minhash_calibration" ->
      s"""$pairsCte
        |SELECT abs(est_permille - exact_permille) // 100 AS bucket,
        |  COUNT(*) AS n_pairs,
        |  CAST(SUM(est_permille) AS BIGINT) // COUNT(*)
        |    AS avg_est_permille,
        |  CAST(SUM(exact_permille) AS BIGINT) // COUNT(*)
        |    AS avg_exact_permille
        |FROM pairs GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q232_knn_graph" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 8),
        |asg AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(c.cvec AS DOUBLE[])) DESC,
        |      c.cid) AS rn
        |  FROM embeddings e CROSS JOIN cents c),
        |m AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
        |e AS (
        |  SELECT x.cid, x.vec_id AS src, y.vec_id AS dst,
        |    ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
        |      list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
        |                             CAST(y.embedding AS DOUBLE[])) DESC,
        |      y.vec_id) AS rnk
        |  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id <> y.vec_id),
        |ed AS (SELECT cid, src, dst FROM e WHERE rnk <= 3),
        |es AS (
        |  SELECT cid, COUNT(*) AS n_edges,
        |    CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM ed e2
        |      WHERE e2.src = ed.dst AND e2.dst = ed.src)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_recip
        |  FROM ed GROUP BY cid),
        |cells AS (SELECT cid, COUNT(*) AS n_vecs FROM m GROUP BY cid)
        |SELECT cells.cid, n_vecs,
        |  CAST(COALESCE(n_edges, 0) AS BIGINT) AS n_edges,
        |  CAST(COALESCE(n_recip, 0) AS BIGINT) AS n_recip,
        |  CASE WHEN COALESCE(n_edges, 0) > 0
        |    THEN (1000 * n_recip) // n_edges ELSE 0 END AS recip_permille
        |FROM cells LEFT JOIN es ON es.cid = cells.cid
        |ORDER BY cells.cid""".stripMargin,

    "q233_curriculum" ->
      """WITH perSrc AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
        |      AS toks,
        |    CAST(SUM((1000 * len(list_distinct(string_split(trim(lower(
        |      text)), ' ')))) // len(string_split(trim(lower(text)), ' ')))
        |      AS BIGINT) // COUNT(*) AS qs
        |  FROM documents GROUP BY source),
        |sched AS (
        |  SELECT CAST(e.epoch AS BIGINT) AS epoch, source,
        |    ((4 - e.epoch) * 1000 + (e.epoch - 1) * qs) // 3 AS w_milli,
        |    (toks * (((4 - e.epoch) * 1000 + (e.epoch - 1) * qs) // 3))
        |      // 1000 AS tokens_drawn
        |  FROM perSrc CROSS JOIN range(1, 5) e(epoch)),
        |tot AS (
        |  SELECT epoch, CAST(SUM(tokens_drawn) AS BIGINT) AS etot
        |  FROM sched GROUP BY epoch)
        |SELECT s.epoch, s.source, s.w_milli, s.tokens_drawn,
        |  (s.tokens_drawn * 1000) // t.etot AS share_permille
        |FROM sched s JOIN tot t ON t.epoch = s.epoch
        |ORDER BY s.epoch, s.source""".stripMargin,

    // streaming increments must merge to the one-shot batch M-step
    "q234_stream_kmeans" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 8),
        |a AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(c.cvec AS DOUBLE[])) DESC,
        |      c.cid) AS rn
        |  FROM embeddings e CROSS JOIN cents c),
        |x AS (
        |  SELECT cid, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(38,6)) AS v
        |  FROM a, range(1, 65) t(i) WHERE rn = 1)
        |SELECT cid, dim,
        |  CAST(FLOOR((CAST(SUM(v) AS DOUBLE) / COUNT(v)) * 1000000)
        |    AS BIGINT) AS comp_micro
        |FROM x GROUP BY cid, dim ORDER BY cid, dim""".stripMargin,

    "q235_threshold_sweep" ->
      s"""$pairsCte,
        |th AS (SELECT CAST(t.i * 100 AS BIGINT) AS threshold
        |       FROM range(5, 10) t(i)),
        |cls AS (
        |  SELECT threshold,
        |    CASE WHEN est_permille >= threshold
        |      AND exact_permille >= threshold THEN 1 ELSE 0 END AS tp,
        |    CASE WHEN est_permille >= threshold
        |      AND exact_permille < threshold THEN 1 ELSE 0 END AS fp,
        |    CASE WHEN est_permille < threshold
        |      AND exact_permille >= threshold THEN 1 ELSE 0 END AS fn
        |  FROM pairs CROSS JOIN th)
        |SELECT threshold, COUNT(*) AS n_cand,
        |  CAST(SUM(tp) AS BIGINT) AS tp, CAST(SUM(fp) AS BIGINT) AS fp,
        |  CAST(SUM(fn) AS BIGINT) AS fn,
        |  CAST(CASE WHEN SUM(tp) + SUM(fp) > 0
        |    THEN (1000 * CAST(SUM(tp) AS BIGINT)) // (SUM(tp) + SUM(fp))
        |    ELSE 0 END AS BIGINT) AS precision_permille,
        |  CAST(CASE WHEN SUM(tp) + SUM(fn) > 0
        |    THEN (1000 * CAST(SUM(tp) AS BIGINT)) // (SUM(tp) + SUM(fn))
        |    ELSE 0 END AS BIGINT) AS recall_permille
        |FROM cls GROUP BY threshold ORDER BY threshold""".stripMargin,

    "q236_source_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    string_split(trim(lower(text)), ' ') AS w FROM documents),
        |uni AS (SELECT source, unnest(w) AS g FROM toks),
        |bi AS (
        |  SELECT source, unnest([w[i - 1] || ' ' || w[i]
        |    for i in range(2, len(w) + 1)]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |ucnt AS (SELECT source, g, COUNT(*) AS c FROM uni
        |         GROUP BY source, g),
        |bcnt AS (SELECT source, g, COUNT(*) AS c FROM bi
        |         GROUP BY source, g),
        |utot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM ucnt
        |         GROUP BY source),
        |btot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM bcnt
        |         GROUP BY source),
        |uh AS (
        |  SELECT u.source,
        |    (1000 * CAST(SUM(u.c * (length(bin(t.n // u.c)) - 1))
        |      AS BIGINT)) // MAX(t.n) AS h_uni_millibits
        |  FROM ucnt u JOIN utot t ON t.source = u.source
        |  GROUP BY u.source),
        |bh AS (
        |  SELECT u.source,
        |    (1000 * CAST(SUM(u.c * (length(bin(t.n // u.c)) - 1))
        |      AS BIGINT)) // MAX(t.n) AS h_bi_millibits
        |  FROM bcnt u JOIN btot t ON t.source = u.source
        |  GROUP BY u.source),
        |stats AS (
        |  SELECT source, COUNT(*) AS n_tokens,
        |    CAST(COUNT(DISTINCT g) AS BIGINT) AS n_types,
        |    (1000 * CAST(COUNT(DISTINCT g) AS BIGINT)) // COUNT(*)
        |      AS ttr_permille
        |  FROM uni GROUP BY source)
        |SELECT s.source, s.n_tokens, s.n_types, s.ttr_permille,
        |  uh.h_uni_millibits, bh.h_bi_millibits
        |FROM stats s JOIN uh ON uh.source = s.source
        |JOIN bh ON bh.source = s.source ORDER BY s.source""".stripMargin,

    "q237_vocab_stability" ->
      """WITH bi AS (
        |  SELECT doc_id % 2 AS half,
        |    unnest([w[i - 1] || ' ' || w[i]
        |      for i in range(2, len(w) + 1)]) AS g
        |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2),
        |cnt AS (SELECT half, g, COUNT(*) AS c FROM bi GROUP BY half, g),
        |ta AS (
        |  SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, g) AS BIGINT)
        |    AS ra
        |  FROM cnt WHERE half = 0 ORDER BY c DESC, g LIMIT 200),
        |tb AS (
        |  SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, g) AS BIGINT)
        |    AS rb
        |  FROM cnt WHERE half = 1 ORDER BY c DESC, g LIMIT 200)
        |SELECT
        |  CAST(SUM(CASE WHEN ra IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_a,
        |  CAST(SUM(CASE WHEN rb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_b,
        |  CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |  CAST((1000 * SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |    THEN 1 ELSE 0 END)) //
        |    (SUM(CASE WHEN ra IS NOT NULL THEN 1 ELSE 0 END) +
        |     SUM(CASE WHEN rb IS NOT NULL THEN 1 ELSE 0 END) -
        |     SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |       THEN 1 ELSE 0 END)) AS BIGINT) AS jaccard_permille,
        |  CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |    THEN abs(ra - rb) ELSE 0 END) AS BIGINT) AS rank_disp
        |FROM ta FULL OUTER JOIN tb USING (g)""".stripMargin,

    "q238_lsh_curve" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([w[i - 2] || ' ' || w[i - 1] || ' ' || w[i]
        |      for i in range(3, len(w) + 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |sig AS (
        |  SELECT doc_id, k,
        |    MIN(md5(CAST(k AS VARCHAR) || ':' || sh)) AS sig
        |  FROM sh CROSS JOIN range(0, 16) t(k)
        |  GROUP BY doc_id, k),
        |cfg AS (SELECT * FROM (VALUES (16, 1), (8, 2), (4, 4), (2, 8))
        |        t(cb, rpb)),
        |bands AS (
        |  SELECT c.cb, c.rpb, s.doc_id, s.k // c.rpb AS band,
        |    md5(string_agg(s.sig, '|' ORDER BY s.k)) AS bkey
        |  FROM sig s CROSS JOIN cfg c
        |  GROUP BY c.cb, c.rpb, s.doc_id, s.k // c.rpb),
        |candc AS (
        |  SELECT DISTINCT x.cb, x.rpb, x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.cb = y.cb AND x.rpb = y.rpb AND x.band = y.band
        |    AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
        |sup AS (SELECT a, b FROM candc WHERE rpb = 1),
        |truth AS (
        |  SELECT s.a, s.b FROM sup s
        |  JOIN sizes na ON na.doc_id = s.a
        |  JOIN sizes nb ON nb.doc_id = s.b
        |  JOIN (SELECT c.a, c.b, COUNT(*) AS ni
        |        FROM sup c
        |        JOIN sh xa ON xa.doc_id = c.a
        |        JOIN sh xb ON xb.doc_id = c.b AND xb.sh = xa.sh
        |        GROUP BY c.a, c.b) i ON i.a = s.a AND i.b = s.b
        |  WHERE 3 * i.ni >= na.nsh + nb.nsh),
        |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
        |nc AS (SELECT cb, rpb, COUNT(*) AS n_cand FROM candc
        |       GROUP BY cb, rpb),
        |hit AS (
        |  SELECT c.cb, c.rpb, COUNT(*) AS n_hit
        |  FROM candc c JOIN truth t ON t.a = c.a AND t.b = c.b
        |  GROUP BY c.cb, c.rpb)
        |SELECT CAST(nc.cb AS BIGINT) AS bands,
        |  CAST(nc.rpb AS BIGINT) AS rows_per_band,
        |  nc.n_cand, nt.n_truth,
        |  CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
        |  CASE WHEN nt.n_truth > 0
        |    THEN (1000 * CAST(COALESCE(hit.n_hit, 0) AS BIGINT))
        |      // nt.n_truth ELSE 0 END AS recall_permille,
        |  CASE WHEN nc.n_cand > 0
        |    THEN (1000 * CAST(COALESCE(hit.n_hit, 0) AS BIGINT))
        |      // nc.n_cand ELSE 0 END AS purity_permille
        |FROM nc CROSS JOIN nt
        |LEFT JOIN hit ON hit.cb = nc.cb AND hit.rpb = nc.rpb
        |ORDER BY rows_per_band""".stripMargin,

    "q239_lang_copy_matrix" ->
      """WITH g AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(
        |      string_split(trim(lower(text)), ' '))), ',')) AS fp,
        |    list_sort(list_distinct(list(lang))) AS ls,
        |    COUNT(*) AS n
        |  FROM documents GROUP BY fp HAVING COUNT(*) > 1),
        |p AS (
        |  SELECT ls[i] AS lang_a, ls[j] AS lang_b
        |  FROM g, range(1, 1000) i(i), range(1, 1000) j(j)
        |  WHERE i < j AND j <= len(ls))
        |SELECT lang_a, lang_b, COUNT(*) AS n_groups
        |FROM p GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b""".stripMargin,

    "q240_budget_waterfill" ->
      """WITH dem AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS d
        |  FROM documents GROUP BY source),
        |st AS (
        |  SELECT CAST(SUM(d) AS BIGINT) AS total, COUNT(*) AS n,
        |    (6 * CAST(SUM(d) AS BIGINT)) // 10 AS cap
        |  FROM dem),
        |rk AS (
        |  SELECT source, d,
        |    CAST(ROW_NUMBER() OVER (ORDER BY d, source) AS BIGINT) AS r,
        |    CAST(SUM(d) OVER (ORDER BY d, source
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
        |  FROM dem),
        |jrow AS (
        |  SELECT
        |    COALESCE(MAX(CASE WHEN prefix + d * (n - r) <= cap
        |      THEN r END), 0) AS j,
        |    COALESCE(MAX(CASE WHEN prefix + d * (n - r) <= cap
        |      THEN prefix END), 0) AS prefj
        |  FROM rk CROSS JOIN st)
        |SELECT source, d AS demand_tokens,
        |  CASE WHEN r <= j THEN d
        |    ELSE (cap - prefj) // (n - j) END AS alloc_tokens,
        |  CASE WHEN r <= j THEN CAST(0 AS BIGINT)
        |    ELSE CAST(1 AS BIGINT) END AS clipped
        |FROM rk CROSS JOIN st CROSS JOIN jrow
        |ORDER BY source""".stripMargin
  )
}

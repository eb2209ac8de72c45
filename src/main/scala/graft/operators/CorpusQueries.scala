package graft.operators

import graft.{Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval + curation — the lexical-retrieval and cluster-curation
  * shapes that sit beside the model-based filters (QualityQueries) in a
  * pretraining pipeline:
  *
  *  - q211: BM25 ranked retrieval (Robertson & Spärck Jones probabilistic
  *    relevance; k1 = 1.2, b = 0.75) over the corpus for a fixed query —
  *    the lexical-search counterpart to q165's postings and q180's
  *    retrieval metrics.
  *  - q212: the Lloyd assignment step (E-step) of spherical k-means over
  *    the embedding corpus against fixed seed centroids — the clustering
  *    primitive under IVF (q91), SemDeDup (q194), and cluster-balanced
  *    curation.
  *  - q213: per-source quantile quality gate — keep the top 30% of each
  *    source by a structural quality score (the per-source percentile
  *    thresholding FineWeb/RefinedWeb apply instead of one global cutoff).
  *  - q214: cluster-prototype selection — within each k-means cluster keep
  *    the 3 most prototypical members (highest cosine to the centroid),
  *    the "keep the exemplars" half of cluster-based pruning (SemDeDup /
  *    SSL-prototypes keep-or-drop decisions).
  *  - q215: bigram vocabulary-growth curve (Heaps' law probe) — new bigram
  *    types per corpus octile, the saturation diagnostic that tells a
  *    pipeline when more raw data stops buying new phrasing.
  *  - q216/q217: the Lloyd M-step (decimal-exact centroid means) and
  *    incremental inverted-index maintenance (O(batch) delta = rebuild).
  *  - q218-q220: cluster-balanced sampling, df-capped lexical TF-IDF
  *    cosine pairs, and hybrid retrieval with reciprocal-rank fusion.
  *  - q221-q223: the quantile gate inside the streaming engine
  *    (histogram increments, replay-idempotent), group-aware
  *    leakage-free splitting, and the packing-efficiency account.
  *  - q224-q228: count-min join-size estimation, the quality×duplication
  *    matrix, the inter-source duplication-flow matrix, length-bucketed
  *    batching, and cross-source boilerplate detection.
  *
  * Quantization convention (same as QualityQueries): anything log-shaped
  * uses engine-exact floor-log2 bits (length(bin(x)) - 1); anything
  * rational uses milli-units via integer `div`, so the DuckDB oracle
  * hash-matches bit for bit. Cosine comparisons ride the same
  * double-kernel equivalence q33/q91 already prove green.
  *
  * Scale shapes worth naming: the k-means assignment is a single
  * codegen'd greatest-of-structs projection (no join, no window, no 8×
  * expansion); the quantile gate reads its percentile off a bounded
  * (source, score-permille) histogram instead of ranking documents; the
  * prototype top-3 is the bounded-heap TopKAgg. None of the five shuffles
  * anything wider than ids + small integers.
  */
object CorpusQueries {

  /** Exact wide-integer type for count-product arithmetic that crosses
    * int64 at corpus scale — mirrors DuckDB's silent HUGEINT widening
    * (the q142/q257 overflow rule). */
  private val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** floor(log2(x)) for x >= 1, engine-exact (DuckDB: length(bin(x)) - 1). */
  private def ilog2(c: Column): Column = (length(bin(c)) - lit(1)).cast("long")

  /** Nearest-seed assignment: argmax cosine over the first 8 corpus
    * vectors (a fixed, reproducible init — k-means++ would be data-order-
    * dependent across engines), ties to the lowest centroid id. The
    * 8-row centroid collect is bounded (the ivfCentroids pattern); the
    * argmax is then ONE codegen'd greatest-of-structs projection per row
    * (struct compares cos first, then the negated id, so equal cosines
    * resolve to the LOWEST cid) — zero shuffle, zero window, no 8×
    * row expansion. The same kernel [[graft.functions.VectorOps.dotF]]
    * backs q33/q91, whose gates prove it bitwise-equal to DuckDB's
    * list_cosine_similarity. */
  private[operators] def assign(emb: DataFrame): DataFrame =
    assignWith(emb, centroidsOf(emb))

  /** The 8 seed centroids (vec_id < 8) — a bounded collect (ivfCentroids
    * pattern), shared by the batch assignment and q234's streaming M-step
    * (whose micro-batches need the FULL table's seeds, not the batch's). */
  private[operators] def centroidsOf(emb: DataFrame): Array[(Long, Seq[Float])] =
    emb.where(col("vec_id") < 8) // bounded: 8 seed centroids
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)

  private[operators] def assignWith(emb: DataFrame,
      cents: Array[(Long, Seq[Float])]): DataFrame = {
    val cells = cents.map { case (cid, cvec) =>
      val c = typedlit(cvec)
      struct(
        (graft.functions.VectorOps.dotF(col("embedding"), c) /
          (graft.functions.VectorOps.normF(col("embedding")) *
            graft.functions.VectorOps.normF(c))).as("cos"),
        lit(-cid).as("ncid"))
    }
    val g = greatest(cells.toSeq: _*)
    emb.select(col("vec_id"), col("label"), col("embedding"),
      (-g.getField("ncid")).cast("long").as("cid"),
      g.getField("cos").as("cos"))
  }

  /** Bag-of-words duplicate-group fingerprint — ONE definition for the
    * group splitter (q222), the audits (q225/q226), and the language
    * provenance matrix (q239 in CalibrationQueries), so the group key can
    * never drift between them. */
  private[operators] def bowFingerprint: Column =
    md5(concat_ws(",",
      array_sort(array_distinct(split(trim(lower(col("text"))), " ")))))

  /** Ordered-pair expansion of a SORTED array column: struct(x, y) for
    * every x before y — |set|²-bounded, the q226/q239/q248 matrix shape. */
  private[operators] def sortedPairs(setCol: String, aName: String,
      bName: String): Column =
    expr(s"flatten(transform($setCol, (x, i) -> " +
      s"transform(slice($setCol, i + 2, size($setCol)), y -> " +
      s"struct(x AS $aName, y AS $bName))))")

  /** Guarded space-joined bigram array over a `ws` token-array column —
    * the q178-hazard-guarded expansion, ONE definition for q215/q236/
    * q237 (q230's feature variant joins with '_' and stays local). */
  private[operators] def bigramsOfWs: Column =
    when(size(col("ws")) >= 2,
      expr("transform(sequence(2, size(ws)), i -> " +
        "concat(element_at(ws, i - 1), ' ', element_at(ws, i)))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))

  /** q213/q221's structural quality score: distinct-word ratio in
    * permille, integer-exact. ONE definition for the batch gate and the
    * streaming decomposition so the two can never drift. */
  private[operators] def permilleScore: Column =
    expr("(1000 * size(array_distinct(split(trim(lower(text)), ' ')))) " +
      "div size(split(trim(lower(text)), ' '))").cast("long")

  /** Per-source quantile summary off a merged (source, score) histogram —
    * the shared tail of q213 (one-shot) and q221 (streamed increments). */
  private def quantileSummary(hist: DataFrame): DataFrame =
    hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("score").desc)))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        expr("max(n) * 3 div 10").as("n_kept"),
        min(when(col("cum") - col("c") < expr("n * 3 div 10"),
          col("score"))).as("threshold_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("source"))

  /** documents as 3 parquet files (doc_id, text, source) — the streaming
    * fixture for q221's per-file triggers; built once per sf. */
  private[graft] def docsSourceSplitFixture(s: SparkSession, d: String)
      : String = {
    val out = graft.Scratch.fixtureDir(d, "docs_split3src")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.documents(s, d).select(col("doc_id"), col("text"), col("source"))
        .repartition(3).write.mode("overwrite").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 ranked retrieval for the fixed query {dup, spark, vector}:
    //   idf(w)   = floor(log2((2N) div (2·df + 1)))          [whole bits —
    //              terms in most documents correctly score ~0]
    //   tf-part  = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) in
    //              milli-units with k1 = 1.2, b = 0.75, every division an
    //              integer div over positive operands.
    //   score    = Σ idf_bits · tf_milli; top 20 by (score desc, doc_id).
    // Scale shape: tokens filter to query terms BEFORE any shuffle (the
    // per-(doc,term) tf groupBy only sees matching tokens), df and the
    // corpus stats are term-/scalar-sized and broadcast back, and the
    // top-20 is TakeOrdered (per-partition heaps), never a global sort
    // or window.
    "q211_bm25" -> ((s, d) => {
      val docs = T.documents(s, d)
        .select(col("doc_id"),
          split(trim(lower(col("text"))), " ").as("ws"))
        .select(col("doc_id"), col("ws"),
          size(col("ws")).cast("long").as("dl"))
      val st = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
        .select(col("n"), expr("sumdl * 1000 div n").as("avgdl_milli"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
        .where(col("w").isin("dup", "spark", "vector"))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), Seq("w"))
        .crossJoin(broadcast(st))
        .select(col("doc_id"),
          (ilog2(expr("(2 * n) div (2 * df + 1)")) *
            expr("(tf * 2200 * 1000) div (tf * 1000 + " +
              "(1200 * (250 + (750 * dl * 1000) div avgdl_milli)) " +
              "div 1000)")).as("contrib"))
        .groupBy(col("doc_id"))
        .agg(sum(col("contrib")).as("score_milli"))
        .orderBy(col("score_milli").desc, col("doc_id"))
        .limit(20)
    }),

    // Spherical k-means Lloyd assignment (E-step) against the 8 seed
    // centroids: per-cluster population + label mass + id range — the
    // cluster census a curation pipeline prints after every refinement
    // round. The M-step (mean of assigned vectors) is IVF's
    // kmeansCentroids (q91) territory; this gate pins the assignment
    // semantics those build on.
    "q212_kmeans_assign" -> ((s, d) => {
      assign(T.embeddings(s, d))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("label")).cast("long").as("label_mass"),
          min(col("vec_id")).as("min_vec"),
          max(col("vec_id")).as("max_vec"))
        .orderBy(col("cid"))
    }),

    // Per-source quantile quality gate: score = distinct-word ratio in
    // permille (integer-exact); keep the top 30% of each source (ties to
    // the lower doc_id). Emits per source the kept count and the realized
    // threshold (min kept score). Scale shape: the score domain is
    // BOUNDED (0..1000 permille), so the quantile comes from a
    // (source, score) HISTOGRAM — one partial-aggregated groupBy onto
    // ≤ 1001 rows per source — never a per-document rank: the k-th doc's
    // score is the first histogram bucket (score desc) whose running
    // count reaches k = 3n div 10. A per-doc window here would sort
    // n/|sources| rows in ONE task per source at 100 TB; the histogram
    // window sorts ≤ 1001.
    "q213_quantile_gate" -> ((s, d) => {
      quantileSummary(
        T.documents(s, d)
          .select(col("source"), permilleScore.as("score"))
          .groupBy(col("source"), col("score"))
          .agg(count(lit(1)).as("c")))
    }),

    // q213 inside the streaming engine (q210's streaming-equals-batch
    // contract applied to the quantile gate): each micro-batch reduces
    // to ITS OWN (source, score) histogram increment — O(batch) rows,
    // bounded by |sources| × 1001 — persisted under its batch_id with
    // dynamic partition overwrite (a replayed trigger rewrites, never
    // double-counts). The final summary merges the bounded increments
    // and must equal the one-shot batch gate exactly, which is what the
    // oracle (q213's per-doc window SQL) checks. Histograms are the
    // canonical mergeable quantile state: increments sum, order never
    // matters.
    "q221_stream_quantile" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      val src = docsSourceSplitFixture(s, d)
      val base = graft.Scratch.runDir("graft_streamq")
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          batch.select(col("source"), permilleScore.as("score"))
            .groupBy(col("source"), col("score"))
            .agg(count(lit(1)).as("c"))
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/hist")
          ()
        }
        .start()
      q.awaitTermination()
      quantileSummary(
        s.read.parquet(s"$base/hist")
          .groupBy(col("source"), col("score"))
          .agg(sum(col("c")).as("c")))
    }),

    // Cluster-prototype selection: the 3 non-seed members of each k-means
    // cluster closest to the centroid (cosine desc, ties to the lower
    // vec_id) — the exemplar set cluster-based pruning keeps. Rides q212's
    // assignment; the per-cluster top-3 is the bounded-heap [[TopKAgg]]
    // (identical ordering contract: score desc, id asc), so each map task
    // ships ≤ 3 entries per cluster — a cid-partitioned window would
    // instead sort n/k rows in ONE task per cluster at 100 TB.
    "q214_prototypes" -> ((s, d) => {
      assign(T.embeddings(s, d))
        .where(col("vec_id") >= 8)
        .groupBy(col("cid"))
        .agg(graft.functions.TopKAgg.topkAgg(
          col("cos"), col("vec_id"), 3).as("top"))
        .select(col("cid"), posexplode(col("top")))
        .select(col("cid"), (col("pos") + 1).as("prank"),
          col("col.id").as("vec_id"))
        .orderBy(col("cid"), col("prank"))
    }),

    // The Lloyd M-step completing q212's E-step — one FULL k-means
    // iteration, engine-exact: each cluster's new centroid is the
    // per-dimension mean of its members, computed through Det's
    // decimal-routed sums (double SUM is partition-order-dependent;
    // DECIMAL(38,6) addition is exact and order-free, and both engines
    // cast each component to the same decimal), then quantized to
    // micro-units. Scale shape: posexplode fans each vector into 64
    // (cid, dim, v) rows, and the groupBy's partial aggregation
    // collapses every map task to ≤ 8×64 decimal sums before the
    // exchange — the shuffle carries 512 rows per task regardless of
    // corpus size. Output: the 512 new centroid components.
    "q216_lloyd_round" -> ((s, d) => {
      assign(T.embeddings(s, d))
        .select(col("cid"), posexplode(col("embedding")))
        .select(col("cid"), col("pos").cast("long").as("dim"),
          col("col").cast("double").as("v"))
        .groupBy(col("cid"), col("dim"))
        .agg(floor(graft.Det.davg(col("v")) * lit(1000000L))
          .as("comp_micro"))
        .orderBy(col("cid"), col("dim"))
    }),

    // Incremental inverted-index maintenance (q117's incremental
    // contract applied to q165/q211's index): the corpus splits into a
    // base (doc_id % 10 <> 9) and an arriving batch (doc_id % 10 = 9);
    // the base document-frequency index is built once, the batch
    // contributes ONLY its own token stream (O(batch), never a corpus
    // rescan), and the merged index must equal a from-scratch rebuild
    // over the full corpus — which is exactly what the oracle computes.
    // The merge is a vocabulary-sized full outer join (word, df) +
    // (word, df_delta); nothing proportional to the base corpus moves.
    "q217_incremental_index" -> ((s, d) => {
      val toks = T.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), " ")).as("word"))
        .distinct()
      val base = toks.where(col("doc_id") % 10 =!= 9)
        .groupBy(col("word")).agg(count(lit(1)).as("df"))
      val delta = toks.where(col("doc_id") % 10 === 9)
        .groupBy(col("word")).agg(count(lit(1)).as("dfd"))
      base.join(delta, Seq("word"), "full_outer")
        .select(col("word"),
          (coalesce(col("df"), lit(0L)) +
            coalesce(col("dfd"), lit(0L))).as("df"))
        .orderBy(col("word"))
    }),

    // Cluster-balanced sampling (the DataComp/SSL-curation shape: equal
    // picks per embedding cluster, not per source): each k-means cluster
    // contributes its 2 deterministically-"random" documents — the two
    // smallest md5(doc_id) draws, q158's reservoir semantic. The
    // embedding table joins documents on vec_id = doc_id (the fixture's
    // contract: one vector per document). Scale shape: NO per-cluster
    // window — pick 1 is a min-of-struct aggregate (8 groups, partial
    // agg), pick 2 re-aggregates with the 8-row winners broadcast back;
    // two bounded passes, never a per-cluster sort.
    "q218_cluster_sample" -> ((s, d) => {
      val base = assign(T.embeddings(s, d))
        .select(col("vec_id").as("doc_id"), col("cid"))
        .join(T.documents(s, d).select(col("doc_id")), "doc_id")
        .select(col("cid"), col("doc_id"),
          md5(concat(lit("s1:"), col("doc_id"))).as("h"))
      val p1 = base.groupBy(col("cid"))
        .agg(min(struct(col("h"), col("doc_id"))).as("w"))
        .select(col("cid"), col("w.h").as("h1"),
          col("w.doc_id").as("doc_id"))
      val p2 = base
        .join(broadcast(p1.select(col("cid"), col("h1"))), "cid")
        .where(col("h") > col("h1"))
        .groupBy(col("cid"))
        .agg(min(struct(col("h"), col("doc_id"))).as("w"))
        .select(col("cid"), col("w.doc_id").as("doc_id"))
      p1.select(col("cid"), lit(1L).as("rnk"), col("doc_id"))
        .union(p2.select(col("cid"), lit(2L).as("rnk"), col("doc_id")))
        .orderBy(col("cid"), col("rnk"))
    }),

    // Lexical TF-IDF cosine near-dup pairs — the sparse-vector
    // counterpart to q32's embedding cosine: candidate pairs come ONLY
    // from the rare-term postings (df <= least(N div 10, 100) — the
    // proportional bound drops stop-word-frequency terms, and the
    // ABSOLUTE ceiling bounds per-term pair fan-out at C(100,2) no
    // matter the corpus: a proportional-only cap admits a df = N/10 term
    // whose C(df,2) pairs grow quadratically with the corpus — the sf1
    // probe measured exactly that blowup before the ceiling), then the
    // EXACT integer tf-vector cosine over
    // the full vocabulary qualifies each pair with a cross-multiplied
    // comparison (4·dot² >= na·nb ⇔ cos >= 0.5) — no sqrt, no doubles.
    // Scale shape: the candidate exchange carries bare (a, b) id pairs;
    // the tf re-join brings integer term weights, never text.
    "q219_tfidf_pairs" -> ((s, d) => {
      val tf = T.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val norms = tf.groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("tf")).as("nn"))
      val st = T.documents(s, d).agg(count(lit(1)).as("n"))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val rare = df.crossJoin(broadcast(st))
        .where(col("df") <= least(expr("n div 10"), lit(100L)))
        .select(col("w"))
      // NO broadcast hint on rare: in a Zipf corpus the df<=100 tail IS
      // most of the vocabulary, so forcing it to the driver is an OOM at
      // scale — a shuffle semi join keyed on w is the safe shape (the
      // posting-length cap below bounds the PAIR fan-out, not |rare|)
      val post = tf.join(rare, Seq("w"), "left_semi")
        .select(col("w"), col("doc_id"))
      val cand = post.as("x").join(post.as("y"), "w")
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val dots = cand
        .join(tf.select(col("doc_id").as("a"), col("w"),
          col("tf").as("ta")), "a")
        .join(tf.select(col("doc_id").as("b"), col("w"),
          col("tf").as("tb")), Seq("b", "w"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("ta") * col("tb")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("a"), col("nn").as("na")), "a")
        .join(norms.select(col("doc_id").as("b"), col("nn").as("nb")), "b")
        // dot/na/nb are per-pair-bounded but their squares/products cross
        // int64 for pathological term-repetition docs — form the
        // cross-multiplied comparison in DECIMAL(38,0) like the oracle's
        // HUGEINT arithmetic (q142/q257 rule)
        .where(lit(4) * col("dot").cast(dec38) * col("dot") >=
          col("na").cast(dec38) * col("nb"))
        .select(col("a"), col("b"), col("dot"), col("na"), col("nb"))
        .orderBy(col("a"), col("b"))
    }),

    // Hybrid retrieval with reciprocal-rank fusion (the RAG-stack shape:
    // a lexical ranking and a vector ranking over the same corpus, fused
    // as Σ 1e6 div (60 + rank) — RRF's k=60, integer-exact in
    // micro-units). Query = document/vector 0. Scale shape: the lexical
    // arm broadcasts doc 0's tf vector into one integer-dot aggregate;
    // the vector arm is the same codegen'd cosine projection as q212;
    // each arm's top-20 is TakeOrdered; ranks derive from a 20×20
    // triangle join over the bounded heads (count of strictly-better
    // rows + 1) — no window anywhere, bounded or not.
    "q220_hybrid_rrf" -> ((s, d) => {
      // lexical arm: integer tf dot against doc 0
      val tf = T.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val q0 = tf.where(col("doc_id") === 0)
        .select(col("w"), col("tf").as("qtf"))
      val lexTop = tf.where(col("doc_id") =!= 0)
        .join(broadcast(q0), "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("qtf")).as("dot"))
        .orderBy(col("dot").desc, col("doc_id")).limit(20)
      val lrank = lexTop.as("x")
        .join(broadcast(lexTop.as("y")),
          col("y.dot") > col("x.dot") ||
            (col("y.dot") === col("x.dot") &&
              col("y.doc_id") < col("x.doc_id")),
          "left")
        .groupBy(col("x.doc_id").as("doc_id"))
        .agg((count(col("y.doc_id")) + 1L).as("lrank"))
      // vector arm: codegen'd cosine against vector 0
      val emb = T.embeddings(s, d)
      val v0 = typedlit(emb.where(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0))
      val vecTop = emb.where(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          (graft.functions.VectorOps.dotF(col("embedding"), v0) /
            (graft.functions.VectorOps.normF(col("embedding")) *
              graft.functions.VectorOps.normF(v0))).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(20)
      val vrank = vecTop.as("x")
        .join(broadcast(vecTop.as("y")),
          col("y.cos") > col("x.cos") ||
            (col("y.cos") === col("x.cos") &&
              col("y.doc_id") < col("x.doc_id")),
          "left")
        .groupBy(col("x.doc_id").as("doc_id"))
        .agg((count(col("y.doc_id")) + 1L).as("vrank"))
      lrank.join(vrank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lrank"), col("vrank"),
          (coalesce(expr("1000000 div (60 + lrank)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + vrank)"), lit(0L)))
            .as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
    }),

    // Group-aware train/val/test split: q98 splits per DOCUMENT by
    // content hash; this splits per DUPLICATE GROUP — the group key is
    // the bag-of-words signature (sorted distinct vocabulary, i.e.
    // unigram-set Jaccard = 1.0 — a strictly coarser grouping than q29's
    // canonical text, with real multi-member groups on this corpus), so
    // a duplicate group can never straddle a split boundary — the
    // structural fix for the leakage q207 audits. Assignment hashes the
    // GROUP key (first md5 nibble: 0-b train 12/16, c-d val, e-f test),
    // and every member inherits it. One fingerprint groupBy + one row
    // per split out; nothing wider than (fp, count) shuffles.
    "q222_group_split" -> ((s, d) => {
      val groups = T.documents(s, d).select(bowFingerprint.as("fp"))
        .groupBy(col("fp")).agg(count(lit(1)).as("n"))
      val nib = substring(md5(concat(lit("split:"), col("fp"))), 1, 1)
      groups
        .select(col("n"),
          when(nib <= "b", "train").when(nib <= "d", "val")
            .otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_docs"))
        .orderBy(col("split"))
    }),

    // Sequence-packing efficiency report: the padding account that
    // decides between per-document packing (each doc padded to its own
    // ceil(nw/2048) blocks) and GPT-style concat packing (q69/q208's
    // ceil(total/2048)). Integer-exact; one aggregate pass over per-row
    // token counts, one row out.
    "q223_packing_efficiency" -> ((s, d) => {
      T.documents(s, d)
        .select(size(split(trim(col("text")), " ")).cast("long").as("nw"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("total_tokens"),
          expr("(sum(nw) + 2047) div 2048").as("seqs_concat"),
          sum(expr("(nw + 2047) div 2048")).as("seqs_perdoc"))
        .select(col("n_docs"), col("total_tokens"), col("seqs_concat"),
          col("seqs_perdoc"),
          (col("seqs_perdoc") * 2048 - col("total_tokens"))
            .as("pad_tokens"),
          expr("((seqs_perdoc * 2048 - total_tokens) * 1000) div " +
            "(seqs_perdoc * 2048)").as("waste_permille"))
    }),

    // Count-min join-size estimation — the sketch-based cardinality
    // primitive under cost-based join planning (the estimate an
    // optimizer consults before picking broadcast vs shuffle): the exact
    // size of events ⋈ orders on (user_id = o_custkey) vs the CM inner-
    // product estimate Σ_j a[j]·b[j] over two independent 256-bucket
    // hash rows (md5 hex pairs 1-2 and 3-4 — engine-identical; W scales
    // to 2^20 in production, the fixture keeps the table readable),
    // taking the
    // row-wise min. The estimate is a PROVEN upper bound (CM inner
    // products only over-count), which the output exposes as err
    // permille. Scale shape: each sketch row is a 256-bucket aggregate
    // (map-side combine onto 256 rows per side), the join of two
    // 256-row sketches is trivial, and the exact side shuffles only
    // (key, count) pairs.
    "q224_join_size_estimate" -> ((s, d) => {
      val ev = T.events(s, d).select(col("user_id").cast("long").as("k"))
      val od = T.orders(s, d).select(col("o_custkey").cast("long").as("k"))
      def cm(side: DataFrame, off: Int, name: String): DataFrame =
        side.select(
            substring(md5(col("k").cast("string")), off, 2).as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as(name))
      // bucket-count / per-key-count products overflow int64 at corpus
      // scale (q142/q257 rule) — accumulate in DECIMAL(38,0), then the
      // same BIGINT cast the oracle applies
      def est(off: Int, name: String): DataFrame =
        cm(ev, off, "ca").join(cm(od, off, "cb"), "b")
          .agg(coalesce(sum(col("ca").cast(dec38) * col("cb"))
            .cast("long"), lit(0L)).as(name))
      val exact = ev.groupBy(col("k")).agg(count(lit(1)).as("na"))
        .join(od.groupBy(col("k")).agg(count(lit(1)).as("nb")), "k")
        .agg(coalesce(sum(col("na").cast(dec38) * col("nb"))
          .cast("long"), lit(0L)).as("exact"))
      exact
        .crossJoin(broadcast(est(1, "est_row1")))
        .crossJoin(broadcast(est(3, "est_row2")))
        .select(col("exact"), col("est_row1"), col("est_row2"),
          least(col("est_row1"), col("est_row2")).as("est_min"))
        .select(col("exact"), col("est_row1"), col("est_row2"),
          col("est_min"),
          // guarded: a disjoint key set makes exact 0, and ANSI-mode
          // div-by-zero would throw where DuckDB's // yields NULL
          expr("CASE WHEN exact > 0 THEN ((est_min - exact) * 1000) " +
            "div exact END").as("err_permille"))
    }),

    // Quality-decile × duplication-rate matrix — the cross-signal audit
    // a curation pipeline runs before composing filters ("are low-
    // quality documents also the duplicated ones?"): per permille-score
    // bucket (score div 100, 11 bounded buckets), the share of documents
    // whose bag-of-words group (q222's key) has more than one member.
    // Scale shape: one fingerprint groupBy (map-side combined), the
    // >1-member groups broadcast back as a semi-joinable set, and the
    // matrix is an 11-row aggregate.
    "q225_quality_dup_matrix" -> ((s, d) => {
      val docs = T.documents(s, d)
        .select(col("doc_id"), bowFingerprint.as("fp"),
          permilleScore.as("score"))
      val dupFps = docs.groupBy(col("fp")).agg(count(lit(1)).as("n"))
        .where(col("n") > 1).select(col("fp"))
      docs
        .join(broadcast(dupFps.withColumn("isdup", lit(1L))),
          Seq("fp"), "left")
        .select(expr("score div 100").as("bucket"),
          coalesce(col("isdup"), lit(0L)).as("isdup"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("isdup")).as("n_dup"),
          expr("(sum(isdup) * 1000) div count(*)").as("dup_permille"))
        .orderBy(col("bucket"))
    }),

    // Inter-source duplication flow: for every multi-member duplicate
    // group (q222's bag-of-words key), the unordered source-pair
    // incidence — "which sources copy from which", the provenance matrix
    // a curation team reads before deciding which feed to drop. Scale
    // shape: groups collapse to their distinct source sets (fingerprint
    // groupBy, map-side combined), pair expansion happens per group on
    // its ≤ |sources| distinct members, and the matrix is a bounded
    // |sources|² aggregate.
    "q226_source_copy_matrix" -> ((s, d) => {
      val groups = T.documents(s, d)
        .select(bowFingerprint.as("fp"), col("source"))
        .groupBy(col("fp"))
        .agg(collect_set(col("source")).as("srcs"),
          count(lit(1)).as("n"))
        .where(col("n") > 1)
        .select(array_sort(col("srcs")).as("srcs"))
      groups
        .select(explode(
          sortedPairs("srcs", "src_a", "src_b")).as("p"))
        .select(col("p.src_a"), col("p.src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_groups"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Length-bucketed batching account — the inference-efficiency cousin
    // of q223's training-packing account: bucket documents by
    // 32-token-ceiling length classes; per bucket, the padding cost of
    // batching at the bucket ceiling vs the corpus-max ceiling. All
    // integer; per-row bucketing + one bounded aggregate (≤ maxlen/32
    // buckets), with the corpus max broadcast from a 1-row aggregate.
    "q227_length_buckets" -> ((s, d) => {
      val m = T.documents(s, d)
        .select(size(split(trim(col("text")), " ")).cast("long").as("nw"))
        .select(col("nw"), expr("((nw + 31) div 32) * 32").as("ceil32"))
      val mx = m.agg(max(col("ceil32")).as("gmax"))
      m.crossJoin(broadcast(mx))
        .groupBy(col("ceil32"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("tokens"),
          (sum(col("ceil32") - col("nw"))).as("pad_bucketed"),
          sum(col("gmax") - col("nw")).as("pad_global"))
        .orderBy(col("ceil32"))
    }),

    // Cross-source boilerplate detection: 3-grams appearing in 5+
    // DISTINCT sources are template/boilerplate text (vs q64's
    // intra-document repetition and q62's benchmark overlap); per
    // source, the share of its 5-gram stream that is boilerplate — the
    // signal behind header/footer stripping decisions. Scale shape: the
    // boilerplate vocabulary is (gram, source)-distinct then
    // gram-grouped (both map-side combined, vocabulary-bounded), and the
    // per-source account joins the gram stream against the broadcast
    // boilerplate set.
    "q228_boilerplate" -> ((s, d) => {
      val grams = T.documents(s, d)
        .select(col("source"),
          split(trim(lower(col("text"))), " ").as("ws"))
        .select(col("source"),
          explode(when(size(col("ws")) >= 3,
            expr("transform(sequence(3, size(ws)), i -> " +
              "concat_ws(' ', element_at(ws, i - 2), " +
              "element_at(ws, i - 1), element_at(ws, i)))"))
            .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("g"))
      val boiler = grams.select(col("g"), col("source")).distinct()
        .groupBy(col("g")).agg(count(lit(1)).as("ns"))
        .where(col("ns") >= 5).select(col("g"))
      grams
        .join(broadcast(boiler.withColumn("isb", lit(1L))), Seq("g"),
          "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("isb"), lit(0L))).as("n_boiler"),
          expr("(sum(coalesce(isb, 0)) * 1000) div count(*)")
            .as("boiler_permille"))
        .orderBy(col("source"))
    }),

    // Incremental index maintenance INSIDE the streaming engine (q217's
    // merge contract + q221's trigger mechanics): each micro-batch
    // reduces to its own (word, df) delta — O(batch) work, vocabulary-
    // bounded rows — persisted under its batch_id with dynamic overwrite
    // (replays rewrite, never double-count); the merged deltas must
    // equal a from-scratch rebuild over the full corpus, which is
    // exactly what the oracle computes. Deltas are the canonical
    // mergeable index state: df increments sum, arrival order never
    // matters.
    "q229_stream_index" -> ((s, d) =>
      graft.Confs.dynamicOverwrite(s) {
      val src = docsSourceSplitFixture(s, d)
      val base = graft.Scratch.runDir("graft_streamidx")
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          batch.select(col("doc_id"),
              explode(split(trim(lower(col("text"))), " ")).as("word"))
            .distinct()
            .groupBy(col("word")).agg(count(lit(1)).as("dfd"))
            .withColumn("batch_id", graft.functions.RefLit.long(bid))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$base/df")
          ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/df")
        .groupBy(col("word")).agg(sum(col("dfd")).as("df"))
        .orderBy(col("word"))
    }),

    // Bigram vocabulary-growth curve (Heaps' law probe): the corpus in
    // doc_id order is cut into 8 octiles (step = ceil(N/8) doc ids); each
    // bigram type charges its FIRST occurrence's octile; the curve is
    // (octile, new types, cumulative types). Scale shape: one
    // bigram-stream groupBy collapsing to min(doc_id) per type
    // (vocabulary-bounded), an 8-row bucket aggregate, and the cumulative
    // sum is an 8x8 triangle join over the broadcast bucket table — no
    // global window anywhere. The octile frame is a constant ascending
    // sequence(0, 7), so empty octiles still report.
    "q215_vocab_growth" -> ((s, d) => {
      val docs = T.documents(s, d)
      val st = docs.agg(count(lit(1)).as("n"))
        .select(expr("(n + 7) div 8").as("step"))
      val bi = docs
        .select(col("doc_id"),
          split(trim(lower(col("text"))), " ").as("ws"))
        .select(col("doc_id"), explode(bigramsOfWs).as("g"))
      val firsts = bi.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
      val buckets = firsts.crossJoin(broadcast(st))
        .select(least(expr("fd div step"), lit(7L)).as("octile"))
        .groupBy(col("octile")).agg(count(lit(1)).as("n_new"))
      val frame = docs.sparkSession.range(0, 8)
        .select(col("id").as("octile"))
      val filled = frame.join(broadcast(buckets), Seq("octile"), "left")
        .select(col("octile"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
      filled.as("a")
        .join(broadcast(filled.as("b")),
          col("b.octile") <= col("a.octile"))
        .groupBy(col("a.octile").as("octile"))
        .agg(max(col("a.n_new")).as("n_new"),
          sum(col("b.n_new")).as("cum_vocab"))
        .orderBy(col("octile"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q211_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(trim(lower(text)), ' ') AS ws,
        |    CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |st AS (SELECT COUNT(*) AS n,
        |         SUM(dl) * 1000 // COUNT(*) AS avgdl_milli FROM docs),
        |tf AS (
        |  SELECT doc_id, w, COUNT(*) AS tf, MAX(dl) AS dl FROM (
        |    SELECT doc_id, dl, unnest(ws) AS w FROM docs)
        |  WHERE w IN ('dup', 'spark', 'vector')
        |  GROUP BY doc_id, w),
        |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
        |SELECT doc_id,
        |  CAST(SUM((length(bin((2 * n) // (2 * df + 1))) - 1) *
        |    ((tf * 2200 * 1000) // (tf * 1000 +
        |      (1200 * (250 + (750 * dl * 1000) // avgdl_milli)) // 1000)))
        |    AS BIGINT) AS score_milli
        |FROM tf JOIN df USING (w) CROSS JOIN st
        |GROUP BY doc_id
        |ORDER BY score_milli DESC, doc_id LIMIT 20""".stripMargin,

    "q212_kmeans_assign" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 8),
        |a AS (
        |  SELECT e.vec_id, e.label, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(c.cvec AS DOUBLE[])) DESC,
        |      c.cid) AS rn
        |  FROM embeddings e CROSS JOIN cents c)
        |SELECT cid, COUNT(*) AS n_vecs,
        |  CAST(SUM(label) AS BIGINT) AS label_mass,
        |  MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
        |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin,

    "q213_quantile_gate" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    CAST((1000 * len(list_distinct(string_split(trim(lower(text)),
        |      ' ')))) // len(string_split(trim(lower(text)), ' '))
        |      AS BIGINT) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS cnt
        |  FROM m)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rn * 10 <= cnt * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  MIN(CASE WHEN rn * 10 <= cnt * 3 THEN score END)
        |    AS threshold_score,
        |  MAX(score) AS max_score
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // streaming must equal the one-shot batch gate exactly
    "q221_stream_quantile" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    CAST((1000 * len(list_distinct(string_split(trim(lower(text)),
        |      ' ')))) // len(string_split(trim(lower(text)), ' '))
        |      AS BIGINT) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS cnt
        |  FROM m)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rn * 10 <= cnt * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  MIN(CASE WHEN rn * 10 <= cnt * 3 THEN score END)
        |    AS threshold_score,
        |  MAX(score) AS max_score
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q214_prototypes" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 8),
        |a AS (
        |  SELECT e.vec_id, c.cid,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                           CAST(c.cvec AS DOUBLE[])) AS cos,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(c.cvec AS DOUBLE[])) DESC,
        |      c.cid) AS rn
        |  FROM embeddings e CROSS JOIN cents c),
        |p AS (
        |  SELECT cid, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY cid
        |      ORDER BY cos DESC, vec_id) AS prank
        |  FROM a WHERE rn = 1 AND vec_id >= 8)
        |SELECT cid, prank, vec_id FROM p WHERE prank <= 3
        |ORDER BY cid, prank""".stripMargin,

    "q216_lloyd_round" ->
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

    "q217_incremental_index" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(lower(text)), ' ')) AS word
        |    FROM documents))
        |SELECT word, COUNT(*) AS df FROM t
        |GROUP BY word ORDER BY word""".stripMargin,

    // streaming deltas must merge to the same from-scratch rebuild
    "q229_stream_index" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(lower(text)), ' ')) AS word
        |    FROM documents))
        |SELECT word, COUNT(*) AS df FROM t
        |GROUP BY word ORDER BY word""".stripMargin,

    "q218_cluster_sample" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  WHERE vec_id < 8),
        |a AS (
        |  SELECT e.vec_id, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(c.cvec AS DOUBLE[])) DESC,
        |      c.cid) AS rn
        |  FROM embeddings e CROSS JOIN cents c),
        |base AS (
        |  SELECT d.doc_id, a.cid,
        |    md5('s1:' || CAST(d.doc_id AS VARCHAR)) AS h
        |  FROM documents d JOIN a ON a.vec_id = d.doc_id AND a.rn = 1),
        |r AS (
        |  SELECT cid, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY h, doc_id)
        |      AS rnk
        |  FROM base)
        |SELECT cid, CAST(rnk AS BIGINT) AS rnk, doc_id FROM r
        |WHERE rnk <= 2 ORDER BY cid, rnk""".stripMargin,

    "q219_tfidf_pairs" ->
      """WITH tf AS (
        |  SELECT doc_id, w, COUNT(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(lower(text)), ' ')) AS w
        |    FROM documents) GROUP BY doc_id, w),
        |norms AS (
        |  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nn
        |  FROM tf GROUP BY doc_id),
        |st AS (SELECT COUNT(*) AS n FROM documents),
        |rare AS (
        |  SELECT w FROM (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
        |  CROSS JOIN st WHERE df <= LEAST(n // 10, 100)),
        |post AS (SELECT t.w, t.doc_id FROM tf t JOIN rare r ON t.w = r.w),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM post x JOIN post y ON x.w = y.w AND x.doc_id < y.doc_id),
        |dots AS (
        |  SELECT c.a, c.b, CAST(SUM(ta.tf * tb.tf) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN tf ta ON ta.doc_id = c.a
        |  JOIN tf tb ON tb.doc_id = c.b AND tb.w = ta.w
        |  GROUP BY c.a, c.b)
        |SELECT a, b, dot, na.nn AS na, nb.nn AS nb
        |FROM dots JOIN norms na ON na.doc_id = a
        |JOIN norms nb ON nb.doc_id = b
        |WHERE 4 * CAST(dot AS HUGEINT) * dot
        |  >= CAST(na.nn AS HUGEINT) * nb.nn
        |ORDER BY a, b""".stripMargin,

    "q220_hybrid_rrf" ->
      """WITH tf AS (
        |  SELECT doc_id, w, COUNT(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(lower(text)), ' ')) AS w
        |    FROM documents) GROUP BY doc_id, w),
        |q0 AS (SELECT w, tf AS qtf FROM tf WHERE doc_id = 0),
        |lex AS (
        |  SELECT t.doc_id, CAST(SUM(t.tf * q.qtf) AS BIGINT) AS dot
        |  FROM tf t JOIN q0 q ON t.w = q.w WHERE t.doc_id <> 0
        |  GROUP BY t.doc_id ORDER BY dot DESC, doc_id LIMIT 20),
        |lr AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id)
        |      AS BIGINT) AS lrank
        |  FROM lex),
        |v0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |vec AS (
        |  SELECT e.vec_id AS doc_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                           CAST(v0.qv AS DOUBLE[])) AS cos
        |  FROM embeddings e CROSS JOIN v0 WHERE e.vec_id <> 0
        |  ORDER BY cos DESC, doc_id LIMIT 20),
        |vr AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
        |      AS BIGINT) AS vrank
        |  FROM vec)
        |SELECT COALESCE(lr.doc_id, vr.doc_id) AS doc_id, lrank, vrank,
        |  COALESCE(1000000 // (60 + lrank), 0) +
        |    COALESCE(1000000 // (60 + vrank), 0) AS rrf_micro
        |FROM lr FULL OUTER JOIN vr ON lr.doc_id = vr.doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    "q222_group_split" ->
      """WITH g AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(
        |      string_split(trim(lower(text)), ' '))), ',')) AS fp,
        |    COUNT(*) AS n
        |  FROM documents GROUP BY 1),
        |a AS (
        |  SELECT n, CASE
        |    WHEN substr(md5('split:' || fp), 1, 1) <= 'b' THEN 'train'
        |    WHEN substr(md5('split:' || fp), 1, 1) <= 'd' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM g)
        |SELECT split, COUNT(*) AS n_groups,
        |  CAST(SUM(n) AS BIGINT) AS n_docs
        |FROM a GROUP BY split ORDER BY split""".stripMargin,

    "q223_packing_efficiency" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nw
        |  FROM documents)
        |SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS total_tokens,
        |  (CAST(SUM(nw) AS BIGINT) + 2047) // 2048 AS seqs_concat,
        |  CAST(SUM((nw + 2047) // 2048) AS BIGINT) AS seqs_perdoc,
        |  CAST(SUM((nw + 2047) // 2048) AS BIGINT) * 2048 -
        |    CAST(SUM(nw) AS BIGINT) AS pad_tokens,
        |  ((CAST(SUM((nw + 2047) // 2048) AS BIGINT) * 2048 -
        |    CAST(SUM(nw) AS BIGINT)) * 1000) //
        |    (CAST(SUM((nw + 2047) // 2048) AS BIGINT) * 2048)
        |    AS waste_permille
        |FROM t""".stripMargin,

    "q224_join_size_estimate" ->
      """WITH ev AS (SELECT CAST(user_id AS BIGINT) AS k FROM events),
        |od AS (SELECT CAST(o_custkey AS BIGINT) AS k FROM orders),
        |e1 AS (
        |  SELECT COALESCE(CAST(SUM(a.ca * b.cb) AS BIGINT), 0)
        |    AS est_row1
        |  FROM (SELECT substr(md5(CAST(k AS VARCHAR)), 1, 2) AS b,
        |          COUNT(*) AS ca FROM ev GROUP BY 1) a
        |  JOIN (SELECT substr(md5(CAST(k AS VARCHAR)), 1, 2) AS b,
        |          COUNT(*) AS cb FROM od GROUP BY 1) b USING (b)),
        |e2 AS (
        |  SELECT COALESCE(CAST(SUM(a.ca * b.cb) AS BIGINT), 0)
        |    AS est_row2
        |  FROM (SELECT substr(md5(CAST(k AS VARCHAR)), 3, 2) AS b,
        |          COUNT(*) AS ca FROM ev GROUP BY 1) a
        |  JOIN (SELECT substr(md5(CAST(k AS VARCHAR)), 3, 2) AS b,
        |          COUNT(*) AS cb FROM od GROUP BY 1) b USING (b)),
        |ex AS (
        |  SELECT COALESCE(CAST(SUM(a.na * b.nb) AS BIGINT), 0) AS exact
        |  FROM (SELECT k, COUNT(*) AS na FROM ev GROUP BY k) a
        |  JOIN (SELECT k, COUNT(*) AS nb FROM od GROUP BY k) b
        |    USING (k))
        |SELECT exact, est_row1, est_row2,
        |  LEAST(est_row1, est_row2) AS est_min,
        |  CASE WHEN exact > 0 THEN
        |    ((LEAST(est_row1, est_row2) - exact) * 1000) // exact END
        |    AS err_permille
        |FROM ex CROSS JOIN e1 CROSS JOIN e2""".stripMargin,

    "q225_quality_dup_matrix" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(trim(lower(text)), ' '))), ',')) AS fp,
        |    CAST((1000 * len(list_distinct(string_split(trim(lower(text)),
        |      ' ')))) // len(string_split(trim(lower(text)), ' '))
        |      AS BIGINT) AS score
        |  FROM documents),
        |dupfps AS (
        |  SELECT fp FROM docs GROUP BY fp HAVING COUNT(*) > 1)
        |SELECT score // 100 AS bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN d.fp IN (SELECT fp FROM dupfps)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST((SUM(CASE WHEN d.fp IN (SELECT fp FROM dupfps)
        |    THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT)
        |    AS dup_permille
        |FROM docs d GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q226_source_copy_matrix" ->
      """WITH g AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(
        |      string_split(trim(lower(text)), ' '))), ',')) AS fp,
        |    list_sort(list_distinct(list(source))) AS srcs,
        |    COUNT(*) AS n
        |  FROM documents GROUP BY fp HAVING COUNT(*) > 1),
        |p AS (
        |  SELECT srcs[i] AS src_a, srcs[j] AS src_b
        |  FROM g, range(1, 1000) i(i), range(1, 1000) j(j)
        |  WHERE i < j AND j <= len(srcs))
        |SELECT src_a, src_b, COUNT(*) AS n_groups
        |FROM p GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    "q227_length_buckets" ->
      """WITH m AS (
        |  SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS nw,
        |    CAST(((len(string_split(trim(text), ' ')) + 31) // 32) * 32
        |      AS BIGINT) AS ceil32
        |  FROM documents),
        |mx AS (SELECT MAX(ceil32) AS gmax FROM m)
        |SELECT ceil32, COUNT(*) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS tokens,
        |  CAST(SUM(ceil32 - nw) AS BIGINT) AS pad_bucketed,
        |  CAST(SUM(gmax - nw) AS BIGINT) AS pad_global
        |FROM m CROSS JOIN mx
        |GROUP BY ceil32 ORDER BY ceil32""".stripMargin,

    "q228_boilerplate" ->
      """WITH grams AS (
        |  SELECT source,
        |    unnest([w[i - 2] || ' ' || w[i - 1] || ' ' || w[i]
        |      for i in range(3, len(w) + 1)]) AS g
        |  FROM (SELECT source, string_split(trim(lower(text)), ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 3),
        |boiler AS (
        |  SELECT g FROM (SELECT DISTINCT g, source FROM grams)
        |  GROUP BY g HAVING COUNT(*) >= 5)
        |SELECT source, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN grams.g IN (SELECT g FROM boiler)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST((SUM(CASE WHEN grams.g IN (SELECT g FROM boiler)
        |    THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT)
        |    AS boiler_permille
        |FROM grams GROUP BY source ORDER BY source""".stripMargin,

    "q215_vocab_growth" ->
      """WITH st AS (
        |  SELECT (COUNT(*) + 7) // 8 AS step FROM documents),
        |bi AS (
        |  SELECT doc_id, w[i - 1] || ' ' || w[i] AS g FROM (
        |    SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
        |    FROM documents), range(2, 1000000) t(i)
        |  WHERE len(w) >= 2 AND i <= len(w)),
        |firsts AS (SELECT g, MIN(doc_id) AS fd FROM bi GROUP BY g),
        |buckets AS (
        |  SELECT LEAST(fd // step, 7) AS octile, COUNT(*) AS n_new
        |  FROM firsts CROSS JOIN st GROUP BY 1),
        |frame AS (
        |  SELECT CAST(o.octile AS BIGINT) AS octile,
        |    CAST(COALESCE(b.n_new, 0) AS BIGINT) AS n_new
        |  FROM range(0, 8) o(octile) LEFT JOIN buckets b
        |    ON b.octile = o.octile)
        |SELECT a.octile, MAX(a.n_new) AS n_new,
        |  CAST(SUM(b.n_new) AS BIGINT) AS cum_vocab
        |FROM frame a JOIN frame b ON b.octile <= a.octile
        |GROUP BY a.octile ORDER BY a.octile""".stripMargin
  )
}

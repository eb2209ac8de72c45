package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Runtime shuffle-volume budgets for the similarity/dedup candidate
  * pipelines. ExplainSpec pins the *plan* property (pair exchanges carry
  * bare ids, no array payloads); this spec pins the *measured* bytes: the
  * total shuffle volume of a run must stay within an id+signature-sized
  * budget derived from the corpus, so a vector or text payload sneaking
  * into a candidate exchange fails the suite even if the plan shape
  * assertion misses it (e.g. behind a localCheckpoint boundary, which
  * plan-level collect() cannot see through).
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Total shuffle-write bytes across every task run inside `body`.
    * Listener events are async: poll until the counter is stable. */
  private def measureShuffleWrite(body: => Unit): Long = {
    val acc = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val cur = acc.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    acc.get
  }

  private def run(name: String): Long = measureShuffleWrite {
    SparkEntry.queries(name)(spark, TestSession.sfDir).collect()
  }

  // Budgets derive from the corpus at runtime, so they scale with the
  // fixture and fail on payload *duplication*, not on absolute drift.

  test("q30 MinHash near-dup total shuffle stays hashed-shingle-sized") {
    // The dedup pipeline's corpus-sized rows are (id, xxhash64(shingle))
    // = 16 B each, ≈ one per corpus token, crossing ~5 exchanges
    // (shingle distinct, signature agg, size agg, two verify joins).
    // Measured: ~7.3 B of shuffle per corpus char (1.12 MB @ 153 K
    // chars, lz4). Budget 12 B/char ≈ 1.6x headroom — a raw-string
    // shingle pipeline (k≈3 words ≈ 18 chars + framing per row, per
    // pass) or a 512 B signature payload riding the pair exchange
    // roughly doubles the volume and overshoots.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q30_dedup_minhash")
    info(s"q30 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 12L * chars,
      s"q30 shuffled $bytes B for a $chars-char corpus — text or " +
        "signature payload leaked into a candidate exchange?")
  }

  /** Vector-pipeline budget: one corpus-vector payload (n × dim × 4 B —
    * random floats don't compress). The id+band/candidate traffic these
    * plans actually shuffle measures well under it (86 KB / 42 KB vs
    * 128 KB at sf0.001), while a vector column duplicated into any
    * exchange adds at least one full payload and overshoots. */
  private def vectorBudget(): Long = {
    import org.apache.spark.sql.functions.{col, size => asize, max, count}
    val r = Tables.embeddings(spark, TestSession.sfDir)
      .agg(count(col("vec_id")).as("n"), max(asize(col("embedding"))))
      .collect()(0)
    r.getLong(0) * r.getInt(1) * 4L
  }

  test("q231 calibration total shuffle stays band-digest-sized") {
    // After the MinHashShingles kernel + localCheckpoint, the only
    // corpus-sized exchanges are the band self-join and candidate
    // distinct: 4 × (id + band + 32-hex digest) ≈ 200 B per document
    // before compression. The budget is one corpus-char volume — the
    // shingle/signature payload (≥ 3× corpus chars if it ever rides an
    // exchange; the checkpoint itself is block-manager storage, not
    // shuffle) overshoots it immediately.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q231_minhash_calibration")
    info(s"q231 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < chars,
      s"q231 shuffled $bytes B for a $chars-char corpus — shingles or " +
        "signatures leaked into the band/candidate exchanges?")
  }

  test("q32 embedding near-dup total shuffle stays under one vector payload") {
    val budget = vectorBudget()
    val bytes = run("q32_embed_neardup")
    info(s"q32 shuffle write: $bytes B (budget $budget)")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < budget,
      s"q32 shuffled $bytes B ≥ the $budget B corpus vector payload — " +
        "vectors leaked into the pair exchange?")
  }

  test("q34 LSH ANN total shuffle stays under one vector payload") {
    val budget = vectorBudget()
    val bytes = run("q34_ann_lsh_exhaustive")
    info(s"q34 shuffle write: $bytes B (budget $budget)")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < budget,
      s"q34 shuffled $bytes B ≥ the $budget B corpus vector payload — " +
        "vectors leaked into the candidate exchange?")
  }

  /** Quality-scorer budget: the token stream reduces map-side (model build
    * onto a vocab-/16-row frame, scoring onto one partial-agg row per doc
    * per partition), so total shuffle must stay doc-count-sized — document
    * TEXT (~300 B/doc here) riding any exchange overshoots immediately. */
  private def docBudget(): Long = {
    import org.apache.spark.sql.functions.count
    64L * Tables.documents(spark, TestSession.sfDir)
      .agg(count("*")).collect()(0).getLong(0)
  }

  test("q207/q209 dedup derivatives stay within the hashed-shingle budget") {
    // Both ride q30's minhash machinery plus id-only labeling joins
    // (split tags / component ids) — a constant factor over q30's
    // measured ~7.3 B/char, nowhere near a text payload. Budget 16 B/char
    // (q30's 12 plus the labeling joins' id traffic).
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    Seq("q207_split_leakage", "q209_soft_dedup").foreach { q =>
      val bytes = run(q)
      info(s"$q shuffle write: $bytes B for $chars corpus chars")
      assert(bytes > 0, "expected at least one shuffle")
      assert(bytes < 16L * chars,
        s"$q shuffled $bytes B for a $chars-char corpus — text leaked " +
          "into a labeling exchange?")
    }
  }

  test("q204 LM scoring shuffles doc-sized rows, never the token stream") {
    val budget = docBudget()
    val bytes = run("q204_lm_surprisal")
    info(s"q204 shuffle write: $bytes B (budget $budget)")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < budget,
      s"q204 shuffled $bytes B for a ${budget / 64} doc corpus — text " +
        "or unaggregated tokens leaked into an exchange?")
  }

  test("q205 DSIR resample shuffles doc-sized rows, never the token stream") {
    val budget = docBudget()
    val bytes = run("q205_dsir_resample")
    info(s"q205 shuffle write: $bytes B (budget $budget)")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < budget,
      s"q205 shuffled $bytes B for a ${budget / 64} doc corpus — text " +
        "or unaggregated tokens leaked into an exchange?")
  }

  test("q212/q216 k-means E/M steps never shuffle a vector payload") {
    // The assignment is a per-row projection and both aggregates are
    // group-bounded (8 clusters / 512 (cid, dim) sums with partial
    // aggregation), so total shuffle must stay far under ONE corpus
    // vector payload — an embedding column riding any exchange (e.g. a
    // window-based argmax or an unaggregated M-step) adds the full
    // n×dim×4 B and overshoots.
    val budget = vectorBudget() / 2
    Seq("q212_kmeans_assign", "q216_lloyd_round").foreach { n =>
      val bytes = run(n)
      info(s"$n shuffle write: $bytes B (budget $budget)")
      assert(bytes < budget,
        s"$n shuffled $bytes B — a vector payload leaked into an " +
          "exchange?")
    }
  }

  test("q211 BM25 shuffles matched-term rows, never the token stream") {
    // Only tokens matching the 3 query terms reach the (doc, term) tf
    // groupBy, and everything after is vocabulary-/scalar-sized
    // broadcast + a TakeOrdered — so the doc-sized budget (64 B/doc)
    // holds with the corpus' ~80% term-hit rate. The full token stream
    // (~60 tokens/doc) keyed by anything else overshoots immediately.
    val budget = docBudget()
    val bytes = run("q211_bm25")
    info(s"q211 shuffle write: $bytes B (budget $budget)")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < budget,
      s"q211 shuffled $bytes B for a ${budget / 64} doc corpus — the " +
        "unfiltered token stream leaked into an exchange?")
  }

  test("q250 PQ ADC scan shuffles nothing vector-sized") {
    // The whole PQ design claim: codes + estimates are computed in one
    // scan-side projection and the top-k is a bounded TakeOrdered (per-
    // partition heads to the driver, no exchange). A single corpus
    // vector payload in any exchange busts the budget.
    val budget = vectorBudget()
    val bytes = run("q250_pq_ann")
    info(s"q250 shuffle write: $bytes B (budget $budget)")
    assert(bytes < budget,
      s"q250 shuffled $bytes B — a vector payload leaked into an " +
        "exchange; the ADC scan must stay shuffle-free")
  }

  test("q219 TF-IDF pairs shuffle integer postings, never text") {
    // The corpus-sized exchanges are the (doc_id, word, tf) aggregate
    // and its two pair-side re-joins — short word keys + 8 B ids/weights,
    // lz4'd — plus bare-id candidate pairs. Measured ~1.9 B of shuffle
    // per corpus char at sf0.001. Budget 4 B/char ≈ 2x: document TEXT
    // riding the candidate or dot exchanges (~300 B/doc per pass) or an
    // uncapped pair fan-out roughly doubles the volume and overshoots.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q219_tfidf_pairs")
    info(s"q219 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 4L * chars,
      s"q219 shuffled $bytes B for a $chars-char corpus — text leaked " +
        "into a postings/pair exchange, or the df cap stopped binding?")
  }

  test("q266 identity-sync shuffles slim snapshot projections only") {
    // The CDC diff's corpus-sized exchanges are the user full-outer
    // join and the name-keyed anti joins — each row a (arn, name, gkey,
    // seg, pkey, attach) projection of a customer, two snapshots, a
    // handful of exchanges; groups/policies and the cascade key sets
    // are dim-sized or broadcast. Measured ~117 B of shuffle per
    // customer row at sf0.001 (lz4). Budget 250 B/row ≈ 2.1x: a
    // whole-row payload (oldU/newU built from customer * without the
    // projection) or a cascade side spilling to a shuffle join roughly
    // doubles it and overshoots.
    val rows = Tables.customer(spark, TestSession.sfDir).count()
    val bytes = run("q266_identity_sync")
    info(s"q266 shuffle write: $bytes B for $rows customer rows")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 250L * rows,
      s"q266 shuffled $bytes B for $rows customers — a fat snapshot " +
        "projection or a de-broadcast cascade join leaked into an " +
        "exchange?")
  }

  test("q232 cell kNN shuffles the cell-keyed vectors once, ids after") {
    // The one legitimate vector exchange is the cid-keyed self-join of
    // the assignment output — and at this fixture scale AQE broadcasts
    // one side, so the measured total (~55 KB, 0.4 payloads) is mostly
    // id/edge traffic. Budget ONE corpus vector payload (2.3x measured):
    // vectors riding the edge/reciprocity exchanges (k=3 edges per
    // vector, each with two embeddings) add ≥ 3 payloads and overshoot
    // in any plan.
    val budget = vectorBudget()
    val bytes = run("q232_knn_graph")
    info(s"q232 shuffle write: $bytes B (budget $budget)")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < budget,
      s"q232 shuffled $bytes B ≥ 3 corpus vector payloads — vectors " +
        "leaked past the cell self-join into the edge exchanges?")
  }

  test("q251 PageRank shuffles one edge extraction, |E|-rows after") {
    // Edge extraction joins the fact tables ONCE (Catalyst reuses the
    // identical edge subplan across the 3 unrolled iterations + the
    // in-degree census); each iteration then shuffles |E| ≤ |V|²
    // contribution rows. Measured ~1.5 B of shuffle per fact row
    // (lineitem + orders + customer + supplier, lz4'd ids). Budget
    // 4 B/row ≈ 2.7x — a broken subplan reuse (edge build re-executed
    // for each of the 3 iterations + the census) multiplies the
    // fact-join volume ~4x to ~6 B/row and overshoots.
    import org.apache.spark.sql.functions.{count, lit}
    val facts = Seq("lineitem", "orders", "customer", "supplier")
      .map(t => Tables.t(spark, TestSession.sfDir, t)
        .agg(count(lit(1))).collect()(0).getLong(0)).sum
    val bytes = run("q251_pagerank")
    info(s"q251 shuffle write: $bytes B for $facts fact rows")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 4L * facts,
      s"q251 shuffled $bytes B for $facts fact rows — the edge " +
        "extraction re-ran per iteration, or rank rows grew past |V|?")
  }

  test("q260 video near-dup shuffles frame hashes, never pixels") {
    // every exchange row is (clip id, 8 B frame signature) or smaller —
    // the decode/hash pass is partition-local and the localCheckpoint is
    // block-manager storage, not shuffle. Measured ~35 B of shuffle per
    // frame across all exchanges; budget 96 B/frame ≈ 2.7x — ONE decoded
    // 64x64 frame is 12 KB, so pixels riding any exchange overshoot by
    // two orders immediately.
    import org.apache.spark.sql.functions.{count, lit}
    val frames = graft.multimodal.Multimodal.aviFrameHashes(
      spark.read.parquet(operators.VideoQueries.aviDupFixture(
        spark, TestSession.sfDir)))
      .agg(count(lit(1))).collect()(0).getLong(0)
    val bytes = run("q260_video_neardup")
    info(s"q260 shuffle write: $bytes B for $frames frames")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 96L * frames,
      s"q260 shuffled $bytes B for $frames frames — pixel payloads " +
        "leaked into a candidate exchange?")
  }

  test("q261 substring dedup shuffles window fingerprints, never text") {
    // the corpus-sized exchanges carry (doc_id, pos, 8 B xxhash64) rows
    // — one per token — plus id-sized anchors/islands. Measured ~1.8 B
    // of shuffle per corpus char; budget 4 B/char ≈ 2.2x: the 8-token
    // window STRINGS (~48 B + framing, per exchange) riding any shuffle
    // overshoot immediately.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q261_substring_dedup")
    info(s"q261 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 4L * chars,
      s"q261 shuffled $bytes B for a $chars-char corpus — window text " +
        "leaked into an exchange?")
  }

  test("q244 line dedup shuffles block hashes, never block text") {
    // each 10-word block crosses as a 32-hex md5 + doc_id (the groupBy
    // and the dup semi join) — ~1 block per 60 chars of corpus. Budget
    // 3 B/char ≈ 4x the hash traffic; raw 10-word block text (~60 B +
    // framing per block, per exchange) overshoots immediately.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q244_line_dedup")
    info(s"q244 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 3L * chars,
      s"q244 shuffled $bytes B for a $chars-char corpus — block text " +
        "leaked into an exchange?")
  }

  test("q249 Bloom probe shuffles the gram stream once, ids after") {
    // The distinct (doc_id, gram) stream is the only corpus-sized
    // exchange (5-word grams, lz4-compressed to ~0.8 B per corpus char
    // measured), then doc-id-sized distincts; the bit-set joins
    // broadcast. Budget 4 B/char ≈ 5x measured: an uncompressed
    // payload column, a raw-text re-shuffle, or the gram stream
    // crossing extra keyed exchanges (e.g. a non-broadcast bit join)
    // overshoots.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q249_bloom_decontaminate")
    info(s"q249 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 4L * chars,
      s"q249 shuffled $bytes B for a $chars-char corpus — the gram " +
        "stream crossed more exchanges than the design allows?")
  }

  test("q269 anomaly census shuffle is calendar-bounded, not volume-bounded") {
    // The whole detector family's scale claim: after the map-side-combined
    // (type, hour) count aggregate, everything that crosses an exchange is
    // census cells — |types| x |hours| rows of (string, i64, i64) — plus
    // the per-type collected series, NEVER the raw event stream. Budget
    // 100 B per cell x 3 exchanges (count agg, grid join, series collect):
    // independent of event volume by construction, so a ts/props/value
    // event payload riding any exchange scales with rows and overshoots
    // at every SF above the smallest.
    import org.apache.spark.sql.functions.{col, countDistinct, lit, max, min, unix_micros}
    val ev = Tables.events(spark, TestSession.sfDir)
    val b = ev.select(
        (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("h"),
        col("event_type"))
      .agg((max("h") - min("h") + lit(1L)).as("hours"),
        countDistinct("event_type").as("types"))
      .collect()(0)
    val cells = b.getLong(0) * b.getLong(1)
    val bytes = run("q269_ewma_anomaly")
    info(s"q269 shuffle write: $bytes B for $cells census cells")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 300L * cells,
      s"q269 shuffled $bytes B for $cells cells — an event-volume-sized " +
        "payload leaked into the census exchanges?")
  }

  test("q276 TV distance shuffles the token census, never documents") {
    // Everything that crosses an exchange is census-shaped: (source,
    // token, count) rows through the count aggregate and the common-token
    // join, plus tiny per-pair partials. Measured 0.16 B of shuffle per
    // corpus char at sf0.001 (the census is ~unique tokens, lz4'd);
    // budget 1 B/char ≈ 6x headroom, while document text duplicated into
    // any exchange adds ≥ 1 B/char on its own and overshoots.
    import org.apache.spark.sql.functions.sum
    val chars = Tables.documents(spark, TestSession.sfDir)
      .agg(sum("n_chars")).collect()(0).getLong(0)
    val bytes = run("q276_source_divergence")
    info(s"q276 shuffle write: $bytes B for $chars corpus chars")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < chars,
      s"q276 shuffled $bytes B for a $chars-char corpus — document " +
        "text leaked past the census aggregate?")
  }

  test("q277/q283 SNM exchanges stay record-slim, linear in rows x w") {
    // The rank window and block join shuffle (k, nm, blk, side, r) rows
    // — ≈ 30 B/record measured for q277, ≈ 97 B/record for q283's two
    // passes + distinct union at sf0.001. Budgets 150/400 B per record:
    // candidates are aggregated before any wide exchange, so a
    // candidate-pair blow-up (the q268 quadratic block-skew mode) or a
    // payload column riding the pair exchange scales past them.
    val n = Tables.customer(spark, TestSession.sfDir).count()
    val b277 = run("q277_sorted_neighborhood")
    info(s"q277 shuffle write: $b277 B for $n records")
    assert(b277 > 0 && b277 < 150L * n,
      s"q277 shuffled $b277 B for $n records")
    val b283 = run("q283_multipass_linkage")
    info(s"q283 shuffle write: $b283 B for $n records")
    assert(b283 > 0 && b283 < 400L * n,
      s"q283 shuffled $b283 B for $n records")
  }

  test("q284 rebalance shuffle is ring-sized, independent of key volume") {
    // Both layouts resolve against the BROADCAST 1088-interval ring in
    // the key scan's map stage; the only exchanges are the generated
    // vnode relation's sort/window and two 1-row moved-census
    // aggregates — a fixed cost (measured ~35 KB) that does not grow
    // with keys. Budget: fixed 96 KB + 16 B/key slack; a key-key join
    // materializing per-key assignments into a shuffle scales with the
    // corpus and overshoots at any real SF.
    val n = Tables.customer(spark, TestSession.sfDir).count()
    val bytes = run("q284_shard_rebalance")
    info(s"q284 shuffle write: $bytes B for $n keys")
    assert(bytes > 0, "expected at least one shuffle")
    assert(bytes < 96L * 1024 + 16L * n,
      s"q284 shuffled $bytes B for $n keys — per-key assignments " +
        "crossed an exchange?")
  }

  test("q291 sketch path shuffles 64 longs per source, never the " +
      "shingle universe") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val nSrc = Tables.documents(spark, TestSession.sfDir)
      .select(countDistinct(col("source"))).head().getLong(0)
    val sketchBytes = measureShuffleWrite {
      operators.CompareQueries.kmvOverlapEst(
        operators.CompareQueries.kmvSketches(spark, TestSession.sfDir))
        .collect()
    }
    // contrast: the exact side of the same question (q289 carries the
    // universe-sized DISTINCT the sketch exists to replace)
    val exactBytes = run("q289_kmv_distinct")
    info(s"q291 sketch-path shuffle: $sketchBytes B for $nSrc sources " +
      s"(exact path: $exactBytes B)")
    assert(sketchBytes > 0, "expected the sketch partial-agg exchange")
    // each map task ships at most one ~520 B sketch buffer per source
    // (64 longs + flag + framing); with every input split producing a
    // partial, 32 tasks x 2 KB/source is a generous ceiling that any
    // universe-sized leak (16 B x corpus shingles) overshoots by 10x+
    assert(sketchBytes < 32L * nSrc * 2048L,
      s"q291 sketch path shuffled $sketchBytes B for $nSrc sources — " +
        "did the shingle stream leak into an exchange?")
    assert(sketchBytes * 4 < exactBytes,
      s"sketch path ($sketchBytes B) must undercut the exact " +
        s"universe pass ($exactBytes B) by 4x+")
  }

  test("q304/q305 shot segmentation shuffles frame hashes, never pixels") {
    // both queries' only exchanges are the clip-partitioned window sorts
    // over (doc_id, frame_idx, n_frames, ahash) rows (plus q305's
    // md5 key) — the decode stays in the scan pass. One decoded 64x64
    // frame is 12 KB; any pixel payload on an exchange overshoots the
    // per-frame budget immediately.
    import org.apache.spark.sql.functions.{count, lit}
    val frames = graft.multimodal.Multimodal.aviFrameHashes(
      spark.read.parquet(operators.VideoQueries.aviShotFixture(
        spark, TestSession.sfDir)))
      .agg(count(lit(1))).collect()(0).getLong(0)
    for (q <- Seq("q304_shot_boundaries", "q305_keyframe_sample")) {
      val bytes = run(q)
      info(s"$q shuffle write: $bytes B for $frames frames")
      assert(bytes > 0, s"$q: expected at least one shuffle")
      assert(bytes < 160L * frames,
        s"$q shuffled $bytes B for $frames frames — pixel payloads " +
          "leaked into an exchange?")
    }
  }

  test("q308 HNSW build+search shuffle stays edge-and-vector-sized") {
    // The layered graph's exchanges are: per-layer LSH bucket stats +
    // capped candidate id-pairs, ONE id-keyed vector re-join per scoring
    // pass (a 64-float vector = 256 B payload, the same accepted cost
    // as lshTopK's re-rank), the top-M edge windows, and the per-hop
    // frontier expansions (query x ef x M id rows). Everything is
    // proportional to N x layers x vecBytes — a vector payload riding
    // the candidate DISTINCT (the classic blowup: each id appears in
    // nTables buckets) would multiply the volume ~8x and overshoot.
    import org.apache.spark.sql.functions.{count, lit}
    val n = Tables.embeddings(spark, TestSession.sfDir)
      .agg(count(lit(1))).collect()(0).getLong(0)
    val bytes = run("q308_ann_hnsw")
    info(s"q308 shuffle write: $bytes B for $n vectors")
    assert(bytes > 0, "expected at least one shuffle")
    // measured 1.57 KB/vector at sf0.001 (784 KB / 500 vecs, 4 layers
    // + search); budget 4 KB/vector ~ 2.6x headroom, well under the ~8x
    // of a vector-through-the-distinct regression
    assert(bytes < 4096L * n,
      s"q308 shuffled $bytes B for $n vectors — vectors riding the " +
        "candidate/frontier id exchanges?")
  }
}

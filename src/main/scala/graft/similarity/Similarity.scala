package graft.similarity

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), for training-data pipelines (near-dup mining, retrieval
  * eval, cluster sampling).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    corpus — a BroadcastNestedLoopJoin followed by a per-query top-k window.
  *    Exact; scales linearly in |corpus| with no shuffle of the corpus side.
  *  - LSH (random hyperplanes): deterministic signed-projection signatures,
  *    multi-table bucket join for candidates, exact re-rank within
  *    candidates. At 100 TB the bucket join replaces the full scan per query
  *    with |bucket| lookups — the classic sub-linear ANN trade.
  *
  * Dot products use double accumulation via `aggregate(zip_with(...))` —
  * pure codegen-able higher-order functions, no UDFs.
  */
object Similarity {

  /** cosine(a, b) over array<float> columns, via the codegen'd
    * [[VectorOps.dotF]] kernel (double accumulation). Zero-norm inputs
    * score -1 (ranked last), never NaN — Spark sorts NaN ABOVE every
    * double, so an unguarded 0/0 would make one all-zero corpus vector
    * the rank-1 neighbor of every query. */
  def cosine(a: Column, b: Column): Column = {
    val den = VectorOps.normF(a) * VectorOps.normF(b)
    when(den === 0.0, lit(-1.0))
      .otherwise(VectorOps.dotF(a, b) / den)
  }

  /** Exact top-k neighbors for each query row (excludes self-matches).
    * Output: (query_id, rank, neighbor_id, cos). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Norms are precomputed once per row; the per-pair work is a single
    // codegen'd 64-float dot product.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorOps.normF(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorOps.normF(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, lit(-1.0))
          .otherwise(VectorOps.dotF(col("qv"), col("cv")) /
            (col("qn") * col("cn"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Int8-quantized brute-force top-k: both sides quantize to
    * `array<byte>` (4× narrower than float — the broadcast/shuffle-width
    * lever at 100 TB), scoring is the exact integer dot product, ties
    * break on neighbor id. Quantization and scoring are codegen'd
    * Catalyst expressions ([[VectorOps.quantize]]/[[VectorOps.dotQ]]),
    * so the scan stays inside whole-stage codegen. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      scale: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      VectorOps.quantize(col(vecCol), scale).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      VectorOps.quantize(col(vecCol), scale).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dq").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("dq", VectorOps.dotQ(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("dq"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dq"))
  }

  /** Deterministic random hyperplanes: `nTables` tables × `bitsPerTable`
    * planes each, components ±1 seeded by (table, bit, dim). */
  private def planes(nTables: Int, bitsPerTable: Int, dim: Int)
      : Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nTables, bitsPerTable, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** [[planes]] as the float arrays the codegen kernel consumes — ONE
    * definition so the per-layer fused paths and [[signatures]] feed
    * bit-identical plane matrices to [[graft.functions.HyperplaneBuckets]]. */
  private def planesF(nTables: Int, bitsPerTable: Int, dim: Int)
      : Array[Array[Array[Float]]] =
    planes(nTables, bitsPerTable, dim)
      .map(_.map(_.map(_.toFloat).toArray).toArray).toArray

  /** Per-table LSH bucket signature: sign-bit vector of hyperplane
    * projections packed into a long. `bitsPerTable = 0` degenerates to a
    * single bucket per table (every pair a candidate) — the exhaustive
    * configuration the correctness gate uses to prove the bucket-join
    * machinery equals brute force. */
  def signatures(df: DataFrame, nTables: Int = 8, bitsPerTable: Int = 8,
      dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    // ±1 plane components are exact in float; the whole nTables × bits
    // projection runs in ONE compact codegen kernel holding the plane
    // matrix as a reference object (round 8 — the previous composed
    // form inlined every plane as a 64-float literal into one giant
    // generated method; see graft.functions.HyperplaneBuckets for the
    // C2-compile-storm evidence). Bucket values are bit-identical.
    val ps: Array[Array[Array[Float]]] = planesF(nTables, bitsPerTable, dim)
    // null vectors keep the composed form's semantics (a NULL projection
    // fell through to the 0L bucket): bucket 0 in every table
    val buckets = coalesce(
      graft.functions.HyperplaneBuckets(col(vecCol), ps, bitsPerTable),
      typedlit(Seq.fill(nTables)(0L)))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        posexplode(buckets).as(Seq("table", "bucket")))
      .select(col("id"), col("vec"), col("table"), col("bucket"))
  }

  /** LSH ANN: approximate top-k via bucket-join candidates + exact re-rank.
    * Output: (query_id, rank, neighbor_id, cos). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nTables: Int = 8, bitsPerTable: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Candidate dedup runs on bare (query_id, neighbor_id) id pairs — a
    // corpus vector appears in nTables buckets, so carrying vectors through
    // the distinct would widen that shuffle ~2×dim×4 bytes per row for no
    // reason. Vectors re-join after the distinct: queries by broadcast,
    // corpus by one id-keyed shuffle (once per candidate, not per table).
    val qs = signatures(queries, nTables, bitsPerTable, dim, idCol, vecCol)
      .select(col("id").as("query_id"), col("table"), col("bucket"))
    val cs = signatures(corpus, nTables, bitsPerTable, dim, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("table"), col("bucket"))
    val cands = cs.join(broadcast(qs), Seq("table", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands.join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold):
    * LSH bucket self-join for candidates (skew-bounded by the same
    * per-bucket cap as text dedup — a bucket of mutual near-dups larger
    * than the cap contributes a linear star instead of quadratic
    * all-pairs), exact cosine verify on re-joined vectors. The candidate
    * distinct carries bare id pairs, never `array<float>` payloads. */
  def embeddingNearDups(corpus: DataFrame, threshold: Double,
      nTables: Int = 8, bitsPerTable: Int = 8, dim: Int = 64,
      bucketCap: Int = graft.dedup.Dedup.DefaultBucketCap,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val buckets =
      signatures(corpus, nTables, bitsPerTable, dim, idCol, vecCol)
        .select(col("id"), col("table"), col("bucket"))
    val pairs = graft.dedup.Dedup.cappedSelfJoinPairs(
      buckets, Seq("table", "bucket"), bucketCap)
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every corpus
    * vector to its nearest centroid; queries probe only the `nProbe`
    * nearest cells. The alternative scale path to LSH: at 100 TB the
    * corpus is partitioned (bucketed) by cell id, so a query touches
    * |corpus| * nProbe / nCells rows. Centroids here are a deterministic
    * sample (lowest ids) — a production build would run k-means||, which
    * only changes centroid quality, not the plan shape. */
  def ivfAssign(corpus: DataFrame, centroids: Array[(Long, Seq[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // nearest centroid = argmax cosine; greatest-of-structs keeps it
    // one codegen'd projection per row (single-centroid case guarded:
    // greatest() requires >= 2 arguments)
    val cells = cellStructs(centroids, vecCol)
    val best =
      if (cells.length == 1) cells.head else greatest(cells.toSeq: _*)
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      best.getField("cell").as("cell"))
  }

  /** Deterministic centroid set: the `nCells` lowest-id vectors (the
    * cheapest seed — see [[kmeansCentroids]] for the quality path). */
  def ivfCentroids(corpus: DataFrame, nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[(Long, Seq[Float])] =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** max cosine similarity of `vecCol` to the given centroid set — the
    * "distance to nearest centroid" signal, one codegen'd projection. */
  private def maxCosTo(cents: Array[Seq[Float]], vecCol: String): Column = {
    val sims = cents.map(cvec => cosine(col(vecCol), typedlit(cvec)))
    if (sims.length == 1) sims.head else greatest(sims.toSeq: _*)
  }

  /** (cos, cell) struct per centroid — ONE definition for the assignment
    * argmax and both probe-ranking sites (in-memory and indexed), with
    * the zero-norm guard of [[cosine]]. */
  private def cellStructs(cents: Array[(Long, Seq[Float])],
      vecCol: String): Array[Column] =
    cents.map { case (cid, cvec) =>
      struct(cosine(col(vecCol), typedlit(cvec)).as("cos"),
        lit(cid).as("cell"))
    }

  /** Deterministic k-means|| centroids (spherical k-means, cosine
    * geometry). Seeding follows the k-means|| shape — a fixed number of
    * batch rounds, each adding the points farthest from the current
    * centroid set in ONE pass over the corpus — but replaces the
    * probabilistic d²-oversampling with a top-k by (distance, id), which
    * keeps the seed fully deterministic (the property every oracle and
    * resume path here relies on). Lloyd iterations then alternate
    * assignment (argmax-cosine projection, no shuffle of vectors beyond
    * the cell key) with a centroid-mean update through the single-buffer
    * [[graft.functions.SketchAggs.vectorMeanAgg]] — per corpus partition
    * the shuffle is nCells buffers, not n×dim rows. Each round is one
    * scan; at 100 TB the (id, vec) projection would be cached/bucketed
    * once, and only ~(seedRounds + iterations) scans ever happen.
    * Empty cells keep their previous centroid. */
  def kmeansCentroids(corpus: DataFrame, nCells: Int,
      iterations: Int = 3, seedRounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[(Long, Seq[Float])] = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // ---- k-means||-style deterministic seeding ----
    val first = vecs.orderBy(col("id")).limit(1)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(first.nonEmpty, "kmeansCentroids: empty corpus")
    var seeds: Array[Seq[Float]] = first.map(_._2)
    // chosen ids are excluded from later rounds — on a corpus smaller
    // than nCells the same rows would otherwise re-seed as duplicate
    // centroids (their distance is 0 but limit() still returns them);
    // running out of rows just yields fewer cells
    var chosen: Set[Long] = first.map(_._1).toSet
    val perRound = math.max(1, (nCells - 1 + seedRounds - 1) / seedRounds)
    var exhausted = false
    while (seeds.length < nCells && !exhausted) {
      val want = math.min(perRound, nCells - seeds.length)
      val far = vecs
        .where(!col("id").isin(chosen.toSeq: _*))
        .withColumn("__sim", maxCosTo(seeds, "vec"))
        .orderBy(col("__sim").asc, col("id").asc)
        .limit(want)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      if (far.isEmpty) exhausted = true
      else {
        seeds = seeds ++ far.map(_._2)
        chosen = chosen ++ far.map(_._1)
      }
    }
    // ---- Lloyd iterations ----
    var cents = seeds.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    var it = 0
    while (it < iterations) {
      val means = ivfAssign(vecs, cents, "id", "vec")
        .groupBy(col("cell"))
        .agg(graft.functions.SketchAggs.vectorMeanAgg(col("vec")).as("m"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      cents = cents.map { case (cid, prev) =>
        (cid, means.getOrElse(cid, prev))
      }
      it += 1
    }
    cents
  }

  /** IVF ANN top-k: probe the nProbe nearest cells per query, exact re-rank
    * within the probed cells. Output: (query_id, rank, neighbor_id, cos).
    * Centroids come from deterministic [[kmeansCentroids]] by default
    * (recall on clustered data); `useKmeans = false` falls back to the
    * lowest-id seed. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      useKmeans: Boolean = true): DataFrame = {
    val cents =
      if (useKmeans) kmeansCentroids(corpus, nCells, idCol = idCol,
        vecCol = vecCol)
      else ivfCentroids(corpus, nCells, idCol, vecCol)
    val assigned = ivfAssign(corpus, cents, idCol, vecCol)
    // per query: the nProbe nearest cells
    val probeCells = cellStructs(cents, vecCol)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        array_sort(array(probeCells: _*),
          (a, b) => when(a.getField("cos") > b.getField("cos"), -1)
            .when(a.getField("cos") < b.getField("cos"), 1).otherwise(0))
          .as("cells"))
      .select(col("query_id"), col("qv"),
        explode(slice(col("cells"), 1, nProbe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id"))
    cands.withColumn("cos", cosine(col("qv"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cos"))
  }

  // ---- IVF index lifecycle ----------------------------------------------

  /** Persist an IVF index: the assignment table written PARTITIONED BY
    * cell, plus the centroid table. The partitioning is the point — a
    * probe of `nProbe` cells reads only those partitions (static
    * partition pruning on the scan, asserted in ExtendedSpec), so query
    * cost scales with |corpus|·nProbe/nCells files touched, not with the
    * corpus. This is the on-disk analog of the bucketed-join layout:
    * shuffle once at build time, prune forever after. */
  def saveIvfIndex(corpus: DataFrame, dir: String, nCells: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      useKmeans: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents =
      if (useKmeans) kmeansCentroids(corpus, nCells, idCol = idCol,
        vecCol = vecCol)
      else ivfCentroids(corpus, nCells, idCol, vecCol)
    cents.toSeq.toDF("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    ivfAssign(corpus, cents, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assignments")
  }

  /** Reload the centroid table (bounded: nCells rows). */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession,
      dir: String): Array[(Long, Seq[Float])] =
    spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)

  /** Top-k against a persisted index. The probed cell set (≤ queries ×
    * nProbe values, query sets are small by contract) is resolved
    * driver-side so the assignment scan gets a LITERAL partition filter —
    * static pruning, no full-index read anywhere. */
  def ivfTopKIndexed(queries: DataFrame, dir: String, k: Int,
      nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadIvfCentroids(spark, dir)
    val probeCells = cellStructs(cents, vecCol)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        array_sort(array(probeCells.toSeq: _*),
          (a, b) => when(a.getField("cos") > b.getField("cos"), -1)
            .when(a.getField("cos") < b.getField("cos"), 1).otherwise(0))
          .as("cells"))
      .select(col("query_id"), col("qv"),
        explode(slice(col("cells"), 1, nProbe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))
    val cellSet = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)) // bounded by nQueries × nProbe
    val assigned = spark.read.parquet(s"$dir/assignments")
      .where(col("cell").isin(cellSet.toSeq: _*))
      .select(col("id"), col("vec"), col("cell").cast("long").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cos"))
  }

  /** Recall@k of the IVF path against brute force, per query. */
  def ivfRecall(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val exact = bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = ivfTopK(queries, corpus, k, nCells, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("total"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("hits"), lit(0)).cast("double") / col("total"))
          .as("recall"))
  }

  // ---- HNSW-style layered graph ANN ---------------------------------

  /** Deterministic HNSW level per node: P(level >= l) = 4^-l — the
    * standard geometric layer assignment (Malkov & Yashunin 2016,
    * mL = 1/ln 4) drawn from the node id's md5 instead of an RNG, so
    * the index is reproducible across runs and engines. Level l
    * requires the first l hex chars of the md5 to fall in '0'..'3'
    * (probability 1/4 each, independent across positions). */
  /** The level assignment as a pure COLUMN over an id column — levels
    * are id functions, so layer membership never needs a join against a
    * separate levels frame (round 8: [[hnswAdjacency]]/[[appendEdges]]
    * previously equi-joined [[hnswLevels]] per layer — 4 joins per side
    * per build carrying zero information a column expression doesn't). */
  private[graft] def levelCol(id: Column, maxLevel: Int): Column = {
    val h = md5(concat(lit("hnsw:"), id.cast("string")))
    (1 to maxLevel).map { l =>
      val allLow = (1 to l)
        .map(i => substring(h, i, 1).isin("0", "1", "2", "3"))
        .reduce(_ && _)
      when(allLow, 1).otherwise(0)
    }.reduce(_ + _)
  }

  def hnswLevels(corpus: DataFrame, maxLevel: Int = 3,
      idCol: String = "vec_id"): DataFrame =
    corpus.select(col(idCol).as("node"),
      levelCol(col(idCol), maxLevel).as("level"))

  /** M-bounded per-layer adjacency — the HNSW graph built as bounded
    * neighbor JOINS, never sequential insertion and never all-pairs:
    * layer l's members (level >= l) bucket under hyperplane LSH (fewer
    * bits per level, so the shrinking upper layers keep occupied
    * buckets), candidates come through the same per-bucket star cap as
    * text dedup, pairs score exactly (codegen'd cosine on re-joined
    * vectors), edges symmetrize, and each (layer, src) keeps its top-M
    * by cosine — HNSW's bidirectional M-bounded links. Shuffle volume
    * per layer is O(|layer| · cap) candidate id-pairs + one id-keyed
    * vector re-join; vectors never ride through the distinct.
    * Output: (layer, src, dst, cos). */
  def hnswAdjacency(corpus: DataFrame, maxLevel: Int = 3, m: Int = 6,
      nTables: Int = 8, bitsPerTable: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    // FUSED over layers (round 9; previously maxLevel+1 whole per-layer
    // pipelines unioned — 4x the scans, candidate expansions and scoring
    // joins of the same corpus): ONE layered signature pass
    // ([[layerSignatures]] — identical buckets per layer), ONE capped
    // pair expansion keyed (layer, table, bucket) with the layer carried
    // through, ONE scoring join pair. Per-layer pair sets, cosines and
    // the (cos desc, dst) top-M tie-breaks are unchanged, so the edge
    // set is bit-identical to the loop's.
    val nodes = corpus.select(col(idCol).as("node"), col(vecCol).as("cv"))
    val sigs = layerSignatures(nodes, maxLevel, nTables, bitsPerTable, dim)
    val cands = graft.dedup.Dedup.cappedSelfJoinPairs(
      sigs, Seq("layer", "table", "bucket"),
      graft.dedup.Dedup.DefaultBucketCap, carry = Seq("layer"))
    val av = nodes.select(col("node").as("id_a"), col("cv").as("va"))
    val bv = nodes.select(col("node").as("id_b"), col("cv").as("vb"))
    val scored = cands.join(av, "id_a").join(bv, "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .select(col("layer"), col("id_a"), col("id_b"), col("cos"))
    val edges = scored.select(col("layer"), col("id_a").as("src"),
        col("id_b").as("dst"), col("cos"))
      .unionByName(scored.select(col("layer"), col("id_b").as("src"),
        col("id_a").as("dst"), col("cos")))
    val w = Window.partitionBy(col("layer"), col("src"))
      .orderBy(col("cos").desc, col("dst"))
    edges.withColumn("rn", row_number().over(w)).where(col("rn") <= m)
      .select(col("layer"), col("src"), col("dst"), col("cos"))
  }

  /** Greedy HNSW descent as ITERATIVE EQUI-JOINS: the per-query beam
    * (ef candidates) starts at the global entry point (highest level,
    * lowest id), and at each layer runs `hops` expansion rounds —
    * frontier ⋈ adjacency (id equi-join) → score the neighbor set →
    * keep the top-ef per query — then descends. Every round shuffles at
    * most |queries| · ef · M id rows plus one id-keyed vector join; the
    * frontier localCheckpoints per layer so the iterative plan stays
    * bounded. Output: (query_id, rank, neighbor_id, cos), rank <= k. */
  def hnswTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      maxLevel: Int = 3, m: Int = 12, ef: Int = 32, hops: Int = 3,
      nTables: Int = 8, bitsPerTable: Int = 6, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val adj = hnswAdjacency(corpus, maxLevel, m, nTables, bitsPerTable,
      dim, idCol, vecCol).localCheckpoint()
    val levels = hnswLevels(corpus, maxLevel, idCol)
    // single entry point: max level, ties to the lowest id — a 1-row
    // bounded collect, same class as IVF's centroid collects
    val entry = levels.orderBy(col("level").desc, col("node"))
      .limit(1).collect()(0).getLong(0)
    val cv = corpus.select(col(idCol).as("node"), col(vecCol).as("cv"))
    hnswSearch(queries, adj, cv, entry, k, maxLevel, ef, hops,
      idCol, vecCol)
  }

  /** The greedy-descent core shared by the in-memory, persisted-index,
    * and streaming-store paths: see [[hnswTopK]] for the algorithm and
    * shuffle shape. `adj` may carry extra columns (e.g. a batch_id
    * partition column from the streaming store) — only layer/src/dst
    * are consumed. */
  private[graft] def hnswSearch(queries: DataFrame, adj: DataFrame,
      cv: DataFrame, entry: Long, k: Int, maxLevel: Int, ef: Int,
      hops: Int, idCol: String, vecCol: String): DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    def score(cands: DataFrame): DataFrame =
      cands.join(broadcast(qv), "query_id").join(cv, "node")
        .select(col("query_id"), col("node"),
          cosine(col("qv"), col("cv")).as("cos"))
    val beam = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("node"))
    // Per-hop beam update as ONE query-keyed aggregation (round 8): the
    // previous groupBy(query, node).max + row_number window shape paid
    // TWO exchanges per hop (hash by (query, node), then hash by query)
    // — 2 × hops × (maxLevel+1) exchanges per search. The beam is
    // bounded by construction (ef survivors + at most ef·M scored
    // neighbors per query), so each query's candidates collect into one
    // ≤ (ef·(M+1))-entry array and the dedup-by-node (keep max cos) +
    // top-ef ordering run as array expressions inside codegen — same
    // survivors, same tie-breaks (cos desc, node asc), one exchange.
    def beamTopEf(unioned: DataFrame): DataFrame =
      unioned
        .groupBy(col("query_id"))
        .agg(collect_list(struct(col("node"), col("cos"))).as("__c"))
        // bind the node-sorted array once per row, then dedup keeps the
        // first (= max-cos) entry per node via an index-aware filter
        .withColumn("__s", expr(
          """array_sort(__c, (a, b) ->
            |  CASE WHEN a.node < b.node THEN -1
            |       WHEN a.node > b.node THEN 1
            |       WHEN a.cos > b.cos THEN -1
            |       WHEN a.cos < b.cos THEN 1 ELSE 0 END)""".stripMargin))
        .select(col("query_id"), explode(expr(
          s"""slice(
             |  array_sort(
             |    filter(__s, (x, i) ->
             |      i = 0 OR element_at(__s, i).node <> x.node),
             |    (a, b) ->
             |      CASE WHEN a.cos > b.cos THEN -1
             |           WHEN a.cos < b.cos THEN 1
             |           WHEN a.node < b.node THEN -1
             |           WHEN a.node > b.node THEN 1 ELSE 0 END),
             |  1, $ef)""".stripMargin)).as("__e"))
        .select(col("query_id"), col("__e.node").as("node"),
          col("__e.cos").as("cos"))
    var frontier = score(qv.select(col("query_id"))
      .withColumn("node", lit(entry)))
    for (l <- maxLevel to 0 by -1) {
      for (_ <- 1 to hops) {
        // no distinct before scoring (round 8): duplicate (query, node)
        // rows — the same dst reached from several frontier nodes —
        // score to the SAME cos, and beamTopEf's dedup-by-node collapses
        // them; the dropped exchange was bounding rows the aggregation
        // bounds anyway (≤ ef·M per query either way)
        val nbrs = frontier
          .join(adj.where(col("layer") === l)
            .select(col("src").as("node"), col("dst")), "node")
          .select(col("query_id"), col("dst").as("node"))
        frontier = beamTopEf(frontier.unionByName(score(nbrs)))
      }
      frontier = frontier.localCheckpoint()
    }
    frontier
      .where(col("node") =!= col("query_id"))
      .withColumn("rank", row_number().over(beam))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("node").as("neighbor_id"),
        col("cos"))
  }

  /** Persist the HNSW index: adjacency LAYER-PARTITIONED (each search
    * round reads exactly one layer through a literal partition filter —
    * the same pruning discipline as the IVF cell store), the corpus
    * vectors id-keyed (search joins visited ids against this table;
    * serving never touches the source corpus), and the 1-row entry
    * point. Build is one [[hnswAdjacency]] pass — amortized exactly
    * like [[saveIvfIndex]]. */
  def saveHnswIndex(corpus: DataFrame, dir: String, maxLevel: Int = 3,
      m: Int = 12, nTables: Int = 8, bitsPerTable: Int = 6,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    hnswAdjacency(corpus, maxLevel, m, nTables, bitsPerTable, dim,
      idCol, vecCol)
      .write.mode("overwrite").partitionBy("layer")
      .parquet(s"$dir/adjacency")
    hnswLevels(corpus, maxLevel, idCol)
      .orderBy(col("level").desc, col("node")).limit(1)
      .select(col("node").as("entry"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/entry")
    corpus.select(col(idCol).as("node"), col(vecCol).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/vectors")
  }

  /** Incremental batch INSERT into a [[saveHnswIndex]] store — the
    * q117/q157 discipline applied to the graph index: per-batch work is
    * O(batch), history vectors are read but never re-indexed.
    *
    * Per layer the new nodes (levels recomputed from ids — the level is
    * a pure function, so increments agree with any build order) take
    * candidates from the existing layer members through the SAME capped
    * bucket machinery as incremental dedup ([[graft.dedup.Dedup
    * .cappedIndexJoinPairs]]: an oversized history bucket pairs against
    * its representative only), plus intra-batch candidates via the
    * self-join cap; each new node keeps its top-M by exact cosine, and
    * the reverse (existing→new) edges append WITHOUT re-pruning the
    * touched history nodes — each append adds at most batch×M reverse
    * edges per layer, widening (never narrowing) exploration, so recall
    * is monotone in appends while history rows are never rewritten.
    * The entry point is re-evaluated against the batch's max level. */
  def appendHnswIndex(batch: DataFrame, dir: String, maxLevel: Int = 3,
      m: Int = 12, nTables: Int = 8, bitsPerTable: Int = 6,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val existing = spark.read.parquet(s"$dir/vectors") // (node, cv)
    val newVecs = batch.select(col(idCol).as("node"), col(vecCol).as("cv"))
    appendEdges(newVecs, existing, maxLevel, m, nTables, bitsPerTable,
      dim)
      .select(col("src"), col("dst"), col("cos"), col("layer"))
      .write.mode("append").partitionBy("layer")
      .parquet(s"$dir/adjacency")
    newVecs.write.mode("append").parquet(s"$dir/vectors")
    // entry: highest level wins, ties to lowest id — compare the stored
    // entry against the batch's best (levels are pure id functions)
    val oldEntry = spark.read.parquet(s"$dir/entry")
      .collect()(0).getLong(0)
    val cand = hnswLevels(newVecs, maxLevel, "node")
      .unionByName(hnswLevels(
        spark.range(1).select(lit(oldEntry).as("vec_id")), maxLevel))
      .orderBy(col("level").desc, col("node")).limit(1)
      .collect()(0).getLong(0)
    if (cand != oldEntry) {
      import spark.implicits._
      Seq(cand).toDF("entry").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/entry")
    }
  }

  /** The edge computation behind [[appendHnswIndex]] and the streaming
    * twin: (layer, src, dst, cos) rows for `newVecs` joining a graph
    * whose members are `existing` — forward top-M per new node plus
    * bounded reverse links from touched existing nodes. With an EMPTY
    * `existing` this degenerates to exactly [[hnswAdjacency]]'s edge set
    * over the batch (cross candidates vanish, every src is new), so the
    * bootstrap batch and every later batch share one code path. Both
    * frames are (node, cv). */
  private[graft] def appendEdges(newVecs: DataFrame, existing: DataFrame,
      maxLevel: Int, m: Int, nTables: Int, bitsPerTable: Int,
      dim: Int): DataFrame =
    appendEdgesFrom(newVecs,
      layerSignatures(newVecs, maxLevel, nTables, bitsPerTable, dim),
      existing,
      layerSignatures(existing, maxLevel, nTables, bitsPerTable, dim),
      maxLevel, m)

  /** Per-layer LSH buckets for a (node, cv) frame as ONE frame
    * (layer, table, bucket, id): exactly the buckets [[appendEdges]]
    * computes per layer — layer l's members are level ≥ l, l's tables
    * use max(2, bitsPerTable − 2l) hyperplanes. Persisting this beside a
    * streamed store makes each trigger's history-bucket recompute a
    * READ: per-trigger work goes O(batch) where recomputing signatures
    * over all earlier batches was O(history) map work per trigger (the
    * difference between a linear and a quadratic lifetime at 100 TB). */
  private[graft] def layerSignatures(vecs: DataFrame, maxLevel: Int,
      nTables: Int, bitsPerTable: Int, dim: Int): DataFrame = {
    // FUSED single pass (round 9; previously a per-layer loop of whole
    // signature pipelines unioned — maxLevel+1 scans/explodes where one
    // suffices): each node explodes to its member layers 0..level(node)
    // (same membership as the old `level >= l` filter), and the bucket
    // array per row comes from a CaseWhen over the SAME per-layer
    // HyperplaneBuckets kernels (same planesF matrices, same bit
    // widths), so every (layer, table, bucket, id) row is bit-identical
    // to the loop's output. Null vectors keep the bucket-0 fallthrough
    // per branch.
    val lvl = levelCol(col("node"), maxLevel)
    val layerArr = (1 to maxLevel).foldLeft(
      when(lvl === 0, typedlit(List(0)))) { (acc, v) =>
      acc.when(lvl === v, typedlit((0 to v).toList))
    }
    val withLayer = vecs.select(col("node").as("id"), col("cv"),
      explode(layerArr).as("layer"))
    val bucketsByLayer = (0 to maxLevel).map { l =>
      val bits = math.max(2, bitsPerTable - 2 * l)
      val ps = planesF(nTables, bits, dim)
      (l, coalesce(
        graft.functions.HyperplaneBuckets(col("cv"), ps, bits),
        typedlit(Seq.fill(nTables)(0L))))
    }
    val bucketCase = bucketsByLayer.tail.foldLeft(
      when(col("layer") === bucketsByLayer.head._1,
        bucketsByLayer.head._2)) { case (acc, (l, b)) =>
      acc.when(col("layer") === l, b)
    }
    withLayer
      .select(col("id"), col("layer"),
        posexplode(bucketCase).as(Seq("table", "bucket")))
      .select(col("layer"), col("table"), col("bucket"), col("id"))
  }

  /** [[appendEdges]] with the per-layer buckets supplied by the caller —
    * the streaming twin reads `exSigs` from its store instead of
    * recomputing them over history every trigger. Bucket values are
    * identical either way ([[layerSignatures]] is the one definition),
    * so the edge set — and every downstream result — is unchanged. */
  private[graft] def appendEdgesFrom(newVecs: DataFrame,
      newSigs: DataFrame, existing: DataFrame, exSigs: DataFrame,
      maxLevel: Int, m: Int): DataFrame = {
    val beamM = Window.partitionBy(col("layer"), col("src"))
      .orderBy(col("cos").desc, col("dst"))
    // FUSED over layers (round 9, same rewrite as [[hnswAdjacency]]):
    // the per-layer loop ran a whole capped-join + scoring pipeline per
    // layer over the SAME signature frames; keying the capped joins by
    // (layer, table, bucket) with the layer carried through produces the
    // identical per-layer pair sets from one pass.
    val exB = exSigs.select(col("layer"), col("table"), col("bucket"),
      col("id"))
    val newB = newSigs.select(col("layer"), col("table"), col("bucket"),
      col("id"))
    val lKeys = Seq("layer", "table", "bucket")
    val cross = graft.dedup.Dedup.cappedIndexJoinPairs(exB, newB,
      lKeys, graft.dedup.Dedup.DefaultBucketCap, carry = Seq("layer"))
    val intra = graft.dedup.Dedup.cappedSelfJoinPairs(newB,
      lKeys, graft.dedup.Dedup.DefaultBucketCap, carry = Seq("layer"))
    val pairs = cross.unionByName(intra)
    val av = existing.unionByName(newVecs)
      .select(col("node").as("id_a"), col("cv").as("va"))
    val bv = newVecs.unionByName(existing)
      .select(col("node").as("id_b"), col("cv").as("vb"))
    val scored = pairs.join(av, "id_a").join(bv, "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .select(col("layer"), col("id_a"), col("id_b"), col("cos"))
    // forward edges: each NEW node's top-M (id_b side of cross pairs is
    // always new; intra pairs are new on both sides — take both
    // directions and keep only new srcs)
    val isNew = newVecs.select(col("node").as("src"))
    val bothDirs = scored.select(col("layer"), col("id_a").as("src"),
        col("id_b").as("dst"), col("cos"))
      .unionByName(scored.select(col("layer"), col("id_b").as("src"),
        col("id_a").as("dst"), col("cos")))
    val fwd = bothDirs.join(isNew, "src")
      .withColumn("rn", row_number().over(beamM)).where(col("rn") <= m)
      .drop("rn")
    // reverse edges: existing src -> new dst, only those the new side
    // kept (so reverse volume is bounded by the same top-M); a reverse
    // edge whose src is itself new is already covered by fwd's top-M
    val rev = fwd.select(col("layer"), col("dst").as("src"),
        col("src").as("dst"), col("cos"))
      .join(isNew, Seq("src"), "left_anti")
    fwd.unionByName(rev)
  }

  /** Search a [[saveHnswIndex]] store. Identical construction to the
    * in-memory path (same deterministic levels, adjacency, and descent),
    * so results are bit-equal to [[hnswTopK]] at equal parameters —
    * q309 gates exactly that. */
  def hnswTopKIndexed(queries: DataFrame, dir: String, k: Int,
      maxLevel: Int = 3, ef: Int = 32, hops: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val spark = queries.sparkSession
    val adj = spark.read.parquet(s"$dir/adjacency")
    val cv = spark.read.parquet(s"$dir/vectors")
    val entry = spark.read.parquet(s"$dir/entry")
      .collect()(0).getLong(0)
    hnswSearch(queries, adj, cv, entry, k, maxLevel, ef, hops,
      idCol, vecCol)
  }

  /** Recall@k of the LSH path against brute force, per query. */
  def lshRecall(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val exact = bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = lshTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("total"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("hits"), lit(0)).cast("double") / col("total"))
          .as("recall"))
  }
}

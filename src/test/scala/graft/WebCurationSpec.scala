package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value- and plan-level checks for the web-curation layer
  * (WebCurationQueries). The DuckDB gate proves engine equivalence; these
  * prove the SEMANTICS (keep-one accounting, canonical-collision schedule,
  * planted-corruption recount, chunk-coverage identities, Jaccard bounds,
  * Bloom no-false-negatives) and the scale shape (broadcast bit-set probes,
  * bounded pair expansion).
  */
class WebCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q244 block accounting is internally consistent and matches an " +
    "independent block recount") {
    val r = run("q244_line_dedup").head()
    val (nBlocks, nDistinct, dupOcc, docsHit) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nDistinct <= nBlocks)
    // every duplicated occurrence group of size c contributes c to
    // dupOcc and c-1 to the drop count
    assert(dupOcc >= nBlocks - nDistinct)
    assert(docsHit >= 1, "planted duplicate docs must share blocks")
    val independent = Tables.documents(spark, sf)
      .select(expr("size(split(trim(lower(text)), ' ')) div 10").as("nb"))
      .agg(sum(col("nb"))).head().getLong(0)
    assert(nBlocks == independent)
  }

  test("q245 canonical groups follow the planted (source, bucket) schedule") {
    val r = run("q245_url_canon").head()
    val total = Tables.documents(spark, sf).count()
    assert(r.getLong(0) == total)
    val expectedCanon = Tables.documents(spark, sf)
      .select(col("source"), (col("doc_id") % 40).as("b")).distinct().count()
    assert(r.getLong(1) == expectedCanon)
    assert(r.getLong(4) > 0, "tracking params must collapse some URLs")
  }

  test("q246 flags exactly the planted docs that contain the substituted " +
    "letter") {
    val rows = run("q246_mojibake").collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
    val expected = Tables.documents(spark, sf)
      .where(col("doc_id") % 7 === 0 && col("text").contains("a"))
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == expected.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: flagged count must match the planted schedule")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000)
    }
  }

  test("q247 chunk identities: overlap/tail arithmetic and an independent " +
    "chunk-count recount") {
    val r = run("q247_rag_chunks").head()
    val (nDocs, nChunks, totalTok, chunkTok, coveredTok) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    assert(r.getLong(5) == chunkTok - coveredTok, "overlap identity")
    assert(r.getLong(6) == totalTok - coveredTok, "tail identity")
    assert(r.getLong(6) >= 0 && coveredTok <= totalTok)
    assert(nChunks >= nDocs, "every doc emits at least one chunk")
    val independent = Tables.documents(spark, sf)
      .select(expr("size(split(trim(lower(text)), ' '))").as("nw"))
      .select(expr("1 + (greatest(1, nw - 63) - 1) div 48").as("nc"))
      .agg(sum(col("nc"))).head().getLong(0)
    assert(nChunks == independent,
      s"chunk count $nChunks must match stride arithmetic $independent")
  }

  test("q248 Jaccard stays bounded and the matrix covers ordered pairs") {
    val rows = run("q248_source_affinity").collect()
    assert(rows.nonEmpty && rows.length <= 190)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs are ordered")
      val (inter, na, nb, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(inter >= 1 && inter <= math.min(na, nb))
      assert(j >= 0 && j <= 1000)
      assert(j == 1000 * inter / (na + nb - inter))
    }
  }

  test("q249 Bloom filter has no false negatives and prices its false " +
    "positives") {
    val r = run("q249_bloom_decontaminate").head()
    val (nGrams, nBits, nCorpus, nFlagged, nTrue, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    // k=2 hashes set at most 2 bits per member; with m = 16n that caps
    // occupancy at 1/8 — the structural anti-saturation guarantee the
    // sf1 probe demanded (fixed m=16384 saturated at 10x data)
    assert(nBits <= 2 * nGrams)
    assert(nFlagged >= nTrue,
      "a Bloom filter can never miss a true member")
    assert(nFp == nFlagged - nTrue)
    assert(nFlagged <= nCorpus)
    assert(r.getLong(6) <= 1000)
  }

  test("q253 streaming frontier equals the one-shot batch account " +
    "row for row") {
    val streamed = run("q253_stream_frontier").collect()
    val batch = run("q245_url_canon").collect()
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      "merged per-trigger deltas must equal the batch frontier")
  }

  test("q249 bit-set probes broadcast, never SMJ") {
    val p = run("q249_bloom_decontaminate")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"bit-set probe must broadcast:\n$p")
  }
}

package graft

import graft.dedup.{Clusters, Dedup}
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._
  private def docs = Tables.documents(spark, TestSession.sfDir)
  private def embs = Tables.embeddings(spark, TestSession.sfDir)

  test("minhash LSH finds the planted near-dup pairs and only high-jaccard ones") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.8).collect()
    assert(pairs.nonEmpty, "expected planted near-dups")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.8))
    // id_a < id_b, no self pairs
    assert(pairs.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("simhash near-dups overlap the minhash near-dups on planted pairs") {
    val mh = Dedup.minhashNearDups(docs, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simhashNearDups(docs, maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.nonEmpty && sh.nonEmpty)
    val overlap = mh.intersect(sh).size.toDouble / mh.size
    assert(overlap >= 0.5, s"simhash found only $overlap of minhash pairs")
  }

  test("per-bucket cap: planted duplicate cluster yields linear candidates") {
    // 300 identical docs + 5 distinct: every band bucket holds the whole
    // cluster, so without the cap the self-join would emit 300*299/2 =
    // 44850 candidate pairs. With cap=50 the oversized buckets contribute
    // a star on the lowest id instead: exactly 299 pairs.
    val cluster = (0L until 300L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val rest = (300L until 305L).map(i =>
      (i, s"unique document number $i with its own words entirely-$i"))
    val planted = (cluster ++ rest).toDF("doc_id", "text")
    val sh = Dedup.shingles(planted)
    val cands = Dedup.lshCandidates(Dedup.minhashSignatures(sh),
      bucketCap = 50).collect()
    assert(cands.length == 299, s"expected 299 star pairs, got ${cands.length}")
    assert(cands.forall(_.getAs[Long]("id_a") == 0L))
    // end-to-end: verification keeps all star pairs (jaccard = 1.0), so
    // the cluster stays fully connected through the representative
    val nd = Dedup.minhashNearDups(planted, threshold = 0.8, bucketCap = 50)
    assert(nd.count() == 299)
    assert(nd.collect().forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("per-bucket cap: embedding duplicate cluster yields linear candidates") {
    val vec = (0 until 64).map(i => (i % 7).toFloat / 7f)
    val cluster = (0L until 300L).map(i => (i, vec))
    val planted = cluster.toDF("vec_id", "embedding")
    val nd = Similarity.embeddingNearDups(planted, threshold = 0.9,
      bucketCap = 50).collect()
    assert(nd.length == 299, s"expected 299 star pairs, got ${nd.length}")
    assert(nd.forall(_.getAs[Long]("id_a") == 0L))
    assert(nd.forall(_.getAs[Double]("cos") > 0.999))
  }

  test("exact dedup is idempotent and keeps the lowest id per group") {
    val d1 = Dedup.exact(docs)
    assert(d1.count() == Dedup.exact(d1).count())
    // no planted exact dups in this data: count unchanged
    assert(d1.count() == docs.count())
  }

  test("brute-force top-k: rank 1 matches argmax cosine, k rows per query") {
    val top = Similarity.bruteForceTopK(embs.where($"vec_id" < 3), embs, 5)
    val byQ = top.groupBy($"query_id").agg(count(lit(1)).as("n"))
      .collect()
    assert(byQ.length == 3 && byQ.forall(_.getAs[Long]("n") == 5))
    val r = top.where($"rank" === 1).collect()
    assert(r.forall(_.getAs[Double]("cos") <= 1.0001))
    // cos monotonically non-increasing with rank per query
    val seq = top.orderBy($"query_id", $"rank")
      .select($"query_id", $"cos").collect()
    seq.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(0) == b.getLong(0))
        assert(a.getDouble(1) >= b.getDouble(1) - 1e-12)
      case _ => ()
    }
  }

  test("LSH recall is in (0,1] and LSH results are a subset of valid ids") {
    val rec = Similarity.lshRecall(embs.where($"vec_id" < 5), embs, 5)
      .collect()
    assert(rec.length == 5)
    assert(rec.forall { r =>
      val x = r.getAs[Double]("recall"); x >= 0.0 && x <= 1.0
    })
  }

  test("IVF recall: partial probe in (0,1], full probe exactly 1.0") {
    val qs = embs.where($"vec_id" < 5)
    val partial = Similarity.ivfRecall(qs, embs, 5, nCells = 16, nProbe = 4)
      .collect()
    assert(partial.length == 5)
    assert(partial.forall { r =>
      val x = r.getAs[Double]("recall"); x > 0.0 && x <= 1.0
    })
    val full = Similarity.ivfRecall(qs, embs, 5, nCells = 16, nProbe = 16)
      .collect()
    assert(full.forall(_.getAs[Double]("recall") == 1.0),
      "full-probe IVF must equal brute force")
  }

  test("semantic dedup resolves planted copies into 3-member clusters") {
    val rows = SparkEntry.queries("q194_semantic_dedup")(
      spark, TestSession.sfDir).collect()
    assert(rows.length == 20, s"expected 20 clusters, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) == 3, s"cluster ${r.getLong(0)} size ${r.getLong(1)}")
      assert(r.getLong(2) == 1, "exactly one survivor per cluster")
      assert(r.getLong(3) == r.getLong(0) + 20000000L,
        "max member is the second planted generation")
    }
  }

  test("k-means centroids are deterministic and cover all cells") {
    val c1 = Similarity.kmeansCentroids(embs, nCells = 8)
    val c2 = Similarity.kmeansCentroids(embs, nCells = 8)
    assert(c1.length == 8)
    assert(c1.map(_._2).toSeq == c2.map(_._2).toSeq,
      "k-means seed/iteration must be deterministic")
    // every corpus vector assigns to some cell; at least half the cells
    // are non-empty on this corpus (Lloyd keeps empty cells' previous
    // centroid, so fewer is legal but suspicious on 500+ vectors)
    val assigned = Similarity.ivfAssign(
      embs.select($"vec_id".as("id"), $"embedding".as("vec")),
      c1, "id", "vec")
    assert(assigned.count() == embs.count())
    assert(assigned.select("cell").distinct().count() >= 4)
  }

  test("langId is deterministic and en-dominant on this corpus") {
    val pred = docs.withColumn("p", TextAnalysis.langId($"text"))
      .groupBy($"p").count().collect()
    val en = pred.find(r => r.getAs[String]("p") == "en").map(_.getAs[Long]("count"))
    assert(en.exists(_ > 0))
  }

  test("multimodal decode: deterministic fake codec, metadata matches bytes") {
    val out = Multimodal.decodeMeta(Multimodal.pack(docs.limit(20))).collect()
    assert(out.length == 20)
    assert(out.forall { r =>
      val w = r.getAs[Int]("width"); w >= 64 && w < 64 + 577
    })
    // deterministic: same input → same output
    val again = Multimodal.decodeMeta(Multimodal.pack(docs.limit(20))).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q210 streaming dedup finds exactly the batch pipeline's pairs") {
    // Continuous dedup decomposes pair-finding across micro-batches
    // (intra-batch LSH + index join against earlier batches); the union
    // must equal the single-pass batch pipeline row for row — a pair
    // found twice (replayed batch appending instead of overwriting) or
    // missed (index written before the join) both break equality.
    val streamed = SparkEntry.queries("q210_stream_neardup")(
      spark, TestSession.sfDir).collect()
    val batch = SparkEntry.queries("q30_dedup_minhash")(
      spark, TestSession.sfDir).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      s"streamed ${streamed.length} pairs != batch ${batch.length}")
  }

  test("q209 effective sample size sums to the cluster count") {
    // Each cluster's members carry 1e6 div csz micro-units apiece, so the
    // corpus ESS must land within integer-floor error of (number of
    // clusters) x 1e6 — computed here independently from the CC labels.
    val rows = SparkEntry.queries("q209_soft_dedup")(
      spark, TestSession.sfDir).collect()
    val ess = rows.map(_.getLong(2)).sum
    val nDocs = rows.map(_.getLong(1)).sum
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    val nComp = Clusters.survivors(docs.select(col("doc_id")), pairs)
      .select(col("comp")).distinct().count()
    assert(ess <= nComp * 1000000L && ess > nComp * 1000000L - nDocs,
      s"ESS $ess outside floor envelope of $nComp clusters ($nDocs docs)")
  }

  test("q207 split matrix accounts for exactly q30's near-dup pairs") {
    // The leakage audit partitions the SAME pair set q30 gates — its
    // matrix must sum to q30's pair count, and no split name outside
    // the q98 vocabulary may appear.
    val matrix = SparkEntry.queries("q207_split_leakage")(
      spark, TestSession.sfDir).collect()
    val pairTotal = matrix.map(_.getLong(2)).sum
    val q30 = SparkEntry.queries("q30_dedup_minhash")(
      spark, TestSession.sfDir).count()
    assert(pairTotal == q30, s"matrix pairs $pairTotal != q30 pairs $q30")
    val names = Set("train", "val", "test")
    matrix.foreach { r =>
      assert(names(r.getString(0)) && names(r.getString(1)),
        s"unexpected split label: $r")
      assert(r.getLong(3) <= 2 * r.getLong(2),
        s"docs involved exceeds pair endpoints: $r")
    }
  }
}

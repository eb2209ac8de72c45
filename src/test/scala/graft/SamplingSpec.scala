package graft

import graft.curation.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._
  private def docs = Tables.documents(spark, TestSession.sfDir)

  test("deterministic sample: same keys kept across runs and subsets") {
    val ids1 = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val ids2 = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids1 == ids2, "sample must be a pure function of the key")
    // keep/drop decisions don't change when the corpus grows: sampling
    // the first half keeps exactly the full-sample ids in that half
    val half = docs.where($"doc_id" < 250)
    val idsHalf = Sampling.deterministicSample(half, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(idsHalf == ids1.filter(_ < 250))
    // rate lands near the target
    val frac = ids1.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"sampled fraction $frac far from 0.3")
  }

  test("stratified sample drops unlisted strata, rates scale per stratum") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.4))
    val bySrc = out.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet.subsetOf(Set("src0", "src1")))
    assert(bySrc("src0") == 25) // rate 1.0 keeps everything
    assert(bySrc.getOrElse("src1", 0L) < 25)
  }

  test("mixToWeights approaches target proportions without upsampling") {
    val out = Sampling.mixToWeights(docs, "doc_id", "source",
      Map("src0" -> 0.5, "src1" -> 0.5), targetRows = 20)
    val n = out.count()
    // 10 rows per source targeted at rate 0.4 of 25; md5 buckets are
    // uneven at this size, so assert a band not the exact count
    assert(n >= 10 && n <= 30, s"mixed size $n far from target 20")
    // a stratum can never exceed its available rows (no upsampling)
    val caps = out.groupBy($"source").count().collect()
    assert(caps.forall(_.getLong(1) <= 25))
  }
}

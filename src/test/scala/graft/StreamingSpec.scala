package graft

import java.nio.file.Files

import graft.operators.ReferenceQueries
import graft.streaming.StreamingCollect
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("continuous collection: stream CSV files through WHERE filter to parquet") {
    val inDir = ReferenceQueries.csvFixture(spark, TestSession.sfDir)
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val ckDir = Files.createTempDirectory("graft_stream_ck").toString
    val spec = StreamingCollect.StreamSpec(
      schema = ReferenceQueries.lineitemSchema,
      inputDir = inDir,
      query = Some("SELECT * FROM S3Object s WHERE s.l_discount > 0.05"))
    val stream = StreamingCollect.reader(spark, spec)
    val q = StreamingCollect.writer(stream, spec, outDir, ckDir)
      .trigger(Trigger.AvailableNow()) // bounded drain for the test
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
    val expected = Tables.lineitem(spark, TestSession.sfDir)
      .where(col("l_discount") > 0.05).count()
    assert(out.count() == expected)
    assert(out.where(col("l_discount") <= 0.05).count() == 0)
    // exactly-once: restarting over the same checkpoint adds nothing
    val q2 = StreamingCollect.writer(stream, spec, outDir, ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(outDir).count() == expected)
  }
}

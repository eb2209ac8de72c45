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

  test("stateful dedup runs on the RocksDB state store (production conf)") {
    // The bounded verification runs use the default heap-backed state
    // store (cheapest for small replays); an unbounded production stream
    // holds state for every in-watermark key, which on real volumes must
    // live off-heap — this pins that the same query runs unchanged on
    // RocksDB, the conf a deployment would set.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val d = TestSession.sfDir
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$d/events.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val deduped = stream.unionByName(stream)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val got = StreamingCollect.runBounded(spark, deduped,
        "rocksdb_dedup_sink")
        .agg(sum(col("n"))).collect()(0).getLong(0)
      val want = spark.read.parquet(s"$d/events.parquet")
        .select(col("event_id")).distinct().count()
      assert(got == want, s"RocksDB dedup got $got, want $want")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

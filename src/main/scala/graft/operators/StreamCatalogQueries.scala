package graft.operators

import graft.{Det, Tables => T}
import graft.catalog.CatalogOps
import graft.streaming.StreamingCollect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming + catalog surface as registry queries. The streaming entries run
  * a real Structured Streaming query (Trigger.AvailableNow over the existing
  * parquet/CSV files) to a memory sink, then return the bounded result — so
  * the batch Verify harness exercises the streaming engine end-to-end and the
  * DuckDB oracle checks it like any batch query.
  */
object StreamCatalogQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Watermarked event-time windowed aggregation over the events stream.
    "q37_stream_window" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(d)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = StreamingCollect.windowedCounts(stream, "ts", "event_type")
      StreamingCollect.runBounded(s, agg, "q37_stream_window_sink")
        .orderBy(col("window_start"), col("event_type"))
    }),

    // The continuous-collection reader (CSV parse + coerce as a stream).
    "q38_stream_collect" -> ((s, d) => {
      val dir = ReferenceQueries.csvFixture(s, d)
      val spec = StreamingCollect.StreamSpec(
        schema = ReferenceQueries.lineitemSchema, inputDir = dir)
      val stream = StreamingCollect.reader(s, spec)
      val agg = stream.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
      StreamingCollect.runBounded(s, agg, "q38_stream_collect_sink")
        .orderBy(col("l_returnflag"))
    }),

    // Stateful streaming: watermarked dedup (the reference has no stateful
    // ops — SURVEY §2.9 — this is the Spark-native upgrade). Uses
    // dropDuplicatesWithinWatermark so per-key state IS evicted once the
    // watermark passes: plain dropDuplicates("event_id") only purges state
    // when the event-time column is part of the dedup key, so it would grow
    // without bound on a real stream.
    "q50_stream_dedup" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val batchSchema = s.read.parquet(s"$d/events.parquet").schema
      val stream = s.readStream.schema(batchSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // synthetic dup stream: each event arrives twice (union of two
        // readers), dedup must collapse them back to one per event_id
        .withColumn("event_id", col("event_id"))
      val doubled = stream.unionByName(stream)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      val agg = doubled.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      StreamingCollect.runBounded(s, agg, "q50_stream_dedup_sink")
        .orderBy(col("event_type"))
    }),

    // Catalog: ListTables with LIKE filter (P8).
    "q39_catalog_tables" -> ((s, d) => {
      T.documents(s, d).limit(1).createOrReplaceTempView("graft_docs")
      T.orders(s, d).limit(1).createOrReplaceTempView("graft_orders")
      CatalogOps.listTables(s, Some("graft\\_%")).select(col("name"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q37_stream_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         |  event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
         |FROM events
         |GROUP BY window_start, event_type
         |ORDER BY window_start, event_type""".stripMargin,

    "q38_stream_collect" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Det.sqlSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q39_catalog_tables" ->
      """SELECT name FROM (VALUES ('graft_docs'), ('graft_orders')) t(name)
        |ORDER BY name""".stripMargin,

    "q50_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}

package graft.operators

import graft.{Det, Tables => T}
import graft.jobs.CollectJob
import graft.ops.Audit
import graft.registry.QueryRegistry
import graft.similarity.Similarity
import graft.sources.FolderWalk
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** System-surface queries: transforms seam, query registry lifecycle, audit
  * status views, folder enumeration, BPE token counting, IVF ANN. */
object SystemQueries {

  /** Partitioned-directory fixture for the folder walk (lang=X/source=Y
    * leaves — the S3-prefix layout log producers use). */
  private def walkFixture(s: SparkSession, d: String): String = {
    val out = s"/tmp/graft_fixtures/${d.replaceAll("[^A-Za-z0-9.]", "_")}/walk"
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.documents(s, d).select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite")
        .partitionBy("lang", "source").parquet(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TransForms seam, live (SURVEY §2.10) ---------------------------
    "q40_transforms" -> ((s, d) => {
      val dir = ReferenceQueries.csvFixture(s, d)
      CollectJob.run(s, CollectJob.Spec(
        schema = ReferenceQueries.lineitemSchema,
        paths = Seq(dir),
        datasetName = "lineitem_transformed",
        transforms = Seq(
          "revenue" -> col("l_extendedprice") * (lit(1) - col("l_discount")),
          "ship_year" -> year(col("l_shipdate")))))
        .groupBy(col("ship_year"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("revenue")).as("sum_revenue"))
        .orderBy(col("ship_year"))
    }),

    // ---- query-registry lifecycle (SURVEY §1.1) -------------------------
    "q41_query_registry" -> ((s, d) => {
      import QueryRegistry._
      var reg = empty(s)
      reg = record(reg, Entry("SELECT 1", 1000L, "db1", "t1", "VPCFlow",
        "first", "Batch", "alice", "bob", Active = true, Archive = false))
      reg = record(reg, Entry("SELECT 2", 2000L, "db1", "t2", "CloudTrail",
        "second", "Batch", "alice", "", Active = true, Archive = false))
      reg = record(reg, Entry("SELECT 3", 3000L, "db1", "t1", "VPCFlow",
        "third", "Continuous", "carol", "", Active = true, Archive = false))
      activeQueries(reg)
        .select(col("UsersQuery"), col("UnixTime"), col("TableName"),
          col("QueryName"), col("QueryType"))
        .orderBy(col("UnixTime"))
    }),

    // ---- audit / invocation status view (SURVEY §2.9) -------------------
    "q42_audit_status" -> ((s, d) => {
      // Deterministic synthetic heartbeat stream derived from events.
      val rows = T.events(s, d).select(
        concat(lit("job"), (col("user_id") % 5).cast("string")).as("jobid"),
        concat(lit("inv"), (col("user_id") % 40).cast("string"))
          .as("invocationid"),
        col("event_id").as("updateunixtime"),
        when(col("event_type") === "error", "FAILED")
          .when(col("event_type") === "purchase", "COMPLETED")
          .otherwise("RUNNING").as("status"),
        lit("lg").as("loggroup"), lit("ls").as("logstream"))
      Audit.latestStatus(rows)
        .groupBy(col("jobid"), col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("jobid"), col("status"))
    }),

    // ---- folder enumeration to depth (SURVEY §2.1 S1) -------------------
    "q43_folder_walk" -> ((s, d) => {
      import s.implicits._
      val root = walkFixture(s, d)
      val leaves = FolderWalk.walk(s, Seq(root), depth = 2)
        .map(_.stripPrefix("file:").stripPrefix(root).stripPrefix("/"))
        .filter(_.nonEmpty)
      leaves.toDF("prefix").orderBy(col("prefix"))
    }),

    // ---- BPE-ish token counting (text analysis) -------------------------
    "q44_bpe_tokens" -> ((s, d) => {
      T.documents(s, d)
        .select(col("lang"),
          TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
          TextAnalysis.tokenCount(col("text")).as("ws"))
        .groupBy(col("lang"))
        .agg(sum(col("bpe")).cast("long").as("total_bpe_tokens"),
          sum(col("ws")).cast("long").as("total_ws_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // ---- IVF ANN recall (similarity, scale path #2) ---------------------
    "q45_ann_ivf" -> ((s, d) => {
      val emb = T.embeddings(s, d)
      Similarity.ivfRecall(emb.where(col("vec_id") < 10), emb, k = 5)
        .orderBy(col("query_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q40_transforms" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
         |  COUNT(*) AS n,
         |  ${Det.sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_revenue
         |FROM lineitem
         |GROUP BY ship_year ORDER BY ship_year""".stripMargin,

    "q41_query_registry" ->
      """SELECT * FROM (VALUES
        |  ('SELECT 2', CAST(2000 AS BIGINT), 't2', 'second', 'Batch'),
        |  ('SELECT 3', CAST(3000 AS BIGINT), 't1', 'third', 'Continuous'))
        |  t(UsersQuery, UnixTime, TableName, QueryName, QueryType)
        |ORDER BY UnixTime""".stripMargin,

    "q42_audit_status" ->
      """WITH rows AS (
        |  SELECT 'job' || CAST(user_id % 5 AS VARCHAR) AS jobid,
        |    'inv' || CAST(user_id % 40 AS VARCHAR) AS invocationid,
        |    event_id AS updateunixtime,
        |    CASE WHEN event_type = 'error' THEN 'FAILED'
        |         WHEN event_type = 'purchase' THEN 'COMPLETED'
        |         ELSE 'RUNNING' END AS status
        |  FROM events),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT jobid, invocationid, status,
        |      ROW_NUMBER() OVER (PARTITION BY jobid, invocationid
        |        ORDER BY updateunixtime DESC, status) AS rn
        |    FROM rows) WHERE rn = 1)
        |SELECT jobid, status, COUNT(*) AS n FROM latest
        |GROUP BY jobid, status ORDER BY jobid, status""".stripMargin,

    "q43_folder_walk" ->
      """SELECT DISTINCT 'lang=' || lang || '/source=' || source AS prefix
        |FROM documents ORDER BY prefix""".stripMargin,

    "q44_bpe_tokens" -> {
      s"""SELECT lang,
         |  CAST(SUM(${TextAnalysis.sqlBpeTokenCount}) AS BIGINT)
         |    AS total_bpe_tokens,
         |  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
         |    AS total_ws_tokens,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    }
  )
}

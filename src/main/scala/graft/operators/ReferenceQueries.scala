package graft.operators

import graft.{Det, Tables => T}
import graft.functions.Coerce
import graft.jobs.CollectJob
import graft.plans.ReadOnlyGuard
import graft.schema.{DataTypeSchema, FieldSpec, InputSerialization, SeqType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the reference-specific surfaces: find-DSL, NoSQL DSL,
  * views, guarded native SQL, ingest readers + coercion, and the collection
  * job. Each has a DuckDB oracle where SQL-expressible.
  */
object ReferenceQueries {
  import SeqType._

  /** lineitem re-declared as a reference DataType (CSV, comma, headerless) —
    * used by the ingest round-trip queries. */
  val lineitemSchema: DataTypeSchema = DataTypeSchema(
    "LineitemCsv",
    Seq("l_orderkey" -> SBigint, "l_partkey" -> SBigint,
      "l_suppkey" -> SBigint, "l_linenumber" -> SInteger,
      "l_quantity" -> SDouble, "l_extendedprice" -> SDouble,
      "l_discount" -> SDouble, "l_tax" -> SDouble,
      "l_returnflag" -> SString(8), "l_linestatus" -> SString(8),
      "l_shipdate" -> SDate).map { case (n, t) => FieldSpec(n, t) },
    InputSerialization(fieldDelimiter = ",", csvHeader = false))

  private val documentsDT = DataTypeSchema(
    "DocumentsJson",
    Seq("doc_id" -> SBigint, "text" -> SText, "lang" -> SString(8),
      "source" -> SString(32), "n_chars" -> SBigint)
      .map { case (n, t) => FieldSpec(n, t) },
    InputSerialization(jsonType = true, rootElement = "Records"),
    Map("Default" -> Seq("doc_id", "lang", "n_chars")))

  /** Deterministic per-SF fixture dir; written once per (sf, kind). */
  private def fixtureDir(d: String, kind: String): String =
    graft.Scratch.fixtureDir(d, kind)

  def csvFixture(s: SparkSession, d: String): String = {
    val out = fixtureDir(d, "lineitem_csv")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      T.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"),
          format_string("%.6f", col("l_quantity")).as("l_quantity"),
          format_string("%.6f", col("l_extendedprice")).as("l_extendedprice"),
          format_string("%.6f", col("l_discount")).as("l_discount"),
          format_string("%.6f", col("l_tax")).as("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")
            .as("l_shipdate"))
        // 16 files so the read parallelizes by file count, gzipped like the
        // reference's log objects (S4) — and 4x fewer bytes for the
        // container's ~10 MB/s cold-read disk.
        .repartition(16)
        .write.mode("overwrite").option("header", "false")
        .option("compression", "gzip").csv(out)
    }
    out
  }

  def jsonFixture(s: SparkSession, d: String): String = {
    val out = fixtureDir(d, "documents_json")
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      // One {"Records":[...]} document per bucket — the CloudTrail file shape.
      T.documents(s, d)
        .withColumn("bucket", col("doc_id") % 8)
        .groupBy(col("bucket"))
        .agg(collect_list(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("Records"))
        .select(to_json(struct(col("Records"))).as("value"))
        .write.mode("overwrite").option("compression", "gzip").text(out)
    }
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- find-DSL (SURVEY §2.2 P5/P6) -----------------------------------
    "q16_find_dsl" -> ((s, d) => {
      val dsl =
        """{"<and>": [
          |  {"o_totalprice": {"<gt>": "100000"}},
          |  {"<or>": [
          |    {"o_orderpriority": {"<like>": "1-%"}},
          |    {"o_orderstatus": "F"}
          |  ]},
          |  {"o_orderpriority": {"<ne>": "5-LOW"}},
          |  {"o_orderdate": {"<not>": null}}
          |]}""".stripMargin
      FindDsl.findAll(T.orders(s, d), dsl)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey")).limit(500)
    }),

    "q17_find_pk" -> ((s, d) => {
      FindDsl.findByPk(T.customer(s, d), "c_custkey", 42L)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // ---- NoSQL / metadata DSL (SURVEY §3.3) -----------------------------
    "q18_nosql_query" -> ((s, d) => {
      import NoSqlDsl._
      run(T.events(s, d), Query(
        keyConditions = Seq(BeginsWith("event_type", "s"),
          Between("user_id", 10L, 500L)),
        filters = Seq(Contains("props", "\"k\": 1"), Ne("value", 0.0)),
        orderBy = Some(("event_id", true)),
        limit = Some(200)))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
    }),

    // ---- Views as projections (SURVEY §2.2 P4) --------------------------
    "q19_view_projection" -> ((s, d) => {
      val cols = documentsDT.view("Default").map(col)
      T.documents(s, d).select(cols: _*)
        .orderBy(col("doc_id")).limit(300)
    }),

    // ---- guarded native SQL (SURVEY §3.2) -------------------------------
    "q20_native_sql" -> ((s, d) => {
      T.orders(s, d).createOrReplaceTempView("orders")
      T.customer(s, d).createOrReplaceTempView("customer")
      ReadOnlyGuard.query(s,
        s"""SELECT c_mktsegment,
           |  COUNT(*) AS n,
           |  ${Det.sqlSum("o_totalprice")} AS total
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |WHERE o_orderstatus = 'O'
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin,
        allowed = Some(Set("orders", "customer")))
    }),

    // ---- ingest: CSV round-trip (S6/S7 + P3) ----------------------------
    "q21_ingest_csv" -> ((s, d) => {
      val dir = csvFixture(s, d)
      graft.sources.IngestReader.csv(s, lineitemSchema, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"),
          max(col("l_shipdate")).as("max_shipdate"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- ingest: JSON + root unnest (S8) --------------------------------
    "q22_ingest_json" -> ((s, d) => {
      val dir = jsonFixture(s, d)
      graft.sources.IngestReader.json(s, documentsDT, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("lang"))
    }),

    // ---- coercion semantics vs an independent SQL oracle (P3) -----------
    "q23_coerce" -> ((s, d) => {
      val dirty = T.events(s, d).withColumn("raw",
        when(col("event_id") % 7 === 0, lit("-"))
          .when(col("event_id") % 11 === 0, lit("null"))
          .when(col("event_id") % 13 === 0,
            concat(lit("  "), format_string("%.6f", col("value")), lit("ms")))
          .otherwise(format_string("%.6f", col("value"))))
      dirty.withColumn("coerced", Coerce.asDouble(col("raw")))
        .groupBy(col("event_type"))
        .agg(count(col("coerced")).as("n_parsed"),
          sum(when(col("coerced").isNull, 1).otherwise(0)).as("n_null"),
          Det.dsum(col("coerced")).as("sum_v"))
        .orderBy(col("event_type"))
    }),

    // ---- the full collection job with S3Object-dialect WHERE (§3.1) -----
    "q24_collect_job" -> ((s, d) => {
      val dir = csvFixture(s, d)
      CollectJob.run(s, CollectJob.Spec(
        schema = lineitemSchema,
        paths = Seq(dir),
        datasetName = "lineitem_collected",
        query = Some("SELECT l_orderkey, l_linenumber, l_quantity, " +
          "l_returnflag FROM S3Object[*] s WHERE s.l_discount > 0.09 " +
          "AND s.l_returnflag != 'N'")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(1000)
    }),

    // ---- JDBC sink round-trip (SURVEY §2.1 S10 true parity) -------------
    // The same collect pipeline as q24 but lands in an embedded Derby
    // database through the connection-capacity-bounded JDBC writer, then
    // reads back over JDBC and aggregates — so the gate hashes data that
    // physically round-tripped through the RDBMS bulk-insert path.
    "q53_jdbc_sink" -> ((s, d) => {
      val dir = csvFixture(s, d)
      val url = "jdbc:derby:memory:graftq53;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      CollectJob.collectJdbc(s, CollectJob.Spec(
        schema = lineitemSchema,
        paths = Seq(dir),
        datasetName = "lineitem_jdbc",
        // selective filter: the gate proves the JDBC round-trip machinery,
        // not the embedded database's single-JVM insert throughput — a
        // production target absorbs the full stream across real hosts
        query = Some("SELECT l_orderkey, l_quantity, l_discount, " +
          "l_returnflag FROM S3Object[*] s WHERE s.l_discount > 0.09 " +
          "AND s.l_quantity <= 10")),
        // 1560 MB host → 8-connection budget: embedded Derby serializes
        // writers on a single JVM lock, so a small pool beats a wide one
        url, props, instanceMemoryMb = 1560, engine = "postgres")
      graft.sinks.JdbcSink.read(s, url, "lineitem_jdbc", props)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          graft.Det.dsum(col("l_quantity")).as("sum_qty"),
          graft.Det.dsum(col("l_discount")).as("sum_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- sink-failure quarantine (DebugInsert, worker.js:774-823) -------
    // The reference wraps each worker's bulk insert in a transaction; a
    // failing batch rolls back whole and its rows + error are dumped to
    // ProcessingErrors/DebugInsert. Here: orders rows batch by customer
    // group, the target table carries a row-intrinsic CHECK constraint,
    // and planted poison rows (every 3000th orderkey) violate it — so a
    // poisoned group must land ZERO rows (rollback) and surface ALL its
    // rows in the quarantine frame, while clean groups insert fully. The
    // gate compares the REAL outcome (Derby read-back + quarantine
    // counts) against the oracle's prediction of which groups contain
    // poison — proving transactional all-or-nothing per batch.
    "q199_sink_quarantine" -> ((s, d) => {
      val dbId = java.util.UUID.randomUUID.toString.replace("-", "")
      val url = s"jdbc:derby:memory:graft$dbId;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        st.execute("""CREATE TABLE orders_sunk ("o_orderkey" BIGINT, """ +
          """"g" BIGINT, "val" BIGINT CHECK ("val" > 0))""")
        st.close()
      } finally c.close()
      val src = T.orders(s, d).select(
        col("o_orderkey"),
        (col("o_custkey") % 20).as("g"),
        when(col("o_orderkey") % 3000 === 0, lit(-1L))
          .otherwise(lit(1L)).as("val"))
      val errs = graft.sinks.JdbcSink.writeWithQuarantine(src, col("g"),
        url, "orders_sunk", props, instanceMemoryMb = 1560,
        engine = "postgres", jobid = "q199")
      val ins = graft.sinks.JdbcSink.read(s, url, "orders_sunk", props)
        .groupBy(col("g")).agg(count(lit(1)).as("n_inserted"))
      val qr = errs.groupBy(col("logstream").cast("bigint").as("g"))
        .agg(count(lit(1)).as("n_quarantined"))
      val out = ins.join(qr, Seq("g"), "full_outer")
        .select(col("g"),
          coalesce(col("n_inserted"), lit(0L)).as("n_inserted"),
          coalesce(col("n_quarantined"), lit(0L)).as("n_quarantined"))
        .orderBy(col("g"))
      // materialize, then DROP the per-invocation in-memory Derby DB so
      // repeated invocations in one JVM (the bench) don't accumulate heap
      val rows = out.collect()
      try java.sql.DriverManager
        .getConnection(s"jdbc:derby:memory:graft$dbId;drop=true")
      catch { case _: java.sql.SQLException => () } // 08006 = dropped OK
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq), out.schema)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q16_find_dsl" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
        |  o_orderpriority
        |FROM orders
        |WHERE o_totalprice > 100000
        |  AND (o_orderpriority LIKE '1-%' OR o_orderstatus = 'F')
        |  AND o_orderpriority <> '5-LOW'
        |  AND o_orderdate IS NOT NULL
        |ORDER BY o_orderkey LIMIT 500""".stripMargin,

    "q17_find_pk" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey = 42""".stripMargin,

    "q18_nosql_query" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE starts_with(event_type, 's')
        |  AND user_id BETWEEN 10 AND 500
        |  AND contains(props, '"k": 1')
        |  AND value <> 0.0
        |ORDER BY event_id LIMIT 200""".stripMargin,

    "q19_view_projection" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |ORDER BY doc_id LIMIT 300""".stripMargin,

    "q20_native_sql" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |  ${Det.sqlSum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE o_orderstatus = 'O'
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "q21_ingest_csv" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${Det.sqlSum("l_quantity")} AS sum_qty,
         |  ${Det.sqlSum("l_extendedprice")} AS sum_price,
         |  MAX(l_shipdate) AS max_shipdate
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q22_ingest_json" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_doc
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q23_coerce" ->
      s"""WITH dirty AS (
         |  SELECT event_type,
         |    CASE WHEN event_id % 7 = 0 THEN '-'
         |         WHEN event_id % 11 = 0 THEN 'null'
         |         WHEN event_id % 13 = 0 THEN '  ' || printf('%.6f', value) || 'ms'
         |         ELSE printf('%.6f', value) END AS raw
         |  FROM events),
         |coerced AS (
         |  SELECT event_type,
         |    CASE WHEN raw IS NULL OR lower(raw) = 'null' THEN NULL
         |         ELSE TRY_CAST(regexp_extract(trim(raw),
         |           '^[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?', 0) AS DOUBLE)
         |    END AS v
         |  FROM dirty)
         |SELECT event_type, COUNT(v) AS n_parsed,
         |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  ${Det.sqlSum("v")} AS sum_v
         |FROM coerced GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q24_collect_job" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_discount > 0.09 AND l_returnflag <> 'N'
        |ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin,

    "q53_jdbc_sink" -> {
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${graft.Det.sqlSum("l_quantity")} AS sum_qty,
         |  ${graft.Det.sqlSum("l_discount")} AS sum_disc
         |FROM lineitem
         |WHERE l_discount > 0.09 AND l_quantity <= 10
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    // Predicts the transactional outcome: a group containing any poison
    // row (orderkey % 3000 = 0 → CHECK violation) rolls back whole —
    // zero inserted, all quarantined; clean groups insert fully.
    "q199_sink_quarantine" ->
      """WITH r AS (SELECT o_custkey % 20 AS g,
        |  CASE WHEN o_orderkey % 3000 = 0 THEN 1 ELSE 0 END AS p
        |  FROM orders)
        |SELECT g,
        |  CAST(CASE WHEN MAX(p) = 1 THEN 0 ELSE COUNT(*) END AS BIGINT)
        |    AS n_inserted,
        |  CAST(CASE WHEN MAX(p) = 1 THEN COUNT(*) ELSE 0 END AS BIGINT)
        |    AS n_quarantined
        |FROM r GROUP BY g ORDER BY g""".stripMargin
  )
}

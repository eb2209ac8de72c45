package graft

import java.util.Properties

import graft.sinks.JdbcSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def derbyProps: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("connection-capacity model matches the reference's math") {
    // controller.js:717-730: round((memMB - 600) / perConnMB)
    // postgres on an 8 GB host: round(7400 / 120) = 62
    assert(JdbcSink.maxDbConnectionCount(8000, "postgres") == 62L)
    // mysql on a 16 GB host: round(15400 / 100) = 154
    assert(JdbcSink.maxDbConnectionCount(16000, "mysql") == 154L)
    // mssql ceiling binds on a huge host: memory math would say 33994,
    // the RDS engine limit is 32767
    assert(JdbcSink.maxDbConnectionCount(3400000, "mssql") == 32767L)
    // tiny host never goes below one connection
    assert(JdbcSink.maxDbConnectionCount(500, "postgres") == 1L)
    // writer partitions leave 10% headroom for interactive readers
    assert(JdbcSink.writerPartitions(8000, "postgres") == 55)
    assert(JdbcSink.writerPartitions(500, "postgres") == 1)
  }

  test("mssql dialect lands text/JSON columns on NVARCHAR(MAX)") {
    // convertschema parity (enginesharedv3.mjs:182-193) comes from
    // Spark's own dialect: StringType (which carries our SText and SJson
    // columns) creates as NVARCHAR(MAX) — the reference's downgrade
    // target — so no schema rewrite exists to maintain here.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types.StringType
    val d = JdbcDialects.get("jdbc:sqlserver://host;database=x")
    assert(d.getJDBCType(StringType).map(_.databaseTypeDefinition)
      .contains("NVARCHAR(MAX)"))
  }

  test("convertschema seam: MSSQL downgrades the stringy family to TEXT") {
    // enginesharedv3.mjs:182-193: JSON → STRING, STRING(n) → TEXT,
    // STRING → TEXT — i.e. for MSSQL every stringy column ends at TEXT.
    import graft.schema.{DataTypeSchema, FieldSpec, SeqType}
    import SeqType._
    val sc = DataTypeSchema("T", Seq(
      FieldSpec("a", SString(64)), FieldSpec("b", SJson),
      FieldSpec("c", SText), FieldSpec("d", SBigint)))
    assert(sc.convertFor("mssql").fields.map(_.stype) ==
      Seq(SText, SText, SText, SBigint))
    // other engines keep the declared model untouched
    assert(sc.convertFor("postgres") == sc)
    // DDL overrides: sized strings become faithful VARCHAR(n) on engines
    // that keep them; MSSQL emits none (dialect lands NVARCHAR(MAX))
    assert(JdbcSink.createTableColumnTypes(Some(sc), "postgres")
      .contains("`a` VARCHAR(64)"))
    assert(JdbcSink.createTableColumnTypes(Some(sc), "mssql").isEmpty)
  }

  test("engine-profiled DDL round-trips: VARCHAR(n) actually lands") {
    import graft.schema.{DataTypeSchema, FieldSpec, SeqType}
    import SeqType._
    import spark.implicits._
    val sc = DataTypeSchema("T", Seq(
      FieldSpec("name", SString(64)), FieldSpec("n", SBigint)))
    val url = "jdbc:derby:memory:graftddl;create=true"
    JdbcSink.write(Seq(("alpha", 1L), ("beta", 2L)).toDF("name", "n"),
      url, "ddl_t", derbyProps, 8000, "postgres", overwrite = true,
      schemaTypes = Some(sc))
    // the table's column must be the profiled VARCHAR(64), not the
    // dialect default (CLOB on Derby)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // Spark passes the table name unquoted (Derby stores it uppercase)
      // but quotes column identifiers (stored lowercase)
      val rs = conn.getMetaData.getColumns(null, null, "DDL_T", "name")
      assert(rs.next(), "column metadata missing")
      assert(rs.getString("TYPE_NAME") == "VARCHAR", rs.getString("TYPE_NAME"))
      assert(rs.getInt("COLUMN_SIZE") == 64)
    } finally conn.close()
    val back = JdbcSink.read(spark, url, "ddl_t", derbyProps)
    assert(back.orderBy("n").select("name").as[String].collect()
      .sameElements(Array("alpha", "beta")))
  }

  test("round-trip: bulk insert to Derby reads back equal to the source") {
    val src = Tables.lineitem(spark, TestSession.sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .where(col("l_orderkey") < 1000)
    val url = "jdbc:derby:memory:graftspec;create=true"
    JdbcSink.write(src, url, "rt_lineitem", derbyProps,
      instanceMemoryMb = 8000, engine = "postgres", overwrite = true)
    val back = JdbcSink.read(spark, url, "rt_lineitem", derbyProps)
    assert(back.count() == src.count())
    val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      format_string("%.6f", col("l_quantity")), col("l_returnflag"))
    val a = src.select(key.as("k")).orderBy("k").collect().map(_.getString(0))
    val b = back.select(key.as("k")).orderBy("k").collect().map(_.getString(0))
    assert(a.sameElements(b), "JDBC round-trip changed the data")
  }

  test("failed batch rolls back whole and lands in quarantine (DebugInsert)") {
    // worker.js:774-823 parity: a batch (group) with a constraint-violating
    // row must leave ZERO rows in the table (transaction rollback), every
    // row of the group must surface in the ProcessingErrors-shaped frame,
    // and the failing SQL must be dumped under DebugInsert/.
    import spark.implicits._
    val url = "jdbc:derby:memory:graftquar;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("""CREATE TABLE quar_t ("id" BIGINT, "grp" VARCHAR(8), """ +
        """"v" BIGINT CHECK ("v" > 0))""")
      st.close()
    } finally c.close()
    // group "bad" carries one poison row among good ones; "good" is clean
    val src = Seq(
      (1L, "good", 5L), (2L, "good", 6L), (3L, "good", 7L),
      (10L, "bad", 1L), (11L, "bad", -1L), (12L, "bad", 2L)
    ).toDF("id", "grp", "v")
    val dump = s"${Scratch.root}/graft_debuginsert"
    val errs = JdbcSink.writeWithQuarantine(src, col("grp"), url, "quar_t",
      derbyProps, instanceMemoryMb = 1560, engine = "postgres",
      jobid = "specjob", debugDumpDir = Some(dump))
    // clean group fully inserted; poisoned group fully rolled back
    val landed = JdbcSink.read(spark, url, "quar_t", derbyProps)
      .select(col("id").cast("long")).as[Long].collect().sorted
    assert(landed.sameElements(Array(1L, 2L, 3L)),
      s"rollback leaked rows: ${landed.mkString(",")}")
    val q = errs.collect()
    assert(q.length == 3, s"expected the whole bad group quarantined: ${q.length}")
    assert(q.forall(_.getAs[String]("logstream") == "bad"))
    assert(q.forall(_.getAs[String]("loggroup") == "quar_t"))
    assert(q.forall(_.getAs[String]("jobid") == "specjob"))
    assert(q.forall(r => Option(r.getAs[String]("errormessage"))
      .exists(_.nonEmpty)), "errormessage must carry the database error")
    // payloads of all three rows present
    val payloads = q.map(_.getAs[String]("path")).sorted
    assert(payloads.exists(_.startsWith("11,")), payloads.mkString(";"))
    // DebugInsert SQL dump exists and names the failing statement
    val f = new java.io.File(s"$dump/DebugInsert/specjob_bad_error.sql")
    assert(f.exists(), s"missing dump ${f.getPath}")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(txt.contains("INSERT INTO quar_t"), txt.take(200))
    assert(txt.contains("(11, bad, -1)"), txt.take(400))
    // quarantine frame is checkpointed: re-reading it must NOT re-insert
    errs.count()
    assert(JdbcSink.read(spark, url, "quar_t", derbyProps).count() == 3L)
  }

  test("append mode accumulates, overwrite replaces") {
    val url = "jdbc:derby:memory:graftspec2;create=true"
    val src = Tables.region(spark, TestSession.sfDir)
    val n = src.count()
    JdbcSink.write(src, url, "rt_region", derbyProps, 8000, "postgres",
      overwrite = true)
    JdbcSink.write(src, url, "rt_region", derbyProps, 8000, "postgres",
      overwrite = false)
    assert(JdbcSink.read(spark, url, "rt_region", derbyProps).count() == 2 * n)
    JdbcSink.write(src, url, "rt_region", derbyProps, 8000, "postgres",
      overwrite = true)
    assert(JdbcSink.read(spark, url, "rt_region", derbyProps).count() == n)
  }
}

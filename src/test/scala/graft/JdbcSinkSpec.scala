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

package graft.sinks

import java.util.Properties

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** One quarantined row from a failed bulk-insert batch, in the reference's
  * ProcessingErrors column layout (enginesharedv3.mjs:38-90 /
  * resources/graft/schemas/ProcessingErrors.json): `errormessage` carries
  * the database error, `path` the rendered row payload, `loggroup` the
  * destination table, `logstream` the batch key whose transaction was
  * rolled back. */
final case class QuarantineRow(jobid: String, invocationid: String,
    updateunixtime: Long, errormessage: String, path: String,
    loggroup: String, logstream: String)

/** JDBC bulk-insert sink — the reference's actual job output surface.
  *
  * The reference worker ends every collection batch with a bulk insert into
  * PostgreSQL/MySQL/MSSQL (reference sources/worker/worker.js:774-823), and
  * its controller sizes the worker fleet from a connection-capacity model:
  * per-connection memory by engine, instance memory minus a fixed OS
  * reserve, and a hard engine connection ceiling
  * (controller.js:33-41,717-743). Spark's JDBC writer opens one connection
  * per partition, so the same model bounds `numPartitions` here: the
  * cluster-wide writer count can never exceed what the database host's
  * memory sustains, no matter how many executors the read side used. That
  * is the piece that matters at 100 TB — a 10 000-task scan must funnel
  * into a few dozen writer connections, not DDoS the database.
  */
object JdbcSink {

  /** Per-engine (memory MB per connection, engine max connections) —
    * controller.js:33-41 (`dbenginememorylimits`; the memory figures come
    * from the reference's sustained-load testing, the ceilings from the
    * RDS engine-limits table). */
  final case class EngineLimits(memPerConnMb: Int, engineMaxConns: Long)

  val engineLimits: Map[String, EngineLimits] = Map(
    "mysql" -> EngineLimits(100, 100000L),
    "postgres" -> EngineLimits(120, 8388607L),
    "mssql" -> EngineLimits(100, 32767L))

  /** Fixed OS reserve subtracted before connection math
    * (controller.js:729: `instancememorymb - 600`). */
  val OsReserveMb = 600L

  /** Max connections the database host sustains —
    * `determinemaxdbconnectioncount` (controller.js:717-730): instance
    * memory minus the OS reserve, divided by the engine's per-connection
    * memory, never above the engine's hard ceiling. Unknown engines get
    * the most conservative per-connection figure in the table. */
  def maxDbConnectionCount(instanceMemoryMb: Long, engine: String): Long = {
    val lim = engineLimits.getOrElse(engine.toLowerCase,
      EngineLimits(120, Long.MaxValue))
    val memoryBased =
      math.max(1L, math.round(
        (instanceMemoryMb - OsReserveMb).toDouble / lim.memPerConnMb))
    math.min(memoryBased, lim.engineMaxConns)
  }

  /** Writer-side parallelism for a bulk insert. The reference caps each
    * worker Lambda's pool at 2 connections and sizes the fleet so the sum
    * stays inside `maxDbConnectionCount` (worker.js:825-879,
    * controller.js:430-501 admission control); a Spark JDBC writer task
    * holds exactly one connection, so the partition count maps 1:1 onto
    * the connection budget. `utilization` leaves headroom for interactive
    * readers (the reference's proxy pool, enginesharedv3.mjs:142-180). */
  def writerPartitions(instanceMemoryMb: Long, engine: String,
      utilization: Double = 0.9): Int = {
    val budget = maxDbConnectionCount(instanceMemoryMb, engine) * utilization
    math.max(1, math.min(budget.toLong, Int.MaxValue.toLong).toInt)
  }

  /** Bulk insert `df` into `table`, with writer parallelism bounded by
    * the connection-capacity model. `overwrite = true` is the reference's
    * drop-and-replace `sync({force:true})` (enginesharedv3.mjs:319-336);
    * false appends, like the per-batch worker inserts.
    *
    * Engine-specific column types — the reference's `convertschema`
    * (enginesharedv3.mjs:182-193) downgrades every JSON and
    * STRING(n)/STRING column to TEXT for MSSQL (driver rejects JSON,
    * sized strings cap at 8000 chars). Spark needs no analog: JSON
    * columns are StringType in [[graft.schema.DataTypeSchema]], and
    * Spark's own `MsSqlServerDialect` maps StringType to NVARCHAR(MAX)
    * at table creation — exactly the downgraded type the reference
    * lands on. */
  def write(df: DataFrame, url: String, table: String, props: Properties,
      instanceMemoryMb: Long, engine: String,
      overwrite: Boolean = false, batchSize: Int = 10000,
      schemaTypes: Option[graft.schema.DataTypeSchema] = None): Unit = {
    val writers = writerPartitions(instanceMemoryMb, engine)
    val w = df.write
      .mode(if (overwrite) "overwrite" else "append")
      .option("numPartitions", writers) // JDBC writer coalesces to this
      .option("batchsize", batchSize) // multi-row inserts, worker.js:774
    // only columns actually present survive — the collect query may have
    // projected a subset of the declared schema, and Spark rejects
    // createTableColumnTypes entries absent from the frame
    val present = df.columns.map(_.toLowerCase).toSet
    createTableColumnTypes(
      schemaTypes.map(sc => sc.copy(fields =
        sc.fields.filter(f => present(f.name.toLowerCase)))), engine)
      .fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, props)
  }

  /** Engine-specific CREATE TABLE column overrides — the reference's
    * `convertschema` seam (enginesharedv3.mjs:182-193) expressed as
    * Spark's `createTableColumnTypes` option. Sized strings create as
    * faithful `VARCHAR(n)` on engines that keep them; for MSSQL
    * [[graft.schema.SeqType.convertFor]] downgrades the whole stringy
    * family (JSON, STRING(n), STRING → TEXT) first, so no override
    * survives and Spark's MsSqlServerDialect lands every string column on
    * NVARCHAR(MAX) — exactly the reference's downgrade target. TEXT and
    * JSON columns never emit overrides on any engine: they are
    * StringType, and each dialect's default (TEXT / CLOB /
    * NVARCHAR(MAX)) is already unbounded. */
  def createTableColumnTypes(schema: Option[graft.schema.DataTypeSchema],
      engine: String): Option[String] = schema.flatMap { sc =>
    val overrides = sc.convertFor(engine).fields.collect {
      case graft.schema.FieldSpec(nm, graft.schema.SeqType.SString(len)) =>
        s"`$nm` VARCHAR($len)"
    }
    if (overrides.isEmpty) None else Some(overrides.mkString(", "))
  }

  /** Bulk insert with the reference's failure quarantine (DebugInsert,
    * worker.js:774-823): rows are grouped by `batchKey` (the reference's
    * batch is one worker's file), each group inserts inside ONE
    * transaction, and a failing group is rolled back whole — no partial
    * batches ever land, `bulkCreate` + `t.rollback()` parity. The failed
    * group's rows come back as a ProcessingErrors-shaped DataFrame
    * (row payload in `path`, database error in `errormessage`, batch key
    * in `logstream`), and when `debugDumpDir` is set the failing INSERT
    * SQL is dumped under `<dir>/DebugInsert/` like the reference's
    * `DebugInsert/<ts>_error.sql` S3 upload (worker.js:800-806).
    *
    * Scale shape: the frame is hash-repartitioned on the batch key into
    * the connection-capacity-bounded writer count, so a group is never
    * split across connections and the database sees at most
    * [[writerPartitions]] concurrent writers no matter how wide the scan
    * was. Per-group buffering is bounded by the batch size the caller
    * chose as `batchKey` granularity — the same bound as the reference
    * worker holding one file's `Transformeddata` in memory. The returned
    * frame is eagerly localCheckpoint'ed: the inserts are side effects
    * of computing it, so its lineage must never re-run (on a cluster
    * you'd reliable-checkpoint it; Spark task retries keep the usual
    * at-least-once sink semantics, same as a retried reference Lambda).
    *
    * The target table must already exist (the reference `Entry.init`s the
    * model first); identifiers are dialect-quoted so Spark-created tables
    * (case-preserved) resolve. */
  def writeWithQuarantine(df: DataFrame, batchKey: Column, url: String,
      table: String, props: Properties, instanceMemoryMb: Long,
      engine: String, jobid: String, debugDumpDir: Option[String] = None,
      batchSize: Int = 10000): DataFrame = {
    val writers = writerPartitions(instanceMemoryMb, engine)
    val cols = df.columns
    val n = cols.length
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val insertSql = s"INSERT INTO $table " +
      cols.map(dialect.quoteIdentifier).mkString("(", ", ", ")") +
      Seq.fill(n)("?").mkString(" VALUES (", ", ", ")")
    val driver = props.getProperty("driver")
    val propsCopy = new Properties()
    propsCopy.putAll(props)
    val keyed = df.withColumn("__gk", batchKey.cast("string"))
      .repartition(writers, col("__gk"))
      .sortWithinPartitions("__gk")
    val errs = keyed.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        if (driver != null) Class.forName(driver)
        val conn = java.sql.DriverManager.getConnection(url, propsCopy)
        conn.setAutoCommit(false)
        val out = scala.collection.mutable.ArrayBuffer[QuarantineRow]()
        val buffered = it.buffered
        try {
          while (buffered.hasNext) {
            val gk = buffered.head.getString(n)
            val group = scala.collection.mutable.ArrayBuffer[Row]()
            while (buffered.hasNext &&
                java.util.Objects.equals(buffered.head.getString(n), gk))
              group += buffered.next()
            val ps = conn.prepareStatement(insertSql)
            try {
              var pending = 0
              group.foreach { r =>
                var c = 0
                while (c < n) { ps.setObject(c + 1, r.get(c)); c += 1 }
                ps.addBatch(); pending += 1
                if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
              }
              if (pending > 0) ps.executeBatch()
              conn.commit()
            } catch {
              case scala.util.control.NonFatal(e) =>
                conn.rollback() // whole-group rollback, worker.js:813
                val msg = {
                  var t: Throwable = e
                  while (t.getCause != null && t.getCause != t) t = t.getCause
                  Option(t.getMessage).getOrElse(t.getClass.getName)
                }.take(8192)
                debugDumpDir.foreach { dir =>
                  dumpErrorSql(dir, jobid, gk, insertSql, msg, group, n)
                }
                val ts = System.currentTimeMillis() / 1000
                val inv = s"$jobid-p${TaskContext.getPartitionId()}"
                group.foreach { r =>
                  out += QuarantineRow(jobid, inv, ts, msg,
                    renderRow(r, n), table, String.valueOf(gk))
                }
            } finally ps.close()
          }
        } finally conn.close()
        out.iterator
      }
    }(Encoders.product[QuarantineRow]).toDF()
    // inserts are side effects of this frame's computation — cut the
    // lineage eagerly so nothing can ever recompute (= re-insert) it
    errs.localCheckpoint(true)
  }

  /** Row payload rendered for the quarantine record (bounded). */
  private def renderRow(r: Row, n: Int): String =
    (0 until n).map(i => String.valueOf(r.get(i))).mkString(",").take(8192)

  /** The reference's DebugInsert dump: the failing SQL + error to a
    * `DebugInsert/` prefix (worker.js:800-806 writes `err.sql` to S3).
    * Value tuples are capped at 1000 — unlike the reference we never
    * spool an unbounded batch back through the driver-side of a dump. */
  private def dumpErrorSql(dir: String, jobid: String, gk: String,
      insertSql: String, msg: String, group: scala.collection.Seq[Row],
      n: Int): Unit = {
    val safe = String.valueOf(gk).replaceAll("[^A-Za-z0-9_-]", "_")
    val p = java.nio.file.Paths.get(dir, "DebugInsert",
      s"${jobid}_${safe}_error.sql")
    java.nio.file.Files.createDirectories(p.getParent)
    val tuples = group.take(1000).map(r =>
      (0 until n).map(i => String.valueOf(r.get(i)))
        .mkString("(", ", ", ")"))
    val tail = if (group.size > 1000)
      s"\n-- … ${group.size - 1000} more rows" else ""
    java.nio.file.Files.write(p,
      (s"-- $msg\n$insertSql\n-- batch of ${group.size} rows:\n" +
        tuples.mkString(",\n") + tail).getBytes("UTF-8"))
  }

  /** Read a sunk table back (parallel read left to the caller's options —
    * verification reads here are small). */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)
}

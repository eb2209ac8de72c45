package graft.sinks

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      overwrite: Boolean = false, batchSize: Int = 10000): Unit = {
    val writers = writerPartitions(instanceMemoryMb, engine)
    df.write
      .mode(if (overwrite) "overwrite" else "append")
      .option("numPartitions", writers) // JDBC writer coalesces to this
      .option("batchsize", batchSize) // multi-row inserts, worker.js:774
      .jdbc(url, table, props)
  }

  /** Read a sunk table back (parallel read left to the caller's options —
    * verification reads here are small). */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)
}

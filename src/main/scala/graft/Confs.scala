package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONLY sanctioned channel for session-conf mutation inside
  * `operators/`. A bare `s.conf.set(...)` in a registry query is a
  * one-way mutation of the SHARED session: every later query in the
  * same JVM inherits it, so plan shape (and, for write confs, on-disk
  * semantics) silently depends on registry iteration order. The round-5
  * `withPlannedConf` fix caught the planning-time variant; round 6's
  * review found five execution-time variants (streaming writes setting
  * `partitionOverwriteMode=dynamic` and never restoring). This object
  * centralizes both shapes, and `ConfHygieneSpec` greps `operators/`
  * asserting no `conf.set`/`conf.unset` exists outside these helpers.
  */
object Confs {

  val OverwriteModeKey = "spark.sql.sources.partitionOverwriteMode"

  /** Run `body` under a session-conf override and ALWAYS restore the
    * previous value (or unset) afterwards — for EXECUTION-time confs
    * that must stay live for the duration of a blocking run (a bounded
    * streaming query's foreachBatch writes, a state-store provider),
    * not just while the plan is built. The body must be synchronous:
    * anything it leaves lazily un-executed (a returned DataFrame is
    * fine — result frames only read) must not depend on the override. */
  def withRunConf[A](s: SparkSession, key: String, value: String)(
      body: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Dynamic-partition-overwrite scope: the exactly-once discipline for
    * batch_id-partitioned streaming state (a replayed micro-batch
    * rewrites ITS OWN partition, never double-counts) needs the
    * override live across the whole bounded run; the conf is restored
    * when the run completes so later static-overwrite writers in the
    * same JVM keep static semantics. */
  def dynamicOverwrite[A](s: SparkSession)(body: => A): A =
    withRunConf(s, OverwriteModeKey, "dynamic")(body)

  /** Build a frame under a PLANNING-time conf override, force the
    * physical plan while the override is live, then restore — the
    * returned frame keeps its planned form (QueryExecution caches
    * executedPlan) while later registry queries see an untouched
    * session. */
  def withPlannedConf(s: SparkSession, key: String, value: String)(
      build: => DataFrame): DataFrame =
    withRunConf(s, key, value) {
      val df = build
      df.queryExecution.executedPlan // force planning under the override
      df
    }

  /** Data-scaled shuffle-partition count for a scope whose intermediates
    * are proportional to `src`'s bytes (round 9, replacing the round-8
    * hardcoded "8" on the HNSW scopes — a constant tuned to local[32] at
    * sf0.1 that inverts into a scale-killer at 100 TB, where
    * "corpus × M"-sized frames through 8 reducers would each carry
    * terabytes). Derivation: `expansion` × the optimizer's size estimate
    * of `src` (file-size-based for parquet relations, no job runs),
    * divided into ~64 MB reducer partitions — the guide §2.2 target
    * range — clamped to [1, session setting]. At sf0.1 this yields 1–4
    * partitions (LESS scheduling overhead than the old 8); at 100 TB it
    * yields the session's own data-appropriate count, because these
    * intermediates are never bigger than `expansion` × input. */
  def scaledShufflePartitions(s: SparkSession, src: DataFrame,
      expansion: Double = 4.0,
      bytesPerPartition: Long = 64L << 20): Int = {
    val session =
      try s.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 200 }
    val bytes =
      try src.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble
      catch { case _: Throwable => return session }
    val want = math.ceil(bytes * expansion / bytesPerPartition.toDouble)
    math.max(1, math.min(session.toDouble, want).toInt)
  }

  /** Idempotent pin of the legacy nanos-as-long parquet read flag to the
    * one value this library ever uses (`Tables.t` sets the same pin for
    * every catalog read; raw `readStream`/`read` sites over the events
    * fixtures need it too because the testdata drop may carry
    * TIMESTAMP(NANOS)). Deliberately NOT restore-scoped: the value is a
    * constant, so re-pinning is a no-op, and restoring it mid-session
    * would break any concurrent reader of the same fixtures. */
  def pinNanosAsLong(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
}

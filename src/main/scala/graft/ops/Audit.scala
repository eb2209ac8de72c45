package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Job/invocation status + audit surface.
  *
  * The reference tracks worker health in an `Invocations` RDBMS table
  * (INVOKED/RUNNING/COMPLETED heartbeat rows every 5 s, reference
  * sources/worker/worker.js:718-772; schema enginesharedv3.mjs:17-36) and an
  * append-only `Logverz-Invocations` DynamoDB audit log (commonsharedv3.js:
  * 89-128). On Spark the fleet lifecycle itself is the scheduler's job; what
  * remains engine-relevant is the *queryable status surface*: append-only
  * status rows + "latest status per job/invocation" and severity rollups.
  */
object Audit {

  final case class StatusRow(
      jobid: String,
      invocationid: String,
      updateunixtime: Long,
      status: String,
      loggroup: String,
      logstream: String)

  def toDF(spark: SparkSession, rows: Seq[StatusRow]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Latest status per (jobid, invocationid) — the controller's poll view
    * (controller.js:430-501 reads these to admission-control the fleet).
    *
    * Implemented as a `min_by` aggregate rather than a row_number window:
    * the window form sorts every group in full after a shuffle, while the
    * aggregate gets map-side partial aggregation (each input partition
    * reduces to one candidate row per group before the exchange) — the
    * shape that survives a 100 TB status log. Ordering key: latest
    * updateunixtime wins, ties broken by lexicographically-least status
    * (identical to the window's `updateunixtime DESC, status ASC`);
    * null timestamps rank LAST — `-null` is null and would sort first in
    * the min_by struct, letting a partial heartbeat beat every real one. */
  def latestStatus(statusRows: DataFrame): DataFrame = {
    val keys = Seq("jobid", "invocationid")
    val others = statusRows.columns.filterNot(keys.contains)
    statusRows
      .groupBy(keys.map(col): _*)
      .agg(min_by(
        struct(others.map(col): _*),
        struct(coalesce(col("updateunixtime") * -1, lit(Long.MaxValue))
          .as("__neg_ts"),
          col("status"))).as("__r"))
      .select(keys.map(col) ++ others.map(c => col(s"__r.$c")): _*)
  }

  /** Jobs whose every invocation reached a terminal state. */
  def completedJobs(statusRows: DataFrame,
      terminal: Set[String] = Set("COMPLETED", "FAILED")): DataFrame = {
    val latest = latestStatus(statusRows)
    latest.groupBy(col("jobid"))
      .agg(count(lit(1)).as("n_invocations"),
        sum(when(col("status").isin(terminal.toSeq: _*), 1)
          .otherwise(0)).as("n_terminal"))
      .where(col("n_invocations") === col("n_terminal"))
      .select(col("jobid"), col("n_invocations"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * (controller.js:430-501 reads these to admission-control the fleet). */
  def latestStatus(statusRows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("jobid"), col("invocationid"))
      .orderBy(col("updateunixtime").desc, col("status"))
    statusRows.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
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

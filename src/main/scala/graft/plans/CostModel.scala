package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-level cost-based join planning from REGISTERED statistics —
  * the engine's metastore-stats analog, wired into one real decision:
  * which side of a join (if any) to broadcast.
  *
  * Why not rely on Spark's own `autoBroadcastJoinThreshold`: that
  * heuristic keys on the relation's on-disk/estimated byte size, which at
  * lake scale is often unavailable (views over raw JSON/CSV, frames
  * behind a selective filter) or wrong by the columnar compression factor
  * in either direction. The classic first CBO decision — broadcast the
  * build side iff its ANALYZED cardinality fits the budget — needs real
  * row counts. [[analyze]] records them (plus per-key distinct counts via
  * HLL, the q224 seam: a downstream rule can combine both sides' NDVs
  * into a join-output estimate) into a parquet stats store, and
  * [[planJoin]] turns them into a `broadcast()` hint or leaves Catalyst
  * to sort-merge — behind one conf, [[BroadcastRowsKey]].
  *
  * This composes existing operators (hint + join) rather than a custom
  * Strategy: the hint IS Spark's supported channel for external cost
  * decisions, survives AQE re-planning, and keeps the whole plan inside
  * stock codegen paths.
  */
object CostModel {

  /** Max analyzed row count a join side may have and still be broadcast
    * by [[planJoin]]. Rows, not bytes: the caller knows its row width;
    * 100k dimension rows ≈ single-digit MB for typical dims. */
  val BroadcastRowsKey = "spark.graft.cbo.broadcastRowThreshold"
  val DefaultBroadcastRows = 100000L

  /** ANALYZE-TABLE analog: one stats row (row count + approx NDV per
    * requested key) persisted to `statsDir/name`. One aggregate pass,
    * map-side combined; HLL keeps the NDV pass scan-shaped at any scale. */
  def analyze(s: SparkSession, statsDir: String, name: String,
      df: DataFrame, keyCols: Seq[String]): Unit = {
    val aggs = count(lit(1)).as("rows") +:
      keyCols.map(k => approx_count_distinct(col(k)).as(s"ndv_$k"))
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("analyzed_name", lit(name))
      .coalesce(1).write.mode("overwrite").parquet(s"$statsDir/$name")
  }

  /** Analyzed row count for `name`, or None if never analyzed. */
  def rowsOf(s: SparkSession, statsDir: String, name: String): Option[Long] =
    if (!new java.io.File(s"$statsDir/$name/_SUCCESS").exists()) None
    else Some(s.read.parquet(s"$statsDir/$name")
      .select(col("rows")).head().getLong(0))

  /** Equi-join with the build strategy chosen from the stats store:
    * broadcast the smaller ANALYZED side iff its row count is under the
    * conf budget; otherwise hint nothing and let Catalyst sort-merge.
    * An unanalyzed side is never broadcast (unknown cardinality is the
    * dangerous case — a wrong broadcast OOMs every executor at once,
    * while a redundant shuffle merely costs time). */
  def planJoin(s: SparkSession, statsDir: String,
      left: DataFrame, leftName: String,
      right: DataFrame, rightName: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame = {
    val budget = s.conf.getOption(BroadcastRowsKey).map(_.toLong)
      .getOrElse(DefaultBroadcastRows)
    val lRows = rowsOf(s, statsDir, leftName)
    val rRows = rowsOf(s, statsDir, rightName)
    val broadcastRight = rRows.exists(r =>
      r <= budget && lRows.forall(r <= _))
    val broadcastLeft = !broadcastRight &&
      lRows.exists(l => l <= budget)
    if (broadcastRight) left.join(broadcast(right), keys, joinType)
    else if (broadcastLeft) broadcast(left).join(right, keys, joinType)
    else left.join(right, keys, joinType)
  }
}

package graft.registry

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable persistence for the metadata registries (queries, identities,
  * audit rows) as an append-only parquet mutation log.
  *
  * The reference's registries live in DynamoDB — point writes, last-writer
  * wins. The distributed-file equivalent of that contract is a log of
  * versioned mutations plus a deterministic replay, not an
  * overwrite-in-place table (overwrites of a live table are not atomic on
  * object stores; appends of new files are):
  *
  *  - every mutation batch appends parquet files carrying `__seq` (the
  *    writer's monotonically increasing version) and `__op`
  *    (upsert/delete);
  *  - `replay` reconstructs current state: the highest-`__seq` row per
  *    key wins (a `max_by` struct aggregate — partial aggregation, no
  *    window sort), then delete tombstones drop out;
  *  - `compact` rewrites the folded state as a new single-snapshot log
  *    (seq preserved), bounding replay cost — the log-structured-table
  *    pattern (Delta/Iceberg) reduced to what a metadata registry needs.
  *
  * Registry tables are small (thousands of rows); the log exists for
  * durability and atomicity, not scale — but the replay is a distributed
  * plan anyway, so nothing here breaks if a registry grows.
  */
object RegistryStore {

  val SeqCol = "__seq"
  val OpCol = "__op"

  /** Append one mutation batch at version `seq`. `delete = true` writes
    * tombstones (only the key columns need real values). */
  def append(rows: DataFrame, path: String, seq: Long,
      delete: Boolean = false): Unit =
    rows
      .withColumn(SeqCol, lit(seq))
      .withColumn(OpCol, lit(if (delete) "delete" else "upsert"))
      .write.mode(SaveMode.Append).parquet(path)

  /** Highest committed sequence in the log (-1 for an empty/missing log). */
  def latestSeq(spark: SparkSession, path: String): Long =
    if (!exists(spark, path)) -1L
    else spark.read.parquet(path).agg(max(col(SeqCol))).collect()(0)
      .getLong(0)

  /** Fold the log to current state: last writer per key wins, tombstones
    * drop. */
  def replay(spark: SparkSession, path: String,
      keyCols: Seq[String]): DataFrame = {
    val log = spark.read.parquet(path)
    val dataCols = log.columns.filterNot(c => c == SeqCol || c == OpCol)
    log
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct((dataCols.map(col) :+ col(OpCol)): _*),
        col(SeqCol)).as("__r"))
      .where(col(s"__r.$OpCol") =!= "delete")
      .select(dataCols.map(c => col(s"__r.$c")): _*)
  }

  /** Rewrite the folded state as a fresh one-snapshot log at `seq`,
    * replacing the old log directory. Keeps replay O(live rows).
    *
    * Stage-then-swap, never delete-then-rewrite: the snapshot is fully
    * written to a staging sibling BEFORE the live log is touched, so a
    * crash at any point leaves a complete copy of the state on disk
    * (either the old log, or the `.compacting` staging dir a recovery
    * pass can promote). The only non-atomic step is the final rename,
    * after the data is already durable twice. */
  def compact(spark: SparkSession, path: String,
      keyCols: Seq[String]): Unit = {
    val seq = latestSeq(spark, path)
    val staging = path + ".compacting"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    append(replay(spark, path, keyCols), staging, seq)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(staging),
      new org.apache.hadoop.fs.Path(path))
  }

  // Hadoop FS, not java.io — the log lives wherever the warehouse does
  // (S3/HDFS in production, local disk in tests).
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

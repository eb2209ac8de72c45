package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Depth-limited folder enumeration — the reference's S3 prefix walk
  * (reference sources/shared/commonsharedv3.js:654-724: BFS of common
  * prefixes to `S3EnumerationDepth` 0-9, producing the leaf-prefix partition
  * list the controller fans out over; guidance is 40-400 leaves for "optimal
  * parallelisation", Logverz-EngineStart.json).
  *
  * On Spark the same walk is a Hadoop FileSystem listing (works for s3a://,
  * hdfs://, file://). The leaf list feeds the readers as input paths — at
  * 100 TB this is what bounds the driver's listing fan-out (each leaf lists
  * in parallel on the executors via the file index) and what a user tunes
  * instead of the reference's depth knob.
  */
object FolderWalk {

  /** BFS to `depth`: returns leaf directory paths. depth=0 → the roots
    * themselves (multi-root `;`-separated inputs in the reference map to the
    * Seq here). Directories shallower than `depth` with no subdirectories
    * are leaves too (the reference keeps them — walkfolders pushes dirs
    * without common prefixes straight to the result). */
  def walk(spark: SparkSession, roots: Seq[String], depth: Int): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    var frontier = roots.map(r => new Path(r))
    val leaves = Seq.newBuilder[Path]
    var level = 0
    while (level < depth && frontier.nonEmpty) {
      val next = Seq.newBuilder[Path]
      frontier.foreach { p =>
        val fs = p.getFileSystem(conf)
        val subdirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        if (subdirs.isEmpty) leaves += p else next ++= subdirs
      }
      frontier = next.result()
      level += 1
    }
    (leaves.result() ++ frontier).map(_.toString).sorted
  }
}

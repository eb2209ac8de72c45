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

  /** Sibling prefixes list concurrently within a BFS level, like the
    * reference's bounded-parallel walk (controller.js:243-259) — against
    * object-store RTTs a serial driver loop makes the walk's wall clock
    * levels × |frontier| × RTT instead of levels × RTT. */
  private val MaxListThreads = 16

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
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(MaxListThreads, frontier.size)))
      // futures joined in frontier order → deterministic traversal
      val listed =
        try frontier.map { p =>
          pool.submit(new java.util.concurrent.Callable[(Path, Array[Path])] {
            def call(): (Path, Array[Path]) = {
              val fs = p.getFileSystem(conf) // Hadoop caches FS instances
              (p, fs.listStatus(p).filter(_.isDirectory).map(_.getPath))
            }
          })
        }.map(_.get())
        finally pool.shutdown()
      val next = Seq.newBuilder[Path]
      listed.foreach { case (p, subdirs) =>
        if (subdirs.isEmpty) leaves += p else next ++= subdirs
      }
      frontier = next.result()
      level += 1
    }
    (leaves.result() ++ frontier).map(_.toString).sorted
  }
}

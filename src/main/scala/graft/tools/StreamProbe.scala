package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming scale probe: runs streaming registry queries (q210, q201,
  * ...) with a [[StreamingQueryListener]] that records EVERY trigger's
  * wall time and input volume, then reports whether per-trigger cost is
  * flat in the trigger index. This is the cost contract the batch-scale
  * probes (ScaleUp/Probe) can't see: a streaming operator that re-reads
  * its accumulated state per trigger looks fine on the total and only
  * reveals its O(N²) lifetime cost in the trigger-by-trigger trend —
  * trigger N's wall must scale with BATCH N's size, not with N.
  *
  * The flatness signal is the ratio of the mean trigger wall in the last
  * third of triggers to the first third (ratio ≈ 1 → flat; each decade
  * of accumulated state should not tax later triggers). Input rows per
  * trigger are printed beside wall so planted-batch skew is visible.
  *
  * Usage: SPARK_GRAFT_ONLY=q210,q201 runMain graft.tools.StreamProbe <sfDir>
  */
object StreamProbe {

  final case class Trigger(query: String, batchId: Long, inputRows: Long,
      triggerMs: Long, addBatchMs: Long, breakdown: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q210,q201")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // tmpfs scratch for the same reason as Probe/Bench: measure the
    // engine, not the container disk
    val localDir = graft.Scratch.sparkLocalDir("graft_probe_local")
    val spark = SparkSession.builder()
      .appName("graft-streamprobe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // more micro-batches than the registry default so the per-trigger
    // trend has enough points (q210 honors this; others ignore it)
    sys.env.get("SPARK_GRAFT_STREAM_SPLITS")
      .foreach(n => spark.conf.set("spark.graft.stream.splits", n))
    val triggers =
      new java.util.concurrent.ConcurrentLinkedQueue[Trigger]()
    // one mutable label: queries run strictly sequentially below, so the
    // listener attributes each progress event to the query running NOW.
    // The label is CLEARED between queries (after each drain) and the
    // listener drops events while it is empty — a progress event the
    // async bus delivers after the drain is then dropped (a lost tail
    // point, benign for the trend) instead of silently attributed to
    // the NEXT query's trend.
    @volatile var current = ""
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val label = current
        if (label.isEmpty) return
        val p = e.progress
        // full per-trigger duration breakdown (round 9): the fixed-cost
        // hunt needs to see WHERE a trigger's wall goes — queryPlanning,
        // walCommit, commitOffsets, getBatch, addBatch — not just the
        // two headline numbers
        val all = {
          import scala.jdk.CollectionConverters._
          p.durationMs.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(",")
        }
        triggers.add(Trigger(label, p.batchId, p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.toLong)
            .getOrElse(-1L),
          Option(p.durationMs.get("addBatch")).map(_.toLong)
            .getOrElse(-1L), all))
        ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    try {
      val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.exists(n.startsWith) }
      selected.foreach { case (name, fn) =>
        current = name
        val t0 = System.nanoTime()
        val rows =
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            System.err.println(s"[streamprobe] $name failed: $e"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        // progress events are delivered on the listener bus; drain
        // before reading (bounded wait, probe-only)
        Thread.sleep(2000)
        val ts = {
          import scala.jdk.CollectionConverters._
          triggers.asScala.filter(_.query == name).toSeq.sortBy(_.batchId)
        }
        current = "" // drop (never misattribute) post-drain stragglers
        ts.foreach(t => println(
          f"TRIGGER $name batch=${t.batchId}%d rows=${t.inputRows}%d " +
          f"triggerMs=${t.triggerMs}%d addBatchMs=${t.addBatchMs}%d " +
          s"breakdown[${t.breakdown}]"))
        // zero-row triggers are AvailableNow bookkeeping (no-data final
        // batches); exclude them from the trend
        val work = ts.filter(t => t.inputRows > 0 && t.triggerMs >= 0)
        if (work.size >= 3) {
          val third = math.max(1, work.size / 3)
          val head = work.take(third).map(_.triggerMs.toDouble)
          val tail = work.takeRight(third).map(_.triggerMs.toDouble)
          val ratio = (tail.sum / tail.size) / math.max(1.0,
            head.sum / head.size)
          println(f"STREAMPROBE $name triggers=${work.size}%d " +
            f"totalSec=$sec%.1f rows=$rows%d " +
            f"firstThirdMeanMs=${head.sum / head.size}%.0f " +
            f"lastThirdMeanMs=${tail.sum / tail.size}%.0f " +
            f"lateOverEarly=$ratio%.2f")
        } else {
          println(f"STREAMPROBE $name triggers=${work.size}%d " +
            f"totalSec=$sec%.1f rows=$rows%d (too few triggers for trend)")
        }
      }
    } finally spark.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}

/** Await a bounded stream, swallowing ONLY the planned fault-injection
  * stop: a [[StreamingQueryException]] whose cause chain carries the
  * sentinel message thrown by a `failAfter` batch. Any other failure —
  * a real write error in a batch BEFORE the planned death, a checkpoint
  * fault — stays loud: a fault-injected run must never misattribute a
  * genuine bug to the injection (found in review: the previous blanket
  * `catch StreamingQueryException if failAfter.nonEmpty` did exactly
  * that).
  */
/** Dedicated type for the injected fault: matching on the CLASS in the
  * cause chain (not a message substring) means a genuine error whose
  * message happens to embed the sentinel text is never swallowed, and a
  * Spark-version change that rewrites exception messages can't let an
  * injected stop escape.
  */
final class PlannedStopException
  extends RuntimeException(PlannedStop.Sentinel)

object PlannedStop {
  val Sentinel = "planned mid-run stop"

  def fail(): Nothing = throw new PlannedStopException

  /** Walk the FULL cause chain (cycle-guarded by identity, not a fixed
    * depth cap — a deeper foreachBatch nesting in a future Spark must
    * still find the injected stop).
    */
  private def isPlanned(t: Throwable): Boolean = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    Iterator.iterate(t)(_.getCause)
      .takeWhile(c => c != null && seen.add(c))
      .exists(_.isInstanceOf[PlannedStopException])
  }

  /** `planned` = the caller injected a fault this run (failAfter set). */
  def await(q: StreamingQuery, planned: Boolean): Unit =
    try q.awaitTermination()
    catch {
      case e: StreamingQueryException if planned && isPlanned(e) => ()
    }
}

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
object PlannedStop {
  val Sentinel = "planned mid-run stop"

  private def isPlanned(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(c => Option(c.getMessage).exists(_.contains(Sentinel)))

  /** `planned` = the caller injected a fault this run (failAfter set). */
  def await(q: StreamingQuery, planned: Boolean): Unit =
    try q.awaitTermination()
    catch {
      case e: StreamingQueryException if planned && isPlanned(e) => ()
    }
}

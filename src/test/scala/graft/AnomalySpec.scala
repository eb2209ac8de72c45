package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Anomaly-detection family (q269 EWMA spikes, q270 median/MAD outliers,
  * q271 CUSUM changepoint): every engine result is re-derived by an
  * independent driver-side recomputation over the same dense census, and
  * the planted signals (mid-series error spike, final-third click level
  * shift) must be detected at every SF. */
class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def sf = TestSession.sfDir

  /** Dense per-type hourly counts recomputed independently (driver-side,
    * bounded by |types| x |hours|). */
  private lazy val census: Map[String, Array[Long]] = {
    val rows = Tables.events(spark, sf)
      .select(
        (unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("h"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val h0 = rows.map(_._1).min
    val span = (rows.map(_._1).max - h0).toInt
    rows.map(_._2).distinct.sorted.map { t =>
      val ns = Array.fill(span + 1)(0L)
      rows.foreach { case (h, ty) =>
        if (ty == t) ns((h - h0).toInt) += 1
      }
      t -> ns
    }.toMap
  }

  /** q269/q270's planted variant: mid-series error hour at 8n+40. */
  private lazy val spiked: Map[String, Array[Long]] =
    census.map { case (t, ns) =>
      val c = ns.clone()
      if (t == "error") {
        val m = (c.length - 1) / 2
        c(m) = 8 * c(m) + 40
      }
      t -> c
    }

  // ---- q269 EWMA --------------------------------------------------------

  private def ewmaRef(ns: Array[Long]): (Long, Long, Long) = {
    var ew = -1L; var an = 0L; var mx = 0L
    ns.foreach { n =>
      if (ew >= 0 && 1000 * n > 2 * ew && n >= 3) {
        an += 1
        mx = math.max(mx, (1000000 * n) / math.max(ew, 1))
      }
      ew = if (ew < 0) 1000 * n else (7 * ew + 1000 * n) / 8
    }
    (an, mx, ew)
  }

  test("q269 matches an independent EWMA fold exactly, per type") {
    val got = SparkEntry.queries("q269_ewma_anomaly")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == spiked.keySet)
    spiked.foreach { case (t, ns) =>
      val (an, mx, ew) = ewmaRef(ns)
      assert(got(t) == ((ns.length.toLong, an, mx, ew)),
        s"$t: engine ${got(t)} vs reference ($an, $mx, $ew)")
    }
  }

  test("q269 detects the planted mid-series error spike") {
    val err = spiked("error")
    val mid = (err.length - 1) / 2
    assert(err(mid) >= 40, "plant must be in the recomputed census too")
    val row = SparkEntry.queries("q269_ewma_anomaly")(spark, sf)
      .where(col("event_type") === "error").collect()(0)
    assert(row.getLong(2) >= 1, "planted spike not flagged")
    // the spike is >= 8x (+40) its EWMA baseline: excess >= 8000 permille
    assert(row.getLong(3) >= 8000,
      s"planted excess ${row.getLong(3)} below the 8x floor")
  }

  // ---- q270 median/MAD --------------------------------------------------

  private def lowerMedian(xs: Array[Long]): Long =
    xs.sorted.apply((xs.length + 1) / 2 - 1)

  test("q270 matches an independent median/MAD recomputation, per type") {
    val got = SparkEntry.queries("q270_mad_outliers")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    spiked.foreach { case (t, ns) =>
      val med = lowerMedian(ns)
      val devs = ns.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      val nOut = devs.count(_ > 3 * mad).toLong
      assert(got(t) == ((ns.length.toLong, med, mad, nOut, devs.max)),
        s"$t: engine ${got(t)} vs reference " +
          s"(${ns.length}, $med, $mad, $nOut, ${devs.max})")
    }
    // the planted error spike is a guaranteed outlier: +40 over an
    // hourly median, against a MAD of the same order as the median
    assert(got("error")._5 >= 37, "planted deviation missing")
    assert(got("error")._4 >= 1, "planted outlier not flagged")
  }

  // ---- q274 seasonal profile --------------------------------------------

  test("q274 absorbs periodic load into the hour-of-day baseline") {
    // independent recompute: spiked census + periodic error plant at
    // hod 7, then per-(type, hod) lower-median/MAD over that cell only
    val planted: Map[String, Array[Long]] = spiked.map { case (t, ns) =>
      t -> ns.zipWithIndex.map { case (v, i) =>
        if (t == "error" && i % 24 == 7) v + 20 else v
      }
    }
    val got = SparkEntry.queries("q274_seasonal_outliers")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    planted.foreach { case (t, ns) =>
      (0 until 24).foreach { hod =>
        val cell = ns.indices.filter(_ % 24 == hod).map(ns).toArray
        val med = lowerMedian(cell)
        val devs = cell.map(v => math.abs(v - med))
        val mad = lowerMedian(devs)
        val nOut = devs.count(_ > 3 * mad).toLong
        assert(got((t, hod.toLong)) ==
          ((cell.length.toLong, med, mad, nOut)),
          s"($t, $hod): engine ${got((t, hod.toLong))} vs " +
            s"(${cell.length}, $med, $mad, $nOut)")
      }
    }
    // the periodic +20 lives ONLY in its own cell's baseline: hod 7's
    // median carries it, every other error cell stays at noise level
    val erMeds = (0 until 24)
      .map(h => h -> got(("error", h.toLong))._2).toMap
    assert(erMeds(7) >= 20, s"seasonal cell median ${erMeds(7)} low")
    erMeds.filter(_._1 != 7).values.foreach(m =>
      assert(m < 20, s"periodic load leaked into a foreign cell: $m"))
    // and the APERIODIC q269-plant spike still trips its own cell
    val spikeHod = ((census("error").length - 1) / 2) % 24
    assert(got(("error", spikeHod.toLong))._4 >= 1,
      "aperiodic spike not flagged by its seasonal cell")
  }

  // ---- q271 CUSUM -------------------------------------------------------

  /** Reference CUSUM over the q271-planted series: returns
    * (total, cpIndex, maxAbsS, dir) and asserts the S_H = 0 identity. */
  private def cusumRef(ns: Array[Long]): (Long, Long, Long, Long) = {
    val h = ns.length.toLong
    val t2 = ns.sum
    var s = 0L; var bs = -1L; var bi = 0L; var dr = 0L
    ns.zipWithIndex.foreach { case (v, i) =>
      s = s + h * v - t2
      if (math.abs(s) > bs) {
        bs = math.abs(s); bi = i.toLong; dr = java.lang.Long.signum(s)
      }
    }
    assert(s == 0L, "CUSUM telescoping identity violated")
    (t2, bi, bs, dr)
  }

  private lazy val shifted: Map[String, Array[Long]] =
    census.map { case (t, ns) =>
      val span = ns.length - 1
      val c = ns.clone()
      if (t == "click") {
        val shift = ns.sum / (span + 1) + 5
        c.indices.foreach { i =>
          if (3L * i >= 2L * span) c(i) += shift
        }
      }
      t -> c
    }

  test("q271 matches an independent CUSUM recomputation, per type") {
    val got = SparkEntry.queries("q271_cusum_changepoint")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    shifted.foreach { case (t, ns) =>
      val (t2, bi, bs, dr) = cusumRef(ns)
      assert(got(t) == ((ns.length.toLong, t2, bi, bs, dr)),
        s"$t: engine ${got(t)} vs reference " +
          s"(${ns.length}, $t2, $bi, $bs, $dr)")
    }
  }

  test("q273 streaming EWMA equals batch q269 row-for-row") {
    // the twins share the fold verbatim; this gates the part that can
    // drift — the per-trigger census accumulation under replay/merge
    val batch = SparkEntry.queries("q269_ewma_anomaly")(spark, sf)
      .collect().map(_.toSeq).toSet
    val streamed = SparkEntry.queries("q273_stream_ewma")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"streaming census diverged:\n$streamed\nvs\n$batch")
  }

  test("q271 locates the planted click level shift") {
    val rows = SparkEntry.queries("q271_cusum_changepoint")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    val span = census("click").length - 1
    val plantAt = (2 * span + 2) / 3 // first shifted index
    val (cp, maxS, dir) = rows("click")
    // the trough of S sits just before the upward shift begins
    assert(math.abs(cp - (plantAt - 1)) <= span / 10,
      s"changepoint $cp far from planted boundary ${plantAt - 1}")
    assert(dir == -1L, s"upward shift must leave a negative trough, got $dir")
    // the planted shift dominates every unplanted type's noise extremum
    rows.foreach { case (t, (_, s, _)) =>
      if (t != "click") assert(maxS > 3 * s,
        s"planted |S| $maxS does not dominate $t's noise $s")
    }
  }

  // ---- q287 token bucket -------------------------------------------------

  test("q287 matches an independent token-bucket replay per stream") {
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val streams = ev.groupBy(e => (e._1, e._2))
    def replay(ts: Seq[Long]): Long = {
      var tok = 2000L; var dropped = 0L; var lt = ts.head
      ts.tail.foreach { t =>
        val refill = math.min(3000L, tok + (t - lt) * 1000L / 115200000000L)
        if (refill >= 1000L) tok = refill - 1000L
        else { tok = refill; dropped += 1 }
        lt = t
      }
      dropped
    }
    val want = streams.toSeq.map { case ((_, ty), es) =>
      val ts = es.sortBy(e => (e._3, e._4)).map(_._3).toSeq
      (ty, ts.size.toLong, replay(ts))
    }.groupBy(_._1).map { case (ty, xs) =>
      val ne = xs.map(_._2).sum; val nd = xs.map(_._3).sum
      ty -> ((xs.size.toLong, ne, nd, 1000 * nd / ne))
    }
    val got = SparkEntry.queries("q287_rate_limit_audit")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    // the audit must be non-trivial in both directions: some traffic
    // drops, most traffic passes
    val totDropped = want.values.map(_._3).sum
    val totEvents = want.values.map(_._2).sum
    assert(totDropped > 0, "no stream ever exceeded the bucket")
    assert(totDropped * 2 < totEvents, "bucket dropped most traffic")
  }
}

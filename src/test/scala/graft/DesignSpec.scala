package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical-design family (q294 Poisson bootstrap, q295 DP release,
  * q296 systematic PPS sample, q297 Neyman allocation, q298 Z-order
  * audit, q299 ANF sketch): every engine result is re-derived by an
  * independent driver-side recomputation — the md5-hex CDF cutoffs are
  * REBUILT here from their defining rationals (alternating e^{-1}
  * series, dyadic geometric masses), not read from the production
  * constants — plus the families' structural guarantees (quota sums,
  * sample-point totals, DP contribution bounding, sketch monotonicity).
  */
class DesignSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def sf = TestSession.sfDir

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hex15(v: BigInt): String = {
    val s = v.toString(16)
    ("0" * (15 - s.length)) + s
  }

  private val Scale = BigInt(16).pow(15)

  // ---- q294 Poisson bootstrap ---------------------------------------------

  /** Poisson(1) cutoffs rebuilt from scratch: e^{-1} as the exact
    * alternating series Σ (−1)^j/j! over a 59! common denominator,
    * cumulative P(K ≤ k) = e^{-1}·Σ_{i≤k} 1/i!. */
  private lazy val poissonCuts: Seq[BigInt] = {
    val f59 = (1 to 59).map(BigInt(_)).product
    var c = f59
    var eInvNum = BigInt(0)
    for (j <- 0 to 59) {
      eInvNum += (if (j % 2 == 0) c else -c)
      c /= (j + 1)
    }
    (0 to 5).map { k =>
      val fk = (1 to k).map(BigInt(_)).product.max(1)
      val cumNum = (0 to k).map(i =>
        fk / (1 to i).map(BigInt(_)).product.max(1)).sum
      eInvNum * cumNum * Scale / (f59 * fk)
    }
  }

  private def poissonDraw(key: String): Int = {
    val u = BigInt(md5hex(key).take(15), 16)
    poissonCuts.indexWhere(u < _) match {
      case -1 => 6
      case k  => k
    }
  }

  test("q294 matches an exact Poisson-bootstrap recomputation and the " +
      "CI brackets the point estimate") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val n = ds.length.toLong
      val mean = 1000L * ds.map(_._3).sum / n
      val reps = (0 until 32).flatMap { r =>
        val (sw, sk) = ds.foldLeft((0L, 0L)) { case ((w, k0), (id, _, x)) =>
          val k = poissonDraw(s"$id:$r")
          (w + k * x, k0 + k)
        }
        if (sk > 0) Some(1000L * sw / sk) else None
      }.sorted
      src -> (n, mean, reps.length.toLong,
        reps(math.min(1, reps.length - 1)),
        reps(math.max(reps.length - 2, 0)))
    }
    val got = SparkEntry.queries("q294_poisson_bootstrap")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got === want)
    got.foreach { case (src, (_, mean, nReps, lo, hi)) =>
      assert(nReps === 32L, s"$src dropped replicates")
      assert(lo <= mean && mean <= hi,
        s"$src CI [$lo,$hi] misses point $mean")
    }
  }

  test("q300 streaming bootstrap equals the batch run row-for-row") {
    // additive (source, r, sw, sk) partials must merge arrival-order-
    // independently into exactly q294's result
    val a = SparkEntry.queries("q294_poisson_bootstrap")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q300_stream_bootstrap")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(b === a)
  }

  // ---- q295 DP release ----------------------------------------------------

  /** Truncated-geometric cutoffs rebuilt from the dyadic masses
    * 2^(20−|k|) / (3·2^20 − 2). */
  private lazy val geomCuts: Seq[(Int, BigInt, BigInt)] = {
    val total = (BigInt(3) << 20) - 2
    var cum = BigInt(0)
    (-20 to 20).map { k =>
      val lo = cum * Scale / total
      cum += BigInt(1) << (20 - k.abs)
      val hi = if (k == 20) Scale else cum * Scale / total
      (k, lo, hi)
    }
  }

  test("q295 matches an exact truncated-geometric recomputation and " +
      "bounds each user's contribution to one cell") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val modal = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.groupBy(_._2).map { case (t, ts) => (t, ts.length) }
        .toSeq.sortBy { case (t, c) => (-c, t) }.head._1
    }
    val counts = modal.values.groupBy(identity)
      .map { case (t, ts) => t -> ts.size.toLong }
    val want = counts.toSeq.map { case (t, n) =>
      val u = BigInt(md5hex(s"dp|$t").take(15), 16)
      val k = geomCuts.find { case (_, lo, hi) => u >= lo && u < hi }.get._1
      (t, n, k.toLong, math.max(n + k, 0L))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q295_dp_release")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    // contribution bounding: the released histogram counts each user once
    assert(got.map(_._2).sum === modal.size.toLong)
  }

  // ---- q296 systematic PPS ------------------------------------------------

  test("q296 matches an exact systematic-PPS recomputation and places " +
      "exactly k = 50 sample points") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy { case (id, _, _) => (md5hex(s"pps|$id"), id) }
    val w = docs.map(_._3).sum
    def f(x: BigInt): Long = ((100 * x + w) / (2 * w)).toLong
    var cum = BigInt(0)
    val want = docs.flatMap { case (id, src, wt) =>
      val lo = cum; cum += wt
      val mult = f(cum) - f(lo)
      if (mult >= 1) Some((id, src, wt, mult)) else None
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q296_pps_sample")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    assert(got.map(_._4).sum === 50L,
      "systematic PPS must place exactly k points")
  }

  // ---- q297 Neyman allocation ---------------------------------------------

  private def isqrt(v: BigInt): BigInt = {
    if (v <= 0) return BigInt(0)
    var g = BigInt(math.sqrt(v.toDouble).toLong).max(1)
    var prev = BigInt(-1)
    while (g != prev) { prev = g; g = (g + v / g) / 2 }
    while (g * g > v) g -= 1
    while ((g + 1) * (g + 1) <= v) g += 1
    g
  }

  test("q297 matches an exact Neyman+Hamilton recomputation, sums to B, " +
      "and shifts budget toward high-variance strata vs proportional") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val b = 200
    val cen = docs.groupBy(_._1).map { case (src, ds) =>
      val n = BigInt(ds.length)
      val sx = ds.map(x => BigInt(x._2)).sum
      val sxx = ds.map(x => BigInt(x._2) * x._2).sum
      src -> (ds.length.toLong, isqrt(n * sxx - sx * sx))
    }
    val wsum = cen.values.map(_._2).sum
    val base = cen.map { case (src, (n, ns)) =>
      (src, n, ns, (b * ns / wsum).toLong, b * ns % wsum)
    }.toSeq
    val left = b - base.map(_._4).sum
    val bonus = base.sortBy { case (src, _, _, _, rem) => (-rem, src) }
      .take(left.toInt).map(_._1).toSet
    val want = base.map { case (src, n, ns, q0, _) =>
      (src, n, ns.toLong, q0 + (if (bonus(src)) 1L else 0L))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q297_neyman_allocation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    assert(got.map(_._4).sum === b.toLong)
    // Neyman's point: relative to proportional allocation, the highest
    // nsigma/n stratum never LOSES budget share
    val byVarRatio = got.sortBy { case (_, n, ns, _) => -ns.toDouble / n }
    val (_, nTop, _, qTop) = byVarRatio.head
    val nTot = got.map(_._2).sum
    assert(qTop * nTot >= nTop * b,
      "highest-dispersion stratum fell below its proportional share")
  }

  // ---- q298 Z-order audit -------------------------------------------------

  test("q298 matches an exact zone-map recomputation and the z layout " +
      "prunes the 2-D box strictly better") {
    val coded = Tables.orders(spark, sf)
      .select(col("o_custkey").as("ck"),
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01')")
          .as("dy"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val (ck0, ck1) = (coded.map(_._1).min, coded.map(_._1).max)
    val (dy0, dy1) = (coded.map(_._2).min, coded.map(_._2).max)
    val cells = coded.map { case (ck, dy) =>
      val cx = (ck - ck0) * 256 / (ck1 - ck0 + 1)
      val cy = (dy - dy0).toLong * 256 / (dy1 - dy0 + 1)
      val z = (0 until 8).map(i =>
        ((cx >> i) & 1) << (2 * i) | ((cy >> i) & 1) << (2 * i + 1)).sum
      (cx, cy, z)
    }
    def audit(name: String, file: ((Long, Long, Long)) => Long) = {
      val files = cells.groupBy(file).values.toSeq
      val scanned = files.filter(f => f.map(_._1).max >= 64 &&
        f.map(_._1).min <= 159 && f.map(_._2).max >= 32 &&
        f.map(_._2).min <= 127)
      (name, files.size.toLong, scanned.size.toLong,
        scanned.map(_.size.toLong).sum,
        cells.count(c => c._1 >= 64 && c._1 <= 159 &&
          c._2 >= 32 && c._2 <= 127).toLong)
    }
    val want = Seq(audit("linear", _._1 / 4), audit("zorder", _._3 / 1024))
    val got = SparkEntry.queries("q298_zorder_layout")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    val byName = got.map(g => g._1 -> g).toMap
    assert(byName("zorder")._4 < byName("linear")._4,
      "z layout should scan strictly fewer rows for the 2-D box")
    info(s"rows scanned for the box: linear=${byName("linear")._4} " +
      s"zorder=${byName("zorder")._4} matching=${byName("zorder")._5}")
  }

  // ---- q299 ANF sketch ----------------------------------------------------

  test("q299 matches an exact FM-propagation recomputation and is " +
      "monotone in the radius") {
    val edges = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").as("src"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        col("o_custkey")), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"),
        col("l_suppkey")), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, sf).select(col("s_suppkey"),
        col("s_nationkey").as("dst")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("src"), col("dst")).distinct()
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val out = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    // initial masks: geometric bit position from dyadic cutoffs
    def pos(key: String): Int = {
      val u = BigInt(md5hex(key).take(15), 16)
      (0 until 20).find(k =>
        u < (BigInt(1) << 60) - (BigInt(1) << (59 - k))).getOrElse(20)
    }
    var sk: Map[(Long, Int), Long] = (for {
      v <- nodes.toSeq; t <- 0 until 16
    } yield (v, t) -> (1L << pos(s"anf|$t|$v"))).toMap
    var reach: Map[Long, Set[Long]] = nodes.map(v => v -> Set(v)).toMap
    def lowZero(m: Long): Long = {
      val y = (m + 1) & -(m + 1)
      (0 to 21).find(i => y == (1L << i)).get.toLong
    }
    val want = (0 to 3).map { h =>
      if (h > 0) {
        sk = sk.map { case ((v, t), m) =>
          (v, t) -> out.getOrElse(v, Set.empty[Long])
            .foldLeft(m)((acc, u) => acc | sk((u, t)))
        }
        reach = reach.map { case (v, rs) =>
          v -> (rs ++ rs.flatMap(u => out.getOrElse(u, Set.empty[Long])))
        }
        // NB: the per-round map above must read the PREVIOUS round's
        // sketches; Scala's strict Map.map builds the new map from the
        // old values, so this is correct (no in-place mutation).
        ()
      }
      (h.toLong, sk.values.map(lowZero).sum, reach.values.map(_.size).sum
        .toLong)
    }
    val got = SparkEntry.queries("q299_anf_sketch")(spark, sf)
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue))
      .toSeq.sortBy(_._1)
    assert(got === want)
    assert(got.map(_._2) === got.map(_._2).sorted,
      "sketch readout must be monotone in radius")
    assert(got.map(_._3) === got.map(_._3).sorted)
  }

  // ---- q301/q302/q303 distributional audits --------------------------------

  test("q301 matches an exact BigInt chi-square recomputation with the " +
      "per-cell milli-floor definition") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val mx = docs.map(_._2).max
    val cells = docs.map { case (s0, x) => (s0, x * 8 / (mx + 1)) }
    val o = cells.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val srcs = cells.map(_._1).distinct.sorted
    val bins = cells.map(_._2).distinct.sorted
    val r = srcs.map(s0 => s0 -> o.collect {
      case ((`s0`, _), c) => c }.sum).toMap
    val c = bins.map(b => b -> o.collect {
      case ((_, `b`), cc) => cc }.sum).toMap
    val n = BigInt(cells.length)
    val chi2 = (for (s0 <- srcs; b <- bins) yield {
      val oo = BigInt(o.getOrElse((s0, b), 0L))
      val diff = oo * n - BigInt(r(s0)) * c(b)
      (1000 * diff * diff) / (n * r(s0) * c(b))
    }).sum
    val m = BigInt(math.min(srcs.length - 1, bins.length - 1))
    val v = isqrt(1000 * chi2 / (n * m))
    val row = SparkEntry.queries("q301_chisq_homogeneity")(spark, sf)
      .collect().head
    assert(row.getLong(row.fieldIndex("chi2_milli")) === chi2.toLong)
    assert(row.getLong(row.fieldIndex("dof")) ===
      (srcs.length - 1).toLong * (bins.length - 1))
    assert(row.getLong(row.fieldIndex("cramers_v_permille")) === v.toLong)
    assert(v >= 0 && v <= 1000)
  }

  test("q302 matches an exact first-digit recomputation and accounts " +
      "every order") {
    val vs = Tables.orders(spark, sf)
      .select(expr("CAST(FLOOR(o_totalprice) AS BIGINT)").as("v"))
      .collect().map(_.getLong(0)).filter(_ >= 1)
    val census = vs.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val n = vs.length.toLong
    val benford = Map(1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L,
      5 -> 79L, 6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)
    val want = (1 to 9).map { d =>
      val nObs = census.getOrElse(d.toLong, 0L)
      val obsP = 1000L * nObs / n
      (d.toLong, nObs, obsP, benford(d), math.abs(obsP - benford(d)))
    }
    val got = SparkEntry.queries("q302_benford_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.map(_._2).sum === n, "digit census must cover every order")
  }

  test("q303 matches an exact Gini recomputation and a constant-length " +
      "stratum reads zero") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val xs = ds.sortBy(d => (d._3, d._2)).map(_._3)
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val six = xs.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * x }.sum
      src -> (xs.length.toLong, xs.sum,
        (1000 * (2 * six - (n + 1) * sx) / (n * sx)).toLong)
    }
    val got = SparkEntry.queries("q303_gini_concentration")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    got.values.foreach { case (_, _, g) => assert(g >= 0 && g < 1000) }
    // the Gini of a constant vector is 0 — sanity of the formula
    val const = Seq.fill(7)(42L)
    val sixC = const.zipWithIndex.map { case (x, i) =>
      BigInt(i + 1) * x }.sum
    assert(1000 * (2 * sixC - BigInt(8) * const.sum) /
      (BigInt(7) * const.sum) === BigInt(0))
  }
}

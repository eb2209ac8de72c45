package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-source comparison family (q276 TV distance, q277 sorted-
  * neighborhood curve, q278 JL projection, q279 KS test): every engine
  * result is re-derived by an independent driver-side recomputation
  * (exact integer/BigInt arithmetic over the same definitions), plus a
  * planted-divergence assertion for q276. */
class CompareSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private def sf = TestSession.sfDir

  // ---- q276 TV distance --------------------------------------------------

  /** (source → token counts, source → total) recomputed driver-side with
    * the exact q136/q64 tokenization (split keeps empty trailing fields,
    * like Spark's regex split with limit -1). */
  private lazy val tokCensus: Map[String, Map[String, Long]] = {
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.groupBy(_._1).map { case (src, docs) =>
      src -> docs.flatMap(_._2.trim.toLowerCase.split(" ", -1))
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    }
  }

  private def tvRef(a: Map[String, Long], b: Map[String, Long]): Long = {
    val na = BigInt(a.values.sum); val nb = BigInt(b.values.sum)
    val num = (a.keySet ++ b.keySet).iterator.map { w =>
      (BigInt(a.getOrElse(w, 0L)) * nb - BigInt(b.getOrElse(w, 0L)) * na).abs
    }.sum
    ((1000 * num) / (2 * na * nb)).toLong
  }

  test("q276 matches an exact BigInt TV recomputation on every pair") {
    val got = SparkEntry.queries("q276_source_divergence")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val srcs = tokCensus.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
    } yield ((srcs(i), srcs(j)), tvRef(tokCensus(srcs(i)), tokCensus(srcs(j)))))
      .toMap
    assert(got === want)
    assert(got.size === srcs.size * (srcs.size - 1) / 2)
  }

  test("q276 planted vocabulary-shifted source out-distances every " +
      "natural pair") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"))
    val planted = docs.where(col("source") === "src0")
      .select(lit("zz_planted").as("source"),
        expr("replace(text, 'e', '3')").as("text"))
    val tv = operators.CompareQueries.tvDistance(docs.unionByName(planted))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val (nat, withPlant) = tv.partition(p => p._1._2 != "zz_planted")
    assert(withPlant.nonEmpty)
    val plantedMin = withPlant.map(_._2).min
    val naturalMax = nat.map(_._2).max
    assert(plantedMin > naturalMax,
      s"planted min $plantedMin must exceed natural max $naturalMax")
  }

  // ---- q277/q283 sorted neighborhood ----------------------------------------

  private case class Rec(k: Long, nm: String, blk: String, side: Int)

  /** The q277/q283 linkage files re-derived independently: A = customer
    * verbatim, B with 1/3 absent, 1/11 suffix typo, 1/7 trailing-digit
    * transposition — ONE recompute shared by both tests. */
  private lazy val linkageAB: (Array[Rec], Array[Rec]) = {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val a = cust.map { case (k, nm) => Rec(k, nm, nm.substring(9, 16), 0) }
    val b = cust.filter(_._1 % 3 != 0).map { case (k, nm0) =>
      val nm =
        if (k % 11 == 0) nm0 + "X"
        else if (k % 7 == 0)
          nm0.substring(0, 16) + nm0.charAt(17) + nm0.charAt(16)
        else nm0
      Rec(k, nm, nm0.substring(9, 16), 1)
    }
    (a, b)
  }

  test("q277 matches an independent SNM recomputation, all five windows") {
    val (a, b) = linkageAB
    val ranked = (a ++ b).groupBy(_.blk).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (r.nm, r.side, r.k)).zipWithIndex
        .map { case (r, i) => (r, i + 1) }
    }
    val cand = for {
      (x, rx) <- ranked if x.side == 0
      (y, ry) <- ranked
      if y.side == 1 && y.blk == x.blk && math.abs(rx - ry) <= 16
    } yield (x.k, y.k, math.abs(rx - ry))
    val nTruth = b.length.toLong
    val want = Seq(1, 2, 4, 8, 16).map { w =>
      val in = cand.filter(_._3 <= w)
      val nTrue = in.count(c => c._1 == c._2).toLong
      (w.toLong, in.size.toLong, nTrue, nTruth - nTrue)
    }
    val got = SparkEntry.queries("q277_sorted_neighborhood")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    // the curve must be a real tradeoff: recall strictly improves from
    // w=1 to w=16 (transpositions recovered), candidates grow
    assert(want.head._3 < want.last._3)
    assert(want.head._2 < want.last._2)
  }

  // ---- q283 multi-pass SNM --------------------------------------------------

  test("q283 matches an independent multi-pass recomputation and the " +
      "union recovers every planted pair") {
    val (a, b) = linkageAB
    val u = a ++ b
    def canon(nm: String): String = {
      val c17 = nm.substring(16, 17); val c18 = nm.substring(17, 18)
      nm.substring(0, 16) +
        (if (c17 <= c18) c17 + c18 else c18 + c17)
    }
    def pass(key: Rec => String): Set[(Long, Long)] =
      u.groupBy(_.blk).values.flatMap { rs =>
        val ranked =
          rs.sortBy(r => (key(r), r.side, r.k)).zipWithIndex.toSeq
        for {
          (x, rx) <- ranked if x.side == 0
          (y, ry) <- ranked
          if y.side == 1 && math.abs(rx - ry) <= 2
        } yield (x.k, y.k)
      }.toSet
    val c1 = pass(_.nm)
    val c2 = pass(r => canon(r.nm))
    val cu = c1 ++ c2
    val nTruth = b.length.toLong
    def st(c: Set[(Long, Long)]) =
      (c.size.toLong, c.count(p => p._1 == p._2).toLong)
    val want = Seq(
      ("pass1_name", st(c1)), ("pass2_canon", st(c2)),
      ("union_multipass", st(cu))).map { case (n, (nc, nt)) =>
      (n, nc, nt, nTruth - nt)
    }
    val got = SparkEntry.queries("q283_multipass_linkage")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // the canonical second key recovers everything the name pass missed
    assert(want.last._4 === 0L, "union must recover all planted pairs")
    assert(want.head._4 > 0L, "pass 1 alone must miss transpositions")
  }

  // ---- q284 shard rebalance ---------------------------------------------------

  test("q284 matches an exact ring recomputation; ring moves ~1/17 " +
      "where mod moves ~16/17") {
    val ks = Tables.customer(spark, sf).select(col("c_custkey")).collect()
      .map(_.getLong(0))
    def keyH(k: Long): Long = ((k % 2147483647L) * 48271L) % 2147483647L
    def vnPos(s: Long, v: Long): Long = {
      val x = (s * 64 + v) * 8191 + 12345
      ((x * x) % 1000003L) * 48271L % 2147483647L
    }
    // interval semantics — key lands on the vnode whose interval
    // [pos, next) contains h, i.e. the greatest pos <= h; the wrap
    // region below every pos belongs to the HIGHEST-position vnode
    // (its interval wraps through zero)
    def assignIv(nShards: Int, h: Long): Long = {
      val ring = (for {
        s <- 0L until nShards.toLong; v <- 0L until 64L
      } yield (vnPos(s, v), s)).sorted
      ring.reverse.find(_._1 <= h).getOrElse(ring.last)._2
    }
    val n = ks.length.toLong
    val movedMod = ks.count(k => keyH(k) % 16 != keyH(k) % 17).toLong
    val movedRing =
      ks.count(k => assignIv(16, keyH(k)) != assignIv(17, keyH(k))).toLong
    val want = Seq(
      ("mod", n, movedMod, 1000 * movedMod / n),
      ("ring", n, movedRing, 1000 * movedRing / n))
    val got = SparkEntry.queries("q284_shard_rebalance")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    val modPm = want.head._4; val ringPm = want.last._4
    assert(ringPm < 150, s"ring moved $ringPm permille — not incremental")
    assert(modPm > 800, s"mod moved only $modPm permille — not a reshuffle")
  }

  // ---- q278 JL projection --------------------------------------------------

  private def lehmerSignPositive(r: Long, j: Long): Boolean = {
    val h = r * 8191 + j
    ((h * h) % 1000003) * 48271 % 2147483647 % 2 == 0
  }

  test("q278 matches an exact integer recomputation of the histogram") {
    val emb = Tables.embeddings(spark, sf).where(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def quant(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val qv = emb.map { case (id, v) => (id, v.map(quant)) }
    val proj = qv.map { case (id, q) =>
      (id, (1 to 16).map { r =>
        (1 to 64).map { j =>
          if (lehmerSignPositive(r.toLong, j.toLong)) q(j - 1)
          else -q(j - 1)
        }.sum
      }.toArray)
    }
    val ratios = for {
      i <- qv.indices; j <- (i + 1) until qv.size
      dd = qv(i)._2.zip(qv(j)._2).map { case (x, y) =>
        (x - y) * (x - y)
      }.sum
      if dd > 0
      dp = proj(i)._2.zip(proj(j)._2).map { case (x, y) =>
        (x - y) * (x - y)
      }.sum
    } yield ((BigInt(1000) * BigInt(dp)) / (BigInt(16) * BigInt(dd))).toLong
    val want = ratios.groupBy(_ / 200)
      .map { case (b, rs) => (b, rs.size.toLong) }
    val got = SparkEntry.queries("q278_jl_projection")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
    assert(got.values.sum === (qv.size.toLong * (qv.size - 1) / 2))
    // the Lehmer signs must actually preserve distances: at least 80%
    // of probe pairs within [0.4, 2.4)x of the original distance
    val inBand = ratios.count(r => r >= 400 && r < 2400)
    assert(inBand * 10 >= ratios.size * 8,
      s"only $inBand/${ratios.size} pairs in band")
  }

  // ---- q279/q280/q281 two-sample statistics --------------------------------

  private lazy val lengthsBySrc: Map[String, Seq[Long]] = {
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted.toSeq }
  }

  private def pairStats(f: (Seq[Long], Seq[Long]) => Long)
      : Map[(String, String), Long] = {
    val srcs = lengthsBySrc.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
    } yield ((srcs(i), srcs(j)),
      f(lengthsBySrc(srcs(i)), lengthsBySrc(srcs(j))))).toMap
  }

  private def collectPairs(name: String): Map[(String, String), Long] =
    SparkEntry.queries(name)(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap

  test("q279 matches an exact BigInt KS recomputation on every pair") {
    def ks(a: Seq[Long], b: Seq[Long]): Long = {
      val na = BigInt(a.size); val nb = BigInt(b.size)
      val grid = (a ++ b).distinct.sorted
      val d = grid.map { v =>
        (BigInt(a.count(_ <= v)) * nb - BigInt(b.count(_ <= v)) * na).abs
      }.max
      ((1000 * d) / (na * nb)).toLong
    }
    assert(collectPairs("q279_ks_test") === pairStats(ks))
  }

  test("q280 matches an exact BigInt Wasserstein recomputation") {
    def w1(a: Seq[Long], b: Seq[Long]): Long = {
      val na = BigInt(a.size); val nb = BigInt(b.size)
      val grid = (a ++ b).distinct.sorted
      val d = grid.zip(grid.tail).map { case (v, vn) =>
        (BigInt(a.count(_ <= v)) * nb - BigInt(b.count(_ <= v)) * na).abs *
          BigInt(vn - v)
      }.sum
      ((1000 * d) / (na * nb)).toLong
    }
    assert(collectPairs("q280_wasserstein") === pairStats(w1))
  }

  test("q281 matches an exact all-pairs Mann-Whitney recomputation") {
    // the census-free definition: 2U = Σ_{x∈a, y∈b} (2·[x>y] + [x=y])
    def ps(a: Seq[Long], b: Seq[Long]): Long = {
      val u2 = (for { x <- a; y <- b } yield
        if (x > y) BigInt(2) else if (x == y) BigInt(1) else BigInt(0)).sum
      ((1000 * u2) / (2 * BigInt(a.size) * BigInt(b.size))).toLong
    }
    assert(collectPairs("q281_mannwhitney") === pairStats(ps))
  }

  // ---- q288 Hamilton quota ----------------------------------------------------

  test("q288 matches an exact largest-remainder recomputation and " +
      "holds the Hamilton properties") {
    val n = Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val total = n.values.sum
    val b = total / 10
    val base = n.map { case (s, ni) =>
      val prod = BigInt(b) * ni
      s -> ((prod / total).toLong, (prod % total).toLong)
    }
    val left = b - base.values.map(_._1).sum
    val bonus = base.toSeq.sortBy { case (s, (_, rem)) => (-rem, s) }
      .take(left.toInt).map(_._1).toSet
    val want = n.keys.map { s =>
      (s, n(s), base(s)._1 + (if (bonus(s)) 1L else 0L))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q288_sample_quota")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === want)
    // Hamilton's guarantees: quotas sum to B exactly, and every quota
    // is within one unit of its real (fractional) share
    assert(got.map(_._3).sum === b)
    got.foreach { case (s, ni, q) =>
      val share = BigInt(b) * ni / total
      assert((q - share.toLong).abs <= 1L, s"$s quota $q vs share $share")
    }
  }

  // ---- q289 KMV sketch ----------------------------------------------------------

  test("q289 matches an exact KMV recomputation and stays in the 1/sqrt(k) " +
      "error band") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // fold over CODEPOINTS — Spark's substr/ascii and DuckDB's are
    // codepoint-based, so UTF-16 code units would diverge on
    // supplementary characters
    def polyHash(t: String): Long =
      t.codePoints().toArray
        .foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      val shingles = ds.flatMap { case (_, txt) =>
        val w = txt.trim.toLowerCase.split(" ", -1)
        if (w.length < 3) Seq.empty
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      }.toSet
      val hs = shingles.map(polyHash)
      val est =
        if (hs.size < 64) hs.size.toLong
        else 63L * 2147483647L / hs.toSeq.sorted.apply(63)
      (s, (shingles.size.toLong, est,
        1000L * math.abs(shingles.size - est) / shingles.size))
    }
    val got = SparkEntry.queries("q289_kmv_distinct")(spark, sf)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === bySrc)
    // estimates must be genuinely useful: every source within 2x, and
    // the median error inside ~2/sqrt(k)
    val errs = got.values.map(_._3).toSeq.sorted
    assert(errs.last < 900, s"worst KMV error ${errs.last} permille")
    assert(errs(errs.size / 2) < 250,
      s"median KMV error ${errs(errs.size / 2)} permille")
  }

  // ---- q291 KMV overlap ----------------------------------------------------

  test("KmvAgg: duplicate-idempotent 64-entry sketch with saturation flag") {
    import spark.implicits._
    // 200 distinct values, each offered 3 times in scrambled order:
    // duplicates must not perturb the kept set, and >64 distinct must
    // flip sat
    val big = new scala.util.Random(7)
      .shuffle((1L to 200L).flatMap(v => Seq(v, v, v)))
      .toDF("hv").groupBy()
      .agg(functions.KmvAgg.kmvAgg(col("hv"), 64).as("sk"))
      .select(col("sk.sat"), col("sk.mins")).head()
    assert(big.getBoolean(0), "200 distinct values must saturate k=64")
    assert(big.getSeq[Long](1) == (1L to 64L),
      s"sketch must be the 64 smallest distinct values: ${big.getSeq[Long](1)}")
    val small = (1L to 10L).flatMap(v => Seq(v, v))
      .toDF("hv").groupBy()
      .agg(functions.KmvAgg.kmvAgg(col("hv"), 64).as("sk"))
      .select(col("sk.sat"), col("sk.mins")).head()
    assert(!small.getBoolean(0), "10 distinct values must stay unsaturated")
    assert(small.getSeq[Long](1) == (1L to 10L))
  }

  test("q291 planted sketches: unsaturated pairs are exact, saturated " +
      "follow the estimator formula") {
    import spark.implicits._
    val sk = Seq(
      ("a", false, (1L to 50L)),                  // complete set 1..50
      ("b", false, (26L to 75L)),                 // complete set 26..75
      ("c", true, (2L to 128L by 2L)),            // evens, truncated
      ("d", true, (3L to 192L by 3L))             // triples, truncated
    ).toDF("source", "sat", "mins")
    val got = operators.CompareQueries.kmvOverlapEst(sk).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a-b: both complete -> exact union 75, intersection 25..50 = 25,
    // jaccard = 1000*25/75 = 333
    assert(got(("a", "b")) == ((75L, 25L, 333L)))
    // c-d: saturated — recompute the documented formula independently
    val mrg = ((2L to 128L by 2L) ++ (3L to 192L by 3L))
      .distinct.sorted.take(64)
    val nboth = mrg.count(v => v % 6 == 0 && v <= 128 && v <= 192)
    val unionEst = 63L * 2147483647L / mrg(63)
    assert(got(("c", "d")) ==
      ((unionEst, nboth * unionEst / 64, 1000L * nboth / 64)))
  }

  test("q291 matches an exact KMV-overlap recomputation and the " +
      "estimates stay useful") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def polyHash(t: String): Long =
      t.codePoints().toArray
        .foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      val sh = ds.flatMap { case (_, txt) =>
        val w = txt.trim.toLowerCase.split(" ", -1)
        if (w.length < 3) Seq.empty
        else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      }.toSet
      val hv = sh.map(polyHash)
      (src, (sh, hv.toSeq.sorted.take(64), hv.size > 64))
    }
    val expected = (for {
      (sa, (shA, skA, satA)) <- bySrc
      (sb, (shB, skB, satB)) <- bySrc if sa < sb
    } yield {
      val dInter = (shA & shB).size.toLong
      val dUnion = (shA | shB).size.toLong
      val jacExact = 1000L * dInter / dUnion
      val mrg = (skA ++ skB).distinct.sorted
      val (nboth, dUnionEst) =
        if (!satA && !satB)
          ((skA.toSet & skB.toSet).size.toLong, mrg.size.toLong)
        else (mrg.take(64).count(v =>
          skA.contains(v) && skB.contains(v)).toLong,
          63L * 2147483647L / mrg(63))
      val (dInterEst, jacEst) =
        if (!satA && !satB) (nboth, 1000L * nboth / dUnionEst)
        else (nboth * dUnionEst / 64L, 1000L * nboth / 64L)
      (sa, sb) -> ((dUnion, dInter, jacExact, dUnionEst, dInterEst,
        jacEst, math.abs(jacEst - jacExact)))
    }).toMap
    val got = SparkEntry.queries("q291_kmv_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(got === expected)
    // estimates must be genuinely useful, not just self-consistent:
    // the union estimate within 2x for every pair, and the Jaccard
    // error median within ~2 sketch quanta (2/k) with a bounded tail
    val rows = got.values.toSeq
    rows.foreach { case (dU, _, _, dUe, _, _, _) =>
      assert(dUe * 2 >= dU && dUe <= dU * 2,
        s"union estimate $dUe vs exact $dU outside 2x")
    }
    val errs = rows.map(_._7).sorted
    assert(errs(errs.size / 2) <= 32,
      s"median Jaccard error ${errs(errs.size / 2)} permille > 2/k")
    assert(errs.last < 160,
      s"worst Jaccard error ${errs.last} permille")
  }

  // ---- q290 Kendall correlation ------------------------------------------------

  test("q290 matches an exact pair-census recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def score(t: String): Long = {
      val w = t.trim.toLowerCase.split(" ", -1)
      1000L * w.distinct.length / w.length
    }
    val per = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ((1000L * ds.map(d => score(d._2)).sum / ds.length,
        ds.map(_._3).sum / ds.length))
    }
    val srcs = per.keys.toSeq.sorted
    val pairs = for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
    } yield (per(srcs(i))._1 - per(srcs(j))._1,
      per(srcs(i))._2 - per(srcs(j))._2)
    val c = pairs.count(p => p._1 * p._2 > 0).toLong
    val dd = pairs.count(p => p._1 * p._2 < 0).toLong
    val n0 = pairs.size.toLong
    val tau =
      if (c >= dd) 1000 * (c - dd) / n0 else -(1000 * (dd - c) / n0)
    val want = (n0, c, dd, pairs.count(_._1 == 0).toLong,
      pairs.count(_._2 == 0).toLong, tau)
    val got = SparkEntry.queries("q290_rank_correlation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got === want)
    // the Heaps'-law confounder must be visible: strongly negative tau
    assert(tau < -500,
      s"expected a strong negative quality-vs-length correlation, got $tau")
  }

  // ---- q282 streaming twin ---------------------------------------------------

  test("q282 streaming census equals the q276 batch TV row-for-row") {
    val batch = SparkEntry.queries("q276_source_divergence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val stream = SparkEntry.queries("q282_stream_divergence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(stream === batch)
  }
}

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

  /** Equi-depth histogram resolution: 32 equal-mass buckets = 33 bounds
    * (min, 31 interior percentiles, max) per analyzed column. */
  val HistBuckets = 32

  /** ANALYZE-TABLE analog: one stats row (row count + approx NDV per
    * requested key + an optional [[HistBuckets]]-bucket equi-depth
    * histogram per requested numeric column) persisted to
    * `statsDir/name`. One aggregate pass, map-side combined; HLL keeps
    * the NDV pass scan-shaped at any scale, and `percentile_approx`'s
    * mergeable summary does the same for the histogram bounds. */
  def analyze(s: SparkSession, statsDir: String, name: String,
      df: DataFrame, keyCols: Seq[String],
      histCols: Seq[String] = Nil): Unit = {
    val pcts = (0 to HistBuckets)
      .map(i => i.toDouble / HistBuckets).mkString(", ")
    val aggs = (count(lit(1)).as("rows") +:
      keyCols.map(k => approx_count_distinct(col(k)).as(s"ndv_$k"))) ++
      histCols.map(c => expr(
        s"percentile_approx(CAST($c AS DOUBLE), array($pcts), 10000)")
        .as(s"hist_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("analyzed_name", lit(name))
      .coalesce(1).write.mode("overwrite").parquet(s"$statsDir/$name")
    statsCache.remove((statsDir, name)) // re-ANALYZE invalidates
  }

  /** Driver-side stats memo: planJoin runs per query-build, and the
    * stats row is tiny but the parquet open is not free — one read per
    * (statsDir, name) per JVM. `analyze` invalidates its own key;
    * stats written by anything else (there is nothing else) would need
    * a restart, like any metastore cache. Negative results are NOT
    * cached: the common not-yet-analyzed → analyze → planJoin sequence
    * must see the fresh stats without an invalidation hook. */
  private val statsCache =
    new scala.collection.concurrent.TrieMap[(String, String), StatsRow]()

  private[graft] case class StatsRow(rows: Long, ndv: Map[String, Long],
      hist: Map[String, Seq[Double]] = Map.empty)

  /** Full analyzed stats row for `name`, or None if never analyzed.
    * Resolved through the table read itself (not a java.io probe of
    * `_SUCCESS`, which silently reports every table unanalyzed on any
    * non-local filesystem): a missing/empty stats dir surfaces as
    * AnalysisException → None, every real filesystem Spark can read
    * works unchanged. */
  private[graft] def statsOf(s: SparkSession, statsDir: String,
      name: String): Option[StatsRow] =
    statsCache.get((statsDir, name)).orElse {
      val loaded =
        try {
          val row = s.read.parquet(s"$statsDir/$name").head()
          val ndv = row.schema.fieldNames.filter(_.startsWith("ndv_"))
            .map(f => f.stripPrefix("ndv_") ->
              row.getLong(row.fieldIndex(f))).toMap
          val hist = row.schema.fieldNames.filter(_.startsWith("hist_"))
            .map(f => f.stripPrefix("hist_") ->
              row.getSeq[Double](row.fieldIndex(f)).toSeq).toMap
          Some(StatsRow(row.getLong(row.fieldIndex("rows")), ndv, hist))
        } catch {
          case _: org.apache.spark.sql.AnalysisException => None
          case _: java.util.NoSuchElementException => None // empty dir
        }
      loaded.foreach(statsCache.put((statsDir, name), _))
      loaded
    }

  /** Analyzed row count for `name`, or None if never analyzed. */
  def rowsOf(s: SparkSession, statsDir: String, name: String): Option[Long] =
    statsOf(s, statsDir, name).map(_.rows)

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

  /** A closed range predicate `lo <= col <= hi` on an analyzed column —
    * the input both to the frame filter and to the histogram estimate,
    * so the plan always filters exactly what the estimate priced. */
  case class RangePred(column: String, lo: Double, hi: Double)

  /** Equi-depth selectivity of [lo, hi]: each of the [[HistBuckets]]
    * buckets holds mass 1/HistBuckets; a bucket contributes its linear
    * overlap fraction (the textbook intra-bucket uniformity assumption),
    * and a zero-width bucket (heavy single value) contributes fully iff
    * the range covers that value. None when `col` was never
    * histogram-analyzed. */
  private[graft] def selectivity(stats: StatsRow, pred: RangePred)
      : Option[Double] =
    stats.hist.get(pred.column).map { bounds =>
      val per = 1.0 / (bounds.size - 1)
      bounds.sliding(2).map { w =>
        val (b0, b1) = (w.head, w.last)
        if (pred.hi < b0 || pred.lo > b1) 0.0
        else if (b1 == b0) per
        else per * math.min(1.0,
          math.max(0.0, (math.min(pred.hi, b1) - math.max(pred.lo, b0))
            / (b1 - b0)))
      }.sum
    }

  /** Post-filter cardinality estimate: analyzed rows × Π selectivity of
    * the predicates whose columns carry histograms. A predicate on an
    * unhistogrammed column contributes NO reduction (selectivity 1) —
    * the conservative direction for a broadcast decision. */
  private[graft] def effectiveRows(stats: StatsRow,
      preds: Seq[RangePred]): Long = {
    val sel = preds.flatMap(selectivity(stats, _)).product
    math.ceil(stats.rows * sel).toLong
  }

  /** The THIRD stats-driven decision: broadcast-by-post-filter-
    * cardinality. Spark's size heuristic prices the RELATION; a
    * filtered fact side's dangerous-or-cheap question depends on the
    * filter's selectivity, which only column statistics can answer at
    * plan time. Each side's range predicates are applied to the frame
    * AND priced against its equi-depth histograms; the broadcast choice
    * then runs on the EFFECTIVE row counts through the same budget conf
    * as [[planJoin]]. A side whose predicate columns lack histograms
    * keeps its full analyzed row count (never broadcast on a guess),
    * and an unanalyzed side is never broadcast at all. */
  def planFilteredJoin(s: SparkSession, statsDir: String,
      left: DataFrame, leftName: String, leftPreds: Seq[RangePred],
      right: DataFrame, rightName: String, rightPreds: Seq[RangePred],
      keys: Seq[String], joinType: String = "inner"): DataFrame = {
    def applyPreds(df: DataFrame, preds: Seq[RangePred]): DataFrame =
      preds.foldLeft(df)((d, p) =>
        d.where(col(p.column) >= p.lo && col(p.column) <= p.hi))
    val budget = s.conf.getOption(BroadcastRowsKey).map(_.toLong)
      .getOrElse(DefaultBroadcastRows)
    val lEff = statsOf(s, statsDir, leftName)
      .map(effectiveRows(_, leftPreds))
    val rEff = statsOf(s, statsDir, rightName)
      .map(effectiveRows(_, rightPreds))
    val lf = applyPreds(left, leftPreds)
    val rf = applyPreds(right, rightPreds)
    val broadcastRight = rEff.exists(r =>
      r <= budget && lEff.forall(r <= _))
    val broadcastLeft = !broadcastRight && lEff.exists(_ <= budget)
    if (broadcastRight) lf.join(broadcast(rf), keys, joinType)
    else if (broadcastLeft) broadcast(lf).join(rf, keys, joinType)
    else lf.join(rf, keys, joinType)
  }

  /** Estimated output multiplier of the inner equi-join fact⋈dim —
    * the System-R containment estimate |R⋈S| = |R|·|S| / max(V(R,k),
    * V(S,k)) divided by |fact|, i.e. dimRows / max(ndv). Multi-column
    * keys use the single most selective column (a tuple's NDV is ≥ any
    * component's, so this is the conservative upper bound on growth).
    * None when either side lacks the stats to price the join. */
  private def joinMultiplier(factStats: StatsRow, dimStats: StatsRow,
      keys: Seq[String]): Option[Double] = {
    val priced = keys.flatMap { k =>
      for (fn <- factStats.ndv.get(k); dn <- dimStats.ndv.get(k))
        yield dimStats.rows.toDouble / math.max(1L, math.max(fn, dn))
    }
    if (priced.isEmpty) None else Some(priced.min)
  }

  /** The second stats-driven decision: JOIN ORDER for a fact + N dims
    * star. Dims are joined in ascending estimated-multiplier order —
    * the most output-reducing (selective) joins run first, so every
    * intermediate is as small as the stats allow. At 100 TB the wrong
    * order shuffles a grown intermediate through every later join; the
    * right order pays each join on the smallest frame the plan can
    * reach. Unpriceable dims (either side unanalyzed) keep their given
    * relative order and join LAST: an unknown multiplier must not
    * float above measured ones, and a dim that GROWS the fact (known
    * multiplier > 1) still beats gambling on an unknown one.
    * Returns dim names in join order; [[planStarJoin]] applies it. */
  def starJoinOrder(s: SparkSession, statsDir: String, factName: String,
      dims: Seq[(String, Seq[String])]): Seq[String] = {
    val fact = statsOf(s, statsDir, factName)
    val priced = dims.map { case (name, keys) =>
      val m = for (f <- fact; d <- statsOf(s, statsDir, name);
        mult <- joinMultiplier(f, d, keys)) yield mult
      (name, m)
    }
    val (known, unknown) = priced.partition(_._2.isDefined)
    // sortBy is stable: equal multipliers (and the unknown tail) keep
    // the caller's order, so the decision is deterministic
    known.sortBy(_._2.get).map(_._1) ++ unknown.map(_._1)
  }

  /** Multi-way equi-join with BOTH stats decisions applied: the dims
    * join in [[starJoinOrder]]'s order, and each step goes through
    * [[planJoin]]'s broadcast-or-shuffle choice. The accumulated fact
    * keeps `factName`'s stats identity — the FK-star approximation
    * (selective dims only shrink the fact, so its analyzed row count
    * stays a safe upper bound for the broadcast decision). */
  def planStarJoin(s: SparkSession, statsDir: String,
      fact: DataFrame, factName: String,
      dims: Seq[(DataFrame, String, Seq[String])],
      joinType: String = "inner"): DataFrame = {
    val byName = dims.map(d => d._2 -> d).toMap
    require(byName.size == dims.size, "dim names must be unique")
    val order = starJoinOrder(s, statsDir, factName,
      dims.map(d => (d._2, d._3)))
    order.foldLeft(fact) { case (acc, name) =>
      val (df, _, keys) = byName(name)
      planJoin(s, statsDir, acc, factName, df, name, keys, joinType)
    }
  }
}

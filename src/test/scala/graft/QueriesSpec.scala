package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Every registered query runs and yields rows on the smoke-scale data, and
  * every oracle entry points at a registered query. Each query's optimized
  * plan is also linted against the one pattern that silently breaks at
  * cluster scale: an unpartitioned Window over unbounded input (Spark runs
  * it in ONE task — fine at sf0.1, fatal at 100 TB). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Queries allowed to carry an unpartitioned Window: their global window
    * runs over a per-bucket offsets aggregate of ≤ 32 rows (the two-pass
    * prefix-sum pattern), which the lint verifies structurally below. */
  private val boundedGlobalWindow =
    Set("q150_token_shards", "q173_pareto", "q242_compaction_plan",
      // q296's global window runs over the 256-row md5-prefix bucket
      // (pid) totals aggregate — the same two-pass prefix-sum shape
      "q296_pps_sample")

  /** Queries whose global window runs over a GENERATED relation (every
    * leaf under the window is a Range of ≤ 4096 elements — bounded by
    * construction, e.g. q284's 1088-row vnode ring), never over input
    * rows; the lint verifies that leaf shape structurally. */
  private val generatedGlobalWindow = Set("q284_shard_rebalance")

  private def lintWindows(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
    val unpart = df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    if (generatedGlobalWindow(name)) {
      import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Range}
      unpart.foreach { w =>
        val leaves = w.child.collect { case l: LeafNode => l }
        val allSmallRanges = leaves.nonEmpty && leaves.forall {
          case r: Range => r.numElements.isValidLong &&
            r.numElements.toLong <= 4096L
          case _ => false
        }
        assert(allSmallRanges,
          s"$name: global window not over a generated bounded relation:" +
            s"\n$w")
      }
    } else if (boundedGlobalWindow(name)) {
      // the global window must sit on the tiny pid-grouped offsets
      // aggregate, never on raw rows
      unpart.foreach { w =>
        val onOffsets = w.child.collectFirst {
          case a: Aggregate if a.groupingExpressions.exists(
              _.toString.contains("pid")) => a
        }.nonEmpty
        assert(onOffsets,
          s"$name: global window not over the pid offsets aggregate:\n$w")
      }
    } else {
      assert(unpart.isEmpty,
        s"$name: unpartitioned Window over unbounded input — one task " +
          s"would own every row at scale:\n${unpart.headOption.getOrElse("")}")
    }
  }

  /** Queries whose unguarded sequence() is bounded by an upstream Filter
    * (verified structurally below): the analyzed plan must contain a
    * Filter whose condition carries the named size guard, placed below
    * the explode so the sequence only ever sees qualifying rows. */
  private val seqFilterGuarded = Map(
    "q62_contamination" -> ("size(__toks", ">= 3"),
    "q64_repetition" -> ("size(__toks", ">= 3"),
    // q259 runs q64's Screening.repetition as its filter-B side — same
    // Filter guard, re-verified structurally below
    "q259_filter_kappa" -> ("size(__toks", ">= 3"),
    "q109_ngram_stats" -> ("size(w", ">= 2"),
    "q99_fuzzy_pairs" -> ("size(gids", ">= 2"),
    // q289's sequence(0, size(w) - 3) sits above WHERE size(w) >= 3;
    // its inner sequence(1, length(t)) folds a shingle that the same
    // guard makes non-empty (three tokens joined by two spaces)
    "q289_kmv_distinct" -> ("size(w", ">= 3"),
    // q291 feeds the same sourceShingles stream (WHERE size(w) >= 3)
    // into KmvAgg — identical guard, identical shingle fold
    "q291_kmv_overlap" -> ("size(w", ">= 3"))
    // q261's sequence(1, greatest(size(w) - 7, 1)) is ascending by
    // shape; its WHERE size(w) >= 8 guard sits behind a localCheckpoint
    // where no whitelist could be re-verified structurally

  /** Queries whose sequence() bounds are ascending by arithmetic that
    * the shape rules below cannot see:
    *  - q101: sequence(min(day), max(day)) of ONE column's aggregate —
    *    min ≤ max always; empty input yields nulls and explode(null)
    *    emits nothing.
    *  - q116: factor = least((tgt + n - 1) div n, 4) with tgt ≥ n ≥ 1,
    *    so factor ∈ [1, 4] and sequence(1, factor) ascends. */
  private val seqProvedByConstruction = Set(
    "q101_gapfill", "q116_minority_boost")

  /** Registry-wide lint for the silent-descent hazard: sequence(a, b)
    * without an explicit step DEFAULTS TO STEP -1 when b < a (Spark's
    * documented default-step rule), so a short document turns an index
    * walk into [a, a-1, …] and element_at reads from the WRONG END with
    * no error anywhere (the q178/q195/q198 bug class, found three times
    * by review). A sequence is accepted only if it is provably
    * ascending (literal bounds; stop clamped by greatest(_, k) with
    * start ≤ k; stop = start + nonnegative literal), sits in a guarded
    * CaseWhen/If branch, or is whitelisted above with its Filter guard
    * re-verified. */
  private def lintSequences(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Add, CaseWhen,
      Cast, Expression, Greatest, If, Literal, Sequence}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    def strip(e: Expression): Expression = e match {
      case c: Cast => strip(c.child)
      case e => e
    }
    def litVal(e: Expression): Option[Long] = strip(e) match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    def litLe(a: Expression, b: Expression): Boolean =
      (litVal(a), litVal(b)) match {
        case (Some(x), Some(y)) => x <= y
        case _ => false
      }
    def safeByShape(s: Sequence): Boolean =
      litLe(s.start, s.stop) || (strip(s.stop) match {
        case g: Greatest => g.children.exists(c => litLe(s.start, c))
        case a: Add =>
          (strip(a.left).semanticEquals(strip(s.start)) &&
            litVal(a.right).exists(_ >= 0)) ||
          (strip(a.right).semanticEquals(strip(s.start)) &&
            litVal(a.left).exists(_ >= 0))
        case _ => false
      })
    def offenders(e: Expression, guarded: Boolean): Seq[Sequence] =
      e match {
        case s: Sequence =>
          (if (guarded || safeByShape(s)) Nil else Seq(s)) ++
            s.children.flatMap(offenders(_, guarded))
        case c: CaseWhen =>
          c.branches.flatMap { case (cond, v) =>
            offenders(cond, guarded) ++ offenders(v, guarded = true)
          } ++ c.elseValue.toSeq.flatMap(offenders(_, guarded = true))
        case i: If =>
          offenders(i.predicate, guarded) ++
            offenders(i.trueValue, guarded = true) ++
            offenders(i.falseValue, guarded = true)
        case other => other.children.flatMap(offenders(_, guarded))
      }
    val plan = df.queryExecution.analyzed
    if (seqProvedByConstruction(name)) ()
    else seqFilterGuarded.get(name) match {
      case Some((ref, bound)) =>
        val hasGuard = plan.collect {
          case f: Filter
              if f.condition.toString.contains(ref) &&
                f.condition.toString.contains(bound) => f
        }.nonEmpty
        assert(hasGuard,
          s"$name: whitelisted as Filter-guarded but no Filter matches " +
            s"'$ref' '$bound' — the guard moved or was dropped")
      case None =>
        val bad = plan.flatMap(
          _.expressions.flatMap(offenders(_, guarded = false)))
        assert(bad.isEmpty,
          s"$name: unguarded sequence() with unprovable bounds — " +
            s"default step is -1 when stop < start, so short inputs " +
            s"silently walk backwards: ${bad.map(_.sql).mkString("; ")}")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, TestSession.sfDir)
      lintWindows(name, df)
      lintSequences(name, df)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Cast, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** As-of join — the temporal "latest right row at or before the left row's
  * time, per key" operator Spark lacks natively (pandas `merge_asof`,
  * DuckDB `ASOF JOIN`). The workhorse of event-stream enrichment: join
  * every event to the most recent checkpoint/status/price for its key.
  *
  * Built as the full custom-operator stack (SURVEY preference order (c)):
  * a logical [[AsofJoinPlan]], a [[SparkStrategy]] planning it, and a
  * physical [[AsofJoinExec]] that asks Catalyst for hash-clustered,
  * (key, time)-sorted children and then streams BOTH sides through a
  * two-pointer merge — each partition is one forward pass, no buffering
  * beyond a single candidate row per key.
  *
  * Scale shape: identical to a sort-merge join — one shuffle per side on
  * the join keys (skipped when the data is already bucketed/sorted, since
  * the requirements are declared, not hard-coded), then linear merge. The
  * naive compositions either window-sort a unioned stream (extra global
  * sort of left+right together) or range-join and aggregate (quadratic
  * between checkpoints); this exec does neither.
  *
  * Time columns must be timestamp / long / int (int is widened to long);
  * comparisons run on the raw internal long, so timestamp micros survive
  * intact.
  */
object AsofJoin {

  /** Left as-of join `left` to `right`: every left row, plus the right row
    * with the greatest `rightTs <= leftTs` among equal join keys (nulls if
    * none). `inner = true` drops unmatched left rows instead. Right-side
    * column names must not collide with left's — alias beforehand. */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String, inner: Boolean = false): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join needs matching non-empty key lists")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = planOf(left)
    // a self-join would carry duplicate expression ids; re-alias the right
    // side so the joined output attributes stay distinct
    val rp0 = planOf(right)
    val rp =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    require(lp.output.map(_.name).intersect(rp.output.map(_.name)).isEmpty,
      "as-of join right-side column names must not collide with the left")
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(", ")}"))
    val lks = leftKeys.map(attr(lp, _))
    val rks = rightKeys.map(attr(rp, _))
    // the merge compares key rows with one ordering built from the LEFT
    // key types — a silent type mismatch would misorder the pointers, so
    // demand identical types up front (cast beforehand if needed)
    lks.zip(rks).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of join key type mismatch: ${l.name}: ${l.dataType} vs " +
          s"${r.name}: ${r.dataType} — cast the columns to match first")
    }
    val node = AsofJoinPlan(lp, rp, lks, rks,
      attr(lp, leftTs), attr(rp, rightTs), inner)
    GraftSqlBridge.ofRows(spark, node)
  }

  private def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently register the planning strategy and the optimizer rule
    * on the session. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val em = GraftSqlBridge.experimental(spark)
    if (!em.extraStrategies.contains(AsofJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsofJoinStrategy
    if (!em.extraOptimizations.contains(AsofJoinNullFilterRule))
      em.extraOptimizations = em.extraOptimizations :+ AsofJoinNullFilterRule
  }
}

/** Outer-join elimination for the as-of join: a filter above a left-outer
  * as-of join that rejects nulls on a right-side attribute (e.g.
  * `WHERE cp_t IS NOT NULL`) discards every null-extended row anyway, so
  * the join runs as inner — unmatched left rows short-circuit inside the
  * merge instead of being materialized and filtered one operator later.
  * The classic null-intolerant-filter rewrite, extended to the custom
  * operator via `experimental.extraOptimizations`. */
object AsofJoinNullFilterRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.IsNotNull
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) if !aj.inner &&
        splitConjunctivePredicates(cond).exists {
          case IsNotNull(a: Attribute) => aj.right.outputSet.contains(a)
          case _ => false
        } =>
      f.copy(child = aj.copy(inner = true))
  }
}

/** Logical as-of join node. Children are fully analyzed when constructed,
  * so the node arrives at the planner resolved. */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    inner: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, inner) =>
      AsofJoinExec(lk, rk, lts, rts, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires both children clustered on the join keys
  * and sorted by (keys, ts) ascending — Catalyst inserts the exchanges and
  * sorts (or elides them when an upstream bucketing/sort already
  * satisfies the requirement) — then merges partition-pairs with two
  * pointers, keeping exactly one buffered candidate (the latest right row
  * at or before the current left time, per key). */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    inner: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  private def tsAsLong(e: Expression): Expression = e.dataType match {
    case LongType | TimestampType => e // both are raw longs internally
    case IntegerType => Cast(e, LongType)
    case t => throw new IllegalArgumentException(
      s"as-of time column must be timestamp/long/int, got $t")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val lKeyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = tsAsLong(leftTs)
    val rt = tsAsLong(rightTs)
    val isInner = inner
    val schema = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions pairs the i-th partitions positionally; that is only
    // the (key → same partition) pairing when both sides went through the
    // same hash exchange. EnsureRequirements guarantees it, but an AQE
    // re-plan that coalesced one side and not the other would break it
    // silently-wrong — fail loudly instead.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children have ${lRdd.getNumPartitions} vs " +
        s"${rRdd.getNumPartitions} partitions — co-partitioning was not " +
        "enforced (AQE coalescing mismatch?)")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeyTypes)
      val resultProj = UnsafeProjection.create(schema, schema)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = advanceRight()
        // latest right row with ts <= current left ts, and its key
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _
        private var nextOut: InternalRow = _

        // SQL join semantics: a null key or null time matches nothing.
        // Null-keyed right rows sort first (NULLS FIRST ascending) and
        // would binary-compare equal to a null left key, so they are
        // skipped outright; null-keyed left rows emit null-extended (or
        // drop, when inner) without consulting the right side.
        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!rKeyProj(r).anyNull && !rTsProj(r).isNullAt(0)) return r
          }
          null
        }

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTsRow = lTsProj(lRow)
            if (lKey.anyNull || lTsRow.isNullAt(0)) {
              if (!isInner) {
                numOutput += 1
                return resultProj(joined(lRow, nullRight))
              }
              // inner + null key: fall through to the next left row
            } else {
              val lTime = lTsRow.getLong(0)
              // drop right rows for keys before the current left key
              while (rHead != null &&
                  keyOrd.compare(rKeyProj(rHead), lKey) < 0)
                rHead = advanceRight()
              // absorb right rows at this key up to the left time
              while (rHead != null && {
                  val rKey = rKeyProj(rHead)
                  keyOrd.compare(rKey, lKey) == 0 &&
                    rTsProj(rHead).getLong(0) <= lTime
                }) {
                candidate = rHead.copy()
                candidateKey = lKey.copy()
                rHead = advanceRight()
              }
              val matched = candidate != null && candidateKey != null &&
                keyOrd.compare(candidateKey, lKey) == 0
              if (matched) {
                numOutput += 1
                return resultProj(joined(lRow, candidate))
              } else if (!isInner) {
                numOutput += 1
                return resultProj(joined(lRow, nullRight))
              }
              // inner + unmatched: fall through to the next left row
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (nextOut == null) nextOut = computeNext()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextOut
          nextOut = null
          r
        }
      }
    }
  }

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, ParsedStatement}

/** SELECT-only native-SQL guard + table extraction for authorization.
  *
  * The reference validates its native-SQL passthrough by inspecting the
  * destination engine's EXPLAIN output — three dialect-specific code paths
  * (PostgreSQL EXPLAIN JSON, MSSQL plan-cache XML, MySQL EXPLAIN + a Go/TiDB
  * table extractor; reference sources/webrtcproxy/p2pconnection.js:353-488,
  * sources/webrtcproxy/main.go:11-55). On Spark this collapses to one path:
  * parse with Spark's own parser, reject any plan that is a Command/DML
  * statement, and collect every referenced relation from the logical plan for
  * the per-table ACL check (p2pconnection.js:446-479 analog).
  *
  * Driver-side only (parses a string); zero cost at scale.
  */
object ReadOnlyGuard {

  final case class Validated(plan: LogicalPlan, tables: Set[String])

  /** Parse and validate; throws SecurityException for non-SELECT statements. */
  def validate(spark: SparkSession, sql: String): Validated = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val writes = plan.collect {
      case c: Command => c
      case i: InsertIntoStatement => i
      case p: ParsedStatement => p
    }
    if (writes.nonEmpty)
      throw new SecurityException(
        s"only SELECT statements are allowed; rejected: " +
          writes.map(_.nodeName).distinct.mkString(", "))
    Validated(plan, tablesOf(plan))
  }

  /** All relations referenced anywhere in the plan (incl. subqueries/CTEs).
    * CTE aliases also appear as UnresolvedRelation before analysis; callers
    * doing ACL checks should treat unknown names as "not a real table". */
  def tablesOf(plan: LogicalPlan): Set[String] = {
    val fromPlan = plan.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }
    val fromExprs = plan.flatMap(_.expressions).flatMap { e =>
      e.collect { case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        tablesOf(sq.plan)
      }.flatten
    }
    (fromPlan ++ fromExprs).toSet
  }

  /** Guarded native-SQL execution (sqlproxy.mjs:68-78 analog): validate,
    * check the per-table ACL, run. `allowed = None` means admin/poweruser
    * fast path (p2pconnection.js:157-171). */
  def query(spark: SparkSession, sql: String,
      allowed: Option[Set[String]] = None): DataFrame = {
    val v = validate(spark, sql)
    allowed.foreach { acl =>
      val denied = v.tables.filterNot(t => acl.contains(t.toLowerCase))
      if (denied.nonEmpty)
        throw new SecurityException(
          s"access denied to table(s): ${denied.toSeq.sorted.mkString(", ")}")
    }
    spark.sql(sql)
  }
}

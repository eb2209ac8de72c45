package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metadata / NoSQL query surface.
  *
  * The reference's metadata API (reference sources/nosql/nosql.js) exposes a
  * DynamoDB-shaped query language: a key-condition expression (`=`, `>`, `<`,
  * `begins_with`, `between`, joined with AND — nosql.js:394-449), a filter
  * expression (`contains`, `<>` — nosql.js:451-482), and post-query handling
  * (visibility filter dropping `Archive=true` rows and owner/shared-access
  * rows, then `orderBy` + `limit` — nosql.js:219-307). GSI selection
  * (nosql.js:492-521) is irrelevant on Spark — Catalyst plans the scan — but
  * the key-shaped API is kept.
  *
  * Everything compiles to Catalyst predicates: at 100 TB the key conditions
  * prune partitions / push to parquet, and the top-k is a TakeOrderedAndProject
  * (no global sort materialization).
  */
object NoSqlDsl {

  /** One key/filter condition. */
  sealed trait Cond { def toColumn: Column }
  final case class Eq(attr: String, v: Any) extends Cond {
    def toColumn: Column = col(attr) === lit(v)
  }
  final case class Ne(attr: String, v: Any) extends Cond {
    def toColumn: Column = col(attr) =!= lit(v)
  }
  final case class Gt(attr: String, v: Any) extends Cond {
    def toColumn: Column = col(attr) > lit(v)
  }
  final case class Lt(attr: String, v: Any) extends Cond {
    def toColumn: Column = col(attr) < lit(v)
  }
  final case class BeginsWith(attr: String, prefix: String) extends Cond {
    def toColumn: Column = col(attr).startsWith(prefix)
  }
  final case class Between(attr: String, lo: Any, hi: Any) extends Cond {
    def toColumn: Column = col(attr).between(lit(lo), lit(hi))
  }
  final case class Contains(attr: String, v: String) extends Cond {
    def toColumn: Column = col(attr).contains(v)
  }

  final case class Query(
      keyConditions: Seq[Cond] = Nil,
      filters: Seq[Cond] = Nil,
      orderBy: Option[(String, Boolean)] = None, // (attr, ascending)
      limit: Option[Int] = None,
      dropArchived: Boolean = false)

  /** Run a DynamoDB-shaped query against a metadata DataFrame. */
  def run(df: DataFrame, q: Query): DataFrame = {
    val conds = q.keyConditions ++ q.filters
    var out = conds.foldLeft(df)((acc, c) => acc.where(c.toColumn))
    if (q.dropArchived && df.columns.contains("Archive"))
      out = out.where(!coalesce(col("Archive"), lit(false)))
    out = q.orderBy match {
      case Some((attr, asc)) =>
        // Post-query sort mirrors nosql.js:291-307 (_.orderBy + slice).
        out.orderBy(if (asc) col(attr).asc else col(attr).desc)
      case None => out
    }
    q.limit.fold(out)(out.limit)
  }

  /** PutItem with the reference's cached-merge and privilege-escalation
    * guard (`createupdatequeries`, nosql.js:309-354):
    *
    *  - the key attributes come from the validated request, never from the
    *    payload — after the merge the reference re-applies
    *    `Keys.map(k => Item[k] = HashandSort[k])`, so a payload that smuggles
    *    different key values is ignored;
    *  - if the row exists and is a collection-type query (`QueryType ==
    *    "C"`), `DatabaseName`/`TableName` are restored from the stored row
    *    ("ensuring that DatabaseName and TableName fields are not
    *    overwritten during update as that results in privilege
    *    escalation" — a user with write access to a query row must not be
    *    able to re-point it at a table they lack permissions on);
    *  - analysis-type rows (and inserts) take the payload as-is.
    *
    * Pure column algebra over the registry DataFrame — the merge is a
    * `when(keyMatch, merged).otherwise(original)` projection, no
    * driver-side row surgery; only the insert-or-update decision is a
    * bounded point lookup (the put IS a point operation). */
  def putItem(registry: DataFrame, key: Map[String, Any],
      payload: Map[String, Any],
      collectionType: String = "C"): DataFrame = {
    require(key.nonEmpty, "PutItem requires key attributes")
    val keyMatch = key.map { case (k, v) => col(k) === lit(v) }
      .reduce(_ && _)
    val guarded = Set("DatabaseName", "TableName")
    def mergedValue(c: String): Column =
      if (key.contains(c)) col(c) // keys: validated request wins
      else payload.get(c) match {
        case Some(v) if guarded(c) =>
          when(col("QueryType") === lit(collectionType), col(c))
            .otherwise(lit(v))
        case Some(v) => lit(v)
        case None => col(c)
      }
    val updated = registry.select(registry.columns.map { c =>
      when(keyMatch, mergedValue(c)).otherwise(col(c)).as(c)
    }: _*)
    if (!registry.where(keyMatch).isEmpty) updated
    else {
      val values = registry.schema.fields.map { f =>
        key.getOrElse(f.name, payload.get(f.name).orNull)
      }
      val row = org.apache.spark.sql.Row(values: _*)
      val inserted = registry.sparkSession.createDataFrame(
        java.util.Collections.singletonList(row), registry.schema)
      registry.unionByName(inserted)
    }
  }

  /** DeleteItem by key equality — the reference extracts the key pair from
    * the request parameters per table (`Logverz-Queries`: two
    * AttributeName/AttributeValue parameters; `Logverz-Identities`:
    * (Name, Type) — nosql.js:169-196) and issues a point delete. */
  def deleteItem(registry: DataFrame, key: Map[String, Any]): DataFrame = {
    require(key.nonEmpty, "DeleteItem requires key attributes")
    val keyMatch = key.map { case (k, v) => col(k) === lit(v) }
      .reduce(_ && _)
    registry.where(!coalesce(keyMatch, lit(false)))
  }

  /** Visibility filter analog of `sharedqueryfiltering` (nosql.js:244-289):
    * keep rows owned by `user`, shared with `user`, or everything for
    * admins/powerusers. Owners/Access are comma-joined lists in the
    * reference's registry rows. */
  def visibilityFilter(df: DataFrame, user: String, isAdmin: Boolean,
      ownersCol: String = "Owners", accessCol: String = "Access"): DataFrame =
    if (isAdmin) df
    else df.where(
      array_contains(split(col(ownersCol), ","), user) ||
      array_contains(split(col(accessCol), ","), user))
}

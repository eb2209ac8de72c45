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

package graft.auth

/** Table-level access control — the reference's per-table decision matrix
  * (reference sources/shared/authenticationsharedv3.js:641-793): a
  * `(TableName, DatabaseName)` registry row carries Owners / Access lists;
  * admins and (for reads) powerusers bypass; owners may modify; access-list
  * members may query. Group membership expands before the check (:701-745).
  */
object TableAcl {

  sealed trait Op
  case object Query extends Op
  case object Modify extends Op // Put / Delete in the reference

  final case class TableGrants(owners: Set[String], access: Set[String])

  final case class Identity(
      name: String,
      groups: Set[String] = Set.empty,
      isAdmin: Boolean = false,
      isPowerUser: Boolean = false) {
    def principals: Set[String] = groups + name
  }

  /** The owner/access/admin/poweruser decision matrix (:641-699,747-793). */
  def authorize(id: Identity, grants: TableGrants, op: Op): Boolean =
    if (id.isAdmin) true
    else op match {
      case Query =>
        id.isPowerUser ||
          id.principals.exists(p => grants.owners(p) || grants.access(p))
      case Modify =>
        id.principals.exists(grants.owners)
    }

  /** Filter a set of requested tables down to those the identity may touch —
    * the per-table loop used by the native-SQL guard (p2pconnection.js
    * :490-504 analog, feeding [[graft.plans.ReadOnlyGuard.query]]). */
  def allowedTables(id: Identity, registry: Map[String, TableGrants],
      op: Op): Set[String] =
    registry.collect {
      case (t, g) if authorize(id, g, op) => t
    }.toSet
}

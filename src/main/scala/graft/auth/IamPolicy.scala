package graft.auth

/** IAM-style policy evaluator — the reference's authorization core
  * (reference sources/shared/authenticationsharedv3.js:6-271), re-implemented
  * as a pure Scala module (no Spark dependency).
  *
  * Decision order, as in the reference (and AWS semantics):
  *   1. explicit Deny wins over everything (allowdenyaction,
  *      authenticationsharedv3.js:6-60);
  *   2. otherwise an applicable Allow grants;
  *   3. otherwise implicit deny.
  *
  * A statement applies to a request when its Action/NotAction matches the
  * requested `service:action` (case-insensitive, `*`/`?` wildcards —
  * getmatchingaction, :129-240) AND its Resource/NotResource matches the
  * requested resource (wildcard match tested in both directions, i.e. a
  * wildcard request pattern can also select concrete policy resources —
  * getmatchingresources/checkmatch, :62-127,256-271).
  */
object IamPolicy {

  sealed trait Effect
  case object Allow extends Effect
  case object Deny extends Effect

  final case class Statement(
      effect: Effect,
      action: Seq[String] = Nil,     // mutually exclusive with notAction
      notAction: Seq[String] = Nil,
      resource: Seq[String] = Nil,   // mutually exclusive with notResource
      notResource: Seq[String] = Nil)

  final case class Policy(statements: Seq[Statement])

  sealed trait Decision
  case object Allowed extends Decision
  case object ExplicitDeny extends Decision
  case object ImplicitDeny extends Decision

  /** `*`/`?` wildcard match (IAM glob), case-insensitive. */
  private[auth] def wildcardMatch(pattern: String, value: String): Boolean = {
    val re = java.util.regex.Pattern.quote(pattern.toLowerCase)
      .replace("*", "\\E.*\\Q")
      .replace("?", "\\E.\\Q")
    value.toLowerCase.matches(re)
  }

  /** Bidirectional resource match (checkmatch analog): policy pattern may
    * cover the request, or a wildcard request may cover the policy entry. */
  private[auth] def resourceMatch(pattern: String, value: String): Boolean =
    wildcardMatch(pattern, value) || wildcardMatch(value, pattern)

  private def actionApplies(st: Statement, action: String): Boolean =
    if (st.action.nonEmpty) st.action.exists(wildcardMatch(_, action))
    else if (st.notAction.nonEmpty) !st.notAction.exists(wildcardMatch(_, action))
    else false

  private def resourceApplies(st: Statement, resource: String): Boolean =
    if (st.resource.nonEmpty) st.resource.exists(resourceMatch(_, resource))
    else if (st.notResource.nonEmpty)
      !st.notResource.exists(resourceMatch(_, resource))
    else true // statement without resource constraint applies

  /** Evaluate all statements of all policies for one request.
    *
    * Deny statements are evaluated on action match ALONE — the reference's
    * `allowdenyaction` runs `getmatchingaction` over the deny statements
    * and returns Deny on any hit, never consulting the deny's resources;
    * resource matching happens only for allows
    * (authenticationsharedv3.js:6-49). That is stricter than AWS IAM
    * semantics (a deny scoped to resource X here also denies the action on
    * resource Y), in the fail-closed direction. */
  def evaluate(policies: Seq[Policy], action: String,
      resource: String): Decision = {
    val statements = policies.flatMap(_.statements)
    if (statements.exists(st =>
        st.effect == Deny && actionApplies(st, action))) ExplicitDeny
    else if (statements.exists(st =>
        st.effect == Allow && actionApplies(st, action) &&
          resourceApplies(st, resource))) Allowed
    else ImplicitDeny
  }

  def isAllowed(policies: Seq[Policy], action: String,
      resource: String): Boolean =
    evaluate(policies, action, resource) == Allowed

  /** Parse the reference's stringified-with-single-quotes policy documents
    * (authenticationsharedv3.js:242-254): stored as `{'Statement':[...]}`. */
  def parse(json: String): Policy = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val normalized =
      if (json.contains("\"")) json else json.replace('\'', '"')
    val root = mapper.readTree(normalized)
    import scala.jdk.CollectionConverters._
    def strings(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
      if (n == null) Nil
      else if (n.isArray) n.elements().asScala.map(_.asText).toSeq
      else Seq(n.asText)
    val stmts = Option(root.get("Statement")).map { sn =>
      val arr = if (sn.isArray) sn.elements().asScala.toSeq else Seq(sn)
      arr.map { s =>
        Statement(
          effect = if (s.get("Effect").asText.equalsIgnoreCase("Deny")) Deny
                   else Allow,
          action = strings(s.get("Action")),
          notAction = strings(s.get("NotAction")),
          resource = strings(s.get("Resource")),
          notResource = strings(s.get("NotResource")))
      }
    }.getOrElse(Nil)
    Policy(stmts)
  }

  /** Root-user fast path (authenticationsharedv3.js:274-286): the hardcoded
    * AdministratorAccess identity. */
  val administratorAccess: Policy =
    Policy(Seq(Statement(Allow, action = Seq("*"), resource = Seq("*"))))
}

package graft.auth

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The identities registry and its policy-association pass — the rest of
  * the reference's §2.11 auth surface.
  *
  * The reference stores users, groups, and AWS managed policies as rows of
  * one `Logverz-Identities` table keyed (Name, Type ∈ UserAWS/UserGoogle/…
  * /GroupAWS/PolicyAWS), each carrying policy-string lists. A new non-AWS
  * user starts from the `AdduserParams` template (nosql.js:367-392) and is
  * enriched by `AssociateUserPolicies`
  * (authenticationsharedv3.js:331-405):
  *
  *  - every referenced IAMGroup's (name, 'GroupAWS') row contributes its
  *    GroupInline and GroupAttached policy strings;
  *  - every referenced IAMPolicy's (name, 'PolicyAWS') row contributes a
  *    `{"PolicyName":…, "PolicyDocument": doc-with-single-quotes}` string
  *    to UserAttached (the reference's exact wire format);
  *  - collected lists replace the user's corresponding Policies fields
  *    only when non-empty.
  *
  * The registry is a metadata DataFrame; group/policy expansion is a
  * bounded point-lookup pass (an identity references a handful of groups),
  * so the collects here are small by construction — the same stance as the
  * reference's per-identity Dynamo queries.
  */
object Identities {

  final case class Entry(
      Name: String,
      Type: String,
      IAM: Boolean,
      IAMGroups: Seq[String],
      IAMPolicies: Seq[String],
      GroupInline: Seq[String],
      GroupAttached: Seq[String],
      UserAttached: Seq[String],
      /** PolicyAWS rows: the managed policy's latest version document. */
      Document: Option[String])

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[Entry].toDF()
  }

  def toDF(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    import spark.implicits._
    entries.toDF()
  }

  /** `AdduserParams` (nosql.js:367-392): the blank non-AWS user row, with
    * requested group/policy references carried over from the payload. */
  def addUser(name: String, userType: String,
      iamGroups: Seq[String] = Nil, iamPolicies: Seq[String] = Nil): Entry =
    Entry(name, userType, IAM = true, iamGroups, iamPolicies,
      Nil, Nil, Nil, None)

  /** `AssociateUserPolicies`: resolve the user's group/policy references
    * against the registry and fill the Policies lists. Returns the
    * enriched entry. */
  def associateUserPolicies(identities: DataFrame, user: Entry): Entry = {
    val groupRows: Map[String, Row] =
      if (user.IAMGroups.isEmpty) Map.empty
      else identities
        .where(col("Type") === "GroupAWS" &&
          col("Name").isin(user.IAMGroups: _*))
        .collect().map(r => r.getAs[String]("Name") -> r).toMap
    val missingG = user.IAMGroups.filterNot(groupRows.contains)
    require(missingG.isEmpty, s"unknown IAMGroups: ${missingG.mkString(",")}")

    def strings(r: Row, field: String): Seq[String] =
      r.getAs[scala.collection.Seq[String]](field).toSeq
    val groupInline = user.IAMGroups.flatMap(g =>
      strings(groupRows(g), "GroupInline"))
    val groupAttached = user.IAMGroups.flatMap(g =>
      strings(groupRows(g), "GroupAttached"))

    val policyRows: Map[String, Row] =
      if (user.IAMPolicies.isEmpty) Map.empty
      else identities
        .where(col("Type") === "PolicyAWS" &&
          col("Name").isin(user.IAMPolicies: _*))
        .collect().map(r => r.getAs[String]("Name") -> r).toMap
    val missingP = user.IAMPolicies.filterNot(policyRows.contains)
    require(missingP.isEmpty,
      s"unknown IAMPolicies: ${missingP.mkString(",")}")

    // the reference's exact storage format: outer JSON (properly escaped,
    // as JSON.stringify would emit — raw interpolation breaks on
    // newlines/backslashes in pretty-printed documents), the document's
    // quotes swapped to single first (authenticationsharedv3.js:388)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val userAttached = user.IAMPolicies.map { p =>
      val doc = Option(policyRows(p).getAs[String]("Document")).getOrElse("")
      val node = mapper.createObjectNode()
      node.put("PolicyName", p)
      node.put("PolicyDocument", doc.replace('"', '\''))
      mapper.writeValueAsString(node)
    }

    user.copy(
      GroupInline =
        if (groupInline.nonEmpty) groupInline else user.GroupInline,
      GroupAttached =
        if (groupAttached.nonEmpty) groupAttached else user.GroupAttached,
      UserAttached =
        if (userAttached.nonEmpty) userAttached else user.UserAttached)
  }

  /** Parse one stored policy string: either a bare statement document or
    * the `{"PolicyName":…, "PolicyDocument": …}` wrapper UserAttached
    * rows use. */
  def parsePolicyString(s: String): IamPolicy.Policy = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(s)
      catch { case _: Exception => return IamPolicy.parse(s) }
    Option(root.get("PolicyDocument")) match {
      case Some(doc) => IamPolicy.parse(doc.asText)
      case None => IamPolicy.parse(s)
    }
  }

  /** The user's full effective policy set, association included. */
  def effectivePolicies(identities: DataFrame,
      user: Entry): Seq[IamPolicy.Policy] = {
    val e = associateUserPolicies(identities, user)
    (e.GroupInline ++ e.GroupAttached ++ e.UserAttached)
      .map(parsePolicyString)
  }

  /** End-to-end decision for one request — lookup, association, parse,
    * deny-first evaluation. */
  def decide(identities: DataFrame, user: Entry, action: String,
      resource: String): IamPolicy.Decision =
    IamPolicy.evaluate(effectivePolicies(identities, user), action, resource)
}
